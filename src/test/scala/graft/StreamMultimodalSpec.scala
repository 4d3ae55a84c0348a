package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.multimodal.Multimodal
import graft.streaming.StreamOps

class StreamMultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("collection doubles as a streaming source; windowed agg equals batch") {
    val root = SparkTestSession.tmp("graft-stream")
    val df = Seq(
      (1L, "2024-01-01 10:05:00", 1.0), (2L, "2024-01-01 10:45:00", 2.0),
      (3L, "2024-01-01 11:05:00", 4.0), (4L, "2024-01-02 10:05:00", 8.0),
    ).toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df)

    val got = StreamOps.windowedAggOnce(spark, c, "ts", "1 hour") { g =>
      g.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    }.select(col("w.start").cast("string"), col("n"), col("sv"))
      .orderBy("n", "sv")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(
      ("2024-01-01 10:00:00", 2L, 3.0),
      ("2024-01-01 11:00:00", 1L, 4.0),
      ("2024-01-02 10:00:00", 1L, 8.0)))
  }

  test("append-mode windowed agg with watermark emits finalized windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val name = "graft_wm_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = in.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      in.addData((ts("2024-01-01 10:05:00"), 1.0), (ts("2024-01-01 10:45:00"), 2.0))
      q.processAllAvailable()
      // watermark still inside hour 10 -> nothing finalized yet
      assert(spark.table(name).count() == 0)
      // event far past hour 10 advances the watermark; hour-10 window closes
      in.addData((ts("2024-01-01 12:30:00"), 4.0))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 14:00:00"), 8.0))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select(col("window.start").cast("string"), col("n"), col("sv"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("2024-01-01 10:00:00", 2L, 3.0)))
    } finally q.stop()
  }

  test("streaming dedup drops in-window duplicates with bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val name = "graft_dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamOps.dedupStream(
        in.toDF().toDF("text", "ts"), Seq("text"), "ts", "10 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      in.addData(("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-01 10:01:00")),
                 ("b", ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      in.addData(("a", ts("2024-01-01 10:03:00"))) // still a duplicate in-window
      q.processAllAvailable()
      val texts = spark.table(name).select("text").collect().map(_.getString(0)).sorted.toSeq
      assert(texts == Seq("a", "b"), s"expected one row per key, got $texts")
    } finally q.stop()
  }

  test("stateful streaming sessionization matches batch sessionize") {
    import StreamOps._
    val evs = Seq(
      SessionEvent(1L, 0L), SessionEvent(1L, 1000L), SessionEvent(1L, 100000L),
      SessionEvent(2L, 50L))
    // gap 10ms=10000us -> user 1 has sessions [0,1000] then [100000]
    val ds = evs.toDS()
    // run through the stateful operator in a single micro-batch equivalent
    val out = sessionize(ds, gapMicros = 10000L)
    // in batch mode flatMapGroupsWithState only emits CLOSED sessions;
    // user1's first session closes when the 100000 event arrives
    val rows = out.collect().toSet
    assert(rows == Set(SessionOut(1L, 0L, 2)))
  }

  test("multimodal stub pipeline: features and frames are deterministic batch ops") {
    val media = (1L to 200L).map(i =>
      Multimodal.Media(i, s"media-payload-$i-${"x" * (i % 37).toInt}".getBytes, 64 + i.toInt, 48, if (i % 2 == 0) "png" else "jpg"))
    val ds = media.toDS().repartition(4)

    val feats = Multimodal.extractFeatures(ds, dims = 8).collect()
    assert(feats.length == 200 && feats.forall(_.features.length == 8))
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(ds, dims = 8).collect()
    assert(feats.sortBy(_.id).zip(again.sortBy(_.id))
      .forall { case (a, b) => a.features.sameElements(b.features) })

    val frames = Multimodal.sampleFrames(ds.limit(10), stride = 2).collect()
    assert(frames.forall(_.frames.nonEmpty))

    val table = ds.toDF()
    val pruned = Multimodal.filterByMeta(table, minWidth = 100, format = "png")
    assert(pruned.count() == media.count(m => m.width >= 100 && m.format == "png"))
  }
}
