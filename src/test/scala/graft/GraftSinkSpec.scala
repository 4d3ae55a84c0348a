package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Collection, DatePartitioning, MergeStrategy}
import graft.streaming.GraftSink

/** `writeStream.format("graft")` — the NATIVE streaming sink
  * (GraftCollectionSourceProvider.createSink → GraftSink): each
  * micro-batch lands through insertStreamBatch, whose (streamName,
  * batchId) high-water mark commits atomically with the rows. Same
  * exactly-once contract as the foreachBatch path, zero boilerplate. */
class GraftSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val ddl = "id BIGINT, ts TIMESTAMP, v DOUBLE"
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def mkColl(root: String): Collection =
    Collection.create(spark, root,
      org.apache.spark.sql.types.StructType.fromDDL(ddl), "ts",
      DatePartitioning("ts", "D"))

  test("writeStream.format(graft) lands micro-batches exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = SparkTestSession.tmp("sinkfmt")
    val c = mkColl(root)
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = in.toDF().toDF("id", "ts", "v")
      .writeStream.format("graft")
      .option("path", root)
      .option("streamName", "fmt-sink")
      .option("checkpointLocation", SparkTestSession.tmp("sinkfmt-ckpt"))
      .start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00"), 1.0), (2L, ts("2024-01-02 10:00:00"), 2.0))
      q.processAllAvailable()
      assert(c.query().count() == 2)
      in.addData((3L, ts("2024-01-03 10:00:00"), 3.0))
      q.processAllAvailable()
      assert(c.query().orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
    assert(c.streamHighWaterMark("fmt-sink").exists(_ >= 1L),
      "the stream high-water mark must commit with the data")
  }

  test("a replayed batch id is a detected no-op; distinct streams are independent") {
    import spark.implicits._
    val root = SparkTestSession.tmp("sinkreplay")
    val c = mkColl(root)
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 1.0)).toDF("id", "ts", "v")
    val sink = new GraftSink(spark, root, "s1", MergeStrategy.Concat)
    sink.addBatch(0, df)
    sink.addBatch(0, df) // crash-replay of the same batch: no-op
    assert(c.query().count() == 1, "a replayed batch id must not double-insert")
    sink.addBatch(1, df)
    assert(c.query().count() == 2)
    // a DIFFERENT stream name has its own high-water mark
    new GraftSink(spark, root, "s2", MergeStrategy.Concat).addBatch(0, df)
    assert(c.query().count() == 3)
  }

  test("checkpoint restart: a second query over the same checkpoint never double-lands") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = SparkTestSession.tmp("sinkrestart")
    val c = mkColl(root)
    val ckpt = SparkTestSession.tmp("sinkrestart-ckpt")
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    def start() = in.toDF().toDF("id", "ts", "v")
      .writeStream.format("graft")
      .option("path", root).option("streamName", "restart")
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00"), 1.0))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(c.query().count() == 1)

    // the restarted query re-plans from the checkpoint; the collection's
    // high-water mark (not sink state — there is none) dedupes batches
    val q2 = start()
    try {
      in.addData((2L, ts("2024-01-02 10:00:00"), 2.0))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(c.query().orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "a checkpoint restart must not re-land committed batches")
  }

  test("merge=upsert option: axis-matching micro-batch rows replace") {
    import spark.implicits._
    val root = SparkTestSession.tmp("sinkupsert")
    val c = mkColl(root)
    c.insert(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-01 11:00:00"), 2.0)).toDF("id", "ts", "v"))
    // provider-parsed options (the writeStream.option surface)
    val sink = new graft.streaming.GraftCollectionSourceProvider().createSink(
      spark.sqlContext,
      Map("path" -> root, "merge" -> "upsert", "streamName" -> "up"),
      Nil, org.apache.spark.sql.streaming.OutputMode.Update())
    sink.asInstanceOf[GraftSink].addBatch(0,
      Seq((9L, ts("2024-01-01 10:00:00"), 10.0)).toDF("id", "ts", "v"))
    val rows = c.query().orderBy("ts").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(rows == Seq((9L, 10.0), (2L, 2.0)),
      s"the axis-matching row must be replaced, the other carried: $rows")
  }
}
