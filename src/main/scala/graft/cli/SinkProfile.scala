package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for the foreachBatch-sink streaming entries the
  * r16 punch list left unattributed (#4): stream_upsert /
  * stream_static_join / stream_sink_table each pay a destination
  * collection build, ONE snapshot micro-batch whose body is a
  * collection operation (merge / exactly-once insert), and a full
  * ordered read. This names the split so nobody rewrites a sink path
  * that is actually floor-bound (one full-corpus insert + one read IS
  * the entry's work).
  *
  * Usage: `runMain graft.cli.SinkProfile` with the BenchOne env.
  */
object SinkProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def secs(ns: Long): Double = ns / 1e9
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    import graft.core.{Collection, DatePartitioning}
    import graft.streaming.StreamOps
    val src = graft.SparkEntry.eventsCollection(spark, sfDir) // untimed fixture

    // how many micro-batches each query ran (the entries' admission
    // default delivers the snapshot as ONE batch — assert, don't assume)
    def batches(q: org.apache.spark.sql.streaming.StreamingQuery): Int =
      q.recentProgress.count(_.numInputRows > 0)

    (0 until reps).foreach { rep =>
      // ---- stream_static_join ----
      locally {
        val t0 = System.nanoTime()
        val dim = graft.sources.Tables.customer(spark, sfDir)
          .select("c_custkey", "c_mktsegment")
        val enriched = StreamOps.enrichStatic(
            StreamOps.readStream(spark, src), dim,
            col("user_id") === col("c_custkey"))
          .select(col("event_id"), col("ts"), col("user_id"),
            col("c_mktsegment").as("segment"), col("value"))
        val root = s"/tmp/graft-sprof-e-${java.util.UUID.randomUUID().toString.take(8)}"
        val dst = Collection.create(spark, root, enriched.schema, "ts",
          DatePartitioning("ts", "D"))
        val t1 = System.nanoTime()
        val q = StreamOps.insertStream(enriched, dst, "sprof_enrich", root + "-ckpt")
        try q.processAllAvailable() finally q.stop()
        val t2 = System.nanoTime()
        dst.query().withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "ts_us", "user_id", "segment", "value")
          .orderBy("event_id")
          .write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        System.err.println(s"[sprof] stream_static_join rep $rep: " +
          s"create=${num(secs(t1 - t0))} stream=${num(secs(t2 - t1))} " +
          s"(batches=${batches(q)}) read=${num(secs(t3 - t2))} " +
          s"total=${num(secs(t3 - t0))}")
      }
      // ---- stream_upsert ----
      locally {
        val t0 = System.nanoTime()
        val stream = StreamOps.readStream(spark, src)
        val root = s"/tmp/graft-sprof-u-${java.util.UUID.randomUUID().toString.take(8)}"
        val dst = Collection.create(spark, root, stream.schema, "ts",
          DatePartitioning("ts", "D"))
        val t1 = System.nanoTime()
        val q = StreamOps.upsertStream(stream, dst, Seq("user_id"),
          struct(col("ts"), col("event_id")), "sprof_upsert", root + "-ckpt")
        try q.processAllAvailable() finally q.stop()
        val t2 = System.nanoTime()
        dst.query().withColumn("ts_us", unix_micros(col("ts")))
          .select("user_id", "ts_us", "event_id", "value")
          .orderBy("user_id")
          .write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        System.err.println(s"[sprof] stream_upsert rep $rep: " +
          s"create=${num(secs(t1 - t0))} stream=${num(secs(t2 - t1))} " +
          s"(batches=${batches(q)}) read=${num(secs(t3 - t2))} " +
          s"total=${num(secs(t3 - t0))}")
      }
    }
    spark.stop()
  }
}
