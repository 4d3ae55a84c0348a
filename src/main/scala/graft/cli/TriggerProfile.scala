package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off trigger/commit-time breakdown for the streaming/lifecycle
  * bench cluster (r15, the r14 verdict's #6): proves where entries like
  * `stream_join` and `zc_transaction` spend their wall time — micro-batch
  * and commit FIXED machinery vs actual plan work — so the recurring
  * "is ~80 s of the bench total a plan problem?" audit has a recorded
  * answer instead of a re-derivation every round.
  *
  * stream_join: runs the exact entry shape (two collection streams,
  * interval join, memory sink), then aggregates Spark's own per-batch
  * `StreamingQueryProgress.durationMs` across batches, and times the
  * BATCH-equivalent interval join over the same data (the plan work if
  * there were no streaming machinery).
  *
  * zc_transaction: times the entry's three phases separately — the
  * collection BUILD (create + full insert, which the SELECT-replay
  * oracle never pays), the transaction itself (3 staged ops + 1
  * commit), and the final full-query read.
  *
  * Usage: `runMain graft.cli.TriggerProfile` with the BenchOne env
  * (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS).
  */
object TriggerProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT/session warm
    def secs(ns: Long): Double = ns / 1e9
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    // ---- stream_join ------------------------------------------------
    import graft.streaming.StreamOps
    val c = graft.SparkEntry.eventsCollection(spark, sfDir) // untimed, like Bench
    def side(tpe: String, idAs: String, tsAs: String) =
      StreamOps.readStream(spark, c)
        .where(col("event_type") === tpe)
        .select(col("user_id"), col("event_id").as(idAs), col("ts").as(tsAs))
    val name = "graft_tprof_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // r16 advice: recentProgress RETAINS only the last
    // spark.sql.streaming.numRecentProgressUpdates entries (default 100)
    // — a listener accumulates EVERY batch's durationMs, so the
    // per-phase sums stay exact however many micro-batches run
    val durations = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.name == name) {
          batches.incrementAndGet()
          e.progress.durationMs.forEach((k, v) =>
            durations.merge(k, v, (a, b) => java.lang.Long.valueOf(a + b)))
        }
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val q = StreamOps.intervalJoin(
        side("click", "click_id", "click_ts"),
        side("view", "view_id", "view_ts"),
        Seq("user_id"), "click_ts", "view_ts", "12 hours")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val streamSec = secs(System.nanoTime() - t0)
    // listener delivery is async — wait for the event bus to drain
    var settled = batches.get() - 1
    while (settled != batches.get()) { settled = batches.get(); Thread.sleep(200) }
    spark.streams.removeListener(listener)
    val nBatches = batches.get()
    if (q.recentProgress.length < nBatches)
      System.err.println(s"[tprof] note: recentProgress retained only " +
        s"${q.recentProgress.length} of $nBatches batches; sums use the listener")
    val keys = Seq("triggerExecution", "addBatch", "getBatch", "latestOffset",
      "queryPlanning", "walCommit", "commitOffsets")
    val sums = keys.map(k =>
      k -> Option(durations.get(k)).map(_.longValue).getOrElse(0L)).toMap
    // batch-equivalent plan work: same interval join over the same rows
    val bt0 = System.nanoTime()
    def bside(tpe: String, idAs: String, tsAs: String) =
      c.query().where(col("event_type") === tpe)
        .select(col("user_id"), col("event_id").as(idAs), col("ts").as(tsAs))
    StreamOps.intervalJoin(
        bside("click", "click_id", "click_ts"),
        bside("view", "view_id", "view_ts"),
        Seq("user_id"), "click_ts", "view_ts", "12 hours")
      .write.format("noop").mode("overwrite").save()
    val batchSec = secs(System.nanoTime() - bt0)
    System.err.println(s"[tprof] stream_join total ${num(streamSec)} s over " +
      s"$nBatches micro-batches; batch-equivalent join ${num(batchSec)} s")
    System.err.println("[tprof] per-phase sums (ms): " +
      keys.map(k => s"$k=${sums(k)}").mkString(" "))

    // ---- zc_transaction ---------------------------------------------
    import graft.core.{Collection, DatePartitioning, MergeStrategy}
    val ev = graft.sources.Tables.events(spark, sfDir)
    val root = s"/tmp/graft-tprof-${java.util.UUID.randomUUID().toString.take(8)}"
    val b0 = System.nanoTime()
    val fc = Collection.create(spark, root, ev.schema, "ts",
      DatePartitioning("ts", "D"), catalogEnabled = true, overwrite = true)
    fc.insert(ev)
    val buildSec = secs(System.nanoTime() - b0)
    val x0 = System.nanoTime()
    var insSec = 0.0; var delSec = 0.0; var updSec = 0.0
    fc.transaction { t =>
      val slice = graft.sources.Tables.events(spark, sfDir)
        .where(dayofmonth(col("ts")) === 5)
      val i0 = System.nanoTime()
      t.insert(slice.withColumn("event_id", col("event_id") + 20000000L)
        .withColumn("value", -col("value")), MergeStrategy.Concat)
      insSec = secs(System.nanoTime() - i0)
      val d0 = System.nanoTime()
      t.deleteWhere("event_type == 'error'")
      delSec = secs(System.nanoTime() - d0)
      val u0 = System.nanoTime()
      t.updateWhere("event_type == 'click' and day <= 3",
        Map("event_type" -> "'txn_click'"))
      updSec = secs(System.nanoTime() - u0)
    }
    val txnSec = secs(System.nanoTime() - x0)
    val commitSec = txnSec - insSec - delSec - updSec
    val q0 = System.nanoTime()
    fc.query()
      .withColumn("ts_us", unix_micros(col("ts")))
      .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .orderBy("event_id")
      .write.format("noop").mode("overwrite").save()
    val querySec = secs(System.nanoTime() - q0)
    System.err.println(s"[tprof] zc_transaction build ${num(buildSec)} s, " +
      s"txn ${num(txnSec)} s (stage insert ${num(insSec)} / delete ${num(delSec)} " +
      s"/ update ${num(updSec)} / commit ${num(commitSec)}), " +
      s"final query ${num(querySec)} s")

    println(s"""{"stream_join":{"total_sec":${num(streamSec)},"batches":$nBatches,""" +
      keys.map(k => s""""${k}_ms":${sums(k)}""").mkString(",") +
      s""","batch_equiv_sec":${num(batchSec)}},""" +
      s""""zc_transaction":{"build_sec":${num(buildSec)},"txn_sec":${num(txnSec)},""" +
      s""""insert_sec":${num(insSec)},"delete_sec":${num(delSec)},""" +
      s""""update_sec":${num(updSec)},"commit_sec":${num(commitSec)},""" +
      s""""query_sec":${num(querySec)}}}""")
    spark.stop()
  }
}
