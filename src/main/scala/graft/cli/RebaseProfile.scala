package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off phase breakdown for the branch-rebase bench entries (r16,
  * the "Not yet optimized" #3 item): `zc_rebase_theirs` is the largest
  * single bench entry (10.2 s committed at sf0.1) and its closure spans
  * a whole lifecycle — collection build, three updateWhere rewrites,
  * the rebase itself, and a full ordered read. Before touching
  * [[graft.core.Collection.applyBranchDiff]] again (the r16 persist
  * attempt measured 3-10x WORSE), this names which phase actually
  * carries the time.
  *
  * Usage: `runMain graft.cli.RebaseProfile` with the BenchOne env
  * (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPS).
  */
object RebaseProfile {
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
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT/session warm
    def secs(ns: Long): Double = ns / 1e9
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    import graft.core.{Collection, DatePartitioning, RebaseResolve}
    val phases = Seq("build", "branch", "dev_update", "parent_update1",
      "parent_update2", "rebase", "query")
    val best = scala.collection.mutable.Map[String, Double]()
    (0 until reps).foreach { rep =>
      val ev = graft.sources.Tables.events(spark, sfDir)
      val root = s"/tmp/graft-rprof-${java.util.UUID.randomUUID().toString.take(8)}"
      val t = scala.collection.mutable.Map[String, Double]()
      def phase[A](name: String)(body: => A): A = {
        val t0 = System.nanoTime(); val r = body
        t(name) = secs(System.nanoTime() - t0); r
      }
      val c = phase("build") {
        val c = Collection.create(spark, root, ev.schema, "ts",
          DatePartitioning("ts", "D"), overwrite = true, retainGenerations = 6)
        c.insert(ev); c
      }
      val dev = phase("branch")(c.branch("dev"))
      phase("dev_update")(dev.updateWhere(
        "event_type == 'click' and day >= 10 and day <= 14",
        Map("event_type" -> "'b_click'")))
      phase("parent_update1")(c.updateWhere(
        "event_type == 'click' and day >= 12 and day <= 16",
        Map("event_type" -> "'p_click'")))
      phase("parent_update2")(c.updateWhere(
        "event_type == 'view' and day <= 3",
        Map("event_type" -> "'p_view'")))
      // per-job attribution inside the rebase: record every job's wall
      // time + call site so the 6-7 s phase names its own weight
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
      val jobSecs = new java.util.concurrent.ConcurrentHashMap[Int, Double]()
      val jl = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(e.jobId, (e.stageInfos.map(_.name).lastOption.getOrElse("?"),
            System.nanoTime()))
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(jobs.get(e.jobId)).foreach { case (_, t0) =>
            jobSecs.put(e.jobId, secs(System.nanoTime() - t0)) }
      }
      spark.sparkContext.addSparkListener(jl)
      phase("rebase")(c.rebaseBranch("dev", Seq("event_id"), RebaseResolve.Theirs))
      Thread.sleep(500) // let the async listener bus drain
      spark.sparkContext.removeSparkListener(jl)
      if (rep == reps - 1) {
        import scala.jdk.CollectionConverters._
        jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, (site, _)) =>
          val d = Option(jobSecs.get(id)).map(num(_)).getOrElse("?")
          System.err.println(s"[rprof]   rebase job $id: $d s  $site")
        }
      }
      phase("query") {
        c.query()
          .withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
          .orderBy("event_id")
          .write.format("noop").mode("overwrite").save()
      }
      System.err.println(s"[rprof] rep $rep: " +
        phases.map(p => s"$p=${num(t(p))}").mkString(" ") +
        s" total=${num(t.values.sum)}")
      phases.foreach(p => best(p) = math.min(best.getOrElse(p, Double.MaxValue), t(p)))
    }
    println(phases.map(p => s""""$p":${num(best(p))}""")
      .mkString("{", ",", s""","total_of_mins":${num(best.values.sum)}}"""))
    spark.stop()
  }
}
