package graft.cli

import org.apache.spark.sql.SparkSession

/** Single-entry micro-bench for iterating on one query's plan without
  * paying the full 131-entry [[graft.Bench]] run: same session config,
  * same noop-sink materialization, same min-of-N protocol, but only the
  * entries named on the command line.
  *
  * Usage: `runMain graft.cli.BenchOne <name> [<name> ...]`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4),
  * SPARK_GRAFT_BENCH_REPS (default 3).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <queryName> [...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    graft.sources.Tables.lineitem(spark, sfDir).limit(1000).collect()
    // entries that read the shared events collection need it built (untimed)
    if (args.exists(_.startsWith("zc_")) || args.exists(_.startsWith("stream_")))
      graft.SparkEntry.eventsCollection(spark, sfDir)
    val out = args.toSeq.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val secs = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[benchone] $name ${secs.min}%.3f s (all: ${secs.map(s => f"$s%.2f").mkString(",")})")
      name -> secs.min
    }
    // Locale-pinned: the f interpolator honors the JVM default locale, so
    // a comma-decimal locale would emit {"name":0,123} — unparseable by
    // the sf1/survey scripts. Machine-read JSON always formats in ROOT.
    println(out.map { case (n, s) =>
        s""""$n":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(s))}""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
