package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: headline queries at SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout.
  *
  * Methodology:
  *  - every query is forced through the `noop` sink — full materialization
  *    of every column with zero write cost (a bare `count()` would let
  *    Catalyst prune the computation being measured);
  *  - the shared events collection is built once up front and reported as
  *    `zc_build` (insert throughput), so collection *queries* measure the
  *    pruned-scan path, not repeated construction;
  *  - timings are single-shot on a warm JVM (the build warms the session).
  */
object Bench {

  /** Headline set: relational, custom operators, pipeline ops, collection
    * round-trips, streaming. */
  val Headline: Seq[String] = Seq(
    "q1_pricing", "q3_shipping", "q5_local", "q6_revenue",
    "q_window_topn", "q_asof_join", "q_range_join", "q_sessionize",
    "q_semi_anti", "q_rollup",
    "dedup_exact", "dedup_minhash", "dedup_cosine", "ann_bruteforce",
    "text_quality", "text_tokens",
    "zc_insert_query", "zc_query_filter", "stream_window",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // Warm the session (executor threads, codegen, parquet codec init) so
    // the first timed entry doesn't absorb JVM start-up costs.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.sources.Tables.lineitem(spark, sfDir).limit(1000).collect()

    val buildSec = time { SparkEntry.eventsCollection(spark, sfDir) }

    val results = Headline.map { name =>
      val fn = SparkEntry.queries(name)
      val sec = time {
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      }
      name -> sec
    }

    val qs = (("zc_build" -> buildSec) +: results)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = buildSec + results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
