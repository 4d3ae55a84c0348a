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
    "q7_volume", "q10_returns", "q18_large",
    "q11_stock", "q_window_topn", "q_asof_join", "q_range_join", "q_sessionize",
    "q_semi_anti", "q_rollup",
    "dedup_exact", "dedup_minhash", "dedup_cosine", "ann_bruteforce", "ann_lsh",
    "ann_ivf", "ann_quantize", "ann_int8_rerank",
    "text_quality", "text_tokens",
    "text_quality_filter", "text_decontaminate", "text_redact",
    "text_sample_split", "text_repetition", "text_pack", "text_normalize",
    "text_chunk", "text_decontaminate_ngram", "text_boilerplate",
    "text_vocab", "text_ngram_freq", "text_dedup_spans",
    "text_stratified_sample", "text_token_budget",
    "dedup_simhash_fnv", "dedup_remove_exact",
    "dedup_incremental", "dedup_incremental_near", "dedup_semantic",
    "zc_insert_query", "zc_query_filter", "zc_axis_range",
    "zc_col_zone", "zc_bloom", "zc_to_arrays", "zc_zorder", "zc_delete",
    "zc_changes", "zc_vector_search", "stream_window",
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
    // events collection with user_id zone maps + bloom filters: built once
    // (timed separately — the bloom/stat write overhead is the number a
    // deployer weighs against the skip wins of zc_col_zone / zc_bloom)
    val buildSkipSec = time { SparkEntry.skipEventsCollection(spark, sfDir) }

    // Two timed passes per query, report the min — damps scheduler and
    // page-cache noise without hiding real cost (both passes run the full
    // plan; nothing is cached between them).
    def runOnce(name: String): Double = {
      val fn = SparkEntry.queries(name)
      time {
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      }
    }
    val results = Headline.map { name =>
      name -> math.min(runOnce(name), runOnce(name))
    }

    // View alignment read over the events collection built by zc_build:
    // overlay written once (untimed), the timed part is the sort-free
    // (partCols, _zc_row) hash join of base + overlay.
    val viewSec = {
      import org.apache.spark.sql.functions.col
      val c = SparkEntry.eventsCollection(spark, sfDir)
      val vroot = c.root + "-benchview"
      val v =
        try graft.core.View.open(spark, vroot)
        catch { case _: Exception =>
          val nv = graft.core.View.create(spark, vroot, c, overwrite = true)
          nv.update(_.withColumn("value_x2", col("value") * 2))
          nv
        }
      def once = time { v.query().write.format("noop").mode("overwrite").save() }
      math.min(once, once)
    }

    // --- reference-workload suite (zcollection/benches/harness.py) ----
    // Same shape and scenario names as the reference's own bench: 12
    // monthly partitions x 50k rows, time (datetime64[s]) + ssh
    // float32[time, 240], cloud-balanced profile; ratios against
    // BASELINE.md compare like-for-like.
    val refResults = refSuite(spark)

    val qs = (Seq("zc_build" -> buildSec, "zc_build_skip" -> buildSkipSec) ++ results) ++
      Seq("view_query" -> viewSec) ++ refResults
    val qsJson = qs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = buildSec + buildSkipSec + results.map(_._2).sum + refResults.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qsJson,"sf":"$sfDir"}""")
    spark.stop()
  }

  private def refSuite(spark: SparkSession): Seq[(String, Double)] = {
    import org.apache.spark.sql.{Row, types => T}
    import graft.core._

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val nPartitions = 12
    val rowsPerPartition = 50000
    val width = 240
    val total = nPartitions.toLong * rowsPerPartition
    val schema = T.StructType(Seq(
      T.StructField("time", T.TimestampType),
      T.StructField("ssh", T.ArrayType(T.FloatType))))
    // 2024-01-01T00:00:00Z, one row per minute -> ~12 distinct months
    val epochStart = 1704067200L
    val rows = spark.range(total).rdd.mapPartitions { it =>
      val rnd = new java.util.Random(42)
      it.map { i =>
        // ~41 days/month of minutes would overflow 12 months; spread rows
        // evenly over the 12 months instead, like the reference's span
        val month = (i / rowsPerPartition).toInt
        val secondsInMonth = (i % rowsPerPartition) * 50 // stays inside a month
        val ts = java.sql.Timestamp.from(java.time.LocalDateTime
          .of(2024, month + 1, 1, 0, 0, 0)
          .plusSeconds(secondsInMonth)
          .toInstant(java.time.ZoneOffset.UTC))
        val ssh = Array.fill(width)(rnd.nextFloat())
        Row(ts, ssh)
      }
    }
    // The reference builds its numpy dataset up front, outside the timed
    // insert; match that by materializing the generated input once
    // (insert runs three passes over it: distinct keys, range sampling,
    // write — regeneration would bill three generation passes to the
    // insert number).
    val ds = spark.createDataFrame(rows, schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ds.count()
    val root = java.nio.file.Files.createTempDirectory("graft-refbench").toString + "/c"

    val insertSec = time {
      val c = Collection.create(spark, root, schema, "time",
        DatePartitioning("time", "M"), catalogEnabled = true,
        profile = "cloud-balanced")
      c.insert(ds)
    }
    ds.unpersist()
    val openSec = time { Collection.open(spark, root, readOnly = true) }
    val colRo = Collection.open(spark, root, readOnly = true)
    val queryOneSec = time {
      colRo.query("year == 2024 and month == 1")
        .write.format("noop").mode("overwrite").save()
    }
    val queryFullSec = time {
      colRo.query().write.format("noop").mode("overwrite").save()
    }
    // axis-range over a NON-partition column: partitions prune via the
    // monotonic key derivation, files via manifest zone maps
    val queryAxisSec = time {
      colRo.query("time >= '2024-11-15 00:00:00'")
        .write.format("noop").mode("overwrite").save()
    }
    Seq(
      "insert_full_dataset" -> insertSec,
      "open_collection_cold" -> openSec,
      "query_one_partition_full" -> queryOneSec,
      "query_full" -> queryFullSec,
      "query_axis_range" -> queryAxisSec)
  }
}
