package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` plans of representative queries to
  * `EXPLAIN.md` — the plan-level evidence for the scale claims the
  * operator docs make (pushed filters, broadcast sides, codegen spans,
  * exchange placement). Regenerate with:
  * {{{ sbt "runMain graft.Explain /root/testdata/sf0.001 EXPLAIN.md" }}}
  */
object Explain {

  /** Batch queries whose plans carry the design load: scan pushdown,
    * broadcast-vs-shuffle choices, the custom as-of operator, the
    * bucketed dedup/ANN shapes, and the skip-stack collection read. */
  val Picks: Seq[(String, String)] = Seq(
    "q1_pricing" -> "pushed scan filter + partial/final agg, one fact pass",
    "q3_shipping" -> "broadcast dims, shuffle only on the order key, top-N without global sort",
    "q_asof_join" -> "the native as-of operator: range-partitioned merge, no window Exchange",
    "dedup_minhash" -> "banding Exchange shared by candidate generation and both verify joins",
    "dedup_semantic" -> "zero-shuffle centroid assignment; ONE cluster-keyed Exchange",
    "ann_bruteforce" -> "queries broadcast; corpus vectors never shuffle",
    "ann_ivf" -> "probed-list pruning in-plan; bounded TopKAgg, no global sort",
    "text_top_terms" -> "xxhash64-keyed tf/df/join (r14); strings only in the vocabulary-sized groupBy-first recovery, nothing force-broadcast",
    "q_range_frame" -> "trailing RANGE frame as a prefix-sum difference (r14): ONE scan, one Generate point expansion, two incremental window frames - no per-row frame re-aggregation",
    "text_quality_gate" -> "corpus unsorted; distinct-score scan; broadcast cutoffs",
    "text_mixture" -> "one shuffle on the source key; budget gate inside the window projection",
    "zc_query_filter" -> "manifest-pruned file set: the scan lists only surviving files",
    "zc_sql_source" -> "DataSource filters reach the skip stack; engine re-applies them",
    "zc_clone" -> "per-base grouped scans (clone refs + local writes union); zero data copied at fork",
    "zc_branch_merge" -> "promote = CDC diff (exceptAll) + touched-partition rewrite, one commit",
    "zc_sql_count" -> "filtered COUNT answered by the metadata scan: no HashAggregate, no data files",
    "text_surprisal" -> "doc text never shuffles; word-partition window sum; map-side-combined counts",
    "zc_sql_scan" -> "NATIVE BatchScan (r9b): vectorized columnar read over manifest-planned files; partition filter claimed, value filter residual",
    "text_bm25" -> "one tokenize pass; broadcast corpus summary + tiny df join; TakeOrdered top-k, corpus text never shuffles",
    "text_kmv" -> "bounded-state KMV aggregate: partial objHashAggregate map-side, O(k) state per group",
    "text_group_split" -> "min-rep aggregate + group-key join; split decision is a scalar map",
    "text_shuffle" -> "global rank WITHOUT a global sort: (bucket)-partitioned window + broadcast offsets (r10c)",
    "dedup_keep_best" -> "quality argmax per cluster; loser set broadcast into ONE anti-join; doc text never shuffles (r10c)",
    "text_heavy_hitters" -> "bounded MG sketch pass + broadcast candidate re-count: k counters shuffle, never the vocabulary (r10d)",
    "q_asof_nearest" -> "tagged union, ONE key shuffle, two frames over one sort (running-last back + running-first fwd) (r10d)",
    "dedup_containment" -> "dense-universe regime: bitmap broadcast self-join, W codegen'd bit_count(AND) terms, pair space never shuffles (r10e)",
    "text_domain_cap" -> "bounded TopKAgg per domain + broadcast keep-set semi-join; corpus text never shuffles (r10e)",
    "q_distinct_window" -> "count(DISTINCT) OVER as first-occurrence flags: both windows partition by high-cardinality user_id (r10e)",
    "zc_delete_dv" -> "DELETION-VECTOR read: only the DV'd file pays the broadcast rowid anti-join, clean files scan plain, union above (r11)",
    "zc_schema_rename" -> "renamed-column read: scans request the PHYSICAL name, one collapsed alias Project back to the logical schema (r11)",
    "ann_filtered" -> "filtered vector search: the metadata predicate reaches the corpus scan as a pushed filter, queries broadcast (r11b)",
    "ann_diverse" -> "diversified top-k: two bounded TopKAgg stages (per-group m, global k) — no corpus-sized window or sort (r11b)",
    "zc_sql_merge_ci_cols" -> "POST-merge read after an explicit-column conditional INSERT: copy-on-write leaves a clean scan — no residual joins or masks in the read path (r12)",
    "zc_sql_delete_in2" -> "POST-delete read after a 2-column tuple-IN DELETE (the flag itself is five broadcast hash joins at statement time — exact 3VL, no nested loop): the surviving scan is plain (r12)",
    "zc_merge_custom" -> "POST-merge read after a user merge callable (keep-best window argmax keyed on the partition columns at statement time): the merged partitions scan plain (r12)",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outPath = if (args.length > 1) args(1) else "EXPLAIN.md"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb ++= "# Flagship query plans (`.explain(\"formatted\")`)\n\n"
    sb ++= s"Generated by `graft.Explain` over `$sfDir`. What to check per plan:\n"
    sb ++= "pushed filters and pruned `ReadSchema` on every scan, broadcast\n"
    sb ++= "exchanges on dimension/query/cutoff sides, `WholeStageCodegen`\n"
    sb ++= "spans covering the hot operators, and no Exchange the operator's\n"
    sb ++= "scale contract does not declare.\n"
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for ((name, claim) <- Picks) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb ++= s"\n## $name\n\n_${claim}_\n\n```\n"
      sb ++= df.queryExecution.explainString(mode).trim
      sb ++= "\n```\n"
    }
    // r10: the native WRITE command plan — INSERT INTO is a command, not
    // a queries entry, so it is dumped specially: AppendData over
    // GraftNativeWrite with the range distribution + sort the write
    // demands, no V1 fallback node, no Row-bridge re-entry.
    sb ++= nativeWritePlan(spark, sfDir)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote $outPath (${Picks.size} plans + the native write command)")
    spark.stop()
  }

  private def nativeWritePlan(spark: SparkSession, sfDir: String): String = {
    import graft.core.{Collection, DatePartitioning}
    val ev = graft.sources.Tables.events(spark, sfDir)
    val scratch = java.nio.file.Files.createTempDirectory("graft-explain-wh").toString
    Collection.create(spark, s"$scratch/db/wplan", ev.schema, "ts",
      DatePartitioning("ts", "D"), catalogEnabled = true)
    spark.conf.set("spark.sql.catalog.graftx", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftx.warehouse", scratch)
    ev.createOrReplaceTempView("explain_write_src")
    val ins = spark.sql("INSERT INTO graftx.db.wplan SELECT * FROM explain_write_src")
    "\n## INSERT INTO (native DSv2 batch write, r10)\n\n" +
      "_AppendData over GraftNativeWrite: executor-side parquet task writes\n" +
      "into final files, one atomic manifest publish in commit(); the\n" +
      "RepartitionByExpression + Sort pair is the write's demanded range\n" +
      "distribution and ordering on (partitioning inputs, axis) — the V1\n" +
      "path's layout without the V1Write re-entry._\n\n```\n" +
      ins.queryExecution.executedPlan.toString.trim + "\n```\n"
  }
}
