package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable EXCLUSIVE PREFIX SUM over `(group, order)` — the two-pass
  * decomposition that replaces `Window.partitionBy(group).orderBy(order)`
  * wherever a single group can outgrow one task (a pretraining recipe
  * has ~10 sources over 100 TB: the plain window puts ~10 TB through one
  * task's sort; this shape's parallelism follows the data volume).
  *
  * The caller supplies a deterministic BUCKET column that coarsens the
  * order key. Requirements on `bucket`:
  *
  *  1. **deterministic** (a pure function of row values — never
  *     `spark_partition_id()` or `rand()`: the plan evaluates its input
  *     twice, once for local sums and once for bucket subtotals, and a
  *     physical-placement bucket could disagree between the two,
  *     corrupting the offsets; a data-derived bucket cannot);
  *  2. **weakly monotone in the order key within each group** (rows in a
  *     smaller bucket must never order after rows in a larger one) —
  *     `shiftright(hashPos, 42)` over a `pmod(fp, 2^50)` hash position,
  *     `floor(score * 2^20)` over a numeric score, `floor(id / 1024)`
  *     over a dense id all qualify;
  *  3. **bounded in distinct count** — the per-bucket subtotals table
  *     (≤ |groups| × |buckets| rows, three skinny columns) broadcasts as
  *     the offset side. 2^8–2^12 buckets is the right order: parallelism
  *     per group equals the occupied bucket count, and the broadcast
  *     stays in the kilobyte–megabyte range for recipe-sized group sets.
  *
  * Two-pass shape (both passes shuffle on `(group, bucket)` — Catalyst
  * reuses the exchange): pass 1 computes the running sum LOCAL to each
  * `(group, bucket)` cell plus per-cell subtotals; pass 2 turns the
  * subtotals into exclusive per-cell OFFSETS with a window over the
  * aggregate rows (per group: one row per occupied bucket — aggregate
  * cardinality, never data cardinality) and broadcasts them back. The
  * result is bit-identical to the single-window formulation for ANY
  * bucket choice satisfying (2) — a degenerate `lit(0L)` bucket IS the
  * single-window plan, so callers with genuinely small groups lose
  * nothing by routing through here.
  *
  * Reference behavior being scaled: zcollection sizes per-partition work
  * with Dask graphs (collection/base.py `map`/`update` per-partition
  * tasks); this is the Spark-first counterpart for the order-dependent
  * corpus operators that cannot partition by the collection axis.
  */
object PrefixSum {

  /** Appends `out` = the exclusive prefix sum of `value` over rows
    * ordered by `order` within `group` (the sum of `value` over all
    * strictly-earlier rows; 0 for each group's first row). Ties in the
    * full order key resolve arbitrarily but consistently — supply a
    * unique tiebreak column (every caller in this library orders by
    * `(..., id)`) for a deterministic result. */
  def exclusive(df: DataFrame, group: Seq[Column], order: Seq[Column],
                value: Column, bucket: Column, out: String): DataFrame = {
    require(order.nonEmpty, "prefix sum requires an order")
    val gNames = group.indices.map(i => s"_ps_g$i")
    val base = group.zip(gNames)
      .foldLeft(df) { case (d, (c, n)) => d.withColumn(n, c) }
      .withColumn("_ps_b", bucket)
      .withColumn("_ps_v", value) // materialized pre-shuffle: evaluated once
    val cellKeys = (gNames :+ "_ps_b").map(col)
    // pass 1: running sum local to the (group, bucket) cell — the heavy
    // window, partitioned by the cell key so parallelism follows the
    // occupied-cell count, not the group count
    val local = base.withColumn("_ps_local",
      coalesce(sum(col("_ps_v")).over(Window.partitionBy(cellKeys: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // pass 2: per-cell subtotals -> exclusive offsets. This branch
    // RE-SCANS the input COLUMN-PRUNED to (group, bucket, value) with
    // map-side partial aggregation — its exchange carries only cell
    // aggregates, never rows. A second narrow scan is the classic
    // two-pass prefix-sum cost and the deliberate trade: the single-
    // window plan saves the scan but pays a whole group through one
    // task's sort, which is what dies at scale. The offsets window then
    // runs over AGGREGATE rows (one per occupied cell), partitioned by
    // group and ordered by bucket — per group at most |buckets| rows.
    val subs = base.groupBy(cellKeys: _*).agg(sum(col("_ps_v")).as("_ps_sub"))
    val offs = subs
      .withColumn("_ps_off",
        sum(col("_ps_sub")).over(Window.partitionBy(gNames.map(col): _*)
          .orderBy(col("_ps_b")).rowsBetween(Window.unboundedPreceding, -1)))
      // a missing join partner coalesces to 0 below, so zero offsets
      // (every group's first occupied bucket) need not ship at all
      .where(col("_ps_off").isNotNull && col("_ps_off") =!= 0)
      .select((gNames.map(n => col(n).as(s"${n}_o")) :+
        col("_ps_b").as("_ps_b_o") :+ col("_ps_off")): _*)
    // null-safe join: a null group key is a legitimate group (the window
    // formulation keeps it), and a null bucket (null order key) groups
    // consistently on both sides
    val cond = (gNames.map(n => col(n) <=> col(s"${n}_o")) :+
      (col("_ps_b") <=> col("_ps_b_o"))).reduce(_ && _)
    local.join(broadcast(offs), cond, "left")
      .withColumn(out, col("_ps_local") + coalesce(col("_ps_off"), lit(0L)))
      .drop((gNames ++ gNames.map(n => s"${n}_o") ++
        Seq("_ps_b", "_ps_v", "_ps_b_o", "_ps_local", "_ps_off")): _*)
  }

  /** The standard bucket for this library's deterministic hash-order
    * samplers: a `pmod(fp, 2^50)` ring position coarsened to 256
    * equal-width cells. The fingerprint is uniform by construction, so
    * the cells are balanced without sampling. */
  def hashPosBucket(pos: Column): Column = shiftright(pos, 42)
}
