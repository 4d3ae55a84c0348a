package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the greatest right timestamp that is
  * `<=` the left timestamp within the same key.
  *
  * Spark-first formulation: instead of a per-key join explosion
  * (`O(|L_k| * |R_k|)` pairs before aggregation), union the two sides with
  * a tag, and run ONE running-window pass per key ordered by time — the
  * classic scalable as-of pattern. Cost: a single shuffle on the key and a
  * sort within each key group; no intermediate blow-up, no skew from hot
  * keys beyond the sort itself. Right rows sort before left rows at equal
  * timestamps, so the match is inclusive (`right.ts <= left.ts`).
  */
object AsOf {

  /** @return `left` plus a `matchCol` column holding the as-of right
    *         timestamp (null when no right row precedes the left row). */
  def joinLastTime(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      matchCol: String = "asof_ts",
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_zc_k", leftKey)
      .withColumn("_zc_t", leftTime)
      .withColumn("_zc_tag", lit(1))
    val r = right
      .select(rightKey.as("_zc_k"), rightTime.as("_zc_t"), lit(0).as("_zc_tag"))
    // align schemas: right side carries nulls for the left payload
    val rAligned = leftCols.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(l.schema(c).dataType)))
      .select(l.columns.toSeq.map(col): _*)

    val w = Window.partitionBy(col("_zc_k"))
      .orderBy(col("_zc_t"), col("_zc_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(rAligned)
      .withColumn(matchCol,
        last(when(col("_zc_tag") === 0, col("_zc_t")), ignoreNulls = true).over(w))
      .where(col("_zc_tag") === 1)
      .drop("_zc_k", "_zc_t", "_zc_tag")
  }

  /** NEAREST-direction as-of (B49): attach the right timestamp CLOSEST
    * to each left row's time within the key — backward or forward,
    * whichever is nearer; ties prefer backward (the earlier right row),
    * optionally refusing matches farther than `toleranceMicros` — the
    * pandas `merge_asof(direction='nearest', tolerance=...)` shape the
    * altimetry-style domains pair observations with (closest reference
    * measurement, not latest).
    *
    * Same scale plan as [[joinLastTime]]: union the tagged sides, ONE
    * shuffle on the key, one sort, and TWO frames over the same window
    * (running-last backward, running-first forward) — Spark plans both
    * WindowExecs over the single sort, so nearest costs the same
    * shuffle as backward-only. No per-key pair explosion at any size. */
  def joinNearestTime(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      matchCol: String = "asof_ts",
      toleranceMicros: Option[Long] = None,
  ): DataFrame = {
    toleranceMicros.foreach(t => require(t >= 0, "tolerance must be >= 0"))
    val leftCols = left.columns.toSeq
    val isTs = left.select(leftTime).schema.head.dataType ==
      org.apache.spark.sql.types.TimestampType
    def micros(c: Column): Column = if (isTs) unix_micros(c) else c.cast("long")
    val l = left
      .withColumn("_zc_k", leftKey)
      .withColumn("_zc_t", micros(leftTime))
      .withColumn("_zc_tag", lit(1))
    val r = right
      .select(rightKey.as("_zc_k"), micros(rightTime).as("_zc_t"), lit(0).as("_zc_tag"))
    val rAligned = leftCols.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(l.schema(c).dataType)))
      .select(l.columns.toSeq.map(col): _*)

    // BOTH directions as RUNNING frames: the forward match is a running
    // last over the REVERSED order, never a [current, unboundedFollowing)
    // frame — Spark executes those by rescanning to the partition end
    // per row (O(n²) on a hot key); the reversed running frame costs one
    // extra in-partition sort and stays O(n log n). Same single key
    // shuffle: both windows share the partitioning.
    val wb = Window.partitionBy(col("_zc_k"))
      .orderBy(col("_zc_t").asc, col("_zc_tag").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wfRev = Window.partitionBy(col("_zc_k"))
      .orderBy(col("_zc_t").desc, col("_zc_tag").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val rt = when(col("_zc_tag") === 0, col("_zc_t"))
    val withBf = l.unionByName(rAligned)
      .withColumn("_zc_b", last(rt, ignoreNulls = true).over(wb))
      .withColumn("_zc_f", last(rt, ignoreNulls = true).over(wfRev))
      .where(col("_zc_tag") === 1)
    val db = col("_zc_t") - col("_zc_b")
    val df_ = col("_zc_f") - col("_zc_t")
    // tolerance is an ELIGIBILITY filter per direction (the nearest
    // in-tolerance candidate wins, even when the other direction is
    // closer but out of tolerance), never a post-hoc null-out — so
    // "nearest within tol" composes as SQL argmin over the banded pairs
    def ok(c: Column, d: Column): Column =
      toleranceMicros.fold(c.isNotNull)(t => c.isNotNull && d <= t)
    val bOk = ok(col("_zc_b"), db)
    val fOk = ok(col("_zc_f"), df_)
    // a NULL left time matches nothing (guarded explicitly: its null
    // distances would otherwise fail the backward tie-compare and fall
    // through to the forward branch — "nearest to null" = first right)
    val nearest = when(col("_zc_t").isNotNull,
      when(bOk && fOk,
        when(db <= df_, col("_zc_b")).otherwise(col("_zc_f"))) // tie -> backward
      .when(bOk, col("_zc_b"))
      .when(fOk, col("_zc_f")))
    withBf
      .withColumn(matchCol, if (isTs) timestamp_micros(nearest) else nearest)
      .drop("_zc_k", "_zc_t", "_zc_tag", "_zc_b", "_zc_f")
  }

  /** Same semantics through the NATIVE operator
    * ([[graft.plans.AsOfJoin]]): a custom LogicalPlan planned by
    * [[graft.plans.AsOfJoinStrategy]] into a co-partitioned two-pointer
    * merge ([[graft.plans.AsOfJoinExec]]) — O(|L|+|R|) per key group with
    * O(1) state, versus the window form's per-key sort buffer. */
  def joinLastTimeNative(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      matchCol: String = "asof_ts",
  ): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.graftbridge.Bridge

    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
    val lPlan = Bridge.analyzed(left)
    // Fresh exprIds on the right side so self-joins can't produce
    // ambiguous attributes (custom nodes don't get DeduplicateRelations).
    val rkAlias = Alias(Bridge.expression(right(rightKey.toString())), "_zc_rk")()
    val rtAlias = Alias(Bridge.expression(right(rightTime.toString())), "_zc_rt")()
    val rPlan = Project(Seq(rkAlias, rtAlias), Bridge.analyzed(right))
    val outAttr = AttributeReference(matchCol, rtAlias.dataType, nullable = true)()
    val node = graft.plans.AsOfJoin(
      lPlan, rPlan,
      Bridge.expression(left(leftKey.toString())),
      rkAlias.toAttribute,
      Bridge.expression(left(leftTime.toString())),
      rtAlias.toAttribute,
      outAttr)
    Bridge.ofRows(spark, node)
  }
}
