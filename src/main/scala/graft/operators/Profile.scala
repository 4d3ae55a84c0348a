package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling audit — the ANALYZE/DESCRIBE-EXTENDED shape a
  * training-data pipeline runs before committing a corpus: per column,
  * the row count, NULL count, and EXACT distinct cardinality. Every
  * output is a BIGINT, so the audit reproduces hash-exactly across
  * engines (no HLL estimate whose sketch differs per implementation —
  * when an approximate profile is acceptable at extreme cardinality,
  * `approx_count_distinct` composes the same way).
  *
  * Scale shape: ONE pass over the data — a single Aggregate carrying
  * all per-column counters; Spark plans the multi-column DISTINCT
  * aggregation with one Expand (xK columns) feeding one shuffle, the
  * canonical exact-profile plan. The only driver-side materialization
  * is the single result row, melted to one output row per column. */
object Profile {

  def columns(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols == null || cols.isEmpty) df.columns.toSeq else cols
    names.foreach(c => require(df.columns.contains(c), s"unknown column '$c'"))
    require(names.nonEmpty, "nothing to profile")
    val aggs = count(lit(1)).as("_zc_n") +: names.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_zc_null_$c"),
      count_distinct(col(c)).as(s"_zc_nd_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getAs[Long]("_zc_n")
    val out = names.map { c =>
      (c, n,
        Option(r.getAs[java.lang.Long](s"_zc_null_$c")).map(_.longValue).getOrElse(0L),
        r.getAs[Long](s"_zc_nd_$c"))
    }
    val spark = df.sparkSession
    import spark.implicits._
    out.toDF("col_name", "n_rows", "n_nulls", "n_distinct")
  }

  /** [[columns]] with APPROXIMATE distinct counts from the library's own
    * KMV sketch ([[graft.functions.KmvSketchAgg]]) — the in-pipeline
    * health check for 100 TB corpora where the exact profile's
    * Expand(×columns) + distinct shuffle is the dominant cost. This
    * variant is ONE ordinary aggregate: O(k) state per column,
    * map-side-combined partials, no Expand, no distinct shuffle — the
    * shuffle carries `columns × k` hashes total, independent of row
    * count. Estimates are EXACT below `k` distinct values per column
    * (the sketch holds them all) and carry the KMV ~`1/√k` relative
    * error above it; nulls are excluded from the distinct count exactly
    * like [[columns]]. Same output schema, so the two profiles are
    * drop-in interchangeable. */
  def columnsApprox(df: DataFrame, cols: Seq[String] = Nil, k: Int = 4096): DataFrame = {
    val names = if (cols == null || cols.isEmpty) df.columns.toSeq else cols
    names.foreach(c => require(df.columns.contains(c), s"unknown column '$c'"))
    require(names.nonEmpty, "nothing to profile")
    val aggs = count(lit(1)).as("_zc_n") +: names.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_zc_null_$c"),
      // null input -> null hash -> ignored by the sketch (count_distinct parity)
      graft.functions.KmvSketch.kmv(
        when(col(c).isNotNull, xxhash64(col(c))), k).as(s"_zc_kmv_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getAs[Long]("_zc_n")
    val out = names.map { c =>
      (c, n,
        Option(r.getAs[java.lang.Long](s"_zc_null_$c")).map(_.longValue).getOrElse(0L),
        r.getAs[org.apache.spark.sql.Row](s"_zc_kmv_$c").getLong(0))
    }
    val spark = df.sparkSession
    import spark.implicits._
    out.toDF("col_name", "n_rows", "n_nulls", "n_distinct")
  }
}
