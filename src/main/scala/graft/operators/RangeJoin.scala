package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range (interval) join.
  *
  * A naive `l JOIN r ON key AND r.t BETWEEN l.t+lo AND l.t+hi` plans as a
  * join with a non-equi condition — for hot keys that degenerates into a
  * per-key cross product. The banded form buckets time into fixed windows
  * of `bandMicros`, explodes each left row into the (few) buckets its
  * interval overlaps, and joins on `(key, bucket)` BEFORE applying the
  * exact range predicate — an equi-join Catalyst can hash/sort-merge and
  * AQE can skew-split, with the explosion factor bounded by
  * `(hi-lo)/band + 1`. This is the standard distributed interval-join
  * scheme (cf. banding in interval-join literature and engines' range-join
  * optimizations).
  */
object RangeJoin {

  /** Join rows of `right` whose `rightTime` lies in
    * `[leftTime + loMicros, leftTime + hiMicros)` with the same key.
    * Times must be TimestampType. Result: all left columns plus
    * `right` columns (right side renamed with `rPrefix`).
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      loMicros: Long,
      hiMicros: Long,
      bandMicros: Long,
      rPrefix: String = "r_",
  ): DataFrame = {
    require(hiMicros > loMicros, "empty interval")
    require(bandMicros > 0, "band must be positive")

    val l = left
      .withColumn("_zc_k", leftKey)
      .withColumn("_zc_t", unix_micros(leftTime))
      .withColumn("_zc_b",
        explode(sequence(
          floor((col("_zc_t") + lit(loMicros)) / lit(bandMicros)),
          floor((col("_zc_t") + lit(hiMicros) - 1) / lit(bandMicros)))))

    val r0 = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"$rPrefix$c"))
    val r = r0
      .withColumn("_zc_rk", rightKey)
      .withColumn("_zc_rt", unix_micros(rightTime))
      .withColumn("_zc_rb", floor(col("_zc_rt") / lit(bandMicros)))

    l.join(r,
        col("_zc_k") === col("_zc_rk") && col("_zc_b") === col("_zc_rb") &&
        col("_zc_rt") >= col("_zc_t") + lit(loMicros) &&
        col("_zc_rt") < col("_zc_t") + lit(hiMicros))
      .drop("_zc_k", "_zc_t", "_zc_b", "_zc_rk", "_zc_rt", "_zc_rb")
  }
}
