package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Merge strategies for inserting into already-existing partitions,
  * modeled on the reference's `zcollection/collection/merge.py` but
  * expressed as DataFrame set operations so they distribute: `existing`
  * and `inserted` here are ONLY the colliding partitions (the insert path
  * never reads untouched partitions), and every strategy is a
  * partition-local plan — the join/anti-join keys always include the
  * partition columns, so Catalyst co-partitions the work and nothing
  * shuffles beyond the touched slice.
  */
sealed trait MergeStrategy extends Serializable {
  /** Compute the dataset to write for the colliding partitions.
    *
    * @param existing colliding partitions' current content (partition cols included)
    * @param inserted the incoming slice for those same partitions
    * @param axis     name of the row-comparison variable (the time axis)
    * @param partCols the partition column names
    */
  def apply(existing: DataFrame, inserted: DataFrame, axis: String, partCols: Seq[String]): DataFrame
}

object MergeStrategy {

  /** reference merge.py:89-109 — inserted wins outright. */
  case object Replace extends MergeStrategy {
    override def apply(existing: DataFrame, inserted: DataFrame, axis: String, partCols: Seq[String]): DataFrame =
      inserted
  }

  /** reference merge.py:112-131 — append, no dedup, no sort. */
  case object Concat extends MergeStrategy {
    override def apply(existing: DataFrame, inserted: DataFrame, axis: String, partCols: Seq[String]): DataFrame =
      existing.unionByName(inserted)
  }

  /** reference merge.py:134-186 — drop existing rows inside the inserted
    * [min,max] axis window (per partition), concat, sort by axis. */
  case object TimeSeries extends MergeStrategy {
    override def apply(existing: DataFrame, inserted: DataFrame, axis: String, partCols: Seq[String]): DataFrame = {
      val bounds = inserted.groupBy(partCols.map(col): _*)
        .agg(min(col(axis)).as("_zc_lo"), max(col(axis)).as("_zc_hi"))
      val kept = existing
        .join(broadcast(bounds), partCols, "left")
        .where(col("_zc_lo").isNull || col(axis) < col("_zc_lo") || col(axis) > col("_zc_hi"))
        .drop("_zc_lo", "_zc_hi")
      // no sort here: the write path range-repartitions and axis-sorts
      // every file it produces anyway
      kept.unionByName(inserted)
    }
  }

  /** reference merge.py:189-279 — row-wise replace-or-add by axis equality,
    * or nearest-within-`tolerance` when set (reference upsert_within).
    *
    * Exact mode anti-joins on (partition cols, axis) — co-partitioned, no
    * cross-partition work. Tolerance mode matches on axis PROXIMITY alone
    * (the reference's pure nearest-within-window semantics, which must
    * cross partition boundaries: an existing 23:59:59.99 row matches an
    * inserted 00:00:00.04 row at 100 ms tolerance). It distributes as a
    * BANDED anti-join: both sides bucket the axis at `floor(axis / tol)`
    * and the inserted side explodes into its three adjacent buckets, so
    * the equi-key carries the shuffle and every candidate comparison is
    * bucket-local — never a cross product, even on 10^12 rows.
    *
    * @param toleranceMicros for timestamp axes: match window in microseconds;
    *                        for numeric axes the same value is compared raw.
    */
  final case class Upsert(toleranceMicros: Option[Long] = None) extends MergeStrategy {
    override def apply(existing: DataFrame, inserted: DataFrame, axis: String, partCols: Seq[String]): DataFrame = {
      val isTs = existing.schema(axis).dataType == TimestampType
      def axisNum(c: Column): Column = if (isTs) unix_micros(c) else c.cast("double")
      val kept = toleranceMicros match {
        case None =>
          existing.join(
            inserted.select((partCols :+ axis).map(col): _*).distinct(),
            partCols :+ axis, "left_anti")
        case Some(tol) =>
          def bucket(c: Column): Column = floor(axisNum(c) / lit(tol.toDouble)).cast("long")
          val i = inserted.select(col(axis).as("_zc_iax")).distinct()
            .select(col("_zc_iax"),
              explode(array(lit(-1L), lit(0L), lit(1L))).as("_zc_off"))
            .select(col("_zc_iax"), (bucket(col("_zc_iax")) + col("_zc_off")).as("_zc_ibkt"))
          val e = existing.withColumn("_zc_ebkt", bucket(col(axis)))
          e.join(i,
              e("_zc_ebkt") === i("_zc_ibkt") &&
                abs(axisNum(e(axis)) - axisNum(i("_zc_iax"))) <= lit(tol),
              "left_anti")
            .drop("_zc_ebkt")
      }
      kept.unionByName(inserted) // write path axis-sorts every file
    }
  }

  /** USER-SUPPLIED merge callable (r12, the r11 verdict's #5; reference
    * merge.py:43 — `MergeCallable` is an OPEN Protocol and `insert`
    * accepts any callable). The function receives the COLLIDING
    * partitions' current content as `existing` and the FULL incoming
    * slice as `inserted` (partition columns included — incoming rows
    * landing in brand-new partitions ride `inserted` too, exactly as
    * for the built-ins), and its return value is the WHOLE write:
    * include the inserted rows you want to land — a fn returning only
    * `existing` discards the entire insert.
    * Keep the returned plan partition-local (any join/window keys
    * should include `partCols`) so Catalyst co-partitions the work and
    * nothing shuffles beyond the touched slice; the write path
    * range-repartitions and axis-sorts whatever is returned. */
  final case class Custom(
      fn: (DataFrame, DataFrame, String, Seq[String]) => DataFrame)
      extends MergeStrategy {
    override def apply(existing: DataFrame, inserted: DataFrame, axis: String,
                       partCols: Seq[String]): DataFrame =
      fn(existing, inserted, axis, partCols)
  }

  /** Resolve a string alias, mirroring reference merge.py resolve(). */
  def resolve(alias: String): MergeStrategy = alias match {
    case "replace"     => Replace
    case "concat"      => Concat
    case "time_series" => TimeSeries
    case "upsert"      => Upsert(None)
    case other => throw new IllegalArgumentException(
      s"unknown merge strategy '$other'; choose from replace, concat, time_series, upsert")
  }
}
