package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering values as a pure composition of codegen'd
  * built-ins — no UDF, no custom expression. Each column is first
  * normalized to a 16-bit rank:
  *
  *  - numeric / timestamp columns with KNOWN [lo, hi] bounds use linear
  *    min-max scaling — neighboring values share high bits, so files
  *    clustered by the z-value carry TIGHT per-file [min,max] zone maps
  *    in every participating dimension simultaneously (the Delta/Iceberg
  *    OPTIMIZE ZORDER design);
  *  - unbounded or non-numeric columns fall back to a 16-bit hash
  *    bucket: range locality is lost, but equal values still cluster —
  *    exactly what bloom-filter skipping needs.
  *
  * The z-value interleaves up to four 16-bit ranks bit-by-bit into one
  * long: `z = .. b2(i) b1(i) b0(i) .. b2(0) b1(0) b0(0)`. Sorting by it
  * orders rows along the Z-curve, whose axis-aligned prefix boxes are
  * what per-file min/max statistics capture. */
object ZOrder {

  val Bits = 16

  /** Min-max 16-bit normalization for a numeric column (pass timestamps
    * as `unix_micros(ts)`); degenerate bounds map everything to 0. */
  def normalize16(c: Column, lo: Double, hi: Double): Column = {
    val span = hi - lo
    if (span <= 0 || span.isNaN || span.isInfinity) lit(0)
    else least(lit(Bits65535), greatest(lit(0),
      floor((c.cast("double") - lit(lo)) * lit(Bits65535.toDouble / span)).cast("int")))
  }

  private val Bits65535 = (1 << Bits) - 1

  /** Hash-bucket 16-bit rank for columns without usable bounds. */
  def hash16(c: Column): Column =
    pmod(xxhash64(c), lit(1 << Bits)).cast("int")

  /** Bits per dimension actually interleaved for `k` dimensions: the
    * code must stay OUT of the long's sign bit (bit 63), or the upper
    * half of the last dimension would signed-sort BEFORE the lower half
    * and the wrap-spanning file's min/max would cover the whole domain.
    * k<=3 keeps all 16; k=4 drops each rank's lowest bit (15x4=60). */
  def bitsFor(k: Int): Int = math.min(Bits, 63 / k)

  /** Interleave up to four 16-bit ranks into the Morton code (top
    * [[bitsFor]] bits of each rank). */
  def zvalue(ranks: Seq[Column]): Column = {
    require(ranks.nonEmpty && ranks.size <= 4,
      s"z-order interleaves 1..4 dimensions, got ${ranks.size}")
    val k = ranks.size
    val used = bitsFor(k)
    val terms = for {
      bit <- 0 until used
      (r, dim) <- ranks.zipWithIndex
    } yield shiftleft(
      shiftright(r.cast("long"), bit + (Bits - used)).bitwiseAND(lit(1L)),
      bit * k + dim)
    terms.reduce(_.bitwiseOR(_))
  }
}
