package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise mean of float vectors — the distributed k-means "update"
  * step as a typed [[Aggregator]]: map-side partial sums ship one
  * (dims-double, count) buffer per (task, group) instead of the group's
  * rows, the same partial-aggregation shape MLlib's k-means uses. Sums
  * accumulate in double; the mean is cut back to float at finish. */
case class VecSum(sums: Seq[Double], n: Long)

class VecMeanAgg extends Aggregator[Seq[Float], VecSum, Seq[Float]] {
  override def zero: VecSum = VecSum(Seq.empty, 0L)

  override def reduce(b: VecSum, v: Seq[Float]): VecSum =
    if (b.n == 0L) VecSum(v.map(_.toDouble), 1L)
    else VecSum(b.sums.zip(v).map { case (s, x) => s + x }, b.n + 1)

  override def merge(a: VecSum, b: VecSum): VecSum =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else VecSum(a.sums.zip(b.sums).map { case (x, y) => x + y }, a.n + b.n)

  override def finish(b: VecSum): Seq[Float] =
    if (b.n == 0L) Seq.empty else b.sums.map(s => (s / b.n).toFloat)

  override def bufferEncoder: Encoder[VecSum] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Float]] = ExpressionEncoder()
}

object VecMeanAgg {
  /** Column form: `vec_mean(vec)` -> array<float>. */
  def mean: Column => Column = {
    val fn = udaf(new VecMeanAgg, ExpressionEncoder[Seq[Float]]())
    v => fn(v)
  }
}
