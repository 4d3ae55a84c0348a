package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregation — a typed [[Aggregator]] (the user-facing
  * custom-aggregate API) keeping only the k best (score, id) pairs.
  *
  * Scale rationale: `row_number().over(Window.partitionBy(q))` must
  * shuffle and SORT every scored candidate; an aggregator gets map-side
  * partial aggregation, so each upstream task ships at most k rows per
  * group and the reducer merges k-bounded buffers — the classic
  * distributed top-k. Total order (score desc, id asc) keeps results
  * deterministic under any merge order.
  */
case class ScoredId(score: Double, id: Long)

class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: Seq[ScoredId] = Seq.empty

  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] = {
    if (buf.size >= k && ord.compare(in, buf.last) >= 0) buf
    else ((buf :+ in).sorted(ord)).take(k)
  }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r.sorted(ord).take(k)

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

object TopKAgg {
  /** Column form: `top_k(score, id)` -> array<struct<score,id>> of the k
    * best, ordered best-first. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), Encoders.product[ScoredId])
    (score, id) => fn(score, id)
  }
}
