package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded Misra–Gries state: at most `k` (term -> count) counters.
  *
  * The classic frequent-items summary (Misra & Gries 1982): an arriving
  * term increments its counter if present, claims a free counter if one
  * of the `k` slots is open, and otherwise decrements EVERY counter by
  * one (zeroed counters free their slot). Each overflow event destroys
  * `k+1` units of count (the arrival plus `k` decrements), so at most
  * `N/(k+1)` decrements ever hit any one term:
  *
  *   true_count − N/(k+1)  <=  mg_count  <=  true_count
  *
  * — every term with true frequency ABOVE `N/(k+1)` is guaranteed a
  * surviving counter, whatever the arrival order. The decrement sweep
  * is O(k) but amortized O(1)/item (total decrements <= total
  * increments = N). */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()

  def add(term: String): Unit = addCount(term, 1L)

  /** Weighted arrival; `c` must be positive. Weight `c` behaves exactly
    * like `c` repeats of `term` (decrement sweeps batch up). */
  def addCount(term: String, c: Long): Unit = {
    val cur = counts.get(term)
    if (cur != 0L || counts.containsKey(term)) counts.put(term, cur + c)
    else if (counts.size < k) counts.put(term, c)
    else {
      // no free slot: decrement all by the largest step that stays
      // valid — min(c, smallest current counter) per round, batched to
      // one sweep using the global min (equivalent to repeating the
      // unit decrement; keeps weighted merges O(k) instead of O(c·k))
      var remaining = c
      while (remaining > 0 && !counts.containsKey(term) && counts.size >= k) {
        var minC = Long.MaxValue
        val it0 = counts.values().iterator()
        while (it0.hasNext) minC = math.min(minC, it0.next())
        val step = math.min(remaining, minC)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - step
          if (nv <= 0L) it.remove() else e.setValue(nv)
        }
        remaining -= step
        // the arriving term absorbed `step` of its weight in the sweep
        // (it was being "decremented" as it arrived, per the classic
        // pairing argument); if slots freed up, the rest lands
        if (remaining > 0 && counts.size < k) {
          counts.put(term, remaining); remaining = 0
        }
      }
      // loop invariant: exits only with remaining == 0 (a sweep either
      // frees a slot — the term lands — or absorbs all remaining weight)
    }
  }

  /** Merge another summary in (Agarwal et al., "Mergeable Summaries",
    * PODS'12): pointwise add, then if over `k` counters subtract the
    * (k+1)-th largest count from all and keep the positive — the merged
    * summary keeps the combined `N/(k+1)` error bound, so partial
    * aggregates combine map-side without weakening the guarantee. */
  def merge(other: MgBuffer): Unit = {
    other.counts.forEach { (t, c) =>
      val cur = counts.get(t)
      if (cur != 0L || counts.containsKey(t)) counts.put(t, cur + c)
      else counts.put(t, c)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val it0 = counts.values().iterator()
      while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1) // (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - cut
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }
  }
}

/** MISRA–GRIES frequent-terms sketch as a native bounded-state Spark
  * aggregate (the [[KmvSketchAgg]] shape): state is at most `k`
  * counters no matter how many rows or distinct terms flow through,
  * partials combine map-side, and merge is the k-bounded mergeable-
  * summaries combine. The deterministic-guarantee companion of
  * `approx_count_distinct`-style sketches for the OTHER corpus
  * question — WHICH values dominate: at 100 TB a vocabulary groupBy
  * shuffles billions of distinct n-grams; this shuffles at most
  * `k × partitions` counters.
  *
  * Output per group: `array<struct<term string, low long>>` sorted by
  * (low DESC, term), where `low` is the surviving counter — a LOWER
  * bound on the true count with `true − low <= N/(k+1)`. The ARRAY
  * (set and counts) depends on arrival order and partitioning, as with
  * every MG summary; the GUARANTEE does not: any term with true count
  * `> N/(k+1)` appears, under every physical plan. Exact-answer
  * pipelines run the two-pass [[graft.operators.Corpus.heavyHitters]],
  * whose second pass re-counts the candidates exactly and filters to a
  * threshold the guarantee covers — making the RESULT plan-invariant.
  *
  * Nulls are ignored, like builtin `count(col)`. */
case class MgSketchAgg(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] with ExpectsInputTypes {

  require(k >= 1, s"misra-gries needs k >= 1, got $k")

  // update() casts to UTF8String — declare it so mg() over a non-string
  // column is an ANALYSIS error, not a mid-job ClassCastException
  override def inputTypes = Seq(StringType) // result type inherited (AbstractDataType is private[sql])

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("low", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: MgBuffer): Any = {
    val entries = new Array[(String, Long)](buffer.counts.size)
    var i = 0
    buffer.counts.forEach { (t, c) => entries(i) = (t, c); i += 1 }
    // deterministic presentation given the summary: count desc, term asc
    val sorted = entries.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c): Any
    })
  }

  override def serialize(buffer: MgBuffer): Array[Byte] = {
    var bytes = 4
    val items = new java.util.ArrayList[(Array[Byte], Long)](buffer.counts.size)
    buffer.counts.forEach { (t, c) =>
      val b = t.getBytes(StandardCharsets.UTF_8)
      items.add((b, c)); bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(items.size)
    items.forEach { p =>
      bb.putInt(p._1.length); bb.put(p._1); bb.putLong(p._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new MgBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val c = bb.getLong
      b.counts.put(new String(arr, StandardCharsets.UTF_8), c)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "mg_sketch"
}

object MgSketch {
  /** Aggregate Column: Misra–Gries summary of `term` (a string column),
    * at most `k` counters of state. */
  def mg(term: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MgSketchAgg(Bridge.expression(term), k).toAggregateExpression())
  }
}
