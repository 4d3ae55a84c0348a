package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bounded KMV state: the `k` unsigned-smallest DISTINCT 64-bit hashes
  * seen so far (a TreeSet under unsigned order, never larger than `k`). */
final class KmvBuffer(val k: Int) {
  val set: java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))
  def add(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last()) < 0 &&
             set.add(h) && set.size > k) { set.pollLast(); () }
  }
}

/** K-MINIMUM-VALUES distinct sketch as a native bounded-state Spark
  * aggregate ([[TypedImperativeAggregate]] — the `approx_percentile`
  * extension shape): state is the `k` unsigned-smallest distinct hashes
  * of the input column, so memory is O(k) per group no matter how many
  * rows flow through, partial aggregation combines map-side, and merge
  * is a k-bounded set union (Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD'07).
  *
  * Output struct per group:
  *  - `estimate`  — exact size while < k distinct hashes were seen;
  *    otherwise `floor((k−1)·2^64 / kth)` with `kth` read as unsigned
  *    (integer arithmetic — any engine with 128-bit integers replays
  *    the estimate bit-for-bit, unlike HLL's float register sums);
  *  - `kth_hash`  — the largest retained hash (signed 64-bit carrier);
  *  - `sample_size` — how many hashes the state holds (min(k, NDV)).
  *
  * The caller supplies the hash column (e.g. [[Fnv1a64.fingerprint]]),
  * keeping the estimator engine-replayable end-to-end. Nulls are
  * ignored, exactly like builtin `count(col)`. */
case class KmvSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, s"kmv needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("estimate", LongType, nullable = false),
    StructField("kth_hash", LongType, nullable = false),
    StructField("sample_size", IntegerType, nullable = false)))

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    other.set.forEach(h => buffer.add(h))
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val n = buffer.set.size
    val kth: Long = if (n == 0) 0L else buffer.set.last().longValue()
    val est =
      if (n < k) n.toLong
      else (BigInt(k - 1) * (BigInt(1) << 64) /
        BigInt(java.lang.Long.toUnsignedString(kth))).toLong
    InternalRow(est, kth, n)
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.set.size)
    bb.putInt(buffer.set.size)
    buffer.set.forEach(h => { bb.putLong(h); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new KmvBuffer(k)
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "kmv_sketch"
}

object KmvSketch {
  /** Aggregate Column: KMV sketch of `hash` (a 64-bit hash column). */
  def kmv(hash: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(KmvSketchAgg(Bridge.expression(hash), k).toAggregateExpression())
  }
}
