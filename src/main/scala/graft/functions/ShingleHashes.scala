package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word k-shingles of a token array, as ONE native loop.
  *
  * Two modes, both bit-identical to the builtin compositions they
  * replace (spec-pinned in CorpusSpec/PipelineSpec):
  *
  *  - `distinct = true, emptyBelowK = false` (the dedup path, the
  *    original r-early behavior): `array_distinct(transform(sequence(1,
  *    n-k+1), i -> xxhash64(concat_ws(" ", slice(toks, i, k)))))` with
  *    the whole-document fallback when n < k — MinHash/SimHash inputs
  *    where a short doc must still produce one fingerprintable shingle;
  *  - `emptyBelowK = true` (the corpus-text path, r16): documents
  *    shorter than `k` tokens contribute NO shingles — the exclusion
  *    n-gram decontamination / novelty / frequency operators specify —
  *    and `distinct = false` keeps every occurrence for frequency
  *    counting.
  *
  * Shingles join with a single space (concat_ws skips nulls), hash with
  * XxHash64 seed 42 over the UTF-8 bytes (Spark's `xxhash64`), or
  * FNV-1a when `fnv = true` (the byte-fold an external SQL oracle
  * replays). The r16 rewrite hashes each window out of ONE thread-local
  * byte buffer — no per-window UTF8String concat, no `transform`
  * interpreted lambda, no slice allocation.
  */
case class ShingleHashes(child: Expression, k: Int, fnv: Boolean = false,
                         distinct: Boolean = true, emptyBelowK: Boolean = false)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes requires array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], k, fnv, distinct, emptyBelowK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.compute($c, $k, $fnv, $distinct, $emptyBelowK)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

/** The shared window-joiner: copies the k window tokens + single-space
  * separators into one growable thread-local byte buffer and hashes the
  * bytes in place — byte-identical to hashing `concat_ws(" ", window)`
  * (XXH64 over UTF-8 bytes is position-independent of the base object).
  * One instance per thread; tasks are single-threaded so reuse is safe
  * and steady-state allocation is zero. */
private[functions] final class WindowHasher {
  private var buf: Array[Byte] = new Array[Byte](256)

  /** Byte length + fill for tokens [from, from+len); returns the joined
    * byte count in `buf` (nulls skipped, concat_ws semantics). */
  private def fill(toks: ArrayData, from: Int, len: Int): Int = {
    var total = 0
    var cnt = 0
    var i = 0
    while (i < len) {
      val t = toks.getUTF8String(from + i)
      if (t != null) { total += t.numBytes(); cnt += 1 }
      i += 1
    }
    if (cnt > 1) total += cnt - 1
    if (buf.length < total) buf = new Array[Byte](math.max(total, buf.length * 2))
    var pos = 0
    var first = true
    i = 0
    while (i < len) {
      val t = toks.getUTF8String(from + i)
      if (t != null) {
        if (!first) { buf(pos) = ' '; pos += 1 }
        t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
        pos += t.numBytes()
        first = false
      }
      i += 1
    }
    pos
  }

  def hash(toks: ArrayData, from: Int, len: Int, fnv: Boolean): Long = {
    val n = fill(toks, from, len)
    if (fnv) Fnv1a64.hashBytes(buf, n)
    else XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, n, 42L)
  }

  /** The joined window as a fresh UTF8String (the string-recovery path). */
  def string(toks: ArrayData, from: Int, len: Int): UTF8String = {
    val n = fill(toks, from, len)
    UTF8String.fromBytes(java.util.Arrays.copyOf(buf, n))
  }
}

private[functions] object WindowHasher {
  val local: ThreadLocal[WindowHasher] =
    ThreadLocal.withInitial(() => new WindowHasher)
}

object ShingleHashes {

  def compute(toks: ArrayData, k: Int, fnv: Boolean, distinct: Boolean,
              emptyBelowK: Boolean): ArrayData = {
    val h = WindowHasher.local.get()
    val n = toks.numElements()
    if (n < k) {
      if (emptyBelowK) return new GenericArrayData(Array.emptyLongArray)
      return new GenericArrayData(Array(h.hash(toks, 0, n, fnv)))
    }
    val m = n - k + 1
    if (distinct) {
      // LinkedHashSet = first-occurrence order, array_distinct semantics
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i < m) { seen.add(h.hash(toks, i, k, fnv)); i += 1 }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](m)
      var i = 0
      while (i < m) { out(i) = h.hash(toks, i, k, fnv); i += 1 }
      new GenericArrayData(out)
    }
  }

  def shingles(tokens: Column, k: Int, fnv: Boolean = false,
               distinct: Boolean = true, emptyBelowK: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ShingleHashes(Bridge.expression(tokens), k, fnv, distinct, emptyBelowK))
  }
}

/** Per-document (window-hash, count) PAIRS over the k-token windows —
  * the in-document pre-aggregation of the gram stream (r16b, the
  * [[TokenCountPairs]] shape one level up): one `struct<gh, cnt>` per
  * DISTINCT window hash (first-occurrence order), `emptyBelowK = true`
  * semantics (documents shorter than `k` tokens contribute nothing).
  * A corpus tf/df aggregation over these pairs explodes one row per
  * distinct gram per document instead of one per occurrence —
  * `sum(cnt)` is tf and one array entry per document is the df
  * contribution, exactly the previous `groupBy(gh, doc)` frame. */
case class ShingleHashCountPairs(child: Expression, k: Int, fnv: Boolean = false)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ShingleHashCountPairs.OutType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hash_count_pairs requires array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashCountPairs.compute(input.asInstanceOf[ArrayData], k, fnv)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashCountPairs.compute($c, $k, $fnv)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashCountPairs =
    copy(child = newChild)

  override def prettyName: String = "shingle_hash_count_pairs"
}

object ShingleHashCountPairs {
  import org.apache.spark.sql.types.{StructField, StructType}

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("gh", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  def compute(toks: ArrayData, k: Int, fnv: Boolean): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(new Array[AnyRef](0))
    val h = WindowHasher.local.get()
    val m = n - k + 1
    // LinkedHashMap = first-occurrence order (determinism; the order is
    // aggregated away downstream)
    val seen = new java.util.LinkedHashMap[java.lang.Long, Array[Long]]()
    var i = 0
    while (i < m) {
      val gh = java.lang.Long.valueOf(h.hash(toks, i, k, fnv))
      val c = seen.get(gh)
      if (c == null) seen.put(gh, Array(1L)) else c(0) += 1L
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey.longValue(), e.getValue()(0)))
      j += 1
    }
    new GenericArrayData(out)
  }

  def shingles(tokens: Column, k: Int, fnv: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ShingleHashCountPairs(Bridge.expression(tokens), k, fnv))
  }
}

/** Word k-gram shingles as STRINGS in one native loop — every window,
  * in order, NO shingles below `k` tokens: bit-identical to
  * `when(n >= k, transform(sequence(1, n-k+1), i -> concat_ws(" ",
  * slice(toks, i, k)))).otherwise(array())` (`array_join(slice, " ")`
  * is the same function on null-free token arrays). The string-RECOVERY
  * scan of hash-counted n-gram operators: only the counting pass needs
  * hashes, but winners must surface their text. With `distinct = true`
  * each document emits each gram string ONCE (first-occurrence order) —
  * the recovery consumers group by the gram and take `first`, so
  * per-document multiplicity is dead weight they no longer pay. */
case class WordShingleStrings(child: Expression, k: Int, distinct: Boolean = false)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingle_strings requires array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    WordShingleStrings.compute(input.asInstanceOf[ArrayData], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingleStrings.compute($c, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleStrings =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_strings"
}

object WordShingleStrings {
  def compute(toks: ArrayData, k: Int, distinct: Boolean): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(new Array[AnyRef](0))
    val h = WindowHasher.local.get()
    val m = n - k + 1
    if (distinct) {
      // LinkedHashSet = first-occurrence order, array_distinct semantics
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i < m) { seen.add(h.string(toks, i, k)); i += 1 }
      val out = new Array[AnyRef](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[AnyRef](m)
      var i = 0
      while (i < m) { out(i) = h.string(toks, i, k); i += 1 }
      new GenericArrayData(out)
    }
  }

  def shingles(tokens: Column, k: Int, distinct: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WordShingleStrings(Bridge.expression(tokens), k, distinct))
  }
}

/** WINNERS-ONLY gram-string recovery (r16c): `(gh, ngram)` structs for
  * exactly the k-token windows whose hash is in `winners` — the
  * hash-counted top-n-gram operators' second scan, with the winning-hash
  * broadcast-semi-filter pushed INSIDE the scan expression. The previous
  * recovery materialized EVERY distinct gram string per document, hashed
  * each string again, and dropped almost all of them in a join; this
  * loop hashes each window from the shared byte buffer (never building
  * the string) and materializes text only on a winner hit. Distinct per
  * document on the hash (its consumer takes `first` per hash — equal
  * strings under injectivity, the operator's documented argument), empty
  * below `k` tokens. `winners` is bounded by the caller's broadcast gate
  * (the same cardinality that was previously broadcast as a join side),
  * so the literal set is small by construction. */
case class WinnerShingleStrings(child: Expression, k: Int, winners: Array[Long])
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = WinnerShingleStrings.OutType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winner_shingle_strings requires array<string>, got ${other.catalogString}")
    }

  @transient private lazy val winnerSet: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long](math.max(16, winners.length * 2))
    winners.foreach(w => s.add(java.lang.Long.valueOf(w)))
    s
  }

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(new Array[AnyRef](0))
    val h = WindowHasher.local.get()
    val m = n - k + 1
    // LinkedHashSet on the hash = first-occurrence order, one emission
    // per distinct winner gram per document
    var seen: java.util.LinkedHashSet[java.lang.Long] = null
    var out: java.util.ArrayList[AnyRef] = null
    var i = 0
    while (i < m) {
      val gh = java.lang.Long.valueOf(h.hash(toks, i, k, fnv = false))
      if (winnerSet.contains(gh)) {
        if (seen == null) {
          seen = new java.util.LinkedHashSet[java.lang.Long]()
          out = new java.util.ArrayList[AnyRef]()
        }
        if (seen.add(gh))
          out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](gh.longValue(), h.string(toks, i, k))))
      }
      i += 1
    }
    if (out == null) new GenericArrayData(new Array[AnyRef](0))
    else new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnerShingles", this,
      classOf[WinnerShingleStrings].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnerShingleStrings =
    copy(child = newChild)

  override def prettyName: String = "winner_shingle_strings"
}

object WinnerShingleStrings {
  import org.apache.spark.sql.types.{StructField, StructType}

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("gh", LongType, nullable = false),
    StructField("ngram", StringType, nullable = false))), containsNull = false)

  def shingles(tokens: Column, k: Int, winners: Array[Long]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WinnerShingleStrings(Bridge.expression(tokens), k, winners))
  }
}

/** Distinct hashed character k-gram shingles of a string, one native loop
  * — bit-identical to `array_distinct(transform(sequence(1, n-k+1), i ->
  * xxhash64(substr(s, i, k))))` with the n < k whole-string fallback.
  * Substrings index CHARACTERS (UTF8String.substringSQL semantics). */
case class CharShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_shingle_hashes requires string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CharShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharShingleHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "char_shingle_hashes"
}

object CharShingleHashes {
  def compute(s: UTF8String, k: Int): ArrayData = {
    val n = s.numChars()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n >= k) {
      var i = 0
      while (i <= n - k) {
        seen.add(XXH64.hashUTF8String(s.substringSQL(i + 1, k), 42L))
        i += 1
      }
    } else {
      seen.add(XXH64.hashUTF8String(s, 42L))
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def shingles(str: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(CharShingleHashes(Bridge.expression(str), k))
  }
}
