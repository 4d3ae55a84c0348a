package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** xxhash64 of every whitespace token of a document in ONE native byte
  * loop — bit-identical to
  * `transform(split(trim(text), "\\s+"), t -> xxhash64(t))`
  * (spec-pinned), but with NO token-string materialization: each field
  * hashes in place over the document's own UTF-8 bytes.
  *
  * The replicated builtin semantics, exactly (the [[TokenCounts]]
  * discipline — the same two spec-caught quirks apply):
  *
  *  - Spark `trim` strips 0x20 SPACES only (not tabs/newlines);
  *  - Spark `split` runs java `split(regex, -1)`: a LEADING `\s+` run
  *    yields an empty first field and a trailing run an empty LAST
  *    field, and the empty string yields one empty field — empty
  *    fields hash like any other (xxhash64 of zero bytes, seed 42);
  *  - java `\s` is the ASCII six (`[ \t\n\x0B\f\r]`), never Unicode
  *    spaces — all single-byte in UTF-8, so byte scanning is exact
  *    (multi-byte sequences contain no bytes < 0x80).
  *
  * This is the (doc, token)-explode feeder for hash-keyed corpus
  * aggregations (surprisal, vocabulary counting): token EQUALITY is all
  * they shuffle on, and the 64-bit hash is injective on any real
  * corpus's vocabulary — the same argument the n-gram operators
  * document for their join keys. Strings are recovered only where an
  * output needs them, via a broadcast semi-filtered second scan. */
case class TokenHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_hashes requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TokenHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)

  override def prettyName: String = "token_hashes"
}

object TokenHashes {

  /** xxhash64 of the EMPTY token (zero bytes, seed 42) — filtering
    * exploded hashes `=!= EmptyTokenHash` is the hash-side image of the
    * builtin `where(length(term) > 0)` guard: only "" maps here absent
    * a collision (the standard injectivity argument). */
  val EmptyTokenHash: Long =
    XXH64.hashUnsafeBytes(Array.emptyByteArray, Platform.BYTE_ARRAY_OFFSET, 0, 42L)

  /** Driver-side twin of Spark's `xxhash64(lit(s))` — for hashing small
    * literal sets (stopword lists) into hash-keyed filters. */
  def hashString(s: String): Long =
    XXH64.hashUTF8String(UTF8String.fromString(s), 42L)

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(u: UTF8String): ArrayData = {
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val nb = u.numBytes()
    // trim: 0x20 spaces only, both ends
    var lo = 0
    var hi = nb
    while (lo < hi && Platform.getByte(base, off + lo) == ' ') lo += 1
    while (hi > lo && Platform.getByte(base, off + hi - 1) == ' ') hi -= 1
    // fields between \s+ runs, limit = -1: leading AND trailing empty
    // fields kept, "" -> one empty field
    var cap = 8
    var out = new Array[Long](cap)
    var cnt = 0
    @inline def push(start: Int, end: Int): Unit = {
      if (cnt == cap) {
        cap *= 2
        out = java.util.Arrays.copyOf(out, cap)
      }
      out(cnt) = XXH64.hashUnsafeBytes(base, off + start, end - start, 42L)
      cnt += 1
    }
    var i = lo
    var start = lo
    while (i < hi) {
      if (isWs(Platform.getByte(base, off + i))) {
        push(start, i)
        i += 1
        while (i < hi && isWs(Platform.getByte(base, off + i))) i += 1
        start = i
      } else i += 1
    }
    push(start, hi)
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  def col(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(TokenHashes(Bridge.expression(c)))
  }
}

/** Per-document (token, count) PAIRS in one native byte loop — the
  * in-document pre-aggregation of the token stream (r16): for each
  * document, one `struct<word, cnt>` per DISTINCT whitespace token
  * (insertion order), under the exact [[TokenHashes]] tokenizer-twin
  * field semantics (0x20-only trim, ASCII-six `\s`, leading/trailing
  * empty fields kept — empty tokens count like any other).
  *
  * This is guide-§2.3 "aggregate before you shuffle" pushed below the
  * explode itself: a corpus tf/df aggregation over these pairs
  * (`groupBy(word).agg(sum(cnt), count(*))`) explodes one row per
  * distinct token per document instead of one per OCCURRENCE, and
  * needs no (word, doc) pre-aggregation and no hash→string recovery
  * join — `cnt` IS the per-(word, document) count, and one array entry
  * per document IS the df contribution. Callers key df per ROW, so the
  * document id must be row-unique (it is the documents key at every
  * call site; a duplicated id would count df per copy where a
  * (word, id) groupBy counted it once).
  *
  * Per-document state is a small open-addressing table over (offset,
  * len, xxhash64) token images — bounded by distinct tokens per
  * document, the same class as this file's other scratch buffers. */
case class TokenCountPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenCountPairs.OutType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_count_pairs requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TokenCountPairs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCountPairs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCountPairs =
    copy(child = newChild)

  override def prettyName: String = "token_count_pairs"
}

object TokenCountPairs {
  import org.apache.spark.sql.types.{StructField, StructType}

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(u: UTF8String): ArrayData = {
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val nb = u.numBytes()
    var lo = 0
    var hi = nb
    while (lo < hi && Platform.getByte(base, off + lo) == ' ') lo += 1
    while (hi > lo && Platform.getByte(base, off + hi - 1) == ' ') hi -= 1
    // entry arrays (insertion order) + open-addressing index table
    var cap = 8
    var starts = new Array[Int](cap)
    var lens = new Array[Int](cap)
    var hashes = new Array[Long](cap)
    var counts = new Array[Long](cap)
    var n = 0
    var tcap = 32 // power of two, kept < half full
    def newTable(size: Int): Array[Int] = {
      val t = new Array[Int](size)
      java.util.Arrays.fill(t, -1)
      t
    }
    var table = newTable(tcap)
    @inline def sameBytes(s1: Int, s2: Int, len: Int): Boolean = {
      var j = 0
      while (j < len && Platform.getByte(base, off + s1 + j) ==
        Platform.getByte(base, off + s2 + j)) j += 1
      j == len
    }
    def insertIdx(h: Long, e: Int): Unit = {
      var slot = (h & (tcap - 1)).toInt
      while (table(slot) >= 0) slot = (slot + 1) & (tcap - 1)
      table(slot) = e
    }
    @inline def field(start: Int, end: Int): Unit = {
      val len = end - start
      val h = XXH64.hashUnsafeBytes(base, off + start, len, 42L)
      var slot = (h & (tcap - 1)).toInt
      var done = false
      while (!done) {
        val e = table(slot)
        if (e < 0) {
          if (n == cap) {
            cap *= 2
            starts = java.util.Arrays.copyOf(starts, cap)
            lens = java.util.Arrays.copyOf(lens, cap)
            hashes = java.util.Arrays.copyOf(hashes, cap)
            counts = java.util.Arrays.copyOf(counts, cap)
          }
          starts(n) = start; lens(n) = len; hashes(n) = h; counts(n) = 1L
          table(slot) = n
          n += 1
          if (n * 2 >= tcap) { // rehash before half full
            tcap *= 2
            table = newTable(tcap)
            var e2 = 0
            while (e2 < n) { insertIdx(hashes(e2), e2); e2 += 1 }
          }
          done = true
        } else if (hashes(e) == h && lens(e) == len && sameBytes(starts(e), start, len)) {
          counts(e) += 1L
          done = true
        } else slot = (slot + 1) & (tcap - 1)
      }
    }
    var i = lo
    var start = lo
    while (i < hi) {
      if (isWs(Platform.getByte(base, off + i))) {
        field(start, i)
        i += 1
        while (i < hi && isWs(Platform.getByte(base, off + i))) i += 1
        start = i
      } else i += 1
    }
    field(start, hi)
    val rows = new Array[Any](n)
    var e = 0
    while (e < n) {
      val bytes = new Array[Byte](lens(e))
      Platform.copyMemory(base, off + starts(e), bytes, Platform.BYTE_ARRAY_OFFSET, lens(e))
      rows(e) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromBytes(bytes), counts(e)))
      e += 1
    }
    new GenericArrayData(rows)
  }

  def col(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(TokenCountPairs(Bridge.expression(c)))
  }
}

/** Per-document counts of a SMALL fixed candidate-term set, one native
  * byte loop — `counts[i]` = how many whitespace tokens equal
  * `terms(i)`, under the exact [[TokenHashes]] tokenizer-twin field
  * semantics with empty fields SKIPPED (the builtin
  * `where(length(term) > 0)` guard). The Misra–Gries verify pass:
  * exact recount of <= k sketch candidates without exploding the token
  * stream or joining — one scan, k bounded sums. */
case class CandidateTokenCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "candidate set must be non-empty")
  require(terms.forall(_.nonEmpty), "empty-string candidates can never match")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"candidate_token_counts requires a string argument, got ${child.dataType.catalogString}")

  @transient private lazy val matcher = new CandidateMatcher(terms.toArray)

  override protected def nullSafeEval(input: Any): Any =
    matcher.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matcher", matcher,
      classOf[CandidateMatcher].getName)
    defineCodeGen(ctx, ev, c => s"$ref.counts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CandidateTokenCounts =
    copy(child = newChild)

  override def prettyName: String = "candidate_token_counts"
}

object CandidateTokenCounts {
  def col(c: Column, terms: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(CandidateTokenCounts(Bridge.expression(c), terms))
  }
}

/** The shared per-task matcher: candidate UTF-8 byte images bucketed by
  * length; each non-empty field memcmps only the same-length bucket
  * (candidate sets are sketch-bounded, <= ~tens). Serializable so the
  * codegen reference ships inside the expression. */
final class CandidateMatcher(terms: Array[String]) extends Serializable {
  @transient private lazy val images: Array[Array[Byte]] =
    terms.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  @transient private lazy val byLen: java.util.HashMap[Integer, Array[Int]] = {
    val m = new java.util.HashMap[Integer, scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < images.length) {
      m.computeIfAbsent(images(i).length, _ => scala.collection.mutable.ArrayBuffer.empty)
        .append(i)
      i += 1
    }
    val out = new java.util.HashMap[Integer, Array[Int]]()
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def counts(u: UTF8String): ArrayData = {
    val out = new Array[Long](terms.length)
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val nb = u.numBytes()
    var lo = 0
    var hi = nb
    while (lo < hi && Platform.getByte(base, off + lo) == ' ') lo += 1
    while (hi > lo && Platform.getByte(base, off + hi - 1) == ' ') hi -= 1
    @inline def field(start: Int, end: Int): Unit = {
      val len = end - start
      if (len > 0) { // empty fields never match (length(term) > 0 guard)
        val bucket = byLen.get(len)
        if (bucket != null) {
          var bi = 0
          while (bi < bucket.length) {
            val idx = bucket(bi)
            val img = images(idx)
            var j = 0
            while (j < len && Platform.getByte(base, off + start + j) == img(j)) j += 1
            if (j == len) { out(idx) += 1; bi = bucket.length }
            else bi += 1
          }
        }
      }
    }
    var i = lo
    var start = lo
    while (i < hi) {
      if (isWs(Platform.getByte(base, off + i))) {
        field(start, i)
        i += 1
        while (i < hi && isWs(Platform.getByte(base, off + i))) i += 1
        start = i
      } else i += 1
    }
    field(start, hi)
    new GenericArrayData(out)
  }
}
