package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** MinHash signature as a native Catalyst expression.
  *
  * Computes, for a hashed-shingle array, `min over shingles of
  * xxhash64(shingle, perm)` for each of `numPerms` permutations — in one
  * tight JVM loop over the array instead of `numPerms` interpreted
  * higher-order `transform` passes (HOF lambdas are CodegenFallback and
  * box every element). Bit-identical to the
  * `xxhash64(shingle, lit(perm))` composition it replaces (same seeded
  * xxhash chaining), so LSH candidate sets are unchanged.
  */
case class MinHashSig(child: Expression, numPerms: Int, fnv: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires array<bigint>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numPerms, fnv)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.MinHashSig.compute($c, $numPerms, $fnv)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {

  private val FnvPrime = 0x100000001b3L

  /** Shared by interpreted eval and generated code. Default mode
    * reproduces the seed chaining of the two-argument
    * `xxhash64(shingle, permLiteral)` builtin: `hash(perm: INT, seed =
    * hash(shingle: LONG, seed = 42))` (the permutation literal is an
    * IntegerType in the builtin form).
    *
    * `fnv = true` derives permutation `p` by folding `p` into the
    * (FNV-1a) shingle hash as one more FNV byte: `(h ^ p) * prime`,
    * wrapping mod 2^64 — exactly the arithmetic DuckDB replays in
    * HUGEINT, so an FNV-shingled MinHash estimate is SQL-provable
    * end-to-end. Permutation count is capped at 256 so `p` stays one
    * byte. Signed-long mins on both sides. */
  def compute(shingles: ArrayData, numPerms: Int, fnv: Boolean): ArrayData = {
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getLong(i)
      if (fnv) {
        var p = 0
        while (p < numPerms) {
          val h = (s ^ p) * FnvPrime
          if (h < mins(p)) mins(p) = h
          p += 1
        }
      } else {
        val h1 = XxHash64Function.hash(java.lang.Long.valueOf(s), LongType, 42L)
        var p = 0
        while (p < numPerms) {
          val h = XxHash64Function.hash(java.lang.Integer.valueOf(p), IntegerType, h1)
          if (h < mins(p)) mins(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def signature(shingles: Column, numPerms: Int, fnv: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    require(!fnv || numPerms <= 256, "fnv permutation derivation folds the perm " +
      s"index as a single byte; numPerms must be <= 256, got $numPerms")
    Bridge.column(MinHashSig(Bridge.expression(shingles), numPerms, fnv))
  }
}
