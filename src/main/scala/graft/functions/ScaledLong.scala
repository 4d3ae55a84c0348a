package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `CAST(double AS DECIMAL(18, scale))`, returned as the UNSCALED long
  * — the oracle-parity decimal conversion with the BigDecimal taken off
  * the hot path (r13, prepping the r14 "decimal-cast hot loops" item).
  *
  * The repo's exactness convention sums raw doubles in DECIMAL (DuckDB
  * and Spark then agree bit-for-bit), but Spark's double→decimal cast
  * allocates `BigDecimal.valueOf(v).setScale(...)` PER VALUE — profiled
  * at 4x the cost of the aggregation it feeds. This expression computes
  * the same unscaled value through primitive arithmetic wherever that
  * is PROVABLY identical, and falls back to the exact BigDecimal path
  * everywhere else — never approximate:
  *
  *  - fast path (|v| < 2^38 ≈ 2.7e11 and `round(v·10^s)` reconstructs v
  *    exactly): the decimal rounding interval of v then contains
  *    exactly one multiple of 10^-s, so the shortest-representation
  *    rounding the real cast performs must land on it. The magnitude
  *    bound is what makes the interval (one ulp wide) too narrow to
  *    hold two distinct 10^-s multiples: ulp(2^38) = 2^-14 < 10^-4 ≤
  *    10^-s for s ≤ 4.
  *  - slow path: `BigDecimal(Double.toString(v)).setScale(s, HALF_UP)`
  *    — literally the cast's own arithmetic (Spark's Decimal.set goes
  *    through the same shortest-repr BigDecimal); precision overflow
  *    (> 18 digits) yields NULL and NaN/±Inf yield NULL likewise —
  *    TRY_CAST semantics, fixed regardless of session ANSI mode (the
  *    aggregate-parity use sums values far inside the domain; callers
  *    needing ANSI's overflow ERROR keep the real cast).
  *
  * ScaledLongPropertySpec fuzzes this against the real cast over
  * random, adversarial-tie, and boundary doubles. Aggregate usage: sum
  * the unscaled longs in DECIMAL (the long→decimal conversion is the
  * compact constructor, no BigDecimal) and rescale the single RESULT —
  * per-value object churn becomes per-group. */
case class DoubleToScaledLong(child: Expression, scale: Int)
    extends UnaryExpression {

  require(scale >= 0 && scale <= 4,
    s"scaled_long supports scales 0..4 (the fast-path proof bound), got $scale")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"scaled_long requires a double argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    ScaledLong.toScaled(input.asInstanceOf[Double], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("scaled")
      s"""
         |java.lang.Long $r = graft.functions.ScaledLong.toScaled($c, $scale);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DoubleToScaledLong =
    copy(child = newChild)

  override def prettyName: String = "scaled_long"
}

object ScaledLong {
  private val Pows = Array(1d, 10d, 100d, 1000d, 10000d)
  /** Fast-path soundness (restated r14, r13 advice): the slow path
    * HALF_UP-rounds the SHORTEST decimal representation `d` of `v` to
    * the NEAREST multiple of 10^-s, so the fast path (which returns
    * `cand` when `v == cand/10^s` exactly in doubles) is sound iff
    * `|d - cand*10^-s| <` HALF the multiple spacing (5e-5 at s=4) —
    * nearest-multiple semantics, not interval containment. Both `d`
    * and the real number `cand*10^-s` round to `v`, so each is within
    * ulp(v)/2 of `v` and `|d - cand*10^-s| <= ulp(v)`. A bound of
    * ulp <= 2^-14 (6.1e-5) would NOT suffice; the STRICT |v| < 2^38
    * does, because it caps v's binade at [2^37, 2^38), where
    * ulp(v) = 2^(37-52) = 2^-15 = 3.05e-5 < 5e-5. Any future scale or
    * bound extension must re-check ulp(bound/2) < 10^-s / 2. */
  private val FastBound = 274877906944d // 2^38

  /** Static entry point shared by interpreted eval and generated code;
    * null = the cast's NULL (NaN/Inf or decimal(18,s) overflow). */
  def toScaled(v: Double, scale: Int): java.lang.Long = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) return null
    val pow = Pows(scale)
    if (Math.abs(v) < FastBound) {
      val cand = Math.round(v * pow)
      if (cand.toDouble / pow == v) return java.lang.Long.valueOf(cand)
    }
    val bd = new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(scale, java.math.RoundingMode.HALF_UP)
    if (bd.precision > 18) null
    else java.lang.Long.valueOf(bd.unscaledValue().longValueExact())
  }

  /** Column form. */
  def scaled(c: Column, scale: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(DoubleToScaledLong(Bridge.expression(c), scale))
  }
}
