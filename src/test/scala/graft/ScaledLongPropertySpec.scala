package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ScaledLong

/** Fuzz `scaled_long` (the BigDecimal-free decimal-cast) against the
  * REAL `TRY_CAST(double AS DECIMAL(18,s))` over random,
  * adversarial-tie, and boundary doubles — the fidelity contract that
  * must hold before any oracle-matched entry swaps its hot-loop cast
  * (r13/r14). try_cast is the comparison because the expression fixes
  * NULL-on-overflow semantics regardless of session ANSI mode (its
  * declared contract); on the non-overflow domain try_cast == cast. */
class ScaledLongPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Both sides over one DataFrame pass (exercises codegen); returns
    * (castUnscaledOrNull, exprOrNull) per input. */
  private def compare(vals: Seq[Double], scale: Int): Seq[(Option[Long], Option[Long], Double)] = {
    val df = vals.toDF("v")
    df.select(
        col("v"),
        expr(s"try_cast(v AS decimal(18,$scale))").as("d"),
        ScaledLong.scaled(col("v"), scale).as("s"))
      .collect().map { r =>
        val cast =
          if (r.isNullAt(1)) None
          else Some(r.getDecimal(1).movePointRight(scale).longValueExact())
        val got = if (r.isNullAt(2)) None else Some(r.getLong(2))
        (cast, got, r.getDouble(0))
      }.toSeq
  }

  private def assertAgree(vals: Seq[Double], scale: Int): Unit =
    compare(vals, scale).foreach { case (cast, got, v) =>
      assert(cast == got,
        s"scaled_long($v, $scale) = $got but CAST gives $cast")
    }

  test("random doubles across magnitudes agree with the cast, scale 4") {
    val rnd = new scala.util.Random(20260816L)
    val vals = (1 to 20000).map { _ =>
      val mag = math.pow(10, rnd.nextInt(22) - 6) // 1e-6 .. 1e15
      (rnd.nextDouble() - 0.5) * 2 * mag
    }
    assertAgree(vals, 4)
  }

  test("two-decimal money values (the data domain) take the exact fast path") {
    val rnd = new scala.util.Random(7L)
    val vals = (1 to 20000).map(_ => (rnd.nextInt(2000000001) - 1000000000) / 100.0)
    assertAgree(vals, 4)
    assertAgree(vals, 2)
  }

  test("adversarial half-ties, boundaries, specials") {
    val ties = (1 to 5000).map { i =>
      // values whose decimal expansion sits AT a .00005 rounding tie —
      // exactly where a naive round(v*1e4) diverges from the cast
      (i * 2 - 1) / 20000.0
    }
    val bounds = Seq(0.0, -0.0, 274877906943.9999, 274877906944.0001,
      2.74877906944e11, 1e15, -1e15, 9.999999999999e13, 1e-20, -1e-20,
      123456789012345.6789, Double.MinPositiveValue, -Double.MinPositiveValue)
    assertAgree(ties ++ bounds, 4)
    // NaN / infinities: NULL on both sides
    compare(Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity), 4)
      .foreach { case (cast, got, v) =>
        assert(cast.isEmpty && got.isEmpty, s"specials must be NULL: $v -> $got vs $cast")
      }
    // decimal(18,4) overflow: cast NULLs, so must the expression
    compare(Seq(1e15, -1e15, 9.99e14, 1.23e16), 4).foreach { case (cast, got, v) =>
      assert(cast == got, s"overflow behavior diverged at $v: $got vs $cast")
    }
  }

  test("interpreted eval matches codegen (the static helper is shared)") {
    val rnd = new scala.util.Random(99L)
    (1 to 2000).foreach { _ =>
      val v = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(18) - 4)
      val interpreted = ScaledLong.toScaled(v, 4)
      val viaDf = compare(Seq(v), 4).head._2
      assert(Option(interpreted).map(_.longValue()) == viaDf,
        s"eval/codegen split at $v")
    }
  }
}
