package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.FilterExpr

/** Property test: the filter mini-language's two compilation targets —
  * the driver-side predicate (partition listing) and the Catalyst Column
  * (planner pruning) — must agree on every expression, or listings and
  * scans would diverge. Expressions are generated from a deterministic
  * seed.
  */
class FilterPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20240812L)

  private def genCmp(): String = {
    val name = Seq("year", "month", "day")(rnd.nextInt(3))
    val op = Seq("==", "!=", "<", "<=", ">", ">=")(rnd.nextInt(6))
    // fractional literals against integer columns must agree across both
    // targets too (driver promotes to double, Catalyst casts)
    val v = if (rnd.nextInt(4) == 0) s"${rnd.nextInt(32)}.${rnd.nextInt(10)}"
            else rnd.nextInt(32).toString
    s"$name $op $v"
  }

  private def genIn(): String = {
    val name = Seq("year", "month", "day")(rnd.nextInt(3))
    val vals = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(32)).mkString(", ")
    val not = if (rnd.nextBoolean()) "not " else ""
    s"$name ${not}in ($vals)"
  }

  private def genNull(): String = {
    val name = Seq("year", "month", "day")(rnd.nextInt(3))
    val not = if (rnd.nextBoolean()) "not " else ""
    s"$name is ${not}null"
  }

  private def genExpr(depth: Int): String =
    if (depth == 0) rnd.nextInt(3) match {
      case 0 => genCmp()
      case 1 => genIn()
      case _ => genNull()
    }
    else rnd.nextInt(4) match {
      case 0 => s"(${genExpr(depth - 1)}) and (${genExpr(depth - 1)})"
      case 1 => s"(${genExpr(depth - 1)}) or (${genExpr(depth - 1)})"
      case 2 => s"not (${genExpr(depth - 1)})"
      case _ => genCmp()
    }

  test("driver-side eval agrees with the Catalyst column on random expressions") {
    val keys = for (y <- 2023 to 2025; m <- 1 to 12; d <- Seq(1, 15, 28)) yield (y, m, d)
    val df = keys.toDF("year", "month", "day").cache()
    for (_ <- 1 to 60) {
      val expr = genExpr(2)
      val ast = FilterExpr.parse(expr)
      val viaEval = keys.filter { case (y, m, d) =>
        FilterExpr.eval(ast, Map("year" -> y.toLong, "month" -> m.toLong, "day" -> d.toLong))
      }.toSet
      val viaColumn = df.where(FilterExpr.toColumn(ast))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      assert(viaEval == viaColumn, s"divergence on: $expr")
    }
  }

  test("evalPartition matches SQL three-valued logic exactly on complete keys (NULLs included)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val cols = Seq("year", "month", "day")
    val schema = StructType(cols.map(c => StructField(c, LongType, nullable = true)))
    for (_ <- 1 to 150) {
      val expr = genExpr(2)
      val ast = FilterExpr.parse(expr)
      val key: Map[String, Any] = cols.map(c =>
        c -> (if (rnd.nextInt(4) == 0) null else rnd.nextInt(32).toLong)).toMap
      val row = Row(cols.map(key(_).asInstanceOf[Any]): _*)
      val df = spark.createDataFrame(java.util.List.of(row), schema)
      val got = df.select(FilterExpr.toColumn(ast)).collect().head
      // the key is COMPLETE and every value comparable, so the calculus
      // must reach the EXACT SQL verdict — RowDependent here would not
      // be wrong but would silently lose native-scan claims
      val expected =
        if (got.isNullAt(0)) FilterExpr.UnknownRows
        else if (got.getBoolean(0)) FilterExpr.AllRows
        else FilterExpr.NoRows
      assert(FilterExpr.evalPartition(ast, key) == expected,
        s"'$expr' on $key: evalPartition=${FilterExpr.evalPartition(ast, key)}, " +
        s"SQL=${if (got.isNullAt(0)) "UNKNOWN" else got.getBoolean(0)}")
    }
  }

  test("evalPartition is SOUND under data-column references (sampled rows)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val cols = Seq("year", "month", "day", "v")
    val schema = StructType(cols.map(c => StructField(c, LongType, nullable = true)))
    def genMixed(depth: Int): String =
      if (depth == 0) {
        if (rnd.nextInt(3) == 0)
          s"v ${Seq("==", "!=", "<", ">=")(rnd.nextInt(4))} ${rnd.nextInt(32)}"
        else genExpr(0)
      }
      else rnd.nextInt(3) match {
        case 0 => s"(${genMixed(depth - 1)}) and (${genMixed(depth - 1)})"
        case 1 => s"(${genMixed(depth - 1)}) or (${genMixed(depth - 1)})"
        case _ => s"not (${genMixed(depth - 1)})"
      }
    val vSamples: Seq[Any] = Seq(null, 0L, 7L, 16L, 31L)
    for (_ <- 1 to 150) {
      val expr = genMixed(2)
      val ast = FilterExpr.parse(expr)
      val key: Map[String, Any] = Seq("year", "month", "day").map(c =>
        c -> (if (rnd.nextInt(4) == 0) null else rnd.nextInt(32).toLong)).toMap
      val rows = vSamples.map(v => Row(
        key("year").asInstanceOf[Any], key("month").asInstanceOf[Any],
        key("day").asInstanceOf[Any], v))
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
      val verdicts = df.select(FilterExpr.toColumn(ast)).collect().map(r =>
        if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq
      FilterExpr.evalPartition(ast, key) match {
        case FilterExpr.AllRows =>
          assert(verdicts.forall(_ == true),
            s"'$expr' on $key claimed AllRows but a sampled row disagrees: $verdicts")
        case FilterExpr.NoRows =>
          assert(verdicts.forall(_ == false),
            s"'$expr' on $key claimed NoRows but a sampled row disagrees: $verdicts")
        case FilterExpr.UnknownRows =>
          assert(verdicts.forall(_ == null),
            s"'$expr' on $key claimed uniform UNKNOWN but a sampled row " +
            s"disagrees: $verdicts")
        case FilterExpr.RowDependent => () // conservative — always sound
      }
    }
  }

  test("ZOrder property: the Column composition matches a bit-twiddling model on random ranks") {
    import graft.functions.ZOrder
    import org.apache.spark.sql.functions.col
    val spark = SparkTestSession.spark
    import spark.implicits._
    def model(ranks: Seq[Int]): Long = {
      var z = 0L
      val k = ranks.size
      val used = ZOrder.bitsFor(k)
      for (bit <- 0 until used; (r, dim) <- ranks.zipWithIndex)
        z |= (((r.toLong >> (bit + ZOrder.Bits - used)) & 1L) << (bit * k + dim))
      z
    }
    val rnd = new scala.util.Random(7)
    for (k <- 1 to 4) {
      val rows = Seq.fill(200)(Seq.fill(k)(rnd.nextInt(1 << ZOrder.Bits)))
      val df = rows.map {
        r => (r.lift(0).getOrElse(0), r.lift(1).getOrElse(0),
              r.lift(2).getOrElse(0), r.lift(3).getOrElse(0))
      }.toDF("a", "b", "c", "d")
      val cols = Seq("a", "b", "c", "d").take(k).map(col)
      val got = df.select(ZOrder.zvalue(cols)).collect().map(_.getLong(0)).toSeq
      assert(got == rows.map(model), s"k=$k z-value diverges from the model")
    }
    // monotone locality sanity: sorting 2-D points by z groups quadrants
    val pts = for (x <- 0 until 16; y <- 0 until 16) yield (x * 4096, y * 4096)
    val z = pts.map { case (x, y) => (model(Seq(x, y)), x, y) }.sorted
    val firstQuarter = z.take(64)
    assert(firstQuarter.forall { case (_, x, y) => x < 32768 && y < 32768 },
      "the first z-quarter must be exactly the low-low quadrant")
    // the sign bit stays clear at every dimensionality — max ranks
    // included — so signed sorting equals unsigned Morton order
    for (k <- 1 to 4)
      assert(model(Seq.fill(k)((1 << ZOrder.Bits) - 1)) >= 0L,
        s"k=$k max-rank z-value must not touch the sign bit")
  }
}
