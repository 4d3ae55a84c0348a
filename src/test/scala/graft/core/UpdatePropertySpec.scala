package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property test for [[Collection.updateWhere]]: random filter
  * expressions (the [[DeletePropertySpec]] grammar — partition AND data
  * atoms, NULL-bearing columns) drive sequential expression updates on
  * TWIN collections, classic and DELETION-VECTOR-enabled (whose
  * updateWhere masks the old rows and appends updated copies), and both
  * must equal the Catalyst-computed expectation. A second update
  * composes over the first's output — on the DV twin that exercises
  * reading appended copies under earlier masks. */
class UpdatePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260816L)

  private def genCmp(): String = rnd.nextInt(3) match {
    case 0 => s"day ${Seq("==", "!=", "<", "<=", ">", ">=")(rnd.nextInt(6))} ${1 + rnd.nextInt(4)}"
    case 1 => s"user_id ${Seq("==", "!=", "<", "<=", ">", ">=")(rnd.nextInt(6))} ${rnd.nextInt(30)}"
    case _ => s"v ${Seq("<", "<=", ">", ">=")(rnd.nextInt(4))} ${rnd.nextInt(20)}.${rnd.nextInt(10)}"
  }

  private def genLeaf(): String = rnd.nextInt(4) match {
    case 0 => s"user_id ${if (rnd.nextBoolean()) "not " else ""}in (${Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(30)).mkString(", ")})"
    case 1 => s"user_id is ${if (rnd.nextBoolean()) "not " else ""}null"
    case _ => genCmp()
  }

  private def genExpr(depth: Int): String =
    if (depth == 0) genLeaf()
    else rnd.nextInt(4) match {
      case 0 => s"(${genExpr(depth - 1)}) and (${genExpr(depth - 1)})"
      case 1 => s"(${genExpr(depth - 1)}) or (${genExpr(depth - 1)})"
      case 2 => s"not (${genExpr(depth - 1)})"
      case _ => genLeaf()
    }

  test("update-then-query equals the Catalyst expectation; DV twin matches") {
    val rows = (0L until 120L).map { i =>
      val uid: java.lang.Long = if (i % 11 == 0) null else java.lang.Long.valueOf(i % 30)
      (i, f"2024-01-0${1 + (i % 3)}%d 0${i % 10}%d:00:00", uid, (i % 40) / 2.0)
    }
    val df = rows.toDF("id", "ts", "user_id", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    df.cache().count()

    for (i <- 1 to 8) {
      val e1 = genExpr(2)
      val e2 = genExpr(1)
      def create(root: String, dv: Boolean) = {
        val c = Collection.create(spark, root, df.schema, "ts",
          DatePartitioning("ts", "D"),
          statsColumns = Seq("user_id", "v"), bloomColumns = Seq("user_id"),
          attrs = if (dv) Map(Collection.DvEnabledAttr -> "true") else Map.empty)
        c.insert(df)
        c
      }
      val c = create(SparkTestSession.tmp(s"graft-updprop-$i"), dv = false)
      val cdv = create(SparkTestSession.tmp(s"graft-updprop-dv-$i"), dv = true)
      for (t <- Seq(c, cdv)) {
        t.updateWhere(e1, Map("v" -> "v + 100.0"))
        t.updateWhere(e2, Map("v" -> "-v")) // composes over the first's output
      }
      def hit(e: String) = coalesce(FilterExpr.toColumn(FilterExpr.parse(e)), lit(false))
      val want = df.withColumn("day", dayofmonth(col("ts")).cast("int"))
        .withColumn("v", when(hit(e1), col("v") + 100.0).otherwise(col("v")))
        .withColumn("v", when(hit(e2), -col("v")).otherwise(col("v")))
        .select("id", "v").as[(Long, Double)].collect().sorted.toSeq
      def got(t: Collection) =
        t.query().select("id", "v").as[(Long, Double)].collect().sorted.toSeq
      assert(got(c) == want, s"iteration $i, exprs: $e1 | $e2")
      assert(got(cdv) == want, s"iteration $i (DV twin), exprs: $e1 | $e2")
      assert(cdv.countRows() == 120L,
        s"iteration $i: updates never change the live-row count")
    }
  }
}
