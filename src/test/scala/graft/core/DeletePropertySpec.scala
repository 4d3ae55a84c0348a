package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property test for [[Collection.deleteWhere]]: for random filter
  * expressions over partition AND data columns (with NULLs planted),
  * delete-then-query must equal the SQL-DELETE complement computed by
  * Catalyst on the original frame — rows where the predicate is not
  * TRUE. Any unsound file-level skip (zone map, bloom, null counts,
  * schema generations) would surface as a row surviving that should
  * have died, or dying that should have survived. */
class DeletePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)

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

  test("delete-then-query equals the Catalyst complement on random expressions") {
    // 3 day-partitions, user_id with planted NULLs, fractional v
    val rows = (0L until 120L).map { i =>
      val uid: java.lang.Long = if (i % 11 == 0) null else java.lang.Long.valueOf(i % 30)
      (i, f"2024-01-0${1 + (i % 3)}%d 0${i % 10}%d:00:00", uid, (i % 40) / 2.0)
    }
    val df = rows.toDF("id", "ts", "user_id", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    df.cache().count()

    for (i <- 1 to 12) {
      val expr = genExpr(2)
      val expr2 = genExpr(1) // a second delete exercises DV union merges
      val root = SparkTestSession.tmp(s"graft-delprop-$i")
      val c = Collection.create(spark, root, df.schema, "ts",
        DatePartitioning("ts", "D"),
        statsColumns = Seq("user_id", "v"), bloomColumns = Seq("user_id"))
      c.insert(df)
      // DELETION-VECTOR twin (r11b): the same random deletes through the
      // DV engine — any divergence between the masked read and the
      // rewrite read (adaptive split, union merge, metadata counts)
      // surfaces as a row-set mismatch
      val cdv = Collection.create(spark, SparkTestSession.tmp(s"graft-delprop-dv-$i"),
        df.schema, "ts", DatePartitioning("ts", "D"),
        statsColumns = Seq("user_id", "v"), bloomColumns = Seq("user_id"),
        attrs = Map(Collection.DvEnabledAttr -> "true"))
      cdv.insert(df)
      c.deleteWhere(expr);  cdv.deleteWhere(expr)
      c.deleteWhere(expr2); cdv.deleteWhere(expr2)
      val got = c.query().select("id").as[Long].collect().sorted.toSeq
      val gotDv = cdv.query().select("id").as[Long].collect().sorted.toSeq
      // derive the partition column the same way the collection does
      def dead(e: String) = FilterExpr.toColumn(FilterExpr.parse(e)) <=> lit(true)
      val want = df.withColumn("day", dayofmonth(col("ts")).cast("int"))
        .where(!dead(expr) && !dead(expr2))
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == want, s"iteration $i, exprs: $expr | $expr2")
      assert(gotDv == want, s"iteration $i (DV twin), exprs: $expr | $expr2")
      assert(cdv.countRows() == want.size.toLong,
        s"iteration $i: DV metadata live count must match the visible rows")
    }
  }
}
