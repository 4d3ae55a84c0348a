package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Collection

/** Property fuzz for the SQL DML lowering (GraftDmlRule): random
  * predicate trees mixing exactly-translatable atoms (partition keys,
  * equality/IN/null checks) with atoms far outside the pushdown domain
  * (pmod, LIKE, arithmetic cross-column comparisons), driven through
  * real `UPDATE` / `DELETE` statements and compared row-exactly against
  * the directly-computed expectation. This is the net under the
  * weakened-pruning design: pruning may only SKIP files, never change
  * which rows the statement touches — any unsound weakening, polarity
  * slip, or NULL-semantics drift in the prune/apply split shows up as a
  * row diff here. */
class SqlDmlPropertySpec extends AnyFunSuite {

  lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graftfz", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graftfz.warehouse", SqlDmlPropertySpec.warehouse)
    s
  }

  private def sql(q: String) = spark.sql(q)

  /** 40 rows over 5 day-partitions; every third etype NULL (3VL). */
  private def baseRows: DataFrame = {
    import spark.implicits._
    (1 to 40).map { i =>
      val day = 1 + (i % 5)
      val etype = if (i % 3 == 0) null
                  else if (i % 2 == 0) "click" else "view"
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-0$day 0${i % 10}:00:00"),
        etype, i * 0.5)
    }.toDF("user_id", "ts", "etype", "v")
  }

  private val atoms = Seq(
    "day >= 3", "day = 2", "user_id IN (1, 4, 7, 22, 35)", "etype = 'click'",
    "v < 9.0", "etype IS NULL", "pmod(user_id, 3) = 1", "etype LIKE 'cl%'",
    "length(etype) + user_id > 20", "v * 2 >= day + 3",
    // r11b: the SUBQUERY family under random boolean structure — the
    // dim holds a NULL user_id (the NOT IN trap) and a NULL score (the
    // per-group correlated trap); expectation evaluates the same text
    // through Catalyst, so every flag-lowering slip is a row diff
    "user_id IN (SELECT user_id FROM fz_dim WHERE score > 4)",
    "user_id NOT IN (SELECT user_id FROM fz_dim WHERE score < 3)",
    "EXISTS (SELECT 1 FROM fz_dim d WHERE d.user_id = t.user_id AND d.score > 4)",
    "NOT EXISTS (SELECT 1 FROM fz_dim d WHERE d.user_id = t.user_id)",
    "v IN (SELECT d.score FROM fz_dim d WHERE d.user_id = t.user_id)",
    "v > (SELECT avg(score) FROM fz_dim WHERE score IS NOT NULL)",
    // r13: the generalized correlated-scalar family — Catalyst's own
    // decorrelation (count-bug handling included) is the expectation,
    // so any drift in the per-key lowering, the empty-input default
    // propagation, or the HAVING verdict shows up as a row diff
    "v > (SELECT max(d.score) FROM fz_dim d WHERE d.user_id = t.user_id)",
    "v < 1 + (SELECT count(*) FROM fz_dim d WHERE d.user_id = t.user_id)",
    "(SELECT 2 * max(d.score) + 1 FROM fz_dim d WHERE d.user_id = t.user_id) > v",
    "(SELECT count(*) * 2 FROM fz_dim d WHERE d.user_id = t.user_id AND d.score > 3) = 2",
    "v > (SELECT sum(d.score) FROM fz_dim d WHERE d.user_id = t.user_id HAVING count(*) > 0)",
    // grouped: fz_dim user_ids are unique, so every key has <= 1 group
    // (the >1 cardinality error is pinned deterministically in SqlDmlSpec)
    "v > (SELECT max(d.score) FROM fz_dim d WHERE d.user_id = t.user_id GROUP BY d.score)")

  private def genPred(rnd: scala.util.Random): String = {
    def atom() = atoms(rnd.nextInt(atoms.length))
    def node(depth: Int): String =
      if (depth == 0) atom()
      else rnd.nextInt(4) match {
        case 0 => s"(${node(depth - 1)} AND ${node(depth - 1)})"
        case 1 => s"(${node(depth - 1)} OR ${node(depth - 1)})"
        case 2 => s"(NOT ${node(depth - 1)})"
        case _ => atom()
      }
    node(2)
  }

  private var n = 0
  private def freshTable(): String = {
    n += 1
    val tbl = s"graftfz.fz.t$n"
    sql("CREATE NAMESPACE IF NOT EXISTS graftfz.fz")
    sql(s"""CREATE TABLE $tbl (user_id BIGINT, ts TIMESTAMP, etype STRING, v DOUBLE)
            PARTITIONED BY (days(ts))""")
    baseRows.createOrReplaceTempView("fz_src")
    sql(s"INSERT INTO $tbl SELECT * FROM fz_src")
    tbl
  }

  private def snap(tbl: String): Seq[(Long, String, Double)] =
    sql(s"SELECT user_id, etype, v FROM $tbl ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

  /** The expectation side evaluates the same predicate directly — with
    * the derived `day` column materialized, since the raw frame has no
    * partition layout. */
  private def withDay: DataFrame = baseRows.withColumn("day", dayofmonth(col("ts")))

  /** The rows the predicate is TRUE for, evaluated directly by Catalyst
    * in FILTER context (subquery atoms need it) under the alias `t` the
    * statements also use. */
  private def hitIds(pred: String): Set[Long] = {
    registerDim()
    withDay.alias("t").where(coalesce(expr(pred), lit(false)))
      .select("user_id").collect().map(_.getLong(0)).toSet
  }

  private def registerDim(): Unit = {
    import spark.implicits._
    Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (4L, 2.0), (7L, 9.0), (22L, null), (null, 1.0),
      (35L, 6.5), (9L, 4.0))
      .toDF("user_id", "score").createOrReplaceTempView("fz_dim")
  }

  test("fuzzed UPDATE: SQL result == direct computation, for any predicate shape") {
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 10) {
      val pred = genPred(rnd)
      val tbl = freshTable()
      val hits = hitIds(pred)
      val expected = baseRows
        .select("user_id", "etype", "v").orderBy("user_id")
        .collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (hits(r.getLong(0))) r.getDouble(2) + 1000 else r.getDouble(2))).toSeq
      sql(s"UPDATE $tbl t SET v = v + 1000 WHERE $pred")
      assert(snap(tbl) == expected, s"UPDATE diverged for predicate: $pred")
    }
  }

  test("fuzzed DELETE: SQL result == direct computation, exact and fallback paths") {
    val rnd = new scala.util.Random(47L)
    for (_ <- 1 to 10) {
      val pred = genPred(rnd)
      val tbl = freshTable()
      val hits = hitIds(pred)
      val expected = baseRows
        .select("user_id", "etype", "v").orderBy("user_id")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .filterNot(r => hits(r._1)).toSeq
      sql(s"DELETE FROM $tbl t WHERE $pred")
      assert(snap(tbl) == expected, s"DELETE diverged for predicate: $pred")
    }
  }
}

object SqlDmlPropertySpec {
  lazy val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft-fz-wh").toString
}
