package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CHECK constraints (round 6): declared per collection, ANSI NULL-passes
  * semantics, enforced inside every write job — a violating mutation
  * fails BEFORE its manifest commit, so no snapshot ever holds a
  * violating row.
  */
class ConstraintsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(vals: (Long, String, java.lang.Double)*) = vals
    .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))

  private def fresh(root: String): Collection = {
    val c = Collection.create(spark, root, mk((1L, "x", 1.0)).schema, "ts",
      DatePartitioning("ts", "D"))
    c.insert(mk((1L, "2024-01-01 08:00:00", 1.0), (2L, "2024-01-01 09:00:00", 2.0)))
    c
  }

  test("violating inserts fail before the commit; valid and NULL rows pass") {
    val c = fresh(SparkTestSession.tmp("graft-chk"))
    c.addConstraint("v_nonneg", "v >= 0")
    assert(c.constraints == Map("v_nonneg" -> "v >= 0"))

    val g = c.generation
    val ex = intercept[Exception](
      c.insert(mk((3L, "2024-01-02 08:00:00", -5.0)), MergeStrategy.Concat))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("v_nonneg")),
      s"failure must name the constraint: ${messages(ex)}")
    assert(c.generation == g && c.query().count() == 2,
      "a refused insert must leave the collection untouched")

    // NULL passes (ANSI CHECK), valid rows pass
    c.insert(mk((4L, "2024-01-02 08:00:00", null), (5L, "2024-01-02 09:00:00", 7.0)),
      MergeStrategy.Concat)
    assert(c.query().count() == 4)
  }

  test("updateWhere is guarded too; dropConstraint lifts the gate; reopen persists") {
    val root = SparkTestSession.tmp("graft-chk-upd")
    val c = fresh(root)
    c.addConstraint("v_small", "v < 100")
    intercept[Exception](c.updateWhere("id == 1", Map("v" -> "v + 1000.0")))
    assert(c.query().where("id == 1").select("v").as[Double].collect()(0) == 1.0)

    // persisted: a fresh handle sees and enforces it
    val c2 = Collection.open(spark, root)
    assert(c2.constraints.contains("v_small"))
    intercept[Exception](
      c2.insert(mk((9L, "2024-01-03 08:00:00", 500.0)), MergeStrategy.Concat))

    c2.dropConstraint("v_small")
    c2.insert(mk((9L, "2024-01-03 08:00:00", 500.0)), MergeStrategy.Concat)
    assert(c2.query().count() == 3)
  }

  test("constraints added before the first row guard the initial-load fast path") {
    val c = Collection.create(spark, SparkTestSession.tmp("graft-chk-empty"),
      mk((1L, "x", 1.0)).schema, "ts", DatePartitioning("ts", "D"))
    c.addConstraint("v_nonneg", "v >= 0")
    intercept[Exception](c.insert(mk((1L, "2024-01-01 08:00:00", -1.0))))
    assert(c.query().count() == 0, "the violating initial load must not land")
    c.insert(mk((1L, "2024-01-01 08:00:00", 1.0)))
    assert(c.query().count() == 1)
  }

  test("adding a constraint the existing data violates refuses") {
    val c = fresh(SparkTestSession.tmp("graft-chk-exist"))
    val ex = intercept[IllegalStateException](c.addConstraint("v_big", "v > 1.5"))
    assert(ex.getMessage.contains("1 existing row"), ex.getMessage)
    assert(c.constraints.isEmpty)
    // compaction (content-preserving rewrite) skips the guard even with
    // a constraint present — carried rows revalidate nowhere
    c.addConstraint("v_nonneg", "v >= 0")
    c.insert(mk((6L, "2024-01-01 10:00:00", 3.0)), MergeStrategy.Concat)
    c.compact()
    assert(c.query().count() == 3)
  }
}
