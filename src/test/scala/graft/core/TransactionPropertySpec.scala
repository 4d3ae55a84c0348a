package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property test for multi-operation transactions: a random sequence of
  * mutations applied inside ONE transaction must leave the collection in
  * exactly the state of applying the same sequence DIRECTLY (commit per
  * op) on a twin — the transaction changes atomicity and visibility,
  * never results. Sequences are generated from a deterministic seed and
  * mix Concat appends (new and existing partitions, sometimes colliding
  * ids), row-level deletes (predicates over data and derived columns),
  * and expression updates. */
class TransactionPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815L)

  private def mk(lo: Long, hi: Long, day: Int) = (lo until hi)
    .map(i => (i, f"2024-02-$day%02d 08:00:00", s"t${i % 4}", (i % 7).toDouble))
    .toDF("id", "ts", "etype", "v")
    .withColumn("ts", col("ts").cast("timestamp"))

  private def freshPair(tag: String): (Collection, Collection) = {
    val base = mk(0, 40, 1).unionByName(mk(100, 140, 2))
    def create(root: String) = {
      val c = Collection.create(spark, root, base.schema, "ts",
        DatePartitioning("ts", "D"), retainGenerations = 6)
      c.insert(base, MergeStrategy.Concat)
      c
    }
    (create(SparkTestSession.tmp(s"graft-txnp-$tag-a")),
     create(SparkTestSession.tmp(s"graft-txnp-$tag-b")))
  }

  /** One random mutation, returned as (description, replayable closure). */
  private def genOp(step: Int): (String, Collection => Unit) = rnd.nextInt(4) match {
    case 0 => // append into a random (possibly new) day
      val day = 1 + rnd.nextInt(4)
      val lo = 1000L * (step + 1) + rnd.nextInt(50)
      val n = 5 + rnd.nextInt(15)
      (s"insert($lo, ${lo + n}, day=$day)",
        c => c.insert(mk(lo, lo + n, day), MergeStrategy.Concat))
    case 1 => // row-level delete over a data column
      val t = rnd.nextInt(4)
      val cap = rnd.nextInt(7)
      (s"deleteWhere(etype == 't$t' and v <= $cap.0)",
        c => c.deleteWhere(s"etype == 't$t' and v <= $cap.0"))
    case 2 => // delete over the derived partition column
      val day = 1 + rnd.nextInt(4)
      val floor = rnd.nextInt(5)
      (s"deleteWhere(day == $day and v >= $floor.0)",
        c => c.deleteWhere(s"day == $day and v >= $floor.0"))
    case _ => // expression update
      val t = rnd.nextInt(4)
      val add = 1 + rnd.nextInt(9)
      (s"updateWhere(etype == 't$t': v += $add, etype = 'u$step')",
        c => c.updateWhere(s"etype == 't$t'",
          Map("v" -> s"v + $add.0", "etype" -> s"'u$step'")))
  }

  private def state(c: Collection): Seq[(Long, Long, String, Double)] =
    c.query().select(col("id"), unix_micros(col("ts")).as("us"), col("etype"), col("v"))
      .as[(Long, Long, String, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("random op sequences: one transaction == direct sequential application") {
    for (round <- 1 to 6) {
      val ops = Seq.fill(2 + rnd.nextInt(4))(genOp(rnd.nextInt(1000)))
      val (txnC, dirC) = freshPair(s"r$round")
      val g0 = txnC.generation
      txnC.transaction { t => ops.foreach(_._2(t)) }
      ops.foreach(_._2(dirC))
      assert(state(txnC) == state(dirC),
        s"round $round (${ops.map(_._1).mkString("; ")}): " +
          "transactional and direct application must converge")
      assert(txnC.generation == g0 + 1,
        s"round $round: the transaction must publish exactly one generation")
    }
  }
}
