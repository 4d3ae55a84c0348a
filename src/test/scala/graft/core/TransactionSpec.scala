package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** MULTI-OPERATION TRANSACTIONS (r11b): several mutations published as
  * ONE atomic commit — the Iceberg Transaction / Icechunk writable-
  * session shape over the branch + promote machinery.
  *
  * Contracts under test: one published generation carrying every op;
  * sequential within-transaction visibility; snapshot isolation (parent
  * readers see nothing until publish); abort on body failure leaves the
  * parent untouched and no branch behind; optimistic-concurrency
  * refusal when the parent advances mid-transaction; rebaseKeys
  * upgrades the refusal to checked row-level divergence; a no-op
  * transaction publishes nothing. */
class TransactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(lo: Long, hi: Long, day: Int) = (lo until hi)
    .map(i => (i, f"2024-01-$day%02d 08:00:00", s"t${i % 3}", i.toDouble))
    .toDF("id", "ts", "etype", "v")
    .withColumn("ts", col("ts").cast("timestamp"))

  private def coll(root: String): Collection = {
    val b = mk(0, 20, 1)
    val c = Collection.create(spark, root, b.schema, "ts",
      DatePartitioning("ts", "D"), retainGenerations = 4)
    c.insert(b, MergeStrategy.Concat)
    c.insert(mk(100, 120, 2), MergeStrategy.Concat)
    c
  }

  private def ids(c: Collection): Seq[Long] =
    c.query().select("id").as[Long].collect().sorted.toSeq

  test("insert + delete + update publish as ONE generation; later ops see earlier ones") {
    val c = coll(SparkTestSession.tmp("graft-txn-basic"))
    val g0 = c.generation
    val rewrote = c.transaction { t =>
      // op1: append ids 500..509 with etype t0
      t.insert(mk(500, 510, 2).withColumn("etype", lit("t0")), MergeStrategy.Concat)
      // op2 must SEE op1: deleting t0 removes original t0 rows AND the
      // freshly appended ones
      t.deleteWhere("etype == 't0'")
      // op3: retag the survivors' t1 class
      t.updateWhere("etype == 't1'", Map("etype" -> "'txn'"))
    }
    assert(rewrote.nonEmpty)
    assert(c.generation == g0 + 1, "the transaction must publish exactly one generation")
    val out = c.query().select("id", "etype").as[(Long, String)].collect().toMap
    assert(!out.keySet.exists(id => id >= 500), "appended t0 rows must be deleted by op2")
    assert(out.keySet == (0L until 20L).toSet.union((100L until 120L).toSet)
      .filterNot(i => i % 3 == 0), "original t0 rows must be gone")
    assert(out.filter(_._1 % 3 == 1).values.toSet == Set("txn"), "t1 rows must be retagged")
    assert(out.filter(_._1 % 3 == 2).values.toSet == Set("t2"), "t2 rows untouched")
    assert(c.branches().isEmpty, "the working branch must be dropped after publish")
  }

  test("snapshot isolation: parent readers see nothing until publish") {
    val c = coll(SparkTestSession.tmp("graft-txn-iso"))
    val before = ids(c)
    c.transaction { t =>
      t.insert(mk(900, 910, 1), MergeStrategy.Concat)
      assert(ids(c) == before, "staged insert must be invisible to parent readers")
      assert(ids(t).contains(900L), "the working collection must see its own writes")
    }
    assert(ids(c).contains(900L), "published after the transaction returns")
  }

  test("abort: a throwing body leaves the parent untouched and no branch behind") {
    val c = coll(SparkTestSession.tmp("graft-txn-abort"))
    val g0 = c.generation
    val before = ids(c)
    val e = intercept[RuntimeException] {
      c.transaction { t =>
        t.insert(mk(900, 910, 1), MergeStrategy.Concat)
        t.deleteWhere("etype == 't2'")
        throw new RuntimeException("boom")
      }
    }
    assert(e.getMessage == "boom")
    assert(c.generation == g0 && ids(c) == before, "aborted transaction must publish nothing")
    assert(c.branches().isEmpty, "the working branch must be dropped on abort")
  }

  test("optimistic concurrency: a racing parent commit refuses the publish") {
    val c = coll(SparkTestSession.tmp("graft-txn-race"))
    val e = intercept[java.util.ConcurrentModificationException] {
      c.transaction { t =>
        t.insert(mk(900, 910, 1), MergeStrategy.Concat)
        // another writer lands on the parent mid-transaction
        c.insert(mk(700, 705, 2), MergeStrategy.Concat)
      }
    }
    assert(e.getMessage.contains("transaction conflict"))
    assert(c.branches().isEmpty, "the working branch must be dropped on conflict")
    val got = ids(c)
    assert(got.contains(700L) && !got.contains(900L),
      "the racing commit survives; the transaction publishes nothing")
  }

  test("rebaseKeys: disjoint-key divergence applies cleanly; conflicts refuse") {
    val c = coll(SparkTestSession.tmp("graft-txn-rebase"))
    c.transaction(t => {
      t.updateWhere("id == 5", Map("v" -> "-5.0"))
      c.updateWhere("id == 110", Map("v" -> "-110.0")) // diverges on a DIFFERENT key
    }, rebaseKeys = Seq("id"))
    val vs = c.query().select("id", "v").as[(Long, Double)].collect().toMap
    assert(vs(5L) == -5.0 && vs(110L) == -110.0, "both sides' disjoint edits must land")

    val e = intercept[IllegalStateException] {
      c.transaction(t => {
        t.updateWhere("id == 7", Map("v" -> "-7.0"))
        c.updateWhere("id == 7", Map("v" -> "77.0")) // SAME key on both sides
      }, rebaseKeys = Seq("id"))
    }
    assert(e.getMessage.contains("rebase conflict"))
    assert(c.query().where(col("id") === 7).select("v").as[Double].head() == 77.0,
      "the parent's racing edit survives; the conflicted transaction publishes nothing")
  }

  test("transaction on a DV-enabled collection: branch DV deletes promote exactly") {
    val root = SparkTestSession.tmp("graft-txn-dv")
    val b = mk(0, 20, 1)
    val c = Collection.create(spark, root, b.schema, "ts",
      DatePartitioning("ts", "D"),
      attrs = Map(Collection.DvEnabledAttr -> "true"), retainGenerations = 4)
    c.insert(b, MergeStrategy.Concat)
    c.insert(mk(100, 120, 2), MergeStrategy.Concat)
    c.transaction { t =>
      t.deleteWhere("id >= 10 and id < 15") // light delete: DV leg on the branch
      t.insert(mk(500, 505, 2), MergeStrategy.Concat)
    }
    assert(ids(c) == ((0L until 10L) ++ (15L until 20L) ++ (100L until 120L) ++
      (500L until 505L)).sorted,
      "the branch's DV delete and the insert must both promote")
    // the parent's own read faces stay DV-coherent after the promote
    assert(c.countRows() == c.query().count())
  }

  test("pure-append transaction promotes as a plain append: no partition rewrite") {
    val c = coll(SparkTestSession.tmp("graft-txn-append"))
    val filesBefore = c.currentManifest().files.toSet
    c.transaction { t =>
      t.insert(mk(900, 910, 1), MergeStrategy.Concat) // into an EXISTING day
      t.insert(mk(300, 305, 3), MergeStrategy.Concat) // into a new day
    }
    val filesAfter = c.currentManifest().files.toSet
    assert(filesBefore.subsetOf(filesAfter),
      "append-only promotion must not rewrite any pre-existing file")
    assert(ids(c).count(id => id >= 900 || (id >= 300 && id < 305)) == 15)
  }

  test("no-op transaction publishes nothing") {
    val c = coll(SparkTestSession.tmp("graft-txn-noop"))
    val g0 = c.generation
    assert(c.transaction(_ => ()).isEmpty)
    assert(c.generation == g0)
    assert(c.branches().isEmpty)
  }
}
