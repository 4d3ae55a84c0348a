package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property harness for the CDC diff: over a RANDOM mutation history
  * (seeded), `changes(gi, gj)` must equal the brute-force multiset
  * difference of the two snapshots — for every adjacent pair and for
  * spanning ranges. The brute force reads full snapshots; the feed reads
  * only changed files — same answer, different cost.
  */
class ChangesPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.select("id", "k", "v").as[(Long, Long, Double)].collect().sorted.toSeq

  test("changes == snapshot exceptAll snapshot across a random history") {
    val rnd = new scala.util.Random(20240813L)
    val root = SparkTestSession.tmp("graft-cdc-prop")
    def mk(ids: Seq[Long]) = ids
      .map(i => (i, f"2024-01-${1 + (i % 5)}%02d 0${i % 9}:00:00", i % 4, (i % 13).toDouble))
      .toDF("id", "ts", "k", "v").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, mk(Seq(0L)).schema, "ts",
      DatePartitioning("ts", "D"), statsColumns = Seq("id"),
      retainGenerations = 64)
    var nextId = 0L
    def freshIds(n: Int): Seq[Long] = { val s = nextId until nextId + n; nextId += n; s }
    c.insert(mk(freshIds(40)), MergeStrategy.Concat)

    val gens = scala.collection.mutable.ArrayBuffer(c.generation)
    (1 to 7).foreach { _ =>
      rnd.nextInt(4) match {
        case 0 => c.insert(mk(freshIds(10 + rnd.nextInt(20))), MergeStrategy.Concat)
        case 1 =>
          val lo = rnd.nextLong(math.max(1L, nextId))
          c.deleteWhere(s"id >= $lo and id < ${lo + 8}")
        case 2 =>
          val lo = rnd.nextLong(math.max(1L, nextId))
          c.updateWhere(s"id >= $lo and id < ${lo + 8}", Map("v" -> "v + 100.0"))
        case 3 => c.compact()
      }
      if (c.generation != gens.last) gens += c.generation
    }

    val dataCols = Seq("id", "ts", "k", "v")
    def snap(g: Long) = c.snapshotAt(g).select(dataCols.map(col): _*)
    val pairs = gens.sliding(2).map(w => (w(0), w(1))).toSeq ++
      Seq((gens.head, gens.last), (gens.head, gens(gens.length / 2)))
    pairs.foreach { case (gi, gj) =>
      val feed = c.changes(gi, gj)
      val gotIns = rowsOf(feed.where(col(Collection.ChangeTypeCol) === "insert"))
      val gotDel = rowsOf(feed.where(col(Collection.ChangeTypeCol) === "delete"))
      val expIns = rowsOf(snap(gj).exceptAll(snap(gi)))
      val expDel = rowsOf(snap(gi).exceptAll(snap(gj)))
      assert(gotIns == expIns, s"[$gi -> $gj] inserts diverge from brute force")
      assert(gotDel == expDel, s"[$gi -> $gj] deletes diverge from brute force")
    }
  }
}
