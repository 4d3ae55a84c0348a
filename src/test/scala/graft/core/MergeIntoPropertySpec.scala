package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property fuzz for [[Collection.mergeInto]]: random sources and
  * random WHEN MATCHED / insert-gate combinations run against TWIN
  * collections — classic and DELETION-VECTOR-enabled — and both must
  * equal a plain-Scala reference of the ANSI semantics. Divergence
  * anywhere (the full-outer rewrite, the DV victim/copy/anti-join legs,
  * gate null-handling, the conditional insert) is a row-set mismatch.
  *
  * (graft.MergePropertySpec fuzzes the INSERT merge strategies; this
  * suite fuzzes MERGE INTO.) */
class MergeIntoPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815L)

  private case class R(id: Long, day: Int, v: Double)

  private def df(rows: Seq[R]) = rows
    .map(r => (r.id, f"2024-03-${r.day}%02d 08:00:00", r.v))
    .toDF("id", "ts", "v")
    .withColumn("ts", col("ts").cast("timestamp"))

  private def mkTwins(tag: String, base: Seq[R]): (Collection, Collection) = {
    def create(root: String, dv: Boolean) = {
      val c = Collection.create(spark, root, df(base).schema, "ts",
        DatePartitioning("ts", "D"), statsColumns = Seq("id"),
        attrs = if (dv) Map(Collection.DvEnabledAttr -> "true") else Map.empty)
      // two files per day (split inserts) so the DV path sees light files
      val (a, b) = base.partition(_.id % 2 == 0)
      c.insert(df(a), MergeStrategy.Concat)
      c.insert(df(b), MergeStrategy.Concat)
      c
    }
    (create(SparkTestSession.tmp(s"graft-mgfz-$tag-c"), dv = false),
     create(SparkTestSession.tmp(s"graft-mgfz-$tag-d"), dv = true))
  }

  private def state(c: Collection): Set[(Long, Double)] =
    c.query().select("id", "v").as[(Long, Double)].collect().toSet

  test("random MERGE shapes: classic == DV twin == ANSI reference") {
    for (round <- 1 to 6) {
      val base = (0L until 30L).map(i => R(i, 1 + (i % 3).toInt, i.toDouble))
      val (c, cdv) = mkTwins(s"r$round", base)
      // source: random matched subset + random new ids, unique keys
      val matchedIds = (0L until 30L).filter(_ => rnd.nextBoolean()).take(12)
      val newIds = (100L until 110L).filter(_ => rnd.nextBoolean())
      val srcRows = (matchedIds ++ newIds).map(i => R(i, 1 + (i % 3).toInt, i + 0.5))
      val delCut = rnd.nextInt(40).toDouble // WHEN MATCHED AND s.v < cut THEN DELETE
      val insCut = rnd.nextInt(120).toDouble // NOT MATCHED AND s.v > cut THEN INSERT
      val shape = rnd.nextInt(4)
      val (wm, wmRef): (WhenMatched, (R, R) => Option[R]) = shape match {
        case 0 => (WhenMatched.UpdateAll, (t, s) => Some(s))
        case 1 => (WhenMatched.Delete, (_, _) => None)
        case 2 => (WhenMatched.UpdateCols(Map("v" -> (col("s.v") * 2)), None),
          (t, s) => Some(t.copy(v = s.v * 2)))
        case _ => (WhenMatched.UpdateCols(Map("v" -> (col("s.v") * 2)),
            Some(col("s.v") < delCut)),
          (t, s) => if (s.v < delCut) None else Some(t.copy(v = s.v * 2)))
      }
      val gateInsert = rnd.nextBoolean()
      val gate = if (gateInsert) Some(col("s.v") > insCut) else None
      for (t <- Seq(c, cdv))
        t.mergeInto(df(srcRows), on = Seq("id"), wm,
          insertUnmatched = true, insertGate = gate)
      // the ANSI reference in plain Scala
      val srcBy = srcRows.map(r => r.id -> r).toMap
      val kept = base.flatMap { t =>
        srcBy.get(t.id) match {
          case Some(s) => wmRef(t, s)
          case None    => Some(t)
        }
      }
      val inserts = srcRows.filterNot(s => base.exists(_.id == s.id))
        .filter(s => gate.isEmpty || s.v > insCut)
      val expected = (kept ++ inserts).map(r => (r.id, r.v)).toSet
      val got = state(c); val gotDv = state(cdv)
      assert(got == expected, s"round $round shape $shape: classic diverged")
      assert(gotDv == expected, s"round $round shape $shape: DV twin diverged")
      assert(cdv.countRows() == expected.size.toLong,
        s"round $round: DV metadata live count must match")
    }
  }
}
