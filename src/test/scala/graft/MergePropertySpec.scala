package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Property test: every merge strategy must equal a driver-side reference
  * model of the zcollection semantics (merge.py) on randomized event sets
  * — generated from a deterministic seed, and deliberately clustered
  * around MIDNIGHT so tolerance matching is exercised across partition
  * boundaries (the round-1 defect class).
  */
class MergePropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)
  private val midnight = java.time.Instant.parse("2024-03-02T00:00:00Z").toEpochMilli * 1000L

  /** (id, axis micros): ~half the points within ±2s of midnight, the rest
    * spread over the two adjacent days. */
  private def genRows(idBase: Long, n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val us =
        if (rnd.nextBoolean()) midnight + (rnd.nextLong() % 2000000L)
        else midnight + (rnd.nextLong() % (24L * 3600 * 1000000))
      (idBase + i, us)
    }

  private def toDf(rows: Seq[(Long, Long)]) =
    rows.toDF("id", "us").withColumn("ts", timestamp_micros(col("us"))).drop("us")

  private def dayOf(us: Long): Long = Math.floorDiv(us, 24L * 3600 * 1000000)

  /** Driver-side reference model of merge.py for each strategy. */
  private def model(strategy: MergeStrategy, existing: Seq[(Long, Long)],
                    inserted: Seq[(Long, Long)]): Seq[Long] = {
    val kept = strategy match {
      case MergeStrategy.Concat => existing
      case MergeStrategy.Replace =>
        val dirtyDays = inserted.map(r => dayOf(r._2)).toSet
        existing.filterNot(e => dirtyDays.contains(dayOf(e._2)))
      case MergeStrategy.TimeSeries =>
        val bounds = inserted.groupBy(r => dayOf(r._2))
          .map { case (d, rs) => d -> (rs.map(_._2).min, rs.map(_._2).max) }
        existing.filterNot { e =>
          bounds.get(dayOf(e._2)).exists { case (lo, hi) => e._2 >= lo && e._2 <= hi }
        }
      case MergeStrategy.Upsert(None) =>
        val keys = inserted.map(_._2).toSet
        existing.filterNot(e => keys.contains(e._2))
      case MergeStrategy.Upsert(Some(tol)) =>
        // pure nearest-within-window: partition boundaries are irrelevant
        existing.filterNot(e => inserted.exists(i => math.abs(e._2 - i._2) <= tol))
    }
    (kept ++ inserted).map(_._1).sorted
  }

  test("merge strategies equal the reference model on randomized boundary-heavy data") {
    for (round <- 1 to 5) {
      val existing = genRows(1000L * round, 8 + rnd.nextInt(20))
      val inserted = genRows(1000L * round + 500, 4 + rnd.nextInt(12))
      val strategies: Seq[MergeStrategy] = Seq(
        MergeStrategy.Concat, MergeStrategy.Replace, MergeStrategy.TimeSeries,
        MergeStrategy.Upsert(None), MergeStrategy.Upsert(Some(1500000L)))
      for (s <- strategies) {
        val root = SparkTestSession.tmp(s"graft-mprop")
        val df = toDf(existing)
        val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
        c.insert(df)
        c.insert(toDf(inserted), s)
        val got = c.query().select("id").collect().map(_.getLong(0)).sorted.toSeq
        val want = model(s, existing, inserted)
        assert(got == want,
          s"round $round strategy $s:\n got=$got\nwant=$want\nexisting=$existing\ninserted=$inserted")
      }
    }
  }
}
