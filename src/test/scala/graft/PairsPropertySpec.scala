package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Property test for the two bucket-pair enumerations against the
  * brute-force reference model, over random bucket layouts and caps:
  *
  *  - [[Dedup.exhaustiveBucketPairs]] must return EXACTLY the set of
  *    unordered in-bucket pairs, for every cap (the triangle
  *    sub-distribution may never drop or duplicate a pair);
  *  - [[Dedup.boundedBucketPairs]] must keep every bucket CONNECTED
  *    (its pairs' transitive closure spans the bucket) while emitting at
  *    most the exhaustive count.
  *
  * Layouts are generated from a deterministic seed.
  */
class PairsPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("exhaustive pairs == brute force for random bucket layouts and caps") {
    for (trial <- 1 to 8) {
      val nBuckets = 1 + rnd.nextInt(4)
      val layout: Seq[(Long, Long)] = (0 until nBuckets).flatMap { b =>
        val size = 1 + rnd.nextInt(40)
        // globally-unique ids, shuffled association to buckets
        (0 until size).map(i => (b.toLong, (trial * 10000 + b * 1000 + i).toLong))
      }
      val cap = 1 + rnd.nextInt(12)
      val df = layout.toDF("_zc_bucket", "_zc_id").repartition(4)
      val got = Dedup.exhaustiveBucketPairs(df, Seq("_zc_bucket"), "_zc_id", cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = layout.groupBy(_._1).values.flatMap { members =>
        val ids = members.map(_._2)
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toSet
      assert(got == want,
        s"trial $trial (cap=$cap): got ${got.size} pairs, want ${want.size}; " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("bounded pairs keep every bucket connected at any cap") {
    for (trial <- 1 to 5) {
      val size = 2 + rnd.nextInt(50)
      val cap = 1 + rnd.nextInt(10)
      val ids = (0 until size).map(i => (0L, (trial * 1000 + i).toLong))
      val df = ids.toDF("_zc_bucket", "_zc_id").repartition(4)
      val pairs = Dedup.boundedBucketPairs(df, Seq("_zc_bucket"), "_zc_id", cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // union-find over the emitted pairs: one component spanning all ids
      val parent = scala.collection.mutable.Map(ids.map(i => i._2 -> i._2): _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
      val roots = ids.map(i => find(i._2)).distinct
      assert(roots.size == 1, s"trial $trial (cap=$cap): bucket split into ${roots.size} components")
      assert(pairs.length <= size.toLong * (size - 1) / 2)
    }
  }
}
