package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Collection, DatePartitioning}

/** Property harness for the `"graft"` DataSource: over RANDOM predicate
  * trees (seeded), a filtered read through the format must return
  * exactly the rows a plain in-memory filter of the full table returns
  * — whatever the pushdown translated, dropped, or pruned. The ground
  * truth never touches graft's skip layers, so a pruning bug cannot
  * cancel out.
  */
class SqlSourcePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("random predicates: format(graft) == ground truth") {
    val rnd = new scala.util.Random(0x6ea7L)
    val root = SparkTestSession.tmp("graft-sqlprop")
    val df = (0L until 400L)
      .map { i =>
        val v: java.lang.Double = if (i % 19 == 0) null else (i % 50) / 2.0
        (i, f"2024-01-${1 + (i % 9).toInt}%02d ${i % 24}%02d:00:00", i % 11,
          v, s"s${i % 7}")
      }
      .toDF("id", "ts", "k", "v", "tag")
      .withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts",
      DatePartitioning("ts", "D"), statsColumns = Seq("id", "k"),
      bloomColumns = Seq("tag"))
    c.insert(df)

    val truth = df.persist()
    truth.count()
    val src = spark.read.format("graft").load(root)

    def leaf(): org.apache.spark.sql.Column = rnd.nextInt(8) match {
      case 0 => col("id") >= rnd.nextInt(400)
      case 1 => col("id") < rnd.nextInt(400)
      case 2 => col("k") === rnd.nextInt(12)
      case 3 => col("v") > rnd.nextInt(25)
      case 4 => col("tag") === s"s${rnd.nextInt(8)}"
      case 5 => col("v").isNull
      case 6 => col("ts") >= lit(f"2024-01-${1 + rnd.nextInt(9)}%02d 12:00:00").cast("timestamp")
      // translatable by Catalyst (StringContains) but NOT by graft's
      // mini-language: exercises the polarity-tracked weakening inside
      // every random And/Or/Not shape against the ground truth
      case 7 => col("tag").contains(s"s${rnd.nextInt(8)}")
    }
    def tree(depth: Int): org.apache.spark.sql.Column =
      if (depth == 0) leaf()
      else rnd.nextInt(3) match {
        case 0 => tree(depth - 1) && tree(depth - 1)
        case 1 => tree(depth - 1) || tree(depth - 1)
        case 2 => !tree(depth - 1)
      }

    def ids(d: DataFrame, p: org.apache.spark.sql.Column): Seq[Long] =
      d.where(p).select("id").as[Long].collect().sorted.toSeq

    (1 to 40).foreach { i =>
      val p = tree(1 + rnd.nextInt(2))
      val got = ids(src, p)
      val want = ids(truth, p)
      assert(got == want,
        s"iteration $i: predicate $p\n got ${got.take(20)}\nwant ${want.take(20)}")
    }
    truth.unpersist()
  }
}
