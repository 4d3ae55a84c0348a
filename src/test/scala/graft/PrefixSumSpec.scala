package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, PrefixSum}

/** The two-pass exclusive prefix sum (r9): bit-identical to the
  * single-window formulation for any order-aligned bucket, while the
  * heavy window partitions by (group, bucket) so a giant group's scan
  * runs on one task per occupied bucket instead of one task total. */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // skewed two-source corpus: src_big 900 rows, src_small 100, plus a
  // null-group row set and duplicate order keys to exercise ties
  private lazy val skewed = {
    val rng = new scala.util.Random(7)
    val rows = (1 to 1000).map { i =>
      val src = if (i <= 900) "src_big" else "src_small"
      // order key deliberately non-unique across ~200 values
      (i.toLong, src, (rng.nextInt(200) * (1L << 40)) + i, 1L + rng.nextInt(50))
    } ++ (1 to 7).map(i => (9000L + i, null: String, i * (1L << 41), 5L))
    rows.toDF("id", "src", "pos", "n")
  }

  private def naive(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("prior", coalesce(sum(col("n")).over(
      Window.partitionBy(col("src")).orderBy(col("pos"), col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))

  test("exclusive: bit-identical to the single window, across bucketings") {
    val want = naive(skewed).select("id", "prior").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    for (shift <- Seq(38, 42, 46, 63)) { // 4096 / 256 / 16 / 1 cells
      val got = PrefixSum.exclusive(skewed, Seq(col("src")),
          Seq(col("pos"), col("id")), col("n"),
          shiftright(col("pos"), shift), "prior")
        .select("id", "prior").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == want, s"shift=$shift diverged from the single window")
    }
  }

  test("exclusive: heavy window partitions by (group, bucket) — parallelism follows buckets") {
    val out = PrefixSum.exclusive(skewed, Seq(col("src")),
      Seq(col("pos"), col("id")), col("n"),
      shiftright(col("pos"), 42), "prior")
    // the data-carrying window's partition spec must be TWO expressions
    // (group + bucket) — that is the one-task-per-source fix
    val windows = out.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    val dataWindow = windows.filter(_.output.exists(_.name == "id"))
    assert(dataWindow.nonEmpty, "expected a window over the data rows")
    assert(dataWindow.forall(_.partitionSpec.size == 2),
      s"data window must partition by (group, bucket):\n${out.queryExecution.sparkPlan}")
    // and the planted skew actually occupies many cells per source, so
    // the big source's scan genuinely runs on >1 task
    val cells = skewed.where(col("src") === "src_big")
      .select(shiftright(col("pos"), 42)).distinct().count()
    assert(cells > 1, s"planted data must span multiple buckets, got $cells")
  }

  test("degenerate lit(0) bucket IS the single-window plan result") {
    val want = naive(skewed).select("id", "prior").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    val got = PrefixSum.exclusive(skewed, Seq(col("src")),
        Seq(col("pos"), col("id")), col("n"), lit(0L), "prior")
      .select("id", "prior").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("null group keys and null values match the window semantics") {
    val d = Seq(
      (1L, null: String, 1L, 10L), (2L, null, 2L, 20L), (3L, null, 3L, 5L),
      (4L, "a", 1L, 1L), (5L, "a", 2L, 2L)
    ).toDF("id", "src", "pos", "n")
      .withColumn("n", when(col("id") === 2L, lit(null: Any).cast("long")).otherwise(col("n")))
    val want = naive(d).select("id", "prior").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    val got = PrefixSum.exclusive(d, Seq(col("src")), Seq(col("pos"), col("id")),
        col("n"), shiftright(col("pos"), 1), "prior")
      .select("id", "prior").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
    // null n skipped by sum on both paths: id 3 prior = 10
    assert(got.find(_._1 == 3L).get._2 == 10L)
  }

  test("rebuilt samplers: equal to their pre-rebuild single-window formulations") {
    val rng = new scala.util.Random(11)
    val d = (1 to 600).map { i =>
      val src = if (i % 10 == 0) "small" else "big" // 9:1 skew
      (i.toLong, src, (1 to (1 + rng.nextInt(9))).map(j => s"w$i-$j").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val fp = graft.functions.TextFunctions.fingerprint(col("text"))
    val toks = graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
    val pos = pmod(fp, lit(1L << 50))

    // token-budget sampler vs the plain-window formulation
    val gotTb = Corpus.sampleToTokenBudget(d, Seq(col("source")), col("doc_id"),
        fp, toks, budget = 500L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val wantTb = d.withColumn("_p", pos)
      .withColumn("_prior", coalesce(sum(toks).over(
        Window.partitionBy(col("source")).orderBy(col("_p"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .where(col("_prior") < 500L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(gotTb == wantTb)

    // mixture sampler: same comparison with per-source budgets
    val gotMx = Corpus.mixtureSample(d, col("source"),
        Map("big" -> 700L, "small" -> 100L), col("doc_id"), fp, toks)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val wantMx = d.where(col("source").isin("big", "small"))
      .withColumn("_b", when(col("source") === "big", 700L).otherwise(100L))
      .withColumn("_p", pos)
      .withColumn("_prior", coalesce(sum(toks).over(
        Window.partitionBy(col("source")).orderBy(col("_p"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .where(col("_prior") < col("_b"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(gotMx == wantMx)

    // interleave with a scale bucket == interleave without one
    val w = Map("big" -> 3L, "small" -> 1L)
    val plain = Corpus.interleave(d, col("source"), w, Seq(col("doc_id")))
      .select("doc_id", "vtime").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val bucketed = Corpus.interleave(d, col("source"), w, Seq(col("doc_id")),
        orderBucket = shiftright(col("doc_id"), 5))
      .select("doc_id", "vtime").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(bucketed == plain)

    // quantile gate: the PrefixSum cumulative scan decides the same
    // cutoffs as a direct distinct-score window
    val scored = d.withColumn("score",
      graft.functions.TextFunctions.qualityStats(col("text")).getField("stop_ratio"))
    val gotQg = Corpus.quantileGate(scored, Seq("source"), col("score"), 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val counts = scored.groupBy(col("source"), col("score").as("s"))
      .agg(count(lit(1)).as("nn"))
    val byG = Window.partitionBy(col("source"))
    val cuts = counts
      .withColumn("cum", sum(col("nn")).over(byG.orderBy(col("s"))))
      .withColumn("tot", sum(col("nn")).over(byG))
      .where(col("cum").cast("double") / col("tot") >= 0.3)
      .groupBy(col("source")).agg(min(col("s")).as("cut"))
    val wantQg = scored.join(cuts, "source").where(col("score") > col("cut"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(gotQg == wantQg)
  }
}
