package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus

/** Corpus-assembly operators (round 5): deterministic hash splits,
  * scalar repetition metrics, token-budget sequence packing. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", "the cat sat on the mat"),            // 'the' repeats
    (2L, "en", "a b a b a b"),                       // tokens AND bigrams repeat
    (3L, "en", "all distinct words here now"),
    (4L, "de", "der hund und der hund und der hund"),
    (5L, "de", ""),                                  // degenerate
  ).toDF("doc_id", "lang", "text")

  /** Adversarial tokenizer-twin fixtures: every split/trim edge the
    * builtins encode (leading/trailing \s runs -> EMPTY fields under
    * limit -1, space-only trim, ASCII-six whitespace, multi-byte and
    * non-BMP code points, the empty string) plus seeded random mixes. */
  private def adversarialTokenFixtures(seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val alphabet = "ab XY12 .,!\t\n\f\r  é中_-😀"
    val edges = Seq("", " ", "\t", " \t ", "a", " a ", "\ta\t", "a b",
      "a  b\t\tc", "a1b2", "12.34", "...", "é中", "  x \f ",
      "a  \t b\nc", "\n\na\n\n", "one two one two", "😀",
      "a😀b 😀", "w x y z w x y z w x y")
    edges ++ (0 until 1500).map { _ =>
      val n = rnd.nextInt(60)
      (0 until n).map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
    }
  }

  test("hashSplit: stable buckets, exhaustive labeled cuts, no shuffle") {
    val (bucket, split) = Corpus.hashSplit(xxhash64(col("text")),
      Seq(("train", 90), ("val", 95), ("test", 100)))
    val out = docs.select(col("doc_id"), bucket.as("b"), split.as("s"))
    val rows = out.collect()
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 100))
    assert(rows.forall { r =>
      val (b, s) = (r.getInt(1), r.getString(2))
      (b < 90 && s == "train") || (b >= 90 && b < 95 && s == "val") || (b >= 95 && s == "test")
    })
    // determinism: recomputing yields identical assignments
    assert(out.collect().toSeq == rows.toSeq)
    // scalar map: no Exchange anywhere in the plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    // malformed cuts refuse
    intercept[IllegalArgumentException](
      Corpus.hashSplit(col("x"), Seq(("train", 90))))
  }

  test("repetitionMetrics: duplicate token/bigram fractions as a shuffle-free projection") {
    val out = docs.select(col("doc_id") +: Corpus.repetitionMetrics(col("text")): _*)
      .orderBy("doc_id").collect()
    // doc 1: 6 tokens, 'the' twice -> dup 1/6; bigrams distinct (5)
    assert(out(0).getInt(1) == 6)
    assert(math.abs(out(0).getDouble(2) - 1.0 / 6) < 1e-12)
    assert(out(0).getDouble(3) == 0.0)
    // doc 2: 6 tokens {a,b} -> dup 4/6; 5 bigrams {"a b","b a"} -> dup 3/5
    assert(math.abs(out(1).getDouble(2) - 4.0 / 6) < 1e-12)
    assert(math.abs(out(1).getDouble(3) - 3.0 / 5) < 1e-12)
    // doc 3: nothing repeats
    assert(out(2).getDouble(2) == 0.0 && out(2).getDouble(3) == 0.0)
    // doc 5: empty text -> split yields [""], 1 token, zero fractions
    assert(out(4).getInt(1) == 1 && out(4).getDouble(2) == 0.0 && out(4).getDouble(3) == 0.0)
    val plan = docs.select(Corpus.repetitionMetrics(col("text")): _*)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "repetition metrics must not shuffle")
    assert(!plan.contains("Generate"), "repetition metrics must not explode")
  }

  test("native repetition_stats is bit-identical to the builtin composition on real docs") {
    val real = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val edge = Seq((9001L, ""), (9002L, "   "), (9003L, "\ta\nb  c"), (9004L, "x"))
      .toDF("doc_id", "text")
    val both = real.union(edge).select(
      (Corpus.repetitionMetrics(col("text")) ++
       Corpus.repetitionMetricsHof(col("text")).map(c => c.as(c.toString + "_h"))): _*)
      .toDF("n", "dt", "db", "n_h", "dt_h", "db_h")
    both.collect().foreach { r =>
      assert(r.getInt(0) == r.getInt(3), s"n_tokens differs: $r")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(4)), s"dup_token_frac differs: $r")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(5)), s"dup_bigram_frac differs: $r")
    }
  }

  test("chunkDocuments: sliding token windows from one Generate, tail chunks run short") {
    val d = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")), (2L, "a b")).toDF("doc_id", "text")
    val out = graft.operators.Corpus.chunkDocuments(d, col("text"), window = 4, stride = 3)
      .select("doc_id", "chunk", "chunk_tokens", "chunk_text")
      .orderBy("doc_id", "chunk").collect()
    // doc 1: starts 0,3,6,9 -> windows of 4,4,4,1
    val doc1 = out.filter(_.getLong(0) == 1L)
    assert(doc1.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(doc1.map(_.getInt(2)).toSeq == Seq(4, 4, 4, 1))
    assert(doc1(0).getString(3) == "w1 w2 w3 w4")
    assert(doc1(1).getString(3) == "w4 w5 w6 w7", "stride 3 < window 4 must overlap")
    assert(doc1(3).getString(3) == "w10")
    // doc 2: single short chunk
    val doc2 = out.filter(_.getLong(0) == 2L)
    assert(doc2.map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq == Seq((0, 2, "a b")))
    // plan: one Generate, zero Exchange
    val plan = graft.operators.Corpus.chunkDocuments(d, col("text"), 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "chunking must not shuffle")
    intercept[IllegalArgumentException](
      graft.operators.Corpus.chunkDocuments(d, col("text"), 4, 5))
  }

  test("native quality_stats is bit-identical to the builtin composition on real docs") {
    import graft.functions.TextFunctions
    val en = TextFunctions.LangProfiles.toMap.apply("en")
    val real = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val edge = Seq((9001L, ""), (9002L, "  a.b!! c?? "), (9003L, "the the the"),
      (9004L, "\u00e9\u00e8 caf\u00e9 ... the"))
      .toDF("doc_id", "text")
    val st = TextFunctions.qualityStats(col("text"))
    val both = real.union(edge).select(
      st.getField("len").as("len_n"),
      length(col("text")).cast("int").as("len_h"),
      st.getField("n_tokens").as("nt_n"),
      TextFunctions.tokenCount(col("text")).cast("int").as("nt_h"),
      st.getField("avg_token_len").as("av_n"),
      TextFunctions.avgTokenLength(col("text")).as("av_h"),
      st.getField("stop_ratio").as("sr_n"),
      TextFunctions.stopwordRatio(col("text"), en).as("sr_h"),
      st.getField("punct_ratio").as("pr_n"),
      TextFunctions.punctRatio(col("text")).as("pr_h"))
    both.collect().foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"len differs: $r")
      assert(r.getInt(2) == r.getInt(3), s"n_tokens differs: $r")
      for ((a, b, what) <- Seq((4, 5, "avg"), (6, 7, "stop"), (8, 9, "punct")))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(a)) ==
               java.lang.Double.doubleToLongBits(r.getDouble(b)), s"$what differs: $r")
    }
    // qualityRules over the native struct selects the same documents
    val hofKept = real.where(
      TextFunctions.tokenCount(col("text")).between(5, 2000) &&
      TextFunctions.avgTokenLength(col("text")).between(2.0, 12.0) &&
      TextFunctions.punctRatio(col("text")) <= 0.25 &&
      size(filter(split(trim(col("text")), "\\s+"), t => t.isInCollection(en))) >= 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val natKept = real.where(TextFunctions.qualityRules(col("text"),
        minTokens = 5, maxTokens = 2000, minAvgTokenLen = 2.0,
        maxAvgTokenLen = 12.0, maxPunctRatio = 0.25, minStopwordHits = 1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(natKept == hofKept, "rule gate must select identical documents")
  }

  test("chunkDocuments property: non-overlapping chunks reassemble every document exactly") {
    // stride == window -> a partition of the token stream; joining the
    // chunks back in order must reproduce the original tokenization
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(200)
    val back = graft.operators.Corpus.chunkDocuments(docs, col("text"), 32, 32)
      .groupBy("doc_id")
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("chunk"), col("chunk_text"))))
        .getField("chunk_text")).as("rebuilt"))
    val joined = docs.withColumn("orig", concat_ws(" ", split(trim(col("text")), "\\s+")))
      .join(back, "doc_id")
    assert(joined.where(col("orig") =!= col("rebuilt")).count() == 0,
      "chunking must partition the token stream losslessly")
  }

  test("decontaminateNgrams: shared k-grams kill the doc; benchmark side broadcasts") {
    import graft.operators.Corpus
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),     // contains the canary 5-gram
      (2L, "totally different words in this document"),
      (3L, "one two three"),                           // < k tokens: never contaminated
    ).toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma delta epsilon").toDF("text")
    val kept = Corpus.decontaminateNgrams(corpus, col("doc_id"), col("text"), bench, col("text"), k = 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 3L), s"doc 1 shares a 5-gram with the benchmark, got $kept")
    // the benchmark side must reach the join as a broadcast
    val planned = Corpus.decontaminateNgrams(corpus, col("doc_id"), col("text"), bench, col("text"), 5)
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "benchmark shingles must broadcast")
    // the no-corpus-shuffle contract, as a plan property: the corpus
    // `text` column rides through NO Exchange — the final anti-join
    // broadcasts the contaminated ids instead of shuffling the corpus
    val exchangesWithText = planned.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Exchange hashpartitioning"))
      .filter(_.contains("text")).toSeq
    assert(exchangesWithText.isEmpty,
      s"an Exchange carries the corpus text:\n${exchangesWithText.mkString("\n")}")
    // and the anti-join itself is the broadcast variant
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")),
      s"anti-join must broadcast the contaminated ids, plan:\n$plan")
  }

  test("removeBoilerplateLines: shared lines vanish everywhere, unique lines keep order, emptied docs empty") {
    val d = Seq(
      (1L, "HEAD\nalpha\nbeta\nFOOT"),
      (2L, "HEAD\ngamma\nFOOT"),
      (3L, "HEAD\nFOOT"),
    ).toDF("doc_id", "text")
    val out = Corpus.removeBoilerplateLines(d, col("doc_id"), col("text"), minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "alpha\nbeta", 2L -> "gamma", 3L -> ""),
      s"boilerplate removal wrong: $out")
    // below the doc-frequency threshold nothing is touched
    val out2 = Corpus.removeBoilerplateLines(d, col("doc_id"), col("text"), minDocs = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2(1L) == "HEAD\nalpha\nbeta\nFOOT")
    intercept[IllegalArgumentException](
      Corpus.removeBoilerplateLines(d, col("doc_id"), col("text"), minDocs = 1))
  }

  test("packSequences: contiguous bins per stratum from an exclusive prefix sum") {
    val d = Seq(
      ("en", 1L, 300L), ("en", 2L, 300L), ("en", 3L, 300L), ("en", 4L, 50L),
      ("de", 1L, 600L), ("de", 2L, 10L),
    ).toDF("lang", "doc_id", "n")
    val out = Corpus.packSequences(d, col("n"), Seq(col("lang")), col("doc_id"), 512L)
      .select("lang", "doc_id", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    // en prefix sums (excl): 0, 300, 600, 900 -> bins 0,0,1,1
    assert(out(("en", 1L)) == 0 && out(("en", 2L)) == 0)
    assert(out(("en", 3L)) == 1 && out(("en", 4L)) == 1)
    // de: 0, 600 -> bins 0, 1 (strata pack independently)
    assert(out(("de", 1L)) == 0 && out(("de", 2L)) == 1)
    // r10 scale shape: the data-carrying window partitions by
    // (stratum, order-bucket) — a giant stratum scans on one task per
    // occupied bucket, not one task total (the PrefixSum rebuild)
    val plan = Corpus.packSequences(d, col("n"), Seq(col("lang")), col("doc_id"), 512L)
      .queryExecution.sparkPlan
    val dataWindows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.output.exists(_.name == "doc_id") => w
    }
    assert(dataWindows.nonEmpty, s"expected a window over the data rows:\n$plan")
    assert(dataWindows.forall(_.partitionSpec.size == 2),
      s"data window must partition by (stratum, bucket):\n$plan")
    intercept[IllegalArgumentException](
      Corpus.packSequences(d, col("n"), Seq(col("lang")), col("doc_id"), 0L))
  }

  test("packSequences: bit-identical to the single-window formulation on a bucket-spanning corpus") {
    // 5000 docs across 3 strata with varied token counts: wide enough
    // that the 1024-cell range bucket genuinely splits each stratum
    val rng = new scala.util.Random(13)
    val d = (1 to 5000).map { i =>
      (Seq("en", "de", "fr")(i % 3), i.toLong, 1L + rng.nextInt(400))
    }.toDF("lang", "doc_id", "n")
    val want = d.withColumn("bin",
        floor(coalesce(sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
            .orderBy(col("doc_id"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)) / 512L).cast("int"))
      .select("lang", "doc_id", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val got = Corpus.packSequences(d, col("n"), Seq(col("lang")), col("doc_id"), 512L)
      .select("lang", "doc_id", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == want, "PrefixSum-rebuilt packing diverged from the single window")
    // and a non-rangeable (string) order key still packs correctly via
    // the degenerate bucket — monotonicity is never faked with a cast
    val s = Seq(("en", "a", 300L), ("en", "b", 300L), ("en", "c", 300L))
      .toDF("lang", "k", "n")
    val byString = Corpus.packSequences(s, col("n"), Seq(col("lang")), col("k"), 512L)
      .select("k", "bin").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(byString == Map("a" -> 0, "b" -> 0, "c" -> 1))
  }

  test("packSequences maxStratumTokens: a planted giant stratum sub-stratifies, bins stay budget-bounded") {
    // one giant 'en' stratum (10k docs x 100 tokens = 1M tokens) next to
    // a small one — uncapped, 'en' would serialize into ONE window
    // partition; capped at 100k tokens it must split ~10 ways
    val d = spark.range(10000).selectExpr(
        "'en' as lang", "id as doc_id", "100L as n")
      .union(spark.range(10).selectExpr("'de' as lang", "id + 50000 as doc_id", "100L as n"))
    val cap = 100000L
    val out = Corpus.packSequences(d, col("n"), Seq(col("lang")), col("doc_id"), 512L, cap)
    val rows = out.select("lang", "doc_id", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 10010, "guarded packing must keep every row")

    // the giant stratum split into the expected sub-stratum count
    val enSubs = rows.filter(_._1 == "en").map(_._3 >> 32).distinct
    assert(enSubs.length == 10, s"want ceil(1M/100k)=10 sub-strata, got ${enSubs.length}")
    assert(rows.filter(_._1 == "de").forall(r => (r._3 >> 32) == 0L),
      "a stratum under the cap keeps one sub-stratum")

    // hard packing invariant per (lang, bin): tokens <= budget + one doc
    val binTotals = rows.groupBy(r => (r._1, r._3)).view.mapValues(_.length * 100L)
    assert(binTotals.values.forall(_ <= 512L + 100L),
      s"a bin exceeded budget+doc: ${binTotals.maxBy(_._2)}")
    // every sub-stratum's span is close to the cap, never a runaway
    val subTotals = rows.filter(_._1 == "en").groupBy(_._3 >> 32).view.mapValues(_.size * 100L)
    assert(subTotals.values.forall(_ <= 2L * cap),
      s"a sub-stratum far exceeded the cap: ${subTotals.toMap}")

    // deterministic: identical assignment on recomputation
    val again = Corpus.packSequences(d, col("n"), Seq(col("lang")), col("doc_id"), 512L, cap)
      .select("lang", "doc_id", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._2).toSeq == rows.sortBy(_._2).toSeq)

    intercept[IllegalArgumentException](
      Corpus.packSequences(d, col("n"), Seq(col("lang")), col("doc_id"), 512L, 100L))

    // null strata are legitimate groups: the totals join is null-safe,
    // so no document vanishes when its stratum value is null
    val withNulls = d.union(spark.range(5)
      .selectExpr("cast(null as string) as lang", "id + 90000 as doc_id", "100L as n"))
    val packed = Corpus.packSequences(withNulls, col("n"), Seq(col("lang")),
      col("doc_id"), 512L, cap)
    assert(packed.count() == 10015, "null-strata docs must survive the guarded packing")
    assert(packed.where(col("lang").isNull).count() == 5)
  }

  test("sampleToTokenBudget: fills each stratum to the budget with at-most-one-doc overshoot, deterministically") {
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val fp = graft.functions.TextFunctions.fingerprint(col("text"))
    val toks = graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
    val budget = 500L
    val s1 = Corpus.sampleToTokenBudget(d, Seq(col("lang")), col("doc_id"), fp, toks, budget)
      .select(col("lang"), col("doc_id"), toks.as("n"))
    val perLang = s1.groupBy("lang")
      .agg(sum("n").as("total"), max("n").as("biggest")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val fullTotals = d.groupBy("lang").agg(sum(toks).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, total, biggest) =>
      assert(total >= math.min(budget, fullTotals(lang)),
        s"$lang under-filled: $total of budget $budget (stratum holds ${fullTotals(lang)})")
      assert(total - biggest < budget,
        s"$lang overshot by more than one document: total $total, biggest doc $biggest")
    }
    assert(perLang.map(_._1).toSet == fullTotals.keySet, "every stratum must be served")
    // deterministic under re-ordering and re-partitioning
    val s2 = Corpus.sampleToTokenBudget(d.orderBy(col("text")).repartition(7),
      Seq(col("lang")), col("doc_id"), fp, toks, budget)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
           s2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("quantileGate: value-decided tail cut, cutoff ties drop together, corpus never sorts") {
    // scores 1..8 in one group: q=0.25 -> cutoff is the score whose
    // cumulative fraction first reaches 0.25 (= 2), survivors are > 2
    val d = (1 to 8).map(i => (i.toLong, "g", i.toDouble))
      .toDF("id", "grp", "score")
    val got = Corpus.quantileGate(d, Seq("grp"), col("score"), 0.25)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(3L, 4L, 5L, 6L, 7L, 8L), s"got $got")
    // ties AT the cutoff value drop together (value-decided, no
    // row-order tiebreak): 4 copies of score 1, cutoff = 1, all drop
    val tied = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 1.0),
                   (5L, 2.0), (6L, 3.0)).map { case (i, v) => (i, "g", v) }
      .toDF("id", "grp", "score")
    val got2 = Corpus.quantileGate(tied, Seq("grp"), col("score"), 0.25)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got2 == Seq(5L, 6L), s"got $got2")
    // groups gate independently
    val multi = (1 to 4).map(i => (i.toLong, "a", i.toDouble)) ++
                (5 to 8).map(i => (i.toLong, "b", i.toDouble))
    val got3 = Corpus.quantileGate(multi.toDF("id", "grp", "score"),
        Seq("grp"), col("score"), 0.5)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got3 == Seq(3L, 4L, 7L, 8L), s"got $got3")
    // scale contract: the full rows never ride a sort — only the
    // (group, score) count aggregate does; the cutoff side broadcasts
    val gated = Corpus.quantileGate(docs.withColumn("score", length(col("text")).cast("double")),
      Seq("lang"), col("score"), 0.5)
    // sparkPlan: the pre-AQE tree (AdaptiveSparkPlanExec is opaque to collect)
    val plan = gated.queryExecution.sparkPlan
    val sorted = plan.collect {
      case s: org.apache.spark.sql.execution.SortExec
        if s.output.exists(_.name == "text") => s
    }
    assert(sorted.isEmpty, s"corpus rows rode a sort:\n$plan")
    assert(plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, s"cutoffs must broadcast:\n$plan")
  }

  test("mixtureSample: per-source budgets, recipe-absent sources drop, deterministic") {
    val d = (1 to 30).map { i =>
      val src = s"s${i % 3}" // s0, s1, s2 x10 docs, 10 tokens each
      (i.toLong, src, (1 to 10).map(j => s"w$i-$j").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val fp = graft.functions.TextFunctions.fingerprint(col("text"))
    val toks = graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
    // s0 gets ~35 tokens (4 docs with overshoot), s1 ~10 (1 doc +
    // overshoot), s2 absent from the recipe -> drops entirely
    val out = Corpus.mixtureSample(d, col("source"),
        Map("s0" -> 35L, "s1" -> 10L), col("doc_id"), fp, toks)
      .select("doc_id", "source")
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet == Set("s0", "s1"), s"got $bySrc")
    assert(bySrc("s0") == 4, s"35-token budget of 10-token docs -> 4 (overshoot-one): $bySrc")
    assert(bySrc("s1") == 1, s"10-token budget -> exactly 1 doc: $bySrc")
    // deterministic under re-ordering/re-partitioning
    val again = Corpus.mixtureSample(d.orderBy(col("text").desc).repartition(5),
        col("source"), Map("s0" -> 35L, "s1" -> 10L), col("doc_id"), fp, toks)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("topTerms: integer-lexicographic characteristic terms, stopwords excluded") {
    val d = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana banana apple common"),
      (3L, "cherry common common the the")).toDF("doc_id", "text")
    val out = Corpus.topTerms(d, col("doc_id"), col("text"), k = 2,
        stopwords = Seq("the"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    // doc 1: apple tf=2 beats banana/common tf=1; banana (df 2) beats common (df 3)
    // doc 3: common tf=2 first; cherry (df 1) ranks 2; 'the' never appears
    assert(out == Seq(
      (1L, 1, "apple", 2L, 2L), (1L, 2, "banana", 1L, 2L),
      (2L, 1, "banana", 2L, 2L), (2L, 2, "apple", 1L, 2L),
      (3L, 1, "common", 2L, 3L), (3L, 2, "cherry", 1L, 1L)), s"got $out")
    // empty and all-stopword docs emit nothing
    val e = Corpus.topTerms(Seq((9L, ""), (10L, "the the")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), 3, Seq("the"))
    assert(e.count() == 0)
  }

  test("vocabulary: tf/df top-k plans as a bounded top-k, counts exact") {
    val d = Seq(
      (1L, "the cat and the dog"),
      (2L, "the dog"),
      (3L, "a cat"),
    ).toDF("doc_id", "text")
    val v = Corpus.vocabulary(d, col("doc_id"), col("text"), 3)
    val rows = v.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // tf counts every occurrence, df distinct docs; ties break on word
    assert(rows == Seq(("the", 3L, 2L), ("cat", 2L, 2L), ("dog", 2L, 2L)))
    // r16: the hash-keyed single-job plan — counting on TokenHashes
    // longs, vocabulary-sized string recovery, and a still-bounded
    // top-k (TakeOrderedAndProject, never a global vocabulary sort)
    val plan = v.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocabulary top-k must be bounded, not a global sort:\n$plan")
  }

  test("vocabulary is bit-identical to the string-keyed groupBy formulation (r16)") {
    val d = adversarialTokenFixtures(seed = 164).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text").repartition(4)
    val k = 40
    val got = Corpus.vocabulary(d, col("doc_id"), col("text"), k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // the pre-r16 plan: explode token STRINGS, group by the string
    val want = d.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy(col("word"), col("doc_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("word"))
      .agg(sum(col("c")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("word")).limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"hash-counted vocabulary diverged from the string plan")
  }

  test("surprisal token-hash stream is bit-identical to the string-keyed formulation (r16)") {
    import org.apache.spark.sql.expressions.Window
    val d = adversarialTokenFixtures(seed = 165).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text").repartition(4)
    val got = Corpus.surprisal(d, col("doc_id"), col("text"))
    // the pre-r16 plan: explode token STRINGS, window over the string
    val dw = d.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("_c"))
    val tf = dw.withColumn("_tf", sum(col("_c")).over(Window.partitionBy(col("word"))))
    val want = tf.groupBy(col("doc_id")).agg(
      sum(col("_c")).cast("long").as("n_tokens"),
      sum(col("_c") * (length(bin(col("_tf"))) - 1).cast("long"))
        .cast("long").as("freq_bits"),
      sum(when(col("_tf") === 1L, 1L).otherwise(0L)).cast("long").as("hapax"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "hash-keyed surprisal diverged from the string plan")
  }

  test("interleave: every prefix of the vtime order carries the weighted mix (±1/source)") {
    val d = (1 to 12).map(i => (i.toLong, "a")).++((1 to 4).map(i => (i.toLong, "b")))
      .toDF("id", "src")
    val out = Corpus.interleave(d, col("src"), Map("a" -> 3L, "b" -> 1L), Seq(col("id")))
      .orderBy("vtime", "src", "id")
      .collect().map(r => r.getString(1)).toSeq
    assert(out.length == 16)
    // WFQ guarantee: after any prefix of length n, each source has
    // delivered at least floor(n * w_s / W) - 1 rows
    for (n <- 1 to 16) {
      val p = out.take(n)
      assert(p.count(_ == "a") >= n * 3 / 4 - 1, s"prefix $n starves a: $p")
      assert(p.count(_ == "b") >= n / 4 - 1, s"prefix $n starves b: $p")
    }
    // unweighted sources drop
    val d2 = d.union(Seq((99L, "c")).toDF("id", "src"))
    assert(Corpus.interleave(d2, col("src"), Map("a" -> 3L, "b" -> 1L),
      Seq(col("id"))).count() == 16)
  }

  test("Profile.columns: nulls excluded from distinct, one row per column, one pass") {
    val d = Seq(
      (1L, Option("a")), (2L, Option("a")), (3L, None), (4L, Option("b")),
    ).toDF("id", "s")
    val p = graft.operators.Profile.columns(d).orderBy("col_name")
    val rows = p.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // count(DISTINCT s) is SQL-semantics: NULL contributes nothing
    assert(rows == Seq(("id", 4L, 0L, 4L), ("s", 4L, 1L, 2L)))
    intercept[IllegalArgumentException](
      graft.operators.Profile.columns(d, Seq("nope")))
  }

  test("Profile.columnsApprox: exact below k, KMV-bounded above it, no Expand in the plan (r10)") {
    // planted NDVs: 'big' has 50k distinct (far above k), 'small' 37,
    // 'nul' is all-null — same schema contract as the exact profile
    val d = spark.range(50000).selectExpr(
      "id AS big", "id % 37 AS small", "CAST(NULL AS STRING) AS nul")
    val k = 1024
    val byName = graft.operators.Profile.columnsApprox(d, k = k).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byName("small") == ((50000L, 0L, 37L)),
      s"below-k cardinality must be EXACT: ${byName("small")}")
    assert(byName("nul") == ((50000L, 50000L, 0L)),
      "an all-null column has zero distinct values (count_distinct parity)")
    val (_, _, bigEst) = byName("big")
    assert(math.abs(bigEst - 50000L) <= 50000L * 0.12,
      s"KMV estimate out of bound for planted 50k NDV: $bigEst")
    // the scale contract: ONE ordinary aggregate — no Expand (the exact
    // profile's multi-distinct shape), state bounded at k per column
    val plan = d.agg(graft.functions.KmvSketch.kmv(xxhash64(col("big")), k))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
    // determinism: same input, same estimate
    val again = graft.operators.Profile.columnsApprox(d, k = k).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(again("big") == bigEst)
  }

  test("surprisal: integer frequency bits, hapax count, repeated tokens weighted") {
    val d = Seq(
      (1L, "the the the the cat"), // the: tf=5 -> 2 bits each; cat: tf=2 -> 1 bit
      (2L, "the zyzzyva"),         // zyzzyva: tf=1 -> 0 bits, hapax
      (3L, "cat"),
    ).toDF("doc_id", "text")
    val s = Corpus.surprisal(d, col("doc_id"), col("text")).orderBy("doc_id")
    val rows = s.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq(
      (1L, 5L, 4L * 2 + 1, 0L),  // 4x the(2 bits) + 1x cat(1 bit) = 9
      (2L, 2L, 2L, 1L),          // the(2) + zyzzyva(0); one hapax
      (3L, 1L, 1L, 0L)))         // cat(1 bit)
    // doc text never shuffles: every Exchange carries (doc_id, word)
    // pairs or smaller, not the original text column
    val plan = s.queryExecution.executedPlan.toString
    assert(!plan.contains("text#") ||
      !plan.split("Exchange").tail.exists(_.take(200).contains("text#")),
      s"the text column must not cross an Exchange:\n$plan")
  }

  test("removeDuplicatedSpans: shared spans vanish everywhere, unique text and short docs survive") {
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ") // a 10-word run
    val d = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three $shared four"),
      (3L, "totally unique words here nothing repeats at all ever"),
      (4L, "tiny doc"), // shorter than k -> untouched
      (5L, "x y " + (1 to 8).map(i => s"self$i").mkString(" ") + " mid " +
           (1 to 8).map(i => s"self$i").mkString(" ") + " z"),
    ).toDF("doc_id", "text")
    val out = Corpus.removeDuplicatedSpans(d, col("doc_id"), col("text"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // the shared run is gone from BOTH docs; their unique words survive
    assert(out(1L) == "alpha beta gamma delta", out(1L))
    assert(out(2L) == "one two three four", out(2L))
    assert(out(3L) == "totally unique words here nothing repeats at all ever")
    assert(out(4L) == "tiny doc")
    // within-doc repetition removes BOTH copies (symmetric rule)
    assert(!out(5L).contains("self1") && out(5L).contains("mid"), out(5L))
  }

  test("topNgrams: sliding n-grams, short docs contribute nothing, bounded top-k") {
    val d = Seq(
      (1L, "a b c a b c"),   // "a b c" x2, "b c a", "c a b"
      (2L, "a b c"),
      (3L, "a b"),           // shorter than n -> nothing
      (4L, ""),
    ).toDF("doc_id", "text")
    val v = Corpus.topNgrams(d, col("doc_id"), col("text"), n = 3, k = 2)
    val rows = v.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq(("a b c", 3L, 2L), ("b c a", 1L, 1L)),
      s"tf counts occurrences, df distinct docs, ties on ngram: $rows")
    // r14: the operator runs its bounded top-k internally (persisted-agg
    // guard) and hands back the <= k winner rows as a local frame — the
    // caller's plan must stay a LocalTableScan, never a re-computation
    val plan = v.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"topNgrams must return its bounded winner set locally:\n$plan")
  }

  test("stratifiedSample: exact quotas, deterministic under input order, corpus never shuffles") {
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val fp = graft.functions.TextFunctions.fingerprint(col("text"))
    val s1 = Corpus.stratifiedSample(d, Seq(col("lang")), col("doc_id"), fp, 7)
    val quotas = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(quotas.getOrElse(lang, 0L) == math.min(7L, n),
        s"stratum $lang: want min(7, $n), got ${quotas.get(lang)}")
    }
    // same sample out of a differently-ordered, differently-partitioned input
    val s2 = Corpus.stratifiedSample(d.orderBy(col("text")).repartition(7),
      Seq(col("lang")), col("doc_id"), fp, 7)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
           s2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // the semi-join side carrying text must be broadcast, not shuffled
    val plan = s1.queryExecution.executedPlan
    val shuffled = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if s.output.exists(_.name == "text") => s
    }
    assert(shuffled.isEmpty, s"corpus text rode a shuffle:\n$plan")
  }

  test("bm25TopK: exact integer ranking honors tf, dl normalization, and idf (r9b)") {
    val corpus = Seq(
      (1L, "spark spark spark data"),               // high tf, short doc
      (2L, "spark data " + ("pad " * 50).trim),     // same terms, long doc → lower score
      (3L, "spark"),                                // one matched term
      (4L, "nothing relevant here"),                // no match → absent
      (5L, "data data data data")                   // rarer term weighting
    ).toDF("doc_id", "text")
    val out = Corpus.bm25TopK(corpus, col("doc_id"), col("text"),
      query = Seq("spark", "data"), k = 10)
    val rows = out.orderBy(col("score_scaled").desc, col("doc_id")).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 5L), "only matching docs rank")
    val byDoc = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc(1L) > byDoc(2L), "longer doc with the same terms scores lower (b-normalization)")
    assert(byDoc(1L) > byDoc(3L), "more matched terms and higher tf score higher")
    // determinism bit-for-bit across runs and partitionings
    val again = Corpus.bm25TopK(corpus.repartition(7), col("doc_id"), col("text"),
      query = Seq("spark", "data"), k = 10)
      .orderBy(col("score_scaled").desc, col("doc_id")).collect()
    assert(again.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      rows.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // the double score is exactly the scaled integer cast
    assert(rows.forall(r => r.getDouble(3) == r.getLong(1).toDouble / 1e9))
  }

  test("piiScrub: counts and typed redaction; non-PII text untouched (r9b)") {
    val d = Seq(
      (1L, "mail a.b-c_d@ex-ample.org and x@y.io end"),
      (2L, "ip 192.168.1.254 and 10.0.0.1"),
      (3L, "call +4915123456789 now"),
      (4L, "no pii here at all"),
      (5L, "mixed bob@corp.com from 172.16.0.9 tel +14155550100")
    ).toDF("doc_id", "text")
    val out = Corpus.piiScrub(d, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((2, 0, 0), (0, 2, 0), (0, 0, 1), (0, 0, 0), (1, 1, 1)))
    assert(out(0).getString(4) == "mail <EMAIL> and <EMAIL> end")
    assert(out(1).getString(4) == "ip <IP> and <IP>")
    assert(out(2).getString(4) == "call <PHONE> now")
    assert(out(3).getString(4) == "no pii here at all")
    assert(out(4).getString(4) == "mixed <EMAIL> from <IP> tel <PHONE>")
    // scalar map: no shuffle
    assert(!Corpus.piiScrub(d, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }

  /** Adversarial fixture corpus for the PiiScan scanners: skewed toward
    * the pattern alphabets (digit runs, dot runs, '@', '+', parens) so
    * boundary/backtracking edge cases actually occur, with realistic and
    * deliberately-broken PII fragments spliced in. */
  private def piiAdversarial: Seq[String] = {
    val rnd = new scala.util.Random(151)
    val alphabet = "0123456789....+++@@  ()--__%%<>abcXYZé中"
    val fragments = Seq(
      "a@b.cc", "user.name+tag@mail.example.org", "x@y.io", "@no.local",
      "no-at-sign.com", "1.2.3.4", "192.168.000.1", "999.999.999.999",
      "1234.5.6.7.8", "1.2.3.4567.8", "1.2.3.4.5", "12.34.56.", ".1.2.3.4",
      "a1.2.3.4", "1.2.3.4a", "1.2.3.4@x.com", "cc1.2.3.4", "+12345678",
      "+123456", "+1234567890123456789", "+1 (555) 123-4567",
      "+1 (23) 456789a@b.cc", "call +4915123456789 now", "+1-2-3-4-5-6-7-8",
      "+ 12345678", "tel:+14155550100", "a@b.cc1.2.3.4", "x@y.z", "x@.com",
      "x@c.c1", "é@ex.fr", "😀+12345678😀")
    val gens = (0 until 2500).map { _ =>
      val n = rnd.nextInt(60)
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        if (rnd.nextInt(8) == 0 && fragments.nonEmpty)
          sb.append(fragments(rnd.nextInt(fragments.length)))
        else sb.append(alphabet.charAt(rnd.nextInt(alphabet.length)))
        i += 1
      }
      sb.toString
    }
    fragments ++ gens :+ ""
  }

  test("TokenCounts is bit-identical to the builtin split/regex counts (r15)") {
    import graft.functions.{TextFunctions, TokenCounts}
    val rnd = new scala.util.Random(152)
    // r16 advice: the alphabet carries a NON-BMP code point (😀, a
    // surrogate pair) -- java regex classes match code points, so one
    // emoji is ONE `[^a-zA-Z0-9\s]` pre-token, not two
    val alphabet = "ab XY12 .,!\t\n\f\r  é中_-😀"
    val fixtures = Seq("", " ", "\t", " \t ", "a", " a ", "\ta\t", "a b",
      "a1b2", "12.34", "...", "é中", "  x \f ", "a  \t b\nc",
      "a😀b 1😀", "😀😀", "x😀", "😀 1") ++
      (0 until 2000).map { _ =>
        val n = rnd.nextInt(50)
        (0 until n).map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
      }
    val d = fixtures.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text").repartition(4)
    val fused = d.select(col("doc_id"), TokenCounts.col(col("text")).as("_t"))
      .select(col("doc_id"), col("_t.ws").as("ws"), col("_t.bpe").as("bpe"))
    val builtin = d.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("int").as("ws"),
      TextFunctions.bpeTokenCount(col("text")).cast("int").as("bpe"))
    assert(fused.exceptAll(builtin).isEmpty && builtin.exceptAll(fused).isEmpty,
      "fused token counts must equal the builtin split/regex counts")
  }

  test("ShingleHashes corpus modes are bit-identical to the builtin compositions (r16)") {
    val d = adversarialTokenFixtures(seed = 166).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text").repartition(4)
    for (k <- Seq(1, 3, 13)) {
      val toks = split(trim(col("text")), "\\s+")
      // the builtin gram-string chain the natives replaced
      val gramStrings = when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - (k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k)))))
        .otherwise(array().cast("array<string>"))
      // non-distinct hash stream (the counting pass)
      val gotAll = d.select(col("doc_id"),
        graft.functions.ShingleHashes.shingles(toks, k,
          fnv = false, distinct = false, emptyBelowK = true).as("h"))
      val wantAll = d.select(col("doc_id"),
        transform(gramStrings, g => xxhash64(g)).as("h"))
      assert(gotAll.exceptAll(wantAll).isEmpty && wantAll.exceptAll(gotAll).isEmpty,
        s"non-distinct shingle hashes diverged from the builtin chain at k=$k")
      // distinct hash stream (the existence/novelty pass) — order matters:
      // array_distinct keeps first occurrence, so compare ARRAYS
      val gotD = d.select(col("doc_id"),
        graft.functions.ShingleHashes.shingles(toks, k,
          fnv = false, distinct = true, emptyBelowK = true).as("h"))
      val wantD = d.select(col("doc_id"),
        array_distinct(transform(gramStrings, g => xxhash64(g))).as("h"))
      assert(gotD.exceptAll(wantD).isEmpty && wantD.exceptAll(gotD).isEmpty,
        s"distinct shingle hashes diverged from the builtin chain at k=$k")
      // native gram STRINGS (the recovery pass)
      val gotS = d.select(col("doc_id"),
        graft.functions.WordShingleStrings.shingles(toks, k).as("g"))
      val wantS = d.select(col("doc_id"), gramStrings.as("g"))
      assert(gotS.exceptAll(wantS).isEmpty && wantS.exceptAll(gotS).isEmpty,
        s"native shingle strings diverged from the builtin chain at k=$k")
    }
  }

  test("TokenHashes is bit-identical to transform(split(trim), xxhash64) (r16)") {
    val d = adversarialTokenFixtures(seed = 167).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text").repartition(4)
    val got = d.select(col("doc_id"), graft.functions.TokenHashes.col(col("text")).as("h"))
    val want = d.select(col("doc_id"),
      transform(split(trim(col("text")), "\\s+"), t => xxhash64(t)).as("h"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "native token hashes diverged from the builtin split+hash chain " +
        "(trim strips only 0x20; split keeps leading/trailing empty fields)")
  }

  test("TokenCountPairs equals the per-doc split groupBy, occurrence-complete (r16b)") {
    val d = adversarialTokenFixtures(seed = 171).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text").repartition(4)
    val got = d.select(col("doc_id"),
        explode(graft.functions.TokenCountPairs.col(col("text"))).as("_zc_tc"))
      .select(col("doc_id"), col("_zc_tc.word").as("word"), col("_zc_tc.cnt").as("cnt"))
    // the builtin image: per-(doc, token) occurrence counts over the
    // exact split(trim, -1) fields (leading/trailing empties kept)
    val want = d.select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "native per-doc token count pairs diverged from the builtin " +
        "split+groupBy image (trim strips only 0x20; split keeps " +
        "leading/trailing empty fields; counts per occurrence)")
    // per-doc distinctness: one pair per distinct token
    val dup = got.groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
    assert(dup.isEmpty, "a token surfaced twice in one document's pairs")
  }

  test("ShingleHashCountPairs equals the per-doc hash groupBy; distinct strings equal array_distinct (r16b)") {
    val d = adversarialTokenFixtures(seed = 173).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text").repartition(4)
    val toks = split(trim(col("text")), "\\s+")
    for (k <- Seq(1, 3, 13)) {
      val got = d.select(col("doc_id"),
          explode(graft.functions.ShingleHashCountPairs.shingles(toks, k)).as("_zc_tc"))
        .select(col("doc_id"), col("_zc_tc.gh").as("gh"), col("_zc_tc.cnt").as("cnt"))
      // builtin image: every window hash (emptyBelowK semantics), counted
      // per (doc, hash)
      val want = d.select(col("doc_id"), explode(graft.functions.ShingleHashes.shingles(
          toks, k, fnv = false, distinct = false, emptyBelowK = true)).as("gh"))
        .groupBy(col("doc_id"), col("gh")).agg(count(lit(1)).as("cnt"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"k=$k: native gram count pairs diverged from the hash groupBy image")
      val gotS = d.select(col("doc_id"), explode(graft.functions.WordShingleStrings
          .shingles(toks, k, distinct = true)).as("g"))
      val wantS = d.select(col("doc_id"), explode(array_distinct(
          graft.functions.WordShingleStrings.shingles(toks, k))).as("g"))
      assert(gotS.exceptAll(wantS).isEmpty && wantS.exceptAll(gotS).isEmpty,
        s"k=$k: distinct shingle strings diverged from array_distinct")
    }
  }

  test("WinnerShingleStrings equals the distinct-strings explode filtered to the winner hashes (r16c)") {
    val d = adversarialTokenFixtures(seed = 179).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text").repartition(4)
    val toks = split(trim(col("text")), "\\s+")
    for (k <- Seq(1, 3, 13)) {
      // winner set: every 3rd distinct hash in the corpus (plus two
      // absent hashes — the filter must not invent rows for them)
      val all = d.select(explode(graft.functions.ShingleHashes.shingles(
          toks, k, fnv = false, distinct = true, emptyBelowK = true)).as("gh"))
        .distinct().collect().map(_.getLong(0)).sorted
      val winners = all.zipWithIndex.collect { case (h, i) if i % 3 == 0 => h } ++
        Array(Long.MinValue + 7, 987654321987654321L)
      val got = d.select(col("doc_id"), explode(
          graft.functions.WinnerShingleStrings.shingles(toks, k, winners)).as("w"))
        .select(col("doc_id"), col("w.gh").as("gh"), col("w.ngram").as("g"))
      // builtin image: the previous recovery frame — distinct gram
      // strings per doc, hashed, filtered to the winner set
      val want = d.select(col("doc_id"), explode(graft.functions.WordShingleStrings
          .shingles(toks, k, distinct = true)).as("g"))
        .select(col("doc_id"), xxhash64(col("g")).as("gh"), col("g"))
        .where(col("gh").isin(winners.map(Long.box).toSeq: _*))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"k=$k: winner-filtered shingle strings diverged from the " +
          "explode+filter image")
    }
  }

  test("StripMarkup is bit-identical to the builtin regexp chain (r15)") {
    import graft.functions.{StripMarkup, TextFunctions}
    val rnd = new scala.util.Random(153)
    val fragments = Seq(
      "<script>", "</script>", "<SCRIPT a=b>", "</ScRiPt >", "<style>",
      "</style\t>", "<scriptx>", "<script2>", "<script->", "<script",
      "</style", "<!--", "-->", "<!---->", "<!-->", "<p>", "</p>", "<",
      ">", "<a href=\"x\">", "&amp;", "&lt;", "&gt;", "&quot;", "&#39;",
      "&amp;lt;", "&&amp;", "&unknown;", "text", "a b", "\t\n", "é中",
      "<script>var x = \"</p>\";</script>", "<style>p{}</style>",
      "<script><!-- --></script>", "<!-- <script> -->",
      "<script </script>", "<script a>b</style>", "x<y>z")
    val fixtures = Seq("", "<", "plain text only") ++
      (0 until 1500).map { _ =>
        val n = rnd.nextInt(12)
        (0 until n).map(_ => fragments(rnd.nextInt(fragments.length)))
          .mkString(rnd.nextInt(3) match { case 0 => "" case 1 => " " case _ => "x" })
      }
    val d = fixtures.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text").repartition(4)
    val fused = d.select(col("doc_id"), StripMarkup.col(col("text")).as("clean"))
    val builtin = d.select(col("doc_id"),
      TextFunctions.stripMarkup(col("text")).as("clean"))
    assert(fused.exceptAll(builtin).isEmpty && builtin.exceptAll(fused).isEmpty,
      "fused markup strip must equal the builtin regexp chain")
  }

  test("UrlScan.firstUrl is bit-identical to the builtin regex extraction (r15)") {
    import java.util.regex.Pattern
    import graft.functions.{TextFunctions, UrlScan}
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(154)
    val fragments = Seq(
      "http://a.b", "https://Mirror.example.COM/p?utm_source=x", "http://",
      "https://", "hTTp://x.y", "HTTPS://x.y", "httpss://x.y", "http:/x",
      "http://x.y:8080/path", "http://x.y:/p", "http://x.y:port",
      "http://-.-", "http://x.y/", "http://x.y/a b", "xhttp://a.b",
      "hhttp://a.b", "http://host", "see https://a.bc/d#e?f=g end",
      "http://é.com", "words", " ", "http://a.b\thttp://c.d")
    val fixtures = fragments ++ (0 until 1500).map { _ =>
      val n = rnd.nextInt(8)
      (0 until n).map(_ => fragments(rnd.nextInt(fragments.length)))
        .mkString(rnd.nextInt(2) match { case 0 => "" case _ => " " })
    }
    // direct java.util.regex comparison (interpreted path)
    val pat = Pattern.compile(TextFunctions.UrlPattern)
    fixtures.foreach { s =>
      val m = pat.matcher(s)
      val ref = if (m.find()) m.group(0) else null
      val got = Option(UrlScan.firstUrl(UTF8String.fromString(s)))
        .map(_.toString).orNull
      assert(got == ref, s"firstUrl on <$s>: got <$got>, regex <$ref>")
    }
    // codegen path, against the builtin composition the entry replaced
    val d = fixtures.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text").repartition(4)
    val fused = d.select(col("doc_id"),
      UrlScan.firstUrlCol(col("text")).as("u"))
    val builtin = d.select(col("doc_id"),
      when(size(TextFunctions.urls(col("text"))) > 0,
        element_at(TextFunctions.urls(col("text")), 1)).as("u"))
    assert(fused.exceptAll(builtin).isEmpty && builtin.exceptAll(fused).isEmpty,
      "firstUrl must equal size>0 ? urls[1] : null")
  }

  test("PiiScan scanners reproduce java.util.regex exactly on adversarial input (r15)") {
    import java.util.regex.Pattern
    import graft.functions.{PiiScan, TextFunctions}
    import org.apache.spark.unsafe.types.UTF8String
    def refCount(pat: Pattern, s: String): Int = {
      val m = pat.matcher(s); var c = 0; while (m.find()) c += 1; c
    }
    def refReplace(pat: Pattern, s: String, rep: String): String =
      pat.matcher(s).replaceAll(rep)
    val email = Pattern.compile(Corpus.EmailPattern)
    val ipPlain = Pattern.compile(Corpus.Ipv4Pattern)
    val ipB = Pattern.compile(TextFunctions.Ipv4Pattern)
    val phStrict = Pattern.compile(Corpus.PhonePattern)
    val phLoose = Pattern.compile(TextFunctions.PhonePattern)
    piiAdversarial.foreach { s =>
      // piiStats: counts on the original, clean = sequential chain
      val st = PiiScan.piiStats(UTF8String.fromString(s))
      assert(st.getInt(0) == refCount(email, s), s"emails on <$s>")
      assert(st.getInt(1) == refCount(ipPlain, s), s"ipv4s on <$s>")
      assert(st.getInt(2) == refCount(phStrict, s), s"phones on <$s>")
      val cleanRef = refReplace(phStrict,
        refReplace(ipPlain, refReplace(email, s, "<EMAIL>"), "<IP>"), "<PHONE>")
      assert(st.getUTF8String(3).toString == cleanRef, s"clean on <$s>")
      // redactStats: \b-anchored IPv4 + loose phone
      val rd = PiiScan.redactStats(UTF8String.fromString(s))
      val redRef = refReplace(phLoose,
        refReplace(ipB, refReplace(email, s, "<EMAIL>"), "<IP>"), "<PHONE>")
      assert(rd.getUTF8String(0).toString == redRef, s"red on <$s>")
      assert(rd.getInt(1) == refCount(email, s), s"n_email on <$s>")
      assert(rd.getInt(2) == refCount(ipB, s), s"n_ip on <$s>")
    }
  }

  test("fused piiScrub / redactPiiStats are bit-identical to the builtin regexp chain (r15)") {
    import graft.functions.TextFunctions
    val d = piiAdversarial.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
      .repartition(4)
    val fused = Corpus.piiScrub(d, col("doc_id"), col("text"))
    val builtin = Corpus.piiScrubBuiltin(d, col("doc_id"), col("text"))
    assert(fused.exceptAll(builtin).isEmpty && builtin.exceptAll(fused).isEmpty,
      "fused piiScrub must equal the builtin regexp chain")
    val fusedRed = d.select(col("doc_id"),
        TextFunctions.redactPiiStats(col("text")).as("_r"))
      .select(col("doc_id"), col("_r.red").as("red"),
        col("_r.n_email").as("n_email"), col("_r.n_ip").as("n_ip"))
    val builtinRed = d.select(col("doc_id"),
      TextFunctions.redactPii(col("text")).as("red"),
      size(regexp_extract_all(col("text"), lit(TextFunctions.EmailPattern), lit(0)))
        .cast("int").as("n_email"),
      size(regexp_extract_all(col("text"), lit(TextFunctions.Ipv4Pattern), lit(0)))
        .cast("int").as("n_ip"))
    assert(fusedRed.exceptAll(builtinRed).isEmpty &&
           builtinRed.exceptAll(fusedRed).isEmpty,
      "fused redact must equal the builtin regexp chain")
    // NULL text: struct is null end-to-end, like the regexp builtins
    val withNull = Seq((1L, Option("a@b.cc")), (2L, None))
      .toDF("doc_id", "text")
    val nr = Corpus.piiScrub(withNull, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(nr(1).isNullAt(1) && nr(1).isNullAt(4))
  }

  test("KMV sketch: exact below k, stable estimate above k, partition-invariant (r9b)") {
    import graft.functions.{Fnv1a64, KmvSketch}
    // group 'small' has 10 distinct values (< k=16): estimate is EXACT
    // group 'big' has 5000 distinct values (>> k): estimate within 50%
    val small = (0 until 40).map(i => ("small", s"v${i % 10}"))
    val big = (0 until 5000).map(i => ("big", s"w$i"))
    val df = (small ++ big).toDF("g", "v")
      .withColumn("h", Fnv1a64.rehashUnsigned(Fnv1a64.fingerprint(col("v"))))
    def run(d: org.apache.spark.sql.DataFrame): Map[String, (Long, Int)] =
      d.groupBy("g").agg(KmvSketch.kmv(col("h"), 16).as("sk"))
        .select(col("g"), col("sk.estimate"), col("sk.sample_size"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val got = run(df)
    val bySmall = got("small"); val byBig = got("big")
    assert(bySmall == ((10L, 10)), s"below-k groups are exact: $bySmall")
    assert(byBig._2 == 16)
    assert(byBig._1 > 2500 && byBig._1 < 10000, s"estimate off: ${byBig._1} vs 5000")
    // merge correctness: any partitioning yields the identical sketch
    assert(run(df.repartition(13)) == got)
    // nulls ignored like count(col)
    val withNull = df.unionByName(Seq(("small", null: String)).toDF("g", "v")
      .withColumn("h", Fnv1a64.rehashUnsigned(Fnv1a64.fingerprint(col("v")))))
    assert(run(withNull)("small") == bySmall)
  }

  test("linearQualityGate: integer mean-logit cut, threshold algebra, no-token docs absent (r9b)") {
    val d = Seq((1L, "a b c"), (2L, "x"), (3L, "   "), (4L, "p q r s t")).toDF("doc_id", "text")
    // constant weight +1: score == n_tokens; mean exactly 1
    val unit = Corpus.linearQualityGate(d, col("doc_id"), col("text"),
      nBuckets = 64, weightOf = _ => lit(1L), thresholdNum = 1L, thresholdDen = 1L)
      .orderBy("doc_id").collect()
    assert(unit.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L), "no-token docs emit nothing")
    assert(unit.map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq ==
      Seq((3L, 3L, true), (1L, 1L, true), (5L, 5L, true)))
    // mean 1 fails a 3/2 cut, negative weights fail a 0 cut
    val strict = Corpus.linearQualityGate(d, col("doc_id"), col("text"),
      64, _ => lit(1L), thresholdNum = 3L, thresholdDen = 2L).collect()
    assert(strict.forall(!_.getBoolean(3)))
    val neg = Corpus.linearQualityGate(d, col("doc_id"), col("text"),
      64, _ => lit(-1L), thresholdNum = 0L, thresholdDen = 1L).collect()
    assert(neg.forall(!_.getBoolean(3)))
    // bucket-dependent weights are partition-invariant
    def run(df: org.apache.spark.sql.DataFrame) =
      Corpus.linearQualityGate(df, col("doc_id"), col("text"),
        4096, b => pmod(b * lit(2654435761L), lit(2001L)) - lit(1000L), 0L, 1L)
        .orderBy("doc_id").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(run(d) == run(d.repartition(5)))
  }

  test("groupSplit: a duplicate group never spans splits (r9b)") {
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),   // dup group {1,2}
      (3L, "Alpha  Beta   GAMMA"),                          // normalizes into the group
      (4L, "unique one"), (5L, "unique two"),
      (6L, "unique one")                                    // dup of 4
    ).toDF("doc_id", "text")
    val out = Corpus.groupSplit(corpus, col("doc_id"),
        graft.functions.TextFunctions.fingerprint(col("text")),
        Seq(("train", 80), ("val", 90), ("test", 100)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(out.length == 6, "every doc keeps exactly one assignment")
    val byRep = out.groupBy(_._2)
    assert(byRep(1L).map(_._1).toSet == Set(1L, 2L, 3L), "normalized dups share the group")
    assert(byRep(4L).map(_._1).toSet == Set(4L, 6L))
    assert(byRep.values.forall(_.map(_._3).distinct.length == 1),
      "split label is constant within every duplicate group")

    // NULL group keys = no known group: each such doc is its OWN
    // singleton group (neither dropped nor chained together)
    val withNulls = Seq((10L, "k1"), (11L, "k1"), (12L, null: String), (13L, null: String))
      .toDF("doc_id", "gk")
    val out2 = Corpus.groupSplit(withNulls, col("doc_id"), col("gk"),
        Seq(("train", 80), ("val", 90), ("test", 100)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out2.length == 4, "null-keyed docs must not vanish")
    assert(out2.toMap == Map(10L -> 10L, 11L -> 10L, 12L -> 12L, 13L -> 13L))
  }

  test("shuffleOrder: dense permutation, bit-equal to the single-window rank, null fp drops (r10c)") {
    import graft.functions.TextFunctions
    val d = (1L to 400L).map(i => (i, if (i % 7 == 0) "dup text" else s"text $i"))
      .toDF("doc_id", "text")
      .unionByName(Seq((9999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val fp = TextFunctions.fingerprint(col("text"))
    val out = Corpus.shuffleOrder(d, col("doc_id"), fp).select("doc_id", "pos")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 400, "null-fingerprint row must drop")
    assert(rows.map(_._2).sorted.toSeq == (0L until 400L),
      "positions must be a dense permutation of [0, N)")
    // bit-equality vs the single-window formulation PrefixSum replaces
    // (duplicate texts share a hash position; the id tiebreak decides
    // identically in both)
    val expect = d.where(col("text").isNotNull)
      .withColumn("_p", pmod(fp, lit(1L << 50)))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("_p"), col("doc_id")))
        .cast("long") - 1)
      .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toMap == expect.toMap)
    // deterministic across recomputation (pure function of the data)
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toMap == rows.toMap)
  }

  test("stripMarkup: blocks, comments, tags, entities, whitespace (r10c)") {
    import graft.functions.TextFunctions
    val cases = Seq(
      ("<p>hello <b>world</b></p>", "hello world"),
      ("<script>var x = '<p>no</p>';</script>after", "after"),
      ("<STYLE type=\"a\">p{}</STYLE>text", "text"),
      ("a<!-- hidden <b>x</b> -->b", "a b"),
      // &amp; decodes LAST: &amp;lt; is the literal text "&lt;", never
      // double-decoded to "<"
      ("&amp;lt; stays &lt;b&gt;", "&lt; stays <b>"),
      ("x&#39;y&quot;z&amp;w", "x'y\"z&w"),
      ("  a   \n\t b  ", "a b"),
      ("no markup at all", "no markup at all"))
    val df = cases.zipWithIndex.map { case ((in, _), i) => (i, in) }.toDF("i", "t")
    val got = df.select(col("i"), TextFunctions.stripMarkup(col("t")).as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(got(i) == want, s"case $i")
    }
    // pure scalar chain: no Exchange, stays in whole-stage codegen
    val plan = df.select(TextFunctions.stripMarkup(col("t")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("MgBuffer: bounded state, lower-bound counts, N/(k+1) guarantee, weighted merge (r10d)") {
    import graft.functions.MgBuffer
    // adversarial stream: 3 hot terms (600 each) buried in 2000 distinct
    // singletons, arriving interleaved — N = 3800, k = 9 => any term
    // with count > N/10 = 380 MUST survive
    val b = new MgBuffer(9)
    val rnd = new scala.util.Random(7)
    val stream = rnd.shuffle(
      (0 until 600).flatMap(i => Seq("h0", "h1", "h2")) ++
        (0 until 2000).map(i => s"cold$i")).toList
    var maxSize = 0
    stream.foreach { t => b.add(t); maxSize = math.max(maxSize, b.counts.size) }
    assert(maxSize <= 9, s"state exceeded k: $maxSize")
    Seq("h0", "h1", "h2").foreach { h =>
      assert(b.counts.containsKey(h), s"guaranteed heavy hitter $h evicted")
      val low = b.counts.get(h)
      assert(low <= 600 && low >= 600 - 3800 / 10,
        s"$h count $low outside [${600 - 380}, 600]")
    }
    // mergeable-summaries combine: splitting the stream across buffers
    // and merging keeps the bound (the map-side-partials path)
    val parts = stream.grouped(977).map { chunk =>
      val p = new MgBuffer(9); chunk.foreach(p.add); p
    }.toList
    val merged = parts.reduceLeft { (a, c) => a.merge(c); a }
    assert(merged.counts.size <= 9)
    Seq("h0", "h1", "h2").foreach { h =>
      assert(merged.counts.containsKey(h), s"merged summary lost $h")
      assert(merged.counts.get(h) <= 600)
    }
    // weighted arrival equals unit repeats
    val u = new MgBuffer(3); val w = new MgBuffer(3)
    Seq("a", "b", "c").foreach { t => u.add(t); w.add(t) }
    (0 until 5).foreach(_ => u.add("d"))
    w.addCount("d", 5L)
    assert(u.counts == w.counts)
  }

  test("heavyHitters: exact vs brute force, plan-invariant, threshold guard (r10d)") {
    // 40 distinct terms; 4 planted heavy (share > 1/12), k = 11 covers
    // threshold 1/12 (12 <= k+1); vocab 40 > k so the sketch overflows
    val rows = (0 until 4).flatMap(h => Seq.fill(300)(s"hot$h")) ++
      (0 until 36).flatMap(c => Seq.fill(20)(s"cold$c"))
    val d = new scala.util.Random(3).shuffle(rows).grouped(25)
      .map(_.mkString(" ")).toSeq.toDF("text")
    val n = rows.size.toLong // 1200 + 720 = 1920; heavy iff cnt*12 > 1920
    val brute = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c * 12 > n }
    def run(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      Corpus.heavyHitters(df, col("text"), k = 11, 1, 12)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run(d)
    assert(got == brute, s"got $got want $brute")
    assert(got.keySet == Set("hot0", "hot1", "hot2", "hot3"))
    // plan-invariance: the sketch differs per partitioning, the RESULT
    // cannot (the guarantee covers the threshold)
    assert(run(d.repartition(1)) == brute)
    assert(run(d.repartition(17)) == brute)
    // a threshold below 1/(k+1) would break completeness: refuse loudly
    intercept[IllegalArgumentException](
      Corpus.heavyHitters(d, col("text"), k = 11, 1, 13))
  }

  test("noveltyRate: exact duplicates at zero, unique docs at one, short docs excluded (r10e)") {
    import graft.operators.Corpus
    val d = Seq(
      (1L, "alpha beta gamma delta"),   // shares all grams with doc 2
      (2L, "alpha beta gamma delta"),   // exact duplicate -> novelty 0 both
      (3L, "completely different words entirely"), // all grams unique -> 1.0
      (4L, "alpha beta gamma epsilon"), // shares 'alpha beta gamma' only
      (5L, "too short"),                // < 3 tokens: no grams, no row
    ).toDF("doc_id", "text")
    val got = Corpus.noveltyRate(d, col("doc_id"), col("text"), n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!got.contains(5L), "sub-n-token docs emit no row")
    assert(got(1L) == ((2L, 0L)), s"duplicate doc must be all-shared: ${got(1L)}")
    assert(got(2L) == ((2L, 0L)))
    assert(got(3L) == ((2L, 2L)), "unique doc is fully novel")
    // doc 4: grams = [alpha beta gamma, beta gamma epsilon]; the first
    // appears in docs 1/2 too, the second nowhere else
    assert(got(4L) == ((2L, 1L)), s"partial sharing: ${got(4L)}")
  }

  test("noveltyRate/topNgrams hash shuffle is bit-identical to the string-grouped plan (r13)") {
    import graft.operators.Corpus
    // the production path groups xxhash64 longs; replay the pre-r13
    // string-grouped formulation inline over real docs and demand
    // bit-equality (the injectivity argument made falsifiable)
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")

    val novGot = Corpus.noveltyRate(d, col("doc_id"), col("text"), n = 3)
      .orderBy("id").collect().toSeq
    val gramsStr = d.select(col("doc_id").as("_did"),
      explode(array_distinct(Corpus.wordShingleStrings(col("text"), 3))).as("_g"))
    val byGramStr = gramsStr.groupBy("_g")
      .agg(count(lit(1)).as("_df"), first(col("_did")).as("_d1"))
    val novelStr = byGramStr.where(col("_df") === 1)
      .groupBy(col("_d1").as("_did")).agg(count(lit(1)).as("n_novel"))
    val totalsStr = d.select(col("doc_id").as("_did"),
        size(array_distinct(Corpus.wordShingleStrings(col("text"), 3)))
          .cast("long").as("n_grams"))
      .where(col("n_grams") > 0)
    val novWant = totalsStr.join(novelStr, Seq("_did"), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .withColumn("novelty", col("n_novel").cast("double") / col("n_grams"))
      .withColumnRenamed("_did", "id")
      .orderBy("id").collect().toSeq
    assert(novGot == novWant, "hash-grouped novelty must match the string-grouped plan")

    val topGot = Corpus.topNgrams(d, col("doc_id"), col("text"), n = 3, k = 100)
      .collect().toSeq
    val toks = split(trim(col("text")), "\\s+")
    val gramsAll = when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - lit(2)),
        i => array_join(slice(toks, i, lit(3)), " ")))
      .otherwise(array().cast("array<string>"))
    val topWant = d.select(col("doc_id").as("_did"), explode(gramsAll).as("ngram"))
      .groupBy(col("ngram"), col("_did")).agg(count(lit(1)).as("_c"))
      .groupBy(col("ngram"))
      .agg(sum(col("_c")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("ngram")).limit(100)
      .collect().toSeq
    assert(topGot == topWant, "hash-counted top-k must match the string-grouped plan")
  }

  test("topTerms hash shuffle is bit-identical to the string-grouped plan (r14)") {
    import graft.operators.Corpus
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val stop = Seq("the", "a", "of", "and", "is", "to", "in", "that", "it", "for")
    val got = Corpus.topTerms(d, col("doc_id"), col("text"), k = 3, stop)
      .orderBy("doc_id", "rank").collect().toSeq
    // pre-r14 string-grouped formulation, replayed inline
    val base = d.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .where(length(col("term")) > 0).where(!col("term").isin(stop: _*))
    val tf = base.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    val want = tf.join(dfreq, "term")
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
      .select(col("doc_id"), col("rank").cast("int").as("rank"),
        col("term"), col("tf"), col("df"))
      .orderBy("doc_id", "rank").collect().toSeq
    assert(got == want, "hash-keyed topTerms must match the string-grouped plan")
  }

  test("topNgrams degenerate regime: k-th tf == 1 keeps the whole gram space correct (r14 advice)") {
    import graft.operators.Corpus
    // >4096 distinct unigrams, every tf == 1: the tie-inclusive candidate
    // set is the entire gram space, which must take the non-broadcast
    // fallback and still return the k lexicographically smallest grams
    val d = (0 until 5000).map(i => (i.toLong, f"w$i%05d")).toDF("doc_id", "text")
    val out = Corpus.topNgrams(d, col("doc_id"), col("text"), n = 1, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("w00000", 1L, 1L), ("w00001", 1L, 1L), ("w00002", 1L, 1L)),
      s"degenerate-tie top-k must stay exact: $out")
  }

  test("bpeEncode: greedy lowest-rank loop, chained merges, ties, round trip, codegen/eval parity (r10e)") {
    import graft.functions.BpeEncode
    def enc(text: String, merges: Seq[(String, String)]): Seq[String] =
      spark.range(1).select(BpeEncode.encode(lit(text), merges).as("p"))
        .head().getSeq[String](0)
    // chained merges: (a,b) then (ab,c) — rank order decides, and the
    // second fires only on the first's OUTPUT piece
    assert(enc("abc abcd xy", Seq(("a", "b"), ("ab", "c"))) ==
      Seq("abc", "abc", "d", "x", "y"))
    // rank priority: with (b,c) ranked ABOVE (a,b), "abc" merges bc
    // first and (a,b) can then never fire
    assert(enc("abc", Seq(("b", "c"), ("a", "b"))) == Seq("a", "bc"))
    // all occurrences of the chosen pair merge in one pass, left to
    // right, non-overlapping: "aaaa" with (a,a) -> [aa, aa] -> [aaaa]
    // only if (aa,aa) is ranked; here it is not
    assert(enc("aaaa", Seq(("a", "a"))) == Seq("aa", "aa"))
    assert(enc("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    // the key separator keeps ("ab","c") distinct from ("a","bc")
    assert(enc("abc", Seq(("a", "bc"))) == Seq("a", "b", "c"),
      "(a,bc) must not fire on single-char pieces")
    // empty table = code-point split; whitespace dropped
    assert(enc("hi yo", Nil) == Seq("h", "i", "y", "o"))
    // surrogate pairs survive as single pieces
    assert(enc("a😀b", Nil) == Seq("a", "😀", "b"))
    // round trip + interpreted/codegen parity over a real frame: the
    // filter below runs the expression through codegen, the head()
    // calls above through eval — both must agree with the property
    val d = (1L to 50L).map(i => (i, s"w${i}x y${i % 7}z abc" * (1 + (i % 3).toInt)))
      .toDF("id", "text")
    val merges = Seq(("a", "b"), ("ab", "c"), ("x", " ")) // (x,' ') can never fire: words have no spaces
    val bad = d.select(col("text"),
        BpeEncode.encode(col("text"), merges).as("p"))
      .where(concat_ws("", col("p")) =!= regexp_replace(col("text"), "\\s+", ""))
      .count()
    assert(bad == 0, "round trip must hold for every row")
  }
}
