package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Ann
import graft.dedup.Dedup
import graft.functions.TextFunctions

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("exact dedup keeps lowest id per text") {
    val df = Seq((3L, "aaa"), (1L, "aaa"), (2L, "bbb")).toDF("id", "text")
    val got = Dedup.exact(df, Seq("text"), "id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L))
  }

  test("exact dedup: NULL keep keys lose to real rows; all-NULL classes keep a real row") {
    val df = Seq(
      (Some(3L), "aaa", "keep-me"),  // only non-null id in its class -> must win
      (None, "aaa", "null-a"),
      (None, "bbb", "null-b1"),      // entirely-NULL class -> still one REAL row
      (None, "bbb", "null-b2"))
      .toDF("id", "text", "tag")
    val got = Dedup.exact(df, Seq("text"), "id")
      .orderBy("text").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got.size == 2)
    assert(got.head == ("aaa", "keep-me"), s"NULL keepCol beat a real key: $got")
    assert(got(1)._2 != null, "all-NULL class degenerated to a NULL struct row")
    assert(Set("null-b1", "null-b2").contains(got(1)._2))
  }

  test("exact dedup: `on` covering every column degrades to dropDuplicates") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "text")
    val got = Dedup.exact(df, Seq("id", "text"), "id")
    assert(got.columns.toSeq == Seq("id", "text"))
    assert(got.count() == 2)
  }

  test("exact dedup plans as a partial-aggregated groupBy, not a window") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)).toDF("id", "text", "v")
      val q = Dedup.exact(df, Seq("text"), "id")
      val plan = q.queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"window survived in exact-dedup plan:\n$plan")
      val aggs = plan.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }
      assert(aggs.size >= 2, s"no partial+final aggregation pair:\n$plan")
      assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("minhash pipeline finds a planted near-duplicate and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val other = "completely different words describing some unrelated topic entirely here now"
    val df = Seq((1L, base), (2L, near), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(df, "doc_id",
      TextFunctions.wordShingles(col("text"), 3), threshold = 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("native minhash expression is bit-identical to the builtin composition") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("sh", TextFunctions.wordShingles(col("text"), 3))
    val native = docs.select($"doc_id", Dedup.minhashSignature($"sh", 64).as("sig"))
    val hof = docs.select($"doc_id", Dedup.minhashSignatureHof($"sh", 64).as("sig"))
    val a = native.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val b = hof.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(a.length == 500)
    a.zip(b).foreach { case ((ida, sa), (idb, sb)) =>
      assert(ida == idb && sa == sb, s"signature mismatch for doc $ida")
    }
  }

  test("native simhash expression is bit-identical to the builtin composition") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", TextFunctions.tokens(col("text")))
    val native = docs.select($"doc_id", Dedup.simhash($"toks").as("bits"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val hof = docs
      .withColumn("th", transform($"toks", t => xxhash64(t)))
      .select($"doc_id", Dedup.simhashBits($"th").as("bits"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    native.zip(hof).foreach { case ((ida, ba), (idb, bb)) =>
      assert(ida == idb && ba == bb, s"simhash mismatch for doc $ida")
    }
    // the fnv variant: same sign-counter machinery over fnv1a64 tokens
    val nativeFnv = docs.select($"doc_id", Dedup.simhash($"toks", fnv = true).as("bits"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val hofFnv = docs
      .withColumn("th", transform($"toks", t => graft.functions.Fnv1a64.fingerprint(t)))
      .select($"doc_id", Dedup.simhashBits($"th").as("bits"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    nativeFnv.zip(hofFnv).foreach { case ((ida, ba), (idb, bb)) =>
      assert(ida == idb && ba == bb, s"fnv simhash mismatch for doc $ida")
    }
    // and it must actually differ from the xxhash64 bits (distinct hash)
    assert(native.map(_._2).toSeq != nativeFnv.map(_._2).toSeq)
  }

  test("simhash: identical docs collide at hamming 0") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
                 (3L, "unrelated totally different text")).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(df, "doc_id", TextFunctions.tokens(col("text")), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, 2L, 0)))
  }

  test("cosine brute-force top-k ranks by true cosine") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val got = Ann.bruteForceTopK(df, df.where($"vec_id" === 0), "vec_id", "embedding", 2)
      .orderBy("rank").select("nid").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L))
  }

  test("matryoshka: full-prefix degenerates to brute force; prefix stage drops the full vector") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.where($"vec_id" < 5)
    // dPrefix = full dimension and shortlist >= corpus: the two-stage
    // pipeline must reproduce brute force exactly
    val bf = Ann.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select("qid", "nid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val mt = Ann.matryoshkaTopK(e, q, "vec_id", "embedding", dPrefix = 64, k = 10, shortlist = 600)
      .select("qid", "nid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(mt == bf, "full-prefix matryoshka must equal brute force")

    // These embeddings are near-uniform random (no MRL training), so a
    // quarter prefix carries only its proportional signal share — the
    // meaningful bound is against the random-shortlist baseline
    // (50/499 ~ 0.10): observed ~0.44, i.e. the prefix stage genuinely
    // ranks. MRL-trained embeddings front-load far more.
    val mt16 = Ann.matryoshkaTopK(e, q, "vec_id", "embedding", dPrefix = 16, k = 10, shortlist = 50)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bfPairs = bf.map(t => (t._1, t._2))
    val recall = mt16.intersect(bfPairs).size.toDouble / bfPairs.size
    assert(recall >= 0.3, f"quarter-prefix recall $recall%.2f not above the ~0.10 random baseline")

    // scale contract: the prefix scoring stage must not carry the full
    // 64-float vector across the join — only the 16-element slice
    val plan = Ann.matryoshkaTopK(e, q, "vec_id", "embedding", 16, 10, 50)
      .queryExecution.optimizedPlan
    val stage1 = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.output.exists(_.name == "_zc_cp") => j
    }
    assert(stage1.nonEmpty, "expected the prefix cross join in the plan")
    assert(!stage1.head.output.map(_.name).contains("_zc_cv"),
      s"prefix stage must not carry the full vector, got ${stage1.head.output.map(_.name)}")
  }

  test("lsh top-k achieves high recall vs brute force on real embeddings") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.where($"vec_id" < 5)
    val exact = Ann.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // These embeddings are near-uniform random (top-10 sims ~0.45, i.e.
    // ~60-degree angles), the worst case for hyperplane LSH: per-table
    // collision at 4 planes is ~(1 - 60/180)^4 ~ 0.2, so 8 tables give
    // ~1-(0.8)^8 ~ 0.83 expected recall. Real embedding corpora cluster
    // far more tightly; planes/tables trade candidate volume for recall.
    val approx = Ann.lshTopK(e, q, "vec_id", "embedding", 10, tables = 8, planes = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("search over the int8-dequantized corpus keeps near-perfect recall") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.where($"vec_id" < 5)
    val exact = Ann.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // store quantized (4x smaller), search the dequantized reconstruction:
    // per-element error <= max_abs/254 barely perturbs cosine order
    val (maxAbs, qvec) = Ann.quantizeInt8(col("embedding"))
    val stored = e.select(col("vec_id"), maxAbs.as("ma"), qvec.as("q"))
    val dequant = stored.select(col("vec_id"),
      Ann.dequantizeInt8(col("ma"), col("q")).as("embedding"))
    val viaQuant = Ann.bruteForceTopK(dequant, q, "vec_id", "embedding", 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & viaQuant).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized-corpus recall too low: $recall")
  }

  test("ivf top-k achieves reasonable recall vs brute force") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.where($"vec_id" < 5)
    val exact = Ann.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.ivfTopK(e, q, "vec_id", "embedding", 10, nLists = 16, nProbe = 8)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // near-uniform random embeddings are the IVF worst case too (no
    // cluster structure); nProbe=8 of 16 lists scans ~half the corpus
    assert(recall >= 0.4, s"IVF recall too low: $recall")
  }

  test("persisted IVF index: identical results to the inline path, searches prune unprobed lists") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.where($"vec_id" < 5)
    val path = SparkTestSession.tmp("graft-ivfidx")
    Ann.buildIvfIndex(e, "vec_id", "embedding", path, nLists = 64)
    val persisted = Ann.searchIvfIndex(spark, path, q, "vec_id", "embedding", 10, nProbe = 8)
    val inline = Ann.ivfTopK(e, q, "vec_id", "embedding", 10, nLists = 64, nProbe = 8)
    def key(df: org.apache.spark.sql.DataFrame) = df.select("qid", "nid", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // same deterministic quantizer (hash-sampled centroids) => same results
    assert(key(persisted) == key(inline),
      "persisted-index search must match the inline computation")
    // the probed-list filter reaches the scan as a PARTITION filter
    // (inputFiles ignores pruning, so assert on the planned scan): the
    // pinned INSET is bounded by queries x nProbe, well under the 64
    // list directories on disk
    def probedLists(df: org.apache.spark.sql.DataFrame): Option[Int] = {
      val s = df.queryExecution.executedPlan.toString
      assert("""PartitionFilters: \[[^\]]*_zc_cent""".r.findFirstIn(s).isDefined,
        s"lists scan must carry a partition filter on _zc_cent, plan:\n$s")
      // big pinned sets render as INSET, small ones as IN (...)
      """INSET ([0-9, ]+)""".r.findFirstMatchIn(s).map(_.group(1).split(",").length)
        .orElse("""_zc_cent[^\]]*? IN \(([^)]+)\)""".r.findFirstMatchIn(s)
          .map(_.group(1).split(",").length))
    }
    val probed = probedLists(persisted)
    assert(probed.exists(_ <= 40),
      s"probed-list set must be bounded by queries x nProbe, got $probed")
    // a narrower probe pins a smaller list set still
    val narrow = Ann.searchIvfIndex(spark, path, q, "vec_id", "embedding", 10, nProbe = 2)
    val narrowProbed = probedLists(narrow)
    assert(narrowProbed.exists(n => n <= 10 && n < probed.get),
      s"nProbe=2 must probe fewer lists: $narrowProbed vs $probed")

    // incremental append: an exact duplicate of vector 7 under a new id
    // lands in vector 7's own list (persisted quantizer), so a search
    // FOR vector 7 must now surface the duplicate at cosine ~1
    val dup = e.where($"vec_id" === 7).select(lit(900007L).as("vec_id"), $"embedding",
      $"label")
    Ann.appendToIvfIndex(spark, path, dup, "vec_id", "embedding")
    val after = Ann.searchIvfIndex(spark, path, e.where($"vec_id" === 7),
        "vec_id", "embedding", 10, nProbe = 8)
      .where($"nid" === 900007L).collect()
    assert(after.length == 1 && after(0).getAs[Double]("sim") > 0.999,
      s"appended duplicate must be found at cosine ~1, got ${after.toSeq}")
  }

  test("filtered vector search: pre-filter exactness; payload predicate inside probed IVF lists") {
    import org.apache.spark.sql.expressions.Window
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.where($"vec_id" < 5)
    def key(df: org.apache.spark.sql.DataFrame) = df.select("qid", "nid", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Ann.filteredTopK(e, q, "vec_id", "embedding", 10, $"label" % 3 === 0)
    // independent window-based oracle over the pre-filtered corpus
    val scored = e.where($"label" % 3 === 0).select($"vec_id".as("nid"), $"embedding".as("cv"))
      .crossJoin(q.select($"vec_id".as("qid"), $"embedding".as("qv")))
      .where($"nid" =!= $"qid")
      .withColumn("sim", Ann.cosine($"qv", $"cv"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy($"sim".desc, $"nid")).cast("int"))
      .where($"rank" <= 10)
    assert(key(exact) == key(scored), "filteredTopK must be the true filtered top-k")
    // persisted IVF with the label payload: probing EVERY list makes the
    // filtered search exact — it must reproduce filteredTopK verbatim
    val path = SparkTestSession.tmp("graft-ivfflt")
    Ann.buildIvfIndex(e, "vec_id", "embedding", path, nLists = 16, payloadCols = Seq("label"))
    val full = Ann.searchIvfIndex(spark, path, q, "vec_id", "embedding", 10, nProbe = 16,
      predicate = $"label" % 3 === 0)
    assert(key(full) == key(exact), "full-probe filtered IVF must equal the exact filtered top-k")
    // a translatable conjunct reaches the probed lists' parquet scan as a
    // pushed filter — the filter CUTS index IO rather than adding a pass
    val pushed = Ann.searchIvfIndex(spark, path, q, "vec_id", "embedding", 10, nProbe = 4,
      predicate = $"label" >= 3)
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(label,3)"),
      s"payload predicate must push into the lists scan, plan:\n$plan")
    // narrow probe: pre-filter discipline — every returned row satisfies
    // the predicate (post-filter would leak non-matching rows)
    val narrow = Ann.searchIvfIndex(spark, path, q, "vec_id", "embedding", 10, nProbe = 4,
      predicate = $"label" % 3 === 0)
    val lbl = e.select($"vec_id".as("nid"), $"label").where($"label" % 3 === 0)
    assert(narrow.join(lbl, "nid").count() == narrow.count(),
      "every filtered-search hit must satisfy the predicate")
  }

  test("diversified top-k equals the explicit greedy per-group-cap scan") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.where($"vec_id" < 5)
    val got = Ann.diversifiedTopK(e, q, "vec_id", "embedding", $"label", k = 10, perGroup = 2)
      .select("qid", "nid", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reference: the literal greedy scan — walk candidates in (sim desc,
    // nid) order, skip any whose label already holds 2 results
    val scored = e.select($"vec_id".as("nid"), $"embedding".as("cv"), $"label")
      .crossJoin(q.select($"vec_id".as("qid"), $"embedding".as("qv")))
      .where($"nid" =!= $"qid")
      .withColumn("sim", Ann.cosine($"qv", $"cv"))
      .select("qid", "nid", "label", "sim").collect()
    val ref = scored.groupBy(_.getLong(0)).flatMap { case (qid, rows) =>
      val sorted = rows.sortBy(r => (-r.getDouble(3), r.getLong(1)))
      val cnt = scala.collection.mutable.Map.empty[Any, Int]
      val taken = scala.collection.mutable.Buffer.empty[(Long, Long, Int)]
      for (r <- sorted if taken.size < 10) {
        val g = r.get(2)
        if (cnt.getOrElse(g, 0) < 2) {
          cnt(g) = cnt.getOrElse(g, 0) + 1
          taken += ((qid, r.getLong(1), taken.size + 1))
        }
      }
      taken
    }.toSet
    assert(got == ref, "two-stage closed form must replay the greedy scan exactly")
  }

  test("MMR re-rank replays the reference greedy loop exactly") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.where($"vec_id" < 5)
    val topn = Ann.bruteForceTopK(e, q, "vec_id", "embedding", 30)
    val got = Ann.mmrRerank(topn, e, "vec_id", "embedding", k = 10, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).map { case (qid, rs) => qid -> rs.sortBy(_._3).map(_._2).toSeq }
    // reference: the literal greedy loop in plain Scala, same arithmetic
    // (pre-normalized doubles, left-fold dot, (score desc, id asc) ties)
    val lambda = 0.7; val mu = 1.0 - lambda
    val vecs = e.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def nvecOf(id: Long): Array[Double] = {
      val v = vecs(id).map(_.toDouble)
      var n2 = 0.0; v.foreach(x => n2 += x * x)
      val n = math.sqrt(n2)
      if (n > 0) v.map(_ / n) else v.map(_ => 0.0)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val ref = topn.select("qid", "nid", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (qid, rows) =>
        val cl = rows.toSeq.map(t => (t._2, t._3, nvecOf(t._2)))
        var sel = Vector.empty[Long]
        val selV = scala.collection.mutable.Buffer.empty[Array[Double]]
        for (_ <- 1 to math.min(10, cl.size)) {
          var best = Option.empty[(Long, Double, Array[Double])]
          for ((id, sim, nv) <- cl if !sel.contains(id)) {
            val red = if (selV.isEmpty) 0.0 else selV.map(sv => dot(nv, sv)).max
            val sc = lambda * sim - mu * red
            if (best.isEmpty || sc > best.get._2 ||
                (sc == best.get._2 && id < best.get._1)) best = Some((id, sc, nv))
          }
          best.foreach { b => sel :+= b._1; selV += b._3 }
        }
        qid -> sel.toSeq
      }
    assert(got == ref, "HOF greedy must replay the reference MMR loop")
    // λ = 1 degenerates to the input relevance order
    val plain = Ann.mmrRerank(topn, e, "vec_id", "embedding", k = 5, lambda = 1.0)
    val base = topn.where($"rank" <= 5).select("qid", "nid", "rank")
    assert(plain.select("qid", "nid", "rank").except(base).isEmpty &&
      base.except(plain.select("qid", "nid", "rank")).isEmpty)
  }

  test("native shingle expressions are bit-identical to the HOF compositions") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .unionByName(Seq((900001L, "one two", "en", "t", 7),
                       (900002L, "  padded   spacing  text here  ", "en", "t", 30),
                       (900003L, "ab", "en", "t", 2))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = docs.select(
      TextFunctions.wordShingles($"text", 3).as("wn"),
      TextFunctions.wordShinglesHof($"text", 3).as("wh"),
      TextFunctions.charShingles($"text", 4).as("cn"),
      TextFunctions.charShinglesHof($"text", 4).as("ch"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "word shingle mismatch")
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), "char shingle mismatch")
    }
  }

  test("native dot/cosine expressions are bit-identical to the HOF compositions") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(200)
    val pairs = e.select($"vec_id".as("ida"), $"embedding".as("va"))
      .crossJoin(e.select($"vec_id".as("idb"), $"embedding".as("vb")).limit(5))
    val rows = pairs.select(
      Ann.dot($"va", $"vb").as("d_native"), Ann.dotHof($"va", $"vb").as("d_hof"),
      Ann.cosine($"va", $"vb").as("c_native"), Ann.cosineHof($"va", $"vb").as("c_hof"))
      .collect()
    assert(rows.length == 1000)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)), "dot mismatch")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(3)), "cosine mismatch")
    }
  }

  test("multi-probe LSH: probe slot 0 is the exact bucket; recall never drops") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // bit-identity: the multi-probe layout's slot 0 per table IS the exact bucket
    val planes = 4
    val both = e.limit(50).select(
      graft.ann.LshBuckets.buckets($"embedding", 4, planes, 64).as("exact"),
      graft.ann.LshBuckets.bucketsMultiProbe($"embedding", 4, planes, 64, planes).as("mp"))
      .collect()
    both.foreach { r =>
      val exact = r.getSeq[Long](0)
      val mp = r.getSeq[Long](1)
      assert(mp.length == 4 * (1 + planes))
      (0 until 4).foreach(t => assert(mp(t * (1 + planes)) == exact(t)))
      // flipped-bit buckets differ from the main bucket
      (0 until 4).foreach(t => (0 until planes).foreach(f =>
        assert(mp(t * (1 + planes) + 1 + f) != exact(t))))
    }

    val q = e.where($"vec_id" < 5)
    val exactTop = graft.ann.Ann.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(multiProbe: Boolean): Double = {
      val approx = graft.ann.Ann.lshTopK(e, q, "vec_id", "embedding", 10,
        tables = 4, planes = 4, multiProbe = multiProbe)
        .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exactTop & approx).size.toDouble / exactTop.size
    }
    val (r0, r1) = (recall(false), recall(true))
    assert(r1 >= r0, s"multi-probe recall $r1 dropped below exact-probe recall $r0")
    assert(r1 >= 0.5, s"multi-probe recall too low: $r1")
  }

  test("ivf with k-means refinement keeps recall and stays deterministic in shape") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.where($"vec_id" < 5)
    val exact = Ann.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.ivfTopK(e, q, "vec_id", "embedding", 10,
      nLists = 16, nProbe = 8, kmeansIters = 2)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"k-means IVF recall too low: $recall")
    // the refined quantizer itself: bounded count, right dimensionality
    val cents = Ann.kmeansCentroids(e, "vec_id", "embedding", 16, 2)
    assert(cents.length <= 16 && cents.nonEmpty)
    assert(cents.forall(_._2.length == 64))
  }

  test("identical vectors always pair under cosine LSH") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val planted = e.unionByName(
      e.where($"vec_id" % 100 === 0).withColumn("vec_id", $"vec_id" + 1000000L))
    val pairs = Ann.cosinePairs(planted, "vec_id", "embedding", 0.95)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = e.where($"vec_id" % 100 === 0).select("vec_id")
      .collect().map(_.getLong(0)).map(v => (v, v + 1000000L)).toSet
    assert(pairs == expected)
  }

  test("degenerate buckets stay bounded: a mass-duplicated doc class emits a star, not a clique") {
    // 2000 identical docs + 3 distinct ones. Every identical doc collides
    // in EVERY band bucket; an unguarded all-pairs join would emit ~2M
    // candidates per band (x16 bands). The guard caps each bucket at
    // maxBucket and stars the overflow around the min id: exactly n-1
    // connected pairs out, and the pipeline stays linear in the class size.
    val n = 2000
    val dupes = (1L to n.toLong).map(i => (i, "spam spam spam wonderful spam spam and eggs"))
    val rest = Seq((90001L, "an entirely unrelated document about graph algorithms and parallel joins"),
                   (90002L, "another distinct text concerning sailing ships and ocean navigation routes"),
                   (90003L, "the third singleton document with botanical field notes and seed catalogs"))
    val df = (dupes ++ rest).toDF("doc_id", "text").repartition(8)
    val pairs = Dedup.minhashPairs(df, "doc_id",
        TextFunctions.wordShingles(col("text"), 3), threshold = 0.8, maxBucket = 100)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == n - 1, s"expected star of ${n - 1} pairs, got ${pairs.length}")
    // the star keeps the duplicate group connected through the min id
    assert(pairs.forall(_._1 == 1L))
    assert(pairs.map(_._2).toSet == (2L to n.toLong).toSet)
  }

  test("exhaustive mode returns the FULL C(n,2) clique of a 5k-degenerate bucket, bounded per task") {
    // r2 verdict #7: star expansion suffices for grouping but drops
    // intra-clique pairs when the user wants the exhaustive pair list.
    // A planted 5000-identical class must yield all C(5000,2) pairs with
    // per-task work bounded by cap² (sub-bucket triangle distribution).
    val n = 5000
    val cap = 1000
    val bucket = spark.range(1, n + 1L)
      .select(lit(0).as("_zc_band"), lit(0L).as("_zc_bucket"), col("id").as("_zc_id"))
      .repartition(col("_zc_band"), col("_zc_bucket"))
    val pairs = Dedup.exhaustiveBucketPairs(bucket, Seq("_zc_band", "_zc_bucket"), "_zc_id", cap)
    assert(pairs.count() == n.toLong * (n - 1) / 2,
      s"exhaustive pair count != C($n,2)")
    // spot-check structure: every id pairs with n-1 others
    val deg = pairs.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").count().select("count").distinct().collect()
    assert(deg.map(_.getLong(0)).toSeq == Seq(n - 1L))

    // end-to-end wiring through minhashPairs: a 60-identical class with a
    // tiny cap returns the full clique after verification
    val m = 60
    val dupes = (1L to m.toLong).map(i => (i, "spam spam spam wonderful spam spam and eggs"))
    val df = dupes.toDF("doc_id", "text").repartition(4)
    val full = Dedup.minhashPairs(df, "doc_id",
      graft.functions.TextFunctions.wordShingles(col("text"), 3),
      threshold = 0.8, maxBucket = 20, exhaustive = true)
    assert(full.count() == m.toLong * (m - 1) / 2)
  }

  test("exhaustive mode is wired through the cosine and simhash generators too") {
    val n = 40
    val vec = (1 to 16).map(_.toFloat / 16)
    val dupes = (1L to n.toLong).map(i => (i, vec))
    val df = dupes.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    // identical vectors collide in every LSH table; with a tiny cap the
    // exhaustive path must still return the full clique
    val cos = Ann.cosinePairs(df, "vec_id", "embedding", 0.99,
      maxBucket = 10, exhaustive = true)
    assert(cos.select("a", "b").distinct().count() == n.toLong * (n - 1) / 2)
    val docs = (1L to n.toLong).map(i => (i, "spam spam spam wonderful spam and eggs"))
      .toDF("doc_id", "text")
    val sim = Dedup.simhashPairs(docs, "doc_id",
      TextFunctions.tokens(col("text")), maxHamming = 3,
      maxBucket = 10, exhaustive = true)
    assert(sim.select("a", "b").distinct().count() == n.toLong * (n - 1) / 2)
  }

  test("groups: connected components match a brute-force union-find; keepRepresentatives dedups") {
    // chain a-b-c-d plus a separate pair and a star
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (20L, 22L), (20L, 23L))
      .toDF("a", "b")
    val got = Dedup.groups(pairs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))

    // real pipeline: planted duplicates (orig + 1000000 every 10th doc)
    // must group with their originals; cross-check against a driver-side
    // union-find over the same pairs
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val planted = docs.unionByName(
      docs.where($"doc_id" % 10 === 0).withColumn("doc_id", $"doc_id" + 1000000L))
    val mp = Dedup.minhashPairs(planted, "doc_id",
      TextFunctions.wordShingles(col("text"), 3), threshold = 0.8)
    val edges = mp.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct.map(x => x -> find(x)).toMap
    val gotBig = Dedup.groups(mp).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotBig == expected)
    // the adaptive driver union-find (default) and the distributed
    // propagation loop (forced) must produce the identical labeling
    val gotLoop = Dedup.groups(mp, driverMaxEdges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotLoop == gotBig, "driver fast path and distributed loop diverge")

    // keepRepresentatives removes exactly the non-representative members
    val kept = Dedup.keepRepresentatives(planted, mp, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val doomed = expected.collect { case (id, rep) if id != rep => id }.toSet
    assert(kept == planted.select("doc_id").collect().map(_.getLong(0)).toSet -- doomed)
  }

  test("groups: lineage is truncated across rounds (plan does not grow with iterations)") {
    // a 16-node chain needs ~15 propagation rounds — far past the every-3rd
    // localCheckpoint cadence, so the returned labels' logical plan must be
    // a checkpoint leaf (+ the final round's join), NOT 15 stacked joins.
    // persist-only lineage would recompute the whole chain on executor loss.
    val chain = (1L until 16L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.groups(chain, maxIterations = 20, driverMaxEdges = 0)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (1L to 16L).map(_ -> 1L).toMap)
    val planJoins = labels.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size
    assert(planJoins <= 6, // ≤3 rounds since the last checkpoint × 2 joins/round
      s"expected lineage truncated to the post-checkpoint rounds' joins, got $planJoins")
    assert(labels.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
    }.nonEmpty, "expected a localCheckpoint leaf (LogicalRDD) in the lineage")
    // short-converging input (2 rounds) never pays a checkpoint: shape sanity
    val tiny = Seq((1L, 2L)).toDF("a", "b")
    assert(Dedup.groups(tiny, driverMaxEdges = 0).collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      Map(1L -> 1L, 2L -> 1L))
  }

  test("groups: a configured checkpoint dir switches to reliable checkpoints") {
    // with sc.setCheckpointDir set, the every-3rd-round truncation uses
    // checkpoint() — labels land on the checkpoint FS and survive
    // executor loss (localCheckpoint blocks die with their executor)
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "spec assumes no ambient checkpoint dir")
    val dir = SparkTestSession.tmp("graft-groups-ckpt")
    sc.setCheckpointDir(dir)
    try {
      val chain = (1L until 16L).map(i => (i, i + 1)).toDF("a", "b")
      val labels = Dedup.groups(chain, maxIterations = 20, driverMaxEdges = 0)
      val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == (1L to 16L).map(_ -> 1L).toMap)
      // lineage is truncated exactly as in local mode
      val planJoins = labels.queryExecution.analyzed.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
      assert(planJoins <= 6, s"expected truncated lineage, got $planJoins joins")
      // the reliable checkpoint actually wrote to the configured dir
      val fs = graft.core.Collection.fileSystem(spark, dir)
      val wrote = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).nonEmpty
      assert(wrote, "reliable checkpoint must persist under the checkpoint dir")
    } finally {
      sc.setCheckpointDir(null)
      assert(sc.getCheckpointDir.isEmpty)
    }
  }

  test("text functions: tokens, bpe, stopwords, langid, fingerprint") {
    val df = Seq((1L, "the cat sat on the mat v2!")).toDF("id", "text")
    val row = df.select(
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.bpeTokenCount($"text").as("bpe"),
      TextFunctions.stopwordRatio($"text", Seq("the", "on")).as("sr"),
      TextFunctions.langId($"text").as("lang"),
      TextFunctions.fingerprint($"text").as("fp"),
    ).collect()(0)
    assert(row.getInt(0) == 7)
    assert(row.getInt(1) == 9) // the,cat,sat,on,the,mat,v,2,!
    assert(math.abs(row.getDouble(2) - 3.0 / 7) < 1e-12)
    assert(row.getString(3) == "en")
    // fingerprint is stable and normalization-insensitive
    val fp2 = Seq((1L, "  THE cat   sat on the mat v2!")).toDF("id", "text")
      .select(TextFunctions.fingerprint($"text")).collect()(0).getLong(0)
    assert(row.getLong(4) == fp2)
  }

  test("quality rules, decontamination fingerprint join, and PII redaction") {
    // quality rules: prose passes, degenerate inputs fail each rule
    val docs = Seq(
      (1L, "the quick brown fox is seen running to the old mill in the morning " * 3), // prose
      (2L, "a b"),                                     // too few tokens
      (3L, ("!!! ??? ;;; " * 40) + "the of and is to") // punct ratio over ceiling
    ).toDF("doc_id", "text")
    val kept = docs.where(TextFunctions.qualityRules(col("text"), minTokens = 5,
        maxTokens = 1000, minAvgTokenLen = 2.0, maxAvgTokenLen = 12.0,
        maxPunctRatio = 0.25, minStopwordHits = 1))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L), s"quality rules kept $kept")

    // decontamination: fingerprint anti-join removes exact-normalized dups
    val bench = Seq("held out benchmark prompt").toDF("text")
      .select(TextFunctions.fingerprint(col("text")).as("fp"))
    val train = Seq((1L, "held   out benchmark PROMPT"), (2L, "clean document"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
    val survivors = train.join(broadcast(bench), Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(survivors == Seq(2L), "normalization-equal doc must be decontaminated")

    // redaction: typed placeholders, counts from the pre-redaction text
    val red = Seq((1L, "mail a.b@c.io or 10.0.0.1 or +1 (555) 123-4567 end"))
      .toDF("doc_id", "text")
      .select(TextFunctions.redactPii(col("text")).as("r")).collect().head.getString(0)
    assert(red == "mail <EMAIL> or <IP> or <PHONE> end", red)
  }

  test("decontamination plans as a broadcast anti-join (corpus never shuffles)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val corpus = spark.range(1000).selectExpr("id AS doc_id", "concat('doc ', id) AS text")
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      val bench = spark.range(10).selectExpr("concat('doc ', id * 7) AS text")
        .select(TextFunctions.fingerprint(col("text")).as("fp"))
      val q = corpus.join(broadcast(bench), Seq("fp"), "left_anti")
      val plan = q.queryExecution.executedPlan
      val bhj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      assert(bhj.nonEmpty, s"decontamination must broadcast the benchmark side:\n$plan")
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }.isEmpty, s"corpus side must not shuffle:\n$plan")
      assert(q.count() == 1000 - bench.distinct().count())
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("normalize_text: NFC compose, control strip, whitespace collapse, trim") {
    import graft.functions.NormalizeText
    // decomposed e+combining acute must NFC-compose to the precomposed
    // code point; BEL stripped; runs of mixed whitespace collapse; edges trim
    val messy = "  caf" + "e\u0301" + "\u0007" + " \t\n x  " + "\u000b" + " y\u007f  "
    val want = "caf\u00e9 x y"
    val viaExpr = Seq(messy).toDF("t")
      .select(NormalizeText.normalizeText($"t").as("n")).collect()(0).getString(0)
    assert(viaExpr == want, s"got ${viaExpr.codePoints().toArray.toSeq}")

    // static helper (interpreted path) agrees with the codegen path
    import org.apache.spark.unsafe.types.UTF8String
    assert(NormalizeText.normalize(UTF8String.fromString(messy)).toString == want)

    // null propagates, empty and all-junk strings normalize to empty
    val r = Seq((Some(""), 1), (None: Option[String], 2), (Some(" \t \u0007 "), 3))
      .toDF("t", "i").select($"i", NormalizeText.normalizeText($"t").as("n"))
      .collect().map(x => (x.getInt(0), if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(r(1) == "" && r(2) == null && r(3) == "")

    // idempotent: normalizing a normalized string is a no-op
    assert(NormalizeText.normalize(UTF8String.fromString(want)).toString == want)
  }

  test("fnv1a64 matches the reference FNV-1a constants") {
    // FNV-1a("") = offset basis; FNV-1a("a") is the published test vector
    val got = Seq(("a")).toDF("t")
      .select(graft.functions.Fnv1a64.fingerprint($"t")).collect()(0).getLong(0)
    assert(got == 0xaf63dc4c8601ec8cL)
  }

  test("semanticDedup: cluster-bounded near-dup removal, smaller id wins") {
    import graft.ann.Ann
    import org.apache.spark.sql.functions._
    // 200 well-separated base vectors + planted duplicates: exact copies
    // of 4 and 8, and a tiny perturbation of 12 (cosine ~0.99997)
    // hash-random components: 200 vectors whose pairwise cosines
    // concentrate near 0 (a sinusoid family would alias into near-dups)
    val base = spark.range(200).selectExpr("id AS vec_id",
      "transform(sequence(1, 32), j -> cast(pmod(xxhash64(id, j), 1000) / 1000.0 - 0.5 as float)) AS v")
    val copies = base.where(col("vec_id").isin(4L, 8L))
      .select((col("vec_id") + 1000L).as("vec_id"), col("v"))
    val near = base.where(col("vec_id") === 12L)
      .select(lit(2000L).as("vec_id"),
        expr("transform(v, (x, j) -> cast(x + 0.0001 * j as float))").as("v"))
    val zero = spark.sql(
      "SELECT 3000L AS vec_id, transform(sequence(1, 32), j -> cast(0.0 as float)) AS v")
    val corpus = base.unionByName(copies).unionByName(near).unionByName(zero)

    val out = Ann.semanticDedup(corpus, "vec_id", "v", threshold = 0.95, nClusters = 8)
      .select("vec_id").as[Long].collect().sorted.toSeq
    // all copies and the perturbed vector drop (their originals have
    // smaller ids and identical/near-identical embeddings co-cluster);
    // zero-norm survives (NaN cosine never passes the threshold)
    assert(out == ((0L until 200L) :+ 3000L),
      s"expected the 200 originals + the zero vector, got ${out.diff(0L until 200L)}")

    // sanity: the near pair really is above the threshold
    val sim = base.where(col("vec_id") === 12L).select(col("v").as("a"))
      .crossJoin(near.select(col("v").as("b")))
      .select(Ann.cosine(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(sim >= 0.95, s"perturbed cosine $sim")
  }

  test("containmentPairs: prefix-filter recall-completeness vs brute force, seeded random universes (r10e)") {
    // The prefix filter is recall-complete by theorem; this replays the
    // theorem empirically across 6 seeded random corpora (varied set
    // sizes, heavy element skew so rare-first ordering actually bites,
    // planted subset/superset pairs) and checks EXACT equality with the
    // brute-force O(n^2) overlap-coefficient join — both directions:
    // nothing missed (completeness), nothing extra (the verify step).
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed * 7919)
      val universe = 40
      val base = (0L until 50L).map { id =>
        val sz = 1 + rnd.nextInt(12)
        // skewed element draw: low ids are hot, high ids rare
        val set = Seq.fill(sz * 3)(math.min(rnd.nextInt(universe), rnd.nextInt(universe)))
          .map(_.toLong).distinct.take(sz)
        (id, set)
      }
      // planted: doc 100+i holds a strict subset of doc i (containment 1)
      val planted = (0L until 5L).map(i =>
        (100L + i, base(i.toInt)._2.take(math.max(1, base(i.toInt)._2.size - 2))))
      val docs = base ++ planted
      val df = docs.toDF("id", "sh")
      val tau = 0.7
      // BOTH regimes must agree with brute force: the dense bitmap path
      // (default — these universes are tiny) and the sparse
      // prefix+positional path (forced via denseUniverseMax = 0)
      val gotDense = Dedup.containmentPairs(df, "id", col("sh"), tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val gotSparse = Dedup.containmentPairs(df, "id", col("sh"), tau,
          denseUniverseMax = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val byId = docs.toMap
      val want = (for {
        (a, sa) <- docs; (b, sb) <- docs if a < b && sa.nonEmpty && sb.nonEmpty
        inter = sa.toSet.intersect(sb.toSet).size
        if inter.toDouble / math.min(sa.size, sb.size) >= tau
      } yield (a, b)).toSet
      assert(gotDense == want,
        s"seed $seed dense: missed=${want -- gotDense} extra=${gotDense -- want}")
      assert(gotSparse == want,
        s"seed $seed sparse: missed=${want -- gotSparse} extra=${gotSparse -- want}")
      // and the emitted coefficient is the exact brute-force value
      val gotC = Dedup.containmentPairs(df, "id", col("sh"), tau,
          denseUniverseMax = 0)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      gotC.foreach { case ((a, b), c) =>
        val (sa, sb) = (byId(a).toSet, byId(b).toSet)
        val exact = sa.intersect(sb).size.toDouble / math.min(sa.size, sb.size)
        assert(c == exact, s"seed $seed pair ($a,$b): $c != $exact")
      }
    }
    // threshold 1.0: only exact-set or subset-with-equal-min pairs — the
    // prefix degenerates to a single rarest shingle and must still find
    // the identical-set pair, on both paths
    val eq = Seq((1L, Seq(5L, 6L, 7L)), (2L, Seq(5L, 6L, 7L)), (3L, Seq(5L, 6L)))
      .toDF("id", "sh")
    for (denseMax <- Seq(0, 1 << 14)) {
      val full = Dedup.containmentPairs(eq, "id", col("sh"), 1.0,
          denseUniverseMax = denseMax)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(full == Set((1L, 2L), (1L, 3L), (2L, 3L)),
        s"subset at containment 1.0 must qualify (denseMax=$denseMax): $full")
    }
  }

  test("tuneBands: pinned optima, budget respected, threshold monotonicity (r10d)") {
    // pinned against an independent reference implementation of the
    // same FP+FN integral (midpoint quadrature, n=2000)
    assert(Dedup.tuneBands(64, 0.8) == ((6, 10)))
    assert(Dedup.tuneBands(128, 0.8) == ((9, 14)))
    assert(Dedup.tuneBands(64, 0.5) == ((14, 4)))
    assert(Dedup.tuneBands(128, 0.9) == ((5, 25)))
    assert(Dedup.tuneBands(256, 0.7) == ((25, 10)))
    // the banding never spends more hashes than it has, and the S-curve
    // midpoint (1/b)^(1/r) tracks the requested threshold
    for (p <- Seq(32, 64, 128); t <- Seq(0.3, 0.5, 0.7, 0.9)) {
      val (b, r) = Dedup.tuneBands(p, t)
      assert(b * r <= p, s"($b,$r) overspends $p perms")
      val mid = math.pow(1.0 / b, 1.0 / r)
      assert(math.abs(mid - t) < 0.15, s"S-curve midpoint $mid far from $t ($p perms)")
    }
    // higher threshold -> longer rows (stricter bands), fewer of them
    val loose = Dedup.tuneBands(64, 0.4)
    val strict = Dedup.tuneBands(64, 0.9)
    assert(strict._2 > loose._2 && strict._1 < loose._1)
    intercept[IllegalArgumentException](Dedup.tuneBands(64, 1.0))
  }

  test("keepBest: per-cluster quality argmax, min-id tiebreak, singletons survive (r10c)") {
    val docs = Seq(
      (1L, "aaaa"),   // cluster {1,2,3} via chained pairs: lengths 4, 6, 5
      (2L, "bbbbbb"), //   -> 2 wins on quality alone (not min id)
      (3L, "ccccc"),
      (10L, "dd"),    // cluster {10,11}: equal length -> min id 10 wins
      (11L, "ee"),
      (20L, "solo")   // never paired: survives untouched
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val kept = Dedup.keepBest(docs, pairs, "doc_id", length(col("text")))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 10L, 20L))
    // contrast with keepRepresentatives: min-id keeps 1, quality keeps 2
    val rep = Dedup.keepRepresentatives(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(rep == Seq(1L, 10L, 20L))
  }

  test("keepBest: non-numeric ids keep the deterministic min-id tiebreak (r11)") {
    // arithmetic negation of a string id is null — the r10 tie-break
    // silently degraded to a nondeterministic pick; r11 routes
    // non-numeric ids through a rep-partitioned row_number instead
    val docs = Seq(
      ("a2", "xx"), ("a1", "xx"),   // tie on quality -> lexicographic min "a1"
      ("b1", "yyy"), ("b2", "y"),   // quality decides -> "b1"
      ("solo", "z")                 // unpaired survives
    ).toDF("doc_id", "text")
    val pairs = Seq(("a1", "a2"), ("b1", "b2")).toDF("a", "b")
    val kept = Dedup.keepBest(docs, pairs, "doc_id", length(col("text")))
      .select("doc_id").as[String].collect().sorted.toSeq
    assert(kept == Seq("a1", "b1", "solo"))
  }

  test("spread is gated: a wide input plans NO extra Exchange, a narrow one keeps it (r11)") {
    // defaultParallelism is 8 here (local[8]); 16 input slices = wide,
    // 1 slice = the single-row-group-parquet shape the spread exists for
    def corpus(slices: Int) = spark.range(0, 120, 1, slices)
      .select(col("id"), concat(lit("tok"), col("id") % 7, lit(" tok"),
        col("id") % 5, lit(" tok"), col("id") % 3).as("text"))
    // Exchanges are planted by EnsureRequirements — count them in the
    // EXECUTED plan string (the AQE initial plan prints them all)
    def shuffles(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    // the helper itself
    assert(shuffles(Spread.spread(corpus(16), col("id"))) == 0,
      "wide input must not gain an Exchange")
    assert(shuffles(Spread.spread(corpus(1), col("id"))) == 1,
      "narrow input must keep the spread Exchange")
    // through a real operator: the spread exchange is the only
    // repartition in these plans — a wide input must plan NONE
    // (the narrow plan prints it once per join branch; runtime exchange
    // reuse collapses them), and results are identical on both.
    // r13: the spread pins its partition count (AQE must not coalesce
    // the pre-explode shuffle), so the tag is REPARTITION_BY_NUM
    def spreads(df: org.apache.spark.sql.DataFrame): Int =
      "REPARTITION_BY_(COL|NUM)".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    val wideQ = graft.operators.Corpus.noveltyRate(corpus(16), col("id"), col("text"), 2)
    val narrowQ = graft.operators.Corpus.noveltyRate(corpus(1), col("id"), col("text"), 2)
    assert(spreads(wideQ) == 0, s"wide input planned a spread:\n${wideQ.queryExecution.executedPlan}")
    assert(spreads(narrowQ) >= 1, "narrow input lost its spread")
    val w = wideQ.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val n = narrowQ.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(w == n && w.nonEmpty)
  }

  test("spread verdicts are memoized per canonicalized plan — one probe per input (r12)") {
    def corpus(slices: Int) = spark.range(0, 120, 1, slices)
      .select(col("id"), concat(lit("tok"), col("id") % 7).as("text"))
    val df = corpus(16)
    Spread.spread(df, col("id"))
    val after1 = Spread.probes.get()
    // an operator CHAIN over the same input: a fresh but structurally
    // identical DataFrame must hit the cache, not re-plan
    Spread.spread(df, col("id"))
    Spread.spread(corpus(16), col("id"))
    assert(Spread.probes.get() == after1,
      "repeated spread over the same (canonicalized) input must not re-probe")
    // a genuinely different plan probes again
    Spread.spread(corpus(16).where(col("id") > 3), col("id"))
    assert(Spread.probes.get() == after1 + 1)
  }

  test("mg() over a non-string column fails at analysis, not mid-job (r11)") {
    val df = Seq(1L, 2L).toDF("v")
    val ex = intercept[org.apache.spark.sql.AnalysisException](
      df.select(graft.functions.MgSketch.mg(col("v"), 4)).collect())
    assert(ex.getMessage.toLowerCase.contains("type"))
  }
}
