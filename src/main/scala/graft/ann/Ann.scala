package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the query set is the broadcast side — the corpus is never
  * broadcast, never collected, and similarity + top-k run as one pass over
  * corpus partitions followed by a per-query window. The LSH variant
  * (random hyperplanes, Charikar 2002) buckets the corpus so each query
  * only scans candidate buckets — the standard sub-linear scale path when
  * a full scan per query batch stops being acceptable. Candidate pairs are
  * always reduced to bare ids BEFORE `distinct` — vectors rejoin by id
  * afterwards, so wide arrays never ride through a shuffle.
  *
  * Hyperplanes are materialized as plan-time literals from a fixed seed:
  * deterministic across runs/executors, zero per-row hashing. Vector math
  * is `aggregate`/`zip_with` over the array — codegen'd expressions
  * accumulating in DOUBLE in element order (bit-deterministic results).
  */
object Ann {

  /** Dot product of two float-array columns, accumulated in double —
    * native codegen expression ([[VecDot]]); [[dotHof]] is the builtin
    * composition it replaces (bit-identical, spec-checked). */
  def dot(a: Column, b: Column): Column = VecMath.dotCol(a, b)

  /** The higher-order-function formulation [[VecDot]] replaces; kept as
    * the spec's bit-identity cross-check. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a float-array column. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — one fused native loop ([[CosineSim]]);
    * [[cosineHof]] is the builtin composition (bit-identical). */
  def cosine(a: Column, b: Column): Column = VecMath.cosineCol(a, b)

  /** The higher-order-function formulation [[CosineSim]] replaces. */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Exact top-k by cosine: for every row of `queries`, the `k` nearest
    * corpus rows (self-matches excluded by id). `queries` is expected to
    * be small — it is broadcast; the corpus streams. Ties break on the
    * corpus id, so results are total-order deterministic. */
  /** Symmetric INT8 quantization of an embedding column — the storage
    * path every vector store ships (4x smaller than float32, cheap SIMD
    * distances): per-vector max-abs scale, `q_i = floor(x_i * 127 /
    * max_abs + 0.5)` (an explicit floor-based round so any engine
    * reproduces it bit-for-bit — banker's-vs-away rounding differences
    * can't creep in), zero vectors quantize to zeros. Returns
    * `(max_abs, qvec)` columns; dequantization is `q * max_abs / 127`.
    * Pure scalar map — no shuffle at any scale; runs as native fused-loop
    * codegen expressions ([[QuantizeInt8]]), bit-identical to the
    * builtin composition kept as [[quantizeInt8Hof]] for the spec. */
  def quantizeInt8(vec: Column): (Column, Column) = {
    val maxAbs = QuantizeInt8.maxAbsCol(vec)
    (maxAbs, QuantizeInt8.quantizeCol(vec, maxAbs))
  }

  /** The higher-order-function formulation [[QuantizeInt8]] replaces;
    * kept as the spec's bit-identity cross-check. */
  def quantizeInt8Hof(vec: Column): (Column, Column) = {
    val d = transform(vec, x => x.cast("double"))
    val maxAbs = array_max(transform(d, x => abs(x)))
    val qvec = when(maxAbs === 0.0, transform(d, _ => lit(0)))
      .otherwise(transform(d, x => floor(x * 127.0 / maxAbs + 0.5).cast("int")))
    (maxAbs, qvec)
  }

  /** Read path of [[quantizeInt8]]: reconstruct a float vector from the
    * stored `(max_abs, qvec)` pair — searches run over the dequantized
    * corpus (each element within max_abs/254 of the original, so
    * cosine rankings are preserved up to that tolerance; re-rank a
    * shortlist with original vectors when exact order matters). */
  def dequantizeInt8(maxAbs: Column, qvec: Column): Column =
    transform(qvec, q => (q.cast("double") * maxAbs / 127.0).cast("float"))

  /** Mean absolute reconstruction error of [[quantizeInt8]] — an explicit
    * LEFT fold so the floating-point addition order is engine-portable;
    * native fused loop ([[QuantizeInt8.mae]]). */
  def quantizeInt8Mae(vec: Column, maxAbs: Column, qvec: Column): Column =
    QuantizeInt8.maeCol(vec, maxAbs, qvec)

  /** HOF cross-check twin of [[quantizeInt8Mae]]. */
  def quantizeInt8MaeHof(vec: Column, maxAbs: Column, qvec: Column): Column = {
    val d = transform(vec, x => x.cast("double"))
    val errs = zip_with(d, qvec, (a, q) => abs(a - q.cast("double") * maxAbs / 127.0))
    aggregate(errs, lit(0.0), (acc, x) => acc + x) / size(errs)
  }

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("_zc_qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("_zc_cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("_zc_qv"), col("_zc_cv")))
    // Bounded top-k aggregation instead of a window: map-side partial
    // aggregation ships at most k candidates per (task, query) — the
    // full candidate set is never sorted or shuffled.
    val topk = graft.functions.TopKAgg.topK(k)
    scored.groupBy(col("qid"))
      .agg(topk(col("sim"), col("nid")).as("_zc_tk"))
      .select(col("qid"), posexplode(col("_zc_tk")).as(Seq("_zc_pos", "_zc_s")))
      .select(col("qid"), col("_zc_s.id").as("nid"),
        (col("_zc_pos") + 1).cast("int").as("rank"), col("_zc_s.score").as("sim"))
  }

  /** FILTERED vector search (r11b), exact: top-k under a metadata
    * predicate — the other half of every production vector query
    * ("nearest docs WHERE lang = 'en' AND label = 3"; Qdrant/Milvus/
    * Vespa all make this a first-class parameter). PRE-filter
    * semantics: the predicate restricts the corpus BEFORE scoring, so
    * the result is the true top-k of the filtered set at ANY
    * selectivity — the post-filter shape (search first, filter the k
    * results) silently under-returns on selective predicates and is
    * deliberately not offered. Scale shape inherits [[bruteForceTopK]]:
    * the corpus streams once against broadcast queries with the
    * predicate applied AT THE SCAN (parquet-translatable conjuncts
    * reach `PushedFilters`, so a selective filter also prunes IO), and
    * the only shuffle is the bounded per-query TopKAgg. For the
    * serving-scale path over a persisted index see [[searchIvfIndex]]'s
    * `predicate`/payload support. */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, predicate: Column): DataFrame =
    bruteForceTopK(corpus.where(predicate), queries, idCol, vecCol, k)

  /** MMR re-rank (r11b): Maximal Marginal Relevance (Carbonell &
    * Goldstein, SIGIR'98) — greedily re-order a candidate list so each
    * pick balances query relevance against redundancy with what is
    * already picked: `argmax λ·sim(q,c) − (1−λ)·max_{s∈S} sim(c,s)`.
    * The candidate lists are the OUTPUT of a top-n search (bounded by
    * construction), so the whole greedy loop runs as pure Catalyst
    * HIGHER-ORDER FUNCTIONS over one collected-per-query array — zero
    * UDFs, zero shuffles beyond the one per-query collect_list, k·n²
    * work on n≤hundreds candidates. Candidate vectors pre-normalize
    * once (zero-norm → zero vector), so every pairwise cosine inside
    * the loop is a plain dot. Ties break (score desc, id asc);
    * `λ = 1` degenerates to the input relevance order.
    *
    * @param topn candidate lists: `(qid, nid, sim)` — e.g.
    *             [[bruteForceTopK]]/[[searchIvfIndex]] output
    * @param corpus id + vector frame the candidate vectors join from */
  def mmrRerank(topn: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int, lambda: Double): DataFrame = {
    require(k > 0, "k must be positive")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val nvec = {
      val n = sqrt(dotHof(col(vecCol), col(vecCol)))
      when(n > 0.0, transform(col(vecCol), x => x.cast("double") / n))
        .otherwise(transform(col(vecCol), _ => lit(0.0)))
    }
    val cands = topn.select(col("qid"), col("nid"), col("sim"))
      .join(corpus.select(col(idCol).as("nid"), nvec.as("_zc_nv")), "nid")
      .groupBy("qid")
      .agg(collect_list(struct(col("nid"), col("sim"), col("_zc_nv"))).as("_zc_cs"))
    val cs = col("_zc_cs")
    def dotd(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    // one greedy step: the argmax over unselected candidates of
    // λ·sim − (1−λ)·max cosine to the selected set (empty set → 0)
    def pick(sel: Column): Column = {
      def score(c: Column): Column = {
        val red = array_max(transform(
          filter(cs, s => array_contains(sel, s.getField("nid"))),
          s => dotd(c.getField("_zc_nv"), s.getField("_zc_nv"))))
        lit(lambda) * c.getField("sim") - lit(1.0 - lambda) * coalesce(red, lit(0.0))
      }
      val best = aggregate(
        filter(cs, c => !array_contains(sel, c.getField("nid"))),
        lit(null).cast("struct<nid:bigint,score:double>"),
        (b, c) => {
          val sc = score(c)
          when(b.isNull || sc > b.getField("score") ||
              (sc === b.getField("score") && c.getField("nid") < b.getField("nid")),
            struct(c.getField("nid").as("nid"), sc.as("score"))).otherwise(b)
        })
      best.getField("nid")
    }
    val selected = aggregate(
      slice(cs, 1, k), // k greedy steps (never more than the list holds)
      array().cast("array<bigint>"),
      (sel, _) => {
        val p = pick(sel)
        when(p.isNull, sel).otherwise(concat(sel, array(p)))
      })
    cands.select(col("qid"), posexplode(selected).as(Seq("_zc_pos", "nid")))
      .select(col("qid"), col("nid"), (col("_zc_pos") + 1).cast("int").as("rank"))
  }

  /** DIVERSIFIED top-k (r11b): at most `perGroup` results per group
    * (source, domain, label — the search-result diversification every
    * serving stack applies so one hot domain cannot monopolize the
    * page). Semantics are the GREEDY scan — walk candidates in score
    * order, skip one whose group already holds `perGroup` results —
    * which is provably equivalent to "within-group rank <= perGroup,
    * then global top-k" (an item's take/skip outcome depends only on
    * its own within-group rank: the r-1 better same-group items are
    * each taken iff their own rank <= perGroup, so the group count at
    * consideration time is min(r-1, perGroup)). That closed form is
    * what runs: two BOUNDED TopKAgg stages — per-(query, group) top-m,
    * then per-query top-k — so neither a corpus-sized window nor an
    * unbounded sort exists; map-side partials ship at most m (then k)
    * candidates per task. Exact and engine-replayable (two ROW_NUMBER
    * passes in the oracle). */
  def diversifiedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                      vecCol: String, groupCol: Column, k: Int,
                      perGroup: Int): DataFrame = {
    require(k > 0 && perGroup > 0, "k and perGroup must be positive")
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("_zc_qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("_zc_cv"),
      groupCol.as("_zc_g"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("_zc_qv"), col("_zc_cv")))
    val topm = graft.functions.TopKAgg.topK(perGroup)
    val perG = scored.groupBy(col("qid"), col("_zc_g"))
      .agg(topm(col("sim"), col("nid")).as("_zc_tk"))
      .select(col("qid"), explode(col("_zc_tk")).as("_zc_s"))
      .select(col("qid"), col("_zc_s.id").as("nid"), col("_zc_s.score").as("sim"))
    val topk = graft.functions.TopKAgg.topK(k)
    perG.groupBy(col("qid"))
      .agg(topk(col("sim"), col("nid")).as("_zc_tk"))
      .select(col("qid"), posexplode(col("_zc_tk")).as(Seq("_zc_pos", "_zc_s")))
      .select(col("qid"), col("_zc_s.id").as("nid"),
        (col("_zc_pos") + 1).cast("int").as("rank"), col("_zc_s.score").as("sim"))
  }

  /** HYBRID-search fusion by Reciprocal Rank Fusion (r10c): merge two
    * ranked candidate lists — typically sparse (BM25, C45) and dense
    * (cosine top-k, C6) retrieval over the same corpus — with the
    * standard RRF score `Σ 1/(c + rank)` (Cormack/Clarke/Büttcher 2009;
    * the Elasticsearch/Vespa hybrid default). EXACT-INTEGER
    * formulation: each present side contributes the fraction
    * `1/(c+rank)`, an absent side contributes `0/1`, and the sum stays
    * a `(num, den)` integer pair (`n₁d₂+n₂d₁`, `d₁d₂`) — no float
    * accumulation anywhere, so the output is engine-replayable
    * bit-for-bit; the order key `num/den` is ONE double division
    * (deterministic bits) with an id tiebreak.
    *
    * Scale shape: both inputs are already top-n lists — bounded by
    * construction — so the fusion is a tiny full-outer join plus a
    * TakeOrdered; it never touches corpus-sized data. The heavy lifting
    * stays in the upstream retrievers, each with its own scale story. */
  def hybridRrf(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
                k: Int, c: Int = 60): DataFrame = {
    require(k > 0, "k must be positive")
    require(c >= 1, "rrf constant must be >= 1 (0 + rank 0 would divide by zero)")
    val left = a.select(col(idCol), col(rankCol).cast("long").as("_ra"))
    val right = b.select(col(idCol), col(rankCol).cast("long").as("_rb"))
    val d1 = when(col("_ra").isNotNull, col("_ra") + c).otherwise(lit(1L))
    val n1 = when(col("_ra").isNotNull, lit(1L)).otherwise(lit(0L))
    val d2 = when(col("_rb").isNotNull, col("_rb") + c).otherwise(lit(1L))
    val n2 = when(col("_rb").isNotNull, lit(1L)).otherwise(lit(0L))
    left.join(right, Seq(idCol), "full_outer")
      .select(col(idCol),
        (n1 * d2 + n2 * d1).as("rrf_num"),
        (d1 * d2).as("rrf_den"),
        col("_ra").as("rank_a"), col("_rb").as("rank_b"))
      .orderBy((col("rrf_num").cast("double") / col("rrf_den").cast("double")).desc,
        col(idCol))
      .limit(k)
  }

  /** RADIUS (range) search: EVERY corpus vector within cosine >=
    * `minSim` of each query — the recall-complete companion of top-k
    * (dedup sweeps and "all sufficiently similar" retrieval want the
    * full set, not the k best). Brute-force exact: queries broadcast,
    * the corpus streams once with no shuffle at all — the output IS the
    * only thing that moves. For corpus-vs-corpus radius joins use the
    * bucketed [[cosinePairs]]; for serving-scale query sets bucket via
    * [[lshTopK]]'s layout first. */
  def radiusSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, minSim: Double): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("_zc_qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("_zc_cv"))
    c.crossJoin(broadcast(q))
      .where(col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("_zc_qv"), col("_zc_cv")))
      .where(col("sim") >= minSim)
      .select(col("qid"), col("nid"), col("sim"))
  }

  /** Quantized-search-then-exact-rerank — how a production vector store
    * actually serves top-k over INT8 storage ([[quantizeInt8]], 4x
    * smaller than float32): (1) score the WHOLE corpus with the
    * quantized similarity — cosine of the integer code vectors, since
    * the per-vector max-abs scales cancel in cosine — and keep a
    * `shortlist` per query; (2) re-score ONLY the shortlist with exact
    * fp32 cosine and keep `k`. The first pass reads a corpus a quarter
    * the size; the second touches `shortlist × queries` rows.
    *
    * Exactness discipline: int8 codes cast losslessly to float, their
    * products and partial sums stay integral (|q| <= 127, 64-2048 dims
    * << 2^53), so the quantized score is `exact_int_dot /
    * (sqrt(exact_int_norm_a) * sqrt(exact_int_norm_b))` — every input
    * integer-exact, every op IEEE-determined: any engine reproduces the
    * shortlist bit-for-bit (the DuckDB oracle does).
    *
    * Scale shape: quantized corpus streams against broadcast quantized
    * queries (no corpus shuffle); the shortlist id-pair set
    * (queries × shortlist rows) broadcasts back against the fp32 corpus
    * — the full-precision vectors of non-shortlisted rows are never
    * deserialized. Both top-k stages are bounded [[graft.functions.TopKAgg]]
    * partial aggregations, never a global sort. */
  def int8RerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val floatArr = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType)
    def quantized(df: DataFrame, outId: String, outQ: String, outN: String) = {
      val (_, qv) = quantizeInt8(col(vecCol))
      // int->float Cast is lossless for |q| <= 127 and keeps the whole
      // pipeline on the native array<float> expressions (no HOF)
      df.select(col(idCol).as(outId), qv.cast(floatArr).as(outQ))
        .withColumn(outN, sqrt(dot(col(outQ), col(outQ))))
    }
    val c8 = quantized(corpus, "nid", "_zc_cq", "_zc_cn")
    val q8 = quantized(queries, "qid", "_zc_qq", "_zc_qn")
    val scored = c8.crossJoin(broadcast(q8))
      .where(col("nid") =!= col("qid"))
      .withColumn("qsim",
        dot(col("_zc_cq"), col("_zc_qq")) / (col("_zc_qn") * col("_zc_cn")))
    val shortTk = graft.functions.TopKAgg.topK(shortlist)
    val short = scored.groupBy(col("qid"))
      .agg(shortTk(col("qsim"), col("nid")).as("_zc_tk"))
      .select(col("qid"), explode(col("_zc_tk")).as("_zc_s"))
      .select(col("qid"), col("_zc_s.id").as("nid"))
    val cv = corpus.select(col(idCol).as("nid"), col(vecCol).as("_zc_cv"))
      .join(broadcast(short), "nid")
    val qv = queries.select(col(idCol).as("qid"), col(vecCol).as("_zc_qv"))
    val rer = cv.join(broadcast(qv), "qid")
      .withColumn("sim", cosine(col("_zc_qv"), col("_zc_cv")))
    boundedTopK(rer, k)
  }

  /** Matryoshka-representation search: shortlist on the FIRST `dPrefix`
    * components only — MRL-trained embeddings front-load information
    * (Kusupati et al. 2022), so a dPrefix/d fraction of the vector bytes
    * buys a high-recall shortlist — then exact full-dimension re-rank of
    * the shortlist alone. Same two-stage scale shape as
    * [[int8RerankTopK]]: the prefix pass streams the corpus against
    * broadcast prefix queries (the full vector is DROPPED before the
    * join, so only dPrefix floats per row cross the stage), both top-k
    * stages are bounded [[graft.functions.TopKAgg]] aggregations, and
    * full-precision vectors are deserialized only for the shortlist.
    * In a stored collection, persist the prefix as its own variable so
    * the scan itself reads dPrefix/d of the bytes (the A33
    * projection-pushdown pattern). All arithmetic is the same
    * IEEE-determined float→double cosine as [[bruteForceTopK]] — sliced
    * inputs are exact, so any engine reproduces both stages. */
  def matryoshkaTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, dPrefix: Int, k: Int, shortlist: Int): DataFrame = {
    require(dPrefix >= 1, "dPrefix must be >= 1")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("_zc_qv"))
      .withColumn("_zc_qp", slice(col("_zc_qv"), 1, dPrefix))
    val scored = corpus
      .select(col(idCol).as("nid"), slice(col(vecCol), 1, dPrefix).as("_zc_cp"))
      .crossJoin(broadcast(q.select(col("qid"), col("_zc_qp"))))
      .where(col("nid") =!= col("qid"))
      .withColumn("psim", cosine(col("_zc_qp"), col("_zc_cp")))
    val shortTk = graft.functions.TopKAgg.topK(shortlist)
    val short = scored.groupBy(col("qid"))
      .agg(shortTk(col("psim"), col("nid")).as("_zc_tk"))
      .select(col("qid"), explode(col("_zc_tk")).as("_zc_s"))
      .select(col("qid"), col("_zc_s.id").as("nid"))
    val cv = corpus.select(col(idCol).as("nid"), col(vecCol).as("_zc_cv"))
      .join(broadcast(short), "nid")
    val rer = cv.join(broadcast(q.select(col("qid"), col("_zc_qv"))), "qid")
      .withColumn("sim", cosine(col("_zc_qv"), col("_zc_cv")))
    boundedTopK(rer, k)
  }

  /** LSH bucket id of a vector under `planes` hyperplanes for `table`
    * (one element of the [[LshBuckets]] native expression's output). */
  def lshBucket(vec: Column, table: Int, planes: Int, dims: Int): Column =
    element_at(LshBuckets.buckets(vec, table + 1, planes, dims), table + 1)

  /** `(id, table, bucket)` rows for every table — one native-expression
    * pass per vector ([[LshBuckets]]). A GATED spread ([[graft.Spread]],
    * r11) parallelizes bucket computation off a narrow input; a
    * corpus-wide scan plans no extra Exchange. */
  private def buckets(df: DataFrame, idCol: String, vecCol: String, outId: String,
                      tables: Int, planes: Int, dims: Int): DataFrame =
    graft.Spread.spread(df, col(idCol))
      .select(col(idCol).as(outId),
        posexplode(LshBuckets.buckets(col(vecCol), tables, planes, dims))
          .as(Seq("_zc_t", "_zc_bkt")))

  /** Approximate top-k: candidates are corpus rows sharing an LSH bucket
    * with the query in ANY of `tables` hyperplane tables; candidates are
    * re-ranked exactly. Recall grows with `tables`, cost with bucket
    * sizes (`planes` controls bucket granularity).
    *
    * `multiProbe` additionally probes, per table, every bucket one sign
    * bit away from the query's (Lv et al., VLDB 2007): recall comparable
    * to ~`planes`x more tables while the CORPUS side — the expensive side
    * at 100 TB — is bucketed exactly once; only the tiny query bucket set
    * multiplies. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, tables: Int = 8, planes: Int = 8, dims: Int = 64,
              multiProbe: Boolean = false): DataFrame = {
    val qb =
      if (!multiProbe) buckets(queries, idCol, vecCol, "qid", tables, planes, dims)
      else graft.Spread.spread(queries, col(idCol))
        .select(col(idCol).as("qid"),
          posexplode(LshBuckets.bucketsMultiProbe(col(vecCol), tables, planes, dims, planes))
            .as(Seq("_zc_pos", "_zc_bkt")))
        .select(col("qid"),
          (col("_zc_pos") / lit(1 + planes)).cast("int").as("_zc_t"), col("_zc_bkt"))
    val cb = buckets(corpus, idCol, vecCol, "nid", tables, planes, dims)
    val cands = cb.join(broadcast(qb), Seq("_zc_t", "_zc_bkt"))
      .where(col("nid") =!= col("qid"))
      .select("qid", "nid").distinct()
    val withVecs = cands
      .join(broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("_zc_qv"))), "qid")
      .join(corpus.select(col(idCol).as("nid"), col(vecCol).as("_zc_cv")), "nid")
      .withColumn("sim", cosine(col("_zc_qv"), col("_zc_cv")))
    // bounded top-k ([[graft.functions.TopKAgg]]) — map-side partials ship
    // at most k ids+scores per (task, query); no candidate sort/shuffle
    val topk = graft.functions.TopKAgg.topK(k)
    withVecs.groupBy(col("qid"))
      .agg(topk(col("sim"), col("nid")).as("_zc_tk"))
      .select(col("qid"), posexplode(col("_zc_tk")).as(Seq("_zc_pos", "_zc_s")))
      .select(col("qid"), col("_zc_s.id").as("nid"),
        (col("_zc_pos") + 1).cast("int").as("rank"), col("_zc_s.score").as("sim"))
  }

  /** IVF (inverted-file) approximate top-k: a deterministic subsample of
    * the corpus serves as the coarse quantizer (centroids); every corpus
    * vector is assigned to its nearest centroid once (the inverted lists),
    * and each query scans only the lists of its `nProbe` nearest
    * centroids. The standard ANN scale path when corpus >> memory: the
    * assignment is one broadcast pass, the probe reads `nProbe/nLists` of
    * the corpus.
    *
    * (A k-means refinement of the centroids would drop in here; the
    * subsample quantizer keeps the operator fully deterministic.) */
  /** Deterministic uniform centroid sample: the nLists corpus rows with
    * the SMALLEST xxhash64(id) — no count and no global window.
    * orderBy+limit plans as TakeOrderedAndProject: each task ships only
    * its local top-nLists, the driver merges nLists rows. At 100 TB this
    * is one map-side pass; a row_number() formulation would be a
    * single-task sort of the whole corpus. */
  private[graft] def sampleCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                                     nLists: Int): DataFrame =
    corpus
      .select(col(idCol).as("_zc_cent"), col(vecCol).as("_zc_cv"))
      .orderBy(xxhash64(col("_zc_cent")), col("_zc_cent"))
      .limit(nLists)

  /** Past this size the centroid table stops riding the plan as a codegen
    * literal (constant-pool bloat) and switches to an executor broadcast
    * with a closure argmax — same zero-shuffle map-pass shape. */
  val LiteralCentroidCap = 4096

  /** Per-row nearest-centroid id over the LITERAL centroid table — pure
    * codegen, zero shuffle. Usable up to [[LiteralCentroidCap]] lists. */
  private[graft] def argmaxLiteral(vec: Column, cents: Array[(Long, Array[Float])]): Column = {
    val centsLit = typedlit(cents.toSeq.map { case (i, v) => (i, v.toSeq) })
    aggregate(centsLit,
      struct(lit(-1L).as("id"), lit(-2.0).as("sim")),
      (acc, c) => {
        val s = cosine(vec, c.getField("_2"))
        // Spark SQL orders NaN ABOVE every value, so a zero-norm vector
        // (NaN cosine everywhere) would win `>` against the sentinel and
        // land in the first list — exclude it so both quantizer paths
        // agree that degenerate vectors match no centroid (id = -1)
        when(s > acc.getField("sim") && !isnan(s),
             struct(c.getField("_1").as("id"), s.as("sim")))
          .otherwise(acc)
      }).getField("id")
  }

  /** Per-row top-`keep` nearest-centroid ids against an EXECUTOR-BROADCAST
    * centroid table (best first; ties break on the centroid id). The
    * beyond-the-literal-cap quantizer path: one deliberate closure over a
    * broadcast — still a pure map pass, the corpus never shuffles, and the
    * per-row cost is the same O(lists x dims) float math the literal
    * formulation pays. */
  private[graft] def topCentroidsCol(spark: org.apache.spark.sql.SparkSession,
                              cents: Array[(Long, Array[Float])],
                              keep: Int): Column => Column = {
    val bc = spark.sparkContext.broadcast(cents)
    val f = udf { (v: Seq[Float]) =>
      val arr = v.toArray
      var na = 0.0
      var i = 0
      while (i < arr.length) { na += arr(i).toDouble * arr(i); i += 1 }
      val nv = math.sqrt(na)
      val table = bc.value
      // bounded selection buffer: (sim desc, id asc), size <= keep
      val bufSim = new Array[Double](keep)
      val bufId = new Array[Long](keep)
      var n = 0
      var c = 0
      while (c < table.length) {
        val (cid, cv) = table(c)
        var dot = 0.0
        var nb = 0.0
        var j = 0
        val d = math.min(arr.length, cv.length)
        while (j < d) { dot += arr(j).toDouble * cv(j); nb += cv(j).toDouble * cv(j); j += 1 }
        val sim = dot / (nv * math.sqrt(nb))
        // zero-norm vector or centroid => NaN similarity: match nothing,
        // agreeing with the literal path (NaN never wins its argmax `>`)
        if (!java.lang.Double.isNaN(sim) &&
            (n < keep || sim > bufSim(n - 1) ||
             (sim == bufSim(n - 1) && cid < bufId(n - 1)))) {
          var p = math.min(n, keep - 1)
          while (p > 0 && (bufSim(p - 1) < sim ||
                 (bufSim(p - 1) == sim && bufId(p - 1) > cid))) {
            bufSim(p) = bufSim(p - 1); bufId(p) = bufId(p - 1); p -= 1
          }
          bufSim(p) = sim; bufId(p) = cid
          if (n < keep) n += 1
        }
        c += 1
      }
      bufId.take(n).toSeq
    }
    (vec: Column) => f(vec)
  }

  /** Nearest-centroid id as a zero-shuffle map pass: literal-table codegen
    * up to [[LiteralCentroidCap]] lists, broadcast-closure argmax beyond. */
  private def assignCentroid(spark: org.apache.spark.sql.SparkSession,
                             cents: Array[(Long, Array[Float])]): Column => Column =
    if (cents.length <= LiteralCentroidCap) (vec: Column) => argmaxLiteral(vec, cents)
    else { val top1 = topCentroidsCol(spark, cents, 1); (vec: Column) => element_at(top1(vec), 1) }

  private def collectCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                               nLists: Int): Array[(Long, Array[Float])] =
    sampleCentroids(corpus, idCol, vecCol, nLists).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** Lloyd-refined coarse quantizer: `iters` k-means iterations from the
    * deterministic hash sample. Each iteration is ONE map pass (per-row
    * argmax against the broadcast centroid table — no join, no shuffle of
    * the corpus) plus one bounded shuffle of per-task partial (sum, count)
    * buffers ([[graft.functions.VecMeanAgg]]) — the textbook distributed
    * Lloyd step. Centroid count can only shrink (a list that captures no
    * rows disappears). Returns `(centroid id, mean vector)`.
    *
    * Quantizers up to [[LiteralCentroidCap]] lists assign via a codegen
    * literal table; larger ones via a broadcast-closure argmax — both are
    * map passes, so nLists is bounded only by what the driver/executors
    * can hold (lists x dims floats). */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      nLists: Int, iters: Int): Array[(Long, Array[Float])] = {
    val spark = corpus.sparkSession
    var cents = collectCentroids(corpus, idCol, vecCol, nLists)
    var it = 0
    while (it < iters && cents.nonEmpty) {
      val assign = assignCentroid(spark, cents)
      cents = corpus
        .select(assign(col(vecCol)).as("_zc_cent"), col(vecCol).as("_zc_v"))
        .where(col("_zc_cent") >= 0) // zero-norm rows match no centroid
        .groupBy("_zc_cent")
        .agg(graft.functions.VecMeanAgg.mean(col("_zc_v")).as("_zc_cv"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
      it += 1
    }
    cents
  }

  /** [[int8RerankTopK]] over STORED codes — the shape a vector
    * COLLECTION serves: `corpusCodes` carries the persisted
    * `(id, qvec)` pairs (a projection that never deserializes fp32
    * vectors — with a graft collection, a pruned columnar read a
    * quarter the size), `corpusVecs` is the fp32 projection touched
    * ONLY for the broadcast-joined shortlist. Scores are identical to
    * the on-the-fly variant: quantized-cosine shortlist (scales cancel
    * — stored max_abs is not even needed), exact fp32 re-rank. */
  def int8RerankTopKStored(corpusCodes: DataFrame, corpusVecs: DataFrame,
                           queries: DataFrame, idCol: String, qvecCol: String,
                           vecCol: String, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val floatArr = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType)
    val c8 = corpusCodes
      .select(col(idCol).as("nid"), col(qvecCol).cast(floatArr).as("_zc_cq"))
      .withColumn("_zc_cn", sqrt(dot(col("_zc_cq"), col("_zc_cq"))))
    val (_, qQv) = quantizeInt8(col(vecCol))
    val q8 = queries
      .select(col(idCol).as("qid"), qQv.cast(floatArr).as("_zc_qq"))
      .withColumn("_zc_qn", sqrt(dot(col("_zc_qq"), col("_zc_qq"))))
    val scored = c8.crossJoin(broadcast(q8))
      .where(col("nid") =!= col("qid"))
      .withColumn("qsim",
        dot(col("_zc_cq"), col("_zc_qq")) / (col("_zc_qn") * col("_zc_cn")))
    val shortTk = graft.functions.TopKAgg.topK(shortlist)
    val short = scored.groupBy(col("qid"))
      .agg(shortTk(col("qsim"), col("nid")).as("_zc_tk"))
      .select(col("qid"), explode(col("_zc_tk")).as("_zc_s"))
      .select(col("qid"), col("_zc_s.id").as("nid"))
    val cv = corpusVecs.select(col(idCol).as("nid"), col(vecCol).as("_zc_cv"))
      .join(broadcast(short), "nid")
    val qv = queries.select(col(idCol).as("qid"), col(vecCol).as("_zc_qv"))
    val rer = cv.join(broadcast(qv), "qid")
      .withColumn("sim", cosine(col("_zc_qv"), col("_zc_cv")))
    boundedTopK(rer, k)
  }

  // --- product quantization (PQ / ADC) -----------------------------

  /** Train per-subspace PQ codebooks: `dims` dimensions split into `m`
    * contiguous subspaces of `dims/m`, each with its own `k`-centroid
    * L2 k-means codebook — a vector then encodes as `m` small codes
    * (m=8, k=256 turns a 64-dim float32 row of 256 B into 8 B: 32x,
    * the compression tier between INT8 ([[quantizeInt8]], 4x) and the
    * raw store; IVF+PQ is the standard billion-scale serving layout).
    *
    * Scale shape: init is ONE deterministic hash-sample pass (`k` rows
    * sliced into all `m` subspaces at once); each Lloyd iteration is
    * one map pass computing all `m` argmin codes per row (broadcast
    * codebooks, closure like [[topCentroidsCol]]) feeding a map-side
    * partially-aggregated [[graft.functions.VecMeanAgg]] per
    * (subspace, code) — the Exchange carries m*k partial buffers per
    * task, never corpus vectors. Codebooks are k*dims floats total —
    * driver-sized regardless of corpus size. Empty codes keep their
    * previous centroid (stable code space). Rows whose vectors are
    * shorter than `dims` are ignored by training (slice yields a short
    * subvector; the L2 loop scores present dims only).
    *
    * @return codebooks(j)(c) = centroid c of subspace j */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String, dims: Int,
              m: Int, k: Int = 256, iters: Int = 2): Array[Array[Array[Float]]] = {
    require(m > 0 && dims % m == 0, s"m=$m must divide dims=$dims")
    require(k > 1 && k <= 65536, s"k=$k out of range")
    val spark = corpus.sparkSession
    val sub = dims / m
    // deterministic hash-sample init: k vectors, sliced into every subspace
    val init = sampleCentroids(corpus, idCol, vecCol, k).collect()
      .map(_.getSeq[Float](1).toArray)
    var books: Array[Array[Array[Float]]] =
      Array.tabulate(m) { j =>
        init.filter(_.length >= (j + 1) * sub)
          .map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      }
    require(books.forall(_.nonEmpty), "no full-width vectors to train on")
    var it = 0
    while (it < iters) {
      val codesOf = pqEncodeCol(spark, books, sub)
      val refined = corpus
        .select(posexplode(codesOf(col(vecCol))).as(Seq("_zc_j", "_zc_code")),
          col(vecCol).as("_zc_v"))
        .where(col("_zc_code") >= 0)
        .select(col("_zc_j"), col("_zc_code"),
          slice(col("_zc_v"), col("_zc_j") * sub + 1, lit(sub)).as("_zc_sv"))
        .groupBy("_zc_j", "_zc_code")
        .agg(graft.functions.VecMeanAgg.mean(col("_zc_sv")).as("_zc_cv"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Float](2).toArray))
        .toMap
      books = Array.tabulate(m) { j =>
        books(j).indices.toArray.map(c => refined.getOrElse((j, c), books(j)(c)))
      }
      it += 1
    }
    books
  }

  /** Per-row PQ codes (array<int>, one L2-nearest code per subspace;
    * -1 for a subspace the vector does not fully cover) against
    * executor-broadcast codebooks — a pure map pass, the corpus never
    * shuffles (the same deliberate broadcast-closure shape as
    * [[topCentroidsCol]]; codebooks are k*dims floats). */
  private def pqEncodeCol(spark: org.apache.spark.sql.SparkSession,
                          books: Array[Array[Array[Float]]],
                          sub: Int): Column => Column = {
    val bc = spark.sparkContext.broadcast(books)
    val f = udf { (v: Seq[Float]) =>
      val arr = v.toArray
      val bks = bc.value
      val m = bks.length
      val out = new Array[Int](m)
      var j = 0
      while (j < m) {
        if (arr.length < (j + 1) * sub) out(j) = -1
        else {
          val book = bks(j)
          var best = -1
          var bestD = Double.MaxValue
          var c = 0
          while (c < book.length) {
            val cv = book(c)
            var d2 = 0.0
            var i = 0
            while (i < sub) {
              val diff = arr(j * sub + i).toDouble - cv(i)
              d2 += diff * diff
              i += 1
            }
            if (d2 < bestD) { bestD = d2; best = c } // first-wins tie => code asc
            c += 1
          }
          out(j) = best
        }
        j += 1
      }
      out.toSeq
    }
    (vec: Column) => f(vec)
  }

  /** Encode a corpus as `(id, codes)` — the stored form of the PQ tier
    * (m ints per row; cast down to bytes at rest if k <= 256). */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               books: Array[Array[Array[Float]]]): DataFrame = {
    require(books.nonEmpty && books.forall(_.nonEmpty), "empty codebooks")
    val sub = books(0)(0).length
    val enc = pqEncodeCol(corpus.sparkSession, books, sub)
    corpus.select(col(idCol).as("nid"), enc(col(vecCol)).as("codes"))
  }

  /** ADC (asymmetric distance computation) top-k: each query
    * precomputes its m x k table of partial dot products
    * `<q_j, c_(j,code)>`; a corpus row then scores as `m` TABLE LOOKUPS
    * — zero float multiplies per row — approximating `<q, x>` (the
    * max-inner-product objective; on L2-normalized vectors, cosine).
    *
    * Scale shape: queries (with their tables, m*k doubles each)
    * BROADCAST; the encoded corpus streams map-side; the only shuffle
    * is the bounded [[graft.functions.TopKAgg]] over (qid, nid, sim).
    * Re-rank the result against raw vectors ([[int8RerankTopK]] shape)
    * when exact order matters. */
  /** Query side of ADC: vec -> flattened m x kk table of partial dot
    * products against every codebook centroid (broadcast codebooks). */
  private def adcTableCol(spark: org.apache.spark.sql.SparkSession,
                          books: Array[Array[Array[Float]]]): Column => Column = {
    val m = books.length
    val sub = books(0)(0).length
    val kk = books.map(_.length).max
    val bc = spark.sparkContext.broadcast(books)
    val f = udf { (q: Seq[Float]) =>
      val arr = q.toArray
      val bks = bc.value
      val t = new Array[Double](m * kk)
      var j = 0
      while (j < m) {
        val book = bks(j)
        var c = 0
        while (c < book.length) {
          val cv = book(c)
          var dot = 0.0
          var i = 0
          val lim = math.min(sub, arr.length - j * sub)
          while (i < lim) { dot += arr(j * sub + i).toDouble * cv(i); i += 1 }
          t(j * kk + c) = dot
          c += 1
        }
        j += 1
      }
      t.toSeq
    }
    (vec: Column) => f(vec)
  }

  /** Corpus side of ADC: (codes, table) -> approximate inner product as
    * `m` table lookups — zero float multiplies per corpus row. */
  private def adcScoreCol(kk: Int): (Column, Column) => Column = {
    val f = udf { (codes: Seq[Int], table: Seq[Double]) =>
      var s = 0.0
      var j = 0
      while (j < codes.length) {
        val c = codes(j)
        if (c >= 0) s += table(j * kk + c)
        j += 1
      }
      s
    }
    (codes: Column, table: Column) => f(codes, table)
  }

  private def boundedTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = graft.functions.TopKAgg.topK(k)
    scored.groupBy(col("qid"))
      .agg(topk(col("sim"), col("nid")).as("_zc_tk"))
      .select(col("qid"), posexplode(col("_zc_tk")).as(Seq("_zc_pos", "_zc_s")))
      .select(col("qid"), col("_zc_s.id").as("nid"),
        (col("_zc_pos") + 1).cast("int").as("rank"), col("_zc_s.score").as("sim"))
  }

  def pqTopK(codes: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             books: Array[Array[Array[Float]]], k: Int): DataFrame = {
    require(books.nonEmpty && books.forall(_.nonEmpty), "empty codebooks")
    val spark = codes.sparkSession
    val kk = books.map(_.length).max
    val tableOf = adcTableCol(spark, books)
    val adc = adcScoreCol(kk)
    val q = queries.select(col(idCol).as("qid"),
      tableOf(col(vecCol)).as("_zc_qt"))
    val scored = codes.crossJoin(broadcast(q))
      .where(col("nid") =!= col("qid"))
      .withColumn("sim", adc(col("codes"), col("_zc_qt")))
    boundedTopK(scored, k)
  }

  /** PERSISTED IVF+PQ index — [[buildIvfIndex]]'s partition-pruned list
    * layout with PQ CODES in place of raw vectors: the lists store
    * `(nid, codes)` at ~32x smaller, so a probe reads `m` small ints
    * per candidate instead of the vector (the FAISS IVFPQ serving
    * layout, here as plain parquet + Hive partition pruning). Search
    * resolves coarse probes against the persisted centroid table,
    * builds ADC tables against the persisted codebooks, scores probed
    * lists by table lookup, and finishes with the bounded top-k.
    * Approximation stacks PQ distortion on IVF routing — re-rank a
    * shortlist against raw vectors ([[int8RerankTopK]] shape) when
    * exact order matters. */
  def buildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      path: String, dims: Int, nLists: Int = 32, m: Int = 8,
                      pqK: Int = 256, kmeansIters: Int = 0, pqIters: Int = 1): Unit = {
    val spark = corpus.sparkSession
    val cents =
      if (kmeansIters <= 0) collectCentroids(corpus, idCol, vecCol, nLists)
      else kmeansCentroids(corpus, idCol, vecCol, nLists, kmeansIters)
    require(cents.nonEmpty, "buildIvfPqIndex: empty corpus")
    import spark.implicits._
    cents.toSeq.toDF("_zc_cent", "_zc_cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val books = pqTrain(corpus, idCol, vecCol, dims, m, pqK, pqIters)
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cv, c) => (j, c, cv.toSeq) }
    }.toSeq.toDF("_zc_j", "_zc_code", "_zc_cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    val assign = assignCentroid(spark, cents)
    val enc = pqEncodeCol(spark, books, dims / m)
    corpus.select(col(idCol).as("nid"), col(vecCol).as("_zc_v"))
      .select(col("nid"), enc(col("_zc_v")).as("codes"), assign(col("_zc_v")).as("_zc_cent"))
      .where(col("_zc_cent") >= 0)
      .write.mode("overwrite").partitionBy("_zc_cent").parquet(s"$path/lists")
  }

  /** Build a persisted IVF+PQ index FROM A COLLECTION, stamped like
    * [[buildIvfIndexFrom]] (pinned build generation; searches refuse on
    * drift; [[refreshIvfPqIndex]] catches up append-only drifts). */
  def buildIvfPqIndexFrom(c: graft.core.Collection, idCol: String, vecCol: String,
                          path: String, dims: Int, nLists: Int = 32, m: Int = 8,
                          pqK: Int = 256, kmeansIters: Int = 0, pqIters: Int = 1): Unit = {
    val gen = c.generation
    val snap = c.snapshotAt(gen)
    buildIvfPqIndex(snap, idCol, vecCol, path, dims, nLists, m, pqK,
      kmeansIters, pqIters)
    writeIndexMeta(snap.sparkSession, path, c.root, gen, idCol, vecCol, Nil)
    invalidateFreshMemo(path)
  }

  /** The persisted PQ codebooks at `path`, `[subspace][code][subvector]`. */
  private def readCodebooks(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Array[Float]]] = {
    val bookRows = spark.read.parquet(s"$path/codebooks")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    require(bookRows.nonEmpty, s"no codebooks under $path")
    bookRows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3) }.toArray
  }

  /** Incrementally add vectors to a [[buildIvfPqIndex]] index: encoding
    * uses the PERSISTED codebooks and quantizer (existing codes and
    * searches untouched); new codes append under their list partitions.
    * Codebook drift under heavy appends is the deployer's periodic
    * rebuild, same contract as [[appendToIvfIndex]]. */
  def appendToIvfPqIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                         vectors: DataFrame, idCol: String, vecCol: String): Unit = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    require(cents.nonEmpty, s"no centroids under $path")
    val books = readCodebooks(spark, path)
    val assign = assignCentroid(spark, cents)
    val enc = pqEncodeCol(spark, books, books(0)(0).length)
    vectors.select(col(idCol).as("nid"), col(vecCol).as("_zc_v"))
      .select(col("nid"), enc(col("_zc_v")).as("codes"), assign(col("_zc_v")).as("_zc_cent"))
      .where(col("_zc_cent") >= 0)
      .write.mode("append").partitionBy("_zc_cent").parquet(s"$path/lists")
  }

  /** [[refreshIvfIndex]] for the PQ layout: append-only drifts encode
    * with the persisted codebooks and append; rewrites demand a rebuild. */
  def refreshIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String): Long =
    appendOnlyDrift(spark, path, "buildIvfPqIndex") match {
      case None => readIndexMeta(spark, path).get.generation
      case Some((m, newRows, g1)) =>
        appendToIvfPqIndex(spark, path, newRows, m.idCol, m.vecCol)
        writeIndexMeta(spark, path, m.root, g1, m.idCol, m.vecCol, Nil)
        invalidateFreshMemo(path)
        g1
    }

  /** Search a [[buildIvfPqIndex]] index: only the probed lists' parquet
    * partitions are read, and what is read is codes, not vectors. */
  def searchIvfPqIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, idCol: String, vecCol: String,
                       k: Int, nProbe: Int = 4,
                       allowStale: Boolean = false,
                       maxStalenessMs: Long = 0L): DataFrame = {
    requireFreshIndex(spark, path, allowStale, maxStalenessMs)
    val cents = readCentroidsTtl(spark, path, maxStalenessMs)
    require(cents.nonEmpty, s"no centroids under $path")
    val books = readCodebooksTtl(spark, path, maxStalenessMs)
    val kk = books.map(_.length).max
    val tableOf = adcTableCol(spark, books)
    val probeFn = topCentroidsCol(spark, cents, nProbe)
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("_zc_v_qid"))
      .withColumn("_zc_cent", explode(probeFn(col("_zc_v_qid"))))
      .withColumn("_zc_qt", tableOf(col("_zc_v_qid")))
      .drop("_zc_v_qid")
    // pin probed lists as a PARTITION filter (bounded: nQueries x nProbe)
    val wanted = probes.select("_zc_cent").distinct()
      .collect().map(_.getLong(0)).toSeq
    val lists = spark.read.parquet(s"$path/lists")
      .where(col("_zc_cent").isin(wanted: _*))
    val adc = adcScoreCol(kk)
    val cands = lists.join(broadcast(probes), "_zc_cent")
      .where(col("nid") =!= col("qid"))
      .withColumn("sim", adc(col("codes"), col("_zc_qt")))
    boundedTopK(cands, k)
  }

  /** @param kmeansIters 0 = plain deterministic hash-sample quantizer;
    *                    >0 refines it with that many Lloyd iterations
    *                    ([[kmeansCentroids]]) — better lists on clustered
    *                    corpora at the cost of `iters` extra passes.
    *
    * Scale shape: the inverted-list assignment is a per-row argmax against
    * the broadcast centroid table — a pure map pass; corpus vectors never
    * enter an Exchange (the round-2 formulation shuffled |corpus| x nLists
    * wide rows through a window). With one list per corpus row and unique
    * (query, centroid) probes, candidate `(qid, nid)` pairs are unique by
    * construction — no distinct — and the final top-k is the bounded
    * [[graft.functions.TopKAgg]]: only `(qid, nid, sim)` ids+scores ride
    * the one remaining shuffle. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nLists: Int = 32, nProbe: Int = 4,
              kmeansIters: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    val cents =
      if (kmeansIters <= 0) collectCentroids(corpus, idCol, vecCol, nLists)
      else kmeansCentroids(corpus, idCol, vecCol, nLists, kmeansIters)
    require(cents.nonEmpty, "ivfTopK: empty corpus")
    // inverted lists: one zero-shuffle map pass over the corpus
    val assign = assignCentroid(spark, cents)
    val lists = corpus.select(col(idCol).as("nid"), col(vecCol).as("_zc_v_nid"))
      .withColumn("_zc_cent", assign(col("_zc_v_nid")))
    // probes: the tiny query side takes its nProbe nearest lists
    val probeFn = topCentroidsCol(spark, cents, nProbe)
    val probes = queries.select(col(idCol).as("qid"), col(vecCol).as("_zc_v_qid"))
      .withColumn("_zc_cent", explode(probeFn(col("_zc_v_qid"))))
    val cands = lists.join(broadcast(probes), "_zc_cent")
      .where(col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("_zc_v_qid"), col("_zc_v_nid")))
    boundedTopK(cands, k)
  }

  /** PERSISTED IVF index: the build-once/search-many shape a 100 TB
    * corpus actually needs — [[ivfTopK]] recomputes the quantizer and
    * re-scans the corpus per call, right for one-shot jobs, wrong for a
    * serving pattern. `buildIvfIndex` writes the centroid table and the
    * inverted lists as parquet PARTITIONED BY list id, so a later
    * [[searchIvfIndex]] reads ONLY the probed lists' files (Hive
    * partition pruning — `PartitionFilters` in the scan), a
    * `nProbe/nLists` fraction of the index regardless of corpus size. */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    path: String, nLists: Int = 32, kmeansIters: Int = 0,
                    payloadCols: Seq[String] = Nil): Unit = {
    val spark = corpus.sparkSession
    val cents =
      if (kmeansIters <= 0) collectCentroids(corpus, idCol, vecCol, nLists)
      else kmeansCentroids(corpus, idCol, vecCol, nLists, kmeansIters)
    require(cents.nonEmpty, "buildIvfIndex: empty corpus")
    import spark.implicits._
    cents.toSeq.toDF("_zc_cent", "_zc_cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val assign = assignCentroid(spark, cents)
    // payload columns (r11b) ride the lists VERBATIM under their own
    // names, so a later search's metadata predicate evaluates inside
    // the probed partitions — the filtered-search shape every vector
    // store serves (payload lives WITH the index, no side join)
    corpus.select((Seq(col(idCol).as("nid"), col(vecCol).as("_zc_v_nid")) ++
        payloadCols.map(col)): _*)
      .withColumn("_zc_cent", assign(col("_zc_v_nid")))
      .where(col("_zc_cent") >= 0)
      .write.mode("overwrite").partitionBy("_zc_cent").parquet(s"$path/lists")
  }

  /** Incrementally add vectors to a [[buildIvfIndex]] index: assignment
    * uses the PERSISTED quantizer (so existing list geometry — and
    * therefore existing searches — are untouched), and the new rows
    * APPEND as fresh parquet files under their list partitions, no
    * rewrite of existing lists. Quantizer drift under heavy appends is
    * the deployer's periodic `buildIvfIndex` rebuild. */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       vectors: DataFrame, idCol: String, vecCol: String,
                       payloadCols: Seq[String] = Nil): Unit = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    require(cents.nonEmpty, s"no centroids under $path")
    val assign = assignCentroid(spark, cents)
    vectors.select((Seq(col(idCol).as("nid"), col(vecCol).as("_zc_v_nid")) ++
        payloadCols.map(col)): _*)
      .withColumn("_zc_cent", assign(col("_zc_v_nid")))
      .where(col("_zc_cent") >= 0)
      .write.mode("append").partitionBy("_zc_cent").parquet(s"$path/lists")
  }

  // --- index provenance & staleness (r12, the r11 verdict's #6) ------
  //
  // The row-range Indexer detects base-collection drift via its build
  // generation (E4); the persisted ANN indexes now carry the same stamp:
  // build from a Collection -> the index records (root, generation,
  // column mapping); searches REFUSE on drift unless opted in; an
  // append-only drift refreshes incrementally (only the new rows assign
  // and append to their lists — the C32/E28 incremental-index shape).

  private def indexMetaPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_graft_index_meta.json")

  private def jsonEsc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  private def writeIndexMeta(spark: org.apache.spark.sql.SparkSession,
      path: String, root: String, gen: Long, idCol: String, vecCol: String,
      payloadCols: Seq[String]): Unit = {
    val p = indexMetaPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val json = s"""{"root":"${jsonEsc(root)}","generation":$gen,""" +
      s""""idCol":"${jsonEsc(idCol)}","vecCol":"${jsonEsc(vecCol)}",""" +
      s""""payloadCols":[${payloadCols.map(c => "\"" + jsonEsc(c) + "\"").mkString(",")}]}"""
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private[graft] final case class IndexMeta(root: String, generation: Long,
      idCol: String, vecCol: String, payloadCols: Seq[String])

  /** The index's provenance stamp; None for an index built from a bare
    * DataFrame (pre-r12 layout or no collection source). */
  private[graft] def readIndexMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[IndexMeta] = {
    val p = indexMetaPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val json = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    def str(k: String) = s""""$k"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""".r
      .findFirstMatchIn(json).map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    def num(k: String) = s""""$k"\\s*:\\s*(-?\\d+)""".r
      .findFirstMatchIn(json).map(_.group(1).toLong)
    for (r <- str("root"); g <- num("generation"); i <- str("idCol"); v <- str("vecCol"))
      yield IndexMeta(r, g, i, v,
        """"payloadCols"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(json)
          .map(_.group(1)).filter(_.nonEmpty)
          .map(_.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")))
          .getOrElse(Nil))
  }

  /** Build a persisted IVF index FROM A COLLECTION, stamped with the
    * generation the build read (a pinned snapshot — a concurrent commit
    * mid-build cannot make the stamp lie). Searches against a stamped
    * index refuse on drift; [[refreshIvfIndex]] catches the index up. */
  def buildIvfIndexFrom(c: graft.core.Collection, idCol: String, vecCol: String,
                        path: String, nLists: Int = 32, kmeansIters: Int = 0,
                        payloadCols: Seq[String] = Nil): Unit = {
    val gen = c.generation
    buildIvfIndex(c.snapshotAt(gen), idCol, vecCol, path, nLists, kmeansIters,
      payloadCols)
    writeIndexMeta(c.snapshotAt(gen).sparkSession, path, c.root, gen, idCol,
      vecCol, payloadCols)
    invalidateFreshMemo(path)
  }

  /** Serve-path memos (r13, widened r14 per the r13 advice): keyed by
    * the NORMALIZED index path (`Path.toString` folds trailing slashes
    * and duplicate separators, so differing spellings of one index
    * share an entry and same-JVM invalidation actually lands), each
    * `key -> (value, checked-at millis)`. Consulted only under a
    * caller-supplied positive `maxStalenessMs` — the default path
    * always re-reads (the check IS the feature). r14 memoizes the
    * WHOLE per-request read set, not just the collection-root
    * generation: the meta stamp (fs.exists + open + read) and the
    * centroids/codebooks parquet collects now also serve from the TTL
    * window, so a serve loop pays zero index-side IO between probes.
    * Same-JVM builds/refreshes drop all three entries.
    *
    * r15 (the r14 advice): entries carry the TTL they were stored
    * under and every put sweeps entries past their OWN ttl — a
    * long-lived driver that touches many index paths (or TTL-reads
    * since-deleted indexes) no longer pins centroid/codebook arrays
    * forever; the sweep is O(live entries) and runs at most once per
    * TTL window per path. Each GET still applies the CALLER's
    * `maxStalenessMs` against the stored check time, so a stricter
    * caller never accepts a looser caller's older entry. */
  private final class TtlMemo[A] {
    private val m =
      new java.util.concurrent.ConcurrentHashMap[String, (A, Long, Long)]()
    def remove(key: String): Unit = m.remove(key)
    def get(key: String, now: Long, maxStalenessMs: Long): Option[A] =
      Option(m.get(key)).collect { case (v, at, _) if now - at <= maxStalenessMs => v }
    def put(key: String, v: A, now: Long, ttlMs: Long): Unit = {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (now - e.getValue._2 > e.getValue._3) it.remove()
      }
      m.put(key, (v, now, ttlMs))
    }
  }
  private val freshMemo = new TtlMemo[Long]
  private val metaMemo = new TtlMemo[Option[IndexMeta]]
  private val centroidMemo = new TtlMemo[Array[(Long, Array[Float])]]
  private val codebookMemo = new TtlMemo[Array[Array[Array[Float]]]]

  private def memoKey(path: String): String =
    new org.apache.hadoop.fs.Path(path).toString

  /** Actual manifest-root reads performed by freshness checks — spec
    * observability (one read across N TTL'd searches). */
  private[graft] val freshnessProbes =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private def invalidateFreshMemo(path: String): Unit = {
    val key = memoKey(path)
    freshMemo.remove(key)
    metaMemo.remove(key)
    centroidMemo.remove(key)
    codebookMemo.remove(key)
  }

  /** TTL-memoized lookup shared by the serve-path reads. */
  private def ttlMemo[A](memo: TtlMemo[A],
      path: String, maxStalenessMs: Long)(load: => A): A = {
    if (maxStalenessMs <= 0L) load
    else {
      val key = memoKey(path)
      val now = System.currentTimeMillis()
      memo.get(key, now, maxStalenessMs)
        .getOrElse { val v = load; memo.put(key, v, now, maxStalenessMs); v }
    }
  }

  private def readIndexMetaTtl(spark: org.apache.spark.sql.SparkSession,
      path: String, maxStalenessMs: Long): Option[IndexMeta] =
    ttlMemo(metaMemo, path, maxStalenessMs)(readIndexMeta(spark, path))

  private def readCentroidsTtl(spark: org.apache.spark.sql.SparkSession,
      path: String, maxStalenessMs: Long): Array[(Long, Array[Float])] =
    ttlMemo(centroidMemo, path, maxStalenessMs) {
      spark.read.parquet(s"$path/centroids")
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    }

  private def readCodebooksTtl(spark: org.apache.spark.sql.SparkSession,
      path: String, maxStalenessMs: Long): Array[Array[Array[Float]]] =
    ttlMemo(codebookMemo, path, maxStalenessMs)(readCodebooks(spark, path))

  /** Refuse a search over a stamped index whose source collection moved
    * past the build generation (mirrors the Indexer's E4 contract) —
    * a stale index silently serves dropped rows and misses new ones.
    * `allowStale = true` opts into best-effort serving. A positive
    * `maxStalenessMs` bounds how often the check pays the manifest-root
    * read: within the window the memoized head generation serves —
    * a serve loop calling per request reads the root once per TTL, and
    * a commit landing inside the window is seen at most that late
    * (same-JVM refreshes invalidate immediately). */
  private def requireFreshIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, allowStale: Boolean, maxStalenessMs: Long = 0L): Unit = {
    if (allowStale) return
    readIndexMetaTtl(spark, path, maxStalenessMs).foreach { m =>
      val now = System.currentTimeMillis()
      val cur = (if (maxStalenessMs > 0L) freshMemo.get(memoKey(path), now, maxStalenessMs)
                 else None)
        .getOrElse {
          freshnessProbes.incrementAndGet()
          val g = graft.core.Collection.open(spark, m.root, readOnly = true).generation
          freshMemo.put(memoKey(path), g, now, math.max(maxStalenessMs, 0L))
          g
        }
      if (cur != m.generation)
        throw new IllegalStateException(
          s"ANN index at $path was built at generation ${m.generation} of " +
          s"${m.root}, which is now at $cur — refreshIvfIndex(path) to catch " +
          "up an append-only drift, rebuild after rewrites, or pass " +
          "allowStale = true to serve the stale lists knowingly")
    }
  }

  /** The append-only drift between a stamp and its collection's head:
    * Some((newRowsFrame, headGeneration)) when every built-generation
    * file survives with an unchanged deletion-vector state; None when
    * already at head; throws when the range contains a rewrite/delete
    * (existing lists invalidated — only a rebuild fixes that). */
  private def appendOnlyDrift(spark: org.apache.spark.sql.SparkSession,
      path: String, what: String): Option[(IndexMeta, DataFrame, Long)] = {
    val m = readIndexMeta(spark, path).getOrElse(throw new IllegalStateException(
      s"no provenance stamp at $path — only ${what}From(collection, ...) " +
      s"indexes can refresh; rebuild with $what instead"))
    val c = graft.core.Collection.open(spark, m.root, readOnly = true)
    val g1 = c.generation
    if (g1 == m.generation) return None
    val man0 = c.manifestAt(m.generation)
    val man1 = c.manifestAt(g1)
    val f0 = man0.files.toSet
    val f1 = man1.files.toSet
    val survived = f0.subsetOf(f1)
    val dvsUnchanged = survived && {
      val d0 = man0.dvsForFiles(f0.toSeq)
      val d1 = man1.dvsForFiles(f0.toSeq)
      f0.forall(f => d0.get(f) == d1.get(f))
    }
    if (!survived || !dvsUnchanged)
      throw new IllegalStateException(
        s"collection ${m.root} rewrote or deleted rows between generations " +
        s"${m.generation} and $g1 — existing inverted lists are invalidated; " +
        s"rebuild with ${what}From")
    val added = (f1 -- f0).toSeq.sorted
    Some((m, c.readManifestFiles(man1, added), g1))
  }

  /** Catch a stamped IVF index up to its source collection's head:
    * refuses unless the drift is PURE APPEND (every built-generation
    * file survives with an unchanged deletion-vector state — a rewrite,
    * delete, or update invalidates existing lists, which only a rebuild
    * fixes), then assigns ONLY the new files' rows with the PERSISTED
    * quantizer and appends them to their list partitions — refresh cost
    * follows the drift, not the corpus (the C32/E28 incremental-index
    * shape). Returns the new stamped generation. */
  def refreshIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String): Long =
    appendOnlyDrift(spark, path, "buildIvfIndex") match {
      case None => readIndexMeta(spark, path).get.generation
      case Some((m, newRows, g1)) =>
        appendToIvfIndex(spark, path, newRows, m.idCol, m.vecCol, m.payloadCols)
        writeIndexMeta(spark, path, m.root, g1, m.idCol, m.vecCol, m.payloadCols)
        invalidateFreshMemo(path)
        g1
    }

  /** Search a [[buildIvfIndex]] index: probes resolve against the tiny
    * persisted centroid table; only the probed lists' parquet partitions
    * are read. Same output shape as [[ivfTopK]].
    *
    * FILTERED search (r11b): `predicate` over the index's payload
    * columns applies to the probed lists BEFORE scoring — pre-filter
    * semantics inside the probed set, so every returned row satisfies
    * the predicate and the k results are the best among the probed
    * survivors (never the post-filter under-return). Selective filters
    * thin the candidate lists, so the right response to selectivity is
    * RAISING `nProbe` (the standard IVF over-probe move), not raising
    * k; the predicate's translatable conjuncts reach the parquet scan
    * of the probed partitions (`PushedFilters`), so the filter cuts IO
    * rather than adding it. */
  def searchIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, idCol: String, vecCol: String,
                     k: Int, nProbe: Int = 4,
                     predicate: Column = lit(true),
                     allowStale: Boolean = false,
                     maxStalenessMs: Long = 0L): DataFrame = {
    requireFreshIndex(spark, path, allowStale, maxStalenessMs)
    val cents = readCentroidsTtl(spark, path, maxStalenessMs)
    require(cents.nonEmpty, s"no centroids under $path")
    val probeFn = topCentroidsCol(spark, cents, nProbe)
    val probes = queries.select(col(idCol).as("qid"), col(vecCol).as("_zc_v_qid"))
      .withColumn("_zc_cent", explode(probeFn(col("_zc_v_qid"))))
    // pin the probed lists as a PARTITION filter so the scan prunes
    // whole list directories (bounded: nQueries x nProbe ids)
    val wanted = probes.select("_zc_cent").distinct()
      .collect().map(_.getLong(0)).toSeq
    val lists = spark.read.parquet(s"$path/lists")
      .where(col("_zc_cent").isin(wanted: _*))
      .where(predicate)
    val cands = lists.join(broadcast(probes), "_zc_cent")
      .where(col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("_zc_v_qid"), col("_zc_v_nid")))
    boundedTopK(cands, k)
  }

  /** Near-duplicate pairs by embedding cosine: LSH-bucketed candidate
    * generation (all-pairs within buckets) + exact verification at
    * `threshold`. Identical vectors share every bucket, so exact
    * duplicates have perfect recall. */
  /** SEMANTIC DEDUP (SemDeDup, Abbas et al. 2023): drop every row that
    * has a SMALLER-id row at cosine >= `threshold` inside its embedding
    * cluster; return the survivors. The pair space is bounded by
    * clustering — the deterministic hash-seeded k-means quantizer
    * ([[kmeansCentroids]]) assigns each row in a ZERO-shuffle map pass,
    * then pairs emerge only inside clusters, distributed as O(cap^2)
    * sub-bucket triangle tasks ([[graft.dedup.Dedup.exhaustiveBucketPairs]])
    * — never the corpus O(n^2). One shuffle on the cluster id, one on
    * the pair verdicts; the drop rule ("any smaller-id neighbor") needs
    * no connected components, so there is no iterative phase.
    *
    * The clustering is an approximation boundary, as in the paper: a
    * near-dup pair straddling two clusters is not examined. IDENTICAL
    * vectors always co-cluster (argmax is deterministic with a
    * sorted-centroid first-wins tie-break), so exact-duplicate removal
    * is complete. Zero-norm vectors match no centroid (cluster -1) and
    * their NaN cosines never reach the threshold — they all survive. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, nClusters: Int, iters: Int = 1,
                    maxBucket: Int = graft.dedup.Dedup.DefaultMaxBucket): DataFrame = {
    val spark = df.sparkSession
    val cents = kmeansCentroids(df, idCol, vecCol, nClusters, iters)
    val assign = assignCentroid(spark, cents)
    // shared Exchange: the pair window and the vector-lookup join both
    // consume this one cluster-keyed layout (pinned, r13 — AQE must not
    // coalesce it under the pair fan-out)
    val clustered = graft.Spread.pinned(df
      .select(col(idCol).as("_zc_id"), col(vecCol).as("_zc_v"))
      .withColumn("_zc_cl", assign(col("_zc_v"))),
      col("_zc_cl"))
    val cands = graft.dedup.Dedup.exhaustiveBucketPairs(
      clustered.select(col("_zc_cl"), col("_zc_id")), Seq("_zc_cl"), "_zc_id", maxBucket)
    val va = clustered.select(col("_zc_id").as("a"), col("_zc_v").as("_zc_va"))
    val vb = clustered.select(col("_zc_id").as("b"), col("_zc_v").as("_zc_vb"))
    val dropped = cands.join(va, "a").join(vb, "b")
      .where(cosine(col("_zc_va"), col("_zc_vb")) >= threshold)
      .select(col("b").as("_zc_drop")).distinct()
    df.join(dropped, col(idCol) === col("_zc_drop"), "left_anti")
  }

  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
                  tables: Int = 8, planes: Int = 12, dims: Int = 64,
                  maxBucket: Int = graft.dedup.Dedup.DefaultMaxBucket,
                  exhaustive: Boolean = false): DataFrame = {
    // 12 planes/table: random-vector bucket collisions become rare (so the
    // candidate set stays near the true-duplicate count), while identical
    // vectors still collide in EVERY table; near-dup recall at cos~0.95 is
    // ~1-(1-0.9^12)^tables ~ 0.93 with 8 tables. Degenerate buckets (e.g.
    // a mass-duplicated vector) fall back to star expansion.
    // shared Exchange: both self-join sides reuse one bucket computation
    // (pinned, r13)
    val b = graft.Spread.pinned(
      buckets(df, idCol, vecCol, "_zc_id", tables, planes, dims),
      col("_zc_t"), col("_zc_bkt"))
    val cands =
      if (exhaustive) graft.dedup.Dedup.exhaustiveBucketPairs(
        b, Seq("_zc_t", "_zc_bkt"), "_zc_id", maxBucket)
      else graft.dedup.Dedup.boundedBucketPairs(
        b, Seq("_zc_t", "_zc_bkt"), "_zc_id", maxBucket)
    // Precompute each vector's norm once (shared Exchange again) instead
    // of re-deriving both norms inside every candidate pair.
    val withNorm = df
      .select(col(idCol).as("_zc_nid"), col(vecCol).as("_zc_v"), norm(col(vecCol)).as("_zc_n"))
      .repartition(col("_zc_nid"))
    val va = withNorm.select(col("_zc_nid").as("a"), col("_zc_v").as("_zc_va"), col("_zc_n").as("_zc_na"))
    val vb = withNorm.select(col("_zc_nid").as("b"), col("_zc_v").as("_zc_vb"), col("_zc_n").as("_zc_nb"))
    cands.join(va, "a").join(vb, "b")
      .withColumn("sim", dot(col("_zc_va"), col("_zc_vb")) / (col("_zc_na") * col("_zc_nb")))
      .where(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }
}
