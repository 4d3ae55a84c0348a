package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication operators for training-data pipelines.
  *
  * Scale design: nothing here ever materializes the O(n^2) pair space.
  *  - exact dedup is one hash-partition groupBy (map-side combined);
  *  - MinHash-LSH explodes each doc into `bands` rows and shuffles on
  *    `(band, bucket)` — candidate pairs only emerge inside buckets
  *    (Broder 1997 / LSH banding as in Mining of Massive Datasets ch.3);
  *  - SimHash (Charikar 2002) buckets by 16-bit chunks, so pairs within
  *    hamming distance <= 3*16 chunks collide in at least one chunk
  *    (pigeonhole); verification computes the true distance;
  *  - verification joins signatures back by id — proportional to the
  *    candidate count, not the corpus square.
  *
  * All signatures are built from seeded `xxhash64` applications — pure
  * codegen'd Catalyst expressions, deterministic across runs, and free of
  * the long-overflow arithmetic ANSI mode rejects.
  */
object Dedup {

  /** Exact dedup: keep the row with the smallest `keepCol` per distinct
    * `on` tuple, as ONE aggregation — `min_by` over the full row gets
    * map-side partial aggregation, so each upstream task ships at most
    * one row per local key and the reducer never sorts (the window
    * formulation this replaces shuffled AND per-class-sorted every
    * duplicate). Ties on `keepCol` break arbitrarily — pass a unique id
    * for deterministic survivors (as every corpus here does).
    *
    * NULL `keepCol` values lose to any non-NULL one (the ordering key is
    * `(isnull(keepCol), keepCol)`, never itself NULL — so `min_by` stays
    * total and a class whose `keepCol` is entirely NULL still keeps a
    * real row instead of degenerating to a NULL struct). When `on`
    * covers every column there is nothing left to pick — plain
    * `dropDuplicates`. */
  def exact(df: DataFrame, on: Seq[String], keepCol: String): DataFrame = {
    val rest = df.columns.filterNot(on.contains).toSeq
    if (rest.isEmpty) df.dropDuplicates(on)
    else df.groupBy(on.map(col): _*)
      .agg(min_by(struct(rest.map(col): _*),
                  struct(isnull(col(keepCol)), col(keepCol))).as("_zc_keep"))
      .select(df.columns.toSeq.map(c =>
        if (on.contains(c)) col(c) else col(s"_zc_keep.$c")): _*)
  }

  /** MinHash signature of a hashed-shingle array: position `i` holds
    * `min over shingles of xxhash64(shingle, i)` — the seeded-hash
    * formulation of a random permutation family.
    *
    * Single `aggregate` pass: the shingle array is referenced exactly ONCE
    * in the expression tree. (A naive `array(64 x array_min(transform(...)))`
    * lets Catalyst's projection collapse inline the upstream shingle
    * computation 64 times — a 50x slowdown measured at sf0.1.) */
  def minhashSignature(shingles: Column, numPerms: Int): Column =
    MinHashSig.signature(shingles, numPerms)

  /** The pure-builtin formulation [[MinHashSig]] replaces; kept for
    * reference and as the spec's cross-check (bit-identical results). */
  def minhashSignatureHof(shingles: Column, numPerms: Int): Column =
    aggregate(
      shingles,
      array(Seq.fill(numPerms)(lit(Long.MaxValue)): _*),
      (acc, s) => zip_with(
        acc,
        array((0 until numPerms).map(i => xxhash64(s, lit(i))): _*),
        (a, b) => least(a, b)))

  /** LSH banding: `(id, band, bucket)` rows — one per band, bucket =
    * hash of that band's signature slice. */
  def bandBuckets(id: Column, sig: Column, bands: Int, rowsPerBand: Int): DataFrame => DataFrame =
    df => df.select(
      id.as("_zc_id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand), lit(b))
      }: _*)).as(Seq("_zc_band", "_zc_bucket")))

  /** Degenerate-bucket guard threshold: a bucket holding more ids than
    * this (e.g. the empty-document class, boilerplate pages) would explode
    * into cap² candidate pairs inside one task. */
  val DefaultMaxBucket = 1000

  /** Candidate pairs `(a, b)` with `a < b` sharing a bucket, BOUNDED: a
    * bucket with at most `cap` ids emits its all-pairs clique; a larger
    * bucket emits a STAR around its smallest id instead — O(|bucket|)
    * pairs that keep the duplicate group connected (grouping by connected
    * components is unaffected; only redundant intra-clique edges are
    * dropped), so a pathological 10k-identical-doc class costs 10^4 pairs
    * instead of 10^8. One window over the already-bucketed exchange — no
    * extra shuffle; both self-join sides reuse that exchange. */
  def boundedBucketPairs(buckets: DataFrame, bucketCols: Seq[String], idCol: String,
                         cap: Int): DataFrame = {
    val w = Window.partitionBy(bucketCols.map(col): _*)
    val ann = buckets
      .withColumn("_zc_bn", count(lit(1)).over(w))
      .withColumn("_zc_bmin", min(col(idCol)).over(w))
    val small = ann.where(col("_zc_bn") <= cap)
    val l = small.select((bucketCols.map(col) :+ col(idCol).as("a")): _*)
    val r = small.select((bucketCols.map(col) :+ col(idCol).as("b")): _*)
    val allPairs = l.join(r, bucketCols)
      .where(col("a") < col("b"))
      .select("a", "b")
    val star = ann.where(col("_zc_bn") > cap && col(idCol) =!= col("_zc_bmin"))
      .select(col("_zc_bmin").as("a"), col(idCol).as("b"))
    allPairs.unionByName(star).distinct()
  }

  /** EXHAUSTIVE all-pairs within buckets, with bounded per-task work: an
    * oversized bucket of n ids splits into m = ceil(n/cap) sub-buckets by
    * a secondary hash, and the join key becomes `(bucket, lo, hi)` — the
    * triangle of sub-bucket pairs. Each element replicates to its row
    * (as the `lo` member of groups (s, s..m-1)) and its column (as the
    * `hi` member of groups (0..s, s)), so every unordered pair meets in
    * EXACTLY one group of at most 2·cap elements: per-task work is at
    * most cap² pairs no matter how degenerate the bucket, and the full
    * C(n,2) clique is emitted (the all-pairs scheme of Ullman's
    * "anchor-points" reducer pairing; [[boundedBucketPairs]] is the
    * grouping-oriented O(n) alternative that stars instead). */
  def exhaustiveBucketPairs(buckets: DataFrame, bucketCols: Seq[String], idCol: String,
                            cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(bucketCols.map(col): _*)
    val ann = buckets
      .withColumn("_zc_bn", count(lit(1)).over(w))
      .withColumn("_zc_m",
        greatest(lit(1L), ceil(col("_zc_bn").cast("double") / lit(cap))).cast("int"))
      .withColumn("_zc_s",
        pmod(xxhash64(col(idCol), lit(0x5eed)), col("_zc_m")).cast("int"))
    val keyCols = bucketCols ++ Seq("_zc_lo", "_zc_hi")
    val left = ann.select(
      (bucketCols.map(col) :+ col(idCol).as("a") :+ col("_zc_s").as("_zc_lo") :+
        explode(sequence(col("_zc_s"), col("_zc_m") - 1)).as("_zc_hi")): _*)
    val right = ann.select(
      (bucketCols.map(col) :+ col(idCol).as("b") :+
        explode(sequence(lit(0), col("_zc_s"))).as("_zc_lo") :+
        col("_zc_s").as("_zc_hi")): _*)
    left.join(right, keyCols)
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
  }

  /** EXHAUSTIVE exact-duplicate PAIR listing: bucket by `xxhash64(key)`,
    * enumerate all in-bucket pairs with bounded per-task work
    * ([[exhaustiveBucketPairs]] — a mass-duplicated class splits into
    * sub-bucket triangles), then verify true key equality (hash
    * collisions across distinct keys are filtered, never emitted).
    * Returns every `(a, b)`, `a < b`, with equal keys — the full clique
    * per duplicate class, unlike [[exact]] (keep-one) and the star the
    * grouping path settles for. */
  def exactPairs(df: DataFrame, idCol: String, key: Column,
                 cap: Int = DefaultMaxBucket): DataFrame = {
    val b = graft.Spread.pinned(df
      .select(col(idCol).as("_zc_id"), xxhash64(key).as("_zc_bucket")),
      col("_zc_bucket"))
    val cands = exhaustiveBucketPairs(b, Seq("_zc_bucket"), "_zc_id", cap)
    val ka = df.select(col(idCol).as("a"), key.as("_zc_ka"))
    val kb = df.select(col(idCol).as("b"), key.as("_zc_kb"))
    cands.join(ka, "a").join(kb, "b")
      .where(col("_zc_ka") === col("_zc_kb"))
      .select("a", "b")
  }

  /** Candidate pairs `(a, b)` with `a < b` sharing at least one LSH
    * bucket. Shuffles on `(band, bucket)`; never O(n^2) per task —
    * degenerate buckets fall back to star expansion
    * ([[boundedBucketPairs]]), or split into sub-bucket triangles when
    * `exhaustive` (full pair OUTPUT at O(cap²) per task,
    * [[exhaustiveBucketPairs]]).
    *
    * The explicit repartition on the join key makes both self-join sides
    * rename-projections over ONE shared Exchange (ReuseExchange), so the
    * bucket computation runs once and the join needs no further shuffle. */
  def candidatePairs(df: DataFrame, idCol: String, sigCol: String,
                     bands: Int, rowsPerBand: Int,
                     maxBucket: Int = DefaultMaxBucket,
                     exhaustive: Boolean = false): DataFrame = {
    val buckets = graft.Spread.pinned(
      bandBuckets(col(idCol), col(sigCol), bands, rowsPerBand)(df),
      col("_zc_band"), col("_zc_bucket"))
    if (exhaustive)
      exhaustiveBucketPairs(buckets, Seq("_zc_band", "_zc_bucket"), "_zc_id", maxBucket)
    else
      boundedBucketPairs(buckets, Seq("_zc_band", "_zc_bucket"), "_zc_id", maxBucket)
  }

  /** NEAR-SUPERSET (containment) pairs: documents whose OVERLAP
    * COEFFICIENT `|Sa ∩ Sb| / min(|Sa|, |Sb|)` reaches `threshold` — the
    * quote/forwarding-chain/truncation shape that resemblance dedup
    * structurally misses: a document embedded verbatim inside a much
    * longer one has overlap ≈ 1 but Jaccard ≈ |small|/|big|, far below
    * any [[minhashPairs]] threshold (and MinHash banding recall decays
    * with the Jaccard value, not the containment).
    *
    * Candidate generation is the PREFIX FILTER of the set-similarity-
    * join literature (Bayardo/Ma/Srikant "Scaling Up All Pairs
    * Similarity Search", WWW'07; Chaudhuri et al. SSJoin, ICDE'06) —
    * recall-COMPLETE by theorem, not data luck: order the shingle
    * universe rare-first (document frequency asc, shingle asc); for a
    * pair at overlap >= tau with smaller side B, `|A ∩ B| >= ceil(tau
    * |B|)`, so B's first `|B| - ceil(tau |B|) + 1` shingles in that
    * order must contain at least one shared shingle (removing the rest
    * leaves fewer than `|A ∩ B|` slots otherwise). Joining every doc's
    * FULL shingle set against other docs' PREFIXES therefore finds
    * every qualifying pair; verification computes the exact coefficient
    * over the full sets and decides the threshold.
    *
    * Scale shape: the join is (inverted index) ⋈ (prefix index) keyed
    * by shingle. Rare-first ordering makes a PREFIX entry for a
    * globally-common shingle rare (only a doc whose every shingle is
    * common puts one there), so hot-shingle buckets are (df × few), not
    * (df × df); candidate volume is the literature's prefix-filter
    * bound, a vanishing fraction of the pair square at realistic
    * thresholds. Per-doc ranking is a window over one document's
    * shingles — bounded by document size, never a corpus sort. The
    * prefix length uses `floor((1-tau)|B| + 1e-6) + 1`, a provable
    * upper bound on the required `|B| - ceil(tau |B|) + 1` (the 1e-6
    * bias absorbs float error in the UPWARD direction only — an
    * occasional one-longer prefix adds candidates, never loses one).
    *
    * Shingle arrays are treated as SETS — pass distinct elements (as
    * [[graft.functions.TextFunctions.charShingles]] produces); duplicate
    * elements would skew the `min(|Sa|, |Sb|)` denominator.
    *
    * Returns `(a, b, containment)` with `a < b`, exact coefficient. */
  def containmentPairs(df: DataFrame, idCol: String, shingles: Column,
                       threshold: Double,
                       denseUniverseMax: Int = 1 << 14,
                       denseDocsMax: Long = 1L << 14): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containment threshold must be in (0, 1], got $threshold")
    // Spread FIRST (the minhashPairs pattern), but ONLY when the input
    // is under-partitioned ([[graft.Spread]], r11): a one-row-group
    // parquet input would otherwise hash every shingle inside the single
    // scan task, while a corpus-wide scan is already parallel and an
    // unconditional repartition would pay a full-text Exchange for
    // nothing. (The former second boundary on the same key was a second
    // full Exchange of the shingle arrays — dropped r11; the explode
    // and verify joins plan their own exchanges on their own keys.)
    val docs = graft.Spread.spread(df, col(idCol))
      .select(col(idCol).as("_zc_id"), shingles.as("_zc_sh"))
      .where(size(col("_zc_sh")) > 0)
    val toks = docs.select(col("_zc_id"), size(col("_zc_sh")).as("_zc_n"),
      explode(col("_zc_sh")).as("_zc_t"))
    val dfreq = toks.groupBy(col("_zc_t")).agg(count(lit(1)).as("_zc_df"))
    // ADAPTIVE regime switch, measured from the data (two cheap counts):
    // a DENSE universe (few distinct shingles, every posting list hot) is
    // the inverted filter's provable worst case — with ~1000 shingles
    // over ~5000 docs every pair shares "rare" shingles and the prefix
    // join degrades toward all-pairs (measured: 7.9M of 12.7M possible
    // candidates on the synthetic corpus). There, brute force over
    // fixed-width BITMAPS is the right plan: ceil(U/64) longs per doc,
    // intersection = popcount of AND, the whole corpus side broadcasts.
    // The sparse regime (real web text: universe >> docs) keeps the
    // literature path below.
    // Regime probe, cheapest-first: the doc count needs no explode; the
    // universe probe collects AT MOST denseUniverseMax+1 distinct
    // shingles — if they fit, the collected set IS the whole universe
    // (one token pass serves both the decision and the dense path's
    // id table; tid order is irrelevant — popcounts are order-blind).
    val nDocs = docs.count()
    if (nDocs == 0) // empty input: densePairs' 0-word bitmap can't plan
      return docs.select(col("_zc_id").as("a"), col("_zc_id").as("b"),
        lit(0.0).as("containment"))
    if (nDocs <= denseDocsMax) {
      val probe = toks.select(col("_zc_t")).distinct()
        .limit(denseUniverseMax + 1).collect()
      if (probe.length <= denseUniverseMax)
        return densePairs(docs, toks.schema("_zc_t").dataType, probe, threshold)
    }
    val ranked = toks.join(dfreq, "_zc_t")
      .withColumn("_zc_rank", row_number().over(
        Window.partitionBy(col("_zc_id")).orderBy(col("_zc_df"), col("_zc_t"))))
    val prefix = ranked.where(col("_zc_rank") <=
      floor((lit(1.0) - lit(threshold)) * col("_zc_n") + lit(1e-6)) + lit(1))
    // POSITIONAL filter (PPJoin, Xiao et al. WWW'08), applied ROW-WISE
    // inside the candidate join: a hit on token t at ranks (i in A, j in
    // B) bounds the whole intersection for tokens shared AT OR AFTER t —
    // and per-doc rank order is the global (df, shingle) order
    // restricted, so for the pair's globally-FIRST shared token the
    // bound covers ALL shared tokens: |A∩B| <= 1 + min(|A|-i, |B|-j).
    // The bound only SHRINKS as ranks grow, so if a pair's first hit
    // fails it, every later hit fails too — filtering each hit row
    // independently is exact, drops doomed pairs BEFORE the distinct
    // shuffle, and needs no per-pair aggregation. The epsilon keeps
    // float tau*min from wrongly pruning an exactly-at-threshold pair;
    // over-keeping is just cost.
    val cands = prefix
      .select(col("_zc_t"), col("_zc_id").as("_zc_pb"),
        col("_zc_rank").as("_zc_jr"), col("_zc_n").as("_zc_nb"))
      .join(ranked.select(col("_zc_t"), col("_zc_id").as("_zc_pa"),
        col("_zc_rank").as("_zc_ir"), col("_zc_n").as("_zc_na")), "_zc_t")
      .where(col("_zc_pa") =!= col("_zc_pb") &&
        (lit(1) + least(col("_zc_na") - col("_zc_ir"),
          col("_zc_nb") - col("_zc_jr"))).cast("double") >=
          lit(threshold) * least(col("_zc_na"), col("_zc_nb")) - lit(1e-6))
      .select(least(col("_zc_pa"), col("_zc_pb")).as("a"),
        greatest(col("_zc_pa"), col("_zc_pb")).as("b"))
      .distinct()
    val sa = docs.select(col("_zc_id").as("a"), col("_zc_sh").as("_zc_sa"))
    val sb = docs.select(col("_zc_id").as("b"), col("_zc_sh").as("_zc_sb"))
    cands.join(sa, "a").join(sb, "b")
      .withColumn("containment",
        size(array_intersect(col("_zc_sa"), col("_zc_sb"))).cast("double") /
          least(size(col("_zc_sa")), size(col("_zc_sb"))))
      .where(col("containment") >= threshold)
      .select(col("a"), col("b"), col("containment"))
  }

  /** Dense-universe containment: every shingle gets a dense id (one
    * driver-bounded window over <= denseUniverseMax rows), every doc a
    * fixed-width bitmap of `ceil(U/64)` longs, and the pair space is
    * enumerated by a BROADCAST self-join — `|A∩B|` is the popcount of
    * the bitmap AND, unrolled at plan-build time into `W` codegen'd
    * `bit_count(a & b)` terms (no per-row array allocation). Exact, and
    * immune to posting-list heat: cost is C(n,2) cheap vector ops, the
    * right trade exactly when the universe is too small for any
    * inverted filter to discriminate. */
  private def densePairs(docs: DataFrame, shingleType: org.apache.spark.sql.types.DataType,
                         universeRows: Array[org.apache.spark.sql.Row],
                         threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    val words = (universeRows.length + 63) / 64
    // the probe already enumerated the whole universe — assign dense ids
    // on the driver (any order is correct) and broadcast the tiny table
    val idSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_zc_t", shingleType),
      org.apache.spark.sql.types.StructField("_zc_tid", org.apache.spark.sql.types.IntegerType, nullable = false)))
    val ids = spark.createDataFrame(
      spark.sparkContext.parallelize(
        universeRows.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row(r.get(0), i)
        }.toSeq, 1),
      idSchema)
    val bits = docs
      .select(col("_zc_id"), size(col("_zc_sh")).as("_zc_n"),
        explode(col("_zc_sh")).as("_zc_t"))
      .join(broadcast(ids), "_zc_t") // <= denseUniverseMax rows by regime
      .groupBy(col("_zc_id"), col("_zc_n"))
      // bit_or aggregates get MAP-SIDE partial combining — each upstream
      // task ships `words` longs per doc instead of a collect_list of
      // every tid (SQL form: the scala shiftleft() wrapper only takes a
      // literal shift amount; the SQL function shifts by an expression)
      .agg(
        expr("bit_or(CASE WHEN _zc_tid div 64 = 0 THEN " +
          "shiftleft(1L, cast(_zc_tid % 64 as int)) ELSE 0L END)").as("_zc_w0"),
        (1 until words).map { w =>
          expr(s"bit_or(CASE WHEN _zc_tid div 64 = $w THEN " +
            "shiftleft(1L, cast(_zc_tid % 64 as int)) ELSE 0L END)")
            .as(s"_zc_w$w")
        }: _*)
    // materialize the bitmap table ONCE (bounded by regime: <=
    // denseDocsMax rows x (2 + words) longs — a few MB at the gate
    // ceiling) — both sides of the self-join would otherwise replay
    // the whole text -> shingle -> explode -> bit_or pipeline, doubling
    // the dominant cost of the dense path
    val bitsRows = bits.collect().toSeq
    val slices = math.max(1, math.min(bitsRows.length / 64,
      spark.sparkContext.defaultParallelism))
    val bitsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(bitsRows, slices), bits.schema)
    val l = bitsDf.select(col("_zc_id").as("a") +: col("_zc_n").as("_zc_na") +:
      (0 until words).map(w => col(s"_zc_w$w").as(s"_zc_aw$w")): _*)
    val r = bitsDf.select(col("_zc_id").as("b") +: col("_zc_n").as("_zc_nb") +:
      (0 until words).map(w => col(s"_zc_w$w").as(s"_zc_bw$w")): _*)
    val inter = (0 until words)
      .map(w => bit_count(col(s"_zc_aw$w").bitwiseAND(col(s"_zc_bw$w"))))
      .reduce(_ + _)
    l.join(broadcast(r), col("a") < col("b"))
      .withColumn("containment",
        inter.cast("double") / least(col("_zc_na"), col("_zc_nb")))
      .where(col("containment") >= threshold)
      .select(col("a"), col("b"), col("containment"))
  }

  /** Verify candidate pairs against the TRUE Jaccard similarity of the
    * hashed shingle sets; keeps pairs with `jaccard >= threshold`. */
  def verifyJaccard(candidates: DataFrame, df: DataFrame, idCol: String,
                    shingleCol: String, threshold: Double): DataFrame = {
    val sa = df.select(col(idCol).as("a"), col(shingleCol).as("_zc_sa"))
    val sb = df.select(col(idCol).as("b"), col(shingleCol).as("_zc_sb"))
    candidates.join(sa, "a").join(sb, "b")
      .withColumn("_zc_inter", size(array_intersect(col("_zc_sa"), col("_zc_sb"))))
      .withColumn("jaccard",
        col("_zc_inter").cast("double") /
          (size(col("_zc_sa")) + size(col("_zc_sb")) - col("_zc_inter")))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** End-to-end near-dup pairs: shingle -> minhash -> band join -> exact
    * Jaccard verify.
    * @param exhaustive emit the FULL pair clique of oversized buckets
    *        (sub-bucket triangles, [[exhaustiveBucketPairs]]) instead of
    *        the star that suffices for grouping. */
  def minhashPairs(df: DataFrame, idCol: String, shingles: Column,
                   threshold: Double, numPerms: Int = 64,
                   bands: Int = 16, maxBucket: Int = DefaultMaxBucket,
                   exhaustive: Boolean = false): DataFrame = {
    val rowsPerBand = numPerms / bands
    // Spread FIRST — gated on input partitioning ([[graft.Spread]],
    // r11): the signature projection runs above the exchange for a
    // one-file input, and a corpus-wide scan plans no extra Exchange.
    val withSig = graft.Spread.spread(df, col(idCol))
      .withColumn("_zc_sh", shingles)
      .withColumn("_zc_sig", minhashSignature(col("_zc_sh"), numPerms))
      .select(col(idCol), col("_zc_sh"), col("_zc_sig"))
      // Exchange ABOVE the signature projection: the band-join and both
      // verify joins reuse it, so signatures materialize exactly once.
      // Advisory on purpose (r13): downstream of THIS boundary is
      // byte-proportional join work, so AQE coalescing it is safe — the
      // pinned form is reserved for bucket-keyed exchanges whose pair
      // fan-out AQE's byte sizing cannot see.
      .repartition(col(idCol))
    val cands = candidatePairs(withSig, idCol, "_zc_sig", bands, rowsPerBand, maxBucket, exhaustive)
    verifyJaccard(cands, withSig, idCol, "_zc_sh", threshold)
  }

  /** Connected components over near-duplicate pairs: every document gets
    * the smallest id reachable through the pair graph as its group
    * representative — the step that turns pairwise output
    * ([[minhashPairs]]/[[simhashPairs]]/cosine pairs) into dedup GROUPS
    * for keep-one-per-group filtering.
    *
    * Distributed min-label propagation: one hash-shuffled join + min-agg
    * per round, converging in (component diameter) rounds — dup
    * components are stars/near-cliques (the bucket guard stars oversized
    * classes around their min id), so 2-3 rounds close almost any corpus;
    * `maxIterations` bounds adversarial chains. Each round's labels are
    * persisted and the loop stops at the first round with zero label
    * changes (the count action doubles as the convergence test); every
    * third round the labels are checkpointed so the lineage is
    * TRUNCATED, not just cached — persist alone leaves a plan that grows
    * by one join per round.
    *
    * Checkpoint durability is a TRADEOFF the caller picks via the
    * SparkContext checkpoint dir. With `sc.setCheckpointDir(...)` set,
    * rounds use reliable `checkpoint()` — labels land on the cluster FS
    * and survive executor loss, the right mode for a long 100 TB job.
    * Without one, rounds fall back to `localCheckpoint()`: faster (no
    * FS write) but the blocks live ONLY in executor storage with the
    * lineage deleted, so losing an executor after a checkpoint FAILS the
    * job rather than recomputing (and Spark documents it as unsafe
    * under dynamic allocation) — acceptable for short interactive runs,
    * not for fault-sensitive ones. Returns `(id, rep)` for every id
    * that appears in `pairs`.
    *
    * SIZE-ADAPTIVE (r10d): when the deduplicated edge list is small
    * (`<= driverMaxEdges`, default 2^20 ≈ 16 MB of longs) and the ids
    * are integral, components are solved by a DRIVER union-find over
    * the collected edges — one job instead of 2+ per propagation round.
    * The iterative loop pays ~1-2 s of planning + codegen + job fixed
    * cost PER ROUND regardless of data size (measured: 821 edges, 13 s
    * through the loop, <1 s through union-find) — pure small-scale
    * overhead the adaptive cutover removes, while huge pair graphs
    * (where those seconds amortize to nothing) keep the distributed
    * loop. Both paths produce the identical (id, min-reachable-id)
    * labeling. The edge count is known before choosing (the same
    * `count()` that materializes the loop's cache), so the switch costs
    * nothing. */
  def groups(pairs: DataFrame, maxIterations: Int = 10,
             driverMaxEdges: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .persist()
    // long ids only: the fast path must return the exact column types
    // the loop would (other id types just keep the loop)
    val integralIds = edges.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (integralIds && edges.count() <= driverMaxEdges) {
      import spark.implicits._
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      es.foreach { case (a, b) =>
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // min id becomes the root = the rep, as in the loop
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
      parent.forEach { (id, _) => out += ((id, find(id))) }
      return out.toSeq.toDF("id", "rep")
    }
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("rep"))
      .persist()
    var iter = 0
    var converged = false
    var prevCp: Option[DataFrame] = None
    while (iter < maxIterations && !converged) {
      val prop = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("rep")).as("_zc_nrep"))
      val joined = labels.join(prop, labels("id") === prop("src"), "left")
        .select(col("id"), col("rep"),
          least(col("rep"), coalesce(col("_zc_nrep"), col("rep"))).as("_zc_new"))
        .persist()
      val changed = joined.where(col("_zc_new") < col("rep")).count()
      val old = labels
      labels = joined.select(col("id"), col("_zc_new").as("rep")).persist()
      labels.count() // materialize before unpersisting parents
      old.unpersist()
      joined.unpersist()
      converged = changed == 0
      iter += 1
      if (!converged && iter % 3 == 0) {
        // truncate lineage: the checkpoint replaces the round's
        // join-on-join plan with a leaf, bounding plan size (and, in
        // reliable mode, recompute-on-loss; see the scaladoc tradeoff)
        val cp = if (reliable) labels.checkpoint(true) else labels.localCheckpoint(true)
        labels.unpersist()
        // free the PREVIOUS checkpoint's executor blocks eagerly — the
        // new checkpoint is materialized, so without this a long loop
        // holds one full label copy per checkpoint until driver GC
        prevCp.foreach(_.queryExecution.analyzed.foreach {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
          case _ => ()
        })
        prevCp = Some(cp)
        labels = cp
      }
    }
    edges.unpersist()
    labels
  }

  /** End-to-end near-dup REMOVAL: keep, per connected group of
    * `pairs`, only the member with the smallest id; singletons (never
    * paired) always survive. */
  def keepRepresentatives(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val doomed = groups(pairs).where(col("id") =!= col("rep")).select(col("id"))
    df.join(doomed, df(idCol) === doomed("id"), "left_anti")
  }

  /** CANONICAL-document selection (C51): keep, per connected group of
    * `pairs`, the member MAXIMIZING `quality` (ties → smallest id);
    * singletons always survive. The keep-BEST refinement of
    * [[keepRepresentatives]] production pipelines actually run — near-dup
    * clusters mix full documents with truncated/boilerplate-wrapped
    * copies, and keep-min-id keeps whichever arrived first while this
    * keeps the longest/cleanest one (quality is the caller's column:
    * text length, a C9 quality score, a C49 classifier margin).
    *
    * Scale shape: the component table is bounded by the DUPLICATED
    * subset (only ids appearing in `pairs`), never the corpus; quality
    * rides a two-column `(id, quality)` projection so document text
    * never shuffles; the per-group argmax is one map-side-combined
    * `max_by` aggregate over component rows; and the LOSER set (members
    * minus winners — the duplicate excess, small by definition)
    * broadcasts into a single anti-join against the unshuffled corpus. */
  def keepBest(df: DataFrame, pairs: DataFrame, idCol: String,
               quality: Column): DataFrame = {
    val comp = groups(pairs) // (id, rep): only ids that appear in pairs
    val q = df.select(col(idCol).as("_zc_qid"), quality.as("_zc_q"))
    val member = comp.join(q, col("id") === col("_zc_qid"))
    // deterministic argmax: highest quality wins, smallest id on a
    // quality tie (two members can never fully tie: ids are unique).
    // Numeric ids ride one map-side-combined max_by over a
    // (quality, -id) struct; non-numeric ids (arithmetic negation
    // would be null and silently break the tie rule) take a
    // rep-partitioned row_number — same shuffle key, sort instead of
    // combine, still bounded by the duplicated subset.
    val idIsNumeric = df.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val winners =
      if (idIsNumeric)
        member.groupBy(col("rep"))
          .agg(max_by(col("id"), struct(col("_zc_q"), -col("id"))).as("_zc_win"))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("rep")).orderBy(col("_zc_q").desc, col("id").asc)
        member.withColumn("_zc_rn", row_number().over(w))
          .where(col("_zc_rn") === 1)
          .select(col("rep"), col("id").as("_zc_win"))
      }
    val losers = member.join(winners, "rep")
      .where(col("id") =!= col("_zc_win")).select(col("id"))
    df.join(broadcast(losers), df(idCol) === losers("id"), "left_anti")
  }

  /** TUNE the LSH banding (r10d): pick `(bands, rowsPerBand)` for
    * [[minhashPairs]] that best approximates a step filter at the
    * Jaccard `threshold` — the datasketch `_optimal_param` shape. A
    * `(b, r)` banding collides a pair of similarity `s` with
    * probability `1 − (1 − s^r)^b`; the tuner minimizes the equal-
    * weighted false-positive + false-negative mass
    *
    *   ∫₀ᵗ [1−(1−s^r)^b] ds  +  ∫ₜ¹ (1−s^r)^b ds
    *
    * over every banding with `r = numPerms / b` (all permutations
    * spent), by deterministic midpoint quadrature — same inputs, same
    * answer, every platform. The default `bands = 16` of
    * [[minhashPairs]] is tuned for thresholds near 0.8 at 64 perms;
    * recall-critical pipelines at other operating points should pass
    * the tuned value: more bands = higher recall + more candidate
    * pairs, fewer bands = the reverse, and this picks the principled
    * middle. Cost model only — runs on the driver in microseconds,
    * touches no data. */
  def tuneBands(numPerms: Int, threshold: Double): (Int, Int) = {
    require(numPerms >= 1, "numPerms must be positive")
    require(threshold > 0 && threshold < 1, s"threshold in (0,1), got $threshold")
    val n = 2000
    def integrate(f: Double => Double, a: Double, b: Double): Double = {
      val h = (b - a) / n
      var acc = 0.0
      var i = 0
      while (i < n) { acc += f(a + h * (i + 0.5)); i += 1 }
      acc * h
    }
    var best: (Double, Int, Int) = null
    var bands = 1
    while (bands <= numPerms) {
      val r = numPerms / bands
      if (r >= 1) {
        def collide(s: Double) = 1.0 - math.pow(1.0 - math.pow(s, r), bands)
        val fp = integrate(collide, 0.0, threshold)
        val fn = integrate(s => 1.0 - collide(s), threshold, 1.0)
        val c = fp + fn
        if (best == null || c < best._1 - 1e-12) best = (c, bands, r)
      }
      bands += 1
    }
    (best._2, best._3)
  }

  /** 64-bit SimHash sign bits of a token array ([[SimHash64]] native
    * expression). `fnv = true` hashes tokens with FNV-1a instead of
    * xxhash64 — externally reproducible (exact SQL oracle). */
  def simhash(tokens: Column, fnv: Boolean = false): Column = SimHash64.bits(tokens, fnv)

  /** The pure-builtin formulation [[SimHash64]] replaces (input: token
    * HASHES); kept as the spec's bit-identity cross-check. */
  def simhashBits(tokenHashes: Column): Column =
    transform(
      aggregate(
        tokenHashes,
        array(Seq.fill(64)(lit(0L)): _*),
        (acc, h) => zip_with(
          acc,
          array((0 until 64).map(j => shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1): _*),
          (a, b) => a + b)),
      c => when(c > 0, lit(1)).otherwise(lit(0)))

  /** Near-dup pairs by SimHash: bucket on 16-bit chunks (pigeonhole for
    * hamming <= 3), verify true hamming distance <= `maxHamming`;
    * degenerate chunks fall back to star expansion
    * ([[boundedBucketPairs]]). */
  def simhashPairs(df: DataFrame, idCol: String, tokens: Column, maxHamming: Int,
                   maxBucket: Int = DefaultMaxBucket,
                   exhaustive: Boolean = false,
                   fnvHash: Boolean = false): DataFrame = {
    val withBits = graft.Spread.spread(df, col(idCol)) // gated, r11
      .withColumn("_zc_bits", simhash(tokens, fnvHash))
      .select(col(idCol), col("_zc_bits"))
      .repartition(col(idCol)) // shared boundary (see minhashPairs)
    val chunks = graft.Spread.pinned(withBits.select(
      col(idCol).as("_zc_id"),
      posexplode(array((0 until 4).map { b =>
        xxhash64(slice(col("_zc_bits"), b * 16 + 1, 16), lit(b))
      }: _*)).as(Seq("_zc_band", "_zc_bucket"))),
      col("_zc_band"), col("_zc_bucket"))
    val cands =
      if (exhaustive) exhaustiveBucketPairs(chunks, Seq("_zc_band", "_zc_bucket"), "_zc_id", maxBucket)
      else boundedBucketPairs(chunks, Seq("_zc_band", "_zc_bucket"), "_zc_id", maxBucket)
    val ba = withBits.select(col(idCol).as("a"), col("_zc_bits").as("_zc_ba"))
    val bb = withBits.select(col(idCol).as("b"), col("_zc_bits").as("_zc_bb"))
    cands.join(ba, "a").join(bb, "b")
      .withColumn("hamming",
        aggregate(zip_with(col("_zc_ba"), col("_zc_bb"),
          (x, y) => when(x =!= y, 1).otherwise(0)), lit(0), (acc, v) => acc + v))
      .where(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  // ------- persisted fingerprint index: incremental exact dedup -------

  /** Bounded driver-side pruning keys (r14, r13 verdict #3). Every
    * incremental path prunes its index read with a collected
    * `col in (<distinct batch keys>)` predicate — that IS the partition
    * skipping that makes micro-batch lookups cheap, and the key space
    * is `pmod`-bounded by the index's bucket count (default 64). But
    * the bucket count is user-chosen with no ceiling, and a BULK
    * "incremental" call against a millions-of-buckets index would
    * collect millions of longs and parse a predicate string of that
    * size on the driver. The collect is therefore capped BEFORE it
    * reaches the driver (`limit(cap + 1)` bounds the job output):
    * above the cap the caller queries UNPRUNED (`None`) — every call
    * site restricts through a subsequent join, so the IN-list is only
    * ever a skip-layer hint, never correctness; a batch wide enough to
    * blow the cap touches most buckets anyway, making the unpruned
    * scan the right plan. `Some(Nil)` = empty batch (callers
    * early-return). */
  private[graft] def pruneCap: Int =
    sys.props.get("graft.dedup.pruneCap") match {
      case None => 100000
      case Some(raw) =>
        val v =
          try raw.trim.toLong
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"graft.dedup.pruneCap must be a non-negative integer, got '$raw'")
          }
        require(v >= 0, s"graft.dedup.pruneCap must be >= 0, got $v")
        // clamp so limit(cap + 1) below can never overflow Int
        math.min(v, (Int.MaxValue - 1).toLong).toInt
    }

  private[graft] def boundedKeys(keys: DataFrame): Option[Seq[Long]] = {
    val cap = pruneCap
    val ks = keys.distinct().limit(cap + 1).collect().map(_.getLong(0))
    if (ks.length > cap) None else Some(ks.sorted.toIndexedSeq)
  }

  /** `"col in (...)"` for [[boundedKeys]]' verdict — `null` (query all)
    * above the cap. */
  private[graft] def prunePred(column: String, keys: Option[Seq[Long]]): String =
    keys.map(ks => s"$column in (${ks.mkString(", ")})").orNull

  /** Attrs key holding the index's bucket count (written by
    * [[buildFingerprintIndex]], read back by [[dedupAgainstIndex]]). */
  val IndexBucketsAttr = "fingerprint.buckets"

  private def fpIndexRows(docs: DataFrame, idCol: String, textCol: String,
                          nBuckets: Int): DataFrame =
    docs
      .select(graft.functions.TextFunctions.fingerprint(col(textCol)).as("fp"),
        col(idCol).cast("long").as("doc_id"))
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select(pmod(col("fp"), lit(nBuckets.toLong)).as("bucket"),
        col("fp"), col("doc_id"))

  /** Build a PERSISTED fingerprint index — the "have I seen this text
    * before" service of a continuously-ingesting corpus. Stores one
    * `(bucket, fp, doc_id)` row per distinct normalized-text FNV-1a
    * fingerprint (`doc_id` = the min representative), as a graft
    * collection Sequence-partitioned on `bucket = fp mod nBuckets`.
    *
    * Scale shape: the index row is 24 bytes/doc — a 10^10-doc corpus
    * indexes in ~240 GB regardless of text size, and the bucket
    * partitioning means an incremental batch reads only the buckets its
    * own fingerprints hash into ([[dedupAgainstIndex]]). Building is one
    * fingerprint map pass + one `groupBy(fp)` shuffle. */
  def buildFingerprintIndex(spark: org.apache.spark.sql.SparkSession, root: String,
                            docs: DataFrame, idCol: String, textCol: String,
                            nBuckets: Int = 64): graft.core.Collection = {
    require(nBuckets >= 1, s"nBuckets must be positive; got $nBuckets")
    val rows = fpIndexRows(docs, idCol, textCol, nBuckets)
    val c = graft.core.Collection.create(spark, root, rows.schema, "fp",
      graft.core.SequencePartitioning(Seq("bucket"), "fp"), overwrite = true,
      attrs = Map(IndexBucketsAttr -> nBuckets.toString))
    c.insert(rows)
    c
  }

  /** Append `docs`' fingerprints to an existing index (call with the
    * survivors a [[dedupAgainstIndex]] pass accepted). Keep-first
    * semantics: a fingerprint already present keeps its original
    * representative — only genuinely new fingerprints land, in one
    * commit whose read side is bounded to the touched buckets. The
    * existence check and the insert are two steps: concurrent appenders
    * can both admit the same fp (a duplicate index ROW, never a wrong
    * dedup verdict — [[dedupAgainstIndex]] tests existence only). */
  def appendFingerprints(index: graft.core.Collection, docs: DataFrame,
                         idCol: String, textCol: String): Seq[String] = {
    val nBuckets = index.attrs(IndexBucketsAttr).toInt
    val rows = fpIndexRows(docs, idCol, textCol, nBuckets)
    val buckets = boundedKeys(rows.select("bucket"))
    if (buckets.exists(_.isEmpty)) return Nil
    val existing = index.query(prunePred("bucket", buckets), Seq("fp"))
    index.insert(rows.join(existing, Seq("fp"), "left_anti"),
      graft.core.MergeStrategy.Concat)
  }

  // ---- persisted MinHash index: incremental NEAR-dup ----------------

  /** Attrs describing a [[buildMinhashIndex]] layout. */
  val MinhashBucketsAttr = "minhash.buckets"
  val MinhashPermsAttr = "minhash.perms"
  val MinhashBandsAttr = "minhash.bands"
  val MinhashShingleAttr = "minhash.shingleK"
  /** `"xxhash64"` (production default) or `"fnv1a"` — the FNV chain is
    * DuckDB-replayable byte arithmetic, so an FNV index's whole
    * incremental-dedup path gets an exact SQL oracle. Baked into the
    * index at build time; readers follow the attr. */
  val MinhashHashAttr = "minhash.hash"

  private def minhashSigRows(docs: DataFrame, idCol: String, textCol: String,
                             shingleK: Int, numPerms: Int,
                             fnv: Boolean = false): DataFrame =
    graft.Spread.spread(docs, col(idCol))
      .select(col(idCol).cast("long").as("doc_id"),
        MinHashSig.signature(
          graft.functions.ShingleHashes.shingles(
            split(trim(col(textCol)), "\\s+"), shingleK, fnv), numPerms, fnv).as("sig"))

  private def minhashBandRows(sigs: DataFrame, bands: Int, rowsPerBand: Int,
                              nBuckets: Int): DataFrame =
    bandBuckets(col("doc_id"), col("sig"), bands, rowsPerBand)(sigs)
      .select(pmod(col("_zc_bucket"), lit(nBuckets.toLong)).as("bmod"),
        col("_zc_band").as("band"), col("_zc_bucket").as("bucket"),
        col("_zc_id").as("doc_id"))

  private def sigMod(docId: Column, nBuckets: Int): Column =
    pmod(xxhash64(docId), lit(nBuckets.toLong))

  /** Build a PERSISTED MinHash-LSH index for INCREMENTAL near-dup
    * detection: two bucket-partitioned sub-collections under `root` —
    * `bands/` holds one `(bmod, band, bucket, doc_id)` row per banding
    * key (the LSH candidate-generation side) and `sigs/` one
    * `(smod, doc_id, sig[numPerms])` row per doc (the estimated-Jaccard
    * verification side). Both partition on a bounded hash bucket, so an
    * incremental batch reads only the buckets its own keys hash into.
    * Index size ∝ docs x (bands + numPerms longs) — text never stored. */
  def buildMinhashIndex(spark: org.apache.spark.sql.SparkSession, root: String,
                        docs: DataFrame, idCol: String, textCol: String,
                        nBuckets: Int = 64, numPerms: Int = 64, bands: Int = 16,
                        shingleK: Int = 3,
                        fnvHash: Boolean = false): (graft.core.Collection, graft.core.Collection) = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    val attrs = Map(
      MinhashBucketsAttr -> nBuckets.toString, MinhashPermsAttr -> numPerms.toString,
      MinhashBandsAttr -> bands.toString, MinhashShingleAttr -> shingleK.toString,
      MinhashHashAttr -> (if (fnvHash) "fnv1a" else "xxhash64"))
    // signatures feed BOTH sub-collections' write jobs — materialize the
    // shingle+minhash pass once instead of twice
    val sigs = minhashSigRows(docs, idCol, textCol, shingleK, numPerms, fnvHash)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sigRows = sigs.select(sigMod(col("doc_id"), nBuckets).as("smod"),
        col("doc_id"), col("sig"))
      val sc = graft.core.Collection.create(spark, s"$root/sigs", sigRows.schema,
        "doc_id", graft.core.SequencePartitioning(Seq("smod"), "doc_id"),
        overwrite = true, attrs = attrs)
      sc.insert(sigRows)
      val bandRows = minhashBandRows(sigs, bands, numPerms / bands, nBuckets)
      val bc = graft.core.Collection.create(spark, s"$root/bands", bandRows.schema,
        "doc_id", graft.core.SequencePartitioning(Seq("bmod"), "doc_id"),
        overwrite = true, attrs = attrs)
      bc.insert(bandRows)
      (bc, sc)
    } finally sigs.unpersist()
  }

  /** Open both halves of a [[buildMinhashIndex]] root. */
  def openMinhashIndex(spark: org.apache.spark.sql.SparkSession,
                       root: String): (graft.core.Collection, graft.core.Collection) =
    (graft.core.Collection.open(spark, s"$root/bands", readOnly = true),
     graft.core.Collection.open(spark, s"$root/sigs", readOnly = true))

  /** INCREMENTAL near-dup dedup: drop batch docs whose ESTIMATED Jaccard
    * against any indexed doc reaches `minEstJaccard` (matching MinHash
    * positions / numPerms — the standard unbiased estimator; 64 perms
    * give ~±0.06 at 1σ). Candidates come from LSH banding collisions, so
    * the index never produces the O(batch x corpus) pair space.
    *
    * Scale shape: THREE bounded reads, all partition-pruned — the batch's
    * band keys select `bands/` buckets, candidate doc ids select `sigs/`
    * buckets, and the corpus text behind the index is never touched. The
    * shuffles carry band keys and signatures of the candidates only;
    * incremental cost follows the batch and its collision fan-out. */
  def dedupNearAgainstIndex(spark: org.apache.spark.sql.SparkSession, root: String,
                            batch: DataFrame, idCol: String, textCol: String,
                            minEstJaccard: Double = 0.9): DataFrame = {
    val (bc, sc) = openMinhashIndex(spark, root)
    val nBuckets = bc.attrs(MinhashBucketsAttr).toInt
    val numPerms = bc.attrs(MinhashPermsAttr).toInt
    val bands = bc.attrs(MinhashBandsAttr).toInt
    val shingleK = bc.attrs(MinhashShingleAttr).toInt
    val fnv = bc.attrs.getOrElse(MinhashHashAttr, "xxhash64") == "fnv1a"
    val sigs = minhashSigRows(batch.select(col(idCol), col(textCol)),
      idCol, textCol, shingleK, numPerms, fnv).persist()
    try {
      val bandRows = minhashBandRows(sigs, bands, numPerms / bands, nBuckets)
      val bmods = boundedKeys(bandRows.select("bmod"))
      if (bmods.exists(_.isEmpty)) return batch.limit(0)
      val idxBands = bc.query(prunePred("bmod", bmods),
        Seq("band", "bucket", "doc_id"))
      val cands = bandRows
        .join(idxBands.withColumnRenamed("doc_id", "_zc_cand"), Seq("band", "bucket"))
        .select(col("doc_id").as("_zc_bid"), col("_zc_cand")).distinct()
      val smods = boundedKeys(cands.select(sigMod(col("_zc_cand"), nBuckets).as("m")))
      val dropped =
        if (smods.exists(_.isEmpty)) sigs.limit(0).select(col("doc_id").as("_zc_drop"))
        else {
          val idxSigs = sc.query(prunePred("smod", smods), Seq("doc_id", "sig"))
            .select(col("doc_id").as("_zc_cand"), col("sig").as("_zc_csig"))
          cands
            .join(sigs.select(col("doc_id").as("_zc_bid"), col("sig").as("_zc_bsig")), "_zc_bid")
            .join(idxSigs, "_zc_cand")
            .withColumn("_zc_est",
              aggregate(zip_with(col("_zc_bsig"), col("_zc_csig"),
                (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
                .cast("double") / numPerms)
            .where(col("_zc_est") >= minEstJaccard)
            .select(col("_zc_bid").as("_zc_drop")).distinct()
        }
      batch.join(dropped, col(idCol) === col("_zc_drop"), "left_anti")
    } finally sigs.unpersist()
  }

  /** INCREMENTAL exact dedup of a new batch against a persisted
    * [[buildFingerprintIndex]] collection: drop batch docs whose
    * normalized-text fingerprint is already indexed; within the batch
    * keep the smallest-`idCol` doc per fingerprint (the arrival-order
    * keep-first of [[exact]]).
    *
    * Scale shape: the batch's fingerprints bucket into at most
    * `nBuckets` values, and the index read carries `bucket in (...)`
    * — the collection's partition pruning opens ONLY those buckets'
    * shards and files, and column pruning reads only the `fp` column of
    * what it opens. The anti-join then shuffles just those index
    * fingerprints against the (small) batch: incremental cost follows
    * the BATCH, not the corpus. The 100 TB corpus behind the index is
    * never touched — dedup needs its 8-byte fingerprints, not its
    * text. */
  def dedupAgainstIndex(index: graft.core.Collection, batch: DataFrame,
                        idCol: String, textCol: String): DataFrame = {
    val nBuckets = index.attrs.getOrElse(IndexBucketsAttr,
      throw new IllegalArgumentException(
        s"collection at ${index.root} is not a fingerprint index " +
        s"(missing '$IndexBucketsAttr' attr)")).toInt
    val withFp = batch.withColumn("_zc_fp",
      graft.functions.TextFunctions.fingerprint(col(textCol)))
    val kept = exact(withFp, Seq("_zc_fp"), keepCol = idCol)
    // the batch's touched buckets, capped before they reach the driver
    val buckets = boundedKeys(withFp
      .select(pmod(col("_zc_fp"), lit(nBuckets.toLong)).as("b")))
    if (buckets.exists(_.isEmpty)) return batch.limit(0)
    val idx = index.query(prunePred("bucket", buckets), Seq("fp"))
    kept.join(idx, kept("_zc_fp") === idx("fp"), "left_anti").drop("_zc_fp")
  }

  // ------- persisted containment index: incremental near-superset -----

  val ContainBucketsAttr = "containment.buckets"
  val ContainThresholdAttr = "containment.threshold"

  /** Per-doc rows `(doc_id, sh sorted-asc, n, p)` — the shared substrate
    * of both index halves and the query side. The GLOBAL shingle order
    * here is the HASH VALUE itself (ascending), not document frequency:
    * hash order is FIXED as the corpus grows, so a prefix computed at
    * index time stays a valid prefix against every future batch — the
    * property an incremental service needs and a df-ordered prefix
    * ([[containmentPairs]]' candidate-minimizing choice) cannot give
    * (new docs shift frequencies). Any fixed total order satisfies the
    * prefix-filter theorem; hash order just generates somewhat more
    * candidates. */
  private def containDocRows(docs: DataFrame, idCol: String,
                             shingles: Column, threshold: Double): DataFrame =
    graft.Spread.spread(docs, col(idCol)) // shingle pass parallel even off one file; gated r11
      .select(col(idCol).cast("long").as("doc_id"), array_sort(shingles).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("n", size(col("sh")))
      .withColumn("p",
        (floor((lit(1.0) - lit(threshold)) * col("n") + lit(1e-6)) + lit(1)).cast("int"))

  /** Build a PERSISTED containment (near-superset) index for INCREMENTAL
    * overlap-coefficient detection at `threshold`: two bucket-partitioned
    * sub-collections under `root` —
    *
    *  - `inv/`: one `(bucket, sh, doc_id, pfx)` row per (doc, distinct
    *    shingle) — the inverted index; `pfx` marks the doc's first
    *    `floor((1-tau)n)+1` shingles in FIXED hash order (the
    *    prefix-filter candidate side, see [[containmentPairs]] for the
    *    theorem; hash order keeps prefixes valid as the corpus grows);
    *  - `sets/`: one `(dbucket, doc_id, sh, n)` row per doc — the full
    *    sorted shingle-set side the exact verify reads back,
    *    partition-pruned by candidate doc ids.
    *
    * Index size ∝ corpus distinct-shingle volume (`inv/` is a real
    * inverted index; `sets/` stores the arrays once more) — the honest
    * cost of serving exact containment; text itself is never stored. */
  def buildContainmentIndex(spark: org.apache.spark.sql.SparkSession, root: String,
                            docs: DataFrame, idCol: String, shingles: Column,
                            threshold: Double, nBuckets: Int = 64): (graft.core.Collection, graft.core.Collection) = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containment threshold must be in (0, 1], got $threshold")
    val attrs = Map(ContainBucketsAttr -> nBuckets.toString,
      ContainThresholdAttr -> threshold.toString)
    val base = containDocRows(docs, idCol, shingles, threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val setRows = base.select(
        pmod(col("doc_id"), lit(nBuckets.toLong)).as("dbucket"),
        col("doc_id"), col("sh"), col("n"))
      val sc = graft.core.Collection.create(spark, s"$root/sets", setRows.schema,
        "doc_id", graft.core.SequencePartitioning(Seq("dbucket"), "doc_id"),
        overwrite = true, attrs = attrs)
      sc.insert(setRows)
      val invRows = base
        .select(col("doc_id"), col("p"), col("n"),
          posexplode(col("sh")).as(Seq("_pos", "sh")))
        .select(pmod(col("sh"), lit(nBuckets.toLong)).as("bucket"), col("sh"),
          col("doc_id"), (col("_pos") + 1).cast("int").as("pos"), col("n"),
          (col("_pos") < col("p")).as("pfx"))
      val ic = graft.core.Collection.create(spark, s"$root/inv", invRows.schema,
        "sh", graft.core.SequencePartitioning(Seq("bucket"), "sh"),
        overwrite = true, attrs = attrs)
      ic.insert(invRows)
      (ic, sc)
    } finally base.unpersist()
  }

  /** Append `docs` to an existing containment index (call with the docs
    * an ingestion pass admitted): one Concat commit per half. Stored
    * prefixes never go stale — the prefix order is the FIXED hash
    * order, independent of corpus content, so rows written at build
    * time and rows appended years later obey the same theorem. */
  def appendContainment(spark: org.apache.spark.sql.SparkSession, root: String,
                        docs: DataFrame, idCol: String, shingles: Column): Unit = {
    val ic = graft.core.Collection.open(spark, s"$root/inv")
    val sc = graft.core.Collection.open(spark, s"$root/sets")
    val nBuckets = ic.attrs(ContainBucketsAttr).toInt
    val built = ic.attrs(ContainThresholdAttr).toDouble
    val base = containDocRows(docs, idCol, shingles, built)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sc.insert(base.select(
        pmod(col("doc_id"), lit(nBuckets.toLong)).as("dbucket"),
        col("doc_id"), col("sh"), col("n")), graft.core.MergeStrategy.Concat)
      ic.insert(base
        .select(col("doc_id"), col("p"), col("n"),
          posexplode(col("sh")).as(Seq("_pos", "sh")))
        .select(pmod(col("sh"), lit(nBuckets.toLong)).as("bucket"), col("sh"),
          col("doc_id"), (col("_pos") + 1).cast("int").as("pos"), col("n"),
          (col("_pos") < col("p")).as("pfx")), graft.core.MergeStrategy.Concat)
    } finally base.unpersist()
  }

  /** INCREMENTAL containment pairs of a new batch against a
    * [[buildContainmentIndex]] root: every `(batch doc, indexed doc)`
    * pair whose exact overlap coefficient reaches `threshold` (>= the
    * index's build threshold — a LOWER one would need longer prefixes
    * than the index stores, and is refused loudly).
    *
    * Candidate recall is complete by the prefix-filter theorem applied
    * in BOTH directions: if the indexed doc is the smaller side, its
    * stored `pfx` rows intersect the batch doc's full set; if the batch
    * doc is smaller, its own prefix intersects the indexed doc's full
    * inverted rows. Scale shape: three bounded pruned reads — the
    * batch's shingle buckets select `inv/` shards, the candidates' id
    * buckets select `sets/` shards, and the corpus text behind the
    * index is never touched; shuffles carry the batch's tokens and the
    * candidates' sets only. */
  def containmentAgainstIndex(spark: org.apache.spark.sql.SparkSession, root: String,
                              batch: DataFrame, idCol: String, shingles: Column,
                              threshold: Double): DataFrame = {
    val ic = graft.core.Collection.open(spark, s"$root/inv", readOnly = true)
    val sc = graft.core.Collection.open(spark, s"$root/sets", readOnly = true)
    val nBuckets = ic.attrs(ContainBucketsAttr).toInt
    val built = ic.attrs(ContainThresholdAttr).toDouble
    require(threshold >= built,
      s"query threshold $threshold is below the index's build threshold $built: " +
      "stored prefixes are too short to stay recall-complete — rebuild the index")
    val base = containDocRows(batch, idCol, shingles, built).persist()
    try {
      val btoks = base
        .select(col("doc_id").as("_zc_bid"), col("p"), col("n").as("_zc_bn"),
          posexplode(col("sh")).as(Seq("_pos", "sh")))
        .select(col("_zc_bid"), col("sh"), col("_zc_bn"),
          (col("_pos") + 1).cast("int").as("_zc_bpos"),
          (col("_pos") < col("p")).as("_zc_bpfx"))
      val buckets = boundedKeys(
        btoks.select(pmod(col("sh"), lit(nBuckets.toLong)).as("b")))
      if (buckets.exists(_.isEmpty)) return base.limit(0)
        .select(col("doc_id").as("a"), col("doc_id").as("b"),
          lit(0.0).as("containment"))
      val inv = ic.query(prunePred("bucket", buckets),
        Seq("sh", "doc_id", "pos", "n", "pfx"))
        .select(col("sh"), col("doc_id").as("_zc_cand"), col("pos"),
          col("n").as("_zc_cn0"), col("pfx"))
      // both prefix directions, one pass: a (batch token ⋈ index token)
      // hit is a candidate iff EITHER side's token is in its prefix —
      // then the POSITIONAL filter (see containmentPairs) bounds the
      // intersection by the first shared token's ranks and drops pairs
      // that can't reach the threshold before sets/ is ever read
      val cands = btoks.join(inv, "sh")
        .where(col("_zc_bpfx") || col("pfx"))
        // a batch doc already present in the index would meet itself at
        // containment 1.0 and poison any append-then-query caller;
        // exclude self-pairs here, matching containmentPairs' a < b
        .where(col("_zc_bid") =!= col("_zc_cand"))
        .groupBy(col("_zc_bid"), col("_zc_cand"), col("_zc_bn"), col("_zc_cn0"))
        .agg(min(col("_zc_bpos")).as("_zc_bj"), min(col("pos")).as("_zc_ci"))
        .where((lit(1) + least(col("_zc_bn") - col("_zc_bj"),
            col("_zc_cn0") - col("_zc_ci"))).cast("double") >=
          lit(threshold) * least(col("_zc_bn"), col("_zc_cn0")) - lit(1e-6))
        .select(col("_zc_bid"), col("_zc_cand")).distinct()
      val dmods = boundedKeys(
        cands.select(pmod(col("_zc_cand"), lit(nBuckets.toLong)).as("m")))
      if (dmods.exists(_.isEmpty)) return base.limit(0)
        .select(col("doc_id").as("a"), col("doc_id").as("b"),
          lit(0.0).as("containment"))
      val sets = sc.query(prunePred("dbucket", dmods),
        Seq("doc_id", "sh", "n"))
        .select(col("doc_id").as("_zc_cand"), col("sh").as("_zc_csh"),
          col("n").as("_zc_cn"))
      cands
        .join(base.select(col("doc_id").as("_zc_bid"), col("sh").as("_zc_bsh"),
          col("n").as("_zc_bn")), "_zc_bid")
        .join(sets, "_zc_cand")
        .withColumn("containment",
          size(array_intersect(col("_zc_bsh"), col("_zc_csh"))).cast("double") /
            least(col("_zc_bn"), col("_zc_cn")))
        .where(col("containment") >= threshold)
        .select(col("_zc_bid").as("a"), col("_zc_cand").as("b"), col("containment"))
    } finally base.unpersist()
  }
}
