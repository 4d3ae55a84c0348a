package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.operators.Corpus
import graft.sources.Tables

/** A miniature training-data curation pipeline over the documents and
  * embeddings tables: exact dedup -> MinHash near-dedup -> quality
  * filtering -> language ID -> ANN retrieval.
  *
  * Run: `sbt "runMain graft.examples.TrainingDataPipeline"`.
  */
object TrainingDataPipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, "/root/testdata/sf0.001")

    // 1. exact dedup (keep lowest doc_id per text)
    val unique = Dedup.exact(docs, Seq("text"), "doc_id")
    println(s"exact-deduped: ${unique.count()} of ${docs.count()}")

    // 2. near-dedup: minhash candidates verified at true Jaccard >= 0.8,
    //    grouped by connected components, one representative kept per group
    val nearDups = Dedup.minhashPairs(unique, "doc_id",
      TextFunctions.wordShingles(col("text"), 3), threshold = 0.8)
    val deduped = Dedup.keepRepresentatives(unique, nearDups, "doc_id")
    println(s"near-deduped: ${deduped.count()}")

    // 3. quality + language filtering (Gopher-style rule gate)
    val scored = deduped
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .withColumn("lang_pred", TextFunctions.langId(col("text")))
    val kept = scored.where(TextFunctions.qualityRules(col("text"),
      minTokens = 5, maxTokens = 100000, minAvgTokenLen = 2.0,
      maxAvgTokenLen = 12.0, maxPunctRatio = 0.3, minStopwordHits = 1))
    println(s"after quality gate: ${kept.count()}")

    // 3b. benchmark decontamination: drop training docs whose normalized
    //     fingerprint appears in a held-out set (broadcast anti-join on
    //     8-byte hashes — the corpus never shuffles)
    val benchmark = docs.where(col("doc_id") % 50 === 0)
      .select(TextFunctions.fingerprint(col("text")).as("fp"))
    val clean = kept.withColumn("fp", TextFunctions.fingerprint(col("text")))
      .join(broadcast(benchmark), Seq("fp"), "left_anti")
    println(s"after decontamination: ${clean.count()}")

    // 3c. n-gram decontamination catches PARTIAL benchmark inclusions the
    //     whole-document fingerprint misses (5-gram here; 13 in production)
    val ngramClean = Corpus.decontaminateNgrams(clean, col("doc_id"), col("text"),
      docs.where(col("doc_id") % 50 === 0), col("text"), k = 5)
    println(s"after n-gram decontamination: ${ngramClean.count()}")

    // 3d. PII redaction before anything ships to training
    val redacted = ngramClean.withColumn("text", TextFunctions.redactPii(col("text")))
    println(s"redacted corpus ready: ${redacted.count()}")

    // 3e. repetition metrics (boilerplate/spam signal, shuffle-free) and a
    //     deterministic 90/5/5 split that survives re-runs and re-ingests
    val (bucket, split) = Corpus.hashSplit(
      TextFunctions.fingerprint(col("text")),
      Seq(("train", 90), ("val", 95), ("test", 100)))
    val labeled = redacted
      .select((col("doc_id") +: col("text") +: Corpus.repetitionMetrics(col("text"))) :+
        bucket.as("bucket") :+ split.as("split"): _*)
      .where(col("dup_token_frac") <= 0.6)
    labeled.groupBy("split").count().show()

    // 3f. chunk to the context window and pack chunks into token-budget
    //     bins per split (one shuffle, on the stratum key)
    val chunks = Corpus.chunkDocuments(
      labeled.select(col("doc_id"), col("text"), col("split")),
      col("text"), window = 128, stride = 96)
    val packed = Corpus.packSequences(
      chunks.withColumn("n_tokens", col("chunk_tokens").cast("long")),
      col("n_tokens"), Seq(col("split")), col("doc_id"), budget = 4096L)
    println(s"packed ${packed.count()} chunks into " +
      s"${packed.select("split", "bin").distinct().count()} bins")

    // 3g. corpus audit: top words with term + document frequency (the
    //     stopword/tokenizer sanity check), and a deterministic
    //     exact-quota sample per language for human review
    Corpus.vocabulary(labeled, col("doc_id"), col("text"), 10).show(10, truncate = false)
    val sample = Corpus.stratifiedSample(docs, Seq(col("lang")), col("doc_id"),
      TextFunctions.fingerprint(col("text")), n = 3)
    println(s"review sample: ${sample.count()} docs across " +
      s"${sample.select("lang").distinct().count()} languages")

    // 3h. per-language quality TAIL CUT (drop each language's bottom
    //     quartile by stopword ratio — the corpus never sorts), then a
    //     pretraining MIX recipe: explicit per-source token budgets
    //     filled in deterministic fingerprint order
    val gated = Corpus.quantileGate(
      docs.withColumn("stop_ratio",
        TextFunctions.qualityStats(col("text")).getField("stop_ratio")),
      Seq("lang"), col("stop_ratio"), q = 0.25)
    println(s"after per-language tail cut: ${gated.count()}")
    val mixed = Corpus.mixtureSample(gated, col("source"),
      Map("src0" -> 400L, "src1" -> 200L, "src2" -> 100L),
      col("doc_id"), TextFunctions.fingerprint(col("text")),
      TextFunctions.tokenCount(col("text")).cast("long"))
    mixed.groupBy("source").count().show()

    // 3i. characteristic terms (the tf-idf join-back shape, ranked
    //     integer-exactly) — the "what is this doc about" audit column
    Corpus.topTerms(docs, col("doc_id"), col("text"), k = 3,
      stopwords = Seq("the", "a", "of", "and", "is", "to", "in", "that", "it", "for"))
      .show(9, truncate = false)

    // 4. similarity retrieval over embeddings (exact + LSH path)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.where(col("vec_id") < 3)
    Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5).show()
    Ann.lshTopK(emb, queries, "vec_id", "embedding", 5, tables = 8, planes = 4).show(5)

    // 4b. the quantized serving tiers: INT8 shortlist + exact re-rank
    //     (4x smaller scan, exact final order), and PQ/ADC (32x): codes
    //     score as table lookups; both never shuffle corpus vectors
    Ann.int8RerankTopK(emb, queries, "vec_id", "embedding", k = 5, shortlist = 20).show(5)
    val books = Ann.pqTrain(emb, "vec_id", "embedding", dims = 64, m = 8, k = 64, iters = 1)
    val codes = Ann.pqEncode(emb, "vec_id", "embedding", books)
    Ann.pqTopK(codes, queries, "vec_id", "embedding", books, 5).show(5)
    spark.stop()
  }
}
