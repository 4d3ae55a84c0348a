package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.dedup.Dedup
import graft.functions.TextFunctions
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

    // 3c. PII redaction before anything ships to training
    val redacted = clean.withColumn("text", TextFunctions.redactPii(col("text")))
    println(s"redacted corpus ready: ${redacted.count()}")

    // 4. similarity retrieval over embeddings (exact + LSH path)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.where(col("vec_id") < 3)
    Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5).show()
    Ann.lshTopK(emb, queries, "vec_id", "embedding", 5, tables = 8, planes = 4).show(5)
    spark.stop()
  }
}
