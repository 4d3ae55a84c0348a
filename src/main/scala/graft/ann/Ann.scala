package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the query set is the broadcast side — the corpus is never
  * broadcast, never collected, and similarity + top-k run as one pass over
  * corpus partitions followed by a per-query window. The LSH variant
  * (random hyperplanes, Charikar 2002) buckets the corpus so each query
  * only scans candidate buckets — the standard sub-linear scale path when
  * a full scan per query batch stops being acceptable.
  *
  * All vector math is `aggregate`/`zip_with` over the array — codegen'd
  * Catalyst expressions, accumulating in DOUBLE in element order (which
  * keeps results bit-deterministic).
  */
object Ann {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a float-array column. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine: for every row of `queries`, the `k` nearest
    * corpus rows (self-matches excluded by id). `queries` is expected to
    * be small — it is broadcast; the corpus streams. Ties break on the
    * corpus id, so results are total-order deterministic. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("_zc_qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("_zc_cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("_zc_qv"), col("_zc_cv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("int").as("rank"), col("sim"))
  }

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): a value in [-1, 1] derived from xxhash64 — no RNG state, stable
    * across runs and executors. */
  private def planeComponent(table: Int, plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(table * 1024 + plane), dim), lit(2000001L)) - lit(1000000L))
      .cast("double") / lit(1000000.0)

  /** Signature bits of a vector under `planes` hyperplanes for `table`. */
  def lshBucket(vec: Column, table: Int, planes: Int): Column =
    xxhash64(array((0 until planes).map { p =>
      when(aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(table, p, i)),
        lit(0.0), (acc, v) => acc + v) >= 0, 1).otherwise(0)
    }: _*), lit(table))

  /** Approximate top-k: candidates are corpus rows sharing an LSH bucket
    * with the query in ANY of `tables` hyperplane tables; candidates are
    * re-ranked exactly. Recall grows with `tables`, cost with bucket
    * sizes (`planes` controls bucket granularity). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, tables: Int = 8, planes: Int = 8): DataFrame = {
    def buckets(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(s"_zc_$id"),
        posexplode(array((0 until tables).map(t =>
          lshBucket(col(vecCol), t, planes)): _*)).as(Seq("_zc_t", "_zc_bkt")))

    val qb = buckets(queries, "qid")
    val cb = buckets(corpus, "nid")
    val cands = cb.join(broadcast(qb), Seq("_zc_t", "_zc_bkt"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), col("_zc_qid"), col("_zc_nid"))
      .distinct()
      .withColumn("sim", cosine(col("_zc_qid"), col("_zc_nid")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("int").as("rank"), col("sim"))
  }

  /** Near-duplicate pairs by embedding cosine: LSH-bucketed candidate
    * generation (all-pairs within buckets) + exact verification at
    * `threshold`. Identical vectors always share every bucket, so exact
    * duplicates have perfect recall. */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
                  tables: Int = 8, planes: Int = 8): DataFrame = {
    val b = df.select(col(idCol).as("_zc_id"), col(vecCol).as("_zc_v"),
      posexplode(array((0 until tables).map(t =>
        lshBucket(col(vecCol), t, planes)): _*)).as(Seq("_zc_t", "_zc_bkt")))
    val l = b.select(col("_zc_t"), col("_zc_bkt"), col("_zc_id").as("a"), col("_zc_v").as("_zc_va"))
    val r = b.select(col("_zc_t"), col("_zc_bkt"), col("_zc_id").as("b"), col("_zc_v").as("_zc_vb"))
    l.join(r, Seq("_zc_t", "_zc_bkt"))
      .where(col("a") < col("b"))
      .select("a", "b", "_zc_va", "_zc_vb").distinct()
      .withColumn("sim", cosine(col("_zc_va"), col("_zc_vb")))
      .where(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }
}
