package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.ann.{CosineSim, LshBuckets, VecDot, VecMaxAbs, VecQuantizeInt8, VecQuantizeMae}
import graft.dedup.{MinHashSig, SimHash64}
import graft.functions.{CharShingleHashes, Fnv1a64, ShingleHashes}

/** Session extensions registering graft's custom Catalyst expressions for
  * SQL use:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *   spark.sql("SELECT fnv1a64(text) FROM docs")
  *   spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  *   spark.sql("SELECT minhash_sig(shingles, 64) FROM ...")
  *   spark.sql("SELECT lsh_buckets(embedding, 8, 12, 64) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.All.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    // restore reported statistics to V1-bridged catalog scans (the
    // auto-broadcast input Spark's V1ScanWrapper drops) — runs after
    // the V2 pushdown rules
    e.injectPreCBORule(_ => org.apache.spark.sql.graftbridge.RestoreV1ScanStatistics)
    // SQL UPDATE / MERGE INTO / row-level DELETE over graft tables:
    // Spark rewrites these only for SupportsRowLevelOperations tables,
    // so the post-hoc rule lowers them onto the collection engine
    // (analysis-time injection only — like Delta, DML requires
    // spark.sql.extensions at session build)
    e.injectPostHocResolutionRule(session => graft.sources.GraftDmlRule(session))
  }
}

/** Runtime registration for sessions that already exist (extensions only
  * apply at builder time). */
object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  /** name -> expression builder for every native graft expression. */
  val All: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fnv1a64" -> ((exprs: Seq[Expression]) => Fnv1a64(exprs.head)),
    "simhash64" -> ((exprs: Seq[Expression]) => SimHash64(exprs.head)),
    "minhash_sig" -> ((exprs: Seq[Expression]) =>
      MinHashSig(exprs.head, intArg(exprs(1), "minhash_sig"))),
    "vec_dot" -> ((exprs: Seq[Expression]) => VecDot(exprs.head, exprs(1))),
    "shingle_hashes" -> ((exprs: Seq[Expression]) =>
      ShingleHashes(exprs.head, intArg(exprs(1), "shingle_hashes"))),
    "char_shingle_hashes" -> ((exprs: Seq[Expression]) =>
      CharShingleHashes(exprs.head, intArg(exprs(1), "char_shingle_hashes"))),
    "cosine_sim" -> ((exprs: Seq[Expression]) => CosineSim(exprs.head, exprs(1))),
    "vec_max_abs" -> ((exprs: Seq[Expression]) => VecMaxAbs(exprs.head)),
    "repetition_stats" -> ((exprs: Seq[Expression]) =>
      graft.functions.RepetitionStats(exprs.head)),
    "vec_quantize_int8" -> ((exprs: Seq[Expression]) => VecQuantizeInt8(exprs.head, exprs(1))),
    "vec_quantize_mae" -> ((exprs: Seq[Expression]) =>
      VecQuantizeMae(exprs.head, exprs(1), exprs(2))),
    "lsh_buckets" -> ((exprs: Seq[Expression]) => LshBuckets(
      exprs.head,
      intArg(exprs(1), "lsh_buckets"), intArg(exprs(2), "lsh_buckets"),
      intArg(exprs(3), "lsh_buckets"),
      if (exprs.length > 4) intArg(exprs(4), "lsh_buckets") else 0)),
    "scaled_long" -> ((exprs: Seq[Expression]) =>
      graft.functions.DoubleToScaledLong(exprs.head, intArg(exprs(1), "scaled_long"))),
  )

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    All.foreach { case (name, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, builder)
    }
    // the runtime analogue of injectPreCBORule (extensions only apply
    // at builder time); the "User Provided Optimizers" batch runs after
    // the V2 pushdown rules, which is all the stats restore needs
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(org.apache.spark.sql.graftbridge.RestoreV1ScanStatistics))
      spark.experimental.extraOptimizations =
        extra :+ org.apache.spark.sql.graftbridge.RestoreV1ScanStatistics
  }
}
