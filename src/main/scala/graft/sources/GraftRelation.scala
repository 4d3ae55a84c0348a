package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.core.{Collection, FilterExpr}

/** V1 batch relation over a graft collection — the plain-Spark surface:
  * {{{
  *   spark.read.format("graft").load(root).where("user_id = 7")
  *   // or register and use SQL:
  *   spark.read.format("graft").load(root).createOrReplaceTempView("events")
  * }}}
  * Catalyst pushes its data-source `Filter`s here; the supported subset
  * compiles to the [[FilterExpr]] skip stack, so the scan prunes
  * subtrees → partitions → zone-mapped files → bloom-checked files
  * exactly like [[Collection.query]] — SQL users get the full metadata
  * pruning without graft's own API. Every filter is also left for the
  * engine to re-apply ([[unhandledFilters]] returns all), so a filter
  * the translation cannot express costs pruning, never correctness. */
class GraftRelation(override val sqlContext: SQLContext, root: String)
    extends BaseRelation with PrunedFilteredScan {

  private val collection =
    Collection.open(sqlContext.sparkSession, root, readOnly = true)

  /** Data + partition-derived columns: `WHERE day = 3` is first-class
    * SQL and prunes at the partition layer. The hidden row id stays
    * hidden. */
  override val schema: StructType = StructType(
    collection.readSchema.fields.filterNot(_.name == Collection.RowIdCol))

  /** The internal scan already produces InternalRows. */
  override def needConversion: Boolean = false

  /** Our filters only PRUNE; the engine re-applies everything. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val ast = GraftRelation.toAst(filters, schema.fieldNames.toSet)
    GraftRelation.lastScanAst = ast // test observable
    val df = collection.scanWithAst(ast)
      .select(requiredColumns.map(col).toSeq: _*)
    df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

object GraftRelation {
  private type Ast = FilterExpr.Ast

  /** Last pushed-down AST — spec observable for the pruning contract. */
  @volatile private[graft] var lastScanAst: Ast = FilterExpr.True

  /** Catalyst source filters → FilterExpr, best-effort: the top-level
    * array is a conjunction, so unconvertible members simply drop
    * (prune less, never wrong). INSIDE a conversion the translation is
    * exact-or-None — a weakened subtree under `Or`/`Not` would prune
    * wrongly. */
  private[graft] def toAst(fs: Array[Filter], known: Set[String]): Ast =
    fs.flatMap(f => conv(f, known))
      .reduceOption(FilterExpr.And(_, _)).getOrElse(FilterExpr.True)

  /** Literals in FilterExpr's domain (Long / Double / String); anything
    * else (timestamp, date, decimal, binary) refuses the conversion. */
  private def litOf(v: Any): Option[Any] = v match {
    case null       => None
    case i: Int     => Some(i.toLong)
    case l: Long    => Some(l)
    case s: Short   => Some(s.toLong)
    case b: Byte    => Some(b.toLong)
    case f: Float   => Some(f.toDouble)
    case d: Double  => Some(d)
    case s: String  => Some(s)
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    case _          => None
  }

  private def cmp(op: String, a: String, v: Any, known: Set[String]): Option[Ast] =
    if (!known(a)) None
    else litOf(v).map(x => FilterExpr.Cmp(op, FilterExpr.Name(a), FilterExpr.Lit(x)))

  private def conv(f: Filter, known: Set[String]): Option[Ast] = f match {
    case EqualTo(a, v)            => cmp("==", a, v, known)
    case GreaterThan(a, v)        => cmp(">", a, v, known)
    case GreaterThanOrEqual(a, v) => cmp(">=", a, v, known)
    case LessThan(a, v)           => cmp("<", a, v, known)
    case LessThanOrEqual(a, v)    => cmp("<=", a, v, known)
    case In(a, vs) if known(a) =>
      val ls = vs.toSeq.map(litOf)
      if (ls.nonEmpty && ls.forall(_.isDefined))
        Some(FilterExpr.In(a, ls.flatten, negated = false))
      else None
    case IsNull(a) if known(a)    => Some(FilterExpr.IsNull(a, negated = false))
    case IsNotNull(a) if known(a) => Some(FilterExpr.IsNull(a, negated = true))
    case And(l, r) =>
      for (cl <- conv(l, known); cr <- conv(r, known)) yield FilterExpr.And(cl, cr)
    case Or(l, r) =>
      for (cl <- conv(l, known); cr <- conv(r, known)) yield FilterExpr.Or(cl, cr)
    case Not(x) => conv(x, known).map(FilterExpr.Not(_))
    case _      => None
  }
}
