package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Overlay of extra variables on top of a read-only base [[Collection]] —
  * the Spark re-expression of the reference's `zcollection/view/base.py`.
  *
  * The overlay is its own parquet tree, partitioned by the SAME partition
  * columns as the base, holding only `(partition cols, _zc_row, overlay
  * cols)`. Row alignment uses the base's hidden `_zc_row` (per-partition
  * row number materialized at insert), the positional analogue of the
  * reference's per-partition array alignment. `query` equi-joins base and
  * overlay on `(partition cols, _zc_row)` — a key that is co-partitioned
  * by construction, so at scale the join shuffles evenly and can be
  * bucket-collocated; the base's data files are never rewritten.
  */
final class View private (
    val spark: SparkSession,
    val root: String,
    val base: Collection,
) {
  import Collection._

  private val partCols: Seq[String] = base.partitioning.axis

  /** Overlay data lives under a subdir so the view root can also hold
    * `_graft_view.json` without confusing partition discovery. */
  private def dataDir: String = s"$root/overlay"

  /** Compute overlay variables: `fn` receives the base scan (data +
    * partition cols + `_zc_row`) and must return it with extra columns;
    * only the extra columns are persisted (reference view/base.py:318-409). */
  def update(fn: DataFrame => DataFrame): Unit = {
    val baseDf = base.readRaw()
    val out = fn(baseDf)
    val newCols = out.columns.filterNot(baseDf.columns.contains)
    require(newCols.nonEmpty, "view update must add at least one new column")
    val overlay = out.select((partCols ++ Seq(RowIdCol) ++ newCols).map(col): _*)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try overlay.write.partitionBy(partCols: _*).mode("overwrite").parquet(dataDir)
    finally prev.foreach(spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
  }

  /** Base + overlay, aligned by `(partition cols, _zc_row)`
    * (reference view/base.py:232-316). */
  def query(filters: String = null, variables: Seq[String] = null): DataFrame = {
    val ast = FilterExpr.parse(filters)
    val b = base.readRaw().where(FilterExpr.toColumn(ast))
    val fsys = Collection.fileSystem(spark, root)
    val (joined, overlayCols) =
      if (!fsys.exists(new Path(dataDir))) (b, Seq.empty[String])
      else {
        val o = spark.read.parquet(dataDir)
        val oCast = partCols.foldLeft(o)((d, c) =>
          d.withColumn(c, col(c).cast(base.partitioning.colType(c, base.schema))))
        val cols = o.columns.filterNot(c => partCols.contains(c) || c == RowIdCol).toSeq
        (b.join(oCast, partCols :+ RowIdCol, "left"), cols)
      }
    val out = joined.select((base.schema.fieldNames.toSeq ++ overlayCols).map(col): _*)
    if (variables != null) out.select(variables.map(col): _*) else out
  }
}

object View {
  val ConfigFile = "_graft_view.json"

  /** Create a view overlaying `base`, rooted at `root`
    * (reference view/base.py:84-151). */
  def create(spark: SparkSession, root: String, base: Collection, overwrite: Boolean = false): View = {
    val fs = Collection.fileSystem(spark, root)
    val cfg = new Path(s"$root/$ConfigFile")
    if (fs.exists(cfg) && !overwrite)
      throw new IllegalStateException(s"a view already exists at $root")
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("version", Integer.valueOf(1))
    m.put("base", base.root)
    Collection.writeJson(fs, cfg, m)
    new View(spark, root, base)
  }

  /** Open an existing view; the base collection is reopened read-only from
    * the URI recorded at create time (reference view/base.py:152-193). */
  def open(spark: SparkSession, root: String): View = {
    val fs = Collection.fileSystem(spark, root)
    val cfg = new Path(s"$root/$ConfigFile")
    if (!fs.exists(cfg)) throw new IllegalStateException(s"no view found at $root")
    val in: java.io.InputStream = fs.open(cfg)
    val doc =
      try new ObjectMapper().readValue(in, classOf[java.util.Map[String, Object]])
      finally in.close()
    val base = Collection.open(spark, doc.get("base").toString, readOnly = true)
    new View(spark, root, base)
  }
}
