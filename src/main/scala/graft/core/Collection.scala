package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.jdk.CollectionConverters._

/** A partitioned parquet collection — the Spark-native re-expression of the
  * reference's `zcollection.Collection` (collection/base.py:81-803).
  *
  * Design (NOT a port): partitions are Hive-style parquet directories
  * (`year=2024/month=3/...`) under `root`, so Spark's own source handles
  * partition discovery, pruning, predicate pushdown, column pruning and
  * vectorized reads. The reference's bespoke machinery maps as follows:
  *
  *  - insert + merge strategies  -> dynamic-partition-overwrite writes that
  *    only ever read/rewrite the colliding partitions ([[MergeStrategy]]);
  *  - query(filters, variables)  -> pruned scan + projection; the filter
  *    mini-language compiles to a Catalyst predicate over partition columns
  *    ([[FilterExpr]]), so pruning happens in the planner — no directory
  *    walk on the read path, which is what survives 10^6 partitions;
  *  - `_immutable/` group        -> a small parquet broadcast-joined into
  *    every read (reference base.py:819-836);
  *  - `_catalog/state.json`      -> same idea: a partition-path list
  *    maintained on insert/drop so `partitions()` skips the O(N) walk
  *    (reference base.py:340-375);
  *  - map/update                 -> transforms over the pruned scan written
  *    back via dynamic partition overwrite (touched partitions only).
  *
  * A hidden `_zc_row` column (row number by axis order within each
  * partition, materialized at write time) gives [[View]] overlays a stable
  * positional join key, mirroring the reference's positional alignment.
  */
final class Collection private (
    val spark: SparkSession,
    val root: String,
    val schema: StructType,
    val axis: String,
    val partitioning: Partitioning,
    val catalogEnabled: Boolean,
    val readOnly: Boolean,
    val profile: CodecProfile,
    /** Free-form collection metadata (reference: Dataset.attrs persisted
      * in the root config). */
    val attrs: Map[String, String],
) {
  import Collection._

  private val partCols: Seq[String] = partitioning.axis

  private def fs: FileSystem = fileSystem(spark, root)

  private def requireWritable(): Unit =
    if (readOnly) throw new IllegalStateException(s"collection at $root is read-only")

  // --- insert ------------------------------------------------------

  /** Insert `df`, splitting it by the partitioning. Default (`Replace`)
    * overwrites colliding partitions wholesale; other strategies combine
    * with the existing content. Returns the partition paths written. */
  def insert(df: DataFrame, merge: MergeStrategy = MergeStrategy.Replace): Seq[String] = {
    requireWritable()
    val assigned = partitioning.assign(df)
    val incomingKeys = assigned
      .select(partCols.map(col): _*).distinct().collect()
      .map(r => partCols.zipWithIndex.map { case (c, i) => c -> r.get(i) })
      .toSeq

    val existing = partitionKeySet()
    val colliding = incomingKeys.filter(k => existing.contains(keyPath(k)))

    val toWrite: DataFrame =
      if (merge == MergeStrategy.Replace || colliding.isEmpty) assigned
      else {
        val collidePred = keyPredicate(colliding)
        val existingColliding = readRaw().where(collidePred).drop(RowIdCol)
          .select(assigned.columns.toSeq.map(col): _*)
        val incColliding = assigned.where(collidePred)
        val incNew = assigned.where(!collidePred)
        merge(existingColliding, incColliding, axis, partCols)
          .unionByName(incNew)
      }

    write(toWrite)
    val written = incomingKeys.map(keyPath).sorted
    if (catalogEnabled) catalogAdd(written)
    written
  }

  /** Write the small non-axis dataset to `_immutable/`; it is merged back
    * into every read (single-row datasets attach as constant columns via a
    * broadcast cross join — tiny by construction, like the reference's
    * immutable group). */
  def writeImmutable(df: DataFrame): Unit = {
    requireWritable()
    df.coalesce(1).write.mode("overwrite").parquet(s"$root/$ImmutableDir")
  }

  private def write(df: DataFrame): Unit = {
    // Row-id ordering: axis first, then a deterministic hash tiebreak over
    // the SCALAR columns only — hashing wide array/struct payloads (e.g. a
    // 240-float swath) would dominate the insert cost for no extra
    // stability in practice.
    val scalarCols = schema.fields
      .filterNot(f => f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType
           | _: org.apache.spark.sql.types.StructType
           | _: org.apache.spark.sql.types.MapType
           | org.apache.spark.sql.types.BinaryType => true
        case _ => false
      })
      .map(f => col(f.name)).toSeq
    val tiebreak =
      if (scalarCols.nonEmpty) xxhash64(scalarCols: _*) else lit(0L)
    // Cluster one partition per task (file consolidation), sort locally by
    // axis (parquet zone maps), then assign unique ids in that order.
    // monotonically_increasing_id over the clustered+sorted layout gives
    // the same stable positional key as a row_number window at a fraction
    // of the cost (no WindowExec pass over the full insert).
    val withRow = df
      .repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols.map(col) :+ col(axis) :+ tiebreak): _*)
      .withColumn(RowIdCol, monotonically_increasing_id())
    val prev = spark.conf.getOption(OverwriteModeKey)
    spark.conf.set(OverwriteModeKey, "dynamic")
    if (profile.compression == "zstd")
      spark.sparkContext.hadoopConfiguration
        .setInt("parquet.compression.codec.zstd.level", profile.zstdLevel)
    try
      withRow
        .write.partitionBy(partCols: _*)
        .option("compression", profile.compression)
        .mode("overwrite")
        .parquet(root)
    finally prev.foreach(spark.conf.set(OverwriteModeKey, _))
  }

  // --- read --------------------------------------------------------

  /** Raw partitioned scan: data columns + partition columns + `_zc_row`,
    * with partition columns re-cast to their declared types. Empty-schema
    * safe when no partition exists yet. */
  def readRaw(): DataFrame = {
    if (partitionPaths().isEmpty) {
      val full = StructType(schema.fields ++ partCols.map(c =>
        org.apache.spark.sql.types.StructField(c, partitioning.colType(c, schema))) :+
        org.apache.spark.sql.types.StructField(RowIdCol, org.apache.spark.sql.types.LongType))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
    }
    val df = spark.read.parquet(root)
    partCols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(partitioning.colType(c, schema))))
  }

  /** Read matching partitions, reference base.py:526-595. `filters` is the
    * partition-filter expression; `variables` an optional projection. The
    * result carries exactly the declared data columns (partition-derived
    * columns and `_zc_row` dropped), with the immutable dataset attached. */
  def query(filters: String = null, variables: Seq[String] = null): DataFrame = {
    val ast = FilterExpr.parse(filters)
    var df = readRaw().where(FilterExpr.toColumn(ast))
    // restore declared column order; drop derived partition cols + row id
    df = df.select(schema.fieldNames.toSeq.map(col): _*)
    df = attachImmutable(df)
    if (variables != null) df = df.select(variables.map(col): _*)
    df
  }

  private def attachImmutable(df: DataFrame): DataFrame = {
    val immPath = new Path(s"$root/$ImmutableDir")
    if (!fs.exists(immPath)) return df
    val imm = spark.read.parquet(immPath.toString)
    val keep = imm.columns.filterNot(df.columns.contains) // data wins on conflict
    if (keep.isEmpty) return df
    val immSel = imm.select(keep.toSeq.map(col): _*)
    if (immSel.count() == 1) df.crossJoin(broadcast(immSel))
    else df // multi-row immutable data is exposed via `immutable()` instead
  }

  /** The `_immutable/` dataset, if any. */
  def immutable(): Option[DataFrame] = {
    val p = new Path(s"$root/$ImmutableDir")
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  // --- listing -----------------------------------------------------

  /** Relative partition paths matching `filters`, sorted by decoded key
    * (reference base.py:302-338). Uses the catalog when enabled. */
  def partitions(filters: String = null): Seq[String] = {
    val ast = FilterExpr.parse(filters)
    partitionPaths()
      .flatMap(p => decodePath(p).map(k => (p, k)))
      .filter { case (_, k) => FilterExpr.eval(ast, k.toMap) }
      .sortWith { case ((_, a), (_, b)) => keyLess(a, b) }
      .map(_._1)
  }

  private def partitionPaths(): Seq[String] = {
    if (catalogEnabled) {
      catalogRead() match {
        case Some(paths) => return paths
        case None        => ()
      }
    }
    walkPartitions()
  }

  private def walkPartitions(): Seq[String] = {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return Nil
    def walk(dir: Path, depth: Int): Seq[String] = {
      val children = fs.listStatus(dir).toSeq
        .filter(_.isDirectory)
        .map(_.getPath)
        .filter(p => p.getName.contains("=") && !p.getName.startsWith("_"))
      if (depth == 1) children.map(p => relativize(rootPath, p))
      else children.flatMap(c => walk(c, depth - 1))
    }
    walk(rootPath, partCols.length).sorted
  }

  /** Rebuild the catalog by walking the store (reference base.py:352-375). */
  def repairCatalog(): Seq[String] = {
    requireWritable()
    require(catalogEnabled, "repairCatalog() requires a catalog-enabled collection")
    val walked = walkPartitions()
    catalogWrite(walked)
    walked
  }

  // --- drop --------------------------------------------------------

  /** Delete matching partitions; returns the removed paths
    * (reference base.py:599-634). */
  def dropPartitions(filters: String = null): Seq[String] = {
    requireWritable()
    val doomed = partitions(filters)
    doomed.foreach { rel =>
      fs.delete(new Path(s"$root/$rel"), true)
      // prune now-empty parent directories up to the root
      var parent = new Path(s"$root/$rel").getParent
      val rootPath = new Path(root)
      while (parent != null && parent != rootPath && fs.exists(parent) &&
             fs.listStatus(parent).isEmpty) {
        fs.delete(parent, false)
        parent = parent.getParent
      }
    }
    if (catalogEnabled) catalogRemove(doomed)
    doomed
  }

  // --- map / update ------------------------------------------------

  /** Apply `fn` to each matching partition's dataset on the driver and
    * collect the results, mirroring reference base.py:638-696. For
    * distributed per-partition work prefer [[transformPartitions]] or a
    * plain `groupBy` over the partition columns. */
  def map[A](fn: DataFrame => A, filters: String = null): Seq[(String, A)] =
    partitions(filters).map { p =>
      val df = spark.read.parquet(s"$root/$p").drop(RowIdCol)
      p -> fn(attachImmutable(df))
    }

  /** Distributed per-partition transform: `fn` sees data + partition
    * columns; the result streams through Catalyst untouched. */
  def transformPartitions(fn: DataFrame => DataFrame, filters: String = null): DataFrame = {
    val ast = FilterExpr.parse(filters)
    fn(readRaw().where(FilterExpr.toColumn(ast)).drop(RowIdCol))
  }

  /** Read matching partitions, apply `fn`, write the result back —
    * rewriting ONLY the touched partitions (reference base.py:698-794;
    * like the reference, `fn` must not move rows across partitions).
    *
    * When `variables` is given, `fn` sees only those columns (plus they
    * are the only ones it may change); unlike the reference — which drops
    * unloaded variables from disk on such an update — the remaining
    * columns are carried through unchanged by re-joining on the stable
    * `_zc_row` key, so a projected update can never lose data. */
  def update(
      fn: DataFrame => DataFrame,
      filters: String = null,
      variables: Seq[String] = null,
  ): Seq[String] = {
    requireWritable()
    val ast = FilterExpr.parse(filters)
    val prunedRaw = readRaw().where(FilterExpr.toColumn(ast))
    val out: DataFrame =
      if (variables == null) {
        val pruned = prunedRaw.select(schema.fieldNames.toSeq.map(col): _*)
        fn(attachImmutable(pruned)).select(schema.fieldNames.toSeq.map(col): _*)
      } else {
        require(variables.nonEmpty, "variables must be non-empty when given")
        val loaded = prunedRaw.select((RowIdCol +: variables).map(col): _*)
        val updated = fn(attachImmutable(loaded))
          .select((RowIdCol +: variables).map(col): _*)
        val rest = prunedRaw.select(
          (RowIdCol +: schema.fieldNames.filterNot(variables.contains).toSeq).map(col): _*)
        rest.join(updated, RowIdCol)
          .select(schema.fieldNames.toSeq.map(col): _*)
      }
    write(partitioning.assign(out))
    partitions(filters)
  }

  // --- catalog internals -------------------------------------------

  private def catalogStatePath = new Path(s"$root/$CatalogDir/state.json")

  private def catalogRead(): Option[Seq[String]] = {
    if (!fs.exists(catalogStatePath)) return None
    val in: java.io.InputStream = fs.open(catalogStatePath)
    try {
      val doc = new ObjectMapper().readValue(in, classOf[java.util.Map[String, Object]])
      Some(doc.get("paths").asInstanceOf[java.util.List[Object]].asScala.map(_.toString).toSeq)
    } finally in.close()
  }

  private def catalogWrite(paths: Seq[String]): Unit = {
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("paths", new java.util.ArrayList[Object](paths.sorted.asJava))
    writeJson(fs, catalogStatePath, m)
  }

  private def catalogAdd(paths: Seq[String]): Unit =
    catalogWrite((catalogRead().getOrElse(Nil) ++ paths).distinct)

  private def catalogRemove(paths: Seq[String]): Unit =
    catalogWrite(catalogRead().getOrElse(Nil).filterNot(paths.toSet))

  // --- key helpers -------------------------------------------------

  private def keyPath(key: Seq[(String, Any)]): String =
    key.map { case (c, v) => s"$c=$v" }.mkString("/")

  private def keyPredicate(keys: Seq[Seq[(String, Any)]]): Column =
    keys.map(k => k.map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)).reduce(_ || _)

  private def partitionKeySet(): Set[String] = partitionPaths().toSet

  private def decodePath(path: String): Option[Seq[(String, Any)]] = {
    val segs = path.split("/").toSeq
    if (segs.length != partCols.length) return None
    val kvs = segs.map { s =>
      val i = s.indexOf('=')
      if (i < 0) return None
      val (n, v) = (s.substring(0, i), s.substring(i + 1))
      n -> (scala.util.Try(v.toLong).getOrElse(v): Any)
    }
    if (kvs.map(_._1) == partCols) Some(kvs) else None
  }

  private def keyLess(a: Seq[(String, Any)], b: Seq[(String, Any)]): Boolean = {
    a.zip(b).foreach { case ((_, x), (_, y)) =>
      val c = (x, y) match {
        case (l: Long, r: Long)     => java.lang.Long.compare(l, r)
        case (l: String, r: String) => l.compareTo(r)
        case _                      => x.toString.compareTo(y.toString)
      }
      if (c != 0) return c < 0
    }
    false
  }
}

object Collection {
  val ConfigFile = "_graft.json"
  val CatalogDir = "_catalog"
  val ImmutableDir = "_immutable"
  /** Hidden per-partition row number, the positional key for View overlays. */
  val RowIdCol = "_zc_row"
  private val OverwriteModeKey = "spark.sql.sources.partitionOverwriteMode"

  /** Create a new collection rooted at `root` (reference base.py:161-234). */
  def create(
      spark: SparkSession,
      root: String,
      schema: StructType,
      axis: String,
      partitioning: Partitioning,
      catalogEnabled: Boolean = false,
      overwrite: Boolean = false,
      profile: String = "local-fast",
      attrs: Map[String, String] = Map.empty,
  ): Collection = {
    val fs = fileSystem(spark, root)
    val cfg = new Path(s"$root/$ConfigFile")
    if (fs.exists(cfg) && !overwrite)
      throw new IllegalStateException(s"a collection already exists at $root")
    if (overwrite && fs.exists(new Path(root))) fs.delete(new Path(root), true)
    require(schema.fieldNames.contains(axis), s"axis '$axis' is not a column of the schema")

    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("version", Integer.valueOf(1))
    m.put("axis", axis)
    m.put("schema", schema.toDDL)
    m.put("partitioning", partitioning.toJsonMap)
    m.put("catalog", java.lang.Boolean.valueOf(catalogEnabled))
    m.put("profile", profile)
    val attrsMap = new java.util.LinkedHashMap[String, Object]()
    attrs.foreach { case (k, v) => attrsMap.put(k, v) }
    m.put("attrs", attrsMap)
    writeJson(fs, cfg, m)
    new Collection(spark, root, schema, axis, partitioning, catalogEnabled,
      readOnly = false, CodecProfile(profile), attrs)
  }

  /** Open an existing collection (reference base.py:236-271). */
  def open(spark: SparkSession, root: String, readOnly: Boolean = false): Collection = {
    val fs = fileSystem(spark, root)
    val cfg = new Path(s"$root/$ConfigFile")
    if (!fs.exists(cfg))
      throw new IllegalStateException(s"no collection found at $root")
    val in: java.io.InputStream = fs.open(cfg)
    val doc =
      try new ObjectMapper().readValue(in, classOf[java.util.Map[String, Object]])
      finally in.close()
    val schema = StructType.fromDDL(doc.get("schema").toString)
    val partitioning = Partitioning.fromJsonMap(
      doc.get("partitioning").asInstanceOf[java.util.Map[String, Object]])
    val profile = Option(doc.get("profile")).map(_.toString).getOrElse("local-fast")
    val attrs = Option(doc.get("attrs"))
      .map(_.asInstanceOf[java.util.Map[String, Object]].asScala.map {
        case (k, v) => k -> String.valueOf(v)
      }.toMap)
      .getOrElse(Map.empty[String, String])
    new Collection(
      spark, root, schema, doc.get("axis").toString, partitioning,
      catalogEnabled = doc.get("catalog").asInstanceOf[java.lang.Boolean],
      readOnly = readOnly, profile = CodecProfile(profile), attrs = attrs)
  }

  private[core] def fileSystem(spark: SparkSession, root: String): FileSystem =
    FileSystem.get(new Path(root).toUri, spark.sparkContext.hadoopConfiguration)

  private[core] def writeJson(fs: FileSystem, path: Path, value: Object): Unit = {
    val out = fs.create(path, true)
    try out.write(new ObjectMapper().writerWithDefaultPrettyPrinter().writeValueAsBytes(value))
    finally out.close()
  }

  private[core] def relativize(root: Path, p: Path): String = {
    val rootUri = root.toUri.getPath.stripSuffix("/")
    p.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
  }
}
