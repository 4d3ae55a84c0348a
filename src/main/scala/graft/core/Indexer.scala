package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary index over a [[Collection]] — the Spark re-expression of the
  * reference's parquet-backed indexer (`zcollection/indexing/parquet.py`).
  *
  * The index is one parquet table of `(key cols…, partition cols, _start,
  * _stop, _count)` rows: for each (partition, key-tuple), the min/max
  * `_zc_row` range plus the row count. An equality query consults the
  * index (a broadcast-sized read) to learn WHICH partitions contain the
  * key, prunes the base scan to exactly those partitions, and applies the
  * key predicate — which parquet then pushes down to row groups. At 100 TB
  * the index stays tiny (|partitions| x |distinct keys|) while the scan
  * cost is proportional to matching partitions only.
  */
final class Indexer private (
    val spark: SparkSession,
    val root: String,
    val collection: Collection,
    val keys: Seq[String],
) {
  import Collection._

  private val partCols = collection.partitioning.axis

  /** The raw index table ([[Indexer.refresh]] swaps the backing dir per
    * refresh generation; legacy layouts read the original `index/`). */
  def table: DataFrame = spark.read.parquet(s"$root/$tableDir")

  private def meta(): Option[java.util.Map[String, Object]] = {
    val fs = Collection.fileSystem(spark, root)
    val p = new org.apache.hadoop.fs.Path(s"$root/${Indexer.MetaFile}")
    if (!fs.exists(p)) return None
    val in: java.io.InputStream = fs.open(p)
    try Some(new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(in, classOf[java.util.Map[String, Object]]))
    finally in.close()
  }

  private def tableDir: String =
    meta().flatMap(m => Option(m.get("dir"))).map(_.toString).getOrElse("index")

  /** Collection generation the index was built against (None for a
    * pre-generation-tracking index layout). */
  def builtAtGeneration: Option[Long] =
    meta().flatMap(m => Option(m.get("generation"))).map(_.toString.toLong)

  /** INCREMENTAL refresh: bring the index to the collection's head
    * generation by re-aggregating ONLY the partitions whose file sets
    * changed since the build — every other partition's index rows carry
    * over from the existing (tiny) index table, so refresh cost follows
    * the commits since the last build, not the collection size (the
    * reference's per-partition `update` contract, driven here by the
    * manifest diff). The combined table lands in a fresh
    * `index-g<gen>/` dir and the meta file swaps to it LAST — a crash
    * mid-refresh leaves the old index intact and consistent.
    *
    * Returns the refreshed indexer and the number of partitions
    * re-aggregated. Falls back to a full rebuild when the built-at
    * manifest is no longer readable (vacuumed past) or the index
    * predates generation tracking. */
  def refresh(): (Indexer, Int) = {
    val g1 = collection.generation
    val g0 = builtAtGeneration.getOrElse(-1L)
    if (g0 == g1) return (this, 0)

    val diff: Option[(Set[String], Seq[String])] =
      if (g0 < 0) None
      else try {
        val by0 = collection.manifestAt(g0).files.groupBy(Collection.parentRel)
          .map { case (p, fs) => p -> fs.toSet }
        val by1 = collection.manifestAt(g1).files.groupBy(Collection.parentRel)
          .map { case (p, fs) => p -> fs.toSet }
        val changed = (by0.keySet ++ by1.keySet)
          .filter(p => by0.get(p) != by1.get(p))
        Some((changed, changed.toSeq.flatMap(p => by1.getOrElse(p, Set.empty))))
      } catch { case _: Exception => None } // built-at manifest gone

    val (out, nChanged) = diff match {
      case None =>
        (Indexer.indexOf(collection.prunedRaw(FilterExpr.True), partCols, keys), -1)
      case Some((changedPaths, changedFiles)) =>
        // typed partition tuples of the OLD index rows that fall in a
        // changed partition — bounded by the partition count, like lookup
        val oldParts = table.select(partCols.map(col): _*).distinct().collect()
        val dropPreds = oldParts.toSeq.filter { r =>
          val path = collection.keyPath(
            partCols.zipWithIndex.map { case (c, i) => c -> r.get(i) })
          changedPaths.contains(path)
        }.map(r => partCols.zipWithIndex
          .map { case (c, i) => col(c) <=> lit(r.get(i)) }.reduce(_ && _))
        val keep =
          if (dropPreds.isEmpty) table
          else table.where(!dropPreds.reduce(_ || _))
        val fresh = Indexer.indexOf(
          collection.readManifestFiles(collection.manifestAt(g1), changedFiles),
          partCols, keys)
        (keep.unionByName(fresh), changedPaths.size)
    }

    val dir = s"index-g$g1"
    out.write.mode("overwrite").parquet(s"$root/$dir")
    val oldDir = tableDir
    Indexer.writeMeta(spark, root, keys, g1, Some(dir))
    if (oldDir != dir) // the swapped-out dir is dead weight, reclaim it
      try Collection.fileSystem(spark, root)
        .delete(new org.apache.hadoop.fs.Path(s"$root/$oldDir"), true)
      catch { case _: Exception => () }
    (new Indexer(spark, root, collection, keys), nChanged)
  }

  /** Raw index lookup: the `{partition path: [(start, stop), ...]}`
    * row-range map for an equality predicate (reference parquet.py:150
    * `lookup`) — the primitive [[query]] fuses with the pruned scan. */
  def lookup(eq: Map[String, Any]): Map[String, Seq[(Long, Long)]] = {
    require(eq.keySet.subsetOf(keys.toSet), s"index covers $keys, got ${eq.keySet}")
    val pred = eq.map { case (k, v) => col(k) === lit(v) }.reduce(_ && _)
    table.where(pred)
      .select((partCols.map(col) :+ col("_start") :+ col("_stop")): _*)
      .collect()
      .toSeq
      .map { r =>
        val path = collection.keyPath(
          partCols.zipWithIndex.map { case (c, i) => c -> r.get(i) })
        path -> (r.getAs[Long]("_start"), r.getAs[Long]("_stop"))
      }
      .groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).sorted }
  }

  /** Rows of the base collection matching the equality predicate, read
    * from index-selected partitions only AND sliced to the indexed
    * `_zc_row` ranges (reference parquet.py:120-210: query ->
    * {partition: ranges} -> per-partition row slicing).
    *
    * The range predicate is a disjunction of `_zc_row BETWEEN` bands over
    * a single data column — parquet pushes it to row-group zone maps, and
    * because inserts write `_zc_row` in sorted order per file, row groups
    * outside every indexed range are skipped without decoding. When the
    * index returns more than `maxRanges` entries the row bands are dropped
    * (the predicate would outweigh its pruning value) and partition
    * pruning + the key predicate carry the query alone.
    *
    * STALENESS (ADVICE r2): update()/compact() reassign row ids and
    * inserts add partitions the index has never seen, so a stale index's
    * row bands can silently EXCLUDE matching rows and its partition list
    * can miss new ones. Like [[View.query]], this fails when the base
    * moved past the build generation; `allowStale = true` opts into
    * index-age semantics — the row bands are dropped (never wrong, only
    * ever a pruning aid) and partition pruning + the key predicate run
    * against the partitions known at build time. */
  def query(eq: Map[String, Any], maxRanges: Int = 256,
            allowStale: Boolean = false): DataFrame = {
    require(eq.keySet.subsetOf(keys.toSet), s"index covers $keys, got ${eq.keySet}")
    val stale = builtAtGeneration match {
      case Some(g) if g != collection.generation =>
        if (!allowStale) throw new IllegalStateException(
          s"index at $root is stale: base is at generation ${collection.generation} " +
          s"but the index was built at $g; rebuild with Indexer.build " +
          "(or query(..., allowStale = true) for build-time semantics)")
        true
      case _ => false
    }
    val pred = eq.map { case (k, v) => col(k) === lit(v) }.reduce(_ && _)
    // Small by construction: one row per (partition, matching key tuple).
    val hits = table.where(pred)
      .select((partCols.map(col) :+ col("_start") :+ col("_stop")): _*)
      .collect()
    if (hits.isEmpty)
      return collection.query().where(lit(false))
    val partPred = hits.toSeq
      .map(r => partCols.zipWithIndex.map { case (c, i) => col(c) === lit(r.get(i)) }.reduce(_ && _))
      .distinct
      .reduce(_ || _)
    val rowId = col(Collection.RowIdCol)
    // Partition pruning always applies in full; only the row-band predicate
    // is capped (past maxRanges the giant OR costs more than it prunes) —
    // and dropped entirely for a stale index, whose bands may be wrong.
    val rowPred =
      if (stale || hits.length > maxRanges) lit(true)
      else hits.toSeq
        .map(r => rowId >= r.getAs[Long]("_start") && rowId < r.getAs[Long]("_stop"))
        .reduce(_ || _)
    // pruned at the MANIFEST level too: only the hit partitions' shards
    // load their file lists (the Column predicates still apply on top)
    val hitPaths = hits.toSeq
      .map(r => collection.keyPath(
        partCols.zipWithIndex.map { case (c, i) => c -> r.get(i) }))
      .toSet
    collection.readPartitionsRaw(hitPaths).where(partPred && rowPred && pred)
      .select(collection.schema.fieldNames.toSeq.map(col): _*)
  }
}

object Indexer {
  val MetaFile = "_graft_index.json"

  /** Walk the (optionally filtered) collection and build the index table
    * (reference parquet.py:66-118). One distributed aggregation — no
    * driver-side per-partition loop. Records the collection generation so
    * [[Indexer.query]] can detect a base rewritten after the build. */
  def build(
      spark: SparkSession,
      collection: Collection,
      keys: Seq[String],
      root: String,
      filters: String = null,
  ): Indexer = {
    val partCols = collection.partitioning.axis
    val ast = FilterExpr.parse(filters)
    val idx = indexOf(collection.prunedRaw(ast), partCols, keys)
    idx.write.mode("overwrite").parquet(s"$root/index")
    writeMeta(spark, root, keys, collection.generation, None)
    new Indexer(spark, root, collection, keys)
  }

  /** The index aggregation: per (partition, key tuple) row-range + count. */
  private[core] def indexOf(df: DataFrame, partCols: Seq[String],
                            keys: Seq[String]): DataFrame =
    df.groupBy((partCols ++ keys).map(col): _*)
      .agg(
        min(col(Collection.RowIdCol)).as("_start"),
        (max(col(Collection.RowIdCol)) + 1).as("_stop"),
        count(lit(1)).as("_count"))

  private[core] def writeMeta(spark: SparkSession, root: String, keys: Seq[String],
                              generation: Long, dir: Option[String]): Unit = {
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("generation", java.lang.Long.valueOf(generation))
    m.put("keys", new java.util.ArrayList[Object](java.util.Arrays.asList(keys: _*)))
    dir.foreach(d => m.put("dir", d))
    Collection.writeJson(Collection.fileSystem(spark, root),
      new org.apache.hadoop.fs.Path(s"$root/$MetaFile"), m)
  }

  def open(spark: SparkSession, collection: Collection, keys: Seq[String], root: String): Indexer =
    new Indexer(spark, root, collection, keys)
}
