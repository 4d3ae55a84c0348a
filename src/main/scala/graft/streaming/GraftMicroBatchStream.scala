package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.ParquetReadBridge
import org.apache.spark.sql.types.StructType

import graft.core.{Collection, FilterExpr}
import graft.sources.{GraftBatchScan, GraftReaderFactory}

/** DSv2 MICRO-BATCH stream over a graft collection — what
  * `spark.readStream.table("graft.db.t")` executes (r9b). Offsets,
  * pacing, manifest diffing, the compaction-rewrite skip, and filter
  * pruning all come from the PROVEN [[GraftCollectionSource]] engine
  * (`batchFiles`); this class only plans each micro-batch's file set as
  * NATIVE parquet input partitions (the same vectorized
  * [[ParquetReadBridge]] stack as the batch [[GraftBatchScan]]), so the
  * catalog's streaming face reads columnar with zero `Row` bridging.
  *
  * Options (`readStream.option(...)`), same names as `format("graft")`:
  * `maxGenerationsPerBatch`, `filters`, `startingGeneration`,
  * `startingTimestamp`. Exactly-once comes from deterministic replay:
  * offsets are manifest generations and `(start, end]` always resolves
  * to the same committed file set, so checkpoint recovery re-plans
  * byte-identical batches. */
class GraftMicroBatchStream(spark: SparkSession, root: String,
                            requiredSchema: StructType,
                            pushedAst: FilterExpr.Ast,
                            options: Map[String, String]) extends MicroBatchStream {

  private val source = new GraftCollectionSource(spark, root,
    maxGenerationsPerBatch = options.get("maxgenerationsperbatch").map(_.toLong),
    filters = options.get("filters"),
    changeFeed = false,
    startingGeneration = options.get("startinggeneration").map(_.toLong),
    startingTimestamp = options.get("startingtimestamp").map(_.toLong))

  private val collection = source.collection
  private val partCols = collection.partColumns
  private val partColSet = partCols.toSet
  private val pinned = source.pinnedDataSchema

  {
    val touched = requiredSchema.fieldNames.toSet ++ FilterExpr.names(pushedAst)
    val fills = collection.fillColumns(None).filter(touched)
    require(fills.isEmpty,
      s"readStream.table cannot serve fill-bearing column(s) ${fills.mkString(", ")} " +
        "natively — stream with spark.readStream.format(\"graft\").load(path) instead")
  }

  private val readPartitionSchema = StructType(
    requiredSchema.fields.filter(f => partColSet(f.name)))
  private val readDataSchema = StructType(
    requiredSchema.fields.filterNot(f => partColSet(f.name)))
  private val fileDataSchema = StructType(
    pinned.fields.filterNot(f => partColSet(f.name)))
  private val keyProjection: Array[Int] =
    readPartitionSchema.fieldNames.map(partCols.indexOf)

  @volatile private var lastEnd: Long = -1L

  private def toGen(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case other         => other.json.trim.toLong
  }

  override def initialOffset(): OffsetV2 = LongOffset(-1L)

  override def deserializeOffset(json: String): OffsetV2 =
    LongOffset(json.trim.toLong)

  override def latestOffset(): OffsetV2 =
    source.getOffset.map(o => LongOffset(o.json.trim.toLong): OffsetV2)
      .getOrElse(LongOffset(lastEnd))

  override def planInputPartitions(start: OffsetV2, end: OffsetV2): Array[InputPartition] = {
    val s = toGen(start)
    val e = toGen(end)
    if (e > lastEnd) lastEnd = e
    if (e < 0) return Array.empty
    val (man, diffed) = source.batchFiles(if (s < 0L) None else Some(s), e)
    val files = pushedAst match {
      case FilterExpr.True => diffed
      case ast             => collection.pruneFilesForRead(man, diffed, ast)
    }
    val native = collection.nativeFilesFor(man, files).getOrElse(
      throw new IllegalStateException(
        s"native streaming plan unavailable for $root (validated at scan build)"))
    GraftBatchScan.packByKey(spark, native, keyProjection)._1
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val inner = new GraftReaderFactory(ParquetReadBridge.readerFactory(
      spark, fileDataSchema, readDataSchema, readPartitionSchema,
      Array.empty))
    // the engine pins the streaming relation to the TABLE column order,
    // while the parquet stack emits data columns then partition columns
    val emitted = StructType(readDataSchema.fields ++ readPartitionSchema.fields)
    if (emitted == requiredSchema) inner
    else new graft.sources.PermutingReaderFactory(inner, emitted, requiredSchema)
  }

  override def commit(end: OffsetV2): Unit = ()
  override def stop(): Unit = ()
}
