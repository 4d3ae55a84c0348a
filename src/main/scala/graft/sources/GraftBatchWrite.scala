package graft.sources

import java.util.UUID

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.graftbridge.{Bridge, ParquetWriteBridge}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import graft.core.Collection

/** NATIVE DSv2 batch write for the graft catalog face (r10) — the
  * write-side mirror of the E36 native scan: `INSERT INTO graft.db.t`
  * plans as a real `AppendData` (no `V1Write -> InsertableRelation`
  * Row-bridge seam), executor tasks stream [[InternalRow]]s through
  * Spark's own parquet writer directly into their FINAL files under the
  * collection root (the [[graft.core.DirectWriteProtocol]] zero-rename
  * shape — file visibility is governed by the manifest, so crash/abort
  * leftovers are unreferenced files vacuum reclaims), task commits
  * report the exact file set, and `commit()` publishes ONE atomic
  * manifest generation via the same commit/conflict/GC path every other
  * writer uses.
  *
  * Layout parity with the V1 path: [[RequiresDistributionAndOrdering]]
  * demands a RANGE distribution + intra-task sort on the partitioning's
  * input columns then the axis — exactly
  * `Collection.prepareForWrite`'s `repartitionByRange(partCols, axis)`
  * expressed over data columns (every partition key derivation is
  * monotone in its source column, so sorting by source groups each
  * Hive directory into one contiguous run and each task holds ONE open
  * parquet writer at a time — bounded memory at any partition fan-out).
  * Row ids reproduce the V1 formula
  * `(taskBase + sparkPartitionId) << 33 + rowIndex`.
  *
  * Fallback contract (the read-side claim discipline, mirrored): a
  * partition-column type the native path cannot format byte-identically
  * to Spark's dynamic-partition committer falls back to the proven V1
  * write — a correctness escape, not an optimization.
  * `spark.graft.nativeWrite=false` pins every write to the V1 bridge.
  * CHECK constraints are NOT a fallback (r10b): the tasks evaluate the
  * V1 guard's exact NULL-passes boolean per row, codegen'd, and raise
  * naming the constraint — which keeps dynamic overwrite, REPLACE
  * WHERE, and streaming writes available on constrained tables.
  *
  * Reference behavior: zcollection's insert writes Zarr chunks then
  * commits an Icechunk snapshot referencing exactly those chunk keys
  * (collection/base.py:218-320, store/icechunk_store.py); this is that
  * two-phase shape on Spark's DSv2 write protocol. */
class GraftNativeWrite(spark: SparkSession, collection: Collection,
                       spec: Collection.NativeWriteSpec, mode: String,
                       inputSchema: StructType,
                       replaceAst: graft.core.FilterExpr.Ast = null,
                       /** Re-open a WRITABLE handle — the streaming leg
                         * refreshes its snapshot per epoch. */
                       reopen: () => Collection = null,
                       /** The exactly-once idempotence key for the
                         * streaming leg (`streamName` option |
                         * `checkpointLocation` | query id). */
                       streamName: String = null)
    extends Write with RequiresDistributionAndOrdering {

  // range-cluster + sort on (partitioning inputs, axis): the data-column
  // expression of prepareForWrite's (partCols, axis) — derivations are
  // monotone in their inputs, so directory runs are contiguous per task
  private val orderCols: Seq[String] =
    (collection.partitioning.identityCols ++ collection.partitioning.inputCols ++
      Seq(collection.axis)).distinct

  private val sortOrders: Array[SortOrder] = orderCols.map(c =>
    Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray

  override def requiredDistribution(): Distribution = Distributions.ordered(sortOrders)
  override def requiredOrdering(): Array[SortOrder] = sortOrders
  // 0 = engine-chosen (session shuffle partitions, AQE-coalescible) —
  // parallelism follows the data volume, like the V1 range repartition
  override def requiredNumPartitions(): Int = 0

  override def description(): String =
    s"GraftNativeWrite(${collection.root}, gen=${spec.generation}, mode=$mode)"

  override def toBatch: BatchWrite =
    new GraftNativeBatchWrite(spark, collection, spec, mode, inputSchema, replaceAst)

  /** `df.writeStream.toTable("graft.db.t")` (r10) — the NATIVE
    * exactly-once streaming sink on the catalog face: each micro-batch's
    * tasks stream parquet into final files (the same writer factory as
    * the batch leg, rebuilt per epoch against the epoch's head snapshot
    * so row-id task bases never collide across epochs), and
    * `commit(epochId)` publishes ONE atomic generation carrying the
    * `(streamName, epochId)` high-water mark — Spark's at-least-once
    * epoch replay after a failure or restart is detected against the
    * committed mark and skipped, the [[Collection.insertStreamBatch]]
    * idempotence contract without the V1 Row bridge. Append mode
    * appends; Complete mode (`truncate()`) replaces the table every
    * epoch. */
  override def toStreaming: StreamingWrite = {
    require(mode == "append" || mode == "truncate",
      s"streaming writes support Append and Complete output modes, not '$mode'")
    require(reopen != null && streamName != null,
      "streaming write requires a reopenable table handle") // catalog face only
    new GraftNativeStreamingWrite(spark, reopen, mode, inputSchema, streamName)
  }
}

/** The streaming half of [[GraftNativeWrite]]. One instance serves the
  * whole query run; Spark calls `createStreamingWriterFactory` then
  * `commit(epochId, ...)` strictly in sequence per micro-batch, so the
  * per-epoch (collection, spec) pair lives in a volatile field set at
  * factory-build time and read at commit. */
class GraftNativeStreamingWrite(spark: SparkSession, reopen: () => Collection,
                                mode: String, inputSchema: StructType,
                                streamName: String)
    extends StreamingWrite {

  @volatile private var epoch: (Collection, Collection.NativeWriteSpec) = null

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    // per-EPOCH snapshot: generation + row-id task base advance with the
    // collection, so epoch N+1's ids never collide with epoch N's rows
    val c = reopen()
    // NOTE: a CHECK constraint added mid-stream is picked up here — the
    // NEXT epoch's tasks enforce the new set (constraints ride the spec)
    val spec = c.nativeWriteSpec().getOrElse(throw new IllegalStateException(
      s"collection ${c.root} stopped being natively writable mid-stream " +
      "(partitioning changed concurrently?) — restart the query"))
    epoch = (c, spec)
    val f = GraftNativeBatchWrite.writerFactory(spark, c, spec, inputSchema)
    new StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
                                epochId: Long): DataWriter[InternalRow] =
        f.createWriter(partitionId, taskId)
    }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val (c, spec) = epoch
    val files = messages.flatMap {
      case GraftNativeCommit(fs) => fs
      case other => throw new IllegalStateException(s"unexpected commit message $other")
    }.toSeq.sorted
    if (c.streamHighWaterMark(streamName).exists(_ >= epochId)) {
      // a replayed epoch another run already committed (the checkpoint's
      // commit log lagged the sink): the just-written duplicates were
      // never published — remove them
      c.dropUncommittedFiles(files)
    } else {
      // the mark commits ATOMICALLY with the files; a racing zombie run
      // committing the same epoch loses in the rebase guard (loudly),
      // never lands twice
      c.commitNativeWrite(spec.generation, files, mode,
        streamMark = Some(streamName -> epochId))
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val e = epoch
    if (e != null) e._1.dropUncommittedFiles(messages.collect {
      case GraftNativeCommit(fs) => fs
    }.toSeq.flatten)
  }
}

class GraftNativeBatchWrite(spark: SparkSession, collection: Collection,
                            spec: Collection.NativeWriteSpec, mode: String,
                            inputSchema: StructType,
                            replaceAst: graft.core.FilterExpr.Ast = null)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftNativeBatchWrite.writerFactory(spark, collection, spec, inputSchema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.flatMap {
      case GraftNativeCommit(fs) => fs
      case other => throw new IllegalStateException(s"unexpected commit message $other")
    }.toSeq.sorted
    collection.commitNativeWrite(spec.generation, files, mode, replaceAst)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    collection.dropUncommittedFiles(messages.collect {
      case GraftNativeCommit(fs) => fs
    }.toSeq.flatten)
}

object GraftNativeBatchWrite {
  /** Build the executor writer factory for one job or one streaming
    * epoch — shared by the batch and streaming legs. Resolves the
    * partition-key derivations ONCE on the driver: runs the
    * partitioning's own assign() over an empty frame of the input
    * schema, collapses the analyzed withColumn Projects, and binds each
    * partition column's expression to input ordinals — the executors
    * evaluate exactly what the V1 write job would have evaluated
    * (session timezone and casts resolved by the analyzer). */
  private[sources] def writerFactory(spark: SparkSession, collection: Collection,
                                     spec: Collection.NativeWriteSpec,
                                     inputSchema: StructType): GraftWriterFactory = {
    val df0 = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], inputSchema)
    val assigned = collection.partitioning.assign(df0)
    val (byName, baseAttrs) = ParquetWriteBridge.collapseProjects(Bridge.analyzed(assigned))
    val partExprs = ParquetWriteBridge.boundProjection(
      spec.partCols.map(c => byName.getOrElse(c, throw new IllegalStateException(
        s"partitioning did not derive expected column '$c'"))), baseAttrs)
    // file content = input columns minus identity partition columns
    // (moved into the directory name, like partitionBy), plus the row id
    val keptIdx = inputSchema.fields.toSeq.zipWithIndex
      .filterNot { case (f, _) => spec.identityCols.contains(f.name) }
    val outExprs: Seq[Expression] = keptIdx.map { case (f, i) =>
      BoundReference(i, f.dataType, f.nullable)
    }
    val fileSchema = StructType(
      keptIdx.map(_._1) :+ StructField(Collection.RowIdCol, LongType, nullable = false))
    val conf = ParquetWriteBridge.writeConf(spark, fileSchema,
      spec.compression, spec.zstdLevel, spec.bloomCols, spec.bloomNdv)
    // CHECK constraints (r10b): compile each predicate ONCE on the
    // driver into the V1 guard's exact boolean — `coalesce(expr(sql)
    // .cast("boolean"), true)` (ANSI: NULL passes) — bound to input
    // ordinals; the tasks evaluate codegen'd per row and raise naming
    // the constraint, plus a to_json(struct(*)) rendering of the
    // offending row, the constraintGuard message shape
    val checkExprs: Seq[Expression] =
      if (spec.constraints.isEmpty) Nil
      else {
        import org.apache.spark.sql.functions.{coalesce, expr, lit, struct, to_json}
        val guarded = df0.select(
          spec.constraints.zipWithIndex.map { case ((_, sql), i) =>
            coalesce(expr(sql).cast("boolean"), lit(true)).as(s"__check_$i")
          } :+ to_json(struct(inputSchema.fieldNames.toSeq.map(
            org.apache.spark.sql.functions.col): _*)).as("__check_row"): _*)
        val (byName2, baseAttrs2) = ParquetWriteBridge.collapseProjects(
          Bridge.analyzed(guarded))
        ParquetWriteBridge.boundProjection(
          (spec.constraints.indices.map(i => byName2(s"__check_$i"))
            :+ byName2("__check_row")).map(ParquetWriteBridge.replaceRuntime),
          baseAttrs2)
      }
    GraftWriterFactory(collection.root, new SerializableConfiguration(conf),
      partExprs, spec.partCols, spec.partColTypes, outExprs, spec.taskBase,
      spec.compression, UUID.randomUUID().toString,
      checkExprs, spec.constraints)
  }
}

/** Files (root-relative) one committed task wrote. */
case class GraftNativeCommit(files: Seq[String]) extends WriterCommitMessage

case class GraftWriterFactory(root: String, conf: SerializableConfiguration,
                              partExprs: Seq[Expression], partCols: Seq[String],
                              partColTypes: Seq[DataType], outExprs: Seq[Expression],
                              taskBase: Long, compression: String, jobUuid: String,
                              /** Bound CHECK guards: one boolean per
                                * constraint, then the row's JSON
                                * rendering (violation message). */
                              checkExprs: Seq[Expression] = Nil,
                              checkConstraints: Seq[(String, String)] = Nil)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(this, partitionId, taskId)
}

/** One task's writer: rows arrive sorted so each Hive directory is a
  * contiguous run — exactly one parquet writer is open at any moment.
  * Speculative attempts are arbitrated by Spark's commit coordinator
  * (only one attempt's files reach `commit()`); a losing or crashed
  * attempt's files are unreferenced and reclaimed by vacuum. */
class GraftDataWriter(f: GraftWriterFactory, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val partProj = ParquetWriteBridge.unsafeProjection(f.partExprs)
  private val outProj = ParquetWriteBridge.unsafeProjection(f.outExprs)
  // CHECK guards: booleans (never null — coalesced true) + row JSON
  private val checkProj =
    if (f.checkExprs.isEmpty) null
    else ParquetWriteBridge.unsafeProjection(f.checkExprs)
  private val idRow = new GenericInternalRow(1)
  private val joined = new JoinedRow
  private var rowId: Long = (f.taskBase + partitionId) << 33
  private var writer: org.apache.spark.sql.execution.datasources.parquet.ParquetOutputWriter = null
  private var fileSeq = 0
  private val files = ArrayBuffer.empty[String]

  private val ext =
    if (f.compression.toLowerCase == "none") ".parquet"
    else s".${f.compression.toLowerCase}.parquet"

  private def partitionDir(vals: InternalRow): String =
    f.partCols.indices.map { i =>
      val s: String =
        if (vals.isNullAt(i)) null
        else f.partColTypes(i) match {
          case StringType => vals.getUTF8String(i).toString
          case LongType   => vals.getLong(i).toString
          case IntegerType => vals.getInt(i).toString
          case ShortType  => vals.getShort(i).toString
          case ByteType   => vals.getByte(i).toString
          case DateType   => java.time.LocalDate.ofEpochDay(vals.getInt(i)).toString
          case other => throw new IllegalStateException(
            s"unsupported native-write partition type $other") // gated at planning
        }
      ParquetWriteBridge.partitionPathSegment(f.partCols(i), s)
    }.mkString("/")

  private def roll(dir: String): Unit = {
    if (writer != null) writer.close()
    val name = f"part-$partitionId%05d-${f.jobUuid}-t$taskId-c$fileSeq$ext"
    fileSeq += 1
    val rel = s"$dir/$name"
    files += rel
    writer = ParquetWriteBridge.newWriter(f.conf.value,
      new Path(f.root, rel).toString, partitionId, taskId)
  }

  /** The last roll's partition key (a defensive copy — `partProj`
    * reuses its buffer). The demanded sort makes each Hive directory a
    * contiguous run, so the per-row cost is one UnsafeRow bytes-compare;
    * the per-column value formatting + path escaping in [[partitionDir]]
    * runs only when the key actually changes. */
  private var currentKey: InternalRow = null

  override def write(row: InternalRow): Unit = {
    if (checkProj != null) {
      val v = checkProj(row)
      var i = 0
      while (i < f.checkConstraints.length) {
        if (!v.getBoolean(i)) {
          val (name, sql) = f.checkConstraints(i)
          // the task fails -> the job aborts -> nothing commits; same
          // atomic-refusal contract (and message shape) as the V1
          // write's raise_error guard
          throw new IllegalStateException(
            s"CHECK constraint '$name' violated: ($sql) is false for row " +
            v.getUTF8String(f.checkConstraints.length))
        }
        i += 1
      }
    }
    val key = partProj(row)
    if (currentKey == null || key != currentKey) {
      roll(partitionDir(key))
      currentKey = key.copy()
    }
    idRow.setLong(0, rowId)
    rowId += 1
    writer.write(joined(outProj(row), idRow).asInstanceOf[InternalRow])
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) { writer.close(); writer = null }
    GraftNativeCommit(files.toSeq)
  }

  override def abort(): Unit = {
    if (writer != null) {
      try writer.close() catch { case _: Exception => () }
      writer = null
    }
    val fs = new Path(f.root).getFileSystem(f.conf.value)
    files.foreach { rel =>
      try fs.delete(new Path(f.root, rel), false) catch { case _: Exception => () }
    }
  }

  override def close(): Unit =
    if (writer != null) { writer.close(); writer = null }
}
