package graft.sources

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Collection

/** The `CALL graft.system.<proc>(...)` maintenance surface — the
  * Iceberg-procedures shape over the collection lifecycle API, so every
  * operational task a table owner runs (compaction, vacuum, retention,
  * restore, tags/branches, fsck, stats backfill) is plain SQL:
  *
  * {{{
  *   CALL graft.system.compact(table => 'db.events')
  *   CALL graft.system.compact(table => 'db.events', budget_mb => 512, coldest_first => true)
  *   CALL graft.system.vacuum(table => 'db.events', dry_run => true)
  *   CALL graft.system.expire_partitions(table => 'db.events', older_than => '2024-01-01')
  *   CALL graft.system.restore(table => 'db.events', version => 3)
  *   CALL graft.system.create_tag(table => 'db.events', tag => 'v1')
  *   CALL graft.system.fsck(table => 'db.events', deep => true)
  * }}}
  *
  * Every procedure returns a one-row summary relation (counts, not
  * silence), named arguments and defaults resolve in the engine
  * (`ProcedureParameter.defaultValue`), and `SHOW PROCEDURES` /
  * `DESCRIBE PROCEDURE` work through [[GraftCatalog.listProcedures]].
  * Reference: the reference CLI's maintenance commands (cli/main.py)
  * and Icechunk's expire/GC sessions — re-expressed as Spark 4 DSv2
  * stored procedures.
  */
private[sources] object GraftProcedures {

  /** A procedure body: takes the bound-argument row, returns the output
    * schema and its rows (already internal values). */
  private final case class Impl(name: String, description: String,
                                params: Seq[ProcedureParameter],
                                output: StructType,
                                body: (SparkSession, String, InternalRow) => Seq[InternalRow])

  private def in(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()
  private def inDefault(n: String, t: DataType, sql: String): ProcedureParameter =
    ProcedureParameter.in(n, t).defaultValue(sql).build()

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)
  private def row(vs: Any*): InternalRow = new GenericInternalRow(vs.toArray)

  /** `table` argument (`db.t` under the catalog warehouse) → an opened
    * writable collection. */
  private def open(spark: SparkSession, warehouse: String, args: InternalRow): Collection = {
    val name = args.getUTF8String(0).toString
    val parts = name.split('.')
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"invalid table name '$name' (use db.table)")
    Collection.open(spark, (warehouse +: parts.toSeq).mkString("/"))
  }

  private def strArg(args: InternalRow, i: Int): Option[String] =
    if (args.isNullAt(i)) None else Some(args.getUTF8String(i).toString)

  private val table = in("table", StringType)

  private val impls: Seq[Impl] = Seq(
    Impl("compact",
      "Rewrite fragmented partitions into axis-sorted files; budget_mb caps the " +
        "rewrite bytes (most-fragmented-first), coldest_first prefers quiescent partitions",
      Seq(table, inDefault("filter", StringType, "NULL"),
        inDefault("budget_mb", LongType, "NULL"),
        inDefault("coldest_first", BooleanType, "false")),
      StructType(Seq(StructField("rewritten_partitions", IntegerType, nullable = false))),
      (s, w, a) => {
        val c = open(s, w, a)
        val done =
          if (a.isNullAt(2)) c.compact(strArg(a, 1).orNull)
          else {
            require(a.isNullAt(1), "compact: pass either filter or budget_mb, not both")
            c.compactPartitions(
              c.compactPlan(a.getLong(2) * (1L << 20), coldestFirst = a.getBoolean(3)))
          }
        Seq(row(done.size))
      }),
    Impl("vacuum",
      "Delete unreferenced data files past the grace window; retain_hours keeps " +
        "recent snapshots readable; dry_run reports without deleting",
      Seq(table, inDefault("grace_hours", DoubleType, "24.0"),
        inDefault("retain_hours", DoubleType, "0.0"),
        inDefault("dry_run", BooleanType, "false")),
      StructType(Seq(StructField("files", IntegerType, nullable = false),
        StructField("dry_run", BooleanType, nullable = false))),
      (s, w, a) => {
        val dry = a.getBoolean(3)
        val gone = open(s, w, a).vacuum(
          graceMs = (a.getDouble(1) * 3600 * 1000).toLong,
          retainMillis = (a.getDouble(2) * 3600 * 1000).toLong,
          dryRun = dry)
        Seq(row(gone.size, dry))
      }),
    Impl("expire_partitions",
      "Metadata-only TTL: drop whole partitions whose axis upper bound predates the cutoff",
      Seq(table, in("older_than", StringType)),
      StructType(Seq(StructField("expired_partitions", IntegerType, nullable = false))),
      (s, w, a) =>
        Seq(row(open(s, w, a).expirePartitions(a.getUTF8String(1).toString).size))),
    Impl("drop_partitions",
      "Drop the partitions matching a partition-key filter expression",
      Seq(table, in("filter", StringType)),
      StructType(Seq(StructField("dropped_partitions", IntegerType, nullable = false))),
      (s, w, a) =>
        Seq(row(open(s, w, a).dropPartitions(a.getUTF8String(1).toString).size))),
    Impl("restore",
      "Roll the table back to a committed generation (a new commit; history is kept)",
      Seq(table, in("version", LongType)),
      StructType(Seq(StructField("restored_to", LongType, nullable = false))),
      (s, w, a) => {
        open(s, w, a).restore(a.getLong(1)); Seq(row(a.getLong(1)))
      }),
    Impl("create_tag",
      "Name the current (or given) generation as an immutable tag for AS OF reads",
      Seq(table, in("tag", StringType), inDefault("version", LongType, "NULL")),
      StructType(Seq(StructField("tag", StringType, nullable = false),
        StructField("version", LongType, nullable = false))),
      (s, w, a) => {
        val c = open(s, w, a)
        val gen = if (a.isNullAt(2)) -1L else a.getLong(2)
        c.tag(a.getUTF8String(1).toString, gen)
        Seq(row(a.getUTF8String(1),
          c.tags()(a.getUTF8String(1).toString)))
      }),
    Impl("create_branch",
      "Fork a zero-copy writable branch of the current state",
      Seq(table, in("branch", StringType)),
      StructType(Seq(StructField("branch", StringType, nullable = false))),
      (s, w, a) => {
        open(s, w, a).branch(a.getUTF8String(1).toString)
        Seq(row(a.getUTF8String(1)))
      }),
    Impl("fsck",
      "Verify manifest-vs-storage consistency; deep re-reads parquet footers",
      Seq(table, inDefault("deep", BooleanType, "false")),
      StructType(Seq(
        StructField("files_checked", IntegerType, nullable = false),
        StructField("missing_files", IntegerType, nullable = false),
        StructField("row_count_mismatches", IntegerType, nullable = false),
        StructField("orphan_files", IntegerType, nullable = false),
        StructField("clean", BooleanType, nullable = false))),
      (s, w, a) => {
        val r = open(s, w, a).fsck(deep = a.getBoolean(1))
        Seq(row(r.filesChecked, r.missingFiles.size, r.rowCountMismatches.size,
          r.orphanFiles.size, r.clean))
      }),
    Impl("backfill_stats",
      "Record missing per-file sizes/row counts/zone maps into the manifest (legacy files)",
      Seq(table),
      StructType(Seq(StructField("files_updated", IntegerType, nullable = false))),
      (s, w, a) => Seq(row(open(s, w, a).backfillStats()))),
    Impl("repair_catalog",
      "Rebuild the partition catalog from storage (the reference repair_catalog)",
      Seq(table),
      StructType(Seq(StructField("partitions", IntegerType, nullable = false))),
      (s, w, a) => Seq(row(open(s, w, a).repairCatalog().size))),
    Impl("zorder",
      "Rewrite partitions Z-ORDERED on the given comma-separated columns (1-4): " +
        "multi-column zone maps tighten so range filters on any listed column prune files",
      Seq(table, in("columns", StringType), inDefault("filter", StringType, "NULL")),
      StructType(Seq(StructField("rewritten_partitions", IntegerType, nullable = false))),
      (s, w, a) => {
        val c = open(s, w, a)
        val cols = a.getUTF8String(1).toString.split(',').map(_.trim).filter(_.nonEmpty)
        val paths = c.partitions(strArg(a, 2).orNull)
        Seq(row(c.compactPartitions(paths, clusterBy = cols.toSeq).size))
      }),
    Impl("create_index",
      "Build a secondary row-range index on the given comma-separated key columns " +
        "(default location: <table>/_index/<keys>)",
      Seq(table, in("keys", StringType), inDefault("index_path", StringType, "NULL")),
      StructType(Seq(StructField("index_path", StringType, nullable = false),
        StructField("generation", LongType, nullable = false))),
      (s, w, a) => {
        val c = open(s, w, a)
        val keys = a.getUTF8String(1).toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val path = strArg(a, 2).getOrElse(s"${c.root}/_index/${keys.mkString("_")}")
        graft.core.Indexer.build(s, c, keys, path)
        Seq(row(utf8(path), c.generation))
      }),
    Impl("refresh_index",
      "Incrementally refresh a secondary index: only partitions whose file sets " +
        "changed since the build re-aggregate",
      Seq(table, in("keys", StringType), inDefault("index_path", StringType, "NULL")),
      StructType(Seq(StructField("index_path", StringType, nullable = false),
        StructField("refreshed_partitions", IntegerType, nullable = false))),
      (s, w, a) => {
        val c = open(s, w, a)
        val keys = a.getUTF8String(1).toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val path = strArg(a, 2).getOrElse(s"${c.root}/_index/${keys.mkString("_")}")
        val (_, n) = graft.core.Indexer.open(s, c, keys, path).refresh()
        Seq(row(utf8(path), n))
      }))

  private val byName: Map[String, Impl] = impls.map(i => i.name -> i).toMap

  def names: Seq[String] = impls.map(_.name)

  def load(procName: String, spark: () => SparkSession,
           warehouse: String): Option[UnboundProcedure] =
    byName.get(procName).map { impl =>
      new UnboundProcedure with BoundProcedure {
        override def name(): String = impl.name
        override def description(): String = impl.description
        override def bind(inputType: StructType): BoundProcedure = this
        override def parameters(): Array[ProcedureParameter] = impl.params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): JIterator[Scan] = {
          val out = impl.body(spark(), warehouse, input)
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = out.toArray
            override def readSchema(): StructType = impl.output
            override def description(): String = s"graft procedure ${impl.name}"
          }).iterator()
        }
      }
    }
}
