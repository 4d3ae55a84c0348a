package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException,
  NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expression, Literal, NamedReference, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{Collection, DatePartitioning, GroupedSequencePartitioning,
  Partitioning, SequencePartitioning}

/** A DataSource-V2 catalog of graft collections: every identifier
  * `graft.<ns...>.<table>` is a collection rooted at
  * `<warehouse>/<ns...>/<table>`, namespaces are plain directories, and
  * the full SQL DDL/DML surface resolves against it with no
  * registration step:
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/graft
  *
  *   CREATE TABLE graft.db.events (ts TIMESTAMP, user_id BIGINT, ...)
  *     PARTITIONED BY (days(ts))
  *     TBLPROPERTIES ('statsColumns'='user_id', 'bloomColumns'='user_id')
  *   INSERT INTO graft.db.events SELECT ...
  *   SELECT * FROM graft.db.events VERSION AS OF 3      -- or a tag name
  *   SELECT * FROM graft.db.events TIMESTAMP AS OF '2024-06-01'
  *   DELETE FROM graft.db.events WHERE user_id = 7
  *   ALTER TABLE graft.db.events ADD COLUMN score DOUBLE
  * }}}
  *
  * The reference reaches the same operations only through its Python
  * API (collection/base.py create/insert/query/drop_partitions) — the
  * catalog is the Spark-native face of that surface. `PARTITIONED BY`
  * transforms map onto graft's partitioning strategies:
  * `years/months/days/hours/minutes/seconds(col)` → calendar
  * [[DatePartitioning]]; bare identity columns →
  * [[SequencePartitioning]]; `chunk(n, col)` (a graft transform:
  * fixed-width VALUE runs, `floor((v-start)/n)*n`) →
  * [[GroupedSequencePartitioning]]. Hash `bucket(n, col)` is refused
  * loudly — graft partitions carry zone-map intervals, which value runs
  * preserve and hash buckets would destroy. */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active

  // --- procedures (`CALL graft.system.<proc>(...)`) -----------------

  override def loadProcedure(ident: Identifier):
      org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    val ok = ident.namespace.length == 1 &&
      ident.namespace.head.equalsIgnoreCase(GraftCatalog.ProcedureNamespace)
    (if (ok) GraftProcedures.load(ident.name.toLowerCase(java.util.Locale.ROOT),
        () => spark, warehouse) else None)
      .getOrElse(throw new RuntimeException(
        s"undefined procedure $ident — known: " +
          GraftProcedures.names.map(n => s"$catalogName.system.$n").mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty ||
      (namespace.length == 1 &&
        namespace.head.equalsIgnoreCase(GraftCatalog.ProcedureNamespace)))
      GraftProcedures.names
        .map(n => Identifier.of(Array(GraftCatalog.ProcedureNamespace), n)).toArray
    else Array.empty

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' requires spark.sql.catalog.$name.warehouse"))
      .stripSuffix("/")
  }

  override def name(): String = catalogName
  override def defaultNamespace(): Array[String] = Array("default")

  /** `ALTER TABLE ... ADD CONSTRAINT` is gated on the CATALOG declaring
    * support (ResolveTableConstraints.validateCatalogForTableChange). */
  override def capabilities(): java.util.Set[TableCatalogCapability] =
    java.util.Set.of(TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  private def fs = Collection.fileSystem(spark, warehouse)

  private def checkPart(p: String): String = {
    require(p.nonEmpty && p.forall(c => c.isLetterOrDigit || "._-".contains(c)) &&
      !p.startsWith("_") && !p.startsWith("."),
      s"invalid graft catalog name part '$p' (allowed: letters, digits, '.', '_', '-'; " +
        "must not start with '_' or '.')")
    p
  }

  private def nsPath(ns: Array[String]): Path =
    new Path((warehouse +: ns.map(checkPart)).mkString("/"))

  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), checkPart(ident.name))

  private def isCollection(p: Path): Boolean =
    fs.exists(new Path(p, Collection.ConfigFile))

  // --- tables -------------------------------------------------------

  override def tableExists(ident: Identifier): Boolean =
    isCollection(tablePath(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(st => st.isDirectory && isCollection(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    if (isCollection(p)) return new GraftTable(spark, p.toString, ident.toString)
    // Iceberg-style metadata tables: `graft.db.t.history` resolves with
    // namespace [db, t] and name `history` — when db.t IS a collection,
    // serve the manifest-layer system table
    val kind = ident.name.toLowerCase(java.util.Locale.ROOT)
    if (GraftMetaTable.Kinds(kind) && ident.namespace.nonEmpty) {
      val base = nsPath(ident.namespace)
      if (isCollection(base))
        return new GraftMetaTable(spark, base.toString, ident.toString, kind)
    }
    throw new NoSuchTableException(ident)
  }

  /** `VERSION AS OF <v>`: a generation number, or a tag name (named
    * snapshots, A40). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = tablePath(ident)
    if (!isCollection(p)) throw new NoSuchTableException(ident)
    val c = Collection.open(spark, p.toString, readOnly = true)
    val gen =
      if (version.forall(_.isDigit) && version.nonEmpty) version.toLong
      else c.tags().getOrElse(version, throw new IllegalArgumentException(
        s"no tag '$version' on table $ident"))
    require(c.generations().contains(gen), s"no committed generation $gen on table $ident")
    new GraftTable(spark, p.toString, ident.toString, Some(gen))
  }

  /** `TIMESTAMP AS OF <t>` — Spark hands epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = tablePath(ident)
    if (!isCollection(p)) throw new NoSuchTableException(ident)
    val c = Collection.open(spark, p.toString, readOnly = true)
    val gen = c.generationAsOf(Math.floorDiv(timestamp, 1000L)).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot of $ident committed at or before timestamp $timestamp"))
    new GraftTable(spark, p.toString, ident.toString, Some(gen))
  }

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    val schema = org.apache.spark.sql.graftbridge.Bridge.v2ColumnsToStructType(columns)
    val p = tablePath(ident)
    if (isCollection(p)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala.toMap
    props.get(TableCatalog.PROP_LOCATION).foreach(_ => throw new IllegalArgumentException(
      "graft catalog tables are warehouse-managed; for an external path use " +
        "spark.read.format(\"graft\").load(path) / CREATE TABLE ... USING graft OPTIONS (path ...)"))
    val (axis, strategy) = GraftCatalog.toPartitioning(partitions, props.get("axis"), schema)
    val reserved = Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_COMMENT, TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_TABLE_TYPE,
      "axis", "statsColumns", "bloomColumns", "bloomNdv", "autoCompactFiles",
      "profile", "retainGenerations")
    def csv(key: String): Seq[String] =
      props.get(key).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    if (!fs.exists(p.getParent)) throw new NoSuchNamespaceException(ident.namespace)
    Collection.create(spark, p.toString, schema, axis, strategy,
      catalogEnabled = true,
      profile = props.getOrElse("profile", "local-fast"),
      attrs = props.view.filterKeys(k => !reserved.contains(k) &&
        !k.startsWith(TableCatalog.OPTION_PREFIX)).toMap,
      retainGenerations = props.get("retainGenerations").map(_.toInt).getOrElse(0),
      statsColumns = csv("statsColumns"),
      bloomColumns = csv("bloomColumns"),
      bloomNdv = csv("bloomNdv").map { kv =>
        val Array(k, v) = kv.split("=", 2); k.trim -> v.trim.toLong
      }.toMap,
      autoCompactFiles = props.get("autoCompactFiles").map(_.toInt).getOrElse(0))
    new GraftTable(spark, p.toString, ident.toString)
  }

  /** `ADD COLUMN` / `DROP COLUMN` land on the manifest schema-evolution
    * path (generation-stamped, old files read with fills); property
    * changes are refused — skip-layer declarations are create-time
    * contracts (a bloom column, for instance, only covers files written
    * after it was declared, which a mutable property would silently
    * misrepresent). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = tablePath(ident)
    if (!isCollection(p)) throw new NoSuchTableException(ident)
    val c = Collection.open(spark, p.toString)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          s"graft columns are top-level; cannot add nested ${add.fieldNames.mkString(".")}")
        c.addVariable(add.fieldNames.head, add.dataType)
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          s"graft columns are top-level; cannot drop nested ${del.fieldNames.mkString(".")}")
        c.dropVariable(del.fieldNames.head)
      // ALTER TABLE ... RENAME COLUMN old TO new — metadata-only name
      // mapping (r11): no data file rewrites, old snapshots keep their
      // own names under time travel
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames.length == 1,
          s"graft columns are top-level; cannot rename nested ${ren.fieldNames.mkString(".")}")
        c.renameVariable(ren.fieldNames.head, ren.newName)
      // ALTER TABLE ... ADD CONSTRAINT c CHECK (...) / DROP CONSTRAINT c
      // land on the manifest constraint registry — enforced inside every
      // subsequent write job, SQL or programmatic (A36)
      case add: TableChange.AddConstraint => add.constraint() match {
        case chk: org.apache.spark.sql.connector.catalog.constraints.Check =>
          c.addConstraint(chk.name,
            Option(chk.predicateSql()).getOrElse(throw new IllegalArgumentException(
              s"CHECK constraint '${chk.name}' carries no predicate SQL")))
        case other => throw new UnsupportedOperationException(
          s"graft tables support CHECK constraints; not ${other.getClass.getSimpleName}")
      }
      case drop: TableChange.DropConstraint =>
        if (!(drop.ifExists() && !c.constraints.contains(drop.name())))
          c.dropConstraint(drop.name())
      case other => throw new UnsupportedOperationException(
        s"graft tables support ADD/DROP/RENAME COLUMN and CHECK constraints; not $other")
    }
    new GraftTable(spark, p.toString, ident.toString)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    if (!isCollection(p)) false
    else fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent0: Identifier): Unit = {
    // `ALTER TABLE ... RENAME TO graft.db.t2` hands the target through
    // un-stripped — drop our own catalog name if it leads the namespace
    val newIdent =
      if (newIdent0.namespace.headOption.contains(catalogName))
        Identifier.of(newIdent0.namespace.tail, newIdent0.name)
      else newIdent0
    val from = tablePath(oldIdent)
    val to = tablePath(newIdent)
    if (!isCollection(from)) throw new NoSuchTableException(oldIdent)
    if (fs.exists(to)) throw new TableAlreadyExistsException(newIdent)
    if (!fs.exists(to.getParent)) throw new NoSuchNamespaceException(newIdent.namespace)
    if (!fs.rename(from, to))
      throw new IllegalStateException(s"rename $from -> $to failed")
  }

  // --- namespaces (plain directories) -------------------------------

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = nsPath(namespace)
    namespace.isEmpty || (fs.exists(p) && !isCollection(p))
  }

  override def listNamespaces(): Array[Array[String]] = listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = nsPath(namespace)
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    if (!fs.exists(dir)) return Array.empty
    fs.listStatus(dir)
      .filter(st => st.isDirectory && !isCollection(st.getPath) &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      .map(st => namespace :+ st.getPath.getName)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Map.of(SupportsNamespaces.PROP_LOCATION, nsPath(namespace).toString)
  }

  override def createNamespace(namespace: Array[String],
                               metadata: JMap[String, String]): Unit = {
    val p = nsPath(namespace)
    if (fs.exists(p)) throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(p)
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!namespaceExists(namespace) || namespace.isEmpty) return false
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty (use CASCADE)")
    fs.delete(p, true)
  }
}

object GraftCatalog {

  /** Namespace of the maintenance procedures: `CALL graft.system.<p>`. */
  val ProcedureNamespace = "system"

  private val DateResolutions = Map(
    "years" -> "Y", "months" -> "M", "days" -> "D",
    "hours" -> "h", "minutes" -> "m", "seconds" -> "s")

  private def refName(e: Expression): Option[String] = e match {
    case n: NamedReference if n.fieldNames.length == 1 => Some(n.fieldNames.head)
    case _ => None
  }

  private def intLit(e: Expression): Option[Int] = e match {
    case l: Literal[_] => l.value match {
      case i: java.lang.Integer => Some(i.intValue)
      case l2: java.lang.Long   => Some(l2.intValue)
      case _                    => None
    }
    case _ => None
  }

  /** `PARTITIONED BY` transforms → (axis column, graft strategy). */
  private[sources] def toPartitioning(transforms: Array[Transform],
                                      axisProp: Option[String],
                                      schema: StructType): (String, Partitioning) = {
    require(transforms.nonEmpty,
      "graft tables are partitioned along an axis: add PARTITIONED BY " +
        "(days(ts) | months(ts) | ... | <identity cols> | chunk(n, col))")
    transforms.foreach(t => require(t.name != "bucket",
      "hash bucket(n, col) destroys the zone-map intervals graft partitions carry; " +
        "use chunk(n, col) — fixed-width value runs — or identity partitioning"))

    transforms match {
      case Array(t) if DateResolutions.contains(t.name) =>
        val v = refName(t.arguments.head).getOrElse(throw new IllegalArgumentException(
          s"${t.name}() takes a single column reference"))
        val axis = axisProp.getOrElse(v)
        require(axis == v, s"calendar partitioning on '$v' implies axis '$v', not '$axis'")
        (axis, DatePartitioning(v, DateResolutions(t.name)))
      case _ =>
        require(!transforms.exists(t => DateResolutions.contains(t.name)),
          "a calendar transform must be the only PARTITIONED BY entry " +
            "(one directory level per component is derived from it)")
        val (chunks, idents) = transforms.partition(_.name == "chunk")
        require(chunks.length <= 1, "at most one chunk(n, col) transform")
        val identCols = idents.map { t =>
          require(t.name == "identity" && t.arguments.length == 1,
            s"unsupported PARTITIONED BY transform ${t.name}")
          refName(t.arguments.head).getOrElse(throw new IllegalArgumentException(
            s"unsupported PARTITIONED BY reference in $t"))
        }
        chunks.headOption match {
          case Some(t) =>
            // accept chunk(n, col) or chunk(col, n)
            val args = t.arguments
            require(args.length == 2, "chunk takes (n, col)")
            val (n, c) = (intLit(args(0)), refName(args(1)), intLit(args(1)), refName(args(0))) match {
              case (Some(n0), Some(c0), _, _) => (n0, c0)
              case (_, _, Some(n0), Some(c0)) => (n0, c0)
              case _ => throw new IllegalArgumentException("chunk takes (n, col)")
            }
            val vars = identCols.toSeq :+ c
            val axis = axisProp.getOrElse(vars.head)
            (axis, GroupedSequencePartitioning(vars, axis, n))
          case None =>
            val axis = axisProp.getOrElse(identCols.head)
            (axis, SequencePartitioning(identCols.toSeq, axis))
        }
    }
  }
}
