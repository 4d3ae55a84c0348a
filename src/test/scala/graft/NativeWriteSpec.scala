package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Collection

/** r10 native DSv2 batch write: `INSERT INTO graft.db.t` runs as a real
  * `AppendData` — executor tasks write final parquet files directly
  * (zero renames), `commit()` publishes one atomic manifest generation —
  * with row-identical results to the V1 bridge it replaces, and the V1
  * fallback preserved for CHECK-constrained tables and
  * `spark.graft.nativeWrite=false`. */
class NativeWriteSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", CatalogSpec.warehouse)
    GraftExtensions.register(s)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.nw")
    s
  }

  private def sql(q: String) = spark.sql(q)

  private def srcView(n: Int, name: String): Unit =
    spark.range(n).selectExpr(
      "timestampadd(HOUR, CAST(id * 5 AS INT), TIMESTAMP'2024-01-01 00:00:00') AS ts",
      "id AS user_id", "id * 1.5 AS v").createOrReplaceTempView(name)

  test("INSERT INTO plans a native AppendData and matches the V1 bridge row-for-row") {
    srcView(2000, "nw_src")
    sql("CREATE TABLE graft.nw.native_t (ts TIMESTAMP, user_id BIGINT, v DOUBLE) PARTITIONED BY (months(ts))")
    sql("CREATE TABLE graft.nw.v1_t (ts TIMESTAMP, user_id BIGINT, v DOUBLE) PARTITIONED BY (months(ts))")

    val ins = sql("INSERT INTO graft.nw.native_t SELECT * FROM nw_src")
    val plan = ins.queryExecution.executedPlan.toString
    assert(plan.contains("AppendData") && !plan.contains("AppendDataExecV1"),
      s"expected a native AppendData plan:\n$plan")

    spark.conf.set("spark.graft.nativeWrite", "false")
    try {
      val insV1 = sql("INSERT INTO graft.nw.v1_t SELECT * FROM nw_src")
      assert(insV1.queryExecution.executedPlan.toString.contains("AppendDataExecV1"),
        "conf off must pin the V1 write bridge")
    } finally spark.conf.set("spark.graft.nativeWrite", "true")

    val a = sql("SELECT * FROM graft.nw.native_t ORDER BY ts, user_id")
      .collect().map(_.toString).toSeq
    val b = sql("SELECT * FROM graft.nw.v1_t ORDER BY ts, user_id")
      .collect().map(_.toString).toSeq
    assert(a.size == 2000 && a == b,
      "native and V1 writes must produce row-identical tables")

    // both paths feed the same manifest machinery: recorded per-file
    // rows/stats make metadata COUNT and zone-map pruning work
    assert(sql("SELECT COUNT(*) FROM graft.nw.native_t").collect().head.getLong(0) == 2000)
    val cNat = Collection.open(spark, s"${CatalogSpec.warehouse}/nw/native_t", readOnly = true)
    val cV1 = Collection.open(spark, s"${CatalogSpec.warehouse}/nw/v1_t", readOnly = true)
    assert(cNat.partitions() == cV1.partitions(),
      "native writes must land in the same Hive partition layout")
    // zone maps recorded: an axis-range read prunes below the full file set
    val all = cNat.query().inputFiles.length
    val pruned = cNat.query("ts >= '2024-12-25 00:00:00'").inputFiles.length
    assert(pruned > 0 && pruned < all,
      s"native-written files must carry prunable zone maps ($pruned vs $all)")
  }

  test("a second INSERT appends atomically; INSERT OVERWRITE truncates to the new snapshot") {
    srcView(100, "nw_src2")
    // retention keeps replaced files for the time-travel check below
    // (retainGenerations=0 would GC them at the overwrite commit)
    sql("""CREATE TABLE graft.nw.life_t (ts TIMESTAMP, user_id BIGINT, v DOUBLE)
           PARTITIONED BY (months(ts)) TBLPROPERTIES ('retainGenerations'='5')""")
    sql("INSERT INTO graft.nw.life_t SELECT * FROM nw_src2")
    sql("INSERT INTO graft.nw.life_t SELECT timestampadd(HOUR, CAST(id AS INT), TIMESTAMP'2024-01-01 00:00:00'), id + 1000, 0.5 FROM range(50)")
    assert(sql("SELECT COUNT(*) FROM graft.nw.life_t").collect().head.getLong(0) == 150)
    // generation per commit, CDC-visible like any other writer
    val c = Collection.open(spark, s"${CatalogSpec.warehouse}/nw/life_t", readOnly = true)
    assert(c.generation >= 2, "each INSERT must commit one generation")

    val ow = sql("INSERT OVERWRITE graft.nw.life_t SELECT TIMESTAMP'2030-06-01 00:00:00', 7, 7.0 FROM range(3)")
    val owPlan = ow.queryExecution.executedPlan.toString
    assert(!owPlan.contains("ExecV1"), s"overwrite must run natively too:\n$owPlan")
    val left = sql("SELECT DISTINCT user_id FROM graft.nw.life_t").collect().map(_.getLong(0)).toSeq
    assert(left == Seq(7L), "truncate-overwrite must replace every pre-existing partition")
    // the pre-overwrite snapshot stays time-travelable
    val gens = Collection.open(spark, s"${CatalogSpec.warehouse}/nw/life_t", readOnly = true).generations()
    assert(sql(s"SELECT COUNT(*) FROM graft.nw.life_t VERSION AS OF ${gens(gens.length - 2)}")
      .collect().head.getLong(0) == 150)
  }

  test("CHECK constraints enforce IN the native tasks (r10b) — no V1 fallback") {
    sql("CREATE TABLE graft.nw.con_t (ts TIMESTAMP, user_id BIGINT, v DOUBLE) PARTITIONED BY (days(ts))")
    val w = Collection.open(spark, s"${CatalogSpec.warehouse}/nw/con_t")
    w.addConstraint("v_pos", "v >= 0")

    val ins = sql("INSERT INTO graft.nw.con_t SELECT TIMESTAMP'2024-01-01 00:00:00', 1, 2.0")
    assert(!ins.queryExecution.executedPlan.toString.contains("ExecV1"),
      "a CHECK-constrained table must stay on the native write")
    assert(sql("SELECT COUNT(*) FROM graft.nw.con_t").collect().head.getLong(0) == 1)
    // ANSI NULL passes — the V1 guard's coalesce(.., true) semantics
    sql("INSERT INTO graft.nw.con_t SELECT TIMESTAMP'2024-01-03 00:00:00', 3, CAST(NULL AS DOUBLE)")
    assert(sql("SELECT COUNT(*) FROM graft.nw.con_t").collect().head.getLong(0) == 2)
    val err = intercept[Exception](
      sql("INSERT INTO graft.nw.con_t SELECT TIMESTAMP'2024-01-02 00:00:00', 2, -5.0"))
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(err).contains("v_pos"),
      s"the failure must name the constraint: ${messages(err)}")
    assert(sql("SELECT COUNT(*) FROM graft.nw.con_t").collect().head.getLong(0) == 2,
      "a violating insert must not commit")
    // dynamic overwrite now works on constrained tables (it used to
    // refuse at analysis on the V1-fallback path)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try sql("INSERT OVERWRITE graft.nw.con_t SELECT TIMESTAMP'2024-01-01 00:00:00', 9, 9.0")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val users = sql("SELECT user_id FROM graft.nw.con_t ORDER BY user_id")
      .collect().map(_.getLong(0)).toSeq
    assert(users == Seq(3L, 9L),
      s"dynamic overwrite must replace only the touched day partition: $users")
  }

  test("INSERT INTO ... REPLACE WHERE: partition-aligned overwrite-by-expression (r10)") {
    sql("""CREATE TABLE graft.nw.rw_t (grp BIGINT, pos BIGINT, v DOUBLE)
           PARTITIONED BY (grp) TBLPROPERTIES ('axis'='pos')""")
    sql("""INSERT INTO graft.nw.rw_t VALUES
           (1, 1, 1.0), (1, 2, 1.5), (2, 3, 2.0), (2, 4, 2.5), (3, 5, 3.0)""")
    val genBefore = Collection.open(spark,
      s"${CatalogSpec.warehouse}/nw/rw_t", readOnly = true).generation

    val rw = sql("""INSERT INTO graft.nw.rw_t REPLACE WHERE grp = 2
                    SELECT 2L, 99L, 9.9 UNION ALL SELECT 2L, 100L, 9.8""")
    assert(!rw.queryExecution.executedPlan.toString.contains("ExecV1"))
    val got = sql("SELECT grp, pos, v FROM graft.nw.rw_t ORDER BY pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 1L, 1.0), (1L, 2L, 1.5), (3L, 5L, 3.0),
      (2L, 99L, 9.9), (2L, 100L, 9.8)),
      s"REPLACE WHERE must replace exactly the grp=2 partition: $got")
    // one atomic generation for the whole delete+insert
    val c = Collection.open(spark, s"${CatalogSpec.warehouse}/nw/rw_t", readOnly = true)
    assert(c.generation == genBefore + 1, "replace-where is ONE commit")

    // a data-column predicate cannot be partition-decided — loud refusal
    val err = intercept[Exception](
      sql("INSERT INTO graft.nw.rw_t REPLACE WHERE v > 2.0 SELECT 9L, 9L, 0.0"))
    assert(err.getMessage != null)
    assert(sql("SELECT COUNT(*) FROM graft.nw.rw_t").collect().head.getLong(0) == 5,
      "a refused replace-where must not mutate anything")
    // new rows may land OUTSIDE the replaced partitions (ANSI overwrite
    // semantics: delete matching, insert all new rows)
    sql("INSERT INTO graft.nw.rw_t REPLACE WHERE grp = 3 SELECT 4L, 200L, 4.0")
    val after = sql("SELECT grp FROM graft.nw.rw_t ORDER BY grp")
      .collect().map(_.getLong(0)).toSeq
    assert(after == Seq(1L, 1L, 2L, 2L, 4L), s"got $after")
  }

  test("REPLACE WHERE under a null partition key: SQL three-valued logic, not a refusal") {
    sql("""CREATE TABLE graft.nw.rwn_t (grp BIGINT, pos BIGINT, v DOUBLE)
           PARTITIONED BY (grp) TBLPROPERTIES ('axis'='pos')""")
    sql("""INSERT INTO graft.nw.rwn_t VALUES
           (1, 1, 1.0), (2, 2, 2.0), (CAST(NULL AS BIGINT), 3, 3.0)""")

    // `grp = 1` on the null-keyed partition is UNKNOWN for every row —
    // definitively NOT selected, so the partition is KEPT, not refused
    sql("INSERT INTO graft.nw.rwn_t REPLACE WHERE grp = 1 SELECT 1L, 10L, 1.1")
    val kept = sql("SELECT pos FROM graft.nw.rwn_t ORDER BY pos")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L, 3L, 10L),
      s"null-keyed partition must survive an unrelated REPLACE WHERE: $kept")

    // `grp IS NULL` selects every row of exactly that partition
    sql("INSERT INTO graft.nw.rwn_t REPLACE WHERE grp IS NULL " +
      "SELECT CAST(NULL AS BIGINT), 20L, 0.3")
    val afterNull = sql("SELECT grp, pos FROM graft.nw.rwn_t ORDER BY pos")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1))).toSeq
    assert(afterNull == Seq((2L, 2L), (1L, 10L), (-1L, 20L)),
      s"IS NULL must replace exactly the null partition: $afterNull")

    // a negation around the null key stays three-valued: NOT(grp = 9)
    // is UNKNOWN on the null partition (kept), TRUE elsewhere (replaced)
    sql("INSERT INTO graft.nw.rwn_t REPLACE WHERE NOT (grp = 9) SELECT 5L, 30L, 5.0")
    val afterNot = sql("SELECT grp, pos FROM graft.nw.rwn_t ORDER BY pos")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1))).toSeq
    assert(afterNot == Seq((-1L, 20L), (5L, 30L)),
      s"NOT(grp = 9) must keep ONLY the null partition: $afterNot")
  }

  test("capabilities() is IO-free after first probe and never throws on a stale handle") {
    import org.apache.spark.sql.connector.catalog.TableCapability
    val root = SparkTestSession.tmp("graft-caps")
    val df = spark.range(3).selectExpr(
      "timestampadd(HOUR, CAST(id AS INT), TIMESTAMP'2024-01-01 00:00:00') AS ts",
      "id AS v")
    val c = graft.core.Collection.create(spark, root, df.schema, "ts",
      graft.core.DatePartitioning("ts", "D"))
    c.insert(df)

    // a handle whose collection was concurrently REPARTITIONED: analysis
    // of a plain SELECT probes capabilities() — it must not throw, and
    // must fall back to the always-correct V1 write side
    val table = new graft.sources.GraftTable(spark, root, "caps_t", None)
    table.schema() // force the handle open BEFORE the concurrent repartition
    graft.core.Collection.open(spark, root)
      .changePartitioning(graft.core.DatePartitioning("ts", "h"))
    val caps = table.capabilities()
    assert(caps.contains(TableCapability.V1_BATCH_WRITE) &&
      !caps.contains(TableCapability.OVERWRITE_DYNAMIC),
      s"a stale handle must advertise the V1 bridge, not throw: $caps")
    // cached: repeated probes return the same set without re-probing IO
    assert(table.capabilities() == caps)
  }

  test("identity (sequence) partition keys: Hive escaping and null sentinel round-trip") {
    sql("""CREATE TABLE graft.nw.seq_t (k STRING, pos BIGINT, payload DOUBLE)
           PARTITIONED BY (k) TBLPROPERTIES ('axis'='pos')""")
    spark.sql("""SELECT * FROM VALUES
        ('plain', 1L, 1.0), ('a=b/c d', 2L, 2.0), ('pct%25', 3L, 3.0),
        (CAST(NULL AS STRING), 4L, 4.0), ('plain', 5L, 5.0)
        AS t(k, pos, payload)""").createOrReplaceTempView("nw_seq_src")
    val ins = sql("INSERT INTO graft.nw.seq_t SELECT * FROM nw_seq_src")
    assert(!ins.queryExecution.executedPlan.toString.contains("ExecV1"),
      "string identity keys are native-writable")
    val back = sql("SELECT k, pos, payload FROM graft.nw.seq_t ORDER BY pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(back == Seq(("plain", 1L, 1.0), ("a=b/c d", 2L, 2.0), ("pct%25", 3L, 3.0),
      (null, 4L, 4.0), ("plain", 5L, 5.0)),
      s"escaped/null partition values must round-trip exactly: $back")
    // and a filter on the identity key still prunes to its directory
    assert(sql("SELECT COUNT(*) FROM graft.nw.seq_t WHERE k = 'a=b/c d'")
      .collect().head.getLong(0) == 1)
  }
}
