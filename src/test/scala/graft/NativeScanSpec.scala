package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Collection, FilterExpr}
import graft.sources.GraftBatchScan

/** The NATIVE DSv2 batch scan (round 9): catalog reads plan
  * `BatchScanExec` over Spark's vectorized parquet reader with
  * manifest-planned file sets — unlocking runtime (join-driven) file
  * pruning and storage-partitioned joins — while staying row-identical
  * to the proven V1 bridge on every query shape. */
class NativeScanSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", CatalogSpec.warehouse)
    GraftExtensions.register(s)
    s
  }

  private def sql(q: String) = spark.sql(q)

  private def withConf[T](kvs: (String, String)*)(f: => T): T = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def withV1[T](f: => T): T =
    withConf("spark.graft.nativeScan" -> "false")(f)

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** The concrete (post-AQE if adaptive) physical plan. */
  private def finalPlan(df: DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
  }

  private lazy val setup: Unit = {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.nsc")
    sql("""CREATE TABLE graft.nsc.events (ts TIMESTAMP, user_id BIGINT, v DOUBLE)
           PARTITIONED BY (days(ts)) TBLPROPERTIES ('statsColumns'='user_id')""")
    sql("""INSERT INTO graft.nsc.events VALUES
           (TIMESTAMP'2024-01-01 08:00:00', 1, 1.0),
           (TIMESTAMP'2024-01-01 09:00:00', 2, 2.0),
           (TIMESTAMP'2024-01-02 08:00:00', 3, 3.0),
           (TIMESTAMP'2024-01-02 10:00:00', 1, 3.5),
           (TIMESTAMP'2024-01-03 08:00:00', 1, 4.0)""")
  }

  test("native catalog reads plan BatchScan and match the V1 bridge on every shape") {
    setup
    val shapes = Seq(
      "SELECT * FROM graft.nsc.events",
      "SELECT v FROM graft.nsc.events WHERE user_id = 1",
      "SELECT user_id, v FROM graft.nsc.events WHERE day = 2",
      "SELECT day, user_id FROM graft.nsc.events WHERE day >= 2 AND v < 4.0",
      "SELECT ts, v FROM graft.nsc.events WHERE ts >= TIMESTAMP'2024-01-02 00:00:00'",
      "SELECT v FROM graft.nsc.events WHERE user_id = 1 OR v > 2.5",
      "SELECT year, month, day, v FROM graft.nsc.events",
      "SELECT count(*) AS c FROM graft.nsc.events WHERE v IS NOT NULL")
    for (q <- shapes)
      assert(rowsOf(sql(q)) == withV1(rowsOf(sql(q))), s"native != v1 for: $q")

    assert(sql("SELECT v FROM graft.nsc.events").queryExecution.executedPlan
      .toString.contains("BatchScan"), "native mode must plan BatchScanExec")
    assert(withV1(sql("SELECT v FROM graft.nsc.events").queryExecution.executedPlan
      .toString).contains("Scan graft"), "conf off must keep the V1 bridge")
  }

  test("claimed partition-only filters leave no engine re-filter; data filters stay residual") {
    setup
    val claimed = finalPlan(sql("SELECT user_id FROM graft.nsc.events WHERE day = 2"))
    assert(claimed.collect { case f: FilterExec => f }.isEmpty,
      s"partition-exact filter must be claimed by pruning alone:\n$claimed")
    assert(rowsOf(sql("SELECT user_id FROM graft.nsc.events WHERE day = 2")) ==
      Seq("[1]", "[3]"))

    val residual = finalPlan(sql("SELECT user_id FROM graft.nsc.events WHERE v > 3.0"))
    assert(residual.collect { case f: FilterExec => f }.nonEmpty,
      "data-column filters must be re-applied by the engine (vectorized), not in-scan")
  }

  test("metadata-only aggregates stay metadata under native mode") {
    setup
    // unfiltered + partition-filtered COUNT answer from the manifest (no scan job)
    val plan = sql("SELECT count(*) FROM graft.nsc.events WHERE day = 1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchScan"), s"filtered COUNT must stay metadata-only:\n$plan")
    assert(sql("SELECT count(*) FROM graft.nsc.events WHERE day = 1")
      .collect().head.getLong(0) == 2L)
    assert(sql("SELECT day, count(*) AS c FROM graft.nsc.events GROUP BY day ORDER BY day")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 2L), (2, 2L), (3, 1L)))
  }

  test("runtime filtering: a broadcast join on the partition key re-prunes the file list") {
    setup
    import spark.implicits._
    // the dim must be a REAL scan with a surviving selective filter — a
    // literal local relation constant-folds and DPP has nothing to prune on
    val dimPath = java.nio.file.Files.createTempDirectory("nsc-dim").toString
    Seq((1, "y"), (2, "x"), (3, "y")).toDF("day_key", "flag")
      .write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("nsc_dim")
    GraftBatchScan.lastRuntimeAst = FilterExpr.True
    GraftBatchScan.lastPlannedFiles = -1
    val df = sql("""SELECT e.user_id, e.v FROM graft.nsc.events e
                    JOIN nsc_dim d ON e.day = d.day_key WHERE d.flag = 'x'""")
    assert(rowsOf(df) == Seq("[1,3.5]", "[3,3.0]"))
    assert(GraftBatchScan.lastRuntimeAst != FilterExpr.True,
      "the dim side's key values must reach the scan as a runtime filter")
    // r10 pin: the runtime filter must have SHRUNK the planned file set,
    // not merely arrived — the executed DPP scan plans strictly fewer
    // files than the unfiltered read of the same snapshot
    val pruned = GraftBatchScan.lastPlannedFiles
    val total = { // all partitions, for comparison
      GraftBatchScan.lastPlannedFiles = -1
      sql("SELECT v FROM graft.nsc.events").collect()
      GraftBatchScan.lastPlannedFiles
    }
    assert(total >= 3)
    assert(pruned >= 1 && pruned < total,
      s"DPP must prune the file list: planned $pruned of $total files")
  }

  test("storage-partitioned join: co-partitioned tables join with zero shuffles") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.nsc")
    sql("CREATE TABLE graft.nsc.spj_a (cargo BIGINT, v DOUBLE) PARTITIONED BY (cargo)")
    sql("CREATE TABLE graft.nsc.spj_b (cargo BIGINT, w DOUBLE) PARTITIONED BY (cargo)")
    sql("INSERT INTO graft.nsc.spj_a VALUES (1, 1.0), (1, 1.5), (2, 2.0), (3, 3.0)")
    sql("INSERT INTO graft.nsc.spj_b VALUES (1, 10.0), (2, 20.0), (4, 40.0)")
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val df = sql("""SELECT a.cargo, a.v, b.w FROM graft.nsc.spj_a a
                      JOIN graft.nsc.spj_b b ON a.cargo = b.cargo""")
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case s: ShuffleExchangeExec => s }.isEmpty,
        s"co-partitioned graft tables must storage-partition-join:\n$plan")
      assert(rowsOf(df) == Seq("[1,1.0,10.0]", "[1,1.5,10.0]", "[2,2.0,20.0]"))
    }
  }

  test("AS-OF scan statistics answer at the pinned snapshot, metadata-only") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.nsc")
    sql("CREATE TABLE graft.nsc.stats_t (cargo BIGINT, v DOUBLE) PARTITIONED BY (cargo)")
    sql("INSERT INTO graft.nsc.stats_t VALUES (1, 1.0)")
    sql("INSERT INTO graft.nsc.stats_t VALUES (2, 2.0), (3, 3.0), (4, 4.0), (5, 5.0)")

    def scanStats(q: String) = sql(q).queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.stats
    }.head

    val head = scanStats("SELECT * FROM graft.nsc.stats_t")
    assert(head.rowCount.contains(BigInt(5)),
      s"head scan must advertise the manifest row rollup: ${head.rowCount}")

    // a VERSION AS OF read of the 1-row snapshot must NOT advertise the
    // head's 5 rows next to the pinned selection's bytes — numRows and
    // sizeInBytes answer at the SAME snapshot
    val pinned = scanStats("SELECT * FROM graft.nsc.stats_t VERSION AS OF 1")
    assert(pinned.rowCount.contains(BigInt(1)),
      s"AS-OF stats must answer at the pinned snapshot: ${pinned.rowCount}")
    assert(pinned.sizeInBytes < head.sizeInBytes,
      s"pinned selection bytes (${pinned.sizeInBytes}) must be below the " +
      s"head's (${head.sizeInBytes})")
  }

  test("VERSION AS OF, LIMIT, empty match, and fill fallback stay correct") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.nsc")
    sql("CREATE TABLE graft.nsc.tt (cargo BIGINT, v DOUBLE) PARTITIONED BY (cargo)")
    sql("INSERT INTO graft.nsc.tt VALUES (1, 1.0)")
    sql("INSERT INTO graft.nsc.tt VALUES (2, 2.0)")
    assert(rowsOf(sql("SELECT * FROM graft.nsc.tt VERSION AS OF 1")) == Seq("[1,1.0]"))
    assert(rowsOf(sql("SELECT * FROM graft.nsc.tt")) == Seq("[1,1.0]", "[2,2.0]"))
    assert(sql("SELECT * FROM graft.nsc.tt LIMIT 1").collect().length == 1)
    assert(sql("SELECT * FROM graft.nsc.tt WHERE cargo = 99").collect().isEmpty)

    // a fill-bearing column forces the DataFrame (coalesce) path — and
    // both faces agree on the filled values
    val c = Collection.open(spark, s"${CatalogSpec.warehouse}/nsc/tt")
    c.addVariable("q", org.apache.spark.sql.types.DoubleType, fill = Some("-1.0"))
    sql("INSERT INTO graft.nsc.tt VALUES (3, 3.0, 30.0)")
    val got = rowsOf(sql("SELECT cargo, q FROM graft.nsc.tt"))
    assert(got == withV1(rowsOf(sql("SELECT cargo, q FROM graft.nsc.tt"))))
    assert(got == Seq("[1,-1.0]", "[2,-1.0]", "[3,30.0]"))
    // columns NOT touching the fill still take the native path
    assert(sql("SELECT cargo, v FROM graft.nsc.tt").queryExecution.executedPlan
      .toString.contains("BatchScan"))
  }
}

