package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Collection

/** `CALL graft.system.<proc>(...)` — the SQL maintenance surface
  * (round 9): compaction, vacuum, retention, restore, tags/branches,
  * fsck, stats backfill as DSv2 stored procedures with named arguments,
  * defaults, and one-row summary results. */
class ProceduresSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", CatalogSpec.warehouse)
    GraftExtensions.register(s)
    s
  }

  private def sql(q: String) = spark.sql(q)
  private def path(t: String) = s"${CatalogSpec.warehouse}/${t.replace('.', '/')}"

  private def mk(t: String): Unit = {
    sql(s"CREATE TABLE graft.$t (cargo BIGINT, v DOUBLE) PARTITIONED BY (cargo)")
    sql(s"INSERT INTO graft.$t VALUES (1, 1.0), (2, 2.0)")
    sql(s"INSERT INTO graft.$t VALUES (1, 1.5), (2, 2.5)")
    sql(s"INSERT INTO graft.$t VALUES (1, 1.7)")
  }

  test("compact rewrites fragmented partitions; named args and summary row") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    mk("proc.cmp")
    val before = Collection.open(spark, path("proc.cmp"), readOnly = true)
      .describeFiles().count()
    val done = sql("CALL graft.system.compact(table => 'proc.cmp')").collect()
    assert(done.head.getInt(0) == 2) // both partitions were fragmented
    val after = Collection.open(spark, path("proc.cmp"), readOnly = true)
    assert(after.describeFiles().count() < before)
    assert(sql("SELECT count(*) FROM graft.proc.cmp").collect().head.getLong(0) == 5)

    // budgeted form: coldest-first knapsack instead of a filter
    mk("proc.cmp2")
    val b = sql(
      "CALL graft.system.compact(table => 'proc.cmp2', budget_mb => 64, coldest_first => true)")
      .collect()
    assert(b.head.getInt(0) >= 1)
    intercept[Exception](sql(
      "CALL graft.system.compact(table => 'proc.cmp2', filter => 'cargo == 1', budget_mb => 1)")
      .collect())
  }

  test("vacuum: dry run counts, zero-grace delete reclaims post-compaction leftovers") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    mk("proc.vac")
    sql("CALL graft.system.compact(table => 'proc.vac')")
    val dry = sql(
      "CALL graft.system.vacuum(table => 'proc.vac', grace_hours => 0.0, dry_run => true)")
      .collect().head
    assert(dry.getBoolean(1) && dry.getInt(0) >= 0)
    val real = sql("CALL graft.system.vacuum(table => 'proc.vac', grace_hours => 0.0)")
      .collect().head
    assert(!real.getBoolean(1))
    assert(sql("SELECT count(*) FROM graft.proc.vac").collect().head.getLong(0) == 5)
  }

  test("create_tag + AS OF, restore, create_branch") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    sql("CREATE TABLE graft.proc.tt (cargo BIGINT, v DOUBLE) PARTITIONED BY (cargo)")
    sql("INSERT INTO graft.proc.tt VALUES (1, 1.0)")
    val tagged = sql("CALL graft.system.create_tag(table => 'proc.tt', tag => 'v1')")
      .collect().head
    assert(tagged.getString(0) == "v1" && tagged.getLong(1) == 1L)
    sql("INSERT INTO graft.proc.tt VALUES (2, 2.0)")
    assert(sql("SELECT count(*) FROM graft.proc.tt VERSION AS OF 'v1'")
      .collect().head.getLong(0) == 1)

    assert(sql("CALL graft.system.restore(table => 'proc.tt', version => 1)")
      .collect().head.getLong(0) == 1L)
    assert(sql("SELECT count(*) FROM graft.proc.tt").collect().head.getLong(0) == 1)

    assert(sql("CALL graft.system.create_branch(table => 'proc.tt', branch => 'dev')")
      .collect().head.getString(0) == "dev")
    assert(Collection.open(spark, path("proc.tt"), readOnly = true)
      .branches().contains("dev"))
  }

  test("drop_partitions, fsck, backfill_stats, repair_catalog summaries") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    mk("proc.maint")
    assert(sql("CALL graft.system.drop_partitions(table => 'proc.maint', filter => 'cargo == 2')")
      .collect().head.getInt(0) == 1)
    assert(sql("SELECT count(*) FROM graft.proc.maint").collect().head.getLong(0) == 3)

    val f = sql("CALL graft.system.fsck(table => 'proc.maint', deep => true)").collect().head
    assert(f.getBoolean(4), s"fsck must be clean: $f")
    assert(f.getInt(0) > 0 && f.getInt(1) == 0)

    // identity-partitioned files carry no axis column in their footers,
    // so those stay statless and re-examine — the count is "examined"
    assert(sql("CALL graft.system.backfill_stats(table => 'proc.maint')")
      .collect().head.getInt(0) >= 0)
    assert(sql("CALL graft.system.repair_catalog(table => 'proc.maint')")
      .collect().head.getInt(0) >= 0)
  }

  test("zorder, create_index, refresh_index procedures") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    sql("""CREATE TABLE graft.proc.zi (ts TIMESTAMP, user_id BIGINT, v DOUBLE)
           PARTITIONED BY (days(ts))""")
    sql("""INSERT INTO graft.proc.zi VALUES
           (TIMESTAMP'2024-01-01 08:00:00', 5, 1.0),
           (TIMESTAMP'2024-01-01 09:00:00', 2, 2.0),
           (TIMESTAMP'2024-01-02 08:00:00', 9, 3.0)""")
    assert(sql("CALL graft.system.zorder(table => 'proc.zi', columns => 'user_id,v')")
      .collect().head.getInt(0) == 2)
    assert(sql("SELECT count(*) FROM graft.proc.zi").collect().head.getLong(0) == 3)

    val idx = sql("CALL graft.system.create_index(table => 'proc.zi', keys => 'user_id')")
      .collect().head
    assert(idx.getString(0).endsWith("_index/user_id"))
    sql("INSERT INTO graft.proc.zi VALUES (TIMESTAMP'2024-01-03 08:00:00', 5, 4.0)")
    val refreshed = sql(
      "CALL graft.system.refresh_index(table => 'proc.zi', keys => 'user_id')")
      .collect().head
    assert(refreshed.getInt(1) >= 1, s"the new partition must re-aggregate: $refreshed")
  }

  test("SHOW PROCEDURES lists the surface; unknown procedure refuses loudly") {
    val shown = sql("SHOW PROCEDURES IN graft.system").collect()
      .map(_.toString).mkString("\n")
    for (p <- Seq("compact", "vacuum", "restore", "fsck"))
      assert(shown.contains(p), s"SHOW PROCEDURES must list $p:\n$shown")
    val e = intercept[Exception](sql("CALL graft.system.bogus(table => 'x.y')"))
    assert(e.getMessage.contains("bogus") || e.getMessage.contains("undefined"))
  }
}

