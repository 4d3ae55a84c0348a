package graft.core

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `graftmem://` — the reference's `memory://` store scheme
  * (store/memory.py, dispatched by api.py:30-33) as a process-local
  * Hadoop filesystem: full collection lifecycle with zero disk. */
class InMemoryStoreSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    InMemoryFileSystem.register(s)
    s
  }
  import spark.implicits._

  private var n = 0
  private def root(): String = { n += 1; s"graftmem://specbucket/coll$n" }

  test("collection lifecycle on graftmem://: create, insert, query, update, delete, time travel") {
    val r = root()
    val df = (1L to 100L).map(i => (i, i * 1.0)).toDF("cargo", "v")
    // retention window so the post-delete time travel still reads
    // the replaced files (same requirement as any store)
    val c = Collection.create(spark, r, df.schema, "cargo",
      SequencePartitioning(Seq("cargo"), "cargo"), retainGenerations = 3)
    c.insert(df)
    assert(c.query().count() == 100)
    assert(c.query("cargo >= 50").select("cargo").as[Long].collect().min == 50L)

    c.updateWhere("cargo == 7", Map("v" -> "v * 10"))
    assert(c.query("cargo == 7").select("v").as[Double].head() == 70.0)

    val gBefore = c.generation
    c.deleteWhere("cargo > 90")
    assert(c.query().count() == 90)
    // time travel reads the in-memory snapshot before the delete
    assert(c.snapshotAt(gBefore).count() == 100)

    // nothing touched the local disk under any file:// root
    assert(r.startsWith("graftmem://"))
  }

  test("open from a fresh handle sees the same store; clone + branch work in memory") {
    val r = root()
    val df = (1L to 20L).map(i => (i, i * 1.0)).toDF("cargo", "v")
    val c = Collection.create(spark, r, df.schema, "cargo",
      SequencePartitioning(Seq("cargo"), "cargo"))
    c.insert(df)
    val reopened = Collection.open(spark, r, readOnly = true)
    assert(reopened.query().count() == 20)

    val cloneRoot = root()
    c.cloneTo(cloneRoot)
    val cl = Collection.open(spark, cloneRoot)
    assert(cl.query().count() == 20)
    cl.insert(Seq((100L, 1.0)).toDF("cargo", "v"))
    assert(cl.query().count() == 21 && c.query().count() == 20,
      "clone diverges without touching the source")
  }

  test("manifest publish arbitrates through the CAS putIfAbsent (loser rebases, no lost commit)") {
    val r = root()
    val df = Seq((1L, 1.0)).toDF("cargo", "v")
    val c1 = Collection.create(spark, r, df.schema, "cargo",
      SequencePartitioning(Seq("cargo"), "cargo"))
    c1.insert(df)
    val c2 = Collection.open(spark, r)
    // both handles commit; the optimistic-rebase loop must land BOTH
    // (each publish is exclusive, the loser rebases onto the winner)
    c1.insert(Seq((2L, 2.0)).toDF("cargo", "v"))
    c2.insert(Seq((3L, 3.0)).toDF("cargo", "v"))
    val got = Collection.open(spark, r, readOnly = true)
      .query().select("cargo").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L), s"no lost commit through the CAS arbiter: $got")
  }

  test("raw arbiter exclusivity: second publish of one generation loses") {
    val fs = new Path("graftmem://arb/x").getFileSystem(
      spark.sessionState.newHadoopConf())
    def put(p: String, bytes: String): Unit = {
      val out = fs.create(new Path(p), true)
      out.write(bytes.getBytes("UTF-8")); out.close()
    }
    put("graftmem://arb/m/a.tmp", "A")
    put("graftmem://arb/m/b.tmp", "B")
    val t = new Path("graftmem://arb/m/manifest-1.json")
    assert(InMemoryFileSystem.PutIfAbsentArbiter.publish(
      fs, new Path("graftmem://arb/m/a.tmp"), t))
    assert(!InMemoryFileSystem.PutIfAbsentArbiter.publish(
      fs, new Path("graftmem://arb/m/b.tmp"), t),
      "the second publish of one target must LOSE")
    val in = fs.open(t)
    val buf = new Array[Byte](1); in.readFully(buf); in.close()
    assert(new String(buf, "UTF-8") == "A", "the winner's bytes survive")
    InMemoryFileSystem.clear("arb")
  }

  test("SQL catalog over a graftmem warehouse: DDL, INSERT, UPDATE, MERGE, metadata") {
    val s = spark
    s.conf.set("spark.sql.catalog.graftmemc", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graftmemc.warehouse", "graftmem://sqlwh/wh")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftmemc.db")
    s.sql("""CREATE TABLE graftmemc.db.m (k BIGINT, v DOUBLE)
             PARTITIONED BY (chunk(4, k))""")
    s.sql("INSERT INTO graftmemc.db.m VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    assert(s.sql("SELECT sum(v) FROM graftmemc.db.m").head().getDouble(0) == 6.0)
    s.sql("UPDATE graftmemc.db.m SET v = v * 10 WHERE k = 2")
    s.sql("""MERGE INTO graftmemc.db.m t USING (SELECT 3L AS k, 0.5 AS v
             UNION ALL SELECT 9L, 9.0) s ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET *
             WHEN NOT MATCHED THEN INSERT *""")
    val got = s.sql("SELECT k, v FROM graftmemc.db.m ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.0), (2L, 20.0), (3L, 0.5), (9L, 9.0)),
      s"full SQL DML triangle over the in-memory warehouse: $got")
    // metadata tables resolve over the same store
    assert(s.sql("SELECT count(*) FROM graftmemc.db.m.history").head().getLong(0) >= 3L)
    s.sql("DROP TABLE graftmemc.db.m")
  }

  test("namespaces are independent per authority; clear drops one") {
    val fs = new Path("graftmem://nsa/f").getFileSystem(
      spark.sessionState.newHadoopConf())
    val out = fs.create(new Path("graftmem://nsa/f"), true)
    out.write(1); out.close()
    val fsB = new Path("graftmem://nsb/f").getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(!fsB.exists(new Path("graftmem://nsb/f")),
      "authorities must not share keys")
    InMemoryFileSystem.clear("nsa")
    assert(!fs.exists(new Path("graftmem://nsa/f")))
  }
}
