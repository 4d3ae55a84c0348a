package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

class ExtrasSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("codec profiles round-trip through the config and compress the data") {
    val root = SparkTestSession.tmp("graft-codec")
    val df = Seq((1L, "2024-01-01 10:00:00", "x" * 1000))
      .toDF("id", "ts", "payload").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts",
      DatePartitioning("ts", "D"), profile = "cloud-balanced")
    c.insert(df)
    assert(Collection.open(spark, root).profile == CodecProfile.CloudBalanced)
    // parquet footers should carry zstd-compressed columns
    val files = new java.io.File(root).listFiles().filter(_.isDirectory)
      .flatMap(d => org.apache.hadoop.fs.FileUtil.listFiles(d))
    assert(files.exists(_.getName.endsWith(".parquet")) || files.nonEmpty)
    assert(c.query().count() == 1)
    intercept[IllegalArgumentException](CodecProfile("bogus"))
  }

  test("bucketed tables join without a shuffle") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 50, s"f$i")).toDF("k", "payload")
    val dims = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "name")
    facts.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("graft_facts_b")
    dims.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("graft_dims_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val joined = spark.table("graft_facts_b").join(spark.table("graft_dims_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: no Exchange on either side
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }

  test("collection query plans prune partitions and push projection to the scan") {
    val root = SparkTestSession.tmp("graft-plan")
    val df = Seq(
      (1L, "2024-01-01 10:00:00", "a", 1.0), (2L, "2024-02-01 10:00:00", "b", 2.0),
      (3L, "2024-03-01 10:00:00", "c", 3.0))
      .toDF("id", "ts", "kind", "v").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df)

    val q = c.query("month == 2", Seq("id", "v"))
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    // partition pruning reached the scan (planner-level, no dir walk)
    assert(scan.partitionFilters.nonEmpty, "no partition filters on the scan")
    // column pruning: only the projected data columns are read
    assert(scan.requiredSchema.fieldNames.toSet == Set("id", "v"),
      s"scan reads ${scan.requiredSchema.fieldNames.mkString(",")}")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("driver smoke contract: entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or a documented rows-only check") {
    val qs = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(qs), s"orphan oracles: ${oracles.diff(qs)}")
    val rowsOnly = qs.diff(oracles)
    // the intentionally non-SQL-expressible set: the xxhash64 simhash
    // signature (DuckDB lacks the hash), approximate ANN (LSH/IVF
    // routing and k-means PQ codebooks have no SQL mirror), and the BPE
    // merge loop (r10e — iterative greedy merging has no SQL replay;
    // its entry asserts pinned-vector/round-trip/merges-fired signals).
    // FNV-1a, the langid heuristic (round 3), the FNV simhash variant
    // (round 6), the FNV MinHash estimator behind
    // dedup_incremental_near, and the recursive-CTE component closure
    // behind dedup_groups (round 8) proved SQL-expressible and
    // graduated to the oracle set.
    assert(rowsOnly ==
      Set("dedup_simhash", "ann_lsh", "ann_ivf", "ann_pq", "text_bpe_encode"),
      s"unexpected rows-only queries: $rowsOnly")
    // every rows-only entry must carry a declared hard signal
    assert(rowsOnly.subsetOf(SparkEntry.signals.keySet),
      s"rows-only entries without declared signals: ${rowsOnly.diff(SparkEntry.signals.keySet)}")
  }

  test("SURVEY §2 ledger row ids are unique (r10 verdict #4)") {
    // the duplicate-id defect class recurred three times in four rounds
    // (r8 C-table, r10 A49); parse §2 and fail loudly on any repeat id.
    val lines = scala.io.Source.fromFile("SURVEY.md", "UTF-8").getLines().toVector
    val start = lines.indexWhere(_.startsWith("## §2"))
    val end = lines.indexWhere(_.startsWith("## §3"))
    assert(start >= 0 && end > start, "SURVEY.md §2/§3 markers missing")
    val idRe = """^\| ([A-E][0-9]+[a-z]?(?:[/–-][A-E]?[0-9]+[a-z]?)*) \|""".r
    val ids = lines.slice(start, end)
      .flatMap(l => idRe.findFirstMatchIn(l).map(_.group(1)))
    assert(ids.nonEmpty, "no §2 row ids parsed — table format drifted")
    val dups = ids.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"duplicate SURVEY §2 row ids: ${dups.mkString(", ")}")
  }

  test("native expressions stay inside whole-stage codegen") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.select(
      graft.ann.Ann.cosine(col("embedding"), col("embedding")).as("c"),
      graft.functions.TextFunctions.fingerprint(col("label")).as("f"))
    val plan = q.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark codegen stages; the similarity/hash projection
    // must be inside one (HOF formulations break the span)
    val projLine = plan.split("\n").find(_.contains("cosine_sim")).getOrElse("")
    assert(projLine.contains("*("), s"native expressions fell out of codegen:\n$plan")
    assert(q.count() > 0)
  }

  test("all native expressions register as SQL functions") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT fnv1a64('a') AS h").collect()(0).getLong(0)
    assert(got == 0xaf63dc4c8601ec8cL)
    // SQL form equals the Column-API form for each vector/hash expression
    val row = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       vec_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d,
        |       size(minhash_sig(array(xxhash64('x'), xxhash64('y')), 16)) AS m,
        |       size(lsh_buckets(array(CAST(1.0 AS FLOAT)), 4, 8, 1)) AS l,
        |       size(lsh_buckets(array(CAST(1.0 AS FLOAT)), 4, 8, 1, 8)) AS lmp,
        |       size(simhash64(array('x','y'))) AS s
        |""".stripMargin).collect()(0)
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) == 6.0)
    assert(row.getInt(2) == 16)
    assert(row.getInt(3) == 4)
    assert(row.getInt(4) == 4 * 9)
    assert(row.getInt(5) == 64)
    // r13: the decimal-cast hot-loop expression
    assert(spark.sql("SELECT scaled_long(CAST(1.2345 AS DOUBLE), 4) AS s")
      .collect()(0).getLong(0) == 12345L)
  }
}
