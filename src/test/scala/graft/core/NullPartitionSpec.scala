package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** NULL partition keys (`__HIVE_DEFAULT_PARTITION__`) under SQL
  * three-valued logic (r10): every driver-side partition decision maps
  * the sentinel to a real NULL and reasons with
  * [[FilterExpr.evalPartition]]. Before this, `k IS NULL` PRUNED the
  * exact partition holding its rows (wrong answers, silently) and the
  * metadata `COUNT(*) WHERE k IS NOT NULL` counted null-keyed rows.
  * Reference: partition predicates over key dicts
  * (zcollection partitioning/abc.py); Python has no three-valued None,
  * so this contract is Spark-first. */
class NullPartitionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fresh(root: String): Collection = {
    val df = Seq(
      ("a", 1L, 1.0), (null.asInstanceOf[String], 2L, 2.0),
      ("b", 3L, 3.0), (null.asInstanceOf[String], 4L, 4.0),
      ("a", 5L, 5.0)).toDF("k", "pos", "v")
    val c = Collection.create(spark, root, df.schema, "pos",
      SequencePartitioning(Seq("k"), "pos"))
    c.insert(df)
    c
  }

  test("IS NULL / IS NOT NULL filters select exactly the null partition's rows") {
    val root = SparkTestSession.tmp("nullpart-query")
    val c = fresh(root)
    assert(c.query().count() == 5)
    assert(c.query("k is null").select("pos").as[Long].collect().sorted.toSeq ==
      Seq(2L, 4L), "IS NULL must KEEP the null-keyed partition")
    assert(c.query("k is not null").count() == 3)
    // ordinary comparisons never select a NULL key (UNKNOWN under 3VL) —
    // including the negated forms
    assert(c.query("k == 'a'").count() == 2)
    assert(c.query("k != 'a'").select("pos").as[Long].collect().sorted.toSeq ==
      Seq(3L), "k != 'a' is UNKNOWN on the null partition: not selected")
    // the sentinel string is NOT a magic value a user can address
    assert(c.query("k == '__HIVE_DEFAULT_PARTITION__'").count() == 0)
  }

  test("metadata COUNT answers are null-sound (and stay metadata-only)") {
    val root = SparkTestSession.tmp("nullpart-count")
    val c = fresh(root)
    assert(c.countRows() == 5)
    assert(c.countRows("k is not null") == 3)
    assert(c.countRows("k is null") == 2)
    assert(c.countRows("k == 'a'") == 2)
    // the metadata half must agree — these predicates are all decidable
    // per partition, so None here would mean a silent scan fallback
    assert(c.countRowsMeta(FilterExpr.parse("k is not null")).contains(3L))
    assert(c.countRowsMeta(FilterExpr.parse("k is null")).contains(2L))
  }

  test("partitions() listing and drop under IS NULL filters") {
    val root = SparkTestSession.tmp("nullpart-parts")
    val c = fresh(root)
    val nullParts = c.partitions("k is null")
    assert(nullParts.size == 1 && nullParts.head.contains("__HIVE_DEFAULT_PARTITION__"),
      s"IS NULL must list the null partition: $nullParts")
    assert(c.partitions("k is not null").size == 2)
    c.dropPartitions("k is null")
    assert(c.query().count() == 3 && c.query("k is null").count() == 0,
      "dropPartitions('k is null') must remove exactly the null-keyed rows")
  }

  test("SQL pushdown face: IS NULL is claimed, pruned, and exact") {
    val root = SparkTestSession.tmp("nullpart-sql")
    fresh(root)
    val df = spark.read.format("graft").load(root)
    assert(df.where("k is null").count() == 2)
    assert(df.where("k is not null").count() == 3)
    val plan = df.where("k is null").select("pos").queryExecution.executedPlan
    assert(plan.toString.contains("BatchScan"),
      s"a partition-only IS NULL should stay on the native scan:\n$plan")
    assert(plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.isEmpty,
      s"IS NULL on the partition key is whole-partition-decidable — " +
      s"claimable with no engine re-filter:\n$plan")
  }
}
