package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown for the SQL-DML lifecycle cluster (r16 "Not yet
  * optimized" #4-adjacent): each `zc_sql_*` entry pays a fresh
  * collection build + CREATE TABLE + the DML statement + a full ordered
  * read. This names the split for a representative (the committed
  * worst, `zc_sql_delete_in2`, 4.47 s sf0.1) and for the CDC read pair
  * (`zc_changes_read`, 4.09 s), so the family's residue is attributed
  * before anyone rewrites a DML path that is actually lifecycle-bound.
  *
  * Usage: `runMain graft.cli.DmlProfile` with the BenchOne env.
  */
object DmlProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def secs(ns: Long): Double = ns / 1e9
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    import graft.core.{Collection, DatePartitioning}
    import graft.sources.Tables

    // ---- zc_sql_delete_in2 ----
    (0 until reps).foreach { rep =>
      val t0 = System.nanoTime()
      val ev = Tables.events(spark, sfDir)
      val root = s"/tmp/graft-dprof-${java.util.UUID.randomUUID().toString.take(8)}"
      val c = Collection.create(spark, root, ev.schema, "ts",
        DatePartitioning("ts", "D"), catalogEnabled = true, overwrite = true,
        attrs = Map(Collection.DvEnabledAttr -> "true"))
      c.insert(ev)
      val t1 = System.nanoTime()
      val tbl = "graft_dprof_" + java.util.UUID.randomUUID().toString.take(8)
      spark.sql(s"CREATE TABLE $tbl USING graft OPTIONS (path '${c.root}')")
      Tables.events(spark, sfDir).createOrReplaceTempView("dprof_events")
      val t2 = System.nanoTime()
      spark.sql(s"""DELETE FROM $tbl WHERE (user_id, event_type) IN
                    (SELECT user_id, event_type FROM dprof_events WHERE value > 95)""")
      val t3 = System.nanoTime()
      c.query().withColumn("ts_us", unix_micros(col("ts")))
        .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
        .orderBy("event_id")
        .write.format("noop").mode("overwrite").save()
      val t4 = System.nanoTime()
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      System.err.println(s"[dprof] zc_sql_delete_in2 rep $rep: " +
        s"build=${num(secs(t1 - t0))} ddl=${num(secs(t2 - t1))} " +
        s"delete=${num(secs(t3 - t2))} read=${num(secs(t4 - t3))} " +
        s"total=${num(secs(t4 - t0))}")
    }

    // ---- zc_changes_read ----
    (0 until reps).foreach { rep =>
      val t0 = System.nanoTime()
      val ev = Tables.events(spark, sfDir)
      val root = s"/tmp/graft-dprofc-${java.util.UUID.randomUUID().toString.take(8)}"
      val c = Collection.create(spark, root, ev.schema, "ts",
        DatePartitioning("ts", "D"), overwrite = true, retainGenerations = 4)
      c.insert(ev)
      val g0 = c.generation
      val t1 = System.nanoTime()
      c.updateWhere("event_type == 'click' and day >= 10",
        Map("event_type" -> "'cdc_update'"))
      val t2 = System.nanoTime()
      spark.read.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", g0 + 1)
        .option("endingVersion", c.generation)
        .load(root)
        .withColumn("ts_us", unix_micros(col("ts")))
        .select("event_id", "ts_us", "user_id", "event_type", "value",
          "props", "_change_type")
        .orderBy("event_id", "_change_type")
        .write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      System.err.println(s"[dprof] zc_changes_read rep $rep: " +
        s"build=${num(secs(t1 - t0))} update=${num(secs(t2 - t1))} " +
        s"cdc_read=${num(secs(t3 - t2))} total=${num(secs(t3 - t0))}")
    }
    spark.stop()
  }
}
