package graft.cli

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan-audit utility: `runMain graft.cli.PlanDump q5_local q7_volume`
  * prints the formatted physical plan of each named `SparkEntry.queries`
  * entry (all headline queries when no names given) against
  * `SPARK_GRAFT_SF_DIR`. The review loop for design-for-scale: check
  * pushed filters, broadcast choices, exchange counts and codegen spans
  * without running the queries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.Bench.Headline
    for (name <- names) {
      println(s"\n================ $name ================")
      try println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      catch { case e: Throwable => println(s"[plandump] $name failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
