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

  test("fnv1a64 registers as a SQL function") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT fnv1a64('a') AS h").collect()(0).getLong(0)
    assert(got == 0xaf63dc4c8601ec8cL)
  }
}
