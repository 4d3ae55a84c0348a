package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._

/** Scientific-format ingestion (r11): the Spark-first counterpart of
  * the reference's NetCDF/xarray loaders (zcollection/io/ partition.py
  * + root.py; examples/ex_netcdf_to_zcollection.py), which walk a tree
  * of granule files, decode each into arrays, and insert per-granule.
  *
  * A Spark deployment ingests the same shape without a special reader:
  * a NetCDF-ish GRANULE is an axis vector (`time[n]`) plus data arrays
  * over it (`ssh[n]`, `swh[n]`, a 2-D `wf[n, k]`) and global
  * attributes. The recipe below:
  *
  *  1. DECODE each granule into one DataFrame ROW holding the arrays
  *     (in production a `binaryFile` read + a mapPartitions decoder —
  *     pure-JVM NetCDF3/HDF5 readers exist; here the granules are
  *     synthesized so the example runs hermetically);
  *  2. EXPLODE arrays to rows with `arrays_zip` + `explode` — the
  *     axis-aligned long form graft stores (2-D variables stay nested
  *     arrays per row, exactly the reference's `array[time, k]` shape);
  *  3. INSERT into a time-partitioned collection — granule boundaries
  *     vanish, the axis partitions govern layout, and every later
  *     query/update/stream face works unchanged;
  *  4. read BACK as arrays with `queryArrays` (the `to_xarray` shape):
  *     one row per partition, axis-ordered arrays per variable.
  *
  * At 100 TB the only change is step 1's source (a manifest of granule
  * paths read `spark.read.format("binaryFile")` or a file listing fed
  * to `mapPartitions`) — decode parallelism is the file count, and the
  * insert's range-partitioned write keeps axis zone maps tight however
  * granules straddle partition boundaries.
  *
  * Run: `sbt "runMain graft.examples.ScientificIngest"`.
  */
object ScientificIngest {

  /** One synthesized "granule": `n` samples starting at `t0` (micros),
    * 1 Hz, with a 4-sample waveform per sample. Stands in for the
    * decoded content of one NetCDF file. */
  private def granule(spark: SparkSession, t0: java.sql.Timestamp, n: Int,
                      cycle: Int): DataFrame = {
    import spark.implicits._
    val base = t0.getTime
    val times = (0 until n).map(i => new java.sql.Timestamp(base + i * 1000L))
    val ssh = (0 until n).map(i => math.sin(i / 10.0) * 0.3 + cycle * 0.01)
    val swh = (0 until n).map(i => 2.0 + math.cos(i / 7.0))
    val wf = (0 until n).map(i => (0 until 4).map(k => (i * 4 + k).toDouble))
    Seq((cycle, times, ssh, swh, wf))
      .toDF("cycle", "time", "ssh", "swh", "wf")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. "decode": one row per granule, arrays aligned on the time axis.
    //    Granules deliberately straddle month boundaries — the axis
    //    partitioning, not the file layout, decides where rows live.
    val granules = Seq(
      granule(spark, java.sql.Timestamp.valueOf("2024-01-30 23:58:00"), 600, 1),
      granule(spark, java.sql.Timestamp.valueOf("2024-02-14 11:00:00"), 600, 2),
      granule(spark, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 600, 3)
    ).reduce(_ unionByName _)

    // 2. explode to the long form: arrays_zip keeps the per-sample
    //    alignment; the 2-D waveform stays a nested array per row
    val rows = granules
      .select(col("cycle"),
        explode(arrays_zip(col("time"), col("ssh"), col("swh"), col("wf")))
          .as("s"))
      .select(col("s.time").as("time"), col("cycle"),
        col("s.ssh").as("ssh"), col("s.swh").as("swh"), col("s.wf").as("wf"))

    // 3. one time-partitioned collection; granule attrs become
    //    collection attrs (the reference carries them on the Dataset)
    val root = java.nio.file.Files
      .createTempDirectory("graft-sci").toString + "/passes"
    val coll = Collection.create(spark, root, rows.schema, "time",
      DatePartitioning("time", "M"),
      attrs = Map("mission" -> "examplesat", "source_format" -> "netcdf-shaped"))
    coll.insert(rows)
    println(s"ingested ${coll.countRows()} samples into " +
      s"${coll.partitions().size} month partitions " +
      s"(granules straddled boundaries; the axis decided)")

    // later granules append with the reference's merge strategies —
    // a re-delivered, corrected granule upserts by axis time
    val corrected = granule(spark,
        java.sql.Timestamp.valueOf("2024-02-14 11:00:00"), 600, 2)
      .select(col("cycle"), explode(arrays_zip(col("time"), col("ssh"),
        col("swh"), col("wf"))).as("s"))
      .select(col("s.time").as("time"), col("cycle"),
        (col("s.ssh") + 0.5).as("ssh"), col("s.swh").as("swh"),
        col("s.wf").as("wf"))
    coll.insert(corrected, MergeStrategy.Upsert(None))
    println(s"after corrected re-delivery: ${coll.countRows()} samples " +
      "(upsert by axis time — no duplicates)")

    // 4. back to the array world: queryArrays is the to_xarray shape
    val arr = coll.queryArrays("month == 2", Seq("ssh", "swh"))
    arr.select(col("month"), col("n"),
      slice(col("ssh"), 1, 3).as("ssh_head")).show(false)

    println(s"attrs: ${Collection.open(spark, root).attrs}")
    spark.stop()
  }
}
