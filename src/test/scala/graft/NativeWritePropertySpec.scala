package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Collection, DatePartitioning, GroupedSequencePartitioning,
  SequencePartitioning}

/** Property fuzz for the r10 NATIVE DSv2 batch write: across random
  * schemas, partitionings, and data (nulls everywhere, null axis rows,
  * empty strings in identity keys, arrays/structs/decimals/dates in
  * the payload), a native `INSERT INTO` and a V1-bridge `INSERT INTO`
  * of the same rows must produce collections with IDENTICAL query
  * results and identical Hive partition layouts — the write-side twin
  * of NativeScanPropertySpec's read fuzz. */
class NativeWritePropertySpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", CatalogSpec.warehouse)
    GraftExtensions.register(s)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.nwfuzz")
    s
  }

  private val payloadTypes: Vector[DataType] = Vector(
    DoubleType, StringType, BooleanType, DecimalType(10, 2), DateType,
    ArrayType(FloatType), StructType(Seq(
      StructField("x", LongType), StructField("y", StringType))))

  private def randValue(rng: scala.util.Random, dt: DataType): Any =
    if (rng.nextInt(5) == 0) null
    else dt match {
      case DoubleType  => math.round(rng.nextDouble() * 1e4) / 100.0
      case StringType  => Seq("alpha", "b c", "", "x=y/z", "päö").apply(rng.nextInt(5))
      case BooleanType => rng.nextBoolean()
      case _: DecimalType => new java.math.BigDecimal(rng.nextInt(100000))
        .movePointLeft(2)
      case DateType => java.sql.Date.valueOf(java.time.LocalDate
        .ofEpochDay(18000 + rng.nextInt(2000)))
      case ArrayType(FloatType, _) =>
        Array.fill(rng.nextInt(4))(rng.nextFloat())
      case _: StructType => Row(rng.nextLong() % 1000, s"s${rng.nextInt(9)}")
      case other => throw new IllegalStateException(other.toString)
    }

  private def mkCase(seed: Int): (StructType, String,
      graft.core.Partitioning, Seq[Row]) = {
    val rng = new scala.util.Random(seed)
    val nPayload = 1 + rng.nextInt(3)
    val payload = (0 until nPayload).map(i =>
      StructField(s"p$i", payloadTypes(rng.nextInt(payloadTypes.length))))
    rng.nextInt(3) match {
      case 0 => // date partitioning over a timestamp axis
        val res = Seq("Y", "M", "D", "h")(rng.nextInt(4))
        val schema = StructType(StructField("ts", TimestampType) +: payload)
        val rows = (1 to 200).map { i =>
          val ts = if (rng.nextInt(20) == 0) null
            else java.sql.Timestamp.from(java.time.Instant
              .parse("2024-01-01T00:00:00Z")
              .plusSeconds(rng.nextInt(120 * 24 * 3600).toLong))
          Row.fromSeq(ts +: payload.map(f => randValue(rng, f.dataType)))
        }
        (schema, "ts", DatePartitioning("ts", res), rows)
      case 1 => // identity (sequence) partitioning, long + optional string key
        val twoKeys = rng.nextBoolean()
        val keys = if (twoKeys)
          Seq(StructField("k", LongType), StructField("s", StringType))
        else Seq(StructField("k", LongType))
        val schema = StructType(keys ++ payload)
        val rows = (1 to 200).map { i =>
          val k: Any = if (rng.nextInt(25) == 0) null else rng.nextInt(5).toLong
          val s: Any = Seq("plain", "a=b/c d", "", null).apply(rng.nextInt(4))
          Row.fromSeq((if (twoKeys) Seq(k, s) else Seq(k)) ++
            payload.map(f => randValue(rng, f.dataType)))
        }
        (schema, "k", SequencePartitioning(keys.map(_.name), "k"), rows)
      case _ => // grouped sequence over a long axis
        val size = 2 + rng.nextInt(50)
        val schema = StructType(StructField("k", LongType) +: payload)
        val rows = (1 to 200).map { i =>
          val k: Any = if (rng.nextInt(25) == 0) null else (rng.nextInt(400) - 100).toLong
          Row.fromSeq(k +: payload.map(f => randValue(rng, f.dataType)))
        }
        (schema, "k", GroupedSequencePartitioning(Seq("k"), "k", size), rows)
    }
  }

  private def writeVia(native: Boolean, name: String, schema: StructType,
                       axis: String, part: graft.core.Partitioning,
                       df: DataFrame): Collection = {
    val root = s"${CatalogSpec.warehouse}/nwfuzz/$name"
    Collection.create(spark, root, schema, axis, part, catalogEnabled = true)
    df.createOrReplaceTempView("nw_fuzz_src")
    spark.conf.set("spark.graft.nativeWrite", native.toString)
    try {
      val ins = spark.sql(s"INSERT INTO graft.nwfuzz.$name SELECT * FROM nw_fuzz_src")
      val plan = ins.queryExecution.executedPlan.toString
      if (native) assert(!plan.contains("ExecV1"), s"expected native write:\n$plan")
      else assert(plan.contains("AppendDataExecV1"), s"expected V1 write:\n$plan")
    } finally spark.conf.set("spark.graft.nativeWrite", "true")
    Collection.open(spark, root, readOnly = true)
  }

  test("seeded fuzz: native and V1 writes produce identical collections") {
    for (seed <- 1 to 12) {
      val (schema, axis, part, rows) = mkCase(seed)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), schema)
      val cN = writeVia(native = true, s"n$seed", schema, axis, part, df)
      val cV = writeVia(native = false, s"v$seed", schema, axis, part, df)
      assert(cN.partitions() == cV.partitions(),
        s"seed $seed: partition layouts diverged\n native=${cN.partitions()}\n v1=${cV.partitions()}")
      val a = cN.query().collect().map(_.toString).sorted.toSeq
      val b = cV.query().collect().map(_.toString).sorted.toSeq
      assert(a.length == rows.length, s"seed $seed: native lost rows (${a.length})")
      assert(a == b, s"seed $seed: row content diverged (first diff: ${
        a.zip(b).find { case (x, y) => x != y }})")
    }
  }
}
