package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.operators._

class OperatorsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the latest right time at-or-before each left row") {
    val left = Seq((1L, 10L, "2024-01-01 10:00:00"), (2L, 10L, "2024-01-01 12:00:00"),
                   (3L, 20L, "2024-01-01 10:00:00"))
      .toDF("id", "k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq((10L, "2024-01-01 09:00:00"), (10L, "2024-01-01 11:00:00"),
                    (10L, "2024-01-01 12:00:00"), (30L, "2024-01-01 08:00:00"))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp"))
    val got = AsOf.joinLastTime(left, right, col("k"), col("k"), col("t"), col("t"))
      .orderBy("id").select("id", "asof_ts").collect()
    assert(got(0).getTimestamp(1) == ts("2024-01-01 09:00:00"))
    assert(got(1).getTimestamp(1) == ts("2024-01-01 12:00:00")) // inclusive match
    assert(got(2).isNullAt(1)) // key 20 has no right rows
  }

  test("nearest as-of: direction by distance, backward ties, per-direction tolerance (r10d)") {
    // key 10 rights at 09:00 and 11:30; key 40: only a forward right
    val left = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),  // b=1h, f=1.5h -> backward
      (2L, 10L, "2024-01-01 11:00:00"),  // b=2h, f=0.5h -> forward
      (3L, 10L, "2024-01-01 10:15:00"),  // b=1.25h f=1.25h TIE -> backward
      (4L, 20L, "2024-01-01 10:00:00"),  // no rights -> null
      (5L, 40L, "2024-01-01 10:00:00"),  // forward-only -> forward
      (6L, 40L, null: String))           // NULL left time -> no match
      .toDF("id", "k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq((10L, "2024-01-01 09:00:00"), (10L, "2024-01-01 11:30:00"),
                    (40L, "2024-01-01 10:20:00"))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp"))
    def run(tol: Option[Long]) =
      AsOf.joinNearestTime(left, right, col("k"), col("k"), col("t"), col("t"),
          toleranceMicros = tol)
        .orderBy("id").select("id", "asof_ts").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getTimestamp(1))).toSeq
    assert(run(None) == Seq(
      Some(ts("2024-01-01 09:00:00")), Some(ts("2024-01-01 11:30:00")),
      Some(ts("2024-01-01 09:00:00")), None, Some(ts("2024-01-01 10:20:00")),
      None))
    // tolerance 65 min: id 1's nearest (backward, 60m) survives; id 2's
    // backward (2h) is OUT but its forward (30m) is IN -> the tolerance
    // must act per direction, not null the chosen side post-hoc; id 3
    // loses both (75m each)
    assert(run(Some(65L * 60 * 1000000)) == Seq(
      Some(ts("2024-01-01 09:00:00")), Some(ts("2024-01-01 11:30:00")),
      None, None, Some(ts("2024-01-01 10:20:00")), None))
    // one shuffle: the two window frames share the single (key) Exchange
    val plan = AsOf.joinNearestTime(left, right, col("k"), col("k"),
      col("t"), col("t")).queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 3, // 2 side scans + 1 window
      s"nearest as-of must not add shuffles:\n$plan")
  }

  test("native as-of operator (LogicalPlan+Strategy+Exec) equals the window form") {
    val left = Seq((1L, 10L, "2024-01-01 10:00:00"), (2L, 10L, "2024-01-01 12:00:00"),
                   (3L, 20L, "2024-01-01 10:00:00"), (4L, 99L, "2024-01-01 10:00:00"))
      .toDF("id", "k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq((10L, "2024-01-01 09:00:00"), (10L, "2024-01-01 11:00:00"),
                    (10L, "2024-01-01 12:00:00"), (30L, "2024-01-01 08:00:00"))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp"))
    val window = AsOf.joinLastTime(left, right, col("k"), col("k"), col("t"), col("t"))
      .select("id", "asof_ts").collect().map(r => (r.getLong(0), r.get(1))).toSet
    val native = AsOf.joinLastTimeNative(left, right, col("k"), col("k"), col("t"), col("t"))
      .select("id", "asof_ts").collect().map(r => (r.getLong(0), r.get(1))).toSet
    assert(native == window)
    assert(native.size == 4)
  }

  test("native as-of operator agrees with window form on real events (incl. self-join)") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.where(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val clicks = ev.where(col("event_type") === "click").select("user_id", "ts")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "last_click").collect()
        .map(r => (r.getLong(0), r.get(1))).toSet
    val a = norm(AsOf.joinLastTime(purchases, clicks,
      col("user_id"), col("user_id"), col("ts"), col("ts"), "last_click"))
    val b = norm(AsOf.joinLastTimeNative(purchases, clicks,
      col("user_id"), col("user_id"), col("ts"), col("ts"), "last_click"))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("native as-of operator survives null keys and null times on both sides") {
    // ADVICE r1: interpreted orderings NPE on null operands — a single null
    // timestamp crashed the task. Null times/keys must never reach the
    // comparator: null-time left rows emit a null match, null-time right
    // rows are consumed without recording a match.
    val left = Seq(
      (1L, java.lang.Long.valueOf(10L), "2024-01-01 10:00:00"),
      (2L, java.lang.Long.valueOf(10L), null),
      (3L, null.asInstanceOf[java.lang.Long], "2024-01-01 10:00:00"))
      .toDF("id", "k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq(
      (java.lang.Long.valueOf(10L), "2024-01-01 09:00:00"),
      (java.lang.Long.valueOf(10L), null),
      (null.asInstanceOf[java.lang.Long], "2024-01-01 08:00:00"))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp"))
    val got = AsOf.joinLastTimeNative(left, right, col("k"), col("k"), col("t"), col("t"))
      .orderBy("id").select("id", "asof_ts").collect()
    assert(got(0).getTimestamp(1) == ts("2024-01-01 09:00:00"))
    assert(got(1).isNullAt(1), "null left time must match nothing")
    assert(got(2).isNullAt(1), "null left key must match nothing")
  }

  test("banded range join equals the naive range predicate") {
    val left = Seq((1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 11:00:00"))
      .toDF("id", "k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq((1L, "2024-01-01 10:10:00"), (1L, "2024-01-01 10:40:00"),
                    (1L, "2024-01-01 11:29:59"), (2L, "2024-01-01 10:10:00"))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp"))
    val got = RangeJoin.bandJoin(left, right, col("k"), col("r_k"), col("t"), col("r_t"),
        loMicros = 0L, hiMicros = 30L * 60 * 1000000, bandMicros = 7L * 60 * 1000000)
      .groupBy("id").agg(count(lit(1)).as("n")).orderBy("id").collect()
    // id=1 window [10:00,10:30): one hit; id=2 window [11:00,11:30): one hit
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 1L), (2L, 1L)))
  }

  test("sessionize splits on gaps greater than the threshold") {
    val df = Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:20:00"),
                 (1L, "2024-01-01 12:00:00"), (2L, "2024-01-01 09:00:00"))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp"))
    val got = Sessionize.assign(df, col("k"), col("t"), gapMicros = 30L * 60 * 1000000)
      .orderBy("k", "t").select("k", "session_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 1), (1L, 1), (1L, 2), (2L, 1)))
  }

  test("view overlay joins overlay variables onto the base") {
    val root = SparkTestSession.tmp("graft-view")
    val df = Seq((1L, "2024-01-01 10:00:00", 5.0), (2L, "2024-01-01 11:00:00", 3.0),
                 (3L, "2024-01-02 10:00:00", 7.0))
      .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df)
    val v = View.create(spark, root + "-view", c)
    v.update(_.withColumn("v2", col("v") * 2))
    val got = v.query().orderBy("id").select("id", "v2").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 10.0), (2L, 6.0), (3L, 14.0)))
    // combined view schema = base declared schema + overlay variables
    assert(v.schema.fieldNames.toSeq == c.schema.fieldNames.toSeq :+ "v2")
    // reopen by config
    val reopened = View.open(spark, root + "-view")
    assert(reopened.query().count() == 3)
    assert(reopened.variables == Seq("v2"))
    assert(reopened.partitions() == c.partitions())
  }

  test("view alignment join plans sort-free (shuffle-hash on the overlay side)") {
    // r2 verdict #4: partitionBy-only overlay writes forced the
    // (partCols, _zc_row) join to SORT both sides every read. The overlay
    // now writes in the base's range layout and the join hash-builds the
    // narrow overlay side — no Sort node anywhere in the plan.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val root = SparkTestSession.tmp("graft-view-plan")
      val df = (1L to 200L).map(i => (i, s"2024-01-${1 + (i % 9).toInt} 10:00:00", i * 1.0))
        .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
      val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
      c.insert(df)
      val v = View.create(spark, root + "-view", c)
      v.update(_.withColumn("v2", col("v") * 2))
      val q = v.query()
      val plan = q.queryExecution.executedPlan
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.nonEmpty, s"no shuffle-hash join in view plan:\n$plan")
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.isEmpty, s"Sort survived in view plan:\n$plan")
      assert(q.count() == 200)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("salted join equals the plain join") {
    val left = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "lv")
    val right = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val salted = Skew.saltedJoin(left, right, "k", salts = 4)
      .select("k", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("indexer prunes to partitions containing the key") {
    val root = SparkTestSession.tmp("graft-idx")
    val df = Seq((1L, "2024-01-01 10:00:00", "a"), (2L, "2024-01-02 10:00:00", "b"),
                 (3L, "2024-01-03 10:00:00", "a"))
      .toDF("id", "ts", "kind").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df)
    val idx = Indexer.build(spark, c, Seq("kind"), root + "-idx")
    assert(idx.table.count() == 3)
    val got = idx.query(Map("kind" -> "a")).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L))
    assert(idx.query(Map("kind" -> "zzz")).count() == 0)
    // raw lookup: {partition -> row ranges} (reference parquet.py lookup)
    val lk = idx.lookup(Map("kind" -> "a"))
    assert(lk.keySet == Set("year=2024/month=1/day=1", "year=2024/month=1/day=3"))
    assert(lk.values.forall(rs => rs.nonEmpty && rs.forall { case (s, e) => e > s }))
    assert(idx.lookup(Map("kind" -> "zzz")).isEmpty)
  }

  test("indexer detects a stale base; allowStale keeps pruning but drops row bands") {
    // ADVICE r2: update()/compact() reassign row ids, so a pre-rewrite
    // index's _start/_stop bands can EXCLUDE rows that still match. Like
    // View.query, a stale index must refuse by default.
    val root = SparkTestSession.tmp("graft-idx-stale")
    val df = Seq((1L, "2024-01-01 10:00:00", "a"), (2L, "2024-01-02 10:00:00", "b"),
                 (3L, "2024-01-03 10:00:00", "a"))
      .toDF("id", "ts", "kind").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df)
    val idx = Indexer.build(spark, c, Seq("kind"), root + "-idx")
    assert(idx.query(Map("kind" -> "a")).count() == 2)
    // compact rewrites the partitions — row ids are reassigned
    c.compact()
    intercept[IllegalStateException](idx.query(Map("kind" -> "a")).count())
    // allowStale: row bands dropped (never wrong), partition pruning +
    // key predicate still correct for partitions known at build time
    val got = idx.query(Map("kind" -> "a"), allowStale = true)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L))
    // rebuilding clears the staleness
    val idx2 = Indexer.build(spark, c, Seq("kind"), root + "-idx")
    assert(idx2.query(Map("kind" -> "a")).count() == 2)
  }

  test("indexer refresh: only changed partitions re-aggregate, result equals a full rebuild") {
    val root = SparkTestSession.tmp("graft-idx-refresh")
    val mk = (vals: Seq[(Long, String, String)]) => vals
      .toDF("id", "ts", "kind").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root,
      mk(Seq((1L, "x", "x"))).schema, "ts", DatePartitioning("ts", "D"))
    c.insert(mk(Seq((1L, "2024-01-01 10:00:00", "a"), (2L, "2024-01-02 10:00:00", "b"),
                    (3L, "2024-01-03 10:00:00", "a"))))
    val idx = Indexer.build(spark, c, Seq("kind"), root + "-idx")

    // head unchanged: refresh is a no-op
    assert(idx.refresh()._2 == 0)

    // one new partition + one appended-to partition = 2 changed
    c.insert(mk(Seq((4L, "2024-01-04 10:00:00", "a"))), MergeStrategy.Concat)
    c.insert(mk(Seq((5L, "2024-01-02 12:00:00", "a"))), MergeStrategy.Concat)
    val (idx2, n) = idx.refresh()
    assert(n == 2, s"exactly the new + appended partitions re-aggregate, got $n")
    assert(idx2.builtAtGeneration.contains(c.generation))

    // the refreshed table equals a from-scratch rebuild
    val full = Indexer.build(spark, c, Seq("kind"), root + "-idx-full")
    val a = idx2.table.orderBy("day", "kind").collect().map(_.toSeq).toSeq
    val b = full.table.orderBy("day", "kind").collect().map(_.toSeq).toSeq
    assert(a == b, s"refreshed index diverged:\n$a\nvs\n$b")

    // queries at the new head work without a staleness error
    assert(idx2.query(Map("kind" -> "a")).orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L, 5L))

    // a rewrite (row ids reassigned) refreshes correctly too
    c.compact()
    val (idx3, n3) = idx2.refresh()
    assert(n3 >= 1)
    assert(idx3.query(Map("kind" -> "a")).count() == 4)
  }

  test("indexer pushes its _zc_row ranges down to the parquet scan") {
    val root = SparkTestSession.tmp("graft-idxr")
    val df = (1L to 100L).map(i => (i, s"2024-01-0${1 + (i % 3)} 10:00:00", if (i <= 5) "hot" else "cold"))
      .toDF("id", "ts", "kind").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df)
    val idx = Indexer.build(spark, c, Seq("kind"), root + "-idx")
    val q = idx.query(Map("kind" -> "hot"))
    val scan = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    // the stored (_start, _stop) ranges became data filters on _zc_row —
    // parquet row-group zone maps can skip everything outside them
    assert(scan.dataFilters.exists(_.references.exists(_.name == Collection.RowIdCol)),
      s"no _zc_row range filter reached the scan: ${scan.dataFilters}")
    assert(scan.partitionFilters.nonEmpty, "index partition pruning missing")
    assert(q.count() == 5)
    // beyond maxRanges the row bands are dropped but results stay correct
    assert(idx.query(Map("kind" -> "hot"), maxRanges = 1).count() == 5)
  }

  test("ivf centroid selection plans as a bounded top-k, not a global sort") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val sample = graft.ann.Ann.sampleCentroids(e, "vec_id", "embedding", 32)
    val plan = sample.queryExecution.executedPlan.toString
    // the r1 formulation planned Window/Sort over a single partition — one
    // task sorting the whole corpus; the hash-sample must be a
    // TakeOrderedAndProject (per-task top-k, driver merges nLists rows)
    assert(plan.contains("TakeOrderedAndProject"), s"no bounded top-k in plan:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-task stage survived in centroid-sample plan:\n$plan")
    assert(sample.count() == 32)
  }

  test("ivf inverted-list assignment is a map pass: no vector shuffle, no window") {
    // r2 verdict: the crossJoin+Window formulation shuffled |corpus| x
    // nLists rows each carrying the full vector. The assignment must be a
    // per-row argmax (zero corpus shuffle); the only Exchange left is the
    // bounded top-k over (qid, nid, sim).
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val q = graft.ann.Ann.ivfTopK(e, e.where(col("vec_id") < 3), "vec_id", "embedding", 5)
      val plan = q.queryExecution.executedPlan
      val shuffles = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      assert(shuffles.forall(!_.output.exists(_.name.startsWith("_zc_v_"))),
        s"a vector column rode an Exchange:\n$plan")
      assert(!plan.toString.contains("hashpartitioning(nid"),
        s"corpus shuffled on nid:\n$plan")
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"window survived in ivf plan:\n$plan")
      assert(q.count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("zero-norm vectors match no centroid on BOTH quantizer paths") {
    import graft.ann.Ann
    val cents = Array((0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 1f)))
    val df = Seq(
      (10L, Seq(0f, 0f)),   // zero norm -> NaN cosine against every centroid
      (11L, Seq(3f, 0f)))   // sanity row: nearest is centroid 0
      .toDF("vec_id", "embedding")
    // literal-codegen path: argmax keeps the -1 sentinel for NaN sims
    val lit_ = df.select(col("vec_id"), Ann.argmaxLiteral(col("embedding"), cents).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lit_(10L) == -1L, s"literal path assigned a zero-norm vector: $lit_")
    assert(lit_(11L) == 0L)
    // broadcast-closure path: the selection buffer must skip NaN sims
    val top = Ann.topCentroidsCol(spark, cents, 2)
    val bc = df.select(col("vec_id"), top(col("embedding")).as("cids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(bc(10L).isEmpty, s"broadcast path admitted NaN-scored centroids: $bc")
    assert(bc(11L).head == 0L)
  }

  test("kmeans quantizer works past the literal-table cap (broadcast argmax path)") {
    // 8192 lists > LiteralCentroidCap forces the broadcast-closure
    // assignment; over a small corpus most sampled lists survive and every
    // corpus row must land in a valid list.
    val dims = 8
    val n = 3000
    val df = spark.range(n).selectExpr("id as vec_id",
      s"transform(sequence(1, $dims), j -> cast(pmod(hash(id, j), 97) / 97.0 as float)) as embedding")
    val cents = graft.ann.Ann.kmeansCentroids(df, "vec_id", "embedding", 8192, 1)
    assert(cents.nonEmpty && cents.length <= n)
    val ids = cents.map(_._1).toSet
    assert(ids.size == cents.length)
    // the refined quantizer still drives ivfTopK end-to-end: self-query
    // recall vs brute force must stay high with a generous probe count
    val q = df.where(col("vec_id") < 20)
    val exact = graft.ann.Ann.bruteForceTopK(df, q, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.ann.Ann.ivfTopK(df, q, "vec_id", "embedding", 5,
        nLists = 8192, nProbe = 64, kmeansIters = 1)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"ivf@8192-list recall collapsed: $recall")
  }

  test("int8 quantization: per-element error bounded by half a step, zero vectors safe, no shuffle") {
    import graft.ann.Ann
    val df = spark.range(200).selectExpr("id as vec_id",
      "transform(sequence(1, 16), j -> cast(sin(id * j) as float)) as embedding")
      .union(spark.sql("select 999L as vec_id, transform(sequence(1, 16), j -> cast(0.0 as float)) as embedding"))
    val (maxAbs, qvec) = Ann.quantizeInt8(col("embedding"))
    val out = df.select(col("vec_id"), col("embedding"), maxAbs.as("ma"), qvec.as("q"))
    val rows = out.collect()
    rows.foreach { r =>
      val emb = r.getSeq[Float](1)
      val ma = r.getDouble(2)
      val q = r.getSeq[Int](3)
      assert(q.length == emb.length)
      assert(q.forall(v => v >= -127 && v <= 127), s"q out of range: $q")
      if (ma == 0.0) assert(q.forall(_ == 0), "zero vector must quantize to zeros")
      else emb.zip(q).foreach { case (x, qi) =>
        val err = math.abs(x.toDouble - qi * ma / 127.0)
        assert(err <= ma / 254.0 + 1e-12, s"error $err exceeds half-step ${ma / 254.0}")
      }
    }
    // scalar map: no Exchange in the plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    // mae column agrees with a driver-side recomputation on one vector
    val mae = df.where(col("vec_id") === 1L)
      .select(Ann.quantizeInt8Mae(col("embedding"), maxAbs, qvec)).collect()(0).getDouble(0)
    val r1 = rows.find(_.getLong(0) == 1L).get
    val expect = r1.getSeq[Float](1).zip(r1.getSeq[Int](3))
      .foldLeft(0.0) { case (acc, (x, qi)) => acc + math.abs(x.toDouble - qi * r1.getDouble(2) / 127.0) } / 16
    assert(math.abs(mae - expect) < 1e-12)
  }

  test("native quantization expressions are bit-identical to the HOF composition") {
    import graft.ann.Ann
    val df = spark.range(300).selectExpr("id as vec_id",
      "transform(sequence(1, 32), j -> cast(sin(id * j + 0.1) as float)) as embedding")
    val (maN, qvN) = Ann.quantizeInt8(col("embedding"))
    val (maH, qvH) = Ann.quantizeInt8Hof(col("embedding"))
    val both = df.select(
      maN.as("ma_n"), maH.as("ma_h"), qvN.as("q_n"), qvH.as("q_h"),
      Ann.quantizeInt8Mae(col("embedding"), maN, qvN).as("mae_n"),
      Ann.quantizeInt8MaeHof(col("embedding"), maH, qvH).as("mae_h"))
    both.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)), "max_abs differs")
      assert(r.getSeq[Int](2) == r.getSeq[Int](3), "qvec differs")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(5)), "mae differs")
    }
    // the native path stays inside whole-stage codegen: the projection
    // carrying the expressions renders with the codegen stage star
    val plan = df.select(maN.as("ma"), qvN.as("q")).queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[vec_max_abs""".r.findFirstIn(plan).isDefined,
      s"quantization projection must be codegen-staged, plan:\n$plan")
  }

  test("native quantization edge inputs: NaN and null elements match the HOF; empty/all-null narrow to null") {
    import graft.ann.Ann
    // NaN element and null element rows: bit-identical to the HOF twins
    val edge = spark.sql("""
      SELECT * FROM VALUES
        (1L, array(cast(1.0 as float), cast('NaN' as float), cast(-2.0 as float))),
        (2L, array(cast(1.0 as float), cast(null as float), cast(-2.0 as float))),
        (3L, array(cast(0.0 as float), cast(null as float)))
      AS t(vec_id, embedding)""")
    val (maN, qvN) = Ann.quantizeInt8(col("embedding"))
    val (maH, qvH) = Ann.quantizeInt8Hof(col("embedding"))
    val rows = edge.select(col("vec_id"), maN.as("ma_n"), maH.as("ma_h"),
        qvN.as("q_n"), qvH.as("q_h"),
        Ann.quantizeInt8Mae(col("embedding"), maN, qvN).as("mae_n"),
        Ann.quantizeInt8MaeHof(col("embedding"), maH, qvH).as("mae_h"))
      .orderBy("vec_id").collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: max_abs ${r.getDouble(1)} != HOF ${r.getDouble(2)}")
      assert(r.getSeq[Any](3) == r.getSeq[Any](4),
        s"vec ${r.getLong(0)}: qvec ${r.getSeq[Any](3)} != HOF ${r.getSeq[Any](4)}")
      assert(r.isNullAt(5) == r.isNullAt(6) &&
             (r.isNullAt(5) || java.lang.Double.doubleToLongBits(r.getDouble(5)) ==
                               java.lang.Double.doubleToLongBits(r.getDouble(6))),
        s"vec ${r.getLong(0)}: mae differs from HOF")
    }
    // NaN scale quantizes everything to 0 (the double->int NaN cast)
    assert(rows(0).getDouble(1).isNaN && rows(0).getSeq[Int](3) == Seq(0, 0, 0))
    // null elements: skipped by max_abs, propagated by the quantizer,
    // poisoning the error fold
    assert(rows(1).getDouble(1) == 2.0)
    assert(rows(1).getSeq[Any](3) == Seq(64, null, -127))
    assert(rows(1).isNullAt(5))

    // the narrowed degenerate cases: empty / all-null arrays yield null
    // for all three native outputs (HOF keeps a degenerate array shape)
    val degen = spark.sql("""
      SELECT * FROM VALUES
        (1L, array()),
        (2L, array(cast(null as float), cast(null as float)))
      AS t(vec_id, embedding)""")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val (maD, qvD) = Ann.quantizeInt8(col("embedding"))
    val drows = degen.select(maD.as("ma"), qvD.as("q"),
        Ann.quantizeInt8Mae(col("embedding"), maD, qvD).as("mae"))
      .collect()
    drows.foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2),
        s"degenerate arrays must yield all-null outputs, got $r")
    }
  }

  test("product quantization: exact in the k>=n regime, high recall compressed, no corpus shuffle") {
    import graft.ann.Ann
    // normalize so brute-force cosine and ADC inner product agree
    val unit = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("embedding",
        transform(col("embedding"), x =>
          (x / sqrt(aggregate(transform(col("embedding"), e => e.cast("double") * e),
            lit(0.0), (a, b) => a + b))).cast("float")))
    val q = unit.where(col("vec_id") < 5)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.select("qid", "nid", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap

    // k >= corpus: every subvector is its own centroid -> exact
    // reconstruction, ADC == true inner product
    val books = Ann.pqTrain(unit, "vec_id", "embedding", dims = 64, m = 8, k = 512, iters = 0)
    assert(books.length == 8 && books.forall(_.length == 500))
    val codes = Ann.pqEncode(unit, "vec_id", "embedding", books)
    val pq = keyed(Ann.pqTopK(codes, q, "vec_id", "embedding", books, 10))
    val exact = keyed(Ann.bruteForceTopK(unit, q, "vec_id", "embedding", 10))
    val agree = exact.count { case (key, v) => pq.get(key).contains(v) }
    assert(agree >= (exact.size * 0.9).toInt, s"exact-regime PQ lost rank: $agree/${exact.size}")

    // compressed regime on a clustered corpus (the shape PQ exploits):
    // 20 centers, 16 dims, m=4 x k=32 codebooks = 8x compression
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(20)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val rows = (0 until 400).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f).toSeq)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val qs = df.where(col("vec_id") < 10)
    val books2 = Ann.pqTrain(df, "vec_id", "embedding", dims = 16, m = 4, k = 32, iters = 2)
    val codes2 = Ann.pqEncode(df, "vec_id", "embedding", books2)
    // PQ deliberately quantizes away WITHIN-cluster noise (neighbors of
    // a query collapse to near-identical codes), so rank among cluster
    // siblings is arbitrary — the meaningful bar is that every returned
    // neighbor comes from the query's own cluster (vec_id % 20)
    val pq2 = Ann.pqTopK(codes2, qs, "vec_id", "embedding", books2, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pq2.length == 50)
    val sameCluster = pq2.count { case (qid, nid) => qid % 20 == nid % 20 }
    assert(sameCluster >= 45,
      s"compressed PQ returned cross-cluster neighbors: $sameCluster/50 same-cluster")

    // plan: neither vectors nor codes ride an Exchange — queries (with
    // ADC tables) broadcast, the only shuffle is the bounded top-k
    val plan = Ann.pqTopK(codes2, qs, "vec_id", "embedding", books2, 5)
      .queryExecution.executedPlan
    val shuffles = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(shuffles.forall(!_.output.exists(a => a.name == "codes" || a.name == "embedding")),
      s"corpus codes/vectors rode an Exchange:\n$plan")
  }

  test("persisted IVF+PQ index: codes on disk, probed-partition pruning, cluster-true neighbors") {
    import graft.ann.Ann
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(10)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val rows = (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f).toSeq)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val path = SparkTestSession.tmp("graft-ivfpq")
    Ann.buildIvfPqIndex(df, "vec_id", "embedding", path, dims = 16,
      nLists = 20, m = 4, pqK = 32, pqIters = 2)

    // the index stores CODES, not vectors: 4 small ints per row
    val lists = spark.read.parquet(s"$path/lists")
    assert(lists.columns.sorted.toSeq == Seq("_zc_cent", "codes", "nid"))
    assert(lists.select(size(col("codes"))).distinct().collect().map(_.getInt(0)).toSeq == Seq(4))

    val q = df.where(col("vec_id") < 10)
    val res = Ann.searchIvfPqIndex(spark, path, q, "vec_id", "embedding", 5, nProbe = 3)
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 50)
    val sameCluster = got.count { case (qid, nid) => qid % 10 == nid % 10 }
    assert(sameCluster >= 45,
      s"IVF+PQ returned cross-cluster neighbors: $sameCluster/50 same-cluster")

    // the probed-list pin reaches the scan as a partition filter
    val plan = res.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*_zc_cent""".r.findFirstIn(plan).isDefined,
      s"lists scan must carry a partition filter on _zc_cent, plan:\n$plan")
  }

  test("int8 rerank: quantized shortlist + exact rerank tracks brute force; no vector shuffle") {
    import graft.ann.Ann
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.where(col("vec_id") < 5)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.select("qid", "nid", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val exact = keyed(Ann.bruteForceTopK(e, q, "vec_id", "embedding", 10))
    val rer = keyed(Ann.int8RerankTopK(e, q, "vec_id", "embedding", 10, shortlist = 30))
    assert(rer.size == exact.size)
    // the exact re-rank means any rank disagreement can only come from a
    // true neighbor missing the int8 shortlist; 64-dim int8 error is
    // ~0.4% relative, so recall against exact top-10 must be ~perfect
    val agree = exact.count { case (k, v) => rer.get(k).contains(v) }
    assert(agree >= (exact.size * 0.9).toInt,
      s"int8 shortlist lost the exact ranking: $agree/${exact.size} agree")

    // plan: corpus vectors never ride an Exchange — the quantized pass
    // aggregates (qsim, nid) partials; the rerank joins are broadcasts
    val plan = Ann.int8RerankTopK(e, q, "vec_id", "embedding", 10, shortlist = 30)
      .queryExecution.executedPlan
    val shuffles = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(shuffles.forall(!_.output.exists(_.name.contains("_zc_c"))),
      s"a corpus vector column rode an Exchange:\n$plan")
  }

  test("stamped IVF index: staleness refusal, allowStale opt-in, incremental refresh (r12)") {
    import graft.ann.Ann
    def vec(i: Long): Seq[Float] =
      Seq((i % 7).toFloat, (i % 5).toFloat, (i % 3 + 1).toFloat)
    val rows = (0L until 40L).map(i => (i, vec(i)))
    val root = SparkTestSession.tmp("ann-stale")
    val df0 = rows.toDF("vec_id", "embedding")
    val c = Collection.create(spark, root, df0.schema, "vec_id",
      SequencePartitioning(Seq("vec_id"), "vec_id"))
    c.insert(df0)

    val path = SparkTestSession.tmp("ann-stale-idx")
    Ann.buildIvfIndexFrom(c, "vec_id", "embedding", path, nLists = 4)
    val q = Seq((1000L, vec(3L))).toDF("vec_id", "embedding")
    assert(Ann.searchIvfIndex(spark, path, q, "vec_id", "embedding", 5).count() == 5)

    // drift: an append moves the collection past the build generation
    c.insert(Seq((100L, Seq(0.123f, 9f, 0.456f))).toDF("vec_id", "embedding"))
    val e = intercept[IllegalStateException] {
      Ann.searchIvfIndex(spark, path, q, "vec_id", "embedding", 5).count()
    }
    assert(e.getMessage.contains("refresh"), s"stale search must point at the fix: $e")
    // explicit opt-in serves the stale lists
    assert(Ann.searchIvfIndex(spark, path, q, "vec_id", "embedding", 5,
      allowStale = true).count() == 5)

    // incremental refresh: only the new file's rows assign + append
    val g = Ann.refreshIvfIndex(spark, path)
    assert(g == c.generation)
    val exact = Seq((2000L, Seq(0.123f, 9f, 0.456f))).toDF("vec_id", "embedding")
    val hits = Ann.searchIvfIndex(spark, path, exact, "vec_id", "embedding", 1,
        nProbe = 4).select("nid").as[Long].collect().toSeq
    assert(hits == Seq(100L), s"refreshed index must serve the appended vector: $hits")
    // refresh is idempotent at head
    assert(Ann.refreshIvfIndex(spark, path) == g)

    // a rewrite (delete) invalidates lists: refresh refuses, demands rebuild
    c.deleteWhere("vec_id == 3")
    val e2 = intercept[IllegalStateException](Ann.refreshIvfIndex(spark, path))
    assert(e2.getMessage.contains("rebuild"))
    // un-stamped indexes (bare-DataFrame builds) keep the old contract
    val path2 = SparkTestSession.tmp("ann-stale-idx2")
    Ann.buildIvfIndex(rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
      path2, nLists = 4)
    assert(Ann.searchIvfIndex(spark, path2, q, "vec_id", "embedding", 5).count() == 5)
  }

  test("freshness memo: one manifest read across TTL'd searches; commits still refuse (r13)") {
    import graft.ann.Ann
    def vec(i: Long): Seq[Float] =
      Seq((i % 7).toFloat, (i % 5).toFloat, (i % 3 + 1).toFloat)
    val root = SparkTestSession.tmp("ann-memo")
    val df0 = (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val c = Collection.create(spark, root, df0.schema, "vec_id",
      SequencePartitioning(Seq("vec_id"), "vec_id"))
    c.insert(df0)
    val path = SparkTestSession.tmp("ann-memo-idx")
    Ann.buildIvfIndexFrom(c, "vec_id", "embedding", path, nLists = 4)
    val q = Seq((1000L, vec(3L))).toDF("vec_id", "embedding")

    // serve loop: N searches under a TTL pay ONE manifest-root read
    val before = Ann.freshnessProbes.get()
    (1 to 5).foreach { _ =>
      assert(Ann.searchIvfIndex(spark, path, q, "vec_id", "embedding", 5,
        maxStalenessMs = 60000L).count() == 5)
    }
    assert(Ann.freshnessProbes.get() == before + 1,
      "TTL'd searches must memoize the generation lookup")

    // the default path (no TTL) re-reads every call and still refuses
    // immediately after a commit
    c.insert(Seq((100L, vec(1L))).toDF("vec_id", "embedding"))
    intercept[IllegalStateException] {
      Ann.searchIvfIndex(spark, path, q, "vec_id", "embedding", 5).count()
    }
    // refresh invalidates the memo: the next TTL'd search re-reads and
    // serves the fresh stamp instead of the stale memoized generation
    Ann.refreshIvfIndex(spark, path)
    val afterRefresh = Ann.freshnessProbes.get()
    assert(Ann.searchIvfIndex(spark, path, q, "vec_id", "embedding", 5,
      maxStalenessMs = 60000L).count() == 5,
      "post-refresh TTL'd search must pass on the new stamp")
    assert(Ann.freshnessProbes.get() == afterRefresh + 1,
      "refresh must drop the memo entry (next check re-reads)")

    // r14 (r13 advice): memo keys are NORMALIZED paths — a trailing-slash
    // spelling shares the entry, so a refresh at the bare path
    // invalidates a serve loop that spells the index "path/"
    val slashed = path + "/"
    assert(Ann.searchIvfIndex(spark, slashed, q, "vec_id", "embedding", 5,
      maxStalenessMs = 60000L).count() == 5)
    c.insert(Seq((101L, vec(2L))).toDF("vec_id", "embedding"))
    Ann.refreshIvfIndex(spark, path) // invalidates under the normalized key
    val afterSlash = Ann.freshnessProbes.get()
    assert(Ann.searchIvfIndex(spark, slashed, q, "vec_id", "embedding", 5,
      maxStalenessMs = 60000L).count() == 5,
      "slashed-spelling search must re-read the refreshed stamp")
    assert(Ann.freshnessProbes.get() == afterSlash + 1,
      "trailing-slash spelling must share the normalized memo entry")
  }

  test("stamped IVF+PQ index refreshes append-only drift with the persisted codebooks (r12)") {
    import graft.ann.Ann
    def vec(i: Long): Seq[Float] =
      Seq((i % 7).toFloat, (i % 5).toFloat, (i % 3 + 1).toFloat, (i % 2).toFloat)
    val rows = (0L until 32L).map(i => (i, vec(i)))
    val root = SparkTestSession.tmp("ann-pq-stale")
    val df0 = rows.toDF("vec_id", "embedding")
    val c = Collection.create(spark, root, df0.schema, "vec_id",
      SequencePartitioning(Seq("vec_id"), "vec_id"))
    c.insert(df0)
    val path = SparkTestSession.tmp("ann-pq-stale-idx")
    Ann.buildIvfPqIndexFrom(c, "vec_id", "embedding", path, dims = 4,
      nLists = 4, m = 2, pqK = 16)
    val q = Seq((1000L, vec(3L))).toDF("vec_id", "embedding")
    assert(Ann.searchIvfPqIndex(spark, path, q, "vec_id", "embedding", 5).count() == 5)

    c.insert(Seq((200L, Seq(0.2f, 8f, 0.3f, 4f))).toDF("vec_id", "embedding"))
    intercept[IllegalStateException] {
      Ann.searchIvfPqIndex(spark, path, q, "vec_id", "embedding", 5).count()
    }
    val g = Ann.refreshIvfPqIndex(spark, path)
    assert(g == c.generation)
    // the appended vector is served (ADC is approximate: assert presence
    // in a widened candidate return, not rank-1)
    val exact = Seq((2000L, Seq(0.2f, 8f, 0.3f, 4f))).toDF("vec_id", "embedding")
    val hits = Ann.searchIvfPqIndex(spark, path, exact, "vec_id", "embedding",
        10, nProbe = 4).select("nid").as[Long].collect().toSet
    assert(hits.contains(200L), s"refreshed PQ index must serve the appended vector: $hits")
  }

  test("TrailingRange.agg is bit-identical to the direct RANGE frame, ties included (r14)") {
    import org.apache.spark.sql.expressions.Window
    // randomized keys/ordinals with deliberate ordinal TIES within a key
    // (the RANGE-vs-ROWS distinction) and frame-boundary collisions
    val rnd = new scala.util.Random(14)
    val rows = (0 until 2000).map { i =>
      (i.toLong, rnd.nextInt(7).toLong, rnd.nextInt(50).toLong * 10L,
       BigDecimal(rnd.nextInt(20000), 4))
    }
    val df = rows.toDF("id", "k", "ord", "v")
      .withColumn("v", col("v").cast("decimal(18,4)"))
    val span = 100L
    val wd = Window.partitionBy(col("k")).orderBy(col("ord"))
      .rangeBetween(-span, 0)
    val direct = df
      .withColumn("s", sum(col("v")).over(wd))
      .withColumn("n", count(lit(1)).over(wd))
      .select("id", "s", "n")
    val got = TrailingRange.agg(df, Seq(col("k")), col("ord"), span,
        Seq("s" -> col("v"), "n" -> lit(1L)))
      .select(col("id"), col("s").cast(direct.schema("s").dataType), col("n"))
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty,
      "prefix-sum trailing frame must equal the direct RANGE frame")
    // span = 0: frame is exactly the ordinal's peer group
    val d0 = df.withColumn("s", sum(col("v")).over(
        Window.partitionBy(col("k")).orderBy(col("ord")).rangeBetween(0, 0)))
      .select("id", "s")
    val g0 = TrailingRange.agg(df, Seq(col("k")), col("ord"), 0L,
        Seq("s" -> col("v")))
      .select(col("id"), col("s").cast(d0.schema("s").dataType))
    assert(g0.exceptAll(d0).isEmpty && d0.exceptAll(g0).isEmpty,
      "span=0 must reduce to the peer-group frame")
  }

  test("TrailingRange.agg matches the direct RANGE frame on NULLABLE values, " +
       "including all-NULL frames (r15, r14 advice)") {
    import org.apache.spark.sql.expressions.Window
    // ~60% NULL values so many frames are all-NULL: the prefix-sum
    // difference alone would answer 0 there; SQL's frame sum is NULL.
    val rnd = new scala.util.Random(15)
    val rows = (0 until 2000).map { i =>
      (i.toLong, rnd.nextInt(7).toLong, rnd.nextInt(50).toLong * 10L,
       if (rnd.nextInt(10) < 6) None else Some(rnd.nextInt(20000).toLong))
    }
    val df = rows.toDF("id", "k", "ord", "v")
    assert(df.schema("v").nullable, "fixture must exercise the nullable leg")
    val span = 40L
    val wd = Window.partitionBy(col("k")).orderBy(col("ord"))
      .rangeBetween(-span, 0)
    val direct = df.withColumn("s", sum(col("v")).over(wd)).select("id", "s")
    val got = TrailingRange.agg(df, Seq(col("k")), col("ord"), span,
        Seq("s" -> col("v")))
      .select(col("id"), col("s").cast(direct.schema("s").dataType))
    assert(direct.where(col("s").isNull).count() > 0,
      "fixture must contain all-NULL frames")
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty,
      "nullable prefix-sum trailing frame must equal the direct RANGE frame")
  }
}
