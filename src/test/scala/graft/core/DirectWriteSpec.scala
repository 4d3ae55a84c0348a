package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The zero-rename DIRECT write protocol ([[DirectWriteProtocol]],
  * `spark.graft.write.mode=direct` — the default on object-store
  * schemes): tasks write final uniquely-named files straight into the
  * partition dirs, and the commit's file set comes from task commit
  * messages, never from listing. The contract under test:
  *
  *  1. the committed manifest references EXACTLY the files the write job
  *     created (file-set contract — nothing adopted, nothing lost);
  *  2. results are byte-equal to the staged protocol's;
  *  3. no `_stage` subtree is ever created;
  *  4. crash orphans (a file another writer abandoned in a partition
  *     dir) are never adopted by a direct commit, and [[Collection
  *     .vacuum]] still reclaims them (the crash-orphan story holds
  *     without the staged dir's wholesale cleanup);
  *  5. concurrent direct writers to the same collection commit both
  *     file sets without clobbering (unique names, no shared committer).
  */
class DirectWriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def events(n: Int, dayOff: Int = 0) =
    (0 until n).map(i => (i.toLong, f"2024-01-${(i % 5) + 1 + dayOff}%02d 10:00:00", i * 1.5))
      .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))

  /** All data files under `root`, as root-relative paths. */
  private def dataFiles(root: String): Set[String] = {
    val fs = Collection.fileSystem(spark, root)
    val it = fs.listFiles(new Path(root), true)
    val out = Set.newBuilder[String]
    val rootUri = fs.makeQualified(new Path(root)).toUri.getPath.stripSuffix("/")
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath.toUri.getPath
      val rel = p.stripPrefix(rootUri).stripPrefix("/")
      if (rel.contains("=") && !rel.startsWith("_") && rel.endsWith(".parquet"))
        out += rel
    }
    out.result()
  }

  private def withMode[A](mode: String)(body: => A): A = {
    val prev = spark.conf.getOption(Collection.DirectWriteModeKey)
    spark.conf.set(Collection.DirectWriteModeKey, mode)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Collection.DirectWriteModeKey, v)
      case None    => spark.conf.unset(Collection.DirectWriteModeKey)
    }
  }

  test("direct commit references exactly the files the job wrote; no _stage dir") {
    val root = SparkTestSession.tmp("graft-direct")
    val df = events(200)
    withMode("direct") {
      val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
      c.insert(df)
      val fs = Collection.fileSystem(spark, root)
      assert(!fs.exists(new Path(s"$root/${Collection.StageDir}")),
        "direct mode must never create a staging dir")
      // file-set contract: manifest files == data files on disk, 1:1
      val man = c.currentManifest().files.toSet
      val onDisk = dataFiles(root)
      assert(man == onDisk, s"manifest=${man.size} disk=${onDisk.size}")
      assert(c.query().count() == 200)
    }
  }

  test("direct and staged protocols produce identical query results") {
    val df = events(300)
    val rootD = SparkTestSession.tmp("graft-direct-eq")
    val rootS = SparkTestSession.tmp("graft-staged-eq")
    withMode("direct") {
      val c = Collection.create(spark, rootD, df.schema, "ts", DatePartitioning("ts", "D"))
      c.insert(df)
    }
    withMode("staged") {
      val c = Collection.create(spark, rootS, df.schema, "ts", DatePartitioning("ts", "D"))
      c.insert(df)
    }
    val d = Collection.open(spark, rootD).query().orderBy("id").collect()
    val s = Collection.open(spark, rootS).query().orderBy("id").collect()
    assert(d.toSeq == s.toSeq)
  }

  test("crash orphans in partition dirs are not adopted and vacuum reclaims them") {
    val root = SparkTestSession.tmp("graft-direct-orphan")
    val df = events(50)
    withMode("direct") {
      val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
      c.insert(df)
      val before = c.query().count()
      // a crashed writer's leftover: a real parquet file in a partition
      // dir, never referenced by any manifest
      val fs = Collection.fileSystem(spark, root)
      val srcRel = dataFiles(root).head
      val orphanSrc = new Path(s"$root/$srcRel")
      val orphan = new Path(orphanSrc.getParent,
        "part-99999-deadbeef-a0.c000.snappy.parquet")
      val orphanRel = srcRel.split("/").dropRight(1).mkString("/") +
        "/" + orphan.getName
      org.apache.hadoop.fs.FileUtil.copy(fs, orphanSrc, fs, orphan, false,
        spark.sparkContext.hadoopConfiguration)
      // reads are manifest-governed: the orphan is invisible
      assert(c.query().count() == before)
      // a subsequent direct commit does not adopt it either
      c.insert(events(10), MergeStrategy.Concat)
      assert(!c.currentManifest().files.contains(orphanRel))
      // age the orphan out of the grace window, then vacuum reclaims it
      fs.setTimes(orphan, System.currentTimeMillis() - 24L * 3600 * 1000, -1)
      val reclaimed = c.vacuum(graceMs = 60000)
      assert(reclaimed.contains(orphanRel))
      assert(!fs.exists(orphan))
      assert(c.query().count() == before + 10)
    }
  }

  test("concurrent direct writers commit disjoint file sets without clobbering") {
    val root = SparkTestSession.tmp("graft-direct-conc")
    val df = events(20)
    withMode("direct") {
      val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
      c.insert(df)
      import java.util.concurrent.{CountDownLatch, Executors}
      val pool = Executors.newFixedThreadPool(2)
      val gate = new CountDownLatch(1)
      // disjoint day ranges: the race under test is the write/registry
      // path, not the (separately spec'd) same-partition commit conflict
      def run(lo: Int, dayOff: Int): java.util.concurrent.Future[_] =
        pool.submit(new Runnable {
          def run(): Unit = {
            gate.await()
            Collection.open(spark, root).insert(events(20, dayOff)
              .withColumn("id", col("id") + lit(lo)))
          }
        })
      val (f1, f2) = (run(1000, 5), run(2000, 10))
      gate.countDown()
      f1.get(); f2.get(); pool.shutdown()
      assert(Collection.open(spark, root).query().count() == 60)
    }
  }
}
