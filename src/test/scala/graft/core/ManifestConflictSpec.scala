package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The commit protocol's optimistic-concurrency guard: a writer whose
  * target generation was claimed by someone else between its head read
  * and its commit must CONFLICT, never overwrite (the Icechunk
  * commit-conflict model). The race window is internal to a mutation, so
  * this spec drives the package-private commit directly. */
class ManifestConflictSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("committing an already-claimed generation raises a conflict and leaves it untouched") {
    val root = SparkTestSession.tmp("graft-conflict")
    val df = Seq((1L, "2024-01-01 10:00:00", 1.0))
      .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df) // head = generation 1

    val fs = Collection.fileSystem(spark, root)
    val dir = new Path(s"$root/${Collection.ManifestDir}")
    val head = c.currentManifest()
    val losing = head.withShards(head.generation, head.taskBase, Nil)
    val ex = intercept[java.util.ConcurrentModificationException] {
      Collection.writeManifest(fs, dir, losing) // generation already committed
    }
    assert(ex.getMessage.contains("another writer"))
    // the original commit is intact: full read still sees the data
    assert(c.query().count() == 1)
    assert(c.currentManifest().files.nonEmpty)
  }
}
