package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[ConditionalPutArbiter]] — the S3-class multi-writer commit adapter
  * (conditional PUT / If-None-Match model). The store here is a mock:
  * the arbiter's VALUE is exactly the logic around the primitive —
  * atomic-claim arbitration, ambiguous-transport resolution by
  * content identity, bounded retries — and that logic is what a real
  * S3 binding would reuse untouched. */
class ConditionalPutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** In-memory conditional store; `failureMode` injects transport
    * ambiguity: "after" throws AFTER the put landed (client can't know),
    * "before" throws without landing anything. Both one-shot. */
  private class MemStore extends ConditionalObjectStore {
    val objects = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    @volatile var failureMode: String = ""
    val putAttempts = new java.util.concurrent.atomic.AtomicInteger(0)
    def putIfAbsent(key: String, content: Array[Byte]): Boolean = {
      putAttempts.incrementAndGet()
      failureMode match {
        case "before" =>
          failureMode = ""
          throw new java.io.IOException("injected: connection reset before send")
        case "after" =>
          failureMode = ""
          objects.putIfAbsent(key, content)
          throw new java.io.IOException("injected: timeout awaiting 200 OK")
        case _ =>
          objects.putIfAbsent(key, content) == null
      }
    }
    def get(key: String): Option[Array[Byte]] = Option(objects.get(key))
  }

  private lazy val localFs = Collection.fileSystem(spark, "/tmp")

  private def mkTmp(dir: String, tag: String): Path = {
    val p = new Path(dir, s"m.$tag.tmp")
    val out = localFs.create(p, true); out.write(tag.getBytes("UTF-8")); out.close()
    p
  }

  test("racing publishes: exactly one winner per target, losers' tmps cleaned") {
    val store = new MemStore
    val arb = new ConditionalPutArbiter(store)
    val dir = SparkTestSession.tmp("graft-condput-race")
    localFs.mkdirs(new Path(dir))
    for (round <- 1 to 20) {
      val tgt = new Path(dir, f"manifest-$round%012d.json")
      val tmps = Seq(mkTmp(dir, s"A$round"), mkTmp(dir, s"B$round"))
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val won = new Array[Boolean](2)
      val threads = tmps.zipWithIndex.map { case (t, i) =>
        new Thread(() => { barrier.await(); won(i) = arb.publish(localFs, t, tgt) })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(won.count(identity) == 1, s"round $round: got ${won.toSeq}")
      // the winner's bytes are the object; both tmps are gone
      val winner = if (won(0)) s"A$round" else s"B$round"
      assert(store.get(tgt.toString).map(new String(_, "UTF-8")).contains(winner))
      tmps.foreach(t => assert(!localFs.exists(t), s"tmp $t must be deleted"))
    }
  }

  test("ambiguous success (timeout after landing) resolves to WON by content identity") {
    val store = new MemStore
    val arb = new ConditionalPutArbiter(store)
    val dir = SparkTestSession.tmp("graft-condput-amb")
    localFs.mkdirs(new Path(dir))
    val tgt = new Path(dir, "manifest-000000000001.json")
    store.failureMode = "after"
    assert(arb.publish(localFs, mkTmp(dir, "mine"), tgt),
      "the put landed before the timeout — the writer must learn it WON, " +
      "not rebase past its own commit")
    assert(store.get(tgt.toString).map(new String(_, "UTF-8")).contains("mine"))
  }

  test("ambiguous failure (nothing landed) retries and succeeds") {
    val store = new MemStore
    val arb = new ConditionalPutArbiter(store)
    val dir = SparkTestSession.tmp("graft-condput-retry")
    localFs.mkdirs(new Path(dir))
    val tgt = new Path(dir, "manifest-000000000001.json")
    store.failureMode = "before"
    assert(arb.publish(localFs, mkTmp(dir, "mine"), tgt))
    assert(store.putAttempts.get() == 2, "one failed attempt + one retry")
  }

  test("a rival's object means LOST — whether seen as a 412 or during ambiguity") {
    val store = new MemStore
    val arb = new ConditionalPutArbiter(store)
    val dir = SparkTestSession.tmp("graft-condput-lost")
    localFs.mkdirs(new Path(dir))
    // plain 412: rival committed first
    val t1 = new Path(dir, "manifest-000000000001.json")
    store.objects.put(t1.toString, "rival".getBytes("UTF-8"))
    assert(!arb.publish(localFs, mkTmp(dir, "mine1"), t1))
    // ambiguity resolved against us: the object that exists is not ours
    val t2 = new Path(dir, "manifest-000000000002.json")
    store.failureMode = "before"
    store.objects.put(t2.toString, "rival2".getBytes("UTF-8"))
    assert(!arb.publish(localFs, mkTmp(dir, "mine2"), t2))
    // rival data untouched either way
    assert(store.get(t1.toString).map(new String(_, "UTF-8")).contains("rival"))
  }

  test("hard outage: bounded retries then a loud abort, no generation claimed") {
    val store = new MemStore {
      override def putIfAbsent(key: String, content: Array[Byte]): Boolean = {
        putAttempts.incrementAndGet()
        throw new java.io.IOException("injected: endpoint unreachable")
      }
    }
    val arb = new ConditionalPutArbiter(store, maxAttempts = 3)
    val dir = SparkTestSession.tmp("graft-condput-outage")
    localFs.mkdirs(new Path(dir))
    val tgt = new Path(dir, "manifest-000000000001.json")
    val ex = intercept[java.io.IOException](arb.publish(localFs, mkTmp(dir, "m"), tgt))
    assert(ex.getMessage.contains("commit aborted"))
    assert(store.putAttempts.get() == 3)
    assert(store.get(tgt.toString).isEmpty)
  }

  test("end-to-end: concurrent inserts commit through the conditional-PUT arbiter") {
    // a write-through store: the memory CAS decides the race, the bytes
    // land on the local FS so the engine's readers see the manifest —
    // on a real object store the PUT itself is both
    val store = new ConditionalObjectStore {
      private val claims = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
      def putIfAbsent(key: String, content: Array[Byte]): Boolean =
        if (claims.putIfAbsent(key, content) == null) {
          java.nio.file.Files.write(java.nio.file.Paths.get(key), content)
          true
        } else false
      def get(key: String): Option[Array[Byte]] = Option(claims.get(key))
    }
    val root = SparkTestSession.tmp("graft-condput-e2e")
    val df = Seq((0L, 1L, 1.0)).toDF("a", "seq", "v")
    val c = Collection.create(spark, root, df.schema, "seq",
      SequencePartitioning(Seq("a"), "seq"))
    c.insert(df)
    Collection.registerCommitArbiter("file", new ConditionalPutArbiter(store))
    try {
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = Seq(1L, 2L).map { a =>
        new Thread(() => {
          try {
            barrier.await()
            Collection.open(spark, root)
              .insert(Seq((a, a + 10L, a.toDouble)).toDF("a", "seq", "v"),
                MergeStrategy.Concat)
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"concurrent inserts failed: ${errs.peek()}")
      // both writers' rows landed (the loser rebased), via arbiter commits
      val got = Collection.open(spark, root, readOnly = true)
        .query().select("a").as[Long].collect().sorted.toSeq
      assert(got == Seq(0L, 1L, 2L), s"got $got")
    } finally Collection.unregisterCommitArbiter("file")
  }
}
