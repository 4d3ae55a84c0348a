package graft.core

import java.net.{InetAddress, InetSocketAddress, URI}
import java.nio.file.{Files, FileAlreadyExistsException, Paths, StandardOpenOption}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[HttpConditionalStore]] — the compiled wire-level conditional-PUT
  * binding — exercised against a FILESYSTEM-BACKED mock object store
  * served over real loopback HTTP by the JDK's HttpServer: PUT honors
  * `If-None-Match: *` with an atomic create-new (412 on conflict, like
  * S3), GET serves the bytes back (404 when absent), and because the
  * "objects" are the actual manifest files on disk, the engine's
  * readers see every commit the arbiter lands — so the full
  * multi-writer path (registerCommitArbiter → ConditionalPutArbiter →
  * HTTP → disk) runs end-to-end with zero SDK and zero egress. */
class HttpConditionalPutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Loopback object-store endpoint over a sandbox directory. URL path =
    * filesystem path (confined to `rootDir`). `delayAfterWriteMs` > 0
    * makes the next PUT land its bytes and then stall past the client
    * timeout — the "timeout after landing" transport ambiguity. */
  private class FsHttpStore(rootDir: String) {
    @volatile var delayAfterWriteMs: Long = 0
    val puts = new java.util.concurrent.atomic.AtomicInteger(0)
    private val server = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    server.createContext("/", (x: HttpExchange) => handle(x))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()

    def endpoint: URI = URI.create(
      s"http://${InetAddress.getLoopbackAddress.getHostAddress}:${server.getAddress.getPort}")
    def stop(): Unit = server.stop(0)

    private def handle(x: HttpExchange): Unit = try {
      val p = Paths.get(x.getRequestURI.getPath)
      if (!p.startsWith(Paths.get(rootDir))) { x.sendResponseHeaders(403, -1); return }
      x.getRequestMethod match {
        case "PUT" =>
          puts.incrementAndGet()
          // the mock ENFORCES the precondition header: a client that
          // forgot it would overwrite — refuse like a misconfigured call
          if (x.getRequestHeaders.getFirst("If-None-Match") != "*") {
            x.sendResponseHeaders(400, -1); return
          }
          val body = x.getRequestBody.readAllBytes()
          val status =
            try {
              Files.createDirectories(p.getParent)
              Files.write(p, body, StandardOpenOption.CREATE_NEW)
              if (delayAfterWriteMs > 0) {
                val d = delayAfterWriteMs; delayAfterWriteMs = 0
                Thread.sleep(d) // client times out; bytes already landed
              }
              200
            } catch { case _: FileAlreadyExistsException => 412 }
          x.sendResponseHeaders(status, -1)
        case "GET" =>
          if (Files.exists(p)) {
            val b = Files.readAllBytes(p)
            x.sendResponseHeaders(200, if (b.isEmpty) -1 else b.length.toLong)
            if (b.nonEmpty) x.getResponseBody.write(b)
          } else x.sendResponseHeaders(404, -1)
        case _ => x.sendResponseHeaders(405, -1)
      }
    } finally x.close()
  }

  private def newStore(dir: String, server: FsHttpStore): HttpConditionalStore =
    new HttpConditionalStore(
      HttpConditionalStore.pathStyle(server.endpoint),
      requestTimeout = java.time.Duration.ofMillis(1500))

  private lazy val localFs = Collection.fileSystem(spark, "/tmp")

  private def mkTmp(dir: String, tag: String): Path = {
    val p = new Path(dir, s"m.$tag.tmp")
    val out = localFs.create(p, true); out.write(tag.getBytes("UTF-8")); out.close()
    p
  }

  test("wire semantics: create-new 2xx, conflict 412, GET round-trip, 404 when absent") {
    val dir = SparkTestSession.tmp("graft-http-wire")
    Files.createDirectories(Paths.get(dir))
    val server = new FsHttpStore(dir)
    try {
      val store = newStore(dir, server)
      val key = s"file:$dir/manifest-000000000001.json"
      assert(store.get(key).isEmpty)
      assert(store.putIfAbsent(key, "alpha".getBytes("UTF-8")), "first put must create")
      assert(!store.putIfAbsent(key, "beta".getBytes("UTF-8")), "second put must 412")
      assert(store.get(key).map(new String(_, "UTF-8")).contains("alpha"))
      // the object IS the file — engine readers would see it directly
      assert(Files.readAllBytes(Paths.get(dir, "manifest-000000000001.json"))
        .sameElements("alpha".getBytes("UTF-8")))
    } finally server.stop()
  }

  test("racing publishes over real HTTP: one winner, content identity decides") {
    val dir = SparkTestSession.tmp("graft-http-race")
    Files.createDirectories(Paths.get(dir))
    val server = new FsHttpStore(dir)
    try {
      val arb = new ConditionalPutArbiter(newStore(dir, server))
      for (round <- 1 to 5) {
        val tgt = new Path(dir, f"manifest-$round%012d.json")
        val tmps = Seq(mkTmp(dir, s"A$round"), mkTmp(dir, s"B$round"))
        val barrier = new java.util.concurrent.CyclicBarrier(2)
        val won = new Array[Boolean](2)
        val threads = tmps.zipWithIndex.map { case (t, i) =>
          new Thread(() => { barrier.await(); won(i) = arb.publish(localFs, t, tgt) })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
        assert(won.count(identity) == 1, s"round $round: got ${won.toSeq}")
        val winner = if (won(0)) s"A$round" else s"B$round"
        assert(new String(Files.readAllBytes(
          Paths.get(dir, f"manifest-$round%012d.json")), "UTF-8") == winner)
      }
    } finally server.stop()
  }

  test("HTTP timeout after the PUT landed resolves to WON by content read-back") {
    val dir = SparkTestSession.tmp("graft-http-amb")
    Files.createDirectories(Paths.get(dir))
    val server = new FsHttpStore(dir)
    try {
      val arb = new ConditionalPutArbiter(newStore(dir, server))
      val tgt = new Path(dir, "manifest-000000000001.json")
      server.delayAfterWriteMs = 4000 // past the 1.5 s request timeout
      assert(arb.publish(localFs, mkTmp(dir, "mine"), tgt),
        "bytes landed before the timeout — the writer must learn it WON")
      assert(new String(Files.readAllBytes(
        Paths.get(dir, "manifest-000000000001.json")), "UTF-8") == "mine")
    } finally server.stop()
  }

  test("end-to-end: concurrent inserts commit through the HTTP conditional-PUT arbiter") {
    val root = SparkTestSession.tmp("graft-http-e2e")
    Files.createDirectories(Paths.get(root))
    val server = new FsHttpStore(root)
    val df = Seq((0L, 1L, 1.0)).toDF("a", "seq", "v")
    val c = Collection.create(spark, root, df.schema, "seq",
      SequencePartitioning(Seq("a"), "seq"))
    c.insert(df)
    Collection.registerCommitArbiter("file",
      new ConditionalPutArbiter(newStore(root, server)))
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
      val got = Collection.open(spark, root, readOnly = true)
        .query().select("a").as[Long].collect().sorted.toSeq
      assert(got == Seq(0L, 1L, 2L), s"got $got")
    } finally {
      Collection.unregisterCommitArbiter("file")
      server.stop()
    }
  }
}
