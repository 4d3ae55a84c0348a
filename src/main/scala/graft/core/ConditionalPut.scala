package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** The one object-store primitive graft's commit protocol needs: an
  * atomic create-if-absent of a whole object. S3 exposes it as
  * `PutObject` with `If-None-Match: "*"` (HTTP 412 on conflict — GA on
  * general-purpose buckets since 2024), GCS as `x-goog-if-generation-
  * match: 0`, Azure Blob as `If-None-Match: *`. The reference's
  * Icechunk store drives the identical session contract through
  * conditional updates (store/icechunk_store.py:159-170).
  *
  * Implementations MUST be genuinely atomic at the service (two
  * concurrent `putIfAbsent` of one key: exactly one true) and MUST make
  * a successful put durably visible to readers of the same URI before
  * returning — on a real object store the put IS the write, so this
  * holds by construction.
  *
  * [[HttpConditionalStore]] is the COMPILED wire-level binding (JDK
  * HttpClient, `If-None-Match: *` — no SDK needed; auth plugs in via
  * its request customizer). An AWS-SDK adapter, for deployments that
  * prefer the SDK's credential/retry stack, stays a few lines:
  * {{{
  *   class S3Store(s3: S3Client) extends ConditionalObjectStore {
  *     def putIfAbsent(uri: String, content: Array[Byte]) =
  *       try { s3.putObject(PutObjectRequest.builder()
  *               .bucket(b(uri)).key(k(uri)).ifNoneMatch("*").build(),
  *               RequestBody.fromBytes(content)); true }
  *       catch { case e: S3Exception if e.statusCode == 412 => false }
  *     def get(uri: String) = ...  // GetObject, None on NoSuchKey
  *   }
  *   Collection.registerCommitArbiter("s3a", new ConditionalPutArbiter(new S3Store(client)))
  * }}}
  */
trait ConditionalObjectStore {
  /** Create `key` with `content` IFF the key is absent. True = created;
    * false = the key already existed (the 412 verdict). May throw on
    * transport ambiguity — the caller cannot then know whether the
    * object landed. */
  def putIfAbsent(key: String, content: Array[Byte]): Boolean

  /** Full content of `key`, or None if absent. */
  def get(key: String): Option[Array[Byte]]
}

/** [[Collection.CommitArbiter]] over a conditional-PUT object store —
  * the multi-writer commit primitive for S3-class stores, where plain
  * rename overwrites and the staged local protocol cannot arbitrate.
  *
  * The subtlety is AMBIGUITY, not the happy path: a timeout after the
  * bytes left may mean the PUT landed or not. Blindly retrying would
  * see its OWN object and misreport "lost" (a rebase past one's own
  * commit duplicates data — the same failure publishExclusive guards
  * against on local filesystems); blindly failing would orphan a
  * possibly-committed generation. So every uncertain outcome resolves
  * by reading the target back and comparing content: our bytes there
  * means WE won (a previous attempt landed), other bytes means a rival
  * won, absence means the put genuinely failed and is safe to retry.
  * Two same-generation manifests are never byte-identical (each carries
  * a writer-unique `commitNonce`, stamped at publish precisely so this
  * comparison is decisive), so content identity is writer identity.
  *
  * The `tmp` file the engine staged locally is only the payload source
  * here — an object store has no rename, so the conditional PUT of the
  * final key is itself the publish. `tmp` is deleted on every exit. */
final class ConditionalPutArbiter(
    store: ConditionalObjectStore,
    maxAttempts: Int = 4) extends Collection.CommitArbiter {
  require(maxAttempts >= 1, "maxAttempts must be >= 1")

  def publish(fs: FileSystem, tmp: Path, target: Path): Boolean = {
    val payload = readAll(fs, tmp)
    try {
      var attempt = 0
      while (true) {
        val outcome =
          try Some(store.putIfAbsent(target.toString, payload))
          catch { case scala.util.control.NonFatal(_) => None }
        outcome match {
          case Some(true) => return true
          case Some(false) =>
            // 412: an object exists. Ours (an earlier ambiguous attempt
            // that landed) = won; a rival's = lost, caller rebases.
            return store.get(target.toString).exists(_.sameElements(payload))
          case None =>
            store.get(target.toString) match {
              case Some(existing) => return existing.sameElements(payload)
              case None =>
                // nothing landed: a genuine transport failure. Retry with
                // a bounded budget; past it, surface the outage rather
                // than guessing (an exception aborts THIS commit only —
                // no generation was claimed).
                attempt += 1
                if (attempt >= maxAttempts)
                  throw new java.io.IOException(
                    s"conditional PUT of $target failed $attempt times with no " +
                    "object landing; object store unreachable — commit aborted")
            }
        }
      }
      false // unreachable
    } finally {
      try fs.delete(tmp, false) catch { case _: Exception => () }
    }
  }

  private def readAll(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }
}
