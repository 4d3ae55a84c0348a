package graft.core

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers
import java.time.Duration

/** COMPILED [[ConditionalObjectStore]] binding over plain HTTP — the
  * conditional-PUT wire protocol every S3-class store speaks, driven
  * through the JDK's own `java.net.http.HttpClient` so it needs NO SDK
  * on the classpath:
  *
  *  - `putIfAbsent` = `PUT <url>` with `If-None-Match: *` — 2xx means
  *    the object was created (we won), 412 (S3/GCS) or 409 (Azure Blob)
  *    means an object already existed (the atomic-claim loss verdict);
  *  - `get` = `GET <url>` — 200 body or 404 None.
  *
  * Atomicity is the SERVICE's contract (S3 documents `If-None-Match`
  * PutObject as atomic across concurrent writers; GCS
  * `x-goog-if-generation-match: 0` and Azure `If-None-Match: *`
  * likewise) — this class faithfully transports it and classifies the
  * responses; anything else (connect failure, timeout, 5xx) throws, so
  * [[ConditionalPutArbiter]]'s ambiguity resolution takes over exactly
  * as with an SDK binding. Reference contract: the Icechunk store's
  * conditional-update sessions (store/icechunk_store.py:112-170).
  *
  * `toUrl` maps the engine's commit key (the qualified manifest target
  * path, e.g. `s3a://bucket/coll/_manifest/manifest-000000000042.json`)
  * onto the endpoint URL; [[HttpConditionalStore.pathStyle]] builds the
  * standard path-style mapping. Auth: pass a [[SigV4Signer]] for
  * real-AWS (or any SigV4-speaking) endpoints — r10, pure-JDK signing,
  * no SDK — or use `customize` for static-token schemes.
  * Unauthenticated/self-signed deployments (MinIO in a VPC, a storage
  * proxy) work as-is.
  */
final class HttpConditionalStore(
    toUrl: String => URI,
    customize: HttpRequest.Builder => HttpRequest.Builder = identity,
    requestTimeout: Duration = Duration.ofSeconds(30),
    client: HttpClient = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10)).build(),
    /** r10: built-in [[SigV4Signer]] — set for real-AWS (or any
      * SigV4-speaking) endpoints and every request carries
      * `x-amz-content-sha256`, `x-amz-date`, the session token if any,
      * and the `Authorization` credential line; `customize` still runs
      * AFTER signing (add only unsigned headers there, or they would
      * not be covered). None = unauthenticated, as before. */
    signer: Option[SigV4Signer] = None)
    extends ConditionalObjectStore {

  private def signed(b: HttpRequest.Builder, method: String, url: URI,
                     payloadSha256Hex: String): HttpRequest.Builder =
    signer.fold(b) { sg =>
      val withHash = b.header("x-amz-content-sha256", payloadSha256Hex)
      sg.authHeaders(method, url,
          Map("x-amz-content-sha256" -> payloadSha256Hex), payloadSha256Hex)
        .foldLeft(withHash) { case (bb, (k, v)) => bb.header(k, v) }
    }

  override def putIfAbsent(key: String, content: Array[Byte]): Boolean = {
    val url = toUrl(key)
    val req = customize(signed(HttpRequest.newBuilder(url)
      .timeout(requestTimeout)
      .header("If-None-Match", "*")
      .PUT(BodyPublishers.ofByteArray(content)),
      "PUT", url, SigV4.sha256Hex(content))).build()
    val resp: HttpResponse[Void] = client.send(req, BodyHandlers.discarding())
    resp.statusCode() match {
      case c if c / 100 == 2 => true
      case 412 | 409         => false // S3/GCS precondition, Azure conflict
      case c => throw new java.io.IOException(
        s"conditional PUT $url returned HTTP $c — cannot classify as won/lost")
    }
  }

  override def get(key: String): Option[Array[Byte]] = {
    val url = toUrl(key)
    val req = customize(signed(HttpRequest.newBuilder(url)
      .timeout(requestTimeout).GET(),
      "GET", url, SigV4.EmptyPayloadSha256)).build()
    val resp = client.send(req, BodyHandlers.ofByteArray())
    resp.statusCode() match {
      case c if c / 100 == 2 => Some(resp.body())
      case 404               => None
      case c => throw new java.io.IOException(s"GET $url returned HTTP $c")
    }
  }
}

object HttpConditionalStore {

  /** Path-style endpoint mapping: `scheme://bucket/a/b` →
    * `<endpoint>/bucket/a/b` (the S3-compatible layout MinIO and most
    * proxies serve; virtual-hosted-style callers supply their own
    * `toUrl`). A key with no authority maps by its path alone — which
    * makes a loopback endpoint over `file:` keys the natural
    * integration-test transport. */
  def pathStyle(endpoint: URI): String => URI = { key =>
    val k = URI.create(key)
    val bucket = Option(k.getAuthority).filter(_.nonEmpty)
    val rel = (bucket.toSeq :+ k.getPath.stripPrefix("/")).mkString("/")
    URI.create(endpoint.toString.stripSuffix("/") + "/" + rel)
  }
}
