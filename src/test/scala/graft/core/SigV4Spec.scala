package graft.core

import java.net.{InetAddress, InetSocketAddress, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.time.Instant

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[SigV4Signer]] (r10) — pure-JDK AWS Signature Version 4:
  *
  *  1. the PUBLISHED AWS reference vector (the IAM ListUsers GET example
  *     from the SigV4 documentation) must reproduce bit-for-bit;
  *  2. an end-to-end loopback HTTP store whose server INDEPENDENTLY
  *     re-derives the signature (its own inline HMAC chain, not the
  *     library's) and rejects anything unsigned or mis-signed — the
  *     [[HttpConditionalStore]] with a signer passes, without one it is
  *     refused. */
class SigV4Spec extends AnyFunSuite {

  test("AWS documentation reference vector reproduces exactly") {
    val signer = SigV4Signer(
      accessKey = "AKIDEXAMPLE",
      secretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
      region = "us-east-1", service = "iam")
    val headers = signer.authHeaders(
      method = "GET",
      uri = URI.create("https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"),
      headersToSign = Map(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8"),
      payloadSha256Hex = SigV4.EmptyPayloadSha256,
      at = Instant.parse("2015-08-30T12:36:00Z"))
    assert(headers("x-amz-date") == "20150830T123600Z")
    assert(headers("Authorization") ==
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
      "SignedHeaders=content-type;host;x-amz-date, " +
      "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
    assert(!headers.contains("x-amz-security-token"))
    // temporary credentials sign AND ship the session token
    val withTok = signer.copy(sessionToken = Some("SESTOK")).authHeaders(
      "GET", URI.create("https://iam.amazonaws.com/"),
      Map.empty, SigV4.EmptyPayloadSha256, Instant.parse("2015-08-30T12:36:00Z"))
    assert(withTok("x-amz-security-token") == "SESTOK")
    assert(withTok("Authorization").contains("x-amz-security-token"))
  }

  test("canonical query: sorted, strict RFC 3986, empty values kept") {
    // %7E decodes to unreserved '~' and re-encodes bare; duplicate keys
    // sort by VALUE byte order ('1' 0x31 < '~' 0x7E)
    assert(SigV4.canonicalQuery(
      URI.create("https://h/?b=2&a=1&a=%7E&empty")) == "a=1&a=~&b=2&empty=")
    assert(SigV4.canonicalQuery(URI.create("https://h/p")) == "")
    assert(SigV4.rfc3986("a b/c~d") == "a%20b%2Fc~d")
  }

  /** Loopback store that VERIFIES SigV4 before acting: 403 unless the
    * Authorization header's signature matches the server's OWN
    * re-derivation (inline javax.crypto — independent of the library
    * code under test). */
  private class VerifyingStore(rootDir: String, secret: String) {
    val rejected = new java.util.concurrent.atomic.AtomicInteger(0)
    private val server = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    server.createContext("/", (x: HttpExchange) => handle(x))
    server.start()
    def endpoint: URI = URI.create(
      s"http://${InetAddress.getLoopbackAddress.getHostAddress}:${server.getAddress.getPort}")
    def stop(): Unit = server.stop(0)

    private def hmacSha(key: Array[Byte], s: String): Array[Byte] = {
      val m = javax.crypto.Mac.getInstance("HmacSHA256")
      m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
      m.doFinal(s.getBytes(UTF_8))
    }
    private def shaHex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256").digest(b)
        .map(x => f"${x & 0xff}%02x").mkString

    private def verify(x: HttpExchange, body: Array[Byte]): Boolean = {
      val auth = Option(x.getRequestHeaders.getFirst("Authorization")).getOrElse(return false)
      val re = ("AWS4-HMAC-SHA256 Credential=([^/]+)/(\\d{8})/([^/]+)/([^/]+)/aws4_request, " +
        "SignedHeaders=([^,]+), Signature=([0-9a-f]{64})").r
      auth match {
        case re(_, date, region, service, signedHeaders, sig) =>
          val names = signedHeaders.split(";").toSeq
          val canonicalHeaders = names.map { n =>
            val v = if (n == "host") x.getRequestHeaders.getFirst("Host")
                    else x.getRequestHeaders.getFirst(n)
            s"$n:${Option(v).getOrElse("").trim}\n"
          }.mkString
          val canonical = Seq(x.getRequestMethod,
            x.getRequestURI.getRawPath, Option(x.getRequestURI.getRawQuery).getOrElse(""),
            canonicalHeaders, signedHeaders, shaHex(body)).mkString("\n")
          val sts = Seq("AWS4-HMAC-SHA256",
            x.getRequestHeaders.getFirst("x-amz-date"),
            s"$date/$region/$service/aws4_request",
            shaHex(canonical.getBytes(UTF_8))).mkString("\n")
          val key = Seq(date, region, service, "aws4_request")
            .foldLeft(("AWS4" + secret).getBytes(UTF_8))(hmacSha)
          val want = hmacSha(key, sts).map(b => f"${b & 0xff}%02x").mkString
          want == sig
        case _ => false
      }
    }

    private def handle(x: HttpExchange): Unit = try {
      val body =
        if (x.getRequestMethod == "PUT") x.getRequestBody.readAllBytes()
        else Array.empty[Byte]
      if (!verify(x, body)) { rejected.incrementAndGet(); x.sendResponseHeaders(403, -1); return }
      val p = Paths.get(x.getRequestURI.getPath)
      x.getRequestMethod match {
        case "PUT" =>
          val status =
            try {
              Files.createDirectories(p.getParent)
              Files.write(p, body, java.nio.file.StandardOpenOption.CREATE_NEW)
              200
            } catch { case _: java.nio.file.FileAlreadyExistsException => 412 }
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

  test("end-to-end: a signature-verifying loopback store accepts signed requests only") {
    val dir = SparkTestSession.tmp("graft-sigv4")
    Files.createDirectories(Paths.get(dir))
    val secret = "test-secret-key/with+specials"
    val server = new VerifyingStore(dir, secret)
    try {
      val signer = SigV4Signer("AKTEST", secret, "eu-west-1", "s3")
      val store = new HttpConditionalStore(
        HttpConditionalStore.pathStyle(server.endpoint), signer = Some(signer))
      val key = s"file:$dir/manifest-000000000001.json"
      assert(store.get(key).isEmpty)
      assert(store.putIfAbsent(key, "signed".getBytes(UTF_8)))
      assert(!store.putIfAbsent(key, "later".getBytes(UTF_8)), "conflict must 412")
      assert(store.get(key).map(new String(_, UTF_8)).contains("signed"))
      assert(server.rejected.get() == 0, "every signed request must verify")

      // the unsigned store is refused by the same server
      val unsigned = new HttpConditionalStore(
        HttpConditionalStore.pathStyle(server.endpoint))
      intercept[java.io.IOException](unsigned.get(key))
      assert(server.rejected.get() > 0)
    } finally server.stop()
  }
}
