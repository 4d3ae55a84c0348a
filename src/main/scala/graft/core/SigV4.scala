package graft.core

import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS SIGNATURE VERSION 4 request signing in pure JDK — the last seam
  * the r9 verdict listed for [[HttpConditionalStore]]: real-AWS
  * deployments of the conditional-PUT commit arbiter need signed
  * requests, and the public SigV4 algorithm (an HMAC-SHA256 chain over
  * a canonicalized request — docs.aws.amazon.com/IAM/latest/UserGuide/
  * create-signed-request.html) needs no SDK:
  *
  *  1. canonical request: `METHOD \n path \n query \n headers \n
  *     signedHeaderNames \n payloadHash` — path taken as the raw
  *     (single-encoded, un-normalized) path the client sends, the
  *     S3-class convention; query params sorted and strictly
  *     RFC 3986-encoded; headers lowercased, trimmed, sorted;
  *  2. string to sign: `AWS4-HMAC-SHA256 \n <amzDate> \n
  *     <date/region/service/aws4_request> \n sha256(canonicalRequest)`;
  *  3. signing key: HMAC chain `"AWS4"+secret → date → region →
  *     service → "aws4_request"`; signature = hex HMAC of the string
  *     to sign;
  *  4. emitted headers: `x-amz-date`, optional
  *     `x-amz-security-token`, and the `Authorization` credential line.
  *
  * The signer is stateless and thread-safe; temporary credentials ride
  * `sessionToken` (signed, per the STS contract). Verified against the
  * published AWS reference vector (SigV4Spec) and end-to-end by a
  * loopback server re-deriving the signature (HttpConditionalPutSpec).
  */
final case class SigV4Signer(accessKey: String, secretKey: String,
                             region: String, service: String = "s3",
                             sessionToken: Option[String] = None) {
  import SigV4._

  /** Headers to ADD to the request: `x-amz-date`, the session token if
    * any, and `Authorization`. `headersToSign` are headers the caller
    * sends and wants covered by the signature (e.g. `content-type`,
    * `x-amz-content-sha256`) — `host` (from `uri`) and `x-amz-date` are
    * always covered; the JDK client sets the Host header itself. */
  def authHeaders(method: String, uri: URI,
                  headersToSign: Map[String, String],
                  payloadSha256Hex: String,
                  at: Instant = Instant.now()): Map[String, String] = {
    val amzDate = AmzDateFmt.format(at)
    val date = amzDate.substring(0, 8)
    val host = Option(uri.getAuthority).getOrElse(
      throw new IllegalArgumentException(s"no host in $uri"))
    val token = sessionToken.map("x-amz-security-token" -> _)
    val all = (headersToSign ++ token +
      ("host" -> host) + ("x-amz-date" -> amzDate))
      .map { case (k, v) => k.toLowerCase -> v.trim }
    val sortedNames = all.keys.toSeq.sorted
    val canonicalHeaders = sortedNames.map(n => s"$n:${all(n)}\n").mkString
    val signedHeaders = sortedNames.mkString(";")
    val canonicalRequest = Seq(
      method.toUpperCase,
      canonicalPath(uri),
      canonicalQuery(uri),
      canonicalHeaders,
      signedHeaders,
      payloadSha256Hex).mkString("\n")
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      hex(sha256(canonicalRequest.getBytes(UTF_8)))).mkString("\n")
    val kSigning = Seq(date, region, service, "aws4_request")
      .foldLeft(("AWS4" + secretKey).getBytes(UTF_8))((k, part) => hmac(k, part))
    val signature = hex(hmac(kSigning, stringToSign))
    Map(
      "x-amz-date" -> amzDate,
      "Authorization" -> (s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
        s"SignedHeaders=$signedHeaders, Signature=$signature")
    ) ++ token
  }
}

object SigV4 {
  private[core] val AmzDateFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)

  /** SHA-256 of an empty payload — the GET/DELETE `x-amz-content-sha256`. */
  val EmptyPayloadSha256 =
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"

  private[core] def sha256(bytes: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)

  def sha256Hex(bytes: Array[Byte]): String = hex(sha256(bytes))

  private[core] def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  private[core] def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  /** The raw path as the client sends it (single-encoded, not
    * normalized — the S3-class convention); empty path = "/". */
  private[core] def canonicalPath(uri: URI): String =
    Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")

  /** Query params sorted by (name, value), each strictly RFC 3986
    * encoded (unreserved characters only; spaces as %20, never '+'). */
  private[core] def canonicalQuery(uri: URI): String = {
    val raw = Option(uri.getRawQuery).getOrElse(return "")
    if (raw.isEmpty) return ""
    raw.split("&").filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      val (k, v) = if (i < 0) (kv, "") else (kv.substring(0, i), kv.substring(i + 1))
      (rfc3986(urlDecode(k)), rfc3986(urlDecode(v)))
    }.sortBy(identity).map { case (k, v) => s"$k=$v" }.mkString("&")
  }

  private def urlDecode(s: String): String =
    java.net.URLDecoder.decode(s, UTF_8)

  private[core] def rfc3986(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || c == '-' || c == '_' || c == '.' || c == '~') sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }
}
