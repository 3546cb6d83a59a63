package graft.storage.s3

import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing — the published algorithm
  * (docs.aws.amazon.com/IAM/latest/UserGuide/create-signed-request.html),
  * implemented over JDK crypto only. Signs the minimal header set S3
  * requires: `host`, `x-amz-date`, `x-amz-content-sha256` plus any
  * `x-amz-*` extras the caller passes (e.g. `x-amz-copy-source`).
  */
object SigV4 {
  private val AmzDate = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
    .withZone(ZoneOffset.UTC)

  def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"$b%02x").mkString

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** Signed header map for one request. `uri` must already carry the
    * canonical (percent-encoded) path and query. Returns the headers to
    * attach: x-amz-date, x-amz-content-sha256, authorization, plus the
    * passthrough extras.
    */
  def sign(method: String, uri: URI, payloadSha256: String,
           region: String, accessKey: String, secretKey: String,
           extraHeaders: Map[String, String] = Map.empty,
           now: Instant = Instant.now()): Map[String, String] = {
    val amzDate = AmzDate.format(now)
    val dateStamp = amzDate.take(8)
    val host = uri.getHost +
      (if (uri.getPort > 0) s":${uri.getPort}" else "")

    val baseHeaders = Map(
      "host" -> host,
      "x-amz-content-sha256" -> payloadSha256,
      "x-amz-date" -> amzDate) ++
      extraHeaders.map { case (k, v) => k.toLowerCase -> v.trim }
    val signedNames = baseHeaders.keys.toSeq.sorted
    val canonicalHeaders =
      signedNames.map(n => s"$n:${baseHeaders(n)}\n").mkString
    val canonicalQuery = Option(uri.getRawQuery).getOrElse("")
      .split("&").filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
      }.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
    val canonicalPath =
      if (uri.getRawPath == null || uri.getRawPath.isEmpty) "/"
      else uri.getRawPath

    val canonicalRequest = Seq(method, canonicalPath, canonicalQuery,
      canonicalHeaders, signedNames.mkString(";"), payloadSha256)
      .mkString("\n")
    val scope = s"$dateStamp/$region/s3/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(UTF_8))).mkString("\n")

    val kDate = hmac(("AWS4" + secretKey).getBytes(UTF_8), dateStamp)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, "s3")
    val kSigning = hmac(kService, "aws4_request")
    val signature = hmac(kSigning, stringToSign).map(b => f"$b%02x").mkString

    baseHeaders - "host" + ("authorization" ->
      (s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
        s"SignedHeaders=${signedNames.mkString(";")}, " +
        s"Signature=$signature"))
  }
}
