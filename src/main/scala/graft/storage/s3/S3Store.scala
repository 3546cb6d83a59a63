package graft.storage.s3

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import scala.jdk.CollectionConverters._
import graft.storage.{ObjectInfo, S3StoreConf, Store, StoreConf,
  TransientStorageException}

/** S3-compatible object store over `java.net.http` — the functional
  * equivalent of the reference's native S3 backend
  * (icechunk-s3/src/lib.rs): SigV4-signed requests, conditional PUT
  * (`If-None-Match: *`) for the commit CAS, '''ranged GETs''' (`Range:`
  * header), paged `ListObjectsV2`, batched `DeleteObjects`, server-side
  * copy, and multipart upload above a size threshold.
  *
  * Works against AWS, MinIO, or the in-process [[S3MemServer]] (the test
  * harness). Addressing is path-style (`endpoint/bucket/key`) so
  * non-DNS-bucket endpoints work. Empty `accessKey` sends unsigned
  * requests (stub/anonymous access).
  *
  * `rootUri` is a `graft://` URI understood by
  * [[graft.storage.hadoop.GraftFileSystem]], which adapts this store for
  * Spark's Parquet reader/writer — on a production cluster with s3a on the
  * classpath you would point Spark at `s3a://bucket/prefix` directly and
  * keep this client for the engine's object plane only.
  */
final class S3Store(val s3conf: S3StoreConf) extends Store {
  import s3conf._

  private val http = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(java.time.Duration.ofSeconds(30))
    .build()

  /** Stable authority for the graft:// filesystem: unique per
    * (endpoint, bucket, prefix).
    */
  val authority: String = "s3-" +
    SigV4.sha256Hex(s"$endpoint|$bucket|$prefix".getBytes(UTF_8)).take(16) +
    "-" + bucket.toLowerCase.replaceAll("[^a-z0-9]", "")

  override def rootUri: String = s"graft://$authority"
  override def conf: StoreConf = s3conf

  private def fullKey(key: String): String =
    if (prefix.isEmpty) key else prefix.stripSuffix("/") + "/" + key

  /** RFC 3986 encode each path segment, keep the '/' separators. */
  private def encPath(key: String): String =
    key.split("/", -1).map { seg =>
      java.net.URLEncoder.encode(seg, UTF_8)
        .replace("+", "%20").replace("*", "%2A").replace("%7E", "~")
    }.mkString("/")

  private def encQ(v: String): String =
    java.net.URLEncoder.encode(v, UTF_8)
      .replace("+", "%20").replace("*", "%2A").replace("%7E", "~")

  private def objectUri(key: String, query: String = ""): URI =
    URI.create(endpoint.stripSuffix("/") + "/" + bucket + "/" +
      encPath(fullKey(key)) + (if (query.isEmpty) "" else "?" + query))

  private def bucketUri(query: String): URI =
    URI.create(endpoint.stripSuffix("/") + "/" + bucket + "?" + query)

  private val EmptySha = SigV4.sha256Hex(Array.emptyByteArray)

  private def send(method: String, uri: URI, body: Array[Byte],
                   headers0: Map[String, String] = Map.empty)
      : HttpResponse[Array[Byte]] = {
    // configured headers under per-call ones (s3_storage(headers=...),
    // #2246); merged BEFORE signing so custom x-amz-* entries are
    // signed. x-amz-* keys are lowercased and values trimmed so the
    // signed copy REPLACES the original in the merge — a mixed-case
    // key would otherwise survive alongside its lowercased signed twin
    // and the doubled header breaks the SigV4 signature.
    val headers = (s3conf.headers ++ headers0).map { case (k, v) =>
      (if (k.toLowerCase.startsWith("x-amz-")) k.toLowerCase else k) ->
        v.trim
    }
    val payloadSha =
      if (body == null) EmptySha else SigV4.sha256Hex(body)
    val signed =
      if (accessKey.isEmpty) headers
      else headers ++ SigV4.sign(method, uri, payloadSha, region,
        accessKey, secretKey,
        headers.filter(_._1.toLowerCase.startsWith("x-amz-")))
    val b = HttpRequest.newBuilder(uri).method(method,
      if (body == null) HttpRequest.BodyPublishers.noBody()
      else HttpRequest.BodyPublishers.ofByteArray(body))
    if (accessKey.nonEmpty)
      b.header("x-amz-content-sha256", payloadSha)
    signed.foreach { case (k, v) =>
      // setHeader (replace, never add): a configured header must not
      // duplicate a built-in one — doubled headers break signatures
      if (!k.equalsIgnoreCase("host") &&
          !k.equalsIgnoreCase("x-amz-content-sha256")) b.setHeader(k, v)
    }
    try http.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    catch {
      case e: java.io.IOException =>
        throw new TransientStorageException(
          s"$method $uri failed: ${e.getMessage}")
    }
  }

  private def failed(op: String, key: String,
                     r: HttpResponse[Array[Byte]]): Nothing = {
    val body = new String(r.body(), UTF_8).take(300)
    if (r.statusCode() == 404)
      throw new java.nio.file.NoSuchFileException(key)
    if (r.statusCode() == 401 || r.statusCode() == 403)
      throw new graft.repo.GraftException(
        s"$op $key: HTTP ${r.statusCode()} $body", graft.repo.GraftError.Auth)
    if (r.statusCode() >= 500 || r.statusCode() == 429)
      throw new TransientStorageException(
        s"$op $key: HTTP ${r.statusCode()} $body")
    throw new java.io.UncheckedIOException(new java.io.IOException(
      s"$op $key: HTTP ${r.statusCode()} $body"))
  }

  // ---- reads ----

  override def getBytes(key: String): Array[Byte] = {
    val r = send("GET", objectUri(key), null)
    if (r.statusCode() == 200) r.body() else failed("GET", key, r)
  }

  override def getRange(key: String, offset: Long,
                        length: Long): Array[Byte] = {
    if (offset == 0 && length <= 0) return getBytes(key)
    val range =
      if (length <= 0) s"bytes=$offset-"
      else s"bytes=$offset-${offset + length - 1}"
    val r = send("GET", objectUri(key), null, Map("Range" -> range))
    r.statusCode() match {
      case 206 => r.body()
      case 200 =>
        // server ignored the Range header and sent the whole object
        val all = r.body()
        if (offset >= all.length) Array.emptyByteArray
        else {
          val end =
            if (length <= 0) all.length
            else math.min(offset + length, all.length.toLong).toInt
          java.util.Arrays.copyOfRange(all, offset.toInt, end)
        }
      case 416 => Array.emptyByteArray // range starts past EOF
      case _ => failed("GET(range)", key, r)
    }
  }

  override def exists(key: String): Boolean = {
    val r = send("HEAD", objectUri(key), null)
    r.statusCode() == 200
  }

  override def stat(key: String): Option[graft.storage.StatInfo] = {
    val r = send("HEAD", objectUri(key), null)
    if (r.statusCode() != 200) None
    else {
      def header(n: String): Option[String] =
        Option(r.headers().firstValue(n).orElse(null))
      val size = header("Content-Length").map(_.toLong).getOrElse(0L)
      val mtime = header("Last-Modified").map { v =>
        java.time.ZonedDateTime.parse(v,
          java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
          .toInstant.toEpochMilli
      }.getOrElse(0L)
      val etag = header("ETag").map(_.stripPrefix("\"").stripSuffix("\""))
        .getOrElse("")
      Some(graft.storage.StatInfo(size, mtime, etag))
    }
  }

  // ---- writes ----

  override def putBytes(key: String, bytes: Array[Byte]): Unit =
    if (bytes.length >= multipartThresholdBytes) multipartPut(key, bytes)
    else {
      val r = send("PUT", objectUri(key), bytes)
      if (r.statusCode() != 200) failed("PUT", key, r)
    }

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    val r = send("PUT", objectUri(key), bytes,
      Map("If-None-Match" -> "*"))
    r.statusCode() match {
      case 200 => true
      case 412 | 409 => false // S3: 412 PreconditionFailed; GCS XML: 409
      case _ => failed("PUT(if-absent)", key, r)
    }
  }

  override def copy(srcKey: String, dstKey: String): Unit =
    copyFromStore(this, srcKey, dstKey)

  /** CopyObject can return HTTP 200 whose BODY is an `<Error>` (the
    * documented slow-copy quirk: the service starts streaming the
    * response before the copy finishes, so a late failure cannot change
    * the status line). A 200 is therefore NOT success — the body must
    * carry a `<CopyObjectResult>`/`<CopyPartResult>` with an ETag.
    * AWS's guidance for the embedded error is "retry", so it surfaces
    * as [[TransientStorageException]].
    */
  private def checkCopyBody(op: String, key: String,
                            r: HttpResponse[Array[Byte]],
                            resultTag: String): String = {
    if (r.statusCode() != 200) failed(op, key, r)
    val body = new String(r.body(), UTF_8)
    if (body.contains("<Error>"))
      throw new TransientStorageException(
        s"$op $key: HTTP 200 with embedded error: ${body.take(300)}")
    if (!body.contains(s"<$resultTag>"))
      throw new java.io.UncheckedIOException(new java.io.IOException(
        s"$op $key: HTTP 200 without <$resultTag>: ${body.take(300)}"))
    xmlField(body, "ETag").getOrElse(
      throw new java.io.UncheckedIOException(new java.io.IOException(
        s"$op $key: <$resultTag> carries no ETag: ${body.take(300)}")))
  }

  /** Whether [[copyFromStore]] can replicate objects from `src` without
    * moving payload bytes through this client: `x-amz-copy-source` is
    * resolved BY THE SERVICE, so both stores must live behind the same
    * endpoint and this store's credentials must be able to read the
    * source (same access key is the conservative test — cross-account
    * copy grants exist but cannot be detected client-side).
    */
  def canCopyServerSide(src: S3Store): Boolean =
    s3conf.endpoint == src.s3conf.endpoint &&
      s3conf.accessKey == src.s3conf.accessKey &&
      s3conf.region == src.s3conf.region

  /** Server-side cross-bucket/prefix copy INTO this store — the 100 TB
    * replication path: a push between two repos on the same S3 service
    * moves zero payload bytes through the executor (the service copies
    * internally; cf. the reference's reliance on external object-sync
    * tooling, which reads+rewrites every byte).
    */
  /** `size` (when the caller already HEADed the source) gates the
    * route: single CopyObject is service-capped at 5 GiB
    * ([[graft.storage.S3StoreConf.copyMaxBytes]]) — above it the copy
    * runs as multipart UploadPartCopy, each part addressed by
    * `x-amz-copy-source-range` (still service-internal). `-1` = stat
    * the source here.
    */
  def copyFromStore(src: S3Store, srcKey: String, dstKey: String,
                    size: Long = -1L): Unit = {
    val sz = if (size >= 0L) size
             else src.stat(srcKey).map(_.size).getOrElse(0L)
    val copySource = "/" + src.s3conf.bucket + "/" +
      encPath(src.fullKey(srcKey))
    if (sz <= copyMaxBytes) {
      val r = send("PUT", objectUri(dstKey), null,
        Map("x-amz-copy-source" -> copySource))
      checkCopyBody("COPY(cross)", s"$srcKey -> $dstKey", r,
        "CopyObjectResult")
    } else {
      // multipart copy: initiate → UploadPartCopy per range → complete.
      // Part size: the configured multipart part size, floored at 8 MiB
      // to bound part count on huge objects, capped at the single-copy
      // ceiling (parts share CopyObject's 5 GiB limit).
      val partSize = math.min(copyMaxBytes,
        math.max(multipartPartBytes, 8L * 1024 * 1024))
      val init = send("POST", objectUri(dstKey, "uploads"),
        Array.emptyByteArray)
      if (init.statusCode() != 200) failed("POST(uploads)", dstKey, init)
      val uploadId = xmlField(new String(init.body(), UTF_8), "UploadId")
        .getOrElse(throw new IllegalStateException("no UploadId"))
      val nParts = ((sz + partSize - 1) / partSize).toInt
      // each UploadPartCopy is an independent service-internal range
      // copy — run them concurrently (same rationale and width as
      // multipartPut; a >5 GiB copy is otherwise nParts serial RTTs)
      val etags = graft.storage.Store.parallelIO(
        (0 until nParts).toSeq, maxThreads = 8) { i =>
        val from = i.toLong * partSize
        val to = math.min(from + partSize, sz) - 1
        val r = send("PUT",
          objectUri(dstKey,
            s"partNumber=${i + 1}&uploadId=${encQ(uploadId)}"),
          null,
          Map("x-amz-copy-source" -> copySource,
            "x-amz-copy-source-range" -> s"bytes=$from-$to"))
        val etag = checkCopyBody(s"COPY(part ${i + 1})",
          s"$srcKey -> $dstKey", r, "CopyPartResult")
        (i + 1) -> etag
      }
      val completion = etags.map { case (n, etag) =>
        s"<Part><PartNumber>$n</PartNumber><ETag>$etag</ETag></Part>"
      }.mkString("<CompleteMultipartUpload>", "",
        "</CompleteMultipartUpload>")
      val done = send("POST",
        objectUri(dstKey, s"uploadId=${encQ(uploadId)}"),
        completion.getBytes(UTF_8))
      if (done.statusCode() != 200) failed("POST(complete)", dstKey, done)
    }
  }

  /** Multipart upload (initiate → parts → complete) for large objects —
    * the reference's `put_multipart` path (icechunk-s3/src/lib.rs).
    */
  private def multipartPut(key: String, bytes: Array[Byte]): Unit = {
    val init = send("POST", objectUri(key, "uploads"), Array.emptyByteArray)
    if (init.statusCode() != 200) failed("POST(uploads)", key, init)
    val uploadId = xmlField(new String(init.body(), UTF_8), "UploadId")
      .getOrElse(throw new IllegalStateException("no UploadId"))
    val partSize = multipartPartBytes.toInt
    // parts are independent uploads — run them concurrently (the
    // reference's put_multipart does the same; a 1 GiB object at 32 MB
    // parts over a 150 ms store is otherwise 32 SEQUENTIAL round
    // trips). Order is preserved for the completion manifest; width 8
    // matches getRangeSplit's per-object stream concurrency. Parts are
    // sliced INSIDE the worker (ADVICE r13): materializing every part
    // copy up front doubles peak memory for exactly the multi-GiB
    // objects this path exists for — this way at most maxThreads part
    // copies are live at once (as the Azure blockPut path already does).
    val nParts = ((bytes.length.toLong + partSize - 1) / partSize).toInt
    val etags = graft.storage.Store.parallelIO(
      (0 until nParts): Seq[Int], maxThreads = 8) { i =>
      val (from, until) = S3Store.partBounds(bytes.length, partSize, i)
      val part = java.util.Arrays.copyOfRange(bytes, from, until)
      val n = i + 1
      val r = send("PUT",
        objectUri(key, s"partNumber=$n&uploadId=${encQ(uploadId)}"), part)
      if (r.statusCode() != 200) failed(s"PUT(part $n)", key, r)
      n -> r.headers().firstValue("ETag").orElse("\"\"")
    }
    val completion = etags.map { case (n, etag) =>
      s"<Part><PartNumber>$n</PartNumber><ETag>$etag</ETag></Part>"
    }.mkString("<CompleteMultipartUpload>", "",
      "</CompleteMultipartUpload>")
    val done = send("POST", objectUri(key, s"uploadId=${encQ(uploadId)}"),
      completion.getBytes(UTF_8))
    if (done.statusCode() != 200) failed("POST(complete)", key, done)
  }

  // ---- listing ----

  override def listPage(prefix0: String, startAfter: Option[String],
                        maxKeys: Int): Seq[ObjectInfo] =
    listPageTruncated(prefix0, startAfter, maxKeys)._1

  /** One page plus the server's IsTruncated flag and (when truncated)
    * its opaque NextContinuationToken — S3 may return FEWER than
    * max-keys with more remaining (even ZERO, an internal page
    * boundary), so page size is NOT a reliable end-of-listing signal
    * and the token is the ONLY resume handle that works on an empty
    * page. `resumeToken` wins over `startAfter` (S3 honors start-after
    * on the first request of a listing only).
    */
  private def listPageTruncated(prefix0: String, startAfter: Option[String],
                                maxKeys: Int,
                                resumeToken: Option[String] = None)
      : (Seq[ObjectInfo], Boolean, Option[String]) = {
    val q = Seq(
      Some("list-type=2"),
      Some(s"prefix=${encQ(fullKey(prefix0))}"),
      Some(s"max-keys=${math.max(1, math.min(maxKeys, 1000))}"),
      resumeToken.map(t => s"continuation-token=${encQ(t)}"),
      if (resumeToken.isEmpty)
        startAfter.map(sa => s"start-after=${encQ(fullKey(sa))}")
      else None
    ).flatten.mkString("&")
    val r = send("GET", bucketUri(q), null)
    if (r.statusCode() != 200) failed("LIST", prefix0, r)
    val body = new String(r.body(), UTF_8)
    (parseListing(body),
      xmlField(body, "IsTruncated").contains("true"),
      xmlField(body, "NextContinuationToken").map(xmlUnescape))
  }

  override def list(prefix0: String): Seq[ObjectInfo] = {
    val out = Vector.newBuilder[ObjectInfo]
    var after: Option[String] = None
    var token: Option[String] = None
    var more = true
    while (more) {
      val (page, truncated, next) = listPageTruncated(prefix0, after, 1000,
        token)
      out ++= page
      more = truncated
      token = next
      after = page.lastOption.map(_.key).orElse(after)
      // Empty page + IsTruncated=true + NO token: nothing to resume by —
      // continuing would respin the same request forever, and returning
      // would pass off a partial listing as complete. Fail loud. (With a
      // token — the shape S3 actually serves — the loop just resumes.)
      if (truncated && page.isEmpty && next.isEmpty)
        throw new java.io.IOException(
          s"LIST $prefix0: empty page with IsTruncated=true and no " +
            s"NextContinuationToken after ${out.result().size} keys — " +
            "cannot resume, listing is partial")
    }
    out.result()
  }

  override def listBounded(prefix0: String,
                           max: Int): (Seq[ObjectInfo], Boolean) = {
    // native continuation loop with early exit — IsTruncated is the end
    // signal, never the page size; empty pages resume via the token
    val out = Vector.newBuilder[ObjectInfo]
    var n = 0
    var after: Option[String] = None
    var token: Option[String] = None
    var more = true
    while (more) {
      val (page, truncated, next) = listPageTruncated(prefix0, after, 1000,
        token)
      out ++= page
      n += page.size
      if (n > max) return (out.result(), true)
      // truncated + empty page + no token: honestly partial — report
      // truncated (callers fall to the distributed path, which is
      // delete-safe/recopy-safe)
      if (truncated && page.isEmpty && next.isEmpty)
        return (out.result(), true)
      more = truncated
      token = next
      after = page.lastOption.map(_.key).orElse(after)
    }
    (out.result(), false)
  }

  private def parseListing(xml: String): Seq[ObjectInfo] = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes(UTF_8)))
    val nodes = doc.getElementsByTagName("Contents")
    (0 until nodes.getLength).map { i =>
      val el = nodes.item(i).asInstanceOf[org.w3c.dom.Element]
      def f(tag: String): String = {
        val ns = el.getElementsByTagName(tag)
        if (ns.getLength == 0) "" else ns.item(0).getTextContent
      }
      val key = f("Key")
      val rel =
        if (prefix.isEmpty) key
        else key.stripPrefix(prefix.stripSuffix("/") + "/")
      val mtime =
        try Instant.parse(f("LastModified")).toEpochMilli
        catch { case _: Exception => 0L }
      ObjectInfo(rel, f("Size").toLongOption.getOrElse(0L), mtime)
    }
  }

  private def xmlField(xml: String, tag: String): Option[String] = {
    val m = s"<$tag>([^<]*)</$tag>".r.findFirstMatchIn(xml)
    m.map(_.group(1))
  }

  // ---- deletes ----

  override def delete(keys: Iterable[String]): Unit =
    keys.grouped(1000).foreach { batch =>
      val body = batch.map(k =>
        s"<Object><Key>${xmlEscape(fullKey(k))}</Key></Object>")
        .mkString("<Delete><Quiet>true</Quiet>", "", "</Delete>")
        .getBytes(UTF_8)
      val md5 = java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("MD5").digest(body))
      val r = send("POST", bucketUri("delete"), body,
        Map("Content-MD5" -> md5))
      if (r.statusCode() != 200) failed("DELETE(batch)", s"${batch.size} keys", r)
      // quiet mode suppresses successes only: a 200 can still carry
      // per-key <Error> entries
      val resp = new String(r.body(), UTF_8)
      if (resp.contains("<Error>"))
        throw new java.io.UncheckedIOException(new java.io.IOException(
          s"DeleteObjects reported per-key errors: ${resp.take(500)}"))
    }

  override def deletePrefix(prefix0: String): Unit =
    delete(list(prefix0).map(_.key))

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def xmlUnescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
}

object S3Store {
  /** Byte bounds `[from, until)` of multipart part `i`, computed in Long
    * arithmetic: `(i + 1) * partSize` overflows Int once the object
    * passes 63 × 32 MiB parts (ADVICE r14 — the bound went negative and
    * `copyOfRange` rejected the largest still-legal byte arrays). `from`
    * always fits in Int because `i * partSize < totalLen <= Int.MaxValue`.
    */
  private[graft] def partBounds(totalLen: Int, partSize: Int,
                                i: Int): (Int, Int) =
    ((i.toLong * partSize).toInt,
      math.min(totalLen.toLong, (i.toLong + 1) * partSize).toInt)
}
