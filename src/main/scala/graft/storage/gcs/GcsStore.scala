package graft.storage.gcs

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.storage.{GcsStoreConf, ObjectInfo, StatInfo, Store, StoreConf,
  TransientStorageException}

/** Native Google Cloud Storage backend over the public JSON API — the
  * capability match for the reference's GCS store
  * (icechunk-arrow-object-store/src/lib.rs GCS arm). Speaks:
  *
  *  - `GET …/o/<obj>?alt=media` with `Range:` → ranged reads
  *  - `POST /upload/…?uploadType=media&ifGenerationMatch=0` → the
  *    conditional-create primitive commits depend on (412 when the object
  *    exists — generation 0 means "no live generation")
  *  - `GET …/o?prefix=&startOffset=&pageToken=` → lexicographic pages
  *    (GCS lists objects in name order; `startOffset` is inclusive, so
  *    strictly-after filtering happens client-side)
  *  - `POST …/o/<src>/copyTo/b/<bucket>/o/<dst>` → server-side copy
  *
  * Authentication is a caller-supplied OAuth2 bearer token; an empty token
  * sends anonymous requests (the in-process [[GcsMemServer]], public
  * buckets). Works against the real endpoint or the stub.
  */
final class GcsStore(val gcsConf: GcsStoreConf) extends Store {
  import gcsConf._

  private val http = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(java.time.Duration.ofSeconds(30))
    .build()

  /** Resumable chunk PUTs answer a bare 308 ("Resume Incomplete" — NOT a
    * redirect); a redirect-following client chokes on the missing
    * Location, so those requests use this client.
    */
  private val httpNoRedirect = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NEVER)
    .connectTimeout(java.time.Duration.ofSeconds(30))
    .build()

  val authority: String = "gcs-" +
    graft.storage.s3.SigV4.sha256Hex(
      s"$endpoint|$bucket|$prefix".getBytes(UTF_8)).take(16) +
    "-" + bucket.toLowerCase.replaceAll("[^a-z0-9]", "")

  override def rootUri: String = s"graft://$authority"
  override def conf: StoreConf = gcsConf

  private def fullKey(key: String): String =
    if (prefix.isEmpty) key else prefix.stripSuffix("/") + "/" + key

  private def relKey(full: String): String =
    if (prefix.isEmpty) full
    else full.stripPrefix(prefix.stripSuffix("/") + "/")

  /** Object names are ONE url path segment in the JSON API: percent-encode
    * everything, including '/'.
    */
  private def encObj(key: String): String =
    java.net.URLEncoder.encode(key, UTF_8)
      .replace("+", "%20").replace("*", "%2A").replace("%7E", "~")

  private def encQ(v: String): String = encObj(v)

  private def base: String = endpoint.stripSuffix("/")

  private def objectUri(key: String, query: String = ""): URI =
    URI.create(s"$base/storage/v1/b/$bucket/o/${encObj(fullKey(key))}" +
      (if (query.isEmpty) "" else "?" + query))

  private def send(method: String, uri: URI, body: Array[Byte],
                   headers: Map[String, String] = Map.empty,
                   followRedirects: Boolean = true)
      : HttpResponse[Array[Byte]] = {
    val b = HttpRequest.newBuilder(uri).method(method,
      if (body == null) HttpRequest.BodyPublishers.noBody()
      else HttpRequest.BodyPublishers.ofByteArray(body))
    if (bearerToken.nonEmpty) b.header("Authorization", s"Bearer $bearerToken")
    // configured headers first (gcs_storage(headers=...), #2246), then
    // per-call ones. setHeader REPLACES: a configured Authorization
    // overrides the bearer token instead of riding alongside it (doubled
    // auth headers are rejected outright)
    gcsConf.headers.foreach { case (k, v) => b.setHeader(k, v) }
    headers.foreach { case (k, v) => b.setHeader(k, v) }
    val client = if (followRedirects) http else httpNoRedirect
    try client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    catch {
      case e: java.io.IOException =>
        throw new TransientStorageException(s"$method $uri: ${e.getMessage}")
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
    val r = send("GET", objectUri(key, "alt=media"), null)
    if (r.statusCode() == 200) r.body() else failed("GET", key, r)
  }

  override def getRange(key: String, offset: Long,
                        length: Long): Array[Byte] = {
    if (offset == 0 && length <= 0) return getBytes(key)
    val range =
      if (length <= 0) s"bytes=$offset-"
      else s"bytes=$offset-${offset + length - 1}"
    val r = send("GET", objectUri(key, "alt=media"), null,
      Map("Range" -> range))
    r.statusCode() match {
      case 206 => r.body()
      case 200 =>
        val all = r.body()
        if (offset >= all.length) Array.emptyByteArray
        else {
          val end =
            if (length <= 0) all.length
            else math.min(offset + length, all.length.toLong).toInt
          java.util.Arrays.copyOfRange(all, offset.toInt, end)
        }
      case 416 => Array.emptyByteArray
      case _ => failed("GET(range)", key, r)
    }
  }

  override def exists(key: String): Boolean = stat(key).isDefined

  override def stat(key: String): Option[StatInfo] = {
    val r = send("GET", objectUri(key), null)
    if (r.statusCode() != 200) None
    else {
      implicit val fmts: Formats = DefaultFormats
      val j = JsonMethods.parse(new String(r.body(), UTF_8))
      Some(StatInfo(
        (j \ "size").extractOpt[String].flatMap(_.toLongOption).getOrElse(0L),
        (j \ "updated").extractOpt[String].map(java.time.Instant.parse(_)
          .toEpochMilli).getOrElse(0L),
        (j \ "etag").extractOpt[String].getOrElse("")))
    }
  }

  // ---- writes ----

  private def uploadUri(key: String, extraQuery: String,
                        uploadType: String = "media"): URI =
    URI.create(s"$base/upload/storage/v1/b/$bucket/o?uploadType=$uploadType" +
      s"&name=${encQ(fullKey(key))}" +
      (if (extraQuery.isEmpty) "" else "&" + extraQuery))

  override def putBytes(key: String, bytes: Array[Byte]): Unit =
    if (bytes.length >= resumableThresholdBytes) resumablePut(key, bytes)
    else {
      val r = send("POST", uploadUri(key, ""), bytes)
      if (r.statusCode() != 200) failed("PUT", key, r)
    }

  /** Resumable upload (the JSON API's large-object path, the role S3
    * multipart plays): initiate a session, then PUT chunks with
    * `Content-Range`; intermediate chunks answer 308, the final one 200.
    */
  private def resumablePut(key: String, bytes: Array[Byte]): Unit = {
    // unlike S3 multipart / Azure Put Block, resumable chunks CANNOT be
    // parallelized: the protocol is a single session whose Content-Range
    // offsets must arrive in order (each 308 acknowledges the prefix) —
    // large-object upload latency on GCS is chunks × RTT by design; use
    // a larger resumableChunkBytes on high-RTT links
    val init = send("POST", uploadUri(key, "", "resumable"),
      Array.emptyByteArray)
    if (init.statusCode() != 200) failed("POST(resumable)", key, init)
    val session = init.headers().firstValue("Location").orElse(null)
    if (session == null || session.isEmpty)
      throw new IllegalStateException(s"resumable init for $key: no Location")
    // intermediate chunks MUST be 256 KiB multiples per the GCS contract —
    // round a user-supplied size UP to the next multiple, don't trust it
    val quantum = 256L * 1024
    val part = ((math.max(quantum, resumableChunkBytes) + quantum - 1)
      / quantum * quantum).toInt
    var off = 0
    while (off < bytes.length) {
      val end = math.min(off.toLong + part, bytes.length.toLong).toInt
      val chunk = java.util.Arrays.copyOfRange(bytes, off, end)
      val r = send("PUT", URI.create(session), chunk,
        Map("Content-Range" -> s"bytes $off-${end - 1}/${bytes.length}"),
        followRedirects = false)
      val ok =
        if (end == bytes.length)
          r.statusCode() == 200 || r.statusCode() == 201
        else r.statusCode() == 308
      if (!ok) failed(s"PUT(resumable $off-${end - 1})", key, r)
      off = end
    }
  }

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    val r = send("POST", uploadUri(key, "ifGenerationMatch=0"), bytes)
    r.statusCode() match {
      case 200 => true
      case 412 | 409 => false // 412 conditionNotMet; 409 on some stacks
      case _ => failed("PUT(if-absent)", key, r)
    }
  }

  override def copy(srcKey: String, dstKey: String): Unit = {
    val uri = URI.create(
      s"$base/storage/v1/b/$bucket/o/${encObj(fullKey(srcKey))}" +
        s"/copyTo/b/$bucket/o/${encObj(fullKey(dstKey))}")
    val r = send("POST", uri, Array.emptyByteArray)
    if (r.statusCode() != 200) failed("COPY", s"$srcKey -> $dstKey", r)
  }

  /** Whether [[copyFromStore]] can replicate from `src` without moving
    * payload bytes through this client: same service endpoint and same
    * credential (the `copyTo` call is resolved by the service, which
    * must be able to read the source under this token).
    */
  def canCopyServerSide(src: GcsStore): Boolean =
    gcsConf.endpoint == src.gcsConf.endpoint &&
      gcsConf.bearerToken == src.gcsConf.bearerToken

  /** Server-side cross-bucket/prefix copy INTO this store (JSON API
    * `objects/copyTo`) — replication between two GCS repos moves zero
    * payload bytes through the executor.
    */
  def copyFromStore(src: GcsStore, srcKey: String, dstKey: String): Unit = {
    val uri = URI.create(
      s"$base/storage/v1/b/${src.gcsConf.bucket}/o/" +
        s"${encObj(src.fullKey(srcKey))}" +
        s"/copyTo/b/$bucket/o/${encObj(fullKey(dstKey))}")
    val r = send("POST", uri, Array.emptyByteArray)
    if (r.statusCode() != 200)
      failed("COPY(cross)", s"$srcKey -> $dstKey", r)
  }

  // ---- listing ----

  private def listCall(prefix0: String, startOffset: Option[String],
                       pageToken: Option[String], maxResults: Int)
      : (Seq[ObjectInfo], Option[String]) = {
    val q = (Seq(
      s"prefix=${encQ(fullKey(prefix0))}",
      s"maxResults=${math.max(1, math.min(maxResults, 1000))}") ++
      startOffset.map(so => s"startOffset=${encQ(so)}") ++
      pageToken.map(t => s"pageToken=${encQ(t)}")).mkString("&")
    val r = send("GET", URI.create(s"$base/storage/v1/b/$bucket/o?$q"), null)
    if (r.statusCode() != 200) failed("LIST", prefix0, r)
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(new String(r.body(), UTF_8))
    val items = (j \ "items") match {
      case JArray(xs) => xs.map { i =>
        ObjectInfo(
          relKey((i \ "name").extract[String]),
          (i \ "size").extractOpt[String].flatMap(_.toLongOption)
            .getOrElse(0L),
          (i \ "updated").extractOpt[String]
            .map(java.time.Instant.parse(_).toEpochMilli).getOrElse(0L))
      }
      case _ => Nil
    }
    (items, (j \ "nextPageToken").extractOpt[String].filter(_.nonEmpty))
  }

  override def listPage(prefix0: String, startAfter: Option[String],
                        maxKeys: Int): Seq[ObjectInfo] = {
    // startOffset is INCLUSIVE of the offset name: fetch one extra and
    // drop keys <= startAfter client-side. GCS may return SHORT pages
    // (fewer items than maxResults, even zero) while more results exist,
    // so a single call is not exhaustion — loop on nextPageToken until
    // maxKeys items are collected or the token runs out.
    val out = Vector.newBuilder[ObjectInfo]
    var got = 0
    var token: Option[String] = None
    var first = true
    while ((first || token.nonEmpty) && got < maxKeys) {
      first = false
      val (page, next) = listCall(prefix0, startAfter.map(fullKey),
        token, maxKeys + 1)
      val fresh = page.filter(o => startAfter.forall(o.key > _))
        .take(maxKeys - got)
      out ++= fresh
      got += fresh.size
      token = next
    }
    out.result()
  }

  override def list(prefix0: String): Seq[ObjectInfo] = {
    val out = Vector.newBuilder[ObjectInfo]
    var token: Option[String] = None
    var first = true
    while (first || token.nonEmpty) {
      first = false
      val (page, next) = listCall(prefix0, None, token, 1000)
      out ++= page
      token = next
    }
    out.result()
  }

  override def listBounded(prefix0: String,
                           max: Int): (Seq[ObjectInfo], Boolean) = {
    // native pageToken loop with early exit (the paged default restarts
    // the token walk per page)
    val out = Vector.newBuilder[ObjectInfo]
    var n = 0
    var token: Option[String] = None
    var first = true
    while (first || token.nonEmpty) {
      first = false
      val (page, next) = listCall(prefix0, None, token, 1000)
      out ++= page
      n += page.size
      if (n > max) return (out.result(), true)
      token = next
    }
    (out.result(), false)
  }

  // ---- deletes ----

  override def delete(keys: Iterable[String]): Unit =
    keys.foreach { k =>
      val r = send("DELETE", objectUri(k), null)
      if (r.statusCode() != 204 && r.statusCode() != 200 &&
          r.statusCode() != 404) failed("DELETE", k, r)
    }

  override def deletePrefix(prefix0: String): Unit =
    delete(list(prefix0).map(_.key))
}
