package graft.storage.az

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import graft.storage.{AzureStoreConf, ObjectInfo, StatInfo, Store, StoreConf,
  TransientStorageException}

/** Native Azure Blob Storage backend over the public REST API — the
  * capability match for the reference's Azure store
  * (icechunk-arrow-object-store/src/lib.rs Azure arm). Speaks:
  *
  *  - `GET /{container}/{blob}` with `Range:` → 206 partial content
  *  - `PUT` with `x-ms-blob-type: BlockBlob` + `If-None-Match: *` → the
  *    conditional-create primitive (409 BlobAlreadyExists / 412 when the
  *    blob exists)
  *  - `GET /{container}?restype=container&comp=list&prefix=&marker=` →
  *    name-ordered XML listing pages with `NextMarker`
  *  - `PUT` with `x-ms-copy-source:` → server-side copy
  *
  * Authentication is a caller-supplied SAS token appended to every URL
  * (the standard delegated-auth path; shared-key request signing is a
  * credential-provider concern outside the engine). Empty token =
  * anonymous (the in-process [[AzureMemServer]], public containers).
  */
final class AzureStore(val azConf: AzureStoreConf) extends Store {
  import azConf._

  private val http = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(java.time.Duration.ofSeconds(30))
    .build()

  val authority: String = "az-" +
    graft.storage.s3.SigV4.sha256Hex(
      s"$endpoint|$account|$container|$prefix".getBytes(UTF_8)).take(16) +
    "-" + container.toLowerCase.replaceAll("[^a-z0-9]", "")

  override def rootUri: String = s"graft://$authority"
  override def conf: StoreConf = azConf

  private def fullKey(key: String): String =
    if (prefix.isEmpty) key else prefix.stripSuffix("/") + "/" + key

  private def relKey(full: String): String =
    if (prefix.isEmpty) full
    else full.stripPrefix(prefix.stripSuffix("/") + "/")

  /** RFC 3986 encode each path segment, keep '/' separators (blob names
    * are hierarchical in the URL, unlike GCS object names).
    */
  private def encPath(key: String): String =
    key.split("/", -1).map { seg =>
      java.net.URLEncoder.encode(seg, UTF_8)
        .replace("+", "%20").replace("*", "%2A").replace("%7E", "~")
    }.mkString("/")

  private def encQ(v: String): String =
    java.net.URLEncoder.encode(v, UTF_8)
      .replace("+", "%20").replace("*", "%2A").replace("%7E", "~")

  private def withSas(url: String): String =
    if (sasToken.isEmpty) url
    else if (url.contains('?')) url + "&" + sasToken
    else url + "?" + sasToken

  private def blobUri(key: String): URI = blobUriQ(key, "")

  private def blobUriQ(key: String, query: String): URI = {
    val baseUrl = endpoint.stripSuffix("/") + "/" + container + "/" +
      encPath(fullKey(key))
    URI.create(withSas(
      if (query.isEmpty) baseUrl else baseUrl + "?" + query))
  }

  private def containerUri(query: String): URI =
    URI.create(withSas(
      endpoint.stripSuffix("/") + "/" + container + "?" + query))

  private def send(method: String, uri: URI, body: Array[Byte],
                   headers: Map[String, String] = Map.empty)
      : HttpResponse[Array[Byte]] = {
    val b = HttpRequest.newBuilder(uri).method(method,
      if (body == null) HttpRequest.BodyPublishers.noBody()
      else HttpRequest.BodyPublishers.ofByteArray(body))
    b.header("x-ms-version", "2021-12-02")
    // configured headers first (#2246 analog), then per-call ones.
    // setHeader REPLACES, so a configured x-ms-version overrides the
    // default instead of arriving twice (Azure 400s doubled headers)
    azConf.headers.foreach { case (k, v) => b.setHeader(k, v) }
    headers.foreach { case (k, v) => b.setHeader(k, v) }
    try http.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
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
    val r = send("GET", blobUri(key), null)
    if (r.statusCode() == 200) r.body() else failed("GET", key, r)
  }

  override def getRange(key: String, offset: Long,
                        length: Long): Array[Byte] = {
    if (offset == 0 && length <= 0) return getBytes(key)
    val range =
      if (length <= 0) s"bytes=$offset-"
      else s"bytes=$offset-${offset + length - 1}"
    val r = send("GET", blobUri(key), null, Map("x-ms-range" -> range,
      "Range" -> range))
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

  override def exists(key: String): Boolean = {
    val r = send("HEAD", blobUri(key), null)
    r.statusCode() == 200
  }

  override def stat(key: String): Option[StatInfo] = {
    val r = send("HEAD", blobUri(key), null)
    if (r.statusCode() != 200) None
    else {
      def header(n: String): Option[String] =
        Option(r.headers().firstValue(n).orElse(null))
      Some(StatInfo(
        header("Content-Length").flatMap(_.toLongOption).getOrElse(0L),
        header("Last-Modified").map { v =>
          java.time.ZonedDateTime.parse(v,
            java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
            .toInstant.toEpochMilli
        }.getOrElse(0L),
        header("ETag").map(_.stripPrefix("\"").stripSuffix("\""))
          .getOrElse("")))
    }
  }

  // ---- writes ----

  override def putBytes(key: String, bytes: Array[Byte]): Unit =
    if (bytes.length >= blockThresholdBytes) blockPut(key, bytes)
    else {
      val r = send("PUT", blobUri(key), bytes,
        Map("x-ms-blob-type" -> "BlockBlob"))
      if (r.statusCode() != 201 && r.statusCode() != 200)
        failed("PUT", key, r)
    }

  /** Put Block + Put Block List (the Blob large-object path, the role S3
    * multipart plays): stage fixed-size blocks, then commit the ordered
    * block list.
    */
  private def blockPut(key: String, bytes: Array[Byte]): Unit = {
    val part = blockBytes.toInt
    val ranges = (0 until bytes.length by part).zipWithIndex.map {
      case (off, i) =>
        (i, off, math.min(off.toLong + part, bytes.length.toLong).toInt)
    }
    // staged blocks are independent until Put Block List commits the
    // ordered list — upload them concurrently (same rationale as the
    // S3 multipart path: a 1 GiB blob at 32 MB blocks over a 150 ms
    // store is otherwise 32 sequential round trips)
    val ids = graft.storage.Store.parallelIO(ranges, maxThreads = 8) {
      case (i, off, end) =>
        val blockId = java.util.Base64.getEncoder.encodeToString(
          f"block-$i%08d".getBytes(UTF_8))
        val r = send("PUT",
          blobUriQ(key, s"comp=block&blockid=${encQ(blockId)}"),
          java.util.Arrays.copyOfRange(bytes, off, end))
        if (r.statusCode() != 201 && r.statusCode() != 200)
          failed(s"PUT(block $i)", key, r)
        blockId
    }
    val xml = ids.map(id => s"<Latest>$id</Latest>")
      .mkString("<?xml version=\"1.0\" encoding=\"utf-8\"?><BlockList>", "",
        "</BlockList>")
    val r = send("PUT", blobUriQ(key, "comp=blocklist"), xml.getBytes(UTF_8))
    if (r.statusCode() != 201 && r.statusCode() != 200)
      failed("PUT(blocklist)", key, r)
  }

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    val r = send("PUT", blobUri(key), bytes,
      Map("x-ms-blob-type" -> "BlockBlob", "If-None-Match" -> "*"))
    r.statusCode() match {
      case 201 | 200 => true
      case 409 | 412 => false // BlobAlreadyExists / ConditionNotMet
      case _ => failed("PUT(if-absent)", key, r)
    }
  }

  override def copy(srcKey: String, dstKey: String): Unit = {
    val src = endpoint.stripSuffix("/") + "/" + container + "/" +
      encPath(fullKey(srcKey))
    copyBlob("COPY", s"$srcKey -> $dstKey", dstKey, withSas(src))
  }

  /** Copy Blob is ASYNCHRONOUS by default: a 202 means "copy scheduled"
    * (`x-ms-copy-status: pending`), not "copy done" — treating it as
    * done would let a push land its pointer while chunk blobs are still
    * copying, and a reader of the replica could observe a ref to a blob
    * that isn't there yet. `x-ms-requires-sync: true` forces the
    * synchronous path (supported for intra-account block-blob copies —
    * exactly the [[canCopyServerSide]] gate), and the response status
    * must confirm `success`; anything else fails loudly instead of
    * reporting a copy that may not have happened.
    */
  private def copyBlob(op: String, what: String, dstKey: String,
                       copySource: String): Unit = {
    val r = send("PUT", blobUri(dstKey), Array.emptyByteArray,
      Map("x-ms-copy-source" -> copySource,
        "x-ms-requires-sync" -> "true"))
    if (r.statusCode() != 202 && r.statusCode() != 201 &&
        r.statusCode() != 200) failed(op, what, r)
    val status = Option(
      r.headers().firstValue("x-ms-copy-status").orElse(null))
    if (!status.forall(_ == "success"))
      throw new graft.storage.TransientStorageException(
        s"$op $what: copy not synchronous (x-ms-copy-status: " +
          s"${status.getOrElse("?")}) — requires-sync was not honored")
  }

  /** Whether [[copyFromStore]] can replicate from `src` without moving
    * payload bytes through this client: same storage account endpoint
    * and same SAS (the service resolves `x-ms-copy-source` itself).
    */
  def canCopyServerSide(src: AzureStore): Boolean =
    azConf.endpoint == src.azConf.endpoint &&
      azConf.sasToken == src.azConf.sasToken

  /** Server-side cross-container/prefix Copy Blob INTO this store —
    * replication between two Azure repos moves zero payload bytes
    * through the executor.
    */
  def copyFromStore(src: AzureStore, srcKey: String,
                    dstKey: String): Unit = {
    val srcUrl = src.azConf.endpoint.stripSuffix("/") + "/" +
      src.azConf.container + "/" + src.encPath(src.fullKey(srcKey))
    copyBlob("COPY(cross)", s"$srcKey -> $dstKey", dstKey,
      src.withSas(srcUrl))
  }

  // ---- listing ----

  private def listCall(prefix0: String, marker: Option[String],
                       maxResults: Int)
      : (Seq[ObjectInfo], Option[String]) = {
    val q = (Seq("restype=container", "comp=list",
      s"prefix=${encQ(fullKey(prefix0))}",
      s"maxresults=${math.max(1, math.min(maxResults, 5000))}") ++
      marker.map(m => s"marker=${encQ(m)}")).mkString("&")
    val r = send("GET", containerUri(q), null)
    if (r.statusCode() != 200) failed("LIST", prefix0, r)
    val xml = new String(r.body(), UTF_8)
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes(UTF_8)))
    val blobs = doc.getElementsByTagName("Blob")
    val out = (0 until blobs.getLength).map { i =>
      val el = blobs.item(i).asInstanceOf[org.w3c.dom.Element]
      def f(tag: String): String = {
        val ns = el.getElementsByTagName(tag)
        if (ns.getLength == 0) "" else ns.item(0).getTextContent
      }
      val mtime =
        try java.time.ZonedDateTime.parse(f("Last-Modified"),
          java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
          .toInstant.toEpochMilli
        catch { case _: Exception =>
          try Instant.parse(f("Last-Modified")).toEpochMilli
          catch { case _: Exception => 0L }
        }
      ObjectInfo(relKey(f("Name")),
        f("Content-Length").toLongOption.getOrElse(0L), mtime)
    }
    val nextNodes = doc.getElementsByTagName("NextMarker")
    val next =
      if (nextNodes.getLength == 0) None
      else Option(nextNodes.item(0).getTextContent).filter(_.nonEmpty)
    (out, next)
  }

  override def listPage(prefix0: String, startAfter: Option[String],
                        maxKeys: Int): Seq[ObjectInfo] = {
    // Azure's marker is an OPAQUE continuation token — production rejects
    // arbitrary blob names with an invalid-marker 400, so never seed it
    // from startAfter. Walk the marker protocol from the start of the
    // prefix and drop keys <= startAfter client-side. For the engine's hot
    // call (latest pointer generation: reverse-encoded keys, no
    // startAfter) this stays a single one-key page; startAfter callers
    // (generation pruning) pay page skips, which that path amortizes.
    val out = Vector.newBuilder[ObjectInfo]
    var got = 0
    var marker: Option[String] = None
    var more = true
    while (more && got < maxKeys) {
      val (page, next) = listCall(prefix0, marker, maxKeys + 1)
      val fresh = page.filter(o => startAfter.forall(o.key > _))
        .take(maxKeys - got)
      out ++= fresh
      got += fresh.size
      marker = next
      // Azure may legally return an EMPTY page with a continuation token
      // (the same short-page hazard GcsStore.listPage handles): keep
      // walking while a token is present or results silently truncate.
      more = next.nonEmpty
    }
    out.result()
  }

  override def list(prefix0: String): Seq[ObjectInfo] = {
    val out = Vector.newBuilder[ObjectInfo]
    var marker: Option[String] = None
    var first = true
    while (first || marker.nonEmpty) {
      first = false
      val (page, next) = listCall(prefix0, marker, 5000)
      out ++= page
      marker = next
    }
    out.result()
  }

  override def listBounded(prefix0: String,
                           max: Int): (Seq[ObjectInfo], Boolean) = {
    // native marker loop with early exit — the paged default restarts
    // the marker protocol from the prefix start for every page
    val out = Vector.newBuilder[ObjectInfo]
    var n = 0
    var marker: Option[String] = None
    var first = true
    while (first || marker.nonEmpty) {
      first = false
      val (page, next) = listCall(prefix0, marker, 5000)
      out ++= page
      n += page.size
      if (n > max) return (out.result(), true)
      marker = next
    }
    (out.result(), false)
  }

  // ---- deletes ----

  override def delete(keys: Iterable[String]): Unit =
    keys.foreach { k =>
      val r = send("DELETE", blobUri(k), null)
      if (r.statusCode() != 202 && r.statusCode() != 200 &&
          r.statusCode() != 404) failed("DELETE", k, r)
    }

  override def deletePrefix(prefix0: String): Unit =
    delete(list(prefix0).map(_.key))
}
