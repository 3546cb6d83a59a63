package graft.storage.http

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import graft.storage.{HttpStoreConf, ObjectInfo, StatInfo, Store, StoreConf}

/** READ-ONLY repository hosting over plain HTTP(S) — the analog of the
  * reference's `object_store` HTTP arm
  * (icechunk-arrow-object-store/src/lib.rs), which speaks WebDAV for the
  * one operation static HTTP lacks: listing. Reads map to standard
  * verbs — `GET` (+ `Range:` for partial reads), `HEAD` for stat — and
  * listing to WebDAV `PROPFIND` `Depth: 1` on COLLECTION resources with
  * a client-side recursive walk (the protocol subset every nginx/apache
  * DAV module serves: prefix URIs are not resources, and RFC 4918 lets
  * servers refuse `Depth: infinity`). Every mutation throws
  * `UnsupportedOperationException`: an HTTP endpoint is a distribution
  * channel, not a writable backend, and failing loudly beats a commit
  * half-applied through a misconfigured proxy.
  */
final class HttpStore(val httpConf: HttpStoreConf) extends Store {
  import httpConf._

  private val http = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(java.time.Duration.ofSeconds(30))
    .build()

  val authority: String = "http-" +
    graft.storage.s3.SigV4.sha256Hex(endpoint.getBytes(UTF_8)).take(16)

  override def rootUri: String = s"graft://$authority"
  override def conf: StoreConf = httpConf

  private def keyUri(key: String): URI = {
    val enc = key.split("/", -1).map(seg =>
      java.net.URLEncoder.encode(seg, UTF_8)
        .replace("+", "%20").replace("*", "%2A").replace("%7E", "~"))
      .mkString("/")
    URI.create(endpoint.stripSuffix("/") + "/" + enc)
  }

  private def request(method: String, key: String,
                      headers: Map[String, String] = Map.empty)
      : HttpResponse[Array[Byte]] = {
    val b = HttpRequest.newBuilder(keyUri(key))
      .method(method, HttpRequest.BodyPublishers.noBody())
    // configured headers first (reference http_storage(headers=...),
    // #2143 — bearer tokens for protected hosts), then per-call ones;
    // setHeader REPLACES so Range/Depth can never arrive doubled
    httpConf.headers.foreach { case (k, v) => b.setHeader(k, v) }
    headers.foreach { case (k, v) => b.setHeader(k, v) }
    http.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
  }

  private def failed(op: String, key: String,
                     r: HttpResponse[Array[Byte]]): Nothing = {
    val msg = s"http $op $key: HTTP ${r.statusCode()} " +
      new String(r.body(), UTF_8).take(200)
    if (r.statusCode() == 401 || r.statusCode() == 403)
      throw new graft.repo.GraftException(msg, graft.repo.GraftError.Auth)
    throw new java.io.IOException(msg)
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"http store is read-only: $op rejected (host repos you write " +
        "through s3/gcs/azure/local backends; serve them over HTTP)")

  // ---- reads ----

  override def getBytes(key: String): Array[Byte] = {
    val r = request("GET", key)
    if (r.statusCode() == 200) r.body()
    else if (r.statusCode() == 404)
      throw new java.nio.file.NoSuchFileException(key)
    else failed("GET", key, r)
  }

  override def getRange(key: String, offset: Long,
                        length: Long): Array[Byte] = {
    val range =
      if (length <= 0) s"bytes=$offset-"
      else s"bytes=$offset-${offset + length - 1}"
    val r = request("GET", key, Map("Range" -> range))
    r.statusCode() match {
      case 206 => r.body()
      case 200 => // server ignored Range: slice client-side
        val all = r.body()
        if (offset >= all.length) Array.emptyByteArray
        else {
          val end =
            if (length <= 0) all.length
            else math.min(offset + length, all.length.toLong).toInt
          java.util.Arrays.copyOfRange(all, offset.toInt, end)
        }
      case 416 => Array.emptyByteArray // requested range past EOF
      case 404 => throw new java.nio.file.NoSuchFileException(key)
      case _ => failed("GET(range)", key, r)
    }
  }

  override def exists(key: String): Boolean =
    request("HEAD", key).statusCode() == 200

  override def stat(key: String): Option[StatInfo] = {
    val r = request("HEAD", key)
    if (r.statusCode() != 200) None
    else Some(StatInfo(
      r.headers().firstValue("Content-Length").map[Long](_.toLong)
        .orElse(0L),
      r.headers().firstValue("Last-Modified").map[Long](parseHttpDate)
        .orElse(0L),
      r.headers().firstValue("ETag").orElse("")))
  }

  private def parseHttpDate(s: String): Long =
    try java.time.ZonedDateTime.parse(s,
      java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
      .toInstant.toEpochMilli
    catch { case _: Exception => 0L }

  // ---- listing: WebDAV PROPFIND, Depth 1, recursive collection walk.
  // Real DAV hosts answer PROPFIND only on RESOURCES (collections or
  // files) — a filename-prefix URI is 404 — and many reject
  // `Depth: infinity` outright (RFC 4918 §9.1 allows 403), so the walk
  // PROPFINDs the deepest collection ancestor of the key prefix with
  // Depth 1, filters members client-side, and recurses into
  // sub-collections that can still contain matching keys. ----

  /** One member of a Depth-1 multistatus: key path (collection keys end
    * with '/'), size, mtime.
    */
  private def propfindDepth1(dirPath: String): Option[Seq[ObjectInfo]] = {
    val b = HttpRequest.newBuilder(keyUri(dirPath))
      .method("PROPFIND", HttpRequest.BodyPublishers.ofString(
        """<?xml version="1.0"?><propfind xmlns="DAV:"><prop>""" +
          "<getcontentlength/><getlastmodified/></prop></propfind>"))
      .header("Depth", "1")
      .header("Content-Type", "application/xml")
    // setHeader: configured entries may not duplicate Depth/Content-Type
    httpConf.headers.foreach { case (k, v) =>
      if (!k.equalsIgnoreCase("Depth") &&
          !k.equalsIgnoreCase("Content-Type")) b.setHeader(k, v)
    }
    val r = http.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    if (r.statusCode() == 404) return None
    if (r.statusCode() != 207) failed("PROPFIND", dirPath, r)
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true) // DAV: elements arrive ns-prefixed
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(r.body()))
    val responses = doc.getElementsByTagNameNS("DAV:", "response")
    val base = URI.create(endpoint.stripSuffix("/") + "/")
    Some((0 until responses.getLength).flatMap { i =>
      val el = responses.item(i).asInstanceOf[org.w3c.dom.Element]
      def tag(name: String): Option[String] = {
        val ns = el.getElementsByTagNameNS("DAV:", name)
        if (ns.getLength == 0) None else Some(ns.item(0).getTextContent)
      }
      val href = tag("href").getOrElse("")
      if (href.isEmpty) None
      else {
        val path = if (href.startsWith("http")) URI.create(href).getPath
          else href
        val key = pathDecode(path.stripPrefix(base.getPath)
          .stripPrefix("/"))
        // skip the collection's own entry; keep files AND sub-collections
        // (the latter keep their trailing '/' so the caller can recurse)
        if (key.isEmpty || key == dirPath) None
        else Some(ObjectInfo(key,
          tag("getcontentlength").flatMap(_.toLongOption).getOrElse(0L),
          tag("getlastmodified").map(parseHttpDate).getOrElse(0L)))
      }
    })
  }

  /** URI path decode: percent sequences only — '+' is a literal in paths
    * (URLDecoder's form rules would eat it). Hrefs some servers emit
    * unencoded (a raw '%') fall back to the raw string.
    */
  private def pathDecode(s: String): String =
    try java.net.URLDecoder.decode(s.replace("+", "%2B"), UTF_8)
    catch { case _: IllegalArgumentException => s }

  /** Recursive WebDAV walk, one PROPFIND per collection, SIBLING
    * collections fetched concurrently on the shared fetch pool (a
    * breadth-first frontier): a deep repo tree costs one round-trip per
    * LEVEL of fan-out, not one per directory — the difference between
    * seconds and minutes when a manifest tree holds thousands of shard
    * directories on a real (multi-ms RTT) host.
    */
  override def list(prefix: String): Seq[ObjectInfo] = {
    import scala.jdk.CollectionConverters._
    val out = new java.util.concurrent.ConcurrentLinkedQueue[ObjectInfo]()
    var frontier = Seq(prefix.substring(0, prefix.lastIndexOf('/') + 1))
    while (frontier.nonEmpty) {
      val tasks: Seq[java.util.concurrent.Callable[Seq[String]]] =
        frontier.map { dirPath =>
          (() => {
            val next = Seq.newBuilder[String]
            propfindDepth1(dirPath).getOrElse(Nil).foreach { m =>
              if (m.key.endsWith("/")) {
                // recurse only where matches can live: the collection is
                // under the prefix, or is an ancestor of it
                if (m.key.startsWith(prefix) || prefix.startsWith(m.key))
                  next += m.key
              } else if (m.key.startsWith(prefix)) out.add(m)
            }
            next.result()
          }): java.util.concurrent.Callable[Seq[String]]
        }
      frontier = graft.storage.Store.fetchPool.invokeAll(tasks.asJava)
        .asScala.flatMap { f =>
          // surface the walk's own failure, not the pool's wrapper (a
          // 401 must still arrive as GraftException(kind=auth))
          try f.get()
          catch { case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e) }
        }.toSeq
    }
    out.asScala.toVector.sortBy(_.key)
  }

  // ---- mutations: rejected ----

  override def putBytes(key: String, bytes: Array[Byte]): Unit =
    readOnly(s"PUT $key")
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    readOnly(s"PUT(if-absent) $key")
  override def delete(keys: Iterable[String]): Unit =
    if (keys.nonEmpty) readOnly(s"DELETE ${keys.head}...")
  override def deletePrefix(prefix: String): Unit =
    readOnly(s"DELETE-PREFIX $prefix")
  override def copy(srcKey: String, dstKey: String): Unit =
    readOnly(s"COPY $srcKey")
}
