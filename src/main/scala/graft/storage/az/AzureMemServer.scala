package graft.storage.az

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** In-process Azure-Blob-compatible server — the conformance target for
  * [[AzureStore]] in a zero-egress environment (the role Azurite plays in
  * public CI setups). Implements the protocol subset the store speaks:
  *
  *  - `GET /{container}/{blob}` with `Range:`/`x-ms-range` → 206
  *  - `PUT` BlockBlob; `If-None-Match: *` → 409 BlobAlreadyExists (the
  *    conditional-create primitive)
  *  - `GET /{container}?restype=container&comp=list` → name-ordered XML
  *    pages; `marker` is an opaque token the server issued (anything
  *    else → 400, as in production), `NextMarker` the next such token
  *  - `PUT` with `x-ms-copy-source` → server-side copy; per-blob DELETE
  *
  * One ConcurrentSkipListMap per container, so listings are genuinely
  * ordered/paged.
  */
final class AzureMemServer(requiredHeader: Option[(String, String)] = None) {
  private final case class Blob(bytes: Array[Byte], mtime: Instant,
                                etag: String)
  private val containers =
    new ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentSkipListMap[String, Blob]]()
  // staged blocks: (container, blob, blockId) -> bytes
  private val stagedBlocks =
    new ConcurrentHashMap[(String, String, String), Array[Byte]]()
  val opCounts = new ConcurrentHashMap[String,
    java.util.concurrent.atomic.AtomicLong]()
  /** While > 0, each Copy Blob responds 202 `x-ms-copy-status: pending`
    * without copying — the async-copy hazard the client must detect.
    */
  @volatile var asyncPendingCopies: Int = 0

  private val server = HttpServer.create(
    new InetSocketAddress("127.0.0.1", 0), 64)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
  server.setExecutor(pool)
  server.createContext("/", (ex: HttpExchange) => {
    try handle(ex)
    catch {
      case t: Throwable =>
        respond(ex, 500, xmlError("InternalError", t.toString))
    } finally ex.close()
  })
  server.start()

  val port: Int = server.getAddress.getPort
  val endpoint: String = s"http://127.0.0.1:$port"

  def stop(): Unit = { server.stop(0); pool.shutdown() } // non-daemon pool would pin a runMain JVM

  def createContainer(name: String): Unit =
    containers.putIfAbsent(name,
      new java.util.concurrent.ConcurrentSkipListMap[String, Blob]())

  def blobCount(container: String): Int =
    Option(containers.get(container)).map(_.size).getOrElse(0)

  private def count(op: String): Unit =
    opCounts.computeIfAbsent(op,
      _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()

  /** Null-safe counter read (0 when the op was never observed). */
  def opCount(op: String): Long =
    Option(opCounts.get(op)).map(_.get()).getOrElse(0L)

  // -----------------------------------------------------------------

  private def handle(ex: HttpExchange): Unit = {
    if (requiredHeader.exists { case (h, v) =>
        Option(ex.getRequestHeaders.getFirst(h)) != Some(v) }) {
      count("denied")
      respond(ex, 403, "missing required header".getBytes)
      return
    }
    val path = ex.getRequestURI.getRawPath.stripPrefix("/")
    val (c0, b0) = path.span(_ != '/')
    val container = decodeSegment(c0)
    val blob = b0.stripPrefix("/").split("/", -1).map(decodeSegment)
      .mkString("/")
    val q = parseQuery(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
    val blobs = containers.get(container)
    if (blobs == null) {
      respond(ex, 404, xmlError("ContainerNotFound", container)); return
    }
    (ex.getRequestMethod, blob) match {
      case ("GET", "") if q.get("comp").contains("list") =>
        listBlobs(ex, blobs, q)
      case ("GET", b) => getBlob(ex, blobs, b)
      case ("HEAD", b) => headBlob(ex, blobs, b)
      case ("PUT", b) if q.get("comp").contains("block") &&
          q.contains("blockid") =>
        count("put_block")
        stagedBlocks.put((container, b, q("blockid")),
          ex.getRequestBody.readAllBytes())
        respond(ex, 201, Array.empty)
      case ("PUT", b) if q.get("comp").contains("blocklist") =>
        putBlockList(ex, container, blobs, b)
      case ("PUT", b) => putBlob(ex, blobs, b)
      case ("DELETE", b) =>
        count("delete")
        if (blobs.remove(b) == null)
          respond(ex, 404, xmlError("BlobNotFound", b))
        else respond(ex, 202, Array.empty)
      case _ => respond(ex, 400, xmlError("BadRequest", path))
    }
  }

  private def getBlob(ex: HttpExchange,
                      blobs: java.util.Map[String, Blob],
                      name: String): Unit = {
    count("get")
    val b = blobs.get(name)
    if (b == null) { respond(ex, 404, xmlError("BlobNotFound", name)); return }
    val range = Option(ex.getRequestHeaders.getFirst("x-ms-range"))
      .orElse(Option(ex.getRequestHeaders.getFirst("Range")))
    range match {
      case Some(r) if r.startsWith("bytes=") =>
        val spec = r.stripPrefix("bytes=")
        val (fromS, toS) = spec.span(_ != '-')
        val from = fromS.toLong
        if (from >= b.bytes.length) {
          respond(ex, 416, xmlError("InvalidRange", name)); return
        }
        val to = toS.stripPrefix("-") match {
          case "" => b.bytes.length - 1L
          case s => math.min(s.toLong, b.bytes.length - 1L)
        }
        count("get_range")
        ex.getResponseHeaders.set("Content-Range",
          s"bytes $from-$to/${b.bytes.length}")
        respond(ex, 206,
          java.util.Arrays.copyOfRange(b.bytes, from.toInt, to.toInt + 1))
      case _ => respond(ex, 200, b.bytes)
    }
  }

  private def headBlob(ex: HttpExchange,
                       blobs: java.util.Map[String, Blob],
                       name: String): Unit = {
    count("head")
    val b = blobs.get(name)
    if (b == null) { ex.sendResponseHeaders(404, -1); return }
    ex.getResponseHeaders.set("Content-Length", b.bytes.length.toString)
    ex.getResponseHeaders.set("ETag", b.etag)
    ex.getResponseHeaders.set("Last-Modified",
      java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.format(
        b.mtime.atZone(java.time.ZoneOffset.UTC)))
    ex.sendResponseHeaders(200, -1)
  }

  private def putBlob(ex: HttpExchange,
      blobs: java.util.concurrent.ConcurrentSkipListMap[String, Blob],
      name: String): Unit = {
    count("put")
    val copySource = Option(
      ex.getRequestHeaders.getFirst("x-ms-copy-source"))
    // fault injection: real Copy Blob is ASYNC by default — while armed,
    // respond 202 x-ms-copy-status: pending WITHOUT copying (the
    // scheduled copy "hasn't finished"), the exact hazard the client's
    // x-ms-requires-sync + status check must catch. A client that sends
    // requires-sync and verifies the status never treats this as done.
    if (copySource.isDefined && asyncPendingCopies > 0) synchronized {
      if (asyncPendingCopies > 0) {
        asyncPendingCopies -= 1
        count("copy_pending")
        ex.getResponseHeaders.set("x-ms-copy-status", "pending")
        respond(ex, 202, Array.empty)
        return
      }
    }
    val bytes = copySource match {
      case Some(src) =>
        count("copy")
        // source URL: {endpoint}/{container}/{blob}[?...]
        val noQuery = src.takeWhile(_ != '?')
        val rel = noQuery.stripPrefix(endpoint).stripPrefix("/")
        val (sc, sb) = rel.span(_ != '/')
        val found = Option(containers.get(decodeSegment(sc))).flatMap(m =>
          Option(m.get(sb.stripPrefix("/").split("/", -1)
            .map(decodeSegment).mkString("/"))))
        found match {
          case None =>
            respond(ex, 404, xmlError("CannotVerifyCopySource", src)); return
          case Some(x) => x.bytes
        }
      case None => ex.getRequestBody.readAllBytes()
    }
    val blob = Blob(bytes, Instant.now(),
      "\"" + graft.storage.s3.SigV4.sha256Hex(bytes).take(32) + "\"")
    val conditional = Option(
      ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")
    if (conditional) {
      count("put_conditional")
      if (blobs.putIfAbsent(name, blob) != null) {
        respond(ex, 409, xmlError("BlobAlreadyExists", name)); return
      }
    } else blobs.put(name, blob)
    ex.getResponseHeaders.set("ETag", blob.etag)
    if (copySource.isDefined)
      ex.getResponseHeaders.set("x-ms-copy-status", "success")
    respond(ex, 201, Array.empty)
  }

  private def putBlockList(ex: HttpExchange, container: String,
      blobs: java.util.concurrent.ConcurrentSkipListMap[String, Blob],
      name: String): Unit = {
    count("put_blocklist")
    val xml = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val ids = "<Latest>([^<]*)</Latest>".r.findAllMatchIn(xml)
      .map(_.group(1)).toVector
    // validate BEFORE consuming: a failed commit leaves every staged
    // block in place (as production does — the client may retry with a
    // corrected list)
    if (ids.exists(id => !stagedBlocks.containsKey((container, name, id)))) {
      respond(ex, 400, xmlError("InvalidBlockList", name)); return
    }
    val parts = ids.flatMap(id =>
      Option(stagedBlocks.remove((container, name, id))))
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(out.write)
    val data = out.toByteArray
    blobs.put(name, Blob(data, Instant.now(),
      "\"" + graft.storage.s3.SigV4.sha256Hex(data).take(32) + "\""))
    respond(ex, 201, Array.empty)
  }

  private def listBlobs(ex: HttpExchange,
      blobs: java.util.concurrent.ConcurrentSkipListMap[String, Blob],
      q: Map[String, String]): Unit = {
    count("list")
    val prefix = q.getOrElse("prefix", "")
    val marker = q.get("marker").filter(_.nonEmpty)
    val maxResults = q.get("maxresults").flatMap(_.toIntOption)
      .getOrElse(5000).min(5000).max(1)
    // Markers are OPAQUE continuation tokens, exactly like production
    // Azure: this stub only honors tokens it issued itself ("tok:" +
    // base64 of the resume point) and answers 400 for anything else —
    // a client that seeds marker with a blob name must fail here too.
    val from = marker match {
      case Some(m) if m.startsWith("tok:") =>
        val resume = new String(java.util.Base64.getUrlDecoder
          .decode(m.drop(4)), UTF_8)
        blobs.tailMap(resume, false)
      case Some(_) =>
        respond(ex, 400, xmlError("OutOfRangeQueryParameterValue", "marker"))
        return
      case _ => blobs.tailMap(prefix, true)
    }
    val page = from.entrySet().iterator().asScala
      .takeWhile(_.getKey.startsWith(prefix))
      .take(maxResults + 1).toVector
    val truncated = page.size > maxResults
    val out = page.take(maxResults)
    val entries = out.map { e =>
      s"<Blob><Name>${xmlEscape(e.getKey)}</Name><Properties>" +
        s"<Content-Length>${e.getValue.bytes.length}</Content-Length>" +
        "<Last-Modified>" +
        java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.format(
          e.getValue.mtime.atZone(java.time.ZoneOffset.UTC)) +
        "</Last-Modified>" +
        s"<Etag>${xmlEscape(e.getValue.etag)}</Etag>" +
        "</Properties></Blob>"
    }.mkString
    val next =
      if (truncated) "<NextMarker>tok:" +
        java.util.Base64.getUrlEncoder.withoutPadding
          .encodeToString(out.last.getKey.getBytes(UTF_8)) + "</NextMarker>"
      else "<NextMarker/>"
    val xml =
      s"""<?xml version="1.0" encoding="utf-8"?>
         |<EnumerationResults>
         |<Blobs>$entries</Blobs>
         |$next
         |</EnumerationResults>""".stripMargin
    respond(ex, 200, xml.getBytes(UTF_8))
  }

  // -----------------------------------------------------------------

  private def decodeSegment(s: String): String =
    java.net.URLDecoder.decode(s.replace("+", "%2B"), UTF_8)

  private def parseQuery(raw: String): Map[String, String] =
    raw.split("&").filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      if (i < 0) (java.net.URLDecoder.decode(kv, UTF_8), "")
      else (java.net.URLDecoder.decode(kv.take(i), UTF_8),
        java.net.URLDecoder.decode(kv.drop(i + 1), UTF_8))
    }.toMap

  private def respond(ex: HttpExchange, code: Int,
                      body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) {
      val os = ex.getResponseBody
      os.write(body); os.close()
    }
  }

  private def xmlError(code: String, detail: String): Array[Byte] =
    (s"""<?xml version="1.0"?><Error><Code>$code</Code>""" +
      s"<Message>${xmlEscape(detail)}</Message></Error>").getBytes(UTF_8)

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
