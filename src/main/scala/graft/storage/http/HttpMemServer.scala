package graft.storage.http

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.concurrent.ConcurrentHashMap
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process static-HTTP(S)+WebDAV server — the conformance target for
  * [[HttpStore]] in a zero-egress environment (the role an nginx
  * `dav_methods`/`autoindex` host plays in public CI). Serves:
  *
  *  - `GET /{key}` with `Range:` → 206 partial content (416 past EOF)
  *  - `HEAD /{key}` → Content-Length / Last-Modified / ETag
  *  - `PROPFIND` with `Depth` → `207 Multistatus` WebDAV XML
  *  - everything else (PUT/DELETE/...) → 405, like a static host
  */
final class HttpMemServer {
  private final case class Obj(bytes: Array[Byte], mtime: Instant,
                               etag: String)
  private val objects =
    new java.util.concurrent.ConcurrentSkipListMap[String, Obj]()
  val opCounts = new ConcurrentHashMap[String,
    java.util.concurrent.atomic.AtomicLong]()

  private val server = HttpServer.create(
    new InetSocketAddress("127.0.0.1", 0), 64)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
  server.createContext("/", (ex: HttpExchange) => {
    try handle(ex)
    catch { case t: Throwable => respond(ex, 500, t.toString.getBytes(UTF_8)) }
    finally ex.close()
  })
  server.start()

  val port: Int = server.getAddress.getPort
  val endpoint: String = s"http://127.0.0.1:$port"

  def stop(): Unit = server.stop(0)

  /** Populate content (the authoring side a writable backend would play). */
  def put(key: String, bytes: Array[Byte]): Unit =
    objects.put(key, Obj(bytes, Instant.now(),
      "\"" + graft.storage.s3.SigV4.sha256Hex(bytes).take(16) + "\""))

  private def count(op: String): Unit =
    opCounts.computeIfAbsent(op,
      _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()

  private def handle(ex: HttpExchange): Unit = {
    val key = java.net.URLDecoder.decode(
      ex.getRequestURI.getRawPath.stripPrefix("/"), UTF_8)
    ex.getRequestMethod match {
      case "GET" => get(ex, key)
      case "HEAD" => head(ex, key)
      case "PROPFIND" => propfind(ex, key)
      case m =>
        count("rejected_" + m.toLowerCase)
        respond(ex, 405, s"method $m not allowed".getBytes(UTF_8))
    }
  }

  private def httpDate(i: Instant): String =
    java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.format(
      i.atZone(java.time.ZoneOffset.UTC))

  private def get(ex: HttpExchange, key: String): Unit = {
    count("get")
    val o = objects.get(key)
    if (o == null) { respond(ex, 404, Array.empty); return }
    ex.getResponseHeaders.set("Last-Modified", httpDate(o.mtime))
    ex.getResponseHeaders.set("ETag", o.etag)
    Option(ex.getRequestHeaders.getFirst("Range")) match {
      case Some(r) if r.startsWith("bytes=") =>
        count("ranged_get")
        val spec = r.stripPrefix("bytes=")
        val Array(a, b) = (spec.split("-", -1) ++ Array("")).take(2)
        val start = a.toLong
        if (start >= o.bytes.length) { respond(ex, 416, Array.empty); return }
        val end =
          if (b.isEmpty) o.bytes.length - 1L
          else math.min(b.toLong, o.bytes.length - 1L)
        ex.getResponseHeaders.set("Content-Range",
          s"bytes $start-$end/${o.bytes.length}")
        respond(ex, 206,
          java.util.Arrays.copyOfRange(o.bytes, start.toInt, end.toInt + 1))
      case _ => respond(ex, 200, o.bytes)
    }
  }

  private def head(ex: HttpExchange, key: String): Unit = {
    count("head")
    val o = objects.get(key)
    if (o == null) { respond(ex, 404, Array.empty, head = true); return }
    ex.getResponseHeaders.set("Content-Length", o.bytes.length.toString)
    ex.getResponseHeaders.set("Last-Modified", httpDate(o.mtime))
    ex.getResponseHeaders.set("ETag", o.etag)
    // HEAD: headers only (sendResponseHeaders(-1) = no body)
    ex.sendResponseHeaders(200, -1)
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def propfind(ex: HttpExchange, prefix: String): Unit = {
    count("propfind")
    import scala.jdk.CollectionConverters._
    val hits = objects.entrySet().iterator().asScala
      .filter(_.getKey.startsWith(prefix)).toVector
    if (hits.isEmpty && prefix.nonEmpty) {
      respond(ex, 404, Array.empty); return
    }
    val entries = hits.map { e =>
      s"""<D:response><D:href>/${xmlEscape(e.getKey)}</D:href>
         |<D:propstat><D:prop>
         |<D:getcontentlength>${e.getValue.bytes.length}</D:getcontentlength>
         |<D:getlastmodified>${httpDate(e.getValue.mtime)}</D:getlastmodified>
         |</D:prop><D:status>HTTP/1.1 200 OK</D:status></D:propstat>
         |</D:response>""".stripMargin
    }.mkString
    val xml =
      s"""<?xml version="1.0" encoding="utf-8"?>
         |<D:multistatus xmlns:D="DAV:">$entries</D:multistatus>""".stripMargin
    ex.getResponseHeaders.set("Content-Type", "application/xml")
    respond(ex, 207, xml.getBytes(UTF_8))
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte],
                      head: Boolean = false): Unit = {
    if (head) { ex.sendResponseHeaders(code, -1); return }
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) {
      val os = ex.getResponseBody
      os.write(body)
      os.close()
    }
  }
}
