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
  *  - `GET /{key}` with `Range:` → 206 partial content (incl. RFC 7233
  *    suffix ranges `bytes=-N`; 416 past EOF)
  *  - `HEAD /{key}` → Content-Length / Last-Modified / ETag
  *  - `PROPFIND` on a file or collection RESOURCE with `Depth: 0|1|
  *    infinity` → `207 Multistatus` (percent-encoded hrefs, trailing
  *    '/' on collections); a non-resource path → 404, like a real host
  *  - everything else (PUT/DELETE/...) → 405, like a static host
  *
  * `requiredAuth` (e.g. `Some("Bearer sekrit")`) makes every request
  * demand that exact `Authorization` header value, 401 otherwise — the
  * protected-static-host setup of reference #2143.
  */
final class HttpMemServer(requiredAuth: Option[String] = None) {
  private final case class Obj(bytes: Array[Byte], mtime: Instant,
                               etag: String)
  private val objects =
    new java.util.concurrent.ConcurrentSkipListMap[String, Obj]()
  val opCounts = new ConcurrentHashMap[String,
    java.util.concurrent.atomic.AtomicLong]()

  private val server = HttpServer.create(
    new InetSocketAddress("127.0.0.1", 0), 64)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  server.setExecutor(pool)
  server.createContext("/", (ex: HttpExchange) => {
    try handle(ex)
    catch { case t: Throwable => respond(ex, 500, t.toString.getBytes(UTF_8)) }
    finally ex.close()
  })
  server.start()

  val port: Int = server.getAddress.getPort
  val endpoint: String = s"http://127.0.0.1:$port"

  def stop(): Unit = { server.stop(0); pool.shutdown() } // non-daemon pool would pin a runMain JVM

  /** Populate content (the authoring side a writable backend would play). */
  def put(key: String, bytes: Array[Byte]): Unit =
    objects.put(key, Obj(bytes, Instant.now(),
      "\"" + graft.storage.s3.SigV4.sha256Hex(bytes).take(16) + "\""))

  private def count(op: String): Unit =
    opCounts.computeIfAbsent(op,
      _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()

  private def handle(ex: HttpExchange): Unit = {
    // URI-path decode: percent sequences only ('+' is literal in paths)
    val key = java.net.URLDecoder.decode(
      ex.getRequestURI.getRawPath.stripPrefix("/").replace("+", "%2B"),
      UTF_8)
    if (requiredAuth.exists(a =>
        Option(ex.getRequestHeaders.getFirst("Authorization")) != Some(a))) {
      count("unauthorized")
      respond(ex, 401, "unauthorized".getBytes(UTF_8))
      return
    }
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
        val len = o.bytes.length.toLong
        // RFC 7233: "bytes=-N" is a suffix range (last N bytes)
        val (start, end) =
          if (a.isEmpty) (math.max(0L, len - b.toLong), len - 1)
          else (a.toLong,
            if (b.isEmpty) len - 1 else math.min(b.toLong, len - 1))
        if (start >= len || start > end) {
          respond(ex, 416, Array.empty); return
        }
        ex.getResponseHeaders.set("Content-Range", s"bytes $start-$end/$len")
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

  private def encPath(key: String): String =
    key.split("/", -1).map(seg =>
      java.net.URLEncoder.encode(seg, UTF_8)
        .replace("+", "%20").replace("*", "%2A").replace("%7E", "~"))
      .mkString("/")

  /** RFC 4918 PROPFIND over the flat key map: a request names a RESOURCE
    * — a file (exact key) or a collection (directory path) — never a
    * filename prefix; anything else is 404, exactly like a real DAV
    * host. `Depth: 0` answers the resource alone, `1` adds immediate
    * members (files + sub-collections, hrefs percent-encoded with
    * trailing '/' on collections), `infinity` the whole subtree.
    */
  private def propfind(ex: HttpExchange, target: String): Unit = {
    count("propfind")
    import scala.jdk.CollectionConverters._
    val depth = Option(ex.getRequestHeaders.getFirst("Depth"))
      .getOrElse("infinity")
    def fileEntry(key: String, o: Obj): String =
      s"""<D:response><D:href>/${xmlEscape(encPath(key))}</D:href>
         |<D:propstat><D:prop>
         |<D:getcontentlength>${o.bytes.length}</D:getcontentlength>
         |<D:getlastmodified>${httpDate(o.mtime)}</D:getlastmodified>
         |</D:prop><D:status>HTTP/1.1 200 OK</D:status></D:propstat>
         |</D:response>""".stripMargin
    def dirEntry(path: String): String =
      s"""<D:response><D:href>/${xmlEscape(encPath(path.stripSuffix("/")))}/</D:href>
         |<D:propstat><D:prop><D:resourcetype><D:collection/></D:resourcetype>
         |</D:prop><D:status>HTTP/1.1 200 OK</D:status></D:propstat>
         |</D:response>""".stripMargin
    val exact = Option(objects.get(target))
    val dirPath = // normalized collection path ("" = root, else "a/b/")
      if (target.isEmpty) "" else target.stripSuffix("/") + "/"
    val under = objects.entrySet().iterator().asScala
      .filter(_.getKey.startsWith(dirPath)).toVector
    val entries: Seq[String] = exact match {
      case Some(o) => Seq(fileEntry(target, o)) // a file resource
      case None if under.isEmpty && dirPath.nonEmpty =>
        respond(ex, 404, Array.empty); return
      case None =>
        val self = dirEntry(dirPath)
        depth match {
          case "0" => Seq(self)
          case "1" =>
            val files = under.filter(
              !_.getKey.drop(dirPath.length).contains('/'))
              .map(e => fileEntry(e.getKey, e.getValue))
            val subdirs = under.map(_.getKey.drop(dirPath.length))
              .filter(_.contains('/')).map(k => k.takeWhile(_ != '/'))
              .distinct.map(d => dirEntry(dirPath + d))
            self +: (subdirs ++ files)
          case _ => // infinity
            self +: under.map(e => fileEntry(e.getKey, e.getValue))
        }
    }
    val xml =
      s"""<?xml version="1.0" encoding="utf-8"?>
         |<D:multistatus xmlns:D="DAV:">${entries.mkString}</D:multistatus>""".stripMargin
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
