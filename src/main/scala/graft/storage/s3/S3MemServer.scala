package graft.storage.s3

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** In-process S3-compatible server over the JDK's built-in HTTP server —
  * the MinIO stand-in for this environment (zero egress). Implements the
  * protocol subset [[S3Store]] speaks, with real HTTP semantics:
  *
  *  - `GET /bucket/key` with `Range: bytes=a-b` → 206 partial content
  *  - `PUT /bucket/key` with `If-None-Match: *` → 412 when the key exists
  *    (the conditional-create primitive commits depend on)
  *  - `GET /bucket?list-type=2&prefix=&start-after=&max-keys=` →
  *    lexicographic `ListObjectsV2` pages with `IsTruncated`
  *  - `POST /bucket?delete` → batched `DeleteObjects`
  *  - multipart upload (`?uploads`, `?partNumber`, `?uploadId`)
  *  - `PUT` with `x-amz-copy-source` → server-side copy
  *
  * The key space is one ConcurrentSkipListMap per bucket, so listings are
  * genuinely ordered/paged — a conformance target, not a mock. Mirrors the
  * role of the reference's storage conformance suite
  * (icechunk/tests/test_storage.rs).
  */
final class S3MemServer(requiredHeader: Option[(String, String)] = None) {
  private final case class Obj(bytes: Array[Byte], mtime: Instant,
                               etag: String)
  private val buckets =
    new ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentSkipListMap[String, Obj]]()
  private val uploads = new ConcurrentHashMap[String,
    java.util.concurrent.ConcurrentSkipListMap[Int, Array[Byte]]]()
  private val uploadSeq = new AtomicLong(0)
  /** Per-op counters: requests observed by verb+query kind (list/get/...). */
  val opCounts = new ConcurrentHashMap[String, AtomicLong]()
  /** Keys returned across all LIST responses (the O(1)-listing probe). */
  val listedKeys = new AtomicLong(0)

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

  def createBucket(name: String): Unit =
    buckets.putIfAbsent(name,
      new java.util.concurrent.ConcurrentSkipListMap[String, Obj]())

  def objectCount(bucket: String): Int =
    Option(buckets.get(bucket)).map(_.size).getOrElse(0)

  private def count(op: String): Unit =
    opCounts.computeIfAbsent(op, _ => new AtomicLong()).incrementAndGet()

  /** Null-safe counter read (0 when the op was never observed). */
  def opCount(op: String): Long =
    Option(opCounts.get(op)).map(_.get()).getOrElse(0L)

  // -----------------------------------------------------------------

  private def handle(ex: HttpExchange): Unit = {
    if (requiredHeader.exists { case (h, v) =>
        Option(ex.getRequestHeaders.getFirst(h)) != Some(v) }) {
      count("denied")
      respond(ex, 403, xmlError("AccessDenied", "missing required header"))
      return
    }
    // Parse from the RAW path and percent-decode exactly once: getPath
    // already decodes, so decoding its result again would corrupt keys
    // containing '+' or '%'.
    val path = ex.getRequestURI.getRawPath.stripPrefix("/")
    val (bucket0, key0) = path.span(_ != '/')
    val bucket = decodeSegment(bucket0)
    val key = decodeSegment(key0.stripPrefix("/"))
    val q = parseQuery(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
    val objects = buckets.get(bucket)
    if (objects == null) {
      respond(ex, 404, xmlError("NoSuchBucket", bucket)); return
    }
    (ex.getRequestMethod, key) match {
      case ("GET", "") if q.contains("list-type") => listObjects(ex, objects, q)
      case ("GET", k) => getObject(ex, objects, k)
      case ("HEAD", k) => headObject(ex, objects, k)
      case ("PUT", k) if q.contains("partNumber") => putPart(ex, q)
      case ("PUT", k) => putObject(ex, objects, k)
      case ("POST", k) if q.contains("uploads") => initiateUpload(ex, k)
      case ("POST", k) if q.contains("uploadId") =>
        completeUpload(ex, objects, k, q("uploadId"))
      case ("POST", "") if q.contains("delete") => batchDelete(ex, objects)
      case ("DELETE", k) =>
        count("delete"); objects.remove(key); respond(ex, 204, Array.empty)
      case _ => respond(ex, 400, xmlError("BadRequest", path))
    }
  }

  private def getObject(ex: HttpExchange, objects: java.util.Map[String, Obj],
                        key: String): Unit = {
    count("get")
    val o = objects.get(key)
    if (o == null) { respond(ex, 404, xmlError("NoSuchKey", key)); return }
    Option(ex.getRequestHeaders.getFirst("Range")) match {
      case Some(r) if r.startsWith("bytes=") =>
        val spec = r.stripPrefix("bytes=")
        val (fromS, toS) = spec.span(_ != '-')
        val from = fromS.toLong
        if (from >= o.bytes.length) {
          respond(ex, 416, xmlError("InvalidRange", key)); return
        }
        val to = toS.stripPrefix("-") match {
          case "" => o.bytes.length - 1L
          case s => math.min(s.toLong, o.bytes.length - 1L)
        }
        count("get_range")
        val body = java.util.Arrays.copyOfRange(o.bytes, from.toInt,
          to.toInt + 1)
        ex.getResponseHeaders.set("Content-Range",
          s"bytes $from-$to/${o.bytes.length}")
        respond(ex, 206, body)
      case _ => respond(ex, 200, o.bytes)
    }
  }

  private def headObject(ex: HttpExchange,
                         objects: java.util.Map[String, Obj],
                         key: String): Unit = {
    count("head")
    val o = objects.get(key)
    if (o == null) { ex.sendResponseHeaders(404, -1); return }
    ex.getResponseHeaders.set("Content-Length", o.bytes.length.toString)
    ex.getResponseHeaders.set("ETag", o.etag)
    ex.getResponseHeaders.set("Last-Modified",
      java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.format(
        o.mtime.atZone(java.time.ZoneOffset.UTC)))
    ex.sendResponseHeaders(200, -1)
  }

  private def putObject(ex: HttpExchange,
                        objects: java.util.concurrent.ConcurrentSkipListMap[String, Obj],
                        key: String): Unit = {
    count("put")
    val copySource = Option(
      ex.getRequestHeaders.getFirst("x-amz-copy-source"))
    val bytes = copySource match {
      case Some(src) =>
        count("copy")
        val p = decodeSegment(src.stripPrefix("/"))
        val (b, k) = p.span(_ != '/')
        val o = Option(buckets.get(b)).flatMap(m =>
          Option(m.get(k.stripPrefix("/"))))
        o match {
          case None =>
            respond(ex, 404, xmlError("NoSuchKey", src)); return
          case Some(x) => x.bytes
        }
      case None => ex.getRequestBody.readAllBytes()
    }
    val obj = Obj(bytes, Instant.now(), "\"" + SigV4.sha256Hex(bytes).take(32) + "\"")
    val conditional = Option(
      ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")
    if (conditional) {
      count("put_conditional")
      if (objects.putIfAbsent(key, obj) != null) {
        respond(ex, 412, xmlError("PreconditionFailed", key)); return
      }
    } else objects.put(key, obj)
    ex.getResponseHeaders.set("ETag", obj.etag)
    if (copySource.isDefined) {
      if (maybeSlowCopyError(ex)) return
      respond(ex, 200,
        ("<CopyObjectResult><ETag>" + obj.etag +
          "</ETag></CopyObjectResult>").getBytes(UTF_8))
    } else respond(ex, 200, Array.empty)
  }

  /** When > 0, the next LIST responses carry ZERO Contents but
    * `IsTruncated=true` plus a NextContinuationToken — the internal
    * page-boundary shape S3 can emit mid-listing. A client that treats
    * page emptiness as end-of-listing silently reports a partial
    * listing as complete (ADVICE r15); a correct client resumes via the
    * token.
    */
  @volatile var emptyTruncatedPages: Int = 0

  /** Like [[emptyTruncatedPages]] but WITHOUT a NextContinuationToken —
    * out-of-spec for list-type=2, but the honest-fallback contract
    * (report truncated / fail loud, never a silent partial) deserves
    * its own pin.
    */
  @volatile var emptyTruncatedNoTokenPages: Int = 0

  private def listObjects(ex: HttpExchange,
      objects: java.util.concurrent.ConcurrentSkipListMap[String, Obj],
      q: Map[String, String]): Unit = {
    count("list")
    val prefix = q.getOrElse("prefix", "")
    val startAfter = q.get("start-after").orElse(q.get("continuation-token"))
    if (emptyTruncatedPages > 0 || emptyTruncatedNoTokenPages > 0) {
      // the real-S3 shape: zero Contents, IsTruncated=true, and (unless
      // the no-token variant is armed) a NextContinuationToken that
      // resumes from the SAME position (this server's tokens are resume
      // keys; real tokens are opaque)
      val withToken = emptyTruncatedPages > 0
      if (withToken) emptyTruncatedPages -= 1
      else emptyTruncatedNoTokenPages -= 1
      count("list_empty_truncated")
      val token =
        if (withToken)
          s"<NextContinuationToken>${xmlEscape(startAfter.getOrElse(prefix))}" +
            "</NextContinuationToken>"
        else ""
      respond(ex, 200,
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<ListBucketResult>
           |<IsTruncated>true</IsTruncated>
           |<KeyCount>0</KeyCount>
           |$token
           |</ListBucketResult>""".stripMargin.getBytes(UTF_8))
      return
    }
    val maxKeys = q.get("max-keys").flatMap(_.toIntOption)
      .getOrElse(1000).min(1000).max(1)
    val from = startAfter match {
      case Some(sa) if sa >= prefix => objects.tailMap(sa, false)
      case _ => objects.tailMap(prefix, true)
    }
    val page = from.entrySet().iterator().asScala
      .takeWhile(_.getKey.startsWith(prefix))
      .take(maxKeys + 1).toVector
    val truncated = page.size > maxKeys
    val out = page.take(maxKeys)
    listedKeys.addAndGet(out.size)
    val contents = out.map { e =>
      s"""<Contents><Key>${xmlEscape(e.getKey)}</Key>""" +
        s"""<Size>${e.getValue.bytes.length}</Size>""" +
        s"""<LastModified>${e.getValue.mtime}</LastModified>""" +
        s"""<ETag>${xmlEscape(e.getValue.etag)}</ETag></Contents>"""
    }.mkString
    val token =
      if (truncated && out.nonEmpty)
        s"<NextContinuationToken>${xmlEscape(out.last.getKey)}" +
          "</NextContinuationToken>"
      else ""
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<ListBucketResult>
         |<IsTruncated>$truncated</IsTruncated>
         |<KeyCount>${out.size}</KeyCount>
         |$token
         |$contents
         |</ListBucketResult>""".stripMargin
    respond(ex, 200, xml.getBytes(UTF_8))
  }

  private def batchDelete(ex: HttpExchange,
                          objects: java.util.Map[String, Obj]): Unit = {
    count("delete_batch")
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val keys = "<Key>([^<]*)</Key>".r.findAllMatchIn(body)
      .map(m => xmlUnescape(m.group(1))).toVector
    keys.foreach(objects.remove)
    respond(ex, 200,
      """<?xml version="1.0"?><DeleteResult/>""".getBytes(UTF_8))
  }

  private def initiateUpload(ex: HttpExchange, key: String): Unit = {
    count("multipart_init")
    val id = "up-" + uploadSeq.incrementAndGet()
    uploads.put(id,
      new java.util.concurrent.ConcurrentSkipListMap[Int, Array[Byte]]())
    respond(ex, 200,
      (s"<InitiateMultipartUploadResult><UploadId>$id</UploadId>" +
        "</InitiateMultipartUploadResult>").getBytes(UTF_8))
  }

  private def putPart(ex: HttpExchange, q: Map[String, String]): Unit = {
    count("multipart_part")
    val parts = uploads.get(q("uploadId"))
    if (parts == null) {
      respond(ex, 404, xmlError("NoSuchUpload", q("uploadId"))); return
    }
    // UploadPartCopy: the part body comes from another object
    // (x-amz-copy-source + optional x-amz-copy-source-range), and —
    // like CopyObject — the result ETag rides the response BODY as
    // <CopyPartResult>, not a header
    val copySource = Option(
      ex.getRequestHeaders.getFirst("x-amz-copy-source"))
    val bytes = copySource match {
      case Some(src) =>
        count("copy_part")
        val p = decodeSegment(src.stripPrefix("/"))
        val (b, k) = p.span(_ != '/')
        Option(buckets.get(b)).flatMap(m =>
            Option(m.get(k.stripPrefix("/")))) match {
          case None => respond(ex, 404, xmlError("NoSuchKey", src)); return
          case Some(o) =>
            Option(ex.getRequestHeaders
                .getFirst("x-amz-copy-source-range")) match {
              case Some(r) if r.startsWith("bytes=") =>
                val spec = r.stripPrefix("bytes=")
                val (fromS, toS) = spec.span(_ != '-')
                val from = fromS.toLong
                val to = math.min(toS.stripPrefix("-").toLong,
                  o.bytes.length - 1L)
                java.util.Arrays.copyOfRange(o.bytes, from.toInt,
                  to.toInt + 1)
              case _ => o.bytes
            }
        }
      case None => ex.getRequestBody.readAllBytes()
    }
    parts.put(q("partNumber").toInt, bytes)
    val etag = "\"" + SigV4.sha256Hex(bytes).take(32) + "\""
    if (copySource.isDefined) {
      if (maybeSlowCopyError(ex)) return
      respond(ex, 200,
        (s"<CopyPartResult><ETag>$etag</ETag></CopyPartResult>")
          .getBytes(UTF_8))
    } else {
      ex.getResponseHeaders.set("ETag", etag)
      respond(ex, 200, Array.empty)
    }
  }

  /** Fault injection for the documented CopyObject quirk: a long copy
    * can return HTTP 200 whose body is an `<Error>` (the service
    * commits the status line before the copy finishes). While armed,
    * each copy response is the quirk instead of the result — the client
    * MUST read the body to notice.
    */
  @volatile var slowCopyErrors: Int = 0
  private def maybeSlowCopyError(ex: HttpExchange): Boolean =
    synchronized {
      if (slowCopyErrors <= 0) false
      else {
        slowCopyErrors -= 1
        count("copy_200_error")
        respond(ex, 200, xmlError("InternalError",
          "copy failed after response start"))
        true
      }
    }

  private def completeUpload(ex: HttpExchange,
                             objects: java.util.Map[String, Obj],
                             key: String, uploadId: String): Unit = {
    count("multipart_complete")
    val parts = uploads.remove(uploadId)
    if (parts == null) {
      respond(ex, 404, xmlError("NoSuchUpload", uploadId)); return
    }
    ex.getRequestBody.readAllBytes() // completion XML: part order is the map
    val total = parts.values().asScala.map(_.length).sum
    val merged = new Array[Byte](total)
    var off = 0
    parts.values().asScala.foreach { p =>
      System.arraycopy(p, 0, merged, off, p.length); off += p.length
    }
    objects.put(key, Obj(merged, Instant.now(),
      "\"" + SigV4.sha256Hex(merged).take(32) + "\""))
    respond(ex, 200,
      "<CompleteMultipartUploadResult/>".getBytes(UTF_8))
  }

  // -----------------------------------------------------------------

  /** RFC 3986 percent-decode: '+' is a literal plus (clients encode it as
    * %2B), only %XX sequences decode.
    */
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
  private def xmlUnescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
}
