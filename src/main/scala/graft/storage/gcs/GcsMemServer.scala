package graft.storage.gcs

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** In-process GCS JSON-API server — the conformance target for
  * [[GcsStore]] in a zero-egress environment (the role the fake-gcs-server
  * container plays in public CI setups). Implements the protocol subset
  * the store speaks with real HTTP semantics:
  *
  *  - media download with `Range:` → 206 partial content
  *  - `uploadType=media` inserts; `ifGenerationMatch=0` → 412 when the
  *    object exists (the conditional-create primitive)
  *  - name-ordered object listing with `prefix`/`startOffset`/`pageToken`
  *    pages and `nextPageToken`
  *  - `copyTo` server-side copy; per-object DELETE
  *
  * One ConcurrentSkipListMap per bucket, so listings are genuinely
  * ordered/paged.
  */
final class GcsMemServer(requiredHeader: Option[(String, String)] = None) {
  private final case class Obj(bytes: Array[Byte], mtime: Instant,
                               etag: String, generation: Long)
  private val buckets =
    new ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentSkipListMap[String, Obj]]()
  private val genSeq = new java.util.concurrent.atomic.AtomicLong(1)
  private final class ResumableSession(val bucket: String, val name: String) {
    val buf = new java.io.ByteArrayOutputStream()
  }
  private val sessions = new ConcurrentHashMap[String, ResumableSession]()
  private val sessionSeq = new java.util.concurrent.atomic.AtomicLong(0)
  val opCounts = new ConcurrentHashMap[String,
    java.util.concurrent.atomic.AtomicLong]()

  private val server = HttpServer.create(
    new InetSocketAddress("127.0.0.1", 0), 64)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
  server.setExecutor(pool)
  server.createContext("/", (ex: HttpExchange) => {
    try handle(ex)
    catch {
      case t: Throwable => respond(ex, 500, jsonError(t.toString))
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
    val raw = ex.getRequestURI.getRawPath
    val segs = raw.stripPrefix("/").split("/", -1).toSeq.map(decodeSegment)
    val q = parseQuery(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
    (ex.getRequestMethod, segs) match {
      // POST /upload/storage/v1/b/{bucket}/o?uploadType=media|resumable
      case ("POST", Seq("upload", "storage", "v1", "b", bucket, "o")) =>
        if (q.get("uploadType").contains("resumable"))
          initResumable(ex, bucket, q)
        else insert(ex, bucket, q)
      // PUT /upload/resumable/{id} with Content-Range
      case ("PUT", Seq("upload", "resumable", id)) =>
        resumableChunk(ex, id)
      // POST /storage/v1/b/{b}/o/{src}/copyTo/b/{b2}/o/{dst}
      case ("POST", Seq("storage", "v1", "b", b1, "o", src,
                        "copyTo", "b", b2, "o", dst)) =>
        copyTo(ex, b1, src, b2, dst)
      // GET /storage/v1/b/{bucket}/o  (listing)
      case ("GET", Seq("storage", "v1", "b", bucket, "o")) =>
        listObjects(ex, bucket, q)
      // GET /storage/v1/b/{bucket}/o/{obj}  (media or metadata)
      case ("GET", Seq("storage", "v1", "b", bucket, "o", obj)) =>
        if (q.get("alt").contains("media")) getMedia(ex, bucket, obj)
        else getMeta(ex, bucket, obj)
      case ("DELETE", Seq("storage", "v1", "b", bucket, "o", obj)) =>
        count("delete")
        val objects = buckets.get(bucket)
        if (objects == null || objects.remove(obj) == null)
          respond(ex, 404, jsonError(s"not found: $obj"))
        else respond(ex, 204, Array.empty)
      case _ => respond(ex, 400, jsonError(s"bad request: $raw"))
    }
  }

  private def insert(ex: HttpExchange, bucket: String,
                     q: Map[String, String]): Unit = {
    count("insert")
    val objects = buckets.get(bucket)
    if (objects == null) { respond(ex, 404, jsonError(bucket)); return }
    val name = q.getOrElse("name", "")
    if (name.isEmpty) { respond(ex, 400, jsonError("name required")); return }
    val bytes = ex.getRequestBody.readAllBytes()
    val obj = Obj(bytes, Instant.now(),
      graft.storage.s3.SigV4.sha256Hex(bytes).take(24),
      genSeq.incrementAndGet())
    if (q.get("ifGenerationMatch").contains("0")) {
      count("insert_conditional")
      if (objects.putIfAbsent(name, obj) != null) {
        respond(ex, 412, jsonError("conditionNotMet")); return
      }
    } else objects.put(name, obj)
    respond(ex, 200, metaJson(bucket, name, obj).getBytes(UTF_8))
  }

  private def initResumable(ex: HttpExchange, bucket: String,
                            q: Map[String, String]): Unit = {
    count("resumable_init")
    if (buckets.get(bucket) == null) {
      respond(ex, 404, jsonError(bucket)); return
    }
    val name = q.getOrElse("name", "")
    if (name.isEmpty) { respond(ex, 400, jsonError("name required")); return }
    val id = "rs-" + sessionSeq.incrementAndGet()
    sessions.put(id, new ResumableSession(bucket, name))
    ex.getResponseHeaders.set("Location", s"$endpoint/upload/resumable/$id")
    respond(ex, 200, Array.empty)
  }

  private def resumableChunk(ex: HttpExchange, id: String): Unit = {
    count("resumable_chunk")
    val s = sessions.get(id)
    if (s == null) { respond(ex, 404, jsonError(id)); return }
    val bytes = ex.getRequestBody.readAllBytes()
    // Content-Range: bytes a-b/total (chunks arrive in order)
    val range = Option(ex.getRequestHeaders.getFirst("Content-Range"))
      .getOrElse("")
    val m = "bytes (\\d+)-(\\d+)/(\\d+)".r.findFirstMatchIn(range)
    if (m.isEmpty) { respond(ex, 400, jsonError(s"bad range: $range")); return }
    val start = m.get.group(1).toLong
    val end = m.get.group(2).toLong
    val total = m.get.group(3).toLong
    // production constraints: chunks arrive in order with no gaps, and
    // every chunk but the last must be a 256 KiB multiple — a client that
    // ships an unaligned intermediate chunk must fail here like it would
    // against real GCS
    if (start != s.buf.size) {
      respond(ex, 400, jsonError(
        s"offset $start does not resume at ${s.buf.size}")); return
    }
    if (end + 1 != total && bytes.length % (256 * 1024) != 0) {
      respond(ex, 400, jsonError(
        s"intermediate chunk ${bytes.length} not a 256 KiB multiple"))
      return
    }
    s.buf.write(bytes)
    if (end + 1 == total) {
      sessions.remove(id)
      val data = s.buf.toByteArray
      val obj = Obj(data, Instant.now(),
        graft.storage.s3.SigV4.sha256Hex(data).take(24),
        genSeq.incrementAndGet())
      buckets.get(s.bucket).put(s.name, obj)
      respond(ex, 200, metaJson(s.bucket, s.name, obj).getBytes(UTF_8))
    } else {
      ex.getResponseHeaders.set("Range", s"bytes=0-$end")
      respond(ex, 308, Array.empty)
    }
  }

  private def copyTo(ex: HttpExchange, b1: String, src: String,
                     b2: String, dst: String): Unit = {
    count("copy")
    val from = Option(buckets.get(b1)).flatMap(m => Option(m.get(src)))
    val dstMap = buckets.get(b2)
    (from, Option(dstMap)) match {
      case (Some(o), Some(m)) =>
        val copied = o.copy(mtime = Instant.now(),
          generation = genSeq.incrementAndGet())
        m.put(dst, copied)
        respond(ex, 200, metaJson(b2, dst, copied).getBytes(UTF_8))
      case _ => respond(ex, 404, jsonError(s"copy $src -> $dst"))
    }
  }

  private def getMedia(ex: HttpExchange, bucket: String,
                       obj: String): Unit = {
    count("get")
    val oOpt = Option(buckets.get(bucket)).flatMap(m => Option(m.get(obj)))
    if (oOpt.isEmpty) { respond(ex, 404, jsonError(obj)); return }
    val o = oOpt.get
    Option(ex.getRequestHeaders.getFirst("Range")) match {
      case Some(r) if r.startsWith("bytes=") =>
        val spec = r.stripPrefix("bytes=")
        val (fromS, toS) = spec.span(_ != '-')
        val from = fromS.toLong
        if (from >= o.bytes.length) {
          respond(ex, 416, jsonError("range")); return
        }
        val to = toS.stripPrefix("-") match {
          case "" => o.bytes.length - 1L
          case s => math.min(s.toLong, o.bytes.length - 1L)
        }
        count("get_range")
        ex.getResponseHeaders.set("Content-Range",
          s"bytes $from-$to/${o.bytes.length}")
        respond(ex, 206,
          java.util.Arrays.copyOfRange(o.bytes, from.toInt, to.toInt + 1))
      case _ => respond(ex, 200, o.bytes)
    }
  }

  private def getMeta(ex: HttpExchange, bucket: String, obj: String): Unit = {
    count("meta")
    Option(buckets.get(bucket)).flatMap(m => Option(m.get(obj))) match {
      case Some(o) =>
        respond(ex, 200, metaJson(bucket, obj, o).getBytes(UTF_8))
      case None => respond(ex, 404, jsonError(obj))
    }
  }

  private def listObjects(ex: HttpExchange, bucket: String,
                          q: Map[String, String]): Unit = {
    count("list")
    val objects = buckets.get(bucket)
    if (objects == null) { respond(ex, 404, jsonError(bucket)); return }
    val prefix = q.getOrElse("prefix", "")
    // GCS documents that a page may hold FEWER items than maxResults while
    // more results exist — cap pages well below typical maxResults so any
    // client that reads one short page as exhaustion fails in tests
    val maxResults = q.get("maxResults").flatMap(_.toIntOption)
      .getOrElse(1000).min(1000).max(1).min(7)
    // pageToken (strictly-after continuation) wins over startOffset
    // (inclusive name floor) — GCS semantics
    val from = (q.get("pageToken"), q.get("startOffset")) match {
      case (Some(t), _) => objects.tailMap(t, false)
      case (_, Some(so)) if so >= prefix => objects.tailMap(so, true)
      case _ => objects.tailMap(prefix, true)
    }
    val page = from.entrySet().iterator().asScala
      .takeWhile(_.getKey.startsWith(prefix))
      .take(maxResults + 1).toVector
    val out = page.take(maxResults)
    val items = out.map(e => metaJson(bucket, e.getKey, e.getValue))
      .mkString("[", ",", "]")
    val next =
      if (page.size > maxResults)
        s""","nextPageToken":${jsonStr(out.last.getKey)}"""
      else ""
    respond(ex, 200,
      s"""{"kind":"storage#objects","items":$items$next}""".getBytes(UTF_8))
  }

  // -----------------------------------------------------------------

  private def metaJson(bucket: String, name: String, o: Obj): String =
    s"""{"kind":"storage#object","name":${jsonStr(name)},""" +
      s""""bucket":${jsonStr(bucket)},"size":"${o.bytes.length}",""" +
      s""""etag":${jsonStr(o.etag)},"generation":"${o.generation}",""" +
      s""""updated":${jsonStr(o.mtime.toString)}}"""

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jsonError(msg: String): Array[Byte] =
    s"""{"error":{"message":${jsonStr(msg)}}}""".getBytes(UTF_8)

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
}
