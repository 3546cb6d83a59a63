package graft.core

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Opt-in structured tracing for the engine's driver-side operations —
  * the observability-export analog of the reference's experimental
  * OpenTelemetry OTLP tracing (#2234, Changelog 2.1.0). Spans are
  * emitted as JSON lines (one object per completed span: name, ISO
  * start, duration µs, parent, error, string attributes), a format any
  * OTLP collector ingests via a file receiver — a wire client would
  * need network egress, which this library never assumes.
  *
  * Disabled (the default) costs one volatile read per instrumented
  * operation and allocates nothing. Enable per process:
  * {{{
  * Trace.toJsonLines("/tmp/graft-trace.jsonl")   // or
  * Trace.toMemory()                              // specs / inspection
  * }}}
  * or set `spark.graft.trace.path` before `Repository.create/open`
  * (picked up there). Span nesting is per-thread: a span started inside
  * another records it as `parent` (commit → flush → manifest write).
  *
  * Executor-side scan metrics (bytes fetched / GETs / chunks decoded)
  * already flow through Spark's DSv2 `CustomMetric` surface
  * ([[graft.sources.GraftTableProvider]] `GraftMetrics`) and appear in
  * the Spark UI per scan; the driver-side `scan.plan` span here records
  * the planning decision (partition count, bounds) that explains them.
  */
object Trace {

  final case class Span(name: String, startMillis: Long, durMicros: Long,
                        parent: Option[String], error: Option[String],
                        attrs: Map[String, String],
                        // W3C-style ids assigned at span START so child
                        // spans (which COMPLETE first) can link their
                        // parent: 16-byte traceId shared by a nesting
                        // tree, 8-byte spanId per span, hex-encoded
                        traceId: String = "", spanId: String = "",
                        parentSpanId: String = "") {
    def toJson: String = {
      def esc(s: String) =
        s.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case c if c < ' ' => "\\u%04x".format(c.toInt)
          case c => c.toString
        }
      val base = Seq(
        s""""name":"${esc(name)}"""",
        s""""start":"${java.time.Instant.ofEpochMilli(startMillis)}"""",
        s""""dur_us":$durMicros""") ++
        parent.map(p => s""""parent":"${esc(p)}"""") ++
        error.map(e => s""""error":"${esc(e)}"""") ++
        (if (attrs.isEmpty) Nil
         else Seq(s""""attrs":{${attrs.toSeq.sortBy(_._1)
           .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
           .mkString(",")}}"""))
      s"{${base.mkString(",")}}"
    }
  }

  trait Sink { def record(span: Span): Unit }

  /** Append-only JSON-lines file sink (one line per span, synchronized
    * appends — driver-side spans are low-rate).
    */
  final class JsonLinesSink(path: String) extends Sink {
    private val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    override def record(span: Span): Unit = synchronized {
      Files.write(p, (span.toJson + "\n").getBytes(UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Bounded in-memory sink for specs and interactive inspection.
    * O(1) per record: ConcurrentLinkedQueue.size() walks the whole
    * queue, so occupancy is tracked in an AtomicInteger instead.
    */
  final class MemorySink(cap: Int = 10000) extends Sink {
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[Span]()
    private val n = new java.util.concurrent.atomic.AtomicInteger(0)
    override def record(span: Span): Unit = {
      buf.add(span)
      if (n.incrementAndGet() > cap && buf.poll() != null)
        n.decrementAndGet()
    }
    def spans: Seq[Span] = {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq
    }
    def clear(): Unit = { buf.clear(); n.set(0) }
  }

  /** OTLP/JSON file exporter — the wire-less OTLP bridge (reference
    * #2234 ships an OTLP client; this library never assumes network
    * egress, so it emits the SAME data as OTLP/JSON lines — one
    * `ExportTraceServiceRequest` object per span, the framing the
    * OpenTelemetry Collector's `otlpjsonfile` receiver ingests
    * natively). Trace/span ids are real (16/8-byte hex, assigned at
    * span start), so nested engine spans (commit → flush) arrive in a
    * collector as a linked trace tree, not flat events.
    */
  final class OtlpJsonSink(path: String, serviceName: String = "graft")
      extends Sink {
    private val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    private def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }
    private def kv(k: String, v: String): String =
      s"""{"key":"${esc(k)}","value":{"stringValue":"${esc(v)}"}}"""
    def toOtlpJson(span: Span): String = {
      val startNs = span.startMillis * 1000000L
      val endNs = startNs + span.durMicros * 1000L
      val attrs = span.attrs.toSeq.sortBy(_._1)
        .map { case (k, v) => kv(k, v) }.mkString(",")
      // OTLP status: 2 = ERROR (with message), 0 = UNSET (success)
      val status = span.error match {
        case Some(e) => s""""status":{"code":2,"message":"${esc(e)}"}"""
        case None => """"status":{"code":0}"""
      }
      val parentField =
        if (span.parentSpanId.isEmpty) ""
        else s""""parentSpanId":"${span.parentSpanId}","""
      "{\"resourceSpans\":[{\"resource\":{\"attributes\":[" +
        kv("service.name", serviceName) + "]}," +
        "\"scopeSpans\":[{\"scope\":{\"name\":\"graft.core.Trace\"}," +
        "\"spans\":[{" +
        s""""traceId":"${span.traceId}","spanId":"${span.spanId}",""" +
        parentField +
        s""""name":"${esc(span.name)}","kind":1,""" +
        s""""startTimeUnixNano":"$startNs","endTimeUnixNano":"$endNs",""" +
        s""""attributes":[$attrs],$status}]}]}]}"""
    }
    override def record(span: Span): Unit = synchronized {
      Files.write(p, (toOtlpJson(span) + "\n").getBytes(UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Fan a span stream to several sinks (e.g. JSON lines for humans +
    * OTLP/JSON for a collector).
    */
  final class TeeSink(sinks: Sink*) extends Sink {
    override def record(span: Span): Unit = sinks.foreach(_.record(span))
  }

  @volatile private var sink: Option[Sink] = None
  // (name, traceId, spanId) per open span, innermost first
  private val stack = new ThreadLocal[List[(String, String, String)]] {
    override def initialValue(): List[(String, String, String)] = Nil
  }
  private val idRng = new java.security.SecureRandom()
  private def hexId(nBytes: Int): String = {
    val b = new Array[Byte](nBytes)
    idRng.synchronized(idRng.nextBytes(b))
    b.map(x => f"$x%02x").mkString
  }

  def enabled: Boolean = sink.isDefined
  def enable(s: Sink): Unit = sink = Some(s)
  def disable(): Unit = sink = None
  def toJsonLines(path: String): Unit = enable(new JsonLinesSink(path))
  def toOtlpJson(path: String): Unit = enable(new OtlpJsonSink(path))
  def toMemory(): MemorySink = {
    val m = new MemorySink(); enable(m); m
  }

  /** Mutable attribute handle for the running span — lets the traced
    * block attach results it only knows at the end (snapshot id, rows).
    */
  final class Handle {
    private[Trace] val m = scala.collection.mutable.Map[String, String]()
    def set(k: String, v: String): Unit = m.put(k, v)
    def set(k: String, v: Long): Unit = m.put(k, v.toString)
  }

  /** Run `f` inside a span. Disabled tracing runs `f` with zero
    * allocation; failures record the span (error class + message) and
    * rethrow.
    */
  def span[T](name: String, attrs: (String, String)*)(f: Handle => T): T =
    sink match {
      case None => f(new Handle)
      case Some(s) =>
        val h = new Handle
        attrs.foreach { case (k, v) => h.m.put(k, v) }
        val parent = stack.get().headOption
        // ids at START: children complete (and record) before parents,
        // so the linkage must exist before the child's record call
        val traceId = parent.map(_._2).getOrElse(hexId(16))
        val spanId = hexId(8)
        stack.set((name, traceId, spanId) :: stack.get())
        val startMs = System.currentTimeMillis()
        val t0 = System.nanoTime()
        var error: Option[String] = None
        try f(h)
        catch {
          case e: Throwable =>
            error = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
            throw e
        } finally {
          stack.set(stack.get().tail)
          s.record(Span(name, startMs, (System.nanoTime() - t0) / 1000L,
            parent.map(_._1), error, h.m.toMap,
            traceId, spanId, parent.map(_._3).getOrElse("")))
        }
    }
}
