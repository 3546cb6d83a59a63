package graft.virt

import java.nio.channels.Channels
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Ranged byte fetch by URI scheme — the executor-side dispatch for
  * virtual chunk locations (the reference's per-scheme fetch in
  * virtual_chunks.rs:500+). `file:` reads a channel slice; `http(s):`
  * sends a `Range:` header. `length <= 0` reads to EOF. Object-store
  * locations resolve through a registered container prefix that maps to
  * one of these schemes.
  */
object ByteFetch {
  private lazy val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(30)).build()

  /** Anonymous-access HTTP endpoints for bare `gs://`/`az://` locations
    * (the reference's per-scheme fetchers, virtual_chunks.rs:909,1035).
    * System-property overrides point tests (and private deployments) at a
    * stub; credentialed access goes through a registered container store
    * instead ([[VirtualChunkContainer.store]]).
    */
  private def gcsEndpoint: String =
    sys.props.getOrElse("graft.gcs.endpoint", "https://storage.googleapis.com")
  private def azureEndpoint(account: String): String =
    sys.props.getOrElse("graft.azure.endpoint",
      s"https://$account.blob.core.windows.net")

  /** Disambiguation schemes accepted on HTTP locations (reference #2262:
    * `http+icechunk`, `http+ic`, `https+icechunk`, `https+ic` must strip
    * to plain `http`/`https` targets; here spelled with the project name).
    */
  private val PlusSchemes: Seq[(String, String)] =
    Seq("http", "https").flatMap(base =>
      Seq("graft", "g").map(tag => s"$base+$tag://" -> s"$base://"))

  private[virt] def normalizeScheme(uri: String): String =
    PlusSchemes.collectFirst {
      case (from, to) if uri.startsWith(from) =>
        to + uri.stripPrefix(from)
    }.getOrElse(uri)

  def ranged(uri0: String, offset: Long, length: Long): Array[Byte] = {
    val uri = normalizeScheme(uri0)
    if (uri.startsWith("file:")) rangedFile(uri, offset, length)
    else if (uri.startsWith("http://") || uri.startsWith("https://"))
      rangedHttp(uri, offset, length)
    else if (uri.startsWith("gs://") || uri.startsWith("gcs://"))
      rangedHttp(gcsUrl(uri), offset, length)
    else if (uri.startsWith("az://"))
      rangedHttp(azureUrl(uri), offset, length)
    else throw new IllegalArgumentException(
      s"no fetcher for scheme of $uri")
  }

  /** `gs://bucket/key` → the XML-API URL (`{endpoint}/bucket/key`), which
    * serves public objects with standard `Range:` semantics.
    */
  private[virt] def gcsUrl(uri: String): String = {
    val rest = uri.stripPrefix("gcs://").stripPrefix("gs://")
    gcsEndpoint.stripSuffix("/") + "/" + rest
  }

  /** `az://account/container/key` → `{endpoint}/container/key` with the
    * account resolved into the endpoint host.
    */
  private[virt] def azureUrl(uri: String): String = {
    val rest = uri.stripPrefix("az://")
    val (account, path) = rest.span(_ != '/')
    azureEndpoint(account).stripSuffix("/") + "/" + path.stripPrefix("/")
  }

  private def rangedFile(uri: String, offset: Long,
                         length: Long): Array[Byte] = {
    val path = Paths.get(java.net.URI.create(uri))
    val ch = Files.newByteChannel(path, StandardOpenOption.READ)
    try {
      val size = ch.size()
      if (offset >= size) return Array.emptyByteArray
      val n = (if (length <= 0) size - offset
               else math.min(length, size - offset)).toInt
      ch.position(offset)
      val out = new Array[Byte](n)
      val in = Channels.newInputStream(ch)
      var done = 0
      while (done < n) {
        val r = in.read(out, done, n - done)
        if (r < 0) throw new java.io.EOFException(uri)
        done += r
      }
      out
    } finally ch.close()
  }

  private def rangedHttp(uri: String, offset: Long,
                         length: Long): Array[Byte] = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri))
    if (offset != 0 || length > 0)
      b.header("Range",
        if (length <= 0) s"bytes=$offset-"
        else s"bytes=$offset-${offset + length - 1}")
    val r = http.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    r.statusCode() match {
      case 206 => r.body()
      case 200 =>
        // 200 means the server IGNORED the Range header: slice locally
        val all = r.body()
        if (offset == 0 && length <= 0) all
        else if (offset >= all.length) Array.emptyByteArray
        else {
          val end =
            if (length <= 0) all.length
            else math.min(offset + length, all.length.toLong).toInt
          java.util.Arrays.copyOfRange(all, offset.toInt, end)
        }
      case 416 => Array.emptyByteArray
      case 404 => throw new java.nio.file.NoSuchFileException(uri)
      case c => throw new java.io.UncheckedIOException(
        new java.io.IOException(s"GET $uri: HTTP $c"))
    }
  }

  /** File mtime in epoch seconds (virtual-ref freshness checks). */
  def lastModifiedSecs(uri: String): Long =
    if (uri.startsWith("file:"))
      Files.getLastModifiedTime(
        Paths.get(java.net.URI.create(uri))).toMillis / 1000
    else 0L
}
