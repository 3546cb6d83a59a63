package graft.storage

import java.nio.channels.Channels
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

/** Object-store abstraction for the metadata/data plane.
  *
  * Mirrors the reference `Storage` trait (icechunk-storage/src/storage.rs:
  * 476-618): get/put/list/delete plus the *conditional create* primitive that
  * makes commits serializable, plus the two primitives that matter at 100 TB:
  *
  *  - '''ranged GETs''' (`getRange`) — serving a 4 KB partial read must not
  *    fetch a 128 MB object (`get_object_range`, storage.rs:196-206);
  *  - '''paged listings''' (`listPage`) — lexicographic pages with
  *    start-after, so "what is the latest pointer generation?" is one
  *    single-key page, not an O(history) listing.
  *
  * On S3 `putIfAbsent` is a conditional PUT with `If-None-Match: *`; on local
  * FS it is `CREATE_NEW` (atomic fail-if-exists). The commit protocol only
  * ever needs put-if-absent because the mutable repo pointer is modeled as a
  * monotonically numbered file chain — see [[graft.meta.RepoPointer]].
  *
  * All other files (snapshots, manifests, chunks, tx logs) are immutable,
  * write-once — the discipline both object stores and Spark jobs want
  * (spec-v2.md:160-170).
  */
final case class ObjectInfo(key: String, size: Long, mtimeMillis: Long)

/** HEAD-style metadata for one object; `etag` is empty when the backend
  * has no version identifier (local FS).
  */
final case class StatInfo(size: Long, mtimeMillis: Long, etag: String)

trait Store {
  /** Root URI usable by `spark.read` / `df.write` (e.g. `file:/...`, or a
    * `graft://` URI served by [[graft.storage.hadoop.GraftFileSystem]]).
    */
  def rootUri: String
  def uri(key: String): String = rootUri.stripSuffix("/") + "/" + key

  /** Serializable descriptor that re-opens an equivalent (undecorated)
    * store — how executor-side tasks get a client without shipping the
    * driver's instance. Decorators delegate to the wrapped store.
    */
  def conf: StoreConf

  def getBytes(key: String): Array[Byte]

  /** Ranged GET: `length <= 0` means "to end of object". Backends with
    * native range support (S3 `Range:` header, FS channel reads) override;
    * the default reads the whole object and slices (correct everywhere,
    * efficient nowhere).
    */
  def getRange(key: String, offset: Long, length: Long): Array[Byte] = {
    val all = getBytes(key)
    if (offset == 0 && (length <= 0 || length >= all.length)) all
    else {
      val end =
        if (length <= 0) all.length
        else math.min(offset + length, all.length.toLong).toInt
      java.util.Arrays.copyOfRange(all, offset.toInt, end)
    }
  }

  /** Large-GET splitting (the reference's `ideal_concurrent_request_size`
    * / `max_concurrent_requests_for_object` strategy, storage.rs:476-618):
    * a GET bigger than `idealBytes` becomes several concurrent ranged
    * GETs stitched in order — a 128 MB chunk arrives over ~8 parallel
    * streams instead of one. Unknown sizes (`length <= 0`) and small
    * requests degrade to a single [[getRange]].
    */
  final def getRangeSplit(key: String, offset: Long, length: Long,
                          idealBytes: Long = 8L * 1024 * 1024,
                          maxConcurrent: Int = 8): Array[Byte] = {
    if (length <= idealBytes) return getRange(key, offset, length)
    val partSize = math.max(idealBytes,
      (length + maxConcurrent - 1) / maxConcurrent)
    val starts = (0L until length by partSize).toArray
    val futures = starts.map { s =>
      val n = math.min(partSize, length - s)
      java.util.concurrent.CompletableFuture.supplyAsync(
        () => getRange(key, offset + s, n), Store.fetchPool)
    }
    // stitch in start order; a short part means the object ended inside
    // the requested range — everything after it is past EOF
    val out = new Array[Byte](length.toInt)
    var got = 0L
    starts.indices.foreach { i =>
      val part = futures(i).join()
      if (got == starts(i) && part.nonEmpty) {
        System.arraycopy(part, 0, out, got.toInt, part.length)
        got += part.length
      }
    }
    if (got == length) out else java.util.Arrays.copyOfRange(out, 0, got.toInt)
  }

  def putBytes(key: String, bytes: Array[Byte]): Unit

  /** Atomic create-if-absent. Returns false (and writes nothing) if the key
    * already exists. This is the single serialization point of the engine.
    */
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean

  /** List keys under a prefix (recursive): (key, sizeBytes, mtimeMillis). */
  def list(prefix: String): Seq[ObjectInfo]

  /** One lexicographically ordered page of keys under `prefix`, strictly
    * after `startAfter`, at most `maxKeys` entries (ListObjectsV2
    * semantics). The page is full iff more keys may follow.
    */
  def listPage(prefix: String, startAfter: Option[String] = None,
               maxKeys: Int = 1000): Seq[ObjectInfo] = {
    val sorted = list(prefix).sortBy(_.key)
    startAfter.fold(sorted)(sa => sorted.dropWhile(_.key <= sa))
      .take(maxKeys)
  }

  /** Up to ~`max` objects under `prefix` plus a truncation flag:
    * `(listing, true)` means the namespace holds MORE than `max`
    * objects and the listing is partial — the caller switches to a
    * distributed path instead of materializing the namespace (GC's
    * chunk sweep). Termination pages until an EMPTY page — a SHORT page
    * is not a reliable end-of-listing signal (S3 may return fewer than
    * max-keys with more remaining). Cloud backends override with their
    * native continuation loops; LocalStore with its single directory
    * walk (the paged default would re-walk the tree per page).
    */
  def listBounded(prefix: String,
                  max: Int): (Seq[ObjectInfo], Boolean) = {
    val out = Vector.newBuilder[ObjectInfo]
    var n = 0
    var after: Option[String] = None
    while (true) {
      val page = listPage(prefix, after, 1000)
      if (page.isEmpty) return (out.result(), false)
      out ++= page
      n += page.size
      if (n > max) return (out.result(), true)
      after = Some(page.last.key)
    }
    (Nil, false) // unreachable
  }

  def exists(key: String): Boolean

  /** Object metadata (size/mtime/etag), or None if absent. Backends with a
    * HEAD primitive override (S3 returns the ETag the engine uses for
    * virtual-ref freshness checks); the default answers from one listing
    * page.
    */
  def stat(key: String): Option[StatInfo] =
    listPage(key, None, 8).find(_.key == key)
      .map(o => StatInfo(o.size, o.mtimeMillis, ""))

  def delete(keys: Iterable[String]): Unit

  /** Recursive delete of a prefix (directories on FS; key prefix on S3). */
  def deletePrefix(prefix: String): Unit

  /** Copy one object. Object stores do this server-side
    * (`x-amz-copy-source`) — no byte round-trip through the client.
    */
  def copy(srcKey: String, dstKey: String): Unit =
    putBytes(dstKey, getBytes(srcKey))
}

/** Serializable store descriptor: ships inside Spark closures so executors
  * can open their own client (one per JVM via [[StoreConf.cached]]).
  */
sealed trait StoreConf extends Serializable {
  def open(): Store
}

final case class LocalStoreConf(root: String) extends StoreConf {
  override def open(): Store = new LocalStore(Paths.get(root))
}

final case class S3StoreConf(
    endpoint: String, // e.g. "https://s3.us-east-1.amazonaws.com" or stub URL
    region: String,
    bucket: String,
    prefix: String = "", // key prefix inside the bucket ("" = bucket root)
    accessKey: String = "", // empty = unsigned requests (stub/anonymous)
    secretKey: String = "",
    multipartThresholdBytes: Long = 64L * 1024 * 1024,
    multipartPartBytes: Long = 32L * 1024 * 1024,
    // single CopyObject is capped by the service at 5 GiB — larger
    // objects route through multipart UploadPartCopy (still
    // service-internal, zero payload bytes through the client)
    copyMaxBytes: Long = 5L * 1024 * 1024 * 1024,
    // attached to EVERY request (reference s3_storage(headers=...),
    // #2246) — proxy keys, requester-pays markers, etc.; `x-amz-*`
    // entries participate in SigV4 signing
    headers: Map[String, String] = Map.empty) extends StoreConf {
  override def open(): Store = new graft.storage.s3.S3Store(this)
}

/** Google Cloud Storage over the public JSON API
  * (https://cloud.google.com/storage/docs/json_api). `bearerToken` empty =
  * anonymous/stub access; production callers inject an OAuth2 access token
  * (token *acquisition* is deliberately out of scope — any credential
  * provider can mint one). Conditional create maps to
  * `ifGenerationMatch=0`, ranged reads to the `Range:` header on
  * `alt=media`, paged listing to `startOffset`/`pageToken`.
  */
final case class GcsStoreConf(
    endpoint: String, // "https://storage.googleapis.com" or stub URL
    bucket: String,
    prefix: String = "",
    bearerToken: String = "",
    // resumable-upload cutover + chunk size (chunks must be 256 KiB
    // multiples per the API contract; the default is one, and an
    // unaligned size is rounded up to the next multiple at upload time)
    resumableThresholdBytes: Long = 64L * 1024 * 1024,
    resumableChunkBytes: Long = 32L * 1024 * 1024,
    // attached to EVERY request (gcs_storage(headers=...), #2246)
    headers: Map[String, String] = Map.empty) extends StoreConf {
  override def open(): Store = new graft.storage.gcs.GcsStore(this)
}

/** Azure Blob Storage over the public REST API
  * (https://learn.microsoft.com/rest/api/storageservices). `sasToken` is a
  * shared-access-signature query string (without the '?'); empty = anonymous
  * (stub/public container). Conditional create maps to `If-None-Match: *`
  * on Put Blob, ranged reads to the `Range:` header, listing to
  * `comp=list` with marker paging.
  */
final case class AzureStoreConf(
    endpoint: String, // "https://<account>.blob.core.windows.net" or stub
    account: String,
    container: String,
    prefix: String = "",
    sasToken: String = "",
    // Put Block / Put Block List cutover + block size
    blockThresholdBytes: Long = 64L * 1024 * 1024,
    blockBytes: Long = 32L * 1024 * 1024,
    // attached to EVERY request (#2246 analog for Azure)
    headers: Map[String, String] = Map.empty) extends StoreConf {
  override def open(): Store = new graft.storage.az.AzureStore(this)
}

/** Read-only repository hosting over plain HTTP(S) (WebDAV PROPFIND for
  * listing — the reference's `object_store` HTTP arm). All mutations
  * throw; use a writable backend to author, HTTP to distribute.
  * `headers` are attached to EVERY request (reference
  * `http_storage(headers=...)`, #2143) — bearer tokens / API keys for
  * protected static hosts.
  */
final case class HttpStoreConf(
    endpoint: String, // e.g. "https://data.example.com/repos/alpha"
    headers: Map[String, String] = Map.empty
) extends StoreConf {
  override def open(): Store = new graft.storage.http.HttpStore(this)
}

/** Serializable latency-injection decorator conf: executor-side clients
  * reconstruct the SAME injected RTT the driver store carries, so a
  * latency soak exercises the Spark plane (manifest Parquet scans, chunk
  * fetch UDFs, foreachPartition store clients) — not just the driver's
  * metadata chains. Test/soak instrumentation only; production confs are
  * the backend cases above.
  */
final case class LatencyStoreConf(inner: StoreConf,
                                  delayMs: Long) extends StoreConf {
  override def open(): Store = new LatencyStore(inner.open(), delayMs)
}

object StoreConf {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[StoreConf, Store]()

  /** Executor-side client reuse: one store (one HTTP connection pool) per
    * conf per JVM — the connection-pooling the reference gets from its
    * shared `object_store` client. Wrapped in transient-failure retry
    * (object-store 5xx/connection resets are a fact of life at 100 TB;
    * `putIfAbsent` is protocol-level-retried only, see [[RetryingStore]]).
    */
  def cached(conf: StoreConf): Store =
    cache.computeIfAbsent(conf, c => new RetryingStore(c.open()))
}

/** Local-filesystem store. `putIfAbsent` uses `CREATE_NEW` which is atomic
  * on POSIX; concurrent committers race on file creation exactly as they
  * would race on S3 conditional PUTs.
  */
final class LocalStore(val root: Path) extends Store {
  // no eager mkdir (reference #2145): opening a repo at a path that
  // doesn't exist must fail with "no repository", not create an empty
  // directory — write paths create parents on demand
  override def rootUri: String = "file:" + root.toAbsolutePath.toString
  override def conf: StoreConf = LocalStoreConf(root.toAbsolutePath.toString)

  private def p(key: String): Path = root.resolve(key)

  /** Staging area for atomic writes. Temps must live OUTSIDE the listed
    * key namespace: a sibling temp is (a) visible to `Files.walk` and
    * can vanish mid-walk (NoSuchFileException inside FileTreeIterator),
    * and (b) for pointer keys would sort into `listPage` results and be
    * parsed as a bogus latest generation.
    */
  private val TmpDir = ".graft-tmp"
  private val tmpCounter = new java.util.concurrent.atomic.AtomicLong()
  private def newTmp(): Path = {
    val d = root.resolve(TmpDir)
    Files.createDirectories(d)
    // temps are deleted on the happy path; ones orphaned by a crash are
    // invisible to listings, so self-clean opportunistically (stale
    // after an hour — no in-flight write lives that long)
    if (tmpCounter.incrementAndGet() % 4096 == 1) {
      val cutoff = System.currentTimeMillis() - 3600_000L
      try {
        val s = Files.list(d)
        try s.iterator().asScala.foreach { f =>
          try {
            if (Files.getLastModifiedTime(f).toMillis < cutoff)
              Files.deleteIfExists(f)
          } catch { case _: java.io.IOException => () }
        } finally s.close()
      } catch { case _: java.io.IOException => () }
    }
    d.resolve(java.util.UUID.randomUUID().toString)
  }
  private def isTmpKey(key: String): Boolean =
    key == TmpDir || key.startsWith(TmpDir + "/")

  override def getBytes(key: String): Array[Byte] = Files.readAllBytes(p(key))

  override def getRange(key: String, offset: Long,
                        length: Long): Array[Byte] = {
    val ch = Files.newByteChannel(p(key), StandardOpenOption.READ)
    try {
      val size = ch.size()
      if (offset >= size) return Array.emptyByteArray
      val n =
        (if (length <= 0) size - offset
         else math.min(length, size - offset)).toInt
      ch.position(offset)
      val buf = java.nio.ByteBuffer.allocate(n)
      val in = Channels.newInputStream(ch)
      val out = buf.array()
      var done = 0
      while (done < n) {
        val r = in.read(out, done, n - done)
        if (r < 0) throw new java.io.EOFException(key)
        done += r
      }
      out
    } finally ch.close()
  }

  override def putBytes(key: String, bytes: Array[Byte]): Unit = {
    val path = p(key)
    Files.createDirectories(path.getParent)
    // write-temp + atomic move: readers never observe partial files
    val tmp = newTmp()
    Files.write(tmp, bytes)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** If-absent kernel-side file ingest: copy `srcFile` to a temp
    * (Files.copy → copy_file_range/sendfile where the kernel supports
    * it — the bytes never land on the JVM heap) and hard-link it into
    * place, the same atomic create-if-absent discipline as
    * [[putIfAbsent]]. The local→local replication fast path.
    */
  def transferInFrom(srcFile: Path, key: String): Boolean = {
    val path = p(key)
    if (Files.exists(path)) return false
    Files.createDirectories(path.getParent)
    val tmp = newTmp()
    Files.copy(srcFile, tmp, StandardCopyOption.REPLACE_EXISTING)
    try {
      Files.createLink(path, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** Absolute path of `key` — exposes the source side of
    * [[transferInFrom]] for [[Transfer]]'s local→local dispatch.
    */
  def pathOf(key: String): Path = p(key)

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    val path = p(key)
    Files.createDirectories(path.getParent)
    // Write the full content to a temp file, then HARD-LINK it into place:
    // link creation is an atomic create-if-absent on POSIX, and — unlike
    // CREATE_NEW + write, which exposes a zero-length file between the
    // create and the write — a concurrent reader either misses the key or
    // sees the complete bytes. (ATOMIC_MOVE without REPLACE_EXISTING is
    // NOT a safe substitute: the JDK pre-checks existence then rename(2)s,
    // which silently replaces a concurrent winner — a lost CAS.)
    val tmp = newTmp()
    Files.write(tmp, bytes)
    try {
      Files.createLink(path, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** Walk with retry: even confined to `.graft-tmp`, files created by a
    * concurrent writer can vanish between the directory read and the
    * per-entry stat, which surfaces as an UncheckedIOException from
    * FileTreeIterator — transient by construction, so retry.
    */
  private def walked(base: Path): Vector[ObjectInfo] = {
    var attempts = 0
    while (true) {
      attempts += 1
      val stream = Files.walk(base)
      try {
        return stream.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(f => ObjectInfo(
            root.relativize(f).toString.replace('\\', '/'),
            Files.size(f), Files.getLastModifiedTime(f).toMillis))
          .filterNot(o => isTmpKey(o.key))
          .toVector
      } catch {
        case e: java.io.UncheckedIOException
            if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] &&
              attempts < 5 => // raced a concurrent delete — walk again
      } finally stream.close()
    }
    Vector.empty // unreachable
  }

  override def list(prefix: String): Seq[ObjectInfo] = {
    // object-store prefix semantics, like [[listPage]]: a prefix that is
    // half a filename (e.g. "chunks/A" — push's listing fan-out) has no
    // directory to walk. Rather than walking the whole parent and
    // filtering (which would make an N-way prefix fan-out cost N full
    // walks), walk only the parent's direct children whose NAME matches
    // the partial segment — cost stays proportional to the matching
    // subtree, so 1,024 concurrent prefix tasks over one flat directory
    // each touch only their own slice.
    val cand = p(prefix)
    if (Files.isDirectory(cand)) return walked(cand)
    val base = cand.getParent
    if (base == null || !Files.isDirectory(base)) return Nil
    val namePrefix = cand.getFileName.toString
    val kids = Files.list(base)
    val matching =
      try kids.iterator().asScala
        .filter(_.getFileName.toString.startsWith(namePrefix)).toVector
      finally kids.close()
    matching.flatMap { child =>
      try {
        if (Files.isDirectory(child)) walked(child)
        else if (Files.isRegularFile(child))
          Seq(ObjectInfo(root.relativize(child).toString.replace('\\', '/'),
            Files.size(child), Files.getLastModifiedTime(child).toMillis))
        else Nil
      } catch { // raced a concurrent delete of this child — it's gone
        case _: java.nio.file.NoSuchFileException => Nil
      }
    }.filter(o => o.key.startsWith(prefix) && !isTmpKey(o.key))
  }

  override def listPage(prefix: String, startAfter: Option[String],
                        maxKeys: Int): Seq[ObjectInfo] = {
    // a "prefix" that is half a filename (e.g. "repo/r.") has no directory
    // to walk — walk the deepest existing parent directory instead
    val base = {
      val cand = p(prefix)
      if (Files.isDirectory(cand)) cand else cand.getParent
    }
    if (base == null || !Files.exists(base)) return Nil
    walked(base)
      .filter(o => o.key.startsWith(prefix) && startAfter.forall(o.key > _))
      .sortBy(_.key).take(maxKeys)
  }

  override def listBounded(prefix: String,
                           max: Int): (Seq[ObjectInfo], Boolean) = {
    // ONE directory walk (transient O(N)): the paged default would
    // re-walk and re-sort the whole tree per page (local listPage has no
    // server-side continuation), turning a 1 M-object probe quadratic
    val all = list(prefix)
    (all.take(math.min(max.toLong + 1, Int.MaxValue).toInt),
      all.size > max)
  }

  override def exists(key: String): Boolean = Files.exists(p(key))

  override def stat(key: String): Option[StatInfo] = {
    val path = p(key)
    if (!Files.isRegularFile(path)) None
    else Some(StatInfo(Files.size(path),
      Files.getLastModifiedTime(path).toMillis, ""))
  }

  override def delete(keys: Iterable[String]): Unit =
    keys.foreach(k => Files.deleteIfExists(p(k)))

  override def deletePrefix(prefix: String): Unit = {
    val base = p(prefix)
    if (Files.exists(base)) {
      val stream = Files.walk(base)
      try stream.sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally stream.close()
    }
  }
}

object Store {
  /** Shared daemon pool for split-GET parts (one per JVM; IO-bound).
    * Sized `max(16, 2 x cores)` — an executor JVM running many task slots
    * that each split a large chunk into parts needs aggregate stream
    * concurrency well past a fixed 16 against a real object store
    * (streams are cheap; the reference runs per-request concurrency of 8
    * PER GET, storage.rs:476-618). `-Dgraft.fetchPool.threads` overrides
    * for bandwidth-capped environments.
    */
  private[storage] lazy val fetchPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      Integer.getInteger("graft.fetchPool.threads",
        math.max(16, 2 * Runtime.getRuntime.availableProcessors())),
      r => {
        val t = new Thread(r, "graft-fetch")
        t.setDaemon(true)
        t
      })

  /** Run independent driver-side store operations concurrently, preserving
    * input order, rethrowing the first failure. Uses an EPHEMERAL pool
    * (not [[fetchPool]]) so callers whose `f` itself fans out through the
    * shared pool — e.g. `getRangeSplit` — can never deadlock a fixed pool
    * from inside it. Thread spawn cost (~µs) is noise next to the store
    * round trips this exists to overlap; single-item calls run inline.
    */
  private[graft] def parallelIO[A, B](items: Seq[A], maxThreads: Int = 32)(
      f: A => B): Seq[B] =
    if (items.size <= 1) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(maxThreads, items.size),
        r => { val t = new Thread(r, "graft-par-io"); t.setDaemon(true); t })
      try {
        val futs = items.map(a =>
          pool.submit((() => f(a)): java.util.concurrent.Callable[B]))
        futs.map(fu =>
          try fu.get()
          catch { case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e) })
      } finally pool.shutdown()
    }

  def local(dir: String): LocalStore = new LocalStore(Paths.get(dir))

  /** S3-compatible store (AWS, MinIO, or the in-process
    * [[graft.storage.s3.S3MemServer]]). The returned store's `rootUri` is a
    * `graft://` URI — call
    * [[graft.storage.hadoop.GraftFileSystem.register]] (done automatically
    * by `Repository.open/create`) so Spark can read/write Parquet on it.
    */
  def s3(conf: S3StoreConf): Store = conf.open()

  /** Store from connector options. Backend selection by option prefix:
    * `s3.endpoint`/`s3.bucket` → S3; `gcs.bucket` → GCS (JSON API);
    * `azure.container` → Azure Blob; otherwise `path` is a local repo
    * root.
    */
  /** `<backend>.header.<Name>` options → per-request headers (#2246). */
  private def headerOpts(opts: Map[String, String],
                         backend: String): Map[String, String] =
    opts.collect { case (k, v) if k.startsWith(s"$backend.header.") =>
      k.stripPrefix(s"$backend.header.") -> v
    }

  def fromOptions(opts: Map[String, String]): Store =
    if (opts.contains("s3.endpoint"))
      s3(S3StoreConf(opts("s3.endpoint"),
        opts.getOrElse("s3.region", "us-east-1"),
        opts.getOrElse("s3.bucket",
          throw new IllegalArgumentException("option 's3.bucket' required")),
        opts.getOrElse("s3.prefix", ""),
        opts.getOrElse("s3.access-key", ""),
        opts.getOrElse("s3.secret-key", ""),
        headers = headerOpts(opts, "s3")))
    else if (opts.contains("gcs.bucket"))
      GcsStoreConf(
        opts.getOrElse("gcs.endpoint", "https://storage.googleapis.com"),
        opts("gcs.bucket"),
        opts.getOrElse("gcs.prefix", ""),
        opts.getOrElse("gcs.token", ""),
        headers = headerOpts(opts, "gcs")).open()
    else if (opts.contains("azure.container")) {
      val account = opts.getOrElse("azure.account",
        throw new IllegalArgumentException("option 'azure.account' required"))
      AzureStoreConf(
        opts.getOrElse("azure.endpoint",
          s"https://$account.blob.core.windows.net"),
        account,
        opts("azure.container"),
        opts.getOrElse("azure.prefix", ""),
        opts.getOrElse("azure.sas", ""),
        headers = headerOpts(opts, "azure")).open()
    } else if (opts.contains("http.endpoint"))
      // http.header.<Name> options become per-request headers (#2143):
      // e.g. http.header.Authorization = "Bearer …"
      HttpStoreConf(opts("http.endpoint"),
        headerOpts(opts, "http")).open()
    else local(opts.getOrElse("path",
      throw new IllegalArgumentException(
        "option 'path' (repo root), 's3.endpoint', 'gcs.bucket', " +
          "'azure.container', or 'http.endpoint' is required")))
}
