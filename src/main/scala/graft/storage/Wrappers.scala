package graft.storage

/** Storage decorators (the reference ships the same family for tests and
  * resilience: latency/logging wrappers in icechunk/src/storage/latency.rs,
  * logging.rs; retry-with-backoff in asset_manager.rs:25-30).
  */

/** Pass-through decorator base: a wrapper overrides ONLY the operations
  * it changes, and a future `Store` method can never be silently missed
  * by a decorator (it forwards by default instead of failing to compile
  * in five places).
  */
trait ForwardingStore extends Store {
  protected def inner: Store
  override def rootUri: String = inner.rootUri
  override def conf: StoreConf = inner.conf
  override def getBytes(key: String): Array[Byte] = inner.getBytes(key)
  override def getRange(key: String, offset: Long, length: Long): Array[Byte] =
    inner.getRange(key, offset, length)
  override def putBytes(key: String, bytes: Array[Byte]): Unit =
    inner.putBytes(key, bytes)
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    inner.putIfAbsent(key, bytes)
  override def list(prefix: String): Seq[ObjectInfo] = inner.list(prefix)
  override def listPage(prefix: String, startAfter: Option[String],
                        maxKeys: Int): Seq[ObjectInfo] =
    inner.listPage(prefix, startAfter, maxKeys)
  override def listBounded(prefix: String, max: Int): (Seq[ObjectInfo], Boolean) =
    inner.listBounded(prefix, max)
  override def exists(key: String): Boolean = inner.exists(key)
  override def stat(key: String): Option[StatInfo] = inner.stat(key)
  override def delete(keys: Iterable[String]): Unit = inner.delete(keys)
  override def deletePrefix(prefix: String): Unit = inner.deletePrefix(prefix)
  override def copy(srcKey: String, dstKey: String): Unit =
    inner.copy(srcKey, dstKey)
}

/** Retry transient failures with exponential backoff. `putIfAbsent` is NOT
  * retried blindly: a retry after an ambiguous failure could observe its
  * own first attempt and report a lost race — callers handle retry at the
  * protocol level where it is safe ([[graft.meta.RepoPointer
  * .compareAndSwap]] stamps each generation with a write id and reads it
  * back on ambiguous failure, so a landed-but-unacknowledged PUT is
  * recognized as success, never as a lost race).
  */
final class RetryingStore(inner: Store, maxAttempts: Int = 5,
                          baseBackoffMs: Long = 20,
                          isTransient: Throwable => Boolean =
                            RetryingStore.defaultTransient) extends Store {
  private def retry[A](op: String)(body: => A): A = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return body
      catch {
        case t: Throwable if attempt < maxAttempts && isTransient(t) =>
          Thread.sleep(baseBackoffMs * (1L << math.min(attempt - 1, 6)))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** [[Transfer]] dispatches on concrete store types to pick zero-heap
    * copy routes; the retry veneer must be transparent to that dispatch
    * (it wraps its own retry around the chosen route).
    */
  def underlying: Store = inner

  override def rootUri: String = inner.rootUri
  override def conf: StoreConf = inner.conf
  override def getBytes(key: String): Array[Byte] =
    retry("get")(inner.getBytes(key))
  override def getRange(key: String, offset: Long, length: Long): Array[Byte] =
    retry("getRange")(inner.getRange(key, offset, length))
  override def putBytes(key: String, bytes: Array[Byte]): Unit =
    retry("put")(inner.putBytes(key, bytes))
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    inner.putIfAbsent(key, bytes) // protocol-level retry only
  override def list(prefix: String): Seq[ObjectInfo] =
    retry("list")(inner.list(prefix))
  override def listPage(prefix: String, startAfter: Option[String],
                        maxKeys: Int): Seq[ObjectInfo] =
    retry("listPage")(inner.listPage(prefix, startAfter, maxKeys))
  override def listBounded(prefix: String, max: Int): (Seq[ObjectInfo], Boolean) =
    retry("listBounded")(inner.listBounded(prefix, max))
  override def copy(srcKey: String, dstKey: String): Unit =
    retry("copy")(inner.copy(srcKey, dstKey))
  override def exists(key: String): Boolean =
    retry("exists")(inner.exists(key))
  override def stat(key: String): Option[StatInfo] =
    retry("stat")(inner.stat(key))
  override def delete(keys: Iterable[String]): Unit =
    retry("delete")(inner.delete(keys))
  override def deletePrefix(prefix: String): Unit =
    retry("deletePrefix")(inner.deletePrefix(prefix))
}

object RetryingStore {
  /** Transient error classing (the regex classing of asset_manager.rs:
    * 25-30, expressed structurally).
    */
  def defaultTransient(t: Throwable): Boolean = t match {
    case _: java.nio.file.FileAlreadyExistsException => false
    case _: java.nio.file.NoSuchFileException => false
    case _: java.io.IOException => true
    case _: TransientStorageException => true
    case _ => false
  }
}

class TransientStorageException(msg: String) extends RuntimeException(msg)

/** Fault injection: fail matching operations while `failures` > 0
  * (decremented per failure) — the flaky-connection harness
  * (icechunk/tests/test_flaky_connections.rs analog). `failOps` limits
  * injection to specific operation names (default: all).
  */
final class FlakyStore(inner: Store,
                       @volatile var failures: Int,
                       failOps: Set[String] = Set.empty) extends Store {
  private def maybeFail(op: String): Unit =
    this.synchronized {
      if (failures > 0 && (failOps.isEmpty || failOps.contains(op))) {
        failures -= 1
        throw new TransientStorageException(
          s"injected transient failure in $op ($failures left)")
      }
    }

  override def rootUri: String = inner.rootUri
  override def conf: StoreConf = inner.conf
  override def getBytes(key: String): Array[Byte] =
    { maybeFail("getBytes"); inner.getBytes(key) }
  override def getRange(key: String, offset: Long, length: Long): Array[Byte] =
    { maybeFail("getRange"); inner.getRange(key, offset, length) }
  override def putBytes(key: String, bytes: Array[Byte]): Unit =
    { maybeFail("putBytes"); inner.putBytes(key, bytes) }
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    { maybeFail("putIfAbsent"); inner.putIfAbsent(key, bytes) }
  override def list(prefix: String): Seq[ObjectInfo] =
    { maybeFail("list"); inner.list(prefix) }
  override def listPage(prefix: String, startAfter: Option[String],
                        maxKeys: Int): Seq[ObjectInfo] =
    { maybeFail("listPage"); inner.listPage(prefix, startAfter, maxKeys) }
  override def listBounded(prefix: String, max: Int): (Seq[ObjectInfo], Boolean) =
    { maybeFail("listBounded"); inner.listBounded(prefix, max) }
  override def copy(srcKey: String, dstKey: String): Unit =
    { maybeFail("copy"); inner.copy(srcKey, dstKey) }
  override def exists(key: String): Boolean =
    { maybeFail("exists"); inner.exists(key) }
  override def stat(key: String): Option[StatInfo] =
    { maybeFail("stat"); inner.stat(key) }
  override def delete(keys: Iterable[String]): Unit =
    { maybeFail("delete"); inner.delete(keys) }
  override def deletePrefix(prefix: String): Unit =
    { maybeFail("deletePrefix"); inner.deletePrefix(prefix) }
}

/** Fault injection AFTER the operation took effect: the mutation LANDS on
  * storage but its success response is "lost in transit" (an exception is
  * thrown instead) — the ambiguous network failure mode behind reference
  * Changelog #2156 that [[graft.meta.RepoPointer.compareAndSwap]]'s
  * write-id read-back recovers from. Drops the next `losses` responses of
  * operations named in `lossOps`.
  */
final class LostResponseStore(inner: Store,
                              @volatile var losses: Int,
                              lossOps: Set[String] = Set("putIfAbsent"))
    extends Store {
  private def maybeDrop[A](op: String)(result: A): A =
    this.synchronized {
      if (losses > 0 && lossOps.contains(op)) {
        losses -= 1
        throw new TransientStorageException(
          s"injected lost response after successful $op ($losses left)")
      }
      result
    }

  override def rootUri: String = inner.rootUri
  override def conf: StoreConf = inner.conf
  override def getBytes(key: String): Array[Byte] =
    maybeDrop("getBytes")(inner.getBytes(key))
  override def getRange(key: String, offset: Long, length: Long): Array[Byte] =
    maybeDrop("getRange")(inner.getRange(key, offset, length))
  override def putBytes(key: String, bytes: Array[Byte]): Unit =
    maybeDrop("putBytes")(inner.putBytes(key, bytes))
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    maybeDrop("putIfAbsent")(inner.putIfAbsent(key, bytes))
  override def list(prefix: String): Seq[ObjectInfo] =
    maybeDrop("list")(inner.list(prefix))
  override def listPage(prefix: String, startAfter: Option[String],
                        maxKeys: Int): Seq[ObjectInfo] =
    maybeDrop("listPage")(inner.listPage(prefix, startAfter, maxKeys))
  override def listBounded(prefix: String, max: Int): (Seq[ObjectInfo], Boolean) =
    maybeDrop("listBounded")(inner.listBounded(prefix, max))
  override def copy(srcKey: String, dstKey: String): Unit =
    maybeDrop("copy")(inner.copy(srcKey, dstKey))
  override def exists(key: String): Boolean =
    maybeDrop("exists")(inner.exists(key))
  override def stat(key: String): Option[StatInfo] =
    maybeDrop("stat")(inner.stat(key))
  override def delete(keys: Iterable[String]): Unit =
    maybeDrop("delete")(inner.delete(keys))
  override def deletePrefix(prefix: String): Unit =
    maybeDrop("deletePrefix")(inner.deletePrefix(prefix))
}

/** Reports every object mtime shifted by `skewMs` — a storage backend
  * whose clock disagrees with the host's by that amount (negative =
  * store clock behind the host). Exercises the reference-#2310 hazard:
  * GC's age guard must compare its cutoff against store-observed time,
  * or a lagging store clock makes just-written objects look old enough
  * to delete.
  */
final class SkewedClockStore(protected val inner: Store, skewMs: Long)
    extends ForwardingStore {
  private def shift(o: ObjectInfo): ObjectInfo =
    o.copy(mtimeMillis = o.mtimeMillis + skewMs)
  override def list(prefix: String): Seq[ObjectInfo] =
    inner.list(prefix).map(shift)
  override def listPage(prefix: String, startAfter: Option[String],
                        maxKeys: Int): Seq[ObjectInfo] =
    inner.listPage(prefix, startAfter, maxKeys).map(shift)
  override def listBounded(prefix: String, max: Int): (Seq[ObjectInfo], Boolean) = {
    val (objs, truncated) = inner.listBounded(prefix, max)
    (objs.map(shift), truncated)
  }
  override def stat(key: String): Option[StatInfo] =
    inner.stat(key).map(s => s.copy(mtimeMillis = s.mtimeMillis + skewMs))
}

/** Operation logging (logging.rs analog): counts + logs each op. */
final class LoggingStore(inner: Store,
                         log: String => Unit = s => System.err.println(s))
    extends Store {
  val counts = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  /** Total payload bytes served by `getBytes` + `getRange` — the
    * byte-level regression guard beside the op counts: page pruning on
    * the ranged-read path must never silently degrade to full-shard
    * reads, and only a bytes ceiling can pin that (VERDICT r15 item 4).
    */
  val bytesRead = new java.util.concurrent.atomic.AtomicLong()
  private def rec(op: String, key: String): Unit = {
    counts.computeIfAbsent(op,
      _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
    log(s"[store] $op $key")
  }
  override def rootUri: String = inner.rootUri
  override def conf: StoreConf = inner.conf
  override def getBytes(key: String): Array[Byte] =
    { rec("getBytes", key)
      val b = inner.getBytes(key); bytesRead.addAndGet(b.length); b }
  override def getRange(key: String, offset: Long, length: Long): Array[Byte] =
    { rec("getRange", s"$key[$offset+$length]")
      val b = inner.getRange(key, offset, length)
      bytesRead.addAndGet(b.length); b }
  override def putBytes(key: String, bytes: Array[Byte]): Unit =
    { rec("putBytes", key); inner.putBytes(key, bytes) }
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    { rec("putIfAbsent", key); inner.putIfAbsent(key, bytes) }
  override def list(prefix: String): Seq[ObjectInfo] =
    { rec("list", prefix); inner.list(prefix) }
  override def listPage(prefix: String, startAfter: Option[String],
                        maxKeys: Int): Seq[ObjectInfo] =
    { rec("listPage", prefix); inner.listPage(prefix, startAfter, maxKeys) }
  override def listBounded(prefix: String, max: Int): (Seq[ObjectInfo], Boolean) =
    { rec("listBounded", prefix); inner.listBounded(prefix, max) }
  override def copy(srcKey: String, dstKey: String): Unit =
    { rec("copy", s"$srcKey -> $dstKey"); inner.copy(srcKey, dstKey) }
  override def exists(key: String): Boolean =
    { rec("exists", key); inner.exists(key) }
  override def stat(key: String): Option[StatInfo] =
    { rec("stat", key); inner.stat(key) }
  override def delete(keys: Iterable[String]): Unit =
    { rec("delete", s"${keys.size} keys"); inner.delete(keys) }
  override def deletePrefix(prefix: String): Unit =
    { rec("deletePrefix", prefix); inner.deletePrefix(prefix) }
}

/** Key-prefix redirection (icechunk/src/storage/redirect.rs analog):
  * route operations whose key matches a registered prefix to another
  * store — e.g. chunks on cheap cold storage while the metadata plane
  * stays on the primary, or read-through against a mirrored bucket.
  * Longest-prefix match wins; unmatched keys go to the primary. Listings
  * and prefix deletes consult every store whose rule prefix overlaps the
  * queried prefix (results are merged, de-duplicated by key).
  */
final class RedirectStore(primary: Store,
                          rules: Seq[(String, Store)]) extends Store {
  private val ordered = rules.sortBy(-_._1.length)
  private def route(key: String): Store =
    ordered.collectFirst {
      case (p, s) if key.startsWith(p) => s
    }.getOrElse(primary)
  private def storesFor(prefix: String): Seq[Store] =
    (ordered.collect {
      case (p, s) if p.startsWith(prefix) || prefix.startsWith(p) => s
    } :+ primary).distinct

  override def rootUri: String = primary.rootUri
  override def conf: StoreConf = primary.conf
  override def getBytes(key: String): Array[Byte] = route(key).getBytes(key)
  override def getRange(key: String, offset: Long, length: Long): Array[Byte] =
    route(key).getRange(key, offset, length)
  override def putBytes(key: String, bytes: Array[Byte]): Unit =
    route(key).putBytes(key, bytes)
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    route(key).putIfAbsent(key, bytes)
  override def list(prefix: String): Seq[ObjectInfo] =
    storesFor(prefix).flatMap(_.list(prefix))
      .groupBy(_.key).map(_._2.head).toSeq.sortBy(_.key)
  override def listPage(prefix: String, startAfter: Option[String],
                        maxKeys: Int): Seq[ObjectInfo] =
    storesFor(prefix).flatMap(_.listPage(prefix, startAfter, maxKeys))
      .groupBy(_.key).map(_._2.head).toSeq.sortBy(_.key).take(maxKeys)
  override def listBounded(prefix: String, max: Int): (Seq[ObjectInfo], Boolean) = {
    // Each routed store probes with its own native bound, but the CALLER's
    // bound governs the merged view: stop probing once any constituent
    // truncates (the answer is already "overflowed" — further walks are
    // wasted I/O) and never hand back more than ~max objects (the caller
    // asked for a bounded probe precisely to cap driver materialization).
    val out = Vector.newBuilder[ObjectInfo]
    var truncated = false
    val it = storesFor(prefix).iterator
    while (it.hasNext && !truncated) {
      val (objs, t) = it.next().listBounded(prefix, max)
      out ++= objs
      truncated = t
    }
    val merged = out.result()
      .groupBy(_.key).map(_._2.head).toSeq.sortBy(_.key)
    if (merged.size > max) (merged.take(max), true)
    else (merged, truncated)
  }
  override def exists(key: String): Boolean = route(key).exists(key)
  override def stat(key: String): Option[StatInfo] = route(key).stat(key)
  override def delete(keys: Iterable[String]): Unit =
    keys.groupBy(route).foreach { case (s, ks) => s.delete(ks) }
  override def deletePrefix(prefix: String): Unit =
    storesFor(prefix).foreach(_.deletePrefix(prefix))
  override def copy(srcKey: String, dstKey: String): Unit = {
    val (src, dst) = (route(srcKey), route(dstKey))
    if (src eq dst) src.copy(srcKey, dstKey)
    else dst.putBytes(dstKey, src.getBytes(srcKey))
  }
}

/** Schedule hook (the shuttle-harness seam, icechunk/tests/test_shuttle.rs):
  * every operation first passes through `gate(op, key)`, which may block the
  * calling thread until an external scheduler releases it. With the gate as
  * the only inter-thread synchronization point, a scheduler that serializes
  * gated threads replays one exact interleaving of the CAS/commit protocol —
  * store operations are the only shared state, so the operation order fully
  * determines the outcome. Threads the scheduler does not manage (Spark
  * executor tasks) should pass through the gate unblocked.
  */
final class ScheduledStore(inner: Store,
                           gate: (String, String) => Unit) extends Store {
  override def rootUri: String = inner.rootUri
  override def conf: StoreConf = inner.conf
  override def getBytes(key: String): Array[Byte] =
    { gate("getBytes", key); inner.getBytes(key) }
  override def getRange(key: String, offset: Long, length: Long): Array[Byte] =
    { gate("getRange", key); inner.getRange(key, offset, length) }
  override def putBytes(key: String, bytes: Array[Byte]): Unit =
    { gate("putBytes", key); inner.putBytes(key, bytes) }
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    { gate("putIfAbsent", key); inner.putIfAbsent(key, bytes) }
  override def list(prefix: String): Seq[ObjectInfo] =
    { gate("list", prefix); inner.list(prefix) }
  override def listPage(prefix: String, startAfter: Option[String],
                        maxKeys: Int): Seq[ObjectInfo] =
    { gate("listPage", prefix); inner.listPage(prefix, startAfter, maxKeys) }
  override def listBounded(prefix: String, max: Int): (Seq[ObjectInfo], Boolean) =
    { gate("listBounded", prefix); inner.listBounded(prefix, max) }
  override def copy(srcKey: String, dstKey: String): Unit =
    { gate("copy", srcKey); inner.copy(srcKey, dstKey) }
  override def exists(key: String): Boolean =
    { gate("exists", key); inner.exists(key) }
  override def stat(key: String): Option[StatInfo] =
    { gate("stat", key); inner.stat(key) }
  override def delete(keys: Iterable[String]): Unit =
    { gate("delete", ""); inner.delete(keys) }
  override def deletePrefix(prefix: String): Unit =
    { gate("deletePrefix", prefix); inner.deletePrefix(prefix) }
}

/** Give any (possibly decorated) store a `graft://` identity so the
  * SPARK plane — manifest Parquet scans, DSv2 reads — routes through it
  * via [[graft.storage.hadoop.GraftFileSystem]] instead of through the
  * undecorated backend URI. This is how a latency soak puts executor
  * reads behind injected RTT: `new GraftUriStore(new LatencyStore(raw,
  * rtt), "soak-1")` opened as a Repository measures the whole engine,
  * both planes, under that RTT.
  */
final class GraftUriStore(protected val inner: Store,
                          authority: String) extends ForwardingStore {
  override def rootUri: String = s"graft://$authority"
}

/** Latency injection (latency.rs analog): fixed delay per operation.
  * Unlike the other decorators, its `conf` KEEPS the decoration
  * ([[LatencyStoreConf]]): executor-side clients opened from it inject
  * the same RTT, so soaks measure the Spark plane under latency too.
  */
final class LatencyStore(inner: Store, delayMs: Long) extends Store {
  private def d(): Unit = Thread.sleep(delayMs)
  override def rootUri: String = inner.rootUri
  override def conf: StoreConf = LatencyStoreConf(inner.conf, delayMs)
  override def getBytes(key: String): Array[Byte] = { d(); inner.getBytes(key) }
  override def stat(key: String): Option[StatInfo] = { d(); inner.stat(key) }
  override def getRange(key: String, offset: Long, length: Long): Array[Byte] =
    { d(); inner.getRange(key, offset, length) }
  override def putBytes(key: String, bytes: Array[Byte]): Unit =
    { d(); inner.putBytes(key, bytes) }
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    { d(); inner.putIfAbsent(key, bytes) }
  override def list(prefix: String): Seq[ObjectInfo] = { d(); inner.list(prefix) }
  override def listPage(prefix: String, startAfter: Option[String],
                        maxKeys: Int): Seq[ObjectInfo] =
    { d(); inner.listPage(prefix, startAfter, maxKeys) }
  override def listBounded(prefix: String, max: Int): (Seq[ObjectInfo], Boolean) = {
    // A native continuation loop pays one RTT per 1,000-key page; charge
    // the same here so soaks don't flatter bounded probes of big prefixes.
    val r = inner.listBounded(prefix, max)
    val pages = math.max(1L, (r._1.size + 999L) / 1000L)
    Thread.sleep(delayMs * pages)
    r
  }
  override def copy(srcKey: String, dstKey: String): Unit =
    { d(); inner.copy(srcKey, dstKey) }
  override def exists(key: String): Boolean = { d(); inner.exists(key) }
  override def delete(keys: Iterable[String]): Unit = { d(); inner.delete(keys) }
  override def deletePrefix(prefix: String): Unit =
    { d(); inner.deletePrefix(prefix) }
}
