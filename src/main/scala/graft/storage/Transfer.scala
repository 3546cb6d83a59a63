package graft.storage

/** Cross-store object transfer with zero-heap fast paths. The generic
  * route (GET the payload, PUT it) is correct everywhere but moves every
  * byte through the executor's heap twice; replication of a multi-TB
  * closure deserves better when the topology allows it:
  *
  *  - local → local: kernel-side `Files.copy` + hard-link-if-absent
  *    ([[LocalStore.transferInFrom]]) — copy_file_range/sendfile, no
  *    JVM allocation per object (the r10→r11 `engine_repo_push` profile
  *    showed the chunk-payload phase at ~90% of push wall time, all of
  *    it heap-routed byte shoveling).
  *  - same-service object stores: server-side copy — s3
  *    `x-amz-copy-source`, gcs `objects/copyTo`, azure Copy Blob
  *    (`copyFromStore` on each store, gated on same endpoint +
  *    credentials) — at 100 TB the payload bytes never leave the
  *    object service.
  *  - anything else: GET + atomic put-if-absent (unchanged semantics).
  *
  * All routes preserve the replication contract: content-addressed
  * objects land if-absent (concurrent pushes of overlapping closures are
  * idempotent), and a reader of the destination never observes a partial
  * object.
  */
object Transfer {

  /** Copy `key` from `src` into `dst` unless it already exists there.
    * Returns the object's size when THIS call copied it, None when the
    * destination already had it (or a concurrent copier won the race).
    */
  /** Executor-side stores arrive wrapped in [[RetryingStore]]
    * ([[StoreConf.cached]]); dispatch must see the concrete store. The
    * fast paths below are single idempotent requests, so a caller-level
    * retry (re-running copyIfAbsent) is safe if one throws.
    */
  private def base(s: Store): Store = s match {
    case r: RetryingStore => r.underlying
    case x => x
  }

  /** The fast paths dispatch on UNWRAPPED stores, so they sit outside
    * [[RetryingStore]]'s transient-failure veneer — re-add it here: a
    * server-side copy of a content-addressed object is idempotent, so a
    * blind retry after a 5xx/reset is always safe (the old GET+PUT path
    * was retried; losing that on the faster route would trade
    * robustness for speed).
    */
  private[graft] def retryTransient[A](body: => A): A = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return body
      catch {
        case t: Throwable
            if attempt < 5 && RetryingStore.defaultTransient(t) =>
          Thread.sleep(20L * (1L << math.min(attempt - 1, 6)))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Shared shape of the service-internal copy routes: exists-skip
    * (unless the caller already knows the key is absent), size via one
    * HEAD on the source (still zero payload movement), then the
    * store-specific server-side call (transient-retried).
    */
  private def serverSide(src: Store, dst: Store, key: String,
                         precheck: Boolean)(
      copy: Long => Unit): Option[Long] =
    if (precheck && dst.exists(key)) None
    else {
      val size = src.stat(key).map(_.size).getOrElse(0L)
      retryTransient(copy(size))
      Some(size)
    }

  /** `precheck = false` skips the destination existence probe — for
    * callers that already resolved presence in bulk (e.g. push's
    * listing anti-join), saving one HEAD per object. Semantics stay
    * if-absent on the local and generic routes regardless (hard-link /
    * conditional PUT are atomic); the server-side route then
    * unconditionally copies, which is value-idempotent on
    * content-addressed objects.
    */
  def copyIfAbsent(src: Store, dst: Store, key: String,
                   precheck: Boolean = true): Option[Long] =
    (base(src), base(dst)) match {
      case (ls: LocalStore, ld: LocalStore) =>
        if (ld.transferInFrom(ls.pathOf(key), key))
          Some(java.nio.file.Files.size(ld.pathOf(key)))
        else None
      case (ss: s3.S3Store, sd: s3.S3Store) if sd.canCopyServerSide(ss) =>
        serverSide(src, dst, key, precheck)(sz =>
          sd.copyFromStore(ss, key, key, sz))
      case (gs: gcs.GcsStore, gd: gcs.GcsStore)
          if gd.canCopyServerSide(gs) =>
        serverSide(src, dst, key, precheck)(_ =>
          gd.copyFromStore(gs, key, key))
      case (as: az.AzureStore, ad: az.AzureStore)
          if ad.canCopyServerSide(as) =>
        serverSide(src, dst, key, precheck)(_ =>
          ad.copyFromStore(as, key, key))
      case _ =>
        // generic route keeps the caller's (possibly retry-wrapped)
        // stores — GET/exists stay transiently retried
        if (precheck && dst.exists(key)) None
        else {
          val payload = src.getBytes(key)
          if (dst.putIfAbsent(key, payload)) Some(payload.length.toLong)
          else None
        }
    }
}
