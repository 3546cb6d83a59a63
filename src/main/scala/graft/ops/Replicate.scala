package graft.ops

import java.time.Instant

import org.apache.spark.sql.functions._
import graft.meta.{ChunkRef, Layout, OpLogEntry, RepoInfo, RepoPointer,
  SnapshotInfo}
import graft.repo.{ConflictException, GraftConfig, GraftError,
  GraftException, Repository}
import graft.storage.{Store, StoreConf}

/** One replication run's outcome (all counts are objects COPIED this
  * run — an incremental re-sync of an unchanged branch reports zeros
  * except `chunksSkipped`).
  */
final case class SyncSummary(
    ref: String,
    snapshotId: String,
    snapshotsCopied: Int,
    txObjectsCopied: Int,
    manifestObjectsCopied: Int,
    chunksCopied: Long,
    chunkBytesCopied: Long,
    chunksSkipped: Long)

/** Branch/tag replication between repositories — "push a branch to
  * another bucket". The reference leaves cross-store copying to generic
  * object-sync tools, which are unaware of the commit closure: they
  * either copy everything (including garbage) or tear a repo mid-commit.
  * Closure-aware sync copies exactly the reachable set of one ref and
  * lands the destination pointer with the same CAS discipline as a
  * commit, so a reader of the destination never observes a half-pushed
  * branch: content objects first (immutable, content-addressed — safe to
  * copy in any order), the pointer generation last.
  *
  * Scale shape: snapshots and tx logs are metadata (driver-side, bounded
  * by history length); manifest Parquet objects and chunk payloads copy
  * EXECUTOR-SIDE — the chunk relation comes straight out of the
  * manifests as a DataFrame, and each task opens cached store clients
  * ([[StoreConf.cached]]) and routes each object through
  * [[graft.storage.Transfer.copyIfAbsent]]: local→local goes kernel-side
  * (copy_file_range — no heap), s3→s3 on one endpoint goes server-side
  * (`x-amz-copy-source` — no payload bytes through the executor at all),
  * anything else GET + atomic put-if-absent. Incremental syncs cost one
  * metadata walk plus one parallel HEAD per chunk (content-addressed ids
  * make "exists" a correct skip test — no listing of a 100 M-object
  * destination, no byte-level diff). Virtual chunk refs are pointers
  * into EXTERNAL
  * stores and are not copied (their containers resolve identically from
  * the replica); inline chunks live inside manifests and travel with
  * them.
  *
  * Concurrent GC on the SOURCE can delete objects between the closure
  * walk and the copy — the same hazard window the reference documents
  * for its expire/GC vs reader races. Run syncs outside GC windows (or
  * retry: the copy fails loudly on a missing source object, it never
  * lands a dangling pointer).
  */
object Replicate {

  /** Sync one source ref (branch or tag name) into the repository at
    * `dst`, creating the destination repo (no root commit of its own —
    * the source's history IS the history) if it does not exist.
    *
    * Fast-forward discipline: if the destination branch already exists,
    * its tip must be inside the pushed closure (the push strictly
    * advances it); anything else is refused with kind `conflict` unless
    * `force = true` (which resets the branch, like `reset_branch`).
    */
  /** `depth` limits how much HISTORY ships (shallow push, like git's
    * `--depth`): only the newest `depth` ancestry snapshots replicate.
    * The tip's manifests describe the FULL current state, so a depth-1
    * push is a complete, readable copy of "now" — only time travel past
    * the horizon is absent (the replica's ancestry walk simply ends at
    * the oldest shipped snapshot, the same reader behavior `expire`
    * produces).
    */
  /** `existsVia` picks how the chunk stage decides "already there":
    *  - `"head"` — one HEAD per chunk id (the steady-state incremental
    *    cost; right when the closure is small);
    *  - `"list"` — ONE distributed destination listing (1,024 parallel
    *    two-character base32 prefix slices of the `chunks/` namespace)
    *    anti-joined against the closure, then copies run with NO
    *    per-object pre-check. At a 100 M-chunk closure this is ~100 k
    *    LIST pages spread over 1,024 independent tasks (~100 sequential
    *    pages each) instead of 100 M HEADs — the GC reachability
    *    pattern applied to push;
    *  - `"auto"` (default) — `"list"` when the closure exceeds
    *    `listExistsOver` ids, `"head"` otherwise. NOTE: list mode's
    *    cost scales with the DESTINATION namespace, not the closure —
    *    `auto` keys on closure size only, so a large closure pushed
    *    into a much larger shared destination lists that whole
    *    namespace; pass `existsVia = "head"` explicitly when the
    *    destination dwarfs the closure.
    */
  def sync(src: Repository, dst: Store, ref: String,
           dstRef: String = null, force: Boolean = false,
           depth: Int = Int.MaxValue,
           existsVia: String = "auto",
           listExistsOver: Long = 100000L): SyncSummary =
    graft.core.Trace.span("push", "ref" -> ref) { h =>
      val s = syncImpl(src, dst, ref, dstRef, force, depth,
        existsVia, listExistsOver, h)
      h.set("snapshots_copied", s.snapshotsCopied.toLong)
      h.set("chunks_copied", s.chunksCopied)
      h.set("chunk_bytes_copied", s.chunkBytesCopied)
      s
    }

  private def syncImpl(src: Repository, dst: Store, ref: String,
           dstRef: String, force: Boolean,
           depth: Int, existsVia: String, listExistsOver: Long,
           h: graft.core.Trace.Handle): SyncSummary = {
    require(Set("auto", "head", "list").contains(existsVia),
      s"existsVia must be auto|head|list, got '$existsVia'")
    val spark = src.spark
    // per-phase wall clocks on the push span: the r10 drift question
    // ("push 7.2→14.4 s on untouched code") was unanswerable without
    // knowing WHICH phase moved — now the span says
    var tPhase = System.nanoTime()
    def phase(name: String): Unit = {
      val now = System.nanoTime()
      h.set(s"ms_$name", (now - tPhase) / 1000000L)
      tPhase = now
    }
    val info = src.info()
    val (isTag, tip) = info.branches.get(ref) match {
      case Some(t) => (false, t)
      case None => info.tags.get(ref) match {
        case Some(t) => (true, t)
        case None => throw new GraftException(
          s"no branch or tag named $ref", GraftError.RefNotFound)
      }
    }
    val targetRef = Option(dstRef).getOrElse(ref)
    require(depth >= 1, "sync: depth must be >= 1")
    val closure: Seq[SnapshotInfo] =
      (info.snapshotInfo(tip).toSeq ++ info.ancestry(tip)).distinctBy(_.id)
        .take(depth)
    val closureIds = closure.map(_.id).toSet

    // ---- metadata: snapshots + tx logs (driver-side, bounded) ----
    // per-snapshot work (exists + get + put + tx-log list/copies) runs
    // CONCURRENTLY across the closure: a 400-commit first push is
    // otherwise ~2 000 sequential round trips of metadata alone at
    // object-store RTTs (round-13 latency audit; payload copies were
    // already executor-parallel)
    // width 128: a bulk maintenance walk over the whole closure, not an
    // interactive path — the reference drives object stores at 256
    // concurrent requests; 32 left a 411-commit push at ~13 waves per
    // sub-phase of pure sleep at 50 ms RTT (r14 latency soak)
    val metaCopied = graft.storage.Store.parallelIO(closure,
        maxThreads = 128) { si =>
      val snapKey = Layout.snapshotKey(si.id)
      val snaps =
        if (dst.exists(snapKey)) 0
        else { dst.putBytes(snapKey, src.store.getBytes(snapKey)); 1 }
      // the snapshot body names the manifests this commit reads
      val mids = src.assets.readSnapshot(si.id)
        .manifests.values.flatten.map(_.manifestId).toSeq
      var tx = 0
      src.store.list(Layout.txLogPrefix(si.id) + "/").foreach { o =>
        if (!dst.exists(o.key)) {
          dst.putBytes(o.key, src.store.getBytes(o.key))
          tx += 1
        }
      }
      (snaps, tx, mids)
    }
    val snapsCopied = metaCopied.map(_._1).sum
    val txCopied = metaCopied.map(_._2).sum
    val manifestIds = scala.collection.mutable.LinkedHashSet[String]()
    metaCopied.foreach(manifestIds ++= _._3)
    phase("metadata")

    // ---- manifest Parquet objects (executor-side copy) ----
    val srcConf = src.store.conf
    val dstConf = dst.conf
    val manifestKeys: Seq[String] =
      graft.storage.Store.parallelIO(manifestIds.toSeq, maxThreads = 128)(
        mid =>
        src.store.list(Layout.manifestPrefix(mid) + "/").map(_.key)).flatten
    val manifestsCopied =
      if (manifestKeys.isEmpty) 0
      else spark.sparkContext
        .parallelize(manifestKeys, math.max(1, manifestKeys.size / 64))
        .mapPartitions { keys =>
          val s = StoreConf.cached(srcConf)
          val d = StoreConf.cached(dstConf)
          // copies WITHIN one task run concurrently (width 8, batches of
          // 256 so a huge partition never materializes at once): a
          // task's serial key loop over a 50 ms object store costs
          // keys × RTT of wall — the r14 Spark-plane latency soak
          // measured exactly that once executor clients started paying
          // injected RTT. The reference's transfer path streams with
          // request-level concurrency the same way.
          var n = 0
          keys.grouped(256).foreach { g =>
            n += graft.storage.Store.parallelIO(g.toSeq, maxThreads = 8)(
              k => if (graft.storage.Transfer.copyIfAbsent(s, d, k)
                .isDefined) 1 else 0).sum
          }
          Iterator.single(n)
        }.sum().toInt
    phase("manifests")

    // ---- chunk payloads: the data-plane copy (executor-side) ----
    import spark.implicits._
    val chunkIds =
      if (manifestIds.isEmpty) spark.emptyDataset[String].toDF("chunk_id")
      // ONE multi-path scan (no per-manifest condition needed):
      // a push closure over 10k manifests must not build a 10k-leg
      // union plan. recursiveFileLookup skips the conflicting
      // per-manifest partition-dir inference.
      else spark.read.schema(src.assets.manifestSchema)
        .option("recursiveFileLookup", "true")
        .parquet(manifestIds.toSeq.map(src.assets.manifestUri): _*)
        .filter(col("kind") === ChunkRef.KindRef)
        .select("chunk_id").distinct()
    val (chunksCopied, bytesCopied, chunksSkipped) = try {
      // persisted for the phase: the closure-size count AND the copy job
      // both consume this relation — unpersisted, each re-scans every
      // closure manifest and re-runs the distinct exchange (r16: half of
      // ms_chunks on a nothing-to-copy incremental push was the re-scan)
      chunkIds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val total = chunkIds.count()
      val useList = existsVia == "list" ||
        (existsVia == "auto" && total > listExistsOver)
      // list mode: ONE distributed destination listing replaces
      // per-object HEADs — two characters of the base32 id charset fan
      // the `chunks/` namespace into 1,024 independent prefix slices
      // (each its own paged LIST stream, so a 100 M-object destination
      // pages ~100 sequential LIST calls per task instead of ~3,000 at
      // the old 32-way fan-out), and a LEFT ANTI join leaves exactly
      // the ids to copy. Partition count is capped at the cluster's
      // parallelism — 1,024 slices stay 1,024 units of work either way.
      val toCopy =
        if (!useList) chunkIds
        else {
          val existing = DistributedListing.chunkObjects(spark, dstConf)
            .toDF("chunk_id", "size", "mtime").select("chunk_id")
          chunkIds.join(existing, Seq("chunk_id"), "left_anti")
        }
      val stats = toCopy.as[String].mapPartitions { ids =>
        val s = StoreConf.cached(srcConf)
        val d = StoreConf.cached(dstConf)
        var copied = 0L; var bytes = 0L; var skipped = 0L
        // concurrent within the task (width 8, bounded batches): per-key
        // serial GET+PUT over a high-RTT store would make each task's
        // wall keys × RTT (r14 Spark-plane latency soak)
        ids.grouped(256).foreach { g =>
          graft.storage.Store.parallelIO(g.toSeq, maxThreads = 8) { id =>
            val key = Layout.chunkKey(id)
            // Transfer picks the zero-heap route when one exists
            // (local→local kernel copy, s3/gcs/azure same-endpoint
            // server-side copy) and falls back to GET + atomic
            // put-if-absent — concurrent syncs of overlapping closures
            // stay idempotent on content-addressed objects either way.
            // In list mode the anti-join already excluded present ids,
            // so the per-object pre-check is skipped entirely.
            graft.storage.Transfer.copyIfAbsent(s, d, key,
              precheck = !useList)
          }.foreach {
            case Some(n) => copied += 1; bytes += n
            case None => skipped += 1
          }
        }
        Iterator.single((copied, bytes, skipped))
      }.collect()
      // list mode: ids the anti-join dropped are skips too (present at
      // the destination before this run)
      val copied = stats.map(_._1).sum
      (copied, stats.map(_._2).sum,
        if (useList) total - copied else stats.map(_._3).sum)
    } finally chunkIds.unpersist(blocking = false)
    phase("chunks")

    // ---- pointer: land the ref with commit-grade CAS, content first ----
    val dstPointer = new RepoPointer(dst)
    var attempts = 0
    var landed = false
    while (!landed && attempts < 10) {
      attempts += 1
      dstPointer.load() match {
        case None =>
          val fresh = RepoInfo(
            gen = 0L,
            branches = if (isTag) Map("main" -> tip)
                       else Map(targetRef -> tip),
            tags = if (isTag) Map(targetRef -> tip)
                   else Map.empty[String, String],
            snapshots = closure,
            ops = Seq(OpLogEntry(Instant.now().toString, "replicate_in",
              s"$ref@${tip.take(12)} from ${src.store.rootUri}")),
            config = info.config)
          landed = dstPointer.compareAndSwap(-1L, fresh)
        case Some(cur) =>
          if (!isTag) cur.branches.get(targetRef).foreach { existingTip =>
            if (existingTip != tip && !closureIds.contains(existingTip) &&
                !force)
              throw new GraftException(
                s"destination branch $targetRef is at $existingTip, not an " +
                  "ancestor of the pushed tip — diverged (use force to reset)",
                GraftError.Conflict)
          }
          if (isTag) cur.tags.get(targetRef).foreach { existing =>
            if (existing != tip) throw new GraftException(
              s"destination tag $targetRef already points at $existing",
              GraftError.Conflict)
          }
          val mergedSnaps = (cur.snapshots ++ closure).distinctBy(_.id)
          val next = cur.copy(
            gen = cur.gen + 1,
            branches = if (isTag) cur.branches
                       else cur.branches.updated(targetRef, tip),
            tags = if (isTag) cur.tags.updated(targetRef, tip) else cur.tags,
            snapshots = mergedSnaps,
            ops = (cur.ops :+ OpLogEntry(Instant.now().toString,
              "replicate_in",
              s"$ref@${tip.take(12)} from ${src.store.rootUri}"))
              .takeRight(GraftConfig.fromMap(cur.config).opsRingSize))
          landed = dstPointer.compareAndSwap(cur.gen, next)
      }
      if (!landed) Thread.sleep(25L * attempts)
    }
    if (!landed) throw new ConflictException(
      s"replicate lost the destination CAS race $attempts times")
    phase("pointer")

    SyncSummary(ref, tip, snapsCopied, txCopied, manifestsCopied,
      chunksCopied, bytesCopied, chunksSkipped)
  }
}
