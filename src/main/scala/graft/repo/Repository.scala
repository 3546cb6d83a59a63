package graft.repo

import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Ids
import graft.meta._
import graft.meta.GraftEncoders._
import graft.storage.Store
import graft.virt.VirtualChunkResolver

/** Versioned repository over an object store (repository.rs).
  *
  * Branch/tag/snapshot bookkeeping lives in the pointer chain (CAS-updated,
  * [[graft.meta.RepoPointer]]); all heavyweight reads/writes are Spark jobs
  * over immutable Parquet. Every mutating entry point goes through
  * [[casUpdate]] — the same optimistic-concurrency discipline as commits.
  */
final class Repository private (
    val store: Store,
    val spark: SparkSession,
    val config: GraftConfig,
    val virtualResolver: VirtualChunkResolver) {

  // make graft:// store roots (S3 backends) readable by Spark's Parquet IO
  graft.storage.hadoop.GraftFileSystem.register(spark, store)

  val assets = new AssetManager(store, spark)
  val pointer = new RepoPointer(store)

  def info(): RepoInfo = pointer.load().getOrElse(
    throw new GraftException("repository not initialized"))

  // ------------------------------------------------------------------
  // refs: branches & tags (repository.rs:1134-1708)
  // ------------------------------------------------------------------

  private[graft] def casUpdate(op: String, detail: String)(
      f: RepoInfo => RepoInfo): RepoInfo = {
    // progress-aware budget, same shape as Session.commit (VERDICT r14
    // item 4): a lost round whose generation ADVANCED proves a peer
    // landed — a branch/tag update racing an N-writer commit convoy can
    // lose up to the convoy's whole commit count before it must win, so
    // only STALLED rounds burn the flat budget; total attempts stay
    // bounded by the 16× hard cap (no livelock).
    var attempts = 0
    var stalls = 0
    var foreign = 0L
    var lastGen = -1L
    val hardCap = config.commitAttemptCap
    while (stalls < config.commitRetries && attempts < hardCap) {
      attempts += 1
      val cur = info()
      if (lastGen >= 0) {
        if (cur.gen > lastGen) foreign += cur.gen - lastGen
        else stalls += 1
      }
      lastGen = cur.gen
      val entry = OpLogEntry(Instant.now().toString, op, detail)
      val next0 = f(cur)
      val next = next0.copy(gen = cur.gen + 1,
        ops = (next0.ops :+ entry).takeRight(config.opsRingSize))
      if (pointer.compareAndSwap(cur.gen, next)) return next
      Thread.sleep(math.min(50L * attempts, 500L)) // backoff (gc.rs:360-380)
    }
    throw new ConflictException(
      s"$op lost the CAS race $attempts times: $foreign concurrent " +
        "pointer updates landed during the retries — raise " +
        s"commit_retries (currently ${config.commitRetries}) or reduce " +
        "the writer fan-in")
  }

  def listBranches(): Seq[String] = info().branches.keys.toSeq.sorted
  def lookupBranch(name: String): Option[String] = info().branches.get(name)

  // ------------------------------------------------------------------
  // repo administration (reference repository.py: metadata / status /
  // default commit metadata / spec_version / transaction)
  // ------------------------------------------------------------------

  /** On-disk format revision this library writes. */
  def specVersion: Int = Repository.SpecVersion

  /** Repository-level user metadata, JSON-typed (reference
    * `get_metadata`). Admin state on the pointer — not versioned.
    */
  def metadata: Map[String, org.json4s.JValue] =
    graft.meta.SnapshotProps.decode(info().metadata)

  /** REPLACE the repository metadata (reference `set_metadata`). */
  def setMetadata(m: Map[String, org.json4s.JValue]): Unit =
    casUpdate("set_metadata", s"${m.size} keys") { i =>
      i.copy(metadata = graft.meta.SnapshotProps.encode(m))
    }

  /** MERGE into the repository metadata, passed keys win (reference
    * `update_metadata`). Returns the merged result.
    */
  def updateMetadata(m: Map[String, org.json4s.JValue])
      : Map[String, org.json4s.JValue] =
    graft.meta.SnapshotProps.decode(
      casUpdate("update_metadata", s"${m.size} keys") { i =>
        i.copy(metadata = i.metadata ++ graft.meta.SnapshotProps.encode(m))
      }.metadata)

  /** Current availability status (reference `RepoStatus`). */
  def status: RepoStatus = {
    val i = info()
    RepoStatus(i.statusAvailability == "read_only",
      Option(i.statusSetAt).filter(_.nonEmpty).map(Instant.parse),
      Option(i.statusReason).filter(_.nonEmpty))
  }

  /** Flip the repo between online and read_only (reference
    * `set_status`): read_only is an ADMIN LOCK — new writable sessions
    * and in-flight commits are refused with kind `read_only` until an
    * operator flips it back. Branch/tag/metadata admin ops stay
    * available (you must be able to unlock, and maintenance is what the
    * lock is usually FOR).
    */
  def setStatus(readOnly: Boolean, reason: String = ""): Unit =
    casUpdate("set_status",
      (if (readOnly) "read_only" else "online") +
        (if (reason.nonEmpty) s" ($reason)" else "")) { i =>
      i.copy(statusAvailability = if (readOnly) "read_only" else "online",
        statusSetAt = Instant.now().toString,
        statusReason = if (readOnly) reason else "")
    }

  /** Default commit metadata (reference `default_commit_metadata`). */
  def defaultCommitMetadata: Map[String, org.json4s.JValue] =
    graft.meta.SnapshotProps.decode(info().defaultCommitMeta)

  /** Set metadata merged under EVERY commit's properties
    * (commit-provided keys win). Applies to sessions created after this
    * call — open writable sessions keep the defaults they were born
    * with (reference `set_default_commit_metadata` semantics).
    */
  def setDefaultCommitMetadata(m: Map[String, org.json4s.JValue]): Unit =
    casUpdate("set_default_commit_metadata", s"${m.size} keys") { i =>
      i.copy(defaultCommitMeta = graft.meta.SnapshotProps.encode(m))
    }

  /** Scoped write: open a writable session on `branch`, run `body`,
    * commit with `message` (reference `Repository.transaction`). The
    * commit inherits the full rebase-retry machinery; nothing is
    * written if `body` throws.
    */
  def transaction(branch: String, message: String,
                  properties: Map[String, String] = Map.empty,
                  solver: graft.vc.ConflictSolver =
                    graft.vc.BasicConflictSolver())(
      body: Session => Unit): String = {
    val s = writableSession(branch)
    body(s)
    s.commit(message, properties, solver)
  }

  def createBranch(name: String, snapshotId: String): Unit =
    casUpdate("create_branch", name) { i =>
      if (i.branches.contains(name))
        throw new GraftException(s"branch $name exists")
      if (i.snapshotInfo(snapshotId).isEmpty)
        unknownSnapshot(i, snapshotId, "create_branch")
      i.copy(branches = i.branches.updated(name, snapshotId))
    }

  /** Point a branch at an arbitrary snapshot (`reset_branch`). */
  def resetBranch(name: String, snapshotId: String): Unit =
    casUpdate("reset_branch", s"$name -> $snapshotId") { i =>
      if (!i.branches.contains(name))
        throw new GraftException(s"no branch $name", GraftError.RefNotFound)
      if (i.snapshotInfo(snapshotId).isEmpty)
        unknownSnapshot(i, snapshotId, "reset_branch")
      i.copy(branches = i.branches.updated(name, snapshotId))
    }

  def deleteBranch(name: String): Unit =
    casUpdate("delete_branch", name) { i =>
      if (name == "main") throw new GraftException("cannot delete main")
      i.copy(branches = i.branches.removed(name))
    }

  // ------------------------------------------------------------------
  // feature flags (feature_flags.rs): persisted switches gating
  // history-affecting ops; toggling goes through the CAS like any update
  // ------------------------------------------------------------------

  /** Known flags. Unset flags are enabled. */
  object Flags {
    val MoveNode = "enable-move-node"
    val Amend = "enable-amend"
    val Expire = "enable-expire"
  }

  def featureFlag(name: String): Boolean = info().flagEnabled(name)

  def setFeatureFlag(name: String, enabled: Boolean): Unit =
    casUpdate("set_feature_flag", s"$name=$enabled") { i =>
      i.copy(flags = i.flags.updated(name, enabled))
    }

  private[graft] def requireFlag(name: String, op: String): Unit =
    if (!featureFlag(name))
      throw new GraftException(
        s"$op is disabled by feature flag '$name' (enable it with " +
          "Repository.setFeatureFlag)")

  /** Persist a new repo config (the reference's `save_config`). Takes
    * effect for repositories opened afterwards without an explicit
    * config; this instance keeps the config it was opened with.
    */
  def saveConfig(newConfig: GraftConfig): Unit =
    casUpdate("update_config", "") { i => i.copy(config = newConfig.toMap) }

  def listTags(): Seq[String] = info().tags.keys.toSeq.sorted
  def lookupTag(name: String): Option[String] = info().tags.get(name)

  def createTag(name: String, snapshotId: String): Unit =
    casUpdate("create_tag", name) { i =>
      // deleted tags are tombstoned and cannot be recreated (repo_info.rs:713)
      if (i.tags.contains(name) || i.deletedTags.contains(name))
        throw new GraftException(s"tag $name exists or was deleted")
      if (i.snapshotInfo(snapshotId).isEmpty)
        unknownSnapshot(i, snapshotId, "create_tag")
      i.copy(tags = i.tags.updated(name, snapshotId))
    }

  def deleteTag(name: String): Unit =
    casUpdate("delete_tag", name) { i =>
      if (!i.tags.contains(name)) throw new GraftException(s"no tag $name", GraftError.RefNotFound)
      i.copy(tags = i.tags.removed(name),
        deletedTags = i.deletedTags :+ name)
    }

  // ------------------------------------------------------------------
  // history
  // ------------------------------------------------------------------

  def resolveVersion(ref: VersionRef): String = ref match {
    case VersionRef.Branch(b) => lookupBranch(b).getOrElse(
      throw new GraftException(s"no branch $b", GraftError.RefNotFound))
    case VersionRef.Tag(t) => lookupTag(t).getOrElse(
      throw new GraftException(s"no tag $t", GraftError.RefNotFound))
    case VersionRef.SnapshotVer(id) => id
    case VersionRef.AsOf(branch, atMillis) =>
      // newest-first ancestry walk, skip-while newer than the cutoff —
      // the first remaining snapshot is the branch state at `atMillis`
      // (repository.rs:1785-1799)
      ancestry(VersionRef.Branch(branch))
        .find(s => java.time.Instant.parse(s.flushedAt).toEpochMilli
          <= atMillis)
        .map(_.id)
        .getOrElse(throw new GraftException(
          s"branch $branch has no snapshot at or before " +
            java.time.Instant.ofEpochMilli(atMillis),
          GraftError.RefNotFound))
  }

  /** `ancestry(ref)` — ordered, most recent first (repository.rs:970). */
  def ancestry(ref: VersionRef): Seq[SnapshotInfo] =
    info().ancestry(resolveVersion(ref))

  /** git-style ref comparison: the merge base (nearest common ancestor)
    * and how many commits each side has beyond it — the "ahead 2,
    * behind 5" answer before a merge/push. Driver-side ancestry walk
    * over pointer metadata; diverged refs with no common ancestor (one
    * side expired past the fork) come back with mergeBase = None and
    * full-chain counts.
    */
  def compareRefs(a: VersionRef, b: VersionRef): RefComparison = {
    val ia = ancestry(a)
    val ib = ancestry(b)
    val inB = ib.map(_.id).toSet
    val base = ia.find(s => inB.contains(s.id)).map(_.id)
    RefComparison(resolveVersion(a), resolveVersion(b), base,
      ahead = ia.takeWhile(s => !base.contains(s.id)).size,
      behind = ib.takeWhile(s => !base.contains(s.id)).size)
  }

  /** MERGE one branch into another (git-style `merge src into dst` — a
    * capability the reference leaves to rebase-only workflows): replay
    * src's cumulative changes since the merge base onto a dst session
    * and commit once. src is untouched.
    *
    * Semantics: already-merged → no-op returning dst's tip;
    * dst at the base → fast-forward (dst just advances to src's tip, no
    * new commit); diverged → node ops replay from src's TIP state
    * (creations parent-first, deletions child-first; a node src deleted
    * and re-created merges as its final state), and every chunk coord
    * src touched since the base stages the ref AT SRC'S TIP —
    * content-addressed ids mean ZERO payload copies, both manifests
    * reference the same chunk objects — with tombstones where src
    * deleted. Conflicts against dst's own since-base edits are
    * classified by the SAME detector the commit rebase uses and handed
    * to `solver` (default BasicConflictSolver: src wins double-updated
    * chunks; pass UseTheirs / Fail to flip). src-side `move` edits are
    * refused (kind `unsupported`) — merge them by hand.
    *
    * Scale shape: node ops are driver metadata; chunk staging is ONE
    * batched job across every touched array — the src-tip refs of all
    * touched arrays union into a single (path, coord)-keyed relation,
    * semi-joined against the edited coords (anti-join finds deletions)
    * and staged through [[graft.repo.Session.stageChunkRefsBatch]] — so
    * a merge touching thousands of arrays plans one job, not thousands
    * serially. No payload bytes move; cost scales with the CHANGE. The
    * source branch is resolved ONCE and pinned to that snapshot for
    * every read, so concurrent commits on src cannot skew the merge.
    */
  def mergeBranch(src: String, dst: String, message: String = null,
                  solver: graft.vc.ConflictSolver =
                    graft.vc.BasicConflictSolver()): String =
    graft.core.Trace.span("merge", "src" -> src, "dst" -> dst) { h =>
      val id = mergeBranchImpl(src, dst, message, solver, h)
      h.set("snapshot_id", id)
      id
    }

  private def mergeBranchImpl(src: String, dst: String, message: String,
                  solver: graft.vc.ConflictSolver,
                  h: graft.core.Trace.Handle): String = {
    // per-phase wall clocks (same discipline as the push span): the
    // slowest bench entries are merges, and a drift question must be
    // answerable per phase, not per merge
    var tPhase = System.nanoTime()
    def phase(name: String): Unit = {
      val now = System.nanoTime()
      h.set(s"ms_$name", (now - tPhase) / 1000000L)
      tPhase = now
    }
    val dstRef = VersionRef.Branch(dst)
    val srcTip = resolveVersion(VersionRef.Branch(src))
    // Pin src to the tip resolved ONCE: every later read (ancestry, diff,
    // readonly session) goes through this snapshot id, so a commit landing
    // on src mid-merge cannot leak newer edits into a merge whose
    // mergedFrom / merge.sourceSnapshot record the older tip (a later
    // merge would treat those newer edits as unabsorbed and re-replay
    // them over dst's subsequent changes).
    val srcRef = VersionRef.SnapshotVer(srcTip)
    val dstTip = resolveVersion(dstRef)
    val srcChain = ancestry(srcRef) // newest first
    val dstChain = ancestry(dstRef)
    // reachability on dst includes merge second-parents: a previously
    // merged src tip counts as merged even though first-parent-linear
    // ancestry cannot see it
    val dstReach = dstChain.flatMap(s => s.id +: s.mergedFrom.toSeq).toSet
    if (srcTip == dstTip || dstReach.contains(srcTip)) return dstTip
    // fast-forward: dst contributed nothing since the fork — validated
    // again INSIDE the CAS so a commit racing onto dst between the look
    // and the reset can never be silently discarded
    if (srcChain.exists(_.id == dstTip)) {
      casUpdate("merge_ff", s"$src -> $dst") { i =>
        if (!i.branches.get(dst).contains(dstTip))
          throw new ConflictException(
            s"merge: $dst moved during fast-forward — retry")
        i.copy(branches = i.branches.updated(dst, srcTip))
      }
      return srcTip
    }
    // edit base: the NEWEST point of src's chain dst has absorbed —
    // directly (shared ancestry) or via an earlier merge's second
    // parent. Using the raw fork point would replay already-merged
    // edits and silently revert dst's newer data on repeated merges.
    val base = srcChain.find(s => dstReach.contains(s.id)).map(_.id)
      .getOrElse(throw new GraftException(
        s"no common ancestor between $src and $dst (fork expired?)",
        GraftError.Expired))
    // conflict base: the first-parent common ancestor — dst's OWN edit
    // history is classified from here (it may sit below `base` after
    // earlier merges; a double-update against content an earlier merge
    // itself brought in resolves by the solver policy like any other)
    val confBase = srcChain.find(s => dstChain.exists(_.id == s.id))
      .map(_.id)
    // Driver route for the src edit set (r17, VERDICT item 2): when every
    // since-base src tx log is a small driver-readable object, the edit
    // enumeration AND the chunk staging below run without Spark jobs —
    // the src-tip refs for the delta coords resolve through the batched
    // point-lookup machinery (extent-pruned: only the manifest splits the
    // delta coords can live in are read, instead of refsBatch's scan of
    // ALL splits of every touched array — guide §6 pushdown at the
    // metadata level), and the refs stage as a LOCAL batch the flush fast
    // path collects for free. Any miss — an absent log (expired: the
    // Spark diff throws the documented error), an oversized log, or a
    // delta past the small-commit bound — falls back to the Spark
    // relations wholesale.
    val srcSinceBase = srcChain.takeWhile(_.id != base)
    val srcRowsDriver: Option[Seq[EditRow]] =
      if (srcSinceBase.exists(s => s.parentId.isDefined &&
          !assets.txLogExists(s.id))) None
      else {
        val reads = graft.storage.Store.parallelIO(
          srcSinceBase.map(_.id).filter(assets.txLogExists))(id =>
          assets.readTxLogRowsDriver(id))
        if (reads.exists(_.isEmpty)) None
        else Some(reads.flatten.flatten.distinct)
      }
    // any exception below — unsupported moves, staging failures,
    // detector errors — must not leak the cached relations for the
    // session's lifetime: ONE finally covers all three from the moment
    // each persists (vars so the finally sees whatever got that far)
    var editsSpark: Option[DataFrame] = None
    var stagedRelation: Option[DataFrame] = None
    var theirLog: Option[DataFrame] = None
    // persisted on demand (Spark route only): consumed by the editRows
    // collect AND the chunk coords filter — each re-scan re-reads the
    // tx-log chain (MergeTimeProbe: ≈ 0.3-1 s per redundant scan)
    def editsDf(): DataFrame = editsSpark.getOrElse {
      val e = diff(VersionRef.SnapshotVer(base), srcRef).persist()
      editsSpark = Some(e)
      e
    }
    try {
    // ONE driver collect serves both the node-op replay and the
    // chunk-path enumeration (each collect re-reads the tx logs)
    val editRows: Array[(String, String)] = srcRowsDriver match {
      case Some(rows) =>
        rows.iterator.map(r => (r.edit, r.path)).toArray.distinct
      case None => editsDf().select("edit", "path").distinct().collect()
        .map(r => (r.getString(0), r.getString(1)))
    }
    phase("diff")
    val nodeEdits = editRows.filter(_._1 != EditRow.Chunk)
    if (nodeEdits.exists(_._1 == EditRow.Move))
      throw new GraftException(
        s"merge $src into $dst: src history contains node moves — " +
          "replay them explicitly", GraftError.Unsupported)
    val srcSess = readonlySession(srcRef)
    val session = writableSession(dst)
    // creations/updates from src's TIP state, parents before children
    val upserts = nodeEdits.filter { case (e, _) =>
      e == EditRow.NewGroup || e == EditRow.NewArray ||
        e == EditRow.UpdateArray || e == EditRow.UpdateGroup
    }.map(_._2).distinct.sortBy(_.count(_ == '/'))
    upserts.foreach { path =>
      srcSess.node(path).foreach { spec => // absent = deleted later at src
        val dstNode = session.node(path)
        // a node whose TYPE differs between the sides (src re-created a
        // group as an array, or vice versa) has no sound auto-merge —
        // refuse by name instead of corrupting or crashing downstream
        dstNode.foreach { d =>
          if (d.isArray != spec.isArray) throw new ConflictException(
            s"merge $src into $dst: $path is a " +
              s"${if (spec.isArray) "array" else "group"} on $src but a " +
              s"${if (d.isArray) "array" else "group"} on $dst — " +
              "resolve by hand")
          if (spec.isArray && spec.isRectilinear)
            throw new ConflictException(
              s"merge $src into $dst: $path is rectilinear on $src and " +
                s"already exists on $dst — updateArray cannot carry a " +
                "rectilinear grid; resolve by hand")
        }
        (spec.isArray, dstNode) match {
          case (false, None) => session.addGroup(path, spec.userData)
          case (false, Some(_)) =>
            session.updateGroup(path, spec.userData)
          case (true, None) =>
            if (spec.isRectilinear)
              session.addArrayRectilinear(path, spec.shape,
                spec.chunkSizesPerDim, spec.dimNames, spec.userData)
            else session.addArray(path, spec.shape, spec.chunkShape,
              spec.dimNames, spec.userData)
          case (true, Some(_)) =>
            session.updateArray(path, spec.shape, spec.chunkShape,
              spec.dimNames, spec.userData)
        }
      }
    }
    // deletions: gone at src's tip and still present on dst, children first
    nodeEdits.filter { case (e, _) =>
      e == EditRow.DeleteArray || e == EditRow.DeleteGroup
    }.map(_._2).distinct.sortBy(-_.count(_ == '/'))
      .foreach { path =>
        if (srcSess.node(path).isEmpty && session.node(path).isDefined)
          session.deleteNode(path)
      }
    phase("nodes")
    // chunk edits: refs at src's tip for every touched coord, tombstones
    // where src deleted
    val chunkPaths =
      editRows.filter(_._1 == EditRow.Chunk).map(_._2).distinct
    val stagePaths = chunkPaths.filter { path =>
      val live = srcSess.node(path).exists(_.isArray)
      // src edited chunks of an array dst no longer has (and the node
      // replay above didn't re-create): a delete-vs-edit conflict the
      // solver cannot express — refuse by name, before any staging
      if (live && session.node(path).isEmpty) throw new ConflictException(
        s"merge $src into $dst: $path has chunk edits on $src but " +
          s"was deleted on $dst — recreate the array or drop the " +
          "edits, then retry")
      live
    }
    // ONE staging job across every touched array, keyed on (path, coord):
    // the src-tip refs of all touched arrays union into a single relation
    // (path stamped per leg), semi/anti-join against the edited coords
    // once, and stage through the batched path — a merge touching
    // thousands of arrays plans one job, not thousands serially. etag /
    // last_modified ride along so merged VIRTUAL refs keep their
    // freshness checksums.
    val deltaKeysDriver: Option[Seq[(String, Seq[Int])]] =
      srcRowsDriver.map { rows =>
        val keep = stagePaths.toSet
        rows.iterator
          .filter(r => r.edit == EditRow.Chunk && r.path != null &&
            keep(r.path))
          .map(r => (r.path, r.coord: Seq[Int])).toSeq.distinct
      }.filter(_.size <= Session.SmallCommitMaxRefs)
    stagedRelation = if (stagePaths.isEmpty) None
    else deltaKeysDriver match {
      case Some(deltaKeys) =>
        // driver staging (r17): ONE extent-pruned batched lookup wave
        // resolves every delta coord at src's tip — hits stage as src-tip
        // refs, misses as tombstones (src deleted the chunk), exactly the
        // Spark route's semi/anti-join pair — through the same
        // stageChunkRefsBatch entry point, as a LOCAL batch.
        val hits = srcSess.getChunkRefsBatch(deltaKeys)
        val stagedRows = deltaKeys.zip(hits).map {
          case ((p, c), Some(r)) => MergeStageRow(p, c, r.kind, r.inline,
            r.chunk_id, r.location, r.offset, r.length, r.etag,
            r.last_modified)
          case ((p, c), None) => MergeStageRow(p, c, ChunkRef.KindDelete,
            null, null, null, 0L, 0L, null, 0)
        }
        session.stageChunkRefsBatch(stagePaths,
          spark.createDataset(stagedRows.toVector)(
            org.apache.spark.sql.Encoders.product[MergeStageRow]).toDF())
        None // local batch — nothing persisted to release
      case None =>
        val coords = editsDf()
          .filter(col("edit") === EditRow.Chunk &&
            col("path").isin(stagePaths: _*))
          .select("path", "coord").distinct()
        // coord-bounded manifest access for the SPARK staging route too
        // (r17, guide §6 — the driver route above already prunes through
        // the point-lookup machinery): ONE delta-sized agg job computes
        // each touched path's per-dim coord bounding box, and the src
        // manifest scan then skips every split whose extents cannot
        // intersect it — a 50 k-coord delta against a 5 M-ref array reads
        // the handful of splits the delta lives in, not all of them.
        // Exactness is untouched: the semi/anti joins below consume only
        // exact (path, coord) matches, and every delta coord is inside
        // its own box by construction.
        val maxNd = stagePaths.map(p =>
          srcSess.node(p).map(_.shape.size).getOrElse(0)).max
        val boundsOf: Map[String, Seq[(Int, Int)]] =
          if (maxNd == 0) Map.empty
          else {
            val aggs = (1 to maxNd).flatMap(i => Seq(
              min(try_element_at(col("coord"), lit(i))).as(s"lo$i"),
              max(try_element_at(col("coord"), lit(i))).as(s"hi$i")))
            coords.groupBy("path").agg(aggs.head, aggs.tail: _*)
              .collect().flatMap { r =>
                val p = r.getString(0)
                val nd = srcSess.node(p).map(_.shape.size).getOrElse(0)
                val bs = (0 until nd).map { i =>
                  (Option(r.get(1 + 2 * i)), Option(r.get(2 + 2 * i)))
                }
                // any null bound (rank-short coords) ⇒ no pruning claim
                if (nd == 0 || bs.exists(b => b._1.isEmpty || b._2.isEmpty))
                  None
                else Some(p -> bs.map(b =>
                  (b._1.get.asInstanceOf[Int], b._2.get.asInstanceOf[Int])))
              }.toMap
          }
        val srcRefs = srcSess.refsBatchBounded(stagePaths, boundsOf)
          .select("path", "coord", "kind", "inline", "chunk_id", "location",
            "offset", "length", "etag", "last_modified")
        val present = srcRefs.join(coords, Seq("path", "coord"), "left_semi")
        val dels = coords
          .join(srcRefs.select("path", "coord"), Seq("path", "coord"),
            "left_anti")
          .withColumn("kind", lit(ChunkRef.KindDelete))
        // persisted: staged batches are LAZY, so without this every
        // consumer of the changeset (conflict doubles join, node-id
        // distinct, the flush merge itself) re-runs the full src manifest
        // scan + semi-join; the relation is delta-sized, the scan is not
        // (MergeTimeProbe: ~2 s per redundant evaluation at 500 k refs)
        val staged = present.unionByName(dels, allowMissingColumns = true)
          .persist()
        session.stageChunkRefsBatch(stagePaths, staged)
        Some(staged)
    }
    phase("chunks")
    // 3-way conflicts: src's edits (now the session changeset) vs dst's
    // own since-fork history — same detector as the commit rebase. No
    // first-parent common ancestor (possible only after heavy expire)
    // means nothing to classify against.
    // Driver route first (r16): a merge-sized changeset resolves to
    // in-memory rows (resolvedDriver memo — the flush probe reuses the
    // same collect) and dst's since-fork tx logs are usually small
    // driver-readable objects, so the whole classification runs with
    // zero additional Spark jobs. Any miss (big changeset, big/absent
    // log) falls back to the persisted-DataFrame detect unchanged.
    val theirRowsDriver: Option[Seq[EditRow]] = confBase match {
      case None => Some(Nil)
      case Some(b) =>
        // re-resolve dst's chain NOW (ADVICE r16): the Spark fallback's
        // diff(..., dstRef) resolves dst's tip at classification time, so
        // the driver route must classify against the same history — a dst
        // commit landing during the staging phase above would otherwise
        // be classified by one route and not the other.
        val chainNow =
          try ancestry(dstRef) catch { case _: Exception => dstChain }
        if (!chainNow.exists(_.id == b))
          throw new GraftException(
            s"merge $src into $dst: conflict base $b vanished from $dst's " +
              "ancestry mid-merge (concurrent reset/expire) — retry",
            GraftError.Expired)
        val chain = chainNow.takeWhile(_.id != b)
        // same missing-log contract as diff(): let the Spark path throw
        if (chain.exists(s => s.parentId.isDefined &&
            !assets.txLogExists(s.id))) None
        else {
          val reads = graft.storage.Store.parallelIO(
            chain.map(_.id).filter(assets.txLogExists))(
            id => assets.readTxLogRowsDriver(id))
          if (reads.exists(_.isEmpty)) None // a log too large — Spark path
          else Some(reads.flatten.flatten.distinct)
        }
    }
    val ourRefsDriver = session.changeSet.resolvedDriver(spark)
    (ourRefsDriver, theirRowsDriver) match {
      case (Some(ours), Some(theirs)) =>
        val conflicts =
          graft.vc.ConflictDetector.detectLocal(session, theirs, ours)
        if (conflicts.nonEmpty) {
          import graft.meta.GraftEncoders.editRowEnc
          val df = spark.createDataset(theirs.toVector)(editRowEnc).toDF()
          theirLog = Some(df.persist())
          solver.solve(session, theirLog.get, conflicts)
        }
      case _ =>
        // persisted: the detector scans it twice (node collect + chunk
        // semi join) and a non-trivial solver scans it again
        val theirLogDf = confBase
          .map(b => diff(VersionRef.SnapshotVer(b), dstRef))
          .getOrElse {
            import spark.implicits._
            spark.emptyDataset[EditRow].toDF()
          }.persist()
        theirLog = Some(theirLogDf)
        val conflicts = graft.vc.ConflictDetector.detect(session, theirLogDf)
        if (conflicts.nonEmpty) solver.solve(session, theirLogDf, conflicts)
    }
    phase("conflicts")
    session.mergeParent = Some(srcTip) // git's second-parent link
    session.commit(
      Option(message).getOrElse(s"merge $src into $dst"),
      properties = Map("merge.source" -> src,
        "merge.sourceSnapshot" -> srcTip, "merge.base" -> base),
      solver = solver)
    } finally {
      theirLog.foreach(_.unpersist(blocking = false))
      editsSpark.foreach(_.unpersist(blocking = false))
      stagedRelation.foreach(_.unpersist(blocking = false))
    }
  }

  /** Ancestry as a DataFrame ordered by commit recency. */
  def ancestryDf(ref: VersionRef): DataFrame = {
    import spark.implicits._
    spark.createDataset(ancestry(ref)).toDF()
  }

  def opsLog(maxEntries: Int = Int.MaxValue): Seq[OpLogEntry] =
    pointer.opsLog(maxEntries)

  /** `diff(from, to)`: union of the transaction logs on the path from
    * `from` (exclusive) to `to` (inclusive), with node paths resolved
    * (diff.rs:27-75) — a DataFrame of edit rows.
    */
  /** Fail a snapshot-id lookup precisely: kind `expired` (naming the
    * retained boundary that recorded it) when `expire` squashed the id,
    * kind `ref_not_found` otherwise (reference #2184).
    */
  private def unknownSnapshot(i: RepoInfo, id: String,
                              what: String): Nothing =
    i.expiredBoundaryOf(id) match {
      case Some(b) => throw new GraftException(
        s"$what: snapshot $id was expired (squashed beneath retained " +
          s"snapshot ${b.id})", GraftError.Expired)
      case None => throw new GraftException(
        s"$what: unknown snapshot $id", GraftError.RefNotFound)
    }

  def diff(from: VersionRef, to: VersionRef): DataFrame = {
    val fromId = resolveVersion(from)
    val toId = resolveVersion(to)
    val i = info()
    val ancestors = i.ancestry(toId)
    if (ancestors.isEmpty) unknownSnapshot(i, toId, "diff")
    // `from` must actually be on `to`'s chain — otherwise takeWhile
    // would silently consume the WHOLE chain and return a full-history
    // "diff" (the #2184 failure mode after expiration)
    if (fromId != toId && !ancestors.exists(_.id == fromId))
      unknownSnapshot(i, fromId, "diff: from is not an ancestor of to")
    val chain = ancestors.takeWhile(_.id != fromId)
    if (chain.isEmpty) {
      import spark.implicits._
      spark.emptyDataset[EditRow].toDF()
    } else {
      // every non-root chain member must still have its tx log — a
      // silently skipped log would yield a wrong (partial) diff
      chain.filter(s => s.parentId.isDefined && !assets.txLogExists(s.id))
        .foreach(s => throw new GraftException(
          s"diff: transaction log for ${s.id} is gone (expired/GC'd)",
          GraftError.Expired))
      // accumulated edit sets: distinct union (DiffBuilder, diff.rs:27-51)
      // — read as ONE multi-path scan, not one union leg per commit
      assets.readTxLogs(chain.map(_.id).filter(assets.txLogExists))
        .distinct()
    }
  }

  // ------------------------------------------------------------------
  // sessions
  // ------------------------------------------------------------------

  /** py4j exact-arity form: VersionRef is a sealed family of nested case
    * classes Python callers cannot construct directly.
    */
  def readonlySessionJ(branchName: String): Session =
    readonlySession(VersionRef.Branch(branchName))

  def readonlySession(ref: VersionRef): Session = {
    val session = new Session(this, None,
      assets.readSnapshot(resolveVersion(ref)))
    preloadManifests(session)
    session
  }

  /** Warm the driver split cache per the preload DSL (repository.rs:
    * 2027-2110): arrays matching a rule, ≤ maxRefs per split, capped at
    * `preloadMaxArrays` arrays scanned.
    */
  private def preloadManifests(session: Session): Unit =
    if (config.preloads.nonEmpty) {
      val snap = session.base
      // gather every matching (split, node) first, then warm them ALL
      // concurrently — preload is the poster-child serial-RTT chain on a
      // real object store (round-13 latency soak)
      val parts = session.nodes
        .filter(n => config.preloads.exists(_.matches(n)))
        .take(config.preloadMaxArrays)
        .flatMap { n =>
          val cap = config.preloads.filter(_.matches(n)).map(_.maxRefs).max
          snap.manifests.getOrElse(n.id, Nil)
            .filter(_.numRefs <= cap).map(m => (m, n.id))
        }
      assets.warmSplits(parts)
    }

  def writableSession(branchName: String): Session = {
    val i = info()
    if (i.statusAvailability == "read_only")
      throw new GraftException(
        s"repository is read_only" +
          Option(i.statusReason).filter(_.nonEmpty)
            .map(r => s" ($r)").getOrElse("") +
          " — set_status(online) to unlock", GraftError.ReadOnly)
    val tip = i.branches.getOrElse(branchName,
      throw new GraftException(s"no branch $branchName", GraftError.RefNotFound))
    val s = new Session(this, Some(branchName), assets.readSnapshot(tip))
    // seed the commit loop's first optimistic attempt with the info we
    // just loaded — see Session.commitImpl (saves the redundant pointer
    // reload on every uncontended interactive commit)
    s.openInfo = Some(i)
    s
  }

  /** Move-only session (`rearrange_session`, repository.rs:1992): moves
    * cannot be rebased, so they get their own session kind that refuses
    * every other edit.
    */
  def rearrangeSession(branchName: String): Session = {
    val i = info()
    val tip = i.branches.getOrElse(branchName,
      throw new GraftException(s"no branch $branchName", GraftError.RefNotFound))
    val s = new Session(this, Some(branchName), assets.readSnapshot(tip),
      moveOnly = true)
    // same open-time capture as writableSession: default-commit-metadata
    // snapshots at session OPEN, and the first CAS attempt can reuse it
    s.openInfo = Some(i)
    s
  }

  def lookupSnapshot(id: String): Snapshot = assets.readSnapshot(id)

  /** Debug rollups over the metadata relations (icechunk/src/inspect.rs):
    * one row per snapshot in the pointer with node/manifest/ref counts.
    */
  /** Shard-level manifest detail at a version: one row per (node, split)
    * with extents, ref counts, and bytes — the view compaction decisions
    * read (fragmented shards, skewed splits, stale extents).
    */
  def inspectManifests(ref: VersionRef = VersionRef.Branch("main")): DataFrame = {
    import spark.implicits._
    val snap = assets.readSnapshot(resolveVersion(ref))
    val pathOf = snap.nodes.map(n => n.id -> n.path).toMap
    val rows = snap.manifests.toSeq.flatMap { case (nid, refs) =>
      refs.map(r => (pathOf.getOrElse(nid, nid), nid, r.manifestId, r.split,
        r.emin.mkString(","), r.emax.mkString(","), r.numRefs, r.sizeBytes))
    }
    spark.createDataset(rows).toDF("path", "node_id", "manifest_id",
      "split", "extent_min", "extent_max", "n_refs", "bytes")
      .orderBy("path", "split")
  }

  def inspect(): DataFrame = {
    import spark.implicits._
    val rows = info().snapshots.map { si =>
      val snap = assets.readSnapshot(si.id)
      val refs = snap.manifests.values.flatten.toSeq
      (si.id, si.message, si.flushedAt, snap.nodes.size,
        snap.nodes.count(_.isArray), refs.size,
        refs.map(_.numRefs).sum, refs.map(_.sizeBytes).sum)
    }
    spark.createDataset(rows).toDF("snapshot_id", "message", "flushed_at",
      "n_nodes", "n_arrays", "n_manifest_splits", "n_chunk_refs", "bytes")
  }
}

/** Availability status of a repository (reference `RepoStatus`):
  * `readOnly = true` is the admin lock; `setAt`/`reason` record when and
  * why it last changed.
  */
final case class RepoStatus(readOnly: Boolean,
                            setAt: Option[Instant] = None,
                            reason: Option[String] = None)

/** [[Repository.compareRefs]] result: resolved tips, merge base, and
  * commits-beyond-base per side (git's "ahead N, behind M").
  */
final case class RefComparison(aId: String, bId: String,
                               mergeBase: Option[String],
                               ahead: Int, behind: Int)

object Repository {
  val DefaultBranch = "main"
  /** On-disk format revision (spec v2 family) — persisted in every
    * pointer generation and version-checked at open
    * ([[graft.meta.Layout.SpecVersion]] is the source of truth).
    */
  val SpecVersion: Int = graft.meta.Layout.SpecVersion

  def exists(store: Store): Boolean = new RepoPointer(store).latestGen() >= 0

  /** Opt-in tracing via Spark conf: `spark.graft.trace.path` enables the
    * JSON-lines span sink, `spark.graft.trace.otlpPath` the OTLP/JSON
    * file exporter (both set → tee), once per process (first create/open
    * wins; an already-enabled sink — e.g. a spec's MemorySink — is
    * respected).
    */
  private def maybeEnableTrace(spark: SparkSession): Unit =
    if (!graft.core.Trace.enabled) {
      val sinks = Seq(
        spark.conf.getOption("spark.graft.trace.path")
          .map(new graft.core.Trace.JsonLinesSink(_)),
        spark.conf.getOption("spark.graft.trace.otlpPath")
          .map(new graft.core.Trace.OtlpJsonSink(_))).flatten
      sinks match {
        case Nil => ()
        case Seq(one) => graft.core.Trace.enable(one)
        case many => graft.core.Trace.enable(
          new graft.core.Trace.TeeSink(many: _*))
      }
    }

  def create(store: Store, spark: SparkSession,
             config: GraftConfig = GraftConfig(),
             resolver: VirtualChunkResolver =
               VirtualChunkResolver.default): Repository = {
    if (exists(store)) throw new GraftException("repository already exists")
    maybeEnableTrace(spark)
    val repo = new Repository(store, spark, config, resolver)
    // initial snapshot: a single root group (repository.rs:208)
    val root = Snapshot(
      id = Ids.toBase32(Ids.newObjectId()),
      parentId = None,
      message = "Repository initialized",
      flushedAt = Instant.now().toString,
      nodes = Seq(NodeSpec(Ids.toBase32(Ids.newNodeId()), "/",
        NodeSpec.Group)))
    repo.assets.writeSnapshot(root)
    val info = RepoInfo(
      gen = 0L,
      branches = Map(DefaultBranch -> root.id),
      snapshots = Seq(SnapshotInfo(root.id, None, root.flushedAt,
        root.message)),
      ops = Seq(OpLogEntry(Instant.now().toString, "repo_initialized", "")),
      config = config.toMap)
    if (!repo.pointer.compareAndSwap(-1L, info))
      throw new ConflictException("lost creation race")
    repo
  }

  /** Open an existing repository. With no explicit `config`, the config
    * persisted in the repo pointer applies (the reference's stored
    * `RepositoryConfig`, repository.rs:170-220) — so split rules and
    * thresholds survive into connector- and catalog-opened sessions; an
    * explicit `config` is a runtime override and wins wholesale.
    */
  def open(store: Store, spark: SparkSession,
           config: GraftConfig = null,
           resolver: VirtualChunkResolver =
             VirtualChunkResolver.default): Repository = {
    val stored = new RepoPointer(store).load().getOrElse(
      throw new GraftException("no repository at store root"))
    maybeEnableTrace(spark)
    val cfg =
      if (config != null) config else GraftConfig.fromMap(stored.config)
    new Repository(store, spark, cfg, resolver)
  }

  def openOrCreate(store: Store, spark: SparkSession,
                   config: GraftConfig = null): Repository =
    if (exists(store)) open(store, spark, config)
    else create(store, spark, if (config == null) GraftConfig() else config)

  // ------------------------------------------------------------------
  // Java/Python-friendly factories: py4j (the PySpark gateway) cannot
  // supply Scala default arguments, so the Python quickstart
  // (docs/pyspark.md) calls these exact-arity overloads —
  //   jvm.graft.repo.Repository.create(store, spark._jsparkSession)
  // Scala callers resolve to the default-arg variants unchanged.
  // ------------------------------------------------------------------
  def create(store: Store, spark: SparkSession): Repository =
    create(store, spark, GraftConfig(), VirtualChunkResolver.default)

  def open(store: Store, spark: SparkSession): Repository =
    open(store, spark, null, VirtualChunkResolver.default)

  def openOrCreate(store: Store, spark: SparkSession): Repository =
    openOrCreate(store, spark, null)
}

/** One driver-staged merge ref row (r17 merge driver route): the exact
  * column set [[graft.repo.Session.stageChunkRefsBatch]] expects — `path`
  * plus the [[graft.meta.ChunkRef]] payload columns.
  */
final case class MergeStageRow(path: String, coord: Seq[Int], kind: String,
    inline: Array[Byte], chunk_id: String, location: String, offset: Long,
    length: Long, etag: String, last_modified: Int)
