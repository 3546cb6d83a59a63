package graft

import java.time.Instant
import graft.repo._
import graft.storage.{ScheduledStore, Store}

/** Crash-consistency soak (round 13): abort a writer at EVERY mutating
  * store-operation boundary inside multi-file operations — commit (with
  * and without a segment spill), push, expire, GC — then reopen the repo
  * from raw storage and assert the write-once discipline held:
  *
  *   1. the repo still opens and fsck is green for the branch tip;
  *   2. the branch tip equals the pre-op state (the CAS generation PUT is
  *      the single commit point and is always the LAST mutating op — a
  *      crash anywhere in the protocol leaves no torn state visible);
  *   3. an age-guard-expired GC sweeps whatever the crash orphaned,
  *      converging storage back to exactly the live object set.
  *
  * The reference exercises the same discipline through flaky-connection
  * tests (`test_flaky_connections.rs`) and its write-once object layout;
  * here the [[ScheduledStore]] gate gives deterministic single-op crash
  * seeding instead of probabilistic fault injection. The crash is an
  * `Error`, not an `Exception`: protocol-level recovery (CAS read-back,
  * transient retry) legitimately catches exceptions — a crash is the
  * writer DYING, which no catch block in the process models away.
  *
  * Scope note: Spark-path manifest/tx-log writes go through Spark's own
  * committer (temp + rename) on a `file:`/`graft:` URI and are not gated
  * here; the driver-side fast path and every metadata-plane object ARE.
  */
class CrashConsistencySpec extends SparkTestBase {

  private class InjectedCrash extends Error("injected crash")

  /** Store whose Nth mutating operation dies BEFORE executing (N is
    * 1-based; -1 = never). Read ops pass through untouched.
    */
  private def crashingStore(raw: Store, crashAt: Int): (Store, () => Int) = {
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val mutating = Set("putBytes", "putIfAbsent", "delete", "deletePrefix",
      "copy")
    val gated = new ScheduledStore(raw, (op, _) =>
      if (mutating.contains(op) && seen.incrementAndGet() == crashAt)
        throw new InjectedCrash)
    (gated, () => seen.get())
  }

  /** Chunk payloads above the 512 B inline threshold, so commits write
    * real chunk blobs and crashes can orphan them.
    */
  private def blob(tag: Int): Array[Byte] = Array.fill(600)(tag.toByte)

  private def buildRepo(dir: String): Repository = {
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(snapshotIndexWindow = 16, opsRingSize = 4))
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(64), Seq(4))
    s.commit("init")
    (0 until 6).foreach { i =>
      val w = repo.writableSession("main")
      w.writeChunk("/a", Seq(i), blob(i))
      w.commit(s"c$i")
    }
    repo
  }

  private def causes(t: Throwable): Seq[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq

  /** Post-crash invariants: open from raw storage, fsck green, tip is
    * the pre-op tip, then an aggressive GC converges chunk storage to
    * exactly the live set.
    */
  private def assertConsistent(dir: String, preTip: String): Unit = {
    val reopened = Repository.open(Store.local(dir), spark)
    assert(reopened.lookupBranch("main").contains(preTip),
      "tip moved despite the crashed writer never reaching its CAS")
    assert(graft.ops.Integrity.check(reopened, "main").isEmpty,
      "fsck found problems after crash")
    graft.ops.GC.garbageCollect(reopened, Instant.now().plusSeconds(3600))
    val after = Repository.open(Store.local(dir), spark)
    assert(graft.ops.Integrity.check(after, "main").isEmpty,
      "fsck found problems after GC")
    val liveChunkIds = {
      val info = after.info()
      val snaps = (info.branches.values ++ info.tags.values).toSet
        .flatMap((id: String) => info.ancestry(id).map(_.id))
      snaps.flatMap { sid =>
        val snap = after.assets.readSnapshot(sid)
        val arrays = snap.nodes.filter(_.isArray).map(_.id)
        if (arrays.isEmpty) Set.empty[String]
        else after.assets.committedRefs(snap, arrays)
          .filter(org.apache.spark.sql.functions.col("kind") ===
            graft.meta.ChunkRef.KindRef)
          .select("chunk_id").distinct()
          .collect().map(_.getString(0)).toSet
      }
    }
    val storedChunks = after.store.list("chunks/")
      .map(_.key.stripPrefix("chunks/")).toSet
    assert(storedChunks == liveChunkIds,
      s"storage did not converge after GC — orphans: " +
        s"${storedChunks -- liveChunkIds}, missing: " +
        s"${liveChunkIds -- storedChunks}")
  }

  /** Run `op` with a crash seeded at every mutating-op index it
    * performs; returns the number of crash points exercised.
    */
  private def crashEverywhere(label: String)(
      build: String => Repository)(op: Repository => Unit): Int = {
    // discovery run: count the op's mutating store operations
    val probeDir = tmpDir(s"crash-$label-probe")
    build(probeDir)
    val (probeStore, probeCount) = crashingStore(Store.local(probeDir), -1)
    op(Repository.open(probeStore, spark))
    val total = probeCount()
    assert(total > 0, s"$label performed no mutating store ops")

    (1 to total).foreach { n =>
      val dir = tmpDir(s"crash-$label-$n")
      val repo = build(dir)
      val preTip = repo.lookupBranch("main").get
      val (store, _) = crashingStore(Store.local(dir), n)
      val crashed =
        try { op(Repository.open(store, spark)); false }
        catch { case t: Throwable
            if causes(t).exists(_.isInstanceOf[InjectedCrash]) => true }
      assert(crashed, s"$label crash point $n/$total did not interrupt " +
        "the op — something caught the injected Error")
      assertConsistent(dir, preTip)
    }
    total
  }

  test("commit survives a crash at every mutating store operation") {
    val points = crashEverywhere("commit")(buildRepo) { r =>
      val s = r.writableSession("main")
      s.writeChunk("/a", Seq(9), blob(9))
      s.commit("crash-target")
    }
    // at least: chunk blob, manifest shard, snapshot, tx log, CAS
    assert(points >= 4, s"expected >=4 crash points in commit, saw $points")
  }

  test("commit across a segment-spill boundary survives every crash point") {
    def build(dir: String): Repository = {
      val repo = Repository.create(Store.local(dir), spark,
        GraftConfig(snapshotIndexWindow = 16, opsRingSize = 4))
      val s = repo.writableSession("main")
      s.addArray("/a", Seq(64), Seq(4))
      s.commit("init")
      // push the inline index right to the 2x-window boundary so the
      // measured commit triggers the segment spill write
      (0 until 31).foreach { i =>
        val w = repo.writableSession("main")
        w.writeChunk("/a", Seq(i % 16), Array[Byte](i.toByte))
        w.commit(s"fill $i")
      }
      repo
    }
    crashEverywhere("spill")(build) { r =>
      val s = r.writableSession("main")
      s.writeChunk("/a", Seq(5), blob(5))
      s.commit("spill-crosser")
    }
  }

  test("expire survives a crash at every mutating store operation") {
    crashEverywhere("expire")(buildRepo) { r =>
      graft.ops.GC.expire(r, Instant.now().plusSeconds(60))
    }
  }

  test("GC survives a crash at every mutating store operation") {
    def build(dir: String): Repository = {
      val repo = buildRepo(dir)
      // create garbage: reset the branch back one commit
      val chain = repo.ancestry(VersionRef.Branch("main"))
      repo.resetBranch("main", chain(1).id)
      repo
    }
    crashEverywhere("gc")(build) { r =>
      graft.ops.GC.garbageCollect(r, Instant.now().plusSeconds(3600))
    }
  }

  test("push (replicate) survives a crash at every destination store op") {
    // crash the DESTINATION writer: sync must be restartable and the
    // replica must never expose a half-copied tip
    val srcDir = tmpDir("crash-push-src")
    val src = buildRepo(srcDir)
    val probeDst = tmpDir("crash-push-probe")
    val (probeStore, probeCount) = crashingStore(Store.local(probeDst), -1)
    graft.ops.Replicate.sync(src, probeStore, "main")
    val total = probeCount()
    assert(total >= 5, s"expected >=5 push crash points, saw $total")
    (1 to total).foreach { n =>
      val dstDir = tmpDir(s"crash-push-$n")
      val (dst, _) = crashingStore(Store.local(dstDir), n)
      val crashed =
        try { graft.ops.Replicate.sync(src, dst, "main"); false }
        catch { case t: Throwable
            if causes(t).exists(_.isInstanceOf[InjectedCrash]) => true }
      if (crashed && Repository.exists(Store.local(dstDir))) {
        // half-pushed replica with a tip: must already be CONSISTENT
        val replica = Repository.open(Store.local(dstDir), spark)
        replica.lookupBranch("main").foreach { _ =>
          assert(graft.ops.Integrity.check(replica, "main").isEmpty,
            s"push crash point $n left an inconsistent replica")
        }
      }
      // restart converges (write-once objects make re-push idempotent)
      graft.ops.Replicate.sync(src, Store.local(dstDir), "main")
      val replica = Repository.open(Store.local(dstDir), spark)
      assert(replica.ancestry(VersionRef.Branch("main")).size ==
        src.ancestry(VersionRef.Branch("main")).size)
      assert(graft.ops.Integrity.check(replica, "main").isEmpty)
    }
  }
}
