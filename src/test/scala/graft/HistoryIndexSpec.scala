package graft

import org.apache.spark.sql.functions._
import graft.repo._
import graft.storage.Store
import graft.meta.Layout

/** The spilled snapshot index (round 12): the repo pointer keeps only the
  * most recent `snapshotIndexWindow` SnapshotInfo entries inline and
  * spills older ones to immutable `repo/seg.*` files, so commit latency
  * and pointer size are O(window), not O(history) — while every consumer
  * (ancestry, time travel, inspect, expire, push) still sees the full
  * index through hydration.
  */
class HistoryIndexSpec extends SparkTestBase {

  /** Parse the TIP pointer document raw (no hydration): what is actually
    * stored and rewritten per commit.
    */
  private def rawTip(dir: String): graft.meta.RepoInfo = {
    val repoDir = java.nio.file.Paths.get(dir, "repo")
    val st = java.nio.file.Files.list(repoDir)
    val tip =
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("r.")).min // reverse-encoded: min = latest
      } finally st.close()
    graft.meta.MetaJson.readRepoInfo(new String(java.nio.file.Files
      .readAllBytes(java.nio.file.Paths.get(dir, "repo", tip)), "UTF-8"))
  }

  test("pointer stays O(window) across deep history; ancestry and time " +
      "travel see every commit") {
    val dir = tmpDir("histrepo")
    val cfg = GraftConfig(snapshotIndexWindow = 16)
    val repo = Repository.create(Store.local(dir), spark, cfg)
    locally {
      val s = repo.writableSession("main")
      s.addArray("/a", Seq(256), Seq(4))
      s.commit("init")
    }
    val ids = (0 until 120).map { i =>
      val s = repo.writableSession("main")
      s.writeChunk("/a", Seq(i % 64), Array[Byte](i.toByte))
      s.commit(s"c$i")
    }
    // the STORED pointer carries at most 2*window inline entries — the
    // full 122-commit index would be ~4x that (the ops ring is separately
    // bounded by opsRingSize and is not under test here)
    val stored = rawTip(dir)
    assert(stored.snapshots.size <= 2 * 16,
      s"stored window is ${stored.snapshots.size} — not enforced")
    assert(stored.snapshotSegments.nonEmpty)
    // every stored generation carries the format version (ADVICE r12: an
    // unversioned pointer lets an older binary silently truncate history)
    assert(stored.specVersion == Repository.SpecVersion)
    // geometric (binary-counter) segment merging: the spilled chain stays
    // O(log history) — 122 commits at window 16 is ~6 unmerged spills,
    // but merged segments must number at most ceil(log2(spilled/window))+1
    assert(stored.snapshotSegments.size <= 4,
      s"${stored.snapshotSegments.size} segments — geometric merge not holding")
    val info = repo.info()
    assert(info.snapshotSegments.nonEmpty, "no spilled segments")
    assert(info.snapshotSegments.forall(_.startsWith(Layout.SegmentPrefix)))
    // hydration: the full index is visible and ancestry walks all of it
    assert(info.snapshots.size == 122, s"${info.snapshots.size} hydrated")
    val chain = repo.ancestry(VersionRef.Branch("main"))
    assert(chain.size == 122 && chain.head.message == "c119" &&
      chain.last.message == "Repository initialized")
    // time travel to a snapshot that lives in a SEGMENT (early commit)
    val early = ids(3)
    val ro = repo.readonlySession(VersionRef.SnapshotVer(early))
    assert(ro.getChunk("/a", Seq(3)).get.head == 3.toByte)
    // a fresh open (new pointer instance, cold segment cache) hydrates too
    val repo2 = Repository.open(Store.local(dir), spark)
    assert(repo2.ancestry(VersionRef.Branch("main")).size == 122)
    assert(repo2.info().snapshotInfo(ids.head).isDefined)
  }

  test("segment cache stays bounded over a long single-JVM commit run " +
      "and eviction never loses history (VERDICT r13)") {
    val dir = tmpDir("segcache")
    val cfg = GraftConfig(snapshotIndexWindow = 16)
    val repo = Repository.create(Store.local(dir), spark, cfg)
    // tiny bound so the 120-commit run actually evicts: every superseded
    // merged batch the geometric fold writes would otherwise stay cached
    // forever (the O(N log N) growth this pin guards against)
    repo.pointer.maxCachedSegInfos = 48
    locally {
      val s = repo.writableSession("main")
      s.addArray("/a", Seq(256), Seq(4))
      s.commit("init")
    }
    (0 until 120).foreach { i =>
      val s = repo.writableSession("main")
      s.writeChunk("/a", Seq(i % 64), Array[Byte](i.toByte))
      s.commit(s"c$i")
      val (_, infos) = repo.pointer.segCacheStats
      assert(infos <= 48, s"segment cache holds $infos infos at commit $i")
    }
    // eviction is a cache event, not a data event: hydration refetches
    // and the full index is still visible
    assert(repo.ancestry(VersionRef.Branch("main")).size == 122)
    val (entries, infos) = repo.pointer.segCacheStats
    assert(infos <= 48 && entries >= 1, s"($entries, $infos)")
  }

  test("concurrent committers race across spill boundaries without " +
      "losing history") {
    // a committer that spills a segment and WINS the CAS leaves the loser
    // holding pre-spill info; the loser's retry reloads (hydrated) and
    // re-packs — no commit and no segment reference may be lost across
    // that interleaving
    val dir = tmpDir("histrace")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(snapshotIndexWindow = 16))
    locally {
      val s = repo.writableSession("main")
      s.addArray("/a", Seq(256), Seq(4))
      s.commit("init")
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { t =>
      new Thread(() => {
        try (0 until 30).foreach { i =>
          val s = repo.writableSession("main")
          s.writeChunk("/a", Seq(t * 32 + i), Array[Byte](t.toByte, i.toByte))
          s.commit(s"t$t-c$i")
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing commits failed: ${errs.peek()}")
    // 2 + 60 commits, every one on the ancestry chain, every edit present
    assert(repo.ancestry(VersionRef.Branch("main")).size == 62)
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/a").count() == 60)
    for (t <- 0 until 2; i <- Seq(0, 13, 29))
      assert(ro.getChunk("/a", Seq(t * 32 + i)).get
        .sameElements(Array[Byte](t.toByte, i.toByte)), s"t$t i$i")
    // fresh open agrees (segments referenced by the tip all readable)
    assert(Repository.open(Store.local(dir), spark)
      .ancestry(VersionRef.Branch("main")).size == 62)
  }

  test("expire compacts the segmented index; push replicates full " +
      "ancestry; GC sweeps orphaned segments") {
    val dir = tmpDir("histexp")
    // small generation ring so the test can observe BOTH halves of the
    // segment-liveness contract: orphans stay recoverable while any
    // retained pointer generation references them, and are swept once
    // those generations age out of the ring
    val cfg = GraftConfig(snapshotIndexWindow = 16, opsRingSize = 8)
    val repo = Repository.create(Store.local(dir), spark, cfg)
    locally {
      val s = repo.writableSession("main")
      s.addArray("/a", Seq(256), Seq(4))
      s.commit("init")
    }
    (0 until 80).foreach { i =>
      val s = repo.writableSession("main")
      s.writeChunk("/a", Seq(i % 64), Array[Byte](i.toByte))
      s.commit(s"c$i")
    }
    val segsBefore = repo.info().snapshotSegments
    assert(segsBefore.nonEmpty)

    // push BEFORE expire: the replica must see the full 81-deep ancestry
    // (closure merge goes through the same pack step at the destination)
    val mirror = tmpDir("histmirror")
    graft.ops.Replicate.sync(repo, Store.local(mirror), "main")
    val replica = Repository.open(Store.local(mirror), spark)
    assert(replica.ancestry(VersionRef.Branch("main")).size == 82)

    // expire squashes everything but the tip — the filtered index breaks
    // the segment-prefix invariant and must compact correctly
    graft.ops.GC.expire(repo, java.time.Instant.now().plusSeconds(60))
    val after = repo.info()
    assert(after.snapshots.size == 1 &&
      after.snapshots.head.prunedAncestors.nonEmpty)
    assert(repo.ancestry(VersionRef.Branch("main")).size == 1)
    // ...and the expired-boundary error contract still resolves through
    // what is now a window-only index
    assert(after.expiredBoundaryOf(
      after.snapshots.head.prunedAncestors.head).isDefined)

    // GC #1: pre-expire pointer generations are still inside the ring
    // and reference the old segments — liveness is the UNION across
    // retained generations (ADVICE r12), so the orphans must SURVIVE
    // (a reader rolled back to an old generation can still hydrate)
    graft.ops.GC.garbageCollect(repo,
      java.time.Instant.now().plusSeconds(3600))
    assert(segsBefore.forall(k => repo.store.exists(k)),
      "segments referenced by retained generations were swept early")

    // advance the generation chain past the ring (cheap CAS updates),
    // then GC #2: no surviving generation references the old segments
    (0 until 2 * cfg.opsRingSize).foreach(i =>
      repo.setMetadata(Map("spin" -> org.json4s.JInt(i))))
    graft.ops.GC.garbageCollect(repo,
      java.time.Instant.now().plusSeconds(3600))
    val segKeys = repo.store.list(Layout.SegmentPrefix).map(_.key).toSet
    val live = repo.info().snapshotSegments.toSet
    assert(live.subsetOf(segKeys) || live.isEmpty)
    assert((segKeys -- live).isEmpty,
      s"orphaned segments survived GC: ${segKeys -- live}")
  }

  test("expire inside the segmented region re-tiles: intact segments are " +
      "reused by key, only the boundary gap is rewritten") {
    val dir = tmpDir("histretile")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(snapshotIndexWindow = 16))
    locally {
      val s = repo.writableSession("main")
      s.addArray("/a", Seq(256), Seq(4))
      s.commit("init")
    }
    (0 until 120).foreach { i =>
      val s = repo.writableSession("main")
      s.writeChunk("/a", Seq(i % 64), Array[Byte](i.toByte))
      s.commit(s"c$i")
    }
    val segsBefore = repo.info().snapshotSegments.toSet
    assert(segsBefore.nonEmpty)
    // cut deep inside the segmented region, retaining the newest 60
    val chain = repo.ancestry(VersionRef.Branch("main"))
    graft.ops.GC.expire(repo,
      java.time.Instant.parse(chain(59).flushedAt))
    // == 60 modulo sub-ms flushedAt ties between adjacent commits
    val kept = repo.ancestry(VersionRef.Branch("main")).size
    assert(kept >= 60 && kept <= 62, s"kept $kept")
    // the surviving middle segment(s) must be REUSED, not rewritten —
    // expire pays O(changed entries), not O(history)
    val segsAfter = repo.info().snapshotSegments.toSet
    assert(segsAfter.intersect(segsBefore).nonEmpty,
      s"no segment reuse across expire: before=$segsBefore after=$segsAfter")
    // fresh open hydrates the re-tiled chain correctly
    val reopened = Repository.open(Store.local(dir), spark)
    val rechain = reopened.ancestry(VersionRef.Branch("main"))
    assert(rechain.size == kept && rechain.head.message == "c119" &&
      rechain.last.prunedAncestors.nonEmpty)
  }

  test("a LONG-LIVED session committing repeatedly keeps the stored " +
      "pointer windowed and does not churn segments") {
    // regression (round-13 review): caching the UN-packed pointer on the
    // session after a successful CAS made every later commit of the same
    // session pack against a stale segment list — re-spilling a merged
    // segment per commit (O(commits²) bytes, one orphan per commit)
    val dir = tmpDir("histlived")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(snapshotIndexWindow = 16))
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(256), Seq(4))
    s.commit("init")
    (0 until 80).foreach { i =>
      s.writeChunk("/a", Seq(i % 64), Array[Byte](i.toByte))
      s.commit(s"c$i") // SAME session every time
    }
    val stored = rawTip(dir)
    assert(stored.snapshots.size <= 2 * 16,
      s"inline window ${stored.snapshots.size}")
    assert(stored.snapshotSegments.size <= 4,
      s"${stored.snapshotSegments.size} segments")
    // segment FILES on storage: live chain + the geometric merges'
    // bounded orphans — churn would leave ~one per commit
    val segFiles = repo.store.list(Layout.SegmentPrefix).size
    assert(segFiles <= 12, s"$segFiles segment files — per-commit churn")
    assert(repo.ancestry(VersionRef.Branch("main")).size == 82)
  }

  test("repeated expire/commit cycles keep the segment chain geometric: " +
      "tiny gap segments coalesce instead of accumulating (ADVICE r13)") {
    val dir = tmpDir("histcoalesce")
    val window = 8
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(snapshotIndexWindow = window))
    locally {
      val s = repo.writableSession("main")
      s.addArray("/a", Seq(256), Seq(4))
      s.commit("init")
    }
    def commitN(n: Int, tag: String): Unit = (0 until n).foreach { i =>
      val s = repo.writableSession("main")
      s.writeChunk("/a", Seq(i % 64), Array[Byte](i.toByte))
      s.commit(s"$tag$i")
    }
    def segSizes(): Seq[Int] = {
      val st = Store.local(dir)
      rawTip(dir).snapshotSegments.map(k =>
        graft.meta.MetaJson.readSnapshotInfos(
          new String(st.getBytes(k), "UTF-8")).size)
    }
    commitN(60, "a")
    // six expire-then-commit cycles, each cutting a bit deeper into the
    // segmented region — the workload the advisor flagged as eroding the
    // O(log n) chain via un-merged mid-chain gap segments
    (0 until 6).foreach { c =>
      val chain = repo.ancestry(VersionRef.Branch("main"))
      graft.ops.GC.expire(repo,
        java.time.Instant.parse(chain(chain.size - 8).flushedAt))
      commitN(10, s"x$c")
    }
    val sizes = segSizes()
    // geometric shape: bounded count, and no pile of sub-window shards —
    // the re-tile absorbs any intact sub-window segment into its gap
    // write, so at most the freshest boundary + trailing gap stay small
    assert(sizes.count(_ < window) <= 2,
      s"sub-window segments accumulating: $sizes")
    assert(sizes.size <= 6, s"segment chain not geometric: $sizes")
    // and the history is intact after all the churn
    val reopened = Repository.open(Store.local(dir), spark)
    assert(reopened.ancestry(VersionRef.Branch("main")).nonEmpty)
    assert(reopened.info().snapshots.size ==
      repo.info().snapshots.size)
  }

  test("expire re-tiling races concurrent committers: no post-cutoff " +
      "commit lost, tip always hydratable") {
    // expire's re-tile pack (round 13) writes gap segments and reuses
    // old ones while committers append-pack the same index through the
    // same CAS chain — every interleaving must retain every commit at
    // or after the cutoff and leave a tip whose segment chain hydrates
    val dir = tmpDir("histexprace")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(snapshotIndexWindow = 16))
    locally {
      val s = repo.writableSession("main")
      s.addArray("/a", Seq(256), Seq(4))
      s.commit("init")
    }
    (0 until 80).foreach { i =>
      val s = repo.writableSession("main")
      s.writeChunk("/a", Seq(i % 64), Array[Byte](i.toByte))
      s.commit(s"pre$i")
    }
    // cutoff inside the segmented region, fixed before the race starts
    val cutoff = java.time.Instant.parse(
      repo.ancestry(VersionRef.Branch("main"))(39).flushedAt)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val committer = new Thread(() => {
      try (0 until 20).foreach { i =>
        val s = repo.writableSession("main")
        // coords 36..55: each written exactly once during the race, and
        // the racing writes land AFTER the pre-commits that touched them
        s.writeChunk("/a", Seq(36 + i), Array[Byte](7, i.toByte))
        s.commit(s"race$i")
      } catch { case t: Throwable => errs.add(t) }
    })
    val expirer = new Thread(() => {
      try {
        Thread.sleep(30)
        graft.ops.GC.expire(repo, cutoff)
      } catch { case t: Throwable => errs.add(t) }
    })
    committer.start(); expirer.start()
    committer.join(); expirer.join()
    assert(errs.isEmpty, s"race failed: ${errs.peek()}")
    // every post-cutoff and every raced commit is still on the chain
    val chain = repo.ancestry(VersionRef.Branch("main"))
    val msgs = chain.map(_.message).toSet
    (0 until 20).foreach(i => assert(msgs.contains(s"race$i"), s"race$i lost"))
    (40 until 80).foreach(i => assert(msgs.contains(s"pre$i"), s"pre$i lost"))
    // a fresh open (cold segment cache) hydrates the re-tiled chain
    val reopened = Repository.open(Store.local(dir), spark)
    assert(reopened.ancestry(VersionRef.Branch("main")).size == chain.size)
    // raced edits readable at the tip
    val ro = reopened.readonlySession(VersionRef.Branch("main"))
    assert(ro.getChunk("/a", Seq(43)).get
      .sameElements(Array[Byte](7, 7)))
  }

  test("open refuses a pointer written by a NEWER format version, loudly") {
    val dir = tmpDir("histver")
    val store = Store.local(dir)
    val repo = Repository.create(store, spark)
    val tip = repo.info()
    // a future binary lands generation N+1 with a format this one does
    // not understand
    val future = tip.copy(gen = tip.gen + 1,
      specVersion = Repository.SpecVersion + 1)
    store.putBytes(Layout.pointerKey(future.gen),
      graft.meta.MetaJson.writeRepoInfo(future).getBytes("UTF-8"))
    val e = intercept[GraftException] {
      Repository.open(Store.local(dir), spark).info()
    }
    assert(e.kind == GraftError.UnsupportedFormat, s"kind=${e.kind}")
    assert(e.getMessage.contains("newer than this library"))
  }
}
