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
    val cfg = GraftConfig(snapshotIndexWindow = 16)
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

    // GC (age-guarded) sweeps the segments the compaction orphaned
    graft.ops.GC.garbageCollect(repo,
      java.time.Instant.now().plusSeconds(3600))
    val segKeys = repo.store.list(Layout.SegmentPrefix).map(_.key).toSet
    val live = repo.info().snapshotSegments.toSet
    assert(live.subsetOf(segKeys) || live.isEmpty)
    assert((segKeys -- live).isEmpty,
      s"orphaned segments survived GC: ${segKeys -- live}")
  }
}
