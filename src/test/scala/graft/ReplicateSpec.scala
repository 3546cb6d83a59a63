package graft

import graft.ops.Replicate
import graft.repo.{GraftError, GraftException, Repository, VersionRef}
import graft.storage.Store

/** Closure-aware branch replication between stores: full push, incremental
  * re-push, fast-forward discipline, tag push.
  */
class ReplicateSpec extends SparkTestBase {

  private def bigChunk(fill: Byte): Array[Byte] = Array.fill(1024)(fill)

  test("push a branch into an empty store; replica reads identically") {
    val src = Repository.create(Store.local(tmpDir("rep-src")), spark)
    val s = src.writableSession("main")
    s.addArray("/a", Seq(8), Seq(2))
    s.writeChunk("/a", Seq(0), bigChunk(1)) // > inline threshold
    s.writeChunk("/a", Seq(1), bigChunk(2))
    s.commit("first")
    val s2 = src.writableSession("main")
    s2.writeChunk("/a", Seq(2), bigChunk(3))
    val tip = s2.commit("second")

    val dstStore = Store.local(tmpDir("rep-dst"))
    val sum = Replicate.sync(src, dstStore, "main")
    assert(sum.snapshotId == tip)
    assert(sum.snapshotsCopied >= 3) // root + 2 commits
    assert(sum.chunksCopied == 3 && sum.chunksSkipped == 0)
    assert(sum.chunkBytesCopied == 3 * 1024)

    val dst = Repository.open(dstStore, spark)
    assert(dst.lookupBranch("main").contains(tip))
    val ro = dst.readonlySession(VersionRef.Branch("main"))
    assert(ro.getChunk("/a", Seq(0)).get.head == 1)
    assert(ro.getChunk("/a", Seq(2)).get.head == 3)
    // history replicated: ancestry messages match the source
    assert(dst.ancestry(VersionRef.Branch("main")).map(_.message) ==
      src.ancestry(VersionRef.Branch("main")).map(_.message))
    // time travel on the replica works (tx logs + old manifests present)
    val anc = dst.ancestry(VersionRef.Branch("main"))
    val prev = dst.readonlySession(VersionRef.SnapshotVer(anc(1).id))
    assert(prev.getChunk("/a", Seq(2)).isEmpty)
  }

  test("incremental re-push copies only the delta; unchanged push is a no-op") {
    val src = Repository.create(Store.local(tmpDir("rep-src2")), spark)
    val s = src.writableSession("main")
    s.addArray("/a", Seq(8), Seq(2))
    s.writeChunk("/a", Seq(0), bigChunk(1))
    s.commit("first")
    val dstStore = Store.local(tmpDir("rep-dst2"))
    val first = Replicate.sync(src, dstStore, "main")
    assert(first.chunksCopied == 1)

    val s2 = src.writableSession("main")
    s2.writeChunk("/a", Seq(1), bigChunk(2))
    val tip2 = s2.commit("second")
    val second = Replicate.sync(src, dstStore, "main")
    assert(second.snapshotId == tip2)
    assert(second.snapshotsCopied == 1, second.toString) // just the new one
    assert(second.chunksCopied == 1 && second.chunksSkipped == 1)

    val third = Replicate.sync(src, dstStore, "main")
    assert(third.snapshotsCopied == 0 && third.chunksCopied == 0 &&
      third.chunksSkipped == 2)
    assert(Repository.open(dstStore, spark).lookupBranch("main")
      .contains(tip2))
  }

  test("diverged destination branch refuses without force; force resets") {
    val src = Repository.create(Store.local(tmpDir("rep-src3")), spark)
    val s = src.writableSession("main")
    s.addArray("/a", Seq(4), Seq(2))
    s.writeChunk("/a", Seq(0), bigChunk(1))
    s.commit("src c1")
    val dstStore = Store.local(tmpDir("rep-dst3"))
    Replicate.sync(src, dstStore, "main")

    // destination advances on its own → divergence
    val dst = Repository.open(dstStore, spark)
    val ds = dst.writableSession("main")
    ds.writeChunk("/a", Seq(1), bigChunk(9))
    ds.commit("dst-only commit")

    val s2 = src.writableSession("main")
    s2.writeChunk("/a", Seq(1), bigChunk(2))
    val tip2 = s2.commit("src c2")
    val ex = intercept[GraftException] {
      Replicate.sync(src, dstStore, "main")
    }
    assert(ex.kind == GraftError.Conflict)
    // force wins: branch resets to the pushed tip
    val sum = Replicate.sync(src, dstStore, "main", force = true)
    assert(sum.snapshotId == tip2)
    assert(Repository.open(dstStore, spark).lookupBranch("main")
      .contains(tip2))
  }

  test("shallow push (depth=1): complete current state, bounded history") {
    val src = Repository.create(Store.local(tmpDir("rep-sh")), spark)
    val s = src.writableSession("main")
    s.addArray("/a", Seq(8), Seq(2))
    s.writeChunk("/a", Seq(0), bigChunk(1))
    s.commit("c1")
    val s2 = src.writableSession("main")
    s2.writeChunk("/a", Seq(1), bigChunk(2))
    val tip = s2.commit("c2")

    val dstStore = Store.local(tmpDir("rep-shd"))
    val sum = Replicate.sync(src, dstStore, "main", depth = 1)
    assert(sum.snapshotsCopied == 1 && sum.snapshotId == tip)
    // the tip's manifests describe the FULL state: both chunks present
    assert(sum.chunksCopied == 2)
    val dst = Repository.open(dstStore, spark)
    val ro = dst.readonlySession(VersionRef.Branch("main"))
    assert(ro.getChunk("/a", Seq(0)).get.head == 1)
    assert(ro.getChunk("/a", Seq(1)).get.head == 2)
    // history is shallow: the ancestry walk ends at the shipped horizon
    assert(dst.ancestry(VersionRef.Branch("main")).map(_.message) ==
      Seq("c2"))
    // deepening later: a full push backfills the missing history
    Replicate.sync(src, dstStore, "main")
    assert(Repository.open(dstStore, spark)
      .ancestry(VersionRef.Branch("main")).map(_.message) ==
      Seq("c2", "c1", "Repository initialized"))
  }

  test("push races a concurrent destination commit: both land, neither lost") {
    val src = Repository.create(Store.local(tmpDir("rep-src5")), spark)
    val s = src.writableSession("main")
    s.addArray("/a", Seq(4), Seq(2))
    s.writeChunk("/a", Seq(0), bigChunk(1))
    val tip = s.commit("src c1")
    val dstStore = Store.local(tmpDir("rep-dst5"))
    Replicate.sync(src, dstStore, "main", dstRef = "mirror")
    val dst = Repository.open(dstStore, spark)

    // destination commits on its own branch while a second push lands a
    // new src tip on "mirror" — the push's CAS loop must merge, not
    // clobber, the concurrent pointer update
    val s2 = src.writableSession("main")
    s2.writeChunk("/a", Seq(1), bigChunk(2))
    val tip2 = s2.commit("src c2")
    import java.util.concurrent.Executors
    import scala.concurrent._
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val fPush = Future { Replicate.sync(src, dstStore, "main", dstRef = "mirror") }
    val fLocal = Future {
      dst.createBranch("local", tip)
      val ds = dst.writableSession("local")
      ds.writeChunk("/a", Seq(0), bigChunk(7))
      ds.commit("dst local work")
    }
    Await.result(fPush, 120.seconds)
    val localTip = Await.result(fLocal, 120.seconds)
    pool.shutdown()
    val after = Repository.open(dstStore, spark)
    assert(after.lookupBranch("mirror").contains(tip2))
    assert(after.lookupBranch("local").contains(localTip))
    assert(after.readonlySession(VersionRef.Branch("local"))
      .getChunk("/a", Seq(0)).get.head == 7)
    assert(after.readonlySession(VersionRef.Branch("mirror"))
      .getChunk("/a", Seq(1)).get.head == 2)
  }

  test("cross-backend push: local repo replicates onto an S3-protocol store") {
    import graft.storage.S3StoreConf
    val src = Repository.create(Store.local(tmpDir("rep-x")), spark)
    val s = src.writableSession("main")
    s.addArray("/a", Seq(4), Seq(2))
    s.writeChunk("/a", Seq(0), bigChunk(5))
    val tip = s.commit("to the cloud")
    val server = new graft.storage.s3.S3MemServer
    server.createBucket("mirror")
    val s3 = Store.s3(S3StoreConf(server.endpoint, "us-east-1", "mirror",
      prefix = "repo", accessKey = "k", secretKey = "s"))
    try {
      val sum = Replicate.sync(src, s3, "main")
      assert(sum.snapshotId == tip && sum.chunksCopied == 1)
      val dst = Repository.open(s3, spark)
      assert(dst.lookupBranch("main").contains(tip))
      assert(dst.readonlySession(VersionRef.Branch("main"))
        .getChunk("/a", Seq(0)).get.head == 5)
      // incremental against the remote: one HEAD per chunk, zero copies
      val again = Replicate.sync(src, s3, "main")
      assert(again.chunksCopied == 0 && again.chunksSkipped == 1)
    } finally server.stop()
  }

  test("s3->s3 same-endpoint push copies chunk payloads SERVER-SIDE") {
    import graft.storage.S3StoreConf
    val server = new graft.storage.s3.S3MemServer
    server.createBucket("a")
    server.createBucket("b")
    val srcStore = Store.s3(S3StoreConf(server.endpoint, "us-east-1", "a",
      prefix = "repo", accessKey = "k", secretKey = "s"))
    val dstStore = Store.s3(S3StoreConf(server.endpoint, "us-east-1", "b",
      prefix = "repo", accessKey = "k", secretKey = "s"))
    try {
      val src = Repository.create(srcStore, spark)
      val s = src.writableSession("main")
      s.addArray("/a", Seq(8), Seq(2))
      s.writeChunk("/a", Seq(0), bigChunk(1))
      s.writeChunk("/a", Seq(1), bigChunk(2))
      val tip = s.commit("two chunks")

      val copiesBefore = server.opCount("copy")
      val sum = Replicate.sync(src, dstStore, "main")
      assert(sum.snapshotId == tip && sum.chunksCopied == 2)
      // the payloads moved via x-amz-copy-source (service-internal), not
      // through the executor: at 100 TB this is the difference between a
      // metadata walk and re-reading the whole repo through the client
      assert(server.opCount("copy") >= copiesBefore + 2,
        s"expected server-side copies, got ${server.opCount("copy")}")
      // and the size accounting survived the no-GET route (one HEAD each)
      assert(sum.chunkBytesCopied == 2 * 1024)

      val dst = Repository.open(dstStore, spark)
      assert(dst.lookupBranch("main").contains(tip))
      assert(dst.readonlySession(VersionRef.Branch("main"))
        .getChunk("/a", Seq(1)).get.head == 2)
      // incremental: HEAD-skip, zero further copies
      val again = Replicate.sync(src, dstStore, "main")
      assert(again.chunksCopied == 0 && again.chunksSkipped == 2)
    } finally server.stop()
  }

  test("existsVia=list: one distributed destination listing replaces " +
      "per-chunk HEADs; counts and contents unchanged") {
    import graft.storage.S3StoreConf
    val server = new graft.storage.s3.S3MemServer
    server.createBucket("la"); server.createBucket("lb")
    val srcStore = Store.s3(S3StoreConf(server.endpoint, "us-east-1", "la",
      prefix = "repo", accessKey = "k", secretKey = "s"))
    val dstStore = Store.s3(S3StoreConf(server.endpoint, "us-east-1", "lb",
      prefix = "repo", accessKey = "k", secretKey = "s"))
    try {
      val src = Repository.create(srcStore, spark)
      val s = src.writableSession("main")
      s.addArray("/a", Seq(16), Seq(2))
      (0 until 8).foreach(c => s.writeChunk("/a", Seq(c),
        bigChunk((c + 1).toByte)))
      val tip = s.commit("eight chunks")

      val first = Replicate.sync(src, dstStore, "main", existsVia = "list")
      assert(first.snapshotId == tip && first.chunksCopied == 8 &&
        first.chunksSkipped == 0)

      // incremental: one more chunk, re-push in list mode — the chunk
      // stage must not HEAD the 8 existing chunk objects (the listing
      // anti-join resolves presence in bulk)
      val s2 = src.writableSession("main")
      s2.updateArray("/a", Seq(18), Seq(2))
      s2.writeChunk("/a", Seq(8), bigChunk(99.toByte))
      s2.commit("ninth")
      val second = Replicate.sync(src, dstStore, "main",
        existsVia = "list")
      assert(second.chunksCopied == 1 && second.chunksSkipped == 8,
        second.toString)

      val ro = Repository.open(dstStore, spark)
        .readonlySession(VersionRef.Branch("main"))
      (0 until 8).foreach(c =>
        assert(ro.getChunk("/a", Seq(c)).get.head == (c + 1).toByte))
      assert(ro.getChunk("/a", Seq(8)).get.head == 99.toByte)

      // the HEAD economics, measured: a no-op re-push in each mode on
      // identical state — head mode probes every chunk id, list mode
      // replaces exactly those 9 probes with prefix LIST pages (the
      // metadata-walk HEADs are common to both)
      val h0 = server.opCount("head")
      val headMode = Replicate.sync(src, dstStore, "main",
        existsVia = "head")
      val headModeHeads = server.opCount("head") - h0
      assert(headMode.chunksCopied == 0 && headMode.chunksSkipped == 9)
      val h1 = server.opCount("head")
      val l0 = server.opCount("list")
      val listMode = Replicate.sync(src, dstStore, "main",
        existsVia = "list")
      val listModeHeads = server.opCount("head") - h1
      assert(listMode.chunksCopied == 0 && listMode.chunksSkipped == 9)
      assert(headModeHeads - listModeHeads >= 9,
        s"list mode saved only ${headModeHeads - listModeHeads} HEADs " +
          s"(head-mode $headModeHeads, list-mode $listModeHeads)")
      assert(server.opCount("list") > l0, "list mode never LISTed")

      // auto mode at a tiny closure keeps the HEAD path (threshold)
      val third = Replicate.sync(src, dstStore, "main")
      assert(third.chunksCopied == 0 && third.chunksSkipped == 9)
    } finally server.stop()
  }

  test("gcs->gcs and azure->azure pushes also copy payloads server-side") {
    import graft.storage.{AzureStoreConf, GcsStoreConf}
    // GCS: two buckets behind one JSON-API endpoint
    locally {
      val server = new graft.storage.gcs.GcsMemServer
      server.createBucket("ga"); server.createBucket("gb")
      val srcStore = GcsStoreConf(server.endpoint, "ga",
        prefix = "repo", bearerToken = "t").open()
      val dstStore = GcsStoreConf(server.endpoint, "gb",
        prefix = "repo", bearerToken = "t").open()
      try {
        val src = Repository.create(srcStore, spark)
        val s = src.writableSession("main")
        s.addArray("/a", Seq(4), Seq(2))
        s.writeChunk("/a", Seq(0), bigChunk(3))
        val tip = s.commit("gcs chunk")
        val before = server.opCount("copy")
        val sum = Replicate.sync(src, dstStore, "main")
        assert(sum.snapshotId == tip && sum.chunksCopied == 1)
        assert(server.opCount("copy") >= before + 1,
          s"expected server-side gcs copy, got ${server.opCount("copy")}")
        assert(Repository.open(dstStore, spark)
          .readonlySession(VersionRef.Branch("main"))
          .getChunk("/a", Seq(0)).get.head == 3)
      } finally server.stop()
    }
    // Azure: two containers behind one account endpoint
    locally {
      val server = new graft.storage.az.AzureMemServer
      server.createContainer("aa"); server.createContainer("ab")
      val srcStore = AzureStoreConf(server.endpoint, "acct",
        "aa", prefix = "repo").open()
      val dstStore = AzureStoreConf(server.endpoint, "acct",
        "ab", prefix = "repo").open()
      try {
        val src = Repository.create(srcStore, spark)
        val s = src.writableSession("main")
        s.addArray("/a", Seq(4), Seq(2))
        s.writeChunk("/a", Seq(0), bigChunk(4))
        val tip = s.commit("azure chunk")
        val before = server.opCount("copy")
        val sum = Replicate.sync(src, dstStore, "main")
        assert(sum.snapshotId == tip && sum.chunksCopied == 1)
        assert(server.opCount("copy") >= before + 1,
          s"expected server-side azure copy, got ${server.opCount("copy")}")
        assert(Repository.open(dstStore, spark)
          .readonlySession(VersionRef.Branch("main"))
          .getChunk("/a", Seq(0)).get.head == 4)
      } finally server.stop()
    }
  }

  test("Transfer conformance: every backend pair copies, skips, and " +
      "round-trips bytes") {
    import graft.storage.{AzureStoreConf, GcsStoreConf, S3StoreConf}
    val s3 = new graft.storage.s3.S3MemServer
    val gcs = new graft.storage.gcs.GcsMemServer
    val az = new graft.storage.az.AzureMemServer
    s3.createBucket("t"); gcs.createBucket("t"); az.createContainer("t")
    try {
      // one store per backend family; pairs cover kernel-copy,
      // server-side (same endpoint would need two buckets — covered by
      // the push tests), and every generic cross-backend fallback
      val stores = Seq(
        "local" -> Store.local(tmpDir("tc-local")),
        "s3" -> Store.s3(S3StoreConf(s3.endpoint, "us-east-1", "t",
          prefix = "a", accessKey = "k", secretKey = "s")),
        "gcs" -> GcsStoreConf(gcs.endpoint, "t", prefix = "g",
          bearerToken = "t").open(),
        "az" -> AzureStoreConf(az.endpoint, "acct", "t",
          prefix = "z").open())
      val payload = Array.tabulate(3000)(i => (i * 31).toByte)
      for ((sn, src) <- stores; (dn, dst) <- stores if sn != dn) {
        val key = s"chunks/X$sn$dn"
        src.putBytes(key, payload)
        assert(graft.storage.Transfer.copyIfAbsent(src, dst, key)
          .contains(payload.length.toLong), s"$sn->$dn copy")
        assert(java.util.Arrays.equals(dst.getBytes(key), payload),
          s"$sn->$dn bytes")
        assert(graft.storage.Transfer.copyIfAbsent(src, dst, key).isEmpty,
          s"$sn->$dn re-copy must skip")
        // precheck=false keeps if-absent semantics on the generic route
        // (atomic conditional put) — never a corrupting overwrite
        graft.storage.Transfer.copyIfAbsent(src, dst, key,
          precheck = false)
        assert(java.util.Arrays.equals(dst.getBytes(key), payload),
          s"$sn->$dn precheck=false bytes")
      }
    } finally { s3.stop(); gcs.stop(); az.stop() }
  }

  test("Transfer.copyIfAbsent: local kernel route honors if-absent + size") {
    val a = Store.local(tmpDir("tr-a"))
    val b = Store.local(tmpDir("tr-b"))
    a.putBytes("chunks/x", Array.fill(2048)(7.toByte))
    assert(graft.storage.Transfer.copyIfAbsent(a, b, "chunks/x")
      .contains(2048L))
    assert(java.util.Arrays.equals(b.getBytes("chunks/x"),
      a.getBytes("chunks/x")))
    // second transfer is a skip (None), not an overwrite
    assert(graft.storage.Transfer.copyIfAbsent(a, b, "chunks/x").isEmpty)
  }

  test("tag push lands the tag and a readable closure; unknown ref refused") {
    val src = Repository.create(Store.local(tmpDir("rep-src4")), spark)
    val s = src.writableSession("main")
    s.addArray("/a", Seq(4), Seq(2))
    s.writeChunk("/a", Seq(0), bigChunk(7))
    val c1 = s.commit("tagged content")
    src.createTag("v1", c1)

    val dstStore = Store.local(tmpDir("rep-dst4"))
    val sum = Replicate.sync(src, dstStore, "v1")
    assert(sum.snapshotId == c1)
    val dst = Repository.open(dstStore, spark)
    val ro = dst.readonlySession(VersionRef.Tag("v1"))
    assert(ro.getChunk("/a", Seq(0)).get.head == 7)

    val ex = intercept[GraftException] {
      Replicate.sync(src, dstStore, "nope")
    }
    assert(ex.kind == GraftError.RefNotFound)
  }
}
