package graft

import java.nio.file.{Files, Paths}

import graft.ops.Integrity
import graft.repo.{Repository, VersionRef}
import graft.storage.Store

/** fsck: a healthy repo reports nothing; deleted/truncated chunk objects
  * and missing snapshots/manifests surface as exactly the damaged ids.
  */
class IntegritySpec extends SparkTestBase {

  private def buildRepo(dir: String): Repository = {
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(8), Seq(2))
    (0 until 4).foreach(c =>
      s.writeChunk("/a", Seq(c), Array.fill(1024)((c + 1).toByte)))
    s.commit("data")
    repo
  }

  test("healthy repo fscks clean") {
    val repo = buildRepo(tmpDir("fsck-ok"))
    assert(Integrity.check(repo, "main").count() == 0)
  }

  /** Virtual-heavy coverage: the location relation stays distributed —
    * [[graft.repo.Session.virtualChunkLocationsDF]] is the lazy surface
    * (millions of distinct source files at 100 TB must never collect to
    * the driver), the Seq API delegates, and fsck's container-coverage
    * check consumes the relation without materializing it.
    */
  test("many distinct virtual locations: DF surface, Seq delegation, fsck coverage") {
    val ext = tmpDir("fsck-ext")
    (0 until 500).foreach { i =>
      Files.write(Paths.get(ext, s"f$i.bin"), Array.fill(16)(i.toByte))
    }
    val resolver = graft.virt.VirtualChunkResolver("file://" + ext)
    val repo = Repository.create(Store.local(tmpDir("fsck-virt")), spark,
      graft.repo.GraftConfig(), resolver)
    val s = repo.writableSession("main")
    s.addArray("/v", Seq(500), Seq(1))
    (0 until 500).foreach(i =>
      s.setVirtualRef("/v", Seq(i), s"file://$ext/f$i.bin", 0, 16))
    s.commit("virtual refs")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    // the DataFrame variant is lazy and distinct
    val df = ro.virtualChunkLocationsDF()
    assert(df.columns.toSeq == Seq("location"))
    assert(df.count() == 500)
    // Seq API delegates (sorted), with its documented size caveat
    val seq = ro.allVirtualChunkLocations()
    assert(seq.size == 500 && seq == seq.sorted)
    assert(seq.head == s"file://$ext/f0.bin")
    // fsck coverage over the same relation: healthy with the container
    // registered, every location surfaced when it is not
    assert(Integrity.check(repo, "main", checkVirtual = true).count() == 0)
    val bare = Repository.open(Store.local(repo.store.rootUri
      .stripPrefix("file:")), spark,
      resolver = new graft.virt.VirtualChunkResolver(Nil))
    val problems = Integrity.check(bare, "main")
    assert(problems.filter("kind = 'unmatched_virtual'").count() == 500)
    // a container that MATCHES but carries neither credentials nor a
    // no-credential sentinel is coverage-refused too (#2194)
    val unauth = Repository.open(Store.local(repo.store.rootUri
      .stripPrefix("file:")), spark,
      resolver = new graft.virt.VirtualChunkResolver(Seq(
        graft.virt.VirtualChunkContainer("file://" + ext, "ext"))))
    val p2 = Integrity.check(unauth, "main")
      .filter("kind = 'unmatched_virtual'")
    assert(p2.count() == 500)
    // the detail column truncates at 120 chars and the tmp path length
    // varies per run — assert on the early refusal phrase
    assert(p2.head().getString(2).contains("has no credentials"))
  }

  test("deleted and truncated chunks surface as exactly those ids") {
    val dir = tmpDir("fsck-bad")
    val repo = buildRepo(dir)
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val ids = ro.refs("/a").orderBy("coord")
      .select("chunk_id").collect().map(_.getString(0))
    // delete chunk 0's object, truncate chunk 2's to 10 bytes
    Files.delete(Paths.get(dir, "chunks", ids(0)))
    Files.write(Paths.get(dir, "chunks", ids(2)), Array.fill(10)(0.toByte))
    val problems = Integrity.check(repo, "main")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(problems == Set(
      ("missing_chunk", ids(0)), ("short_chunk", ids(2))))
  }

  test("a swept snapshot file surfaces as missing_snapshot") {
    val dir = tmpDir("fsck-snap")
    val repo = buildRepo(dir)
    val tip = repo.lookupBranch("main").get
    Files.delete(Paths.get(dir, "snapshots", s"$tip.json"))
    val kinds = Integrity.check(repo, "main")
      .collect().map(_.getString(0)).toSet
    assert(kinds.contains("missing_snapshot"))
  }

  test("unknown ref is refused with ref_not_found") {
    val repo = buildRepo(tmpDir("fsck-ref"))
    val ex = intercept[graft.repo.GraftException] {
      Integrity.check(repo, "nope")
    }
    assert(ex.kind == graft.repo.GraftError.RefNotFound)
  }

  test("a manifest shard with duplicate coordinates fails loudly instead " +
      "of silently collapsing (torn-writer corruption)") {
    // ADVICE r12: the coord-keyed split map would silently repair-by-drop
    // a duplicated coordinate on the merge and lookup paths
    import graft.meta.{ChunkRef, DriverParquet, ManifestRef}
    val dir = tmpDir("fsck-dup")
    val repo = buildRepo(dir)
    val dup = ChunkRef.nativeRef("nodeX", Seq(3), "AAAA", 0L, 4L)
    val other = ChunkRef.nativeRef("nodeX", Seq(3), "BBBB", 0L, 4L)
    repo.store.putBytes(
      "manifests/dupm/node_id=nodeX/split=0/part-00000-driver.zstd.parquet",
      DriverParquet.writeChunkRefs(Seq(dup, other)))
    val mref = ManifestRef("dupm", 0, Seq(3), Seq(3), 2L, 8L)
    val ex = intercept[graft.repo.GraftException] {
      repo.assets.lookupRef(mref, "nodeX", Seq(3))
    }
    assert(ex.kind == graft.repo.GraftError.Storage &&
      ex.getMessage.contains("duplicate chunk coordinates"))
  }
}
