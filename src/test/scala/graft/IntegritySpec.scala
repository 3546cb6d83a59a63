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
}
