package graft

import org.apache.spark.sql.functions._
import graft.repo._
import graft.storage.Store
import graft.functions.ChunkCodec

/** Value-plane snapshot diff: only chunks whose REFS differ are fetched
  * and decoded (cost scales with the change, not the array), and the
  * cell-level output reports old/new values with fill semantics for
  * chunks present on one side only.
  */
class ValueDiffSpec extends SparkTestBase {

  private def chunkBytes(base: Int): Array[Byte] =
    ChunkCodec.encodeLongs(Array.tabulate(20)(j => (base + j).toLong),
      "int64")

  test("valueDiff reads only changed chunks and reports cell deltas") {
    val dir = tmpDir("vdiff")
    val repo = Repository.create(Store.local(dir), spark, GraftConfig())
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(8, 10), Seq(4, 5))
    // 4 chunks; cell value = 100*c0 + 10*c1 + in-chunk pos
    for (c0 <- 0 to 1; c1 <- 0 to 1)
      s.writeChunk("/a", Seq(c0, c1), chunkBytes(100 * c0 + 10 * c1))
    val v1 = s.commit("v1")

    val s2 = repo.writableSession("main")
    s2.writeChunk("/a", Seq(1, 1), chunkBytes(5000)) // rewritten
    s2.deleteChunk("/a", Seq(0, 1))                  // dropped
    s2.commit("v2")

    val oldS = repo.readonlySession(VersionRef.SnapshotVer(v1))
    val newS = repo.readonlySession(VersionRef.Branch("main"))

    // metadata prune: exactly the two touched chunks survive the join
    val changed = graft.tensor.TensorPlane
      .changedChunkRefs(oldS, newS, "/a").collect()
    assert(changed.map(_.getSeq[Int](0)).toSet ==
      Set(Seq(0, 1), Seq(1, 1)), changed.mkString(","))

    val diff = graft.tensor.TensorPlane
      .valueDiff(oldS, newS, "/a", "int64")
      .orderBy("i0", "i1").collect()
    // 20 cells rewritten + 20 cells now reading fill(0)
    assert(diff.length == 40)
    diff.foreach { r =>
      val (i0, i1) = (r.getLong(0), r.getLong(1))
      val c0 = (i0 / 4).toInt
      val c1 = (i1 / 5).toInt
      val pos = (i0 % 4) * 5 + (i1 % 5)
      val oldExp = 100 * c0 + 10 * c1 + pos
      assert(r.getLong(2) == oldExp, s"old at ($i0,$i1)")
      val newExp = if (c0 == 1 && c1 == 1) 5000 + pos else 0L
      assert(r.getLong(3) == newExp, s"new at ($i0,$i1)")
    }

    // identical versions diff to empty without decoding anything
    assert(graft.tensor.TensorPlane
      .valueDiff(newS, newS, "/a", "int64").count() == 0)
  }

  test("grid mismatch is refused; growth diffs the grown region") {
    val dir = tmpDir("vdiff2")
    val repo = Repository.create(Store.local(dir), spark, GraftConfig())
    val s = repo.writableSession("main")
    s.addArray("/g", Seq(4, 5), Seq(4, 5))
    s.writeChunk("/g", Seq(0, 0), chunkBytes(0))
    val v1 = s.commit("v1")
    val s2 = repo.writableSession("main")
    s2.updateArray("/g", Seq(8, 5), Seq(4, 5)) // append_dim growth
    s2.writeChunk("/g", Seq(1, 0), chunkBytes(7000))
    s2.commit("v2")
    val oldS = repo.readonlySession(VersionRef.SnapshotVer(v1))
    val newS = repo.readonlySession(VersionRef.Branch("main"))
    val diff = graft.tensor.TensorPlane.valueDiff(oldS, newS, "/g", "int64")
    // the appended chunk's 20 cells: old side reads fill
    assert(diff.count() == 20)
    assert(diff.agg(min("old_value"), max("old_value")).head()
      .getLong(0) == 0L)
    assert(diff.agg(min("new_value")).head().getLong(0) == 7000L)
  }

  test("a one-cell patch diffs to exactly one row (cell-level kernel)") {
    val dir = tmpDir("vdiff3")
    val repo = Repository.create(Store.local(dir), spark, GraftConfig())
    val s = repo.writableSession("main")
    s.addArray("/p", Seq(8, 10), Seq(4, 5))
    for (c0 <- 0 to 1; c1 <- 0 to 1)
      s.writeChunk("/p", Seq(c0, c1), chunkBytes(100 * c0 + 10 * c1))
    val v1 = s.commit("v1")
    // rewrite ONE chunk changing ONE cell (pos 7 -> local (1,2))
    val s2 = repo.writableSession("main")
    val edited = Array.tabulate(20)(j => (100 + j).toLong)
    edited(7) = -42L
    s2.writeChunk("/p", Seq(1, 0),
      ChunkCodec.encodeLongs(edited, "int64"))
    s2.commit("patch")
    val diff = graft.tensor.TensorPlane.valueDiff(
      repo.readonlySession(VersionRef.SnapshotVer(v1)),
      repo.readonlySession(VersionRef.Branch("main")), "/p", "int64")
      .collect()
    // not 20-cells-filtered: the kernel emits the single differing cell
    assert(diff.length == 1)
    val r = diff.head
    assert(r.getLong(0) == 5 && r.getLong(1) == 2) // global (4+1, 0+2)
    assert(r.getLong(2) == 107 && r.getLong(3) == -42)
  }
}
