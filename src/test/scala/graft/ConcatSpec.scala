package graft

import org.apache.spark.sql.functions._
import graft.repo.{GraftError, GraftException, Repository, VersionRef}
import graft.storage.Store
import graft.tensor.TensorPlane

/** Zero-copy concatenation: coordinate-shifted ref staging, chunk-object
  * sharing, alignment refusals.
  */
class ConcatSpec extends SparkTestBase {
  private def enc(vals: Array[Long]) =
    graft.functions.ChunkCodec.encodeLongs(vals, "int64")

  test("1-D concat: values line up and chunk objects are shared") {
    val repo = Repository.create(Store.local(tmpDir("cc-1d")), spark)
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(256), Seq(128))
    s.writeChunk("/a", Seq(0), enc(Array.tabulate(128)(i => i.toLong)))
    s.writeChunk("/a", Seq(1), enc(Array.tabulate(128)(i => 128L + i)))
    s.addArray("/b", Seq(200), Seq(128)) // ragged last chunk
    s.writeChunk("/b", Seq(0), enc(Array.tabulate(128)(i => 1000L + i)))
    s.writeChunk("/b", Seq(1), enc(Array.tabulate(128)(i =>
      if (i < 72) 1128L + i else -1L)))
    s.commit("init")
    val t = repo.writableSession("main")
    TensorPlane.concat(t, Seq("/a", "/b"), "/ab", axis = 0, "int64")
    t.commit("concat")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.node("/ab").get.shape == Seq(456L))
    val got = TensorPlane.values(ro, "/ab", "int64")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 456)
    (0 until 256).foreach(i => assert(got(i.toLong) == i.toLong))
    (0 until 200).foreach(i => assert(got(256L + i) == 1000L + i))
    // zero-copy: the dst refs are the union of source chunk ids
    val srcIds = (ro.refs("/a").select("chunk_id").collect() ++
      ro.refs("/b").select("chunk_id").collect()).map(_.getString(0)).sorted
    val dstIds = ro.refs("/ab").select("chunk_id").collect()
      .map(_.getString(0)).sorted
    assert(srcIds.toSeq == dstIds.toSeq)
  }

  test("2-D concat along axis 1; misaligned middle source refused") {
    val repo = Repository.create(Store.local(tmpDir("cc-2d")), spark)
    val s = repo.writableSession("main")
    s.addArray("/x", Seq(4, 8), Seq(4, 4))
    for (cj <- 0 until 2)
      s.writeChunk("/x", Seq(0, cj), enc(Array.tabulate(16) { k =>
        (k / 4) * 100L + cj * 4 + k % 4 }))
    s.addArray("/y", Seq(4, 6), Seq(4, 4)) // 6 % 4 != 0 but it is LAST
    s.writeChunk("/y", Seq(0, 0), enc(Array.tabulate(16) { k =>
      5000L + (k / 4) * 100L + k % 4 }))
    s.writeChunk("/y", Seq(0, 1), enc(Array.tabulate(16) { k =>
      if (k % 4 < 2) 5000L + (k / 4) * 100L + 4 + k % 4 else -1L }))
    s.commit("init")
    val t = repo.writableSession("main")
    TensorPlane.concat(t, Seq("/x", "/y"), "/xy", axis = 1, "int64")
    t.commit("concat")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.node("/xy").get.shape == Seq(4L, 14L))
    val got = TensorPlane.values(ro, "/xy", "int64")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == 4 * 14)
    for (i <- 0 until 4; j <- 0 until 8)
      assert(got((i, j)) == i * 100L + j)
    for (i <- 0 until 4; j <- 0 until 6)
      assert(got((i, 8L + j)) == 5000L + i * 100L + j)

    // /y first would need mid-chunk splits — refused, nothing written
    val w = repo.writableSession("main")
    val ex = intercept[GraftException] {
      TensorPlane.concat(w, Seq("/y", "/x"), "/bad", axis = 1, "int64")
    }
    assert(ex.kind == GraftError.InvalidConfig)
    // off-axis mismatch refused too: (4,8) ++ (4,6) along axis 0
    val ex2 = intercept[GraftException] {
      TensorPlane.concat(w, Seq("/x", "/y"), "/bad2", axis = 0, "int64")
    }
    assert(ex2.kind == GraftError.InvalidConfig)
  }
}
