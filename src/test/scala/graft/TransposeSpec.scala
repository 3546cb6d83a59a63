package graft

import org.apache.spark.sql.functions._
import graft.repo.{GraftError, GraftException, Repository, VersionRef}
import graft.storage.Store
import graft.tensor.TensorPlane

/** Axis-permutation (transpose) job: value correctness with ragged edge
  * chunks, round-trip through an inverse permutation, the zero-copy
  * identity path, and sparse preservation.
  */
class TransposeSpec extends SparkTestBase {

  private def enc(vals: Array[Long]) =
    graft.functions.ChunkCodec.encodeLongs(vals, "int64")

  test("2-D transpose: every cell lands at the permuted index (ragged edges)") {
    val repo = Repository.create(Store.local(tmpDir("tr-2d")), spark)
    val s = repo.writableSession("main")
    // 10x6, chunks 4x4 -> ragged in both dims
    s.addArray("/a", Seq(10, 6), Seq(4, 4))
    // buffers are row-major over the FULL chunk shape; cells beyond the
    // array bounds are junk the reader filters
    for (ci <- 0 until 3; cj <- 0 until 2) {
      val vals = Array.tabulate(16) { k =>
        val i = ci * 4 + k / 4; val j = cj * 4 + k % 4
        if (i < 10 && j < 6) i * 100L + j else -1L
      }
      s.writeChunk("/a", Seq(ci, cj), enc(vals))
    }
    s.commit("init")
    val t = repo.writableSession("main")
    TensorPlane.transpose(t, "/a", "/at", Seq(1, 0), "int64")
    t.commit("transpose")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.node("/at").get.shape == Seq(6L, 10L))
    assert(ro.node("/at").get.chunkShape == Seq(4L, 4L))
    val got = TensorPlane.values(ro, "/at", "int64")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == 60)
    for (i <- 0 until 10; j <- 0 until 6)
      assert(got((j, i)) == i * 100L + j, s"cell ($j,$i)")
  }

  test("3-D transpose round-trips through the inverse permutation") {
    val repo = Repository.create(Store.local(tmpDir("tr-3d")), spark)
    val s = repo.writableSession("main")
    s.addArray("/v", Seq(6, 5, 7), Seq(3, 2, 4), Seq("t", "y", "x"))
    for (c0 <- 0 until 2; c1 <- 0 until 3; c2 <- 0 until 2) {
      // full-chunk-shape buffers (3x2x4); out-of-bounds cells junk
      val vals = Array.tabulate(3 * 2 * 4) { k =>
        val i0 = c0 * 3 + k / 8
        val i1 = c1 * 2 + (k / 4) % 2
        val i2 = c2 * 4 + k % 4
        if (i0 < 6 && i1 < 5 && i2 < 7) i0 * 10000L + i1 * 100L + i2
        else -1L
      }
      s.writeChunk("/v", Seq(c0, c1, c2), enc(vals))
    }
    s.commit("init")
    val t = repo.writableSession("main")
    TensorPlane.transpose(t, "/v", "/vp", Seq(2, 0, 1), "int64")
    t.commit("perm")
    val t2 = repo.writableSession("main")
    TensorPlane.transpose(t2, "/vp", "/vback", Seq(1, 2, 0), "int64")
    t2.commit("inverse")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.node("/vp").get.shape == Seq(7L, 6L, 5L))
    assert(ro.node("/vp").get.dimNames == Seq("x", "t", "y"))
    val orig = TensorPlane.values(ro, "/v", "int64").orderBy("i0", "i1", "i2")
      .collect().map(_.toString).toSeq
    val back = TensorPlane.values(ro, "/vback", "int64")
      .orderBy("i0", "i1", "i2").collect().map(_.toString).toSeq
    assert(orig == back && orig.size == 6 * 5 * 7)
    // spot-check the permuted array directly
    val p = TensorPlane.values(ro, "/vp", "int64")
      .filter(col("i0") === 6 && col("i1") === 5 && col("i2") === 4)
      .head().getLong(3)
    assert(p == 5 * 10000L + 4 * 100L + 6) // vp(x,t,y) = v(t,y,x)
  }

  test("identity transpose is zero-copy: chunk objects are shared") {
    val repo = Repository.create(Store.local(tmpDir("tr-id")), spark)
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(256), Seq(128)) // 1 KiB chunks > inline threshold
    s.writeChunk("/a", Seq(0), enc(Array.tabulate(128)(_.toLong)))
    s.writeChunk("/a", Seq(1), enc(Array.tabulate(128)(i => 100L + i)))
    s.commit("init")
    val t = repo.writableSession("main")
    TensorPlane.transpose(t, "/a", "/alias", Seq(0), "int64")
    t.commit("alias")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val a = ro.refs("/a").select("coord", "kind", "chunk_id")
      .collect().map(_.toString).sorted.toSeq
    val b = ro.refs("/alias").select("coord", "kind", "chunk_id")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.forall(_.contains("ref")),
      "identity transpose must reference the same chunk objects")
  }

  test("sparse chunks stay absent; bad permutations are refused") {
    val repo = Repository.create(Store.local(tmpDir("tr-sp")), spark)
    val s = repo.writableSession("main")
    s.addArray("/sp", Seq(8, 8), Seq(4, 4))
    s.writeChunk("/sp", Seq(0, 1), enc(Array.fill(16)(5L)))
    s.commit("init")
    val t = repo.writableSession("main")
    TensorPlane.transpose(t, "/sp", "/spt", Seq(1, 0), "int64")
    t.commit("t")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/spt").count() == 1)
    assert(ro.getChunkRef("/spt", Seq(1, 0)).isDefined)
    assert(ro.getChunkRef("/spt", Seq(0, 1)).isEmpty)
    val w = repo.writableSession("main")
    val ex = intercept[GraftException] {
      TensorPlane.transpose(w, "/sp", "/bad", Seq(0, 0), "int64")
    }
    assert(ex.kind == GraftError.InvalidConfig)
  }
}
