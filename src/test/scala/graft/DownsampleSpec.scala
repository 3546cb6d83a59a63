package graft

import org.apache.spark.sql.functions._
import graft.functions.ChunkCodec
import graft.repo._
import graft.storage.Store
import graft.tensor.TensorPlane

/** Multiscale downsampling: mean / stride pyramid levels built from the
  * per-chunk partial kernel (rows scale with the destination volume).
  */
class DownsampleSpec extends SparkTestBase {

  private def valueMap(s: Session, path: String, dtype: String)
      : Map[Seq[Long], Double] =
    TensorPlane.values(s, path, dtype).collect().map { r =>
      val n = r.length - 1
      (Seq.tabulate(n)(i => r.getLong(i)),
        r.get(n) match { case l: Long => l.toDouble; case d: Double => d })
    }.toMap

  test("1-D mean: blocks average across chunk boundaries; ragged tail") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(10), Seq(5)) // factor 4 blocks straddle chunks
    for (c <- 0 until 2)
      s.writeChunk("/a", Seq(c), ChunkCodec.encodeLongs(
        Array.tabulate(5)(i => c * 5L + i), "int64"))
    s.commit("src")
    val w = repo.writableSession("main")
    TensorPlane.downsample(w, "/a", "/a2", Seq(4), "int64")
    w.commit("level 1")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.node("/a2").get.shape == Seq(3L))
    val v = valueMap(ro, "/a2", "float64")
    // [0..3] -> 1.5, [4..7] -> 5.5 (spans both chunks), [8..9] -> 8.5
    assert(v == Map(Seq(0L) -> 1.5, Seq(1L) -> 5.5, Seq(2L) -> 8.5))
  }

  test("2-D mean and stride agree with the exploded oracle") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/g", Seq(6, 8), Seq(3, 4)) // 4 chunks
    var n = 0
    for (c0 <- 0 until 2; c1 <- 0 until 2) {
      s.writeChunk("/g", Seq(c0, c1), ChunkCodec.encodeLongs(
        Array.tabulate(12)(i => n * 100L + i), "int64"))
      n += 1
    }
    s.commit("src")
    val w = repo.writableSession("main")
    TensorPlane.downsample(w, "/g", "/g_mean", Seq(2, 2), "int64")
    TensorPlane.downsample(w, "/g", "/g_str", Seq(2, 2), "int64",
      mode = "stride")
    w.commit("levels")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val src = valueMap(ro, "/g", "int64")
    val mean = valueMap(ro, "/g_mean", "float64")
    val str = valueMap(ro, "/g_str", "int64")
    assert(mean.size == 3 * 4 && str.size == 3 * 4)
    for (d0 <- 0L until 3L; d1 <- 0L until 4L) {
      val block = for {
        g0 <- (d0 * 2) until math.min(d0 * 2 + 2, 6)
        g1 <- (d1 * 2) until math.min(d1 * 2 + 2, 8)
      } yield src(Seq(g0, g1))
      assert(math.abs(mean(Seq(d0, d1)) - block.sum / block.size) < 1e-9,
        s"mean at ($d0,$d1)")
      assert(str(Seq(d0, d1)) == src(Seq(d0 * 2, d1 * 2)),
        s"stride at ($d0,$d1)")
    }
  }

  test("sparse sources: absent regions don't bias the mean") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/sp", Seq(16), Seq(4)) // chunks 1,2 absent
    s.writeChunk("/sp", Seq(0),
      ChunkCodec.encodeLongs(Array.fill(4)(10L), "int64"))
    s.writeChunk("/sp", Seq(3),
      ChunkCodec.encodeLongs(Array.fill(4)(30L), "int64"))
    s.commit("src")
    val w = repo.writableSession("main")
    TensorPlane.downsample(w, "/sp", "/sp2", Seq(8), "int64")
    w.commit("level")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val v = valueMap(ro, "/sp2", "float64")
    // dst cell 0: only chunk 0's 4 cells exist -> mean 10 (not 5)
    assert(v(Seq(0L)) == 10.0)
    assert(v(Seq(1L)) == 30.0)
  }

  test("guards: rank mismatch is refused; rect sources downsample " +
      "(level grid derives from the largest chunk)") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/x", Seq(8), Seq(4))
    val e = intercept[GraftException] {
      TensorPlane.downsample(s, "/x", "/y", Seq(2, 2), "int64")
    }
    assert(e.kind == GraftError.InvalidConfig)
    // rectilinear sources are supported (cell-exact coverage in
    // RectilinearSpec); the level's regular chunk derives from the
    // source's MEDIAN chunk length: median(4,6)=6 (upper), 6/2 = 3
    s.addArrayRectilinear("/r", Seq(10), Seq(Seq(4L, 6L)),
      userData = """{"dtype":"int64"}""")
    TensorPlane.downsample(s, "/r", "/r2", Seq(2), "int64")
    assert(s.node("/r2").get.shape == Seq(5L))
    assert(s.node("/r2").get.chunkShape == Seq(3L))
    // one outlier-huge source chunk must NOT inflate the default dest
    // chunk: median(2,2,2,2,100)=2 -> dest chunk 2/2 = 1 (max would
    // have picked 50)
    s.addArrayRectilinear("/o", Seq(108), Seq(Seq(2L, 2L, 2L, 2L, 100L)),
      userData = """{"dtype":"int64"}""")
    TensorPlane.downsample(s, "/o", "/o2", Seq(2), "int64")
    assert(s.node("/o2").get.chunkShape == Seq(1L))
  }
}
