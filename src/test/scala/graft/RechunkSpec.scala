package graft

import org.apache.spark.sql.functions._
import graft.functions.ChunkCodec
import graft.repo._
import graft.storage.Store
import graft.tensor.TensorPlane

/** Distributed rechunk: change an array's chunk grid with block copies —
  * values must be identical on the new grid, refs fully rewritten, and
  * the old grid's chunk objects left for GC (not deleted in place).
  */
class RechunkSpec extends SparkTestBase {

  private def valueMap(session: Session, path: String, dtype: String,
                       compression: String = "raw")
      : Map[Seq[Long], Double] =
    TensorPlane.values(session, path, dtype, compression).collect().map { r =>
      val n = r.length - 1
      (Seq.tabulate(n)(i => r.getLong(i)),
        r.get(n) match { case l: Long => l.toDouble; case d: Double => d })
    }.toMap

  test("1-D rechunk preserves values incl. ragged edge chunks") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(23), Seq(5)) // 5 chunks, last ragged (3 cells)
    for (c <- 0 until 5) {
      val vals = Array.tabulate(5)(i => (c * 5 + i) * 3L)
      s.writeChunk("/a", Seq(c), ChunkCodec.encodeLongs(vals, "int64"))
    }
    s.commit("init")

    val before = valueMap(
      repo.readonlySession(VersionRef.Branch("main")), "/a", "int64")
    assert(before.size == 23)

    val rs = repo.writableSession("main")
    TensorPlane.rechunk(rs, "/a", Seq(7), "int64") // 4 chunks, last ragged
    rs.commit("rechunk to 7")

    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.node("/a").get.chunkShape == Seq(7L))
    val coords = ro.refs("/a").select("coord").collect()
      .map(_.getSeq[Int](0)).toSet
    assert(coords == Set(Seq(0), Seq(1), Seq(2), Seq(3)))
    assert(valueMap(ro, "/a", "int64") == before)
  }

  test("3-D rechunk across both coarser and finer dims") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    // 8x6x10, chunks 2x3x5 -> 4x2x2x grid (16 chunks)
    s.addArray("/c", Seq(8, 6, 10), Seq(2, 3, 5))
    val cells = 2 * 3 * 5
    var n = 0
    for (c0 <- 0 until 4; c1 <- 0 until 2; c2 <- 0 until 2) {
      val vals = Array.tabulate(cells)(i => (n * cells + i).toLong)
      s.writeChunk("/c", Seq(c0, c1, c2),
        ChunkCodec.encodeLongs(vals, "int64"))
      n += 1
    }
    s.commit("init")
    val before = valueMap(
      repo.readonlySession(VersionRef.Branch("main")), "/c", "int64")
    assert(before.size == 480)

    // coarser on dim0 (2->4), finer on dim2 (5->2), ragged dim1 (3->4)
    val rs = repo.writableSession("main")
    TensorPlane.rechunk(rs, "/c", Seq(4, 4, 2), "int64")
    rs.commit("regrid")

    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(valueMap(ro, "/c", "int64") == before)
    assert(ro.refs("/c").count() == 2 * 2 * 5) // ceil(8/4)*ceil(6/4)*ceil(10/2)
  }

  test("float64 + zstd: payloads re-encode under the array's codec") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/f", Seq(12), Seq(4))
    for (c <- 0 until 3) {
      val vals = Array.tabulate(4)(i => (c * 4 + i) * 0.25)
      s.writeChunk("/f", Seq(c), ChunkCodec.compress(
        ChunkCodec.encodeDoubles(vals, "float64"), "zstd"))
    }
    s.commit("init")
    val before = valueMap(
      repo.readonlySession(VersionRef.Branch("main")), "/f", "float64",
      "zstd")

    val rs = repo.writableSession("main")
    TensorPlane.rechunk(rs, "/f", Seq(6), "float64", "zstd")
    rs.commit("regrid")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(valueMap(ro, "/f", "float64", "zstd") == before)
    // decoded via the declared codec end to end
    val st = TensorPlane.arrayStats(ro, "/f", "float64", "zstd").head()
    assert(st.getAs[Long]("n") == 12)
  }

  test("sparse arrays stay sparse: missing source chunks produce no dst") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/sp", Seq(40), Seq(4)) // 10 chunks, write only 2 far apart
    s.writeChunk("/sp", Seq(0),
      ChunkCodec.encodeLongs(Array.tabulate(4)(_ + 1L), "int64"))
    s.writeChunk("/sp", Seq(9),
      ChunkCodec.encodeLongs(Array.tabulate(4)(_ + 100L), "int64"))
    s.commit("sparse")

    val rs = repo.writableSession("main")
    TensorPlane.rechunk(rs, "/sp", Seq(8), "int64") // 5 dst chunks
    rs.commit("regrid")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val coords = ro.refs("/sp").select("coord").collect()
      .map(_.getSeq[Int](0).head).toSet
    assert(coords == Set(0, 4)) // only dst chunks with a present source
    val vals = valueMap(ro, "/sp", "int64")
    assert(vals(Seq(1L)) == 2.0 && vals(Seq(38L)) == 102.0)
    // absent regions read as fill through the dst chunk's zero padding
    assert(vals(Seq(5L)) == 0.0)
  }

  test("rechunk composes with the changeset: uncommitted writes included") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/m", Seq(8), Seq(4))
    s.writeChunk("/m", Seq(0),
      ChunkCodec.encodeLongs(Array.tabulate(4)(_ + 1L), "int64"))
    s.commit("base")

    val rs = repo.writableSession("main")
    // in-session write overlays the committed state, then rechunk
    rs.writeChunk("/m", Seq(1),
      ChunkCodec.encodeLongs(Array.tabulate(4)(_ + 50L), "int64"))
    TensorPlane.rechunk(rs, "/m", Seq(8), "int64")
    rs.commit("regrid")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/m").count() == 1)
    val vals = valueMap(ro, "/m", "int64")
    assert(vals(Seq(0L)) == 1.0 && vals(Seq(4L)) == 50.0)
  }

  test("guards: rank mismatches rejected; same-grid rechunk is a no-op") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/ok", Seq(10), Seq(5))
    val rank = intercept[GraftException] {
      TensorPlane.rechunk(s, "/ok", Seq(5, 5), "int64") // rank mismatch
    }
    assert(rank.kind == GraftError.InvalidConfig)
    // no-op rechunk leaves the session without chunk changes
    TensorPlane.rechunk(s, "/ok", Seq(5), "int64")
  }

  test("rectilinear source converts to a regular grid (one-way door)") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    // uneven 4+6 split; values v(i) = i * 2
    s.addArrayRectilinear("/r", Seq(10), Seq(Seq(4L, 6L)))
    s.writeChunk("/r", Seq(0),
      ChunkCodec.encodeLongs(Array.tabulate(4)(i => i * 2L), "int64"))
    s.writeChunk("/r", Seq(1),
      ChunkCodec.encodeLongs(Array.tabulate(6)(i => (4 + i) * 2L),
        "int64"))
    s.commit("rect")
    val before = valueMap(
      repo.readonlySession(VersionRef.Branch("main")), "/r", "int64")
    assert(before.size == 10)

    val rs = repo.writableSession("main")
    TensorPlane.rechunk(rs, "/r", Seq(5), "int64")
    rs.commit("to regular")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val n = ro.node("/r").get
    assert(!n.isRectilinear && n.chunkShape == Seq(5L))
    assert(valueMap(ro, "/r", "int64") == before)
    // the full regular-grid feature set now applies, e.g. region reads
    val st = TensorPlane.sliceStats(ro, "/r", "int64", Seq((2L, 7L)))
      .head()
    assert(st.getAs[Long]("n") == 5)
    assert(st.getAs[Double]("sum") == (2 until 7).map(_ * 2).sum.toDouble)
    // 2-D rectilinear with ragged coverage
    val s2 = repo.writableSession("main")
    s2.addArrayRectilinear("/r2", Seq(5, 7), Seq(Seq(2L, 3L), Seq(4L, 3L)))
    var v = 0L
    for (c0 <- 0 until 2; c1 <- 0 until 2) {
      val cells = (if (c0 == 0) 2 else 3) * (if (c1 == 0) 4 else 3)
      s2.writeChunk("/r2", Seq(c0, c1), ChunkCodec.encodeLongs(
        Array.tabulate(cells)(i => c0 * 1000L + c1 * 100 + i), "int64"))
    }
    s2.commit("rect2")
    val before2 = valueMap(
      repo.readonlySession(VersionRef.Branch("main")), "/r2", "int64")
    assert(before2.size == 35)
    val rs2 = repo.writableSession("main")
    TensorPlane.rechunk(rs2, "/r2", Seq(3, 3), "int64")
    rs2.commit("to regular 2d")
    val ro2 = repo.readonlySession(VersionRef.Branch("main"))
    assert(valueMap(ro2, "/r2", "int64") == before2)
  }

  test("old-grid chunk objects survive for time travel; GC reclaims them") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/g", Seq(8), Seq(4))
    for (c <- 0 until 2)
      s.writeChunk("/g", Seq(c),
        ChunkCodec.encodeLongs(Array.tabulate(4)(i => c * 4L + i), "int64"))
    s.commit("v1")
    val v1 = repo.readonlySession(VersionRef.Branch("main")).base.id

    val rs = repo.writableSession("main")
    TensorPlane.rechunk(rs, "/g", Seq(8), "int64")
    rs.commit("v2")

    // time travel to the pre-rechunk snapshot still decodes on the old grid
    val old = repo.readonlySession(VersionRef.SnapshotVer(v1))
    assert(old.node("/g").get.chunkShape == Seq(4L))
    assert(valueMap(old, "/g", "int64").size == 8)
  }
}
