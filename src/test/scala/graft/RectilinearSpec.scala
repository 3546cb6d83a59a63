package graft

import org.apache.spark.sql.functions._
import graft.functions.ChunkCodec
import graft.repo._
import graft.storage.Store
import graft.tensor.TensorPlane
import graft.zarr.ZarrStore

/** Rectilinear chunk grids (store.rs:1158-1241): explicit chunk lengths
  * per dim, variable extents in the value plane, reindex/shift guard
  * (design-docs/018).
  */
class RectilinearSpec extends SparkTestBase {

  test("1-D rectilinear: variable chunk extents decode to correct indices") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    // dim of 10 tiled as [3, 5, 2]
    s.addArrayRectilinear("/r", Seq(10), Seq(Seq(3L, 5L, 2L)))
    s.writeChunk("/r", Seq(0), ChunkCodec.encodeLongs(Array(0L, 1, 2), "int64"))
    s.writeChunk("/r", Seq(1), ChunkCodec.encodeLongs(Array(3L, 4, 5, 6, 7), "int64"))
    s.writeChunk("/r", Seq(2), ChunkCodec.encodeLongs(Array(8L, 9), "int64"))
    s.commit("rect")

    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val v = TensorPlane.values(ro, "/r", "int64")
    assert(v.count() == 10)
    // value == global index by construction: exact identity check
    assert(v.filter(col("i0") =!= col("value")).count() == 0)
    // coord bounds respect the rectilinear grid (3 chunks, not 10/x)
    intercept[GraftException](
      repo.writableSession("main").writeChunk("/r", Seq(3), Array[Byte](1)))
    // reindex/shift guard
    intercept[GraftException](
      repo.writableSession("main").shiftArray("/r", Seq(1)))
  }

  test("rectilinear distributed values write round-trips through both read paths") {
    import org.apache.spark.sql.functions.expr
    val dir = tmpDir("repo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    // 2-D: rows tiled [2,3], cols tiled [4,2]
    s.addArrayRectilinear("/w", Seq(5, 6), Seq(Seq(2L, 3L), Seq(4L, 2L)),
      userData = """{"dtype":"int64"}""")
    val df = spark.range(30).select(
      expr("id div 6").as("i0"), expr("id % 6").as("i1"),
      (col("id") * 3 - 7).as("value"))
    TensorPlane.writeValues(s, "/w", df, "int64")
    s.commit("rect write")
    // exactly one chunk object per grid cell
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/w").count() == 4)
    // TensorPlane read path
    val v = TensorPlane.values(ro, "/w", "int64")
    assert(v.count() == 30)
    assert(v.filter(col("value") =!= (col("i0") * 6 + col("i1")) * 3 - 7)
      .count() == 0)
    // DSv2 read path agrees
    val v2 = spark.read.format("graft-v2")
      .option("path", dir)
      .option("array", "/w").option("mode", "values")
      .option("dtype", "int64").load()
    assert(v2.count() == 30)
    assert(v2.filter(col("value") =!= (col("i0") * 6 + col("i1")) * 3 - 7)
      .count() == 0)
    // out-of-shape rows are clipped before staging, not corrupted
    val s2 = repo.writableSession("main")
    TensorPlane.writeValues(s2, "/w", spark.range(1).select(
      lit(99L).as("i0"), lit(0L).as("i1"), lit(5L).as("value")), "int64")
    assert(s2.refs("/w").count() == 4) // nothing staged beyond the grid
  }

  test("rectilinear region reads and slice stats decode only the sub-block") {
    import org.apache.spark.sql.functions.expr
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArrayRectilinear("/rr", Seq(5, 6), Seq(Seq(2L, 3L), Seq(4L, 2L)),
      userData = """{"dtype":"int64"}""")
    val df = spark.range(30).select(
      expr("id div 6").as("i0"), expr("id % 6").as("i1"),
      col("id").as("value")) // value = i0*6 + i1
    TensorPlane.writeValues(s, "/rr", df, "int64")
    s.commit("rect region")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    // region crossing all four chunks: i0 in [1,4), i1 in [3,5)
    val region = TensorPlane.valuesRegion(ro, "/rr", "int64",
      Seq((1L, 4L), (3L, 5L)))
    val rows = region.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == (for (i0 <- 1L until 4L; i1 <- 3L until 5L)
      yield (i0, i1, i0 * 6 + i1)).toSet)
    // slice stats agree with the enumerated region
    val st = TensorPlane.sliceStats(ro, "/rr", "int64",
      Seq((1L, 4L), (3L, 5L))).head()
    val vals = rows.map(_._3)
    assert(st.getLong(0) == 6 && st.getDouble(1) == vals.sum.toDouble)
    assert(st.getDouble(2) == vals.min && st.getDouble(3) == vals.max)
  }

  test("rectilinear map algebra: mapValues offset-fill, mapUnary, combine") {
    import org.apache.spark.sql.functions.expr
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    // 1-D rect [3,5,2]; chunk 1 (the 5-cell one) left ABSENT so the
    // offset-fill path must materialize a 5-cell constant chunk (and a
    // 3-cell/2-cell volume is never confused with it)
    s.addArrayRectilinear("/m", Seq(10), Seq(Seq(3L, 5L, 2L)),
      userData = """{"dtype":"int64"}""")
    s.writeChunk("/m", Seq(0),
      ChunkCodec.encodeLongs(Array(1L, 2, 3), "int64"))
    s.writeChunk("/m", Seq(2),
      ChunkCodec.encodeLongs(Array(-8L, 9), "int64"))
    // affine with offset: absent chunk reads as 0*2+10 = 10
    TensorPlane.mapValues(s, "/m", "/m2", scale = 2.0, offset = 10.0,
      dtype = "int64")
    // unary abs into another array
    TensorPlane.mapUnary(s, "/m", "/mabs", "abs", "int64")
    // binary combine of the two rect arrays (same grid)
    TensorPlane.combine(s, "/m2", "/mabs", "/msum", "add", "int64")
    s.commit("rect algebra")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    def valuesOf(p: String): Map[Long, Long] =
      TensorPlane.values(ro, p, "int64").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = Map(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 0L, 4L -> 0L,
      5L -> 0L, 6L -> 0L, 7L -> 0L, 8L -> -8L, 9L -> 9L)
    val m2 = valuesOf("/m2")
    assert(m2 == base.map { case (k, v) => k -> (v * 2 + 10) }, m2)
    // abs maps fill 0 -> 0, so the absent rect chunk STAYS absent
    // (sparse stays sparse); only present cells read back
    val mabs = valuesOf("/mabs")
    assert(mabs == base.filter(k => k._1 <= 2 || k._1 >= 8)
      .map { case (k, v) => k -> math.abs(v) }, mabs)
    val msum = valuesOf("/msum")
    assert(msum == base.map { case (k, v) =>
      k -> (v * 2 + 10 + math.abs(v)) }, msum)
    // dst grids mirror the source's rect grid
    assert(ro.node("/m2").get.chunkSizesPerDim == Seq(Seq(3L, 5L, 2L)))
    assert(ro.node("/msum").get.chunkSizesPerDim == Seq(Seq(3L, 5L, 2L)))
    // mismatched rect grids still refuse combine by name
    val s2 = repo.writableSession("main")
    s2.addArrayRectilinear("/other", Seq(10), Seq(Seq(5L, 3L, 2L)),
      userData = """{"dtype":"int64"}""")
    val e = intercept[GraftException](
      TensorPlane.combine(s2, "/m", "/other", "/bad", "add", "int64"))
    assert(e.getMessage.contains("identical shape and chunk grid"))
    // value-plane snapshot diff across rect versions: one changed cell
    // decodes one chunk pair and emits one row
    val s3 = repo.writableSession("main")
    s3.writeChunk("/m", Seq(0),
      ChunkCodec.encodeLongs(Array(1L, 99, 3), "int64"))
    s3.commit("patch")
    val roNew = repo.readonlySession(VersionRef.Branch("main"))
    val d = TensorPlane.valueDiff(ro, roNew, "/m", "int64").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(d.toSeq == Seq((1L, 2L, 99L)), d.toSeq)
    // histogram on rect is exact (rect chunks tile exactly, no padding)
    val h = TensorPlane.histogram(roNew, "/m", "int64", -10, 110, 12)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(h == Map(0L -> 1L, 1L -> 3L, 10L -> 1L), h)
  }

  test("2-D rectilinear through the zarr.json surface") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val zs = new ZarrStore(repo.writableSession("main"))
    val doc = """{"zarr_format":3,"node_type":"array","shape":[5,4],""" +
      """"chunk_grid":{"name":"rectilinear","configuration":""" +
      """{"chunk_shapes":[[2,3],[4]]}}}"""
    zs.set("r2/zarr.json", doc.getBytes)
    val n = zs.session.node("/r2").get
    assert(n.isRectilinear && n.numChunksPerDim == Seq(2, 1))
    // chunk (0,0) is 2x4, chunk (1,0) is 3x4
    zs.set("r2/c/0/0", ChunkCodec.encodeLongs(
      Array.tabulate(8)(i => i.toLong), "int64"))
    zs.set("r2/c/1/0", ChunkCodec.encodeLongs(
      Array.tabulate(12)(i => 100L + i), "int64"))
    zs.session.commit("rect2d")

    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val v = TensorPlane.values(ro, "/r2", "int64")
    assert(v.count() == 20)
    // spot checks: (i0=1, i1=3) in chunk 0 -> pos 1*4+3=7; (i0=4, i1=2)
    // in chunk 1 (local row 2) -> 100 + 2*4+2 = 110
    assert(v.filter(col("i0") === 1 && col("i1") === 3)
      .head().getLong(2) == 7L)
    assert(v.filter(col("i0") === 4 && col("i1") === 2)
      .head().getLong(2) == 110L)
    // metadata round-trips through synthesis
    assert(new String(zs.get("r2/zarr.json").get) == doc)
  }

  test("rectilinear append extends the chunk-length table") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArrayRectilinear("/ap", Seq(10), Seq(Seq(3L, 5L, 2L)),
      userData = """{"dtype":"int64"}""")
    TensorPlane.writeValues(s, "/ap",
      spark.range(10).select(col("id").as("i0"), (col("id") * 2).as("value")),
      "int64")
    s.commit("init")
    // default sizing: last size 2 repeats, remainder tail -> [2,2,2,1]
    val s2 = repo.writableSession("main")
    TensorPlane.appendValues(s2, "/ap",
      spark.range(7).select(col("id").as("i0"),
        ((col("id") + 10) * 2).as("value")), dim = 0, dtype = "int64")
    s2.commit("append")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val n = ro.node("/ap").get
    assert(n.shape == Seq(17L))
    assert(n.chunkSizesPerDim == Seq(Seq(3L, 5L, 2L, 2L, 2L, 2L, 1L)))
    val v = TensorPlane.values(ro, "/ap", "int64")
    assert(v.count() == 17)
    assert(v.filter(col("value") =!= col("i0") * 2).count() == 0)
    // explicit sizes must tile the appended extent
    val s3 = repo.writableSession("main")
    intercept[IllegalArgumentException](
      TensorPlane.appendValues(s3, "/ap",
        spark.range(5).select(col("id").as("i0"), lit(0L).as("value")),
        dim = 0, dtype = "int64", appendChunkSizes = Seq(4L, 4L)))
    TensorPlane.appendValues(s3, "/ap",
      spark.range(5).select(col("id").as("i0"),
        ((col("id") + 17) * 2).as("value")),
      dim = 0, dtype = "int64", appendChunkSizes = Seq(4L, 1L))
    assert(s3.node("/ap").get.chunkSizesPerDim ==
      Seq(Seq(3L, 5L, 2L, 2L, 2L, 2L, 1L, 4L, 1L)))
    s3.commit("append explicit")
    val v2 = TensorPlane.values(
      repo.readonlySession(VersionRef.Branch("main")), "/ap", "int64")
    assert(v2.count() == 22)
    assert(v2.filter(col("value") =!= col("i0") * 2).count() == 0)
  }

  test("rectilinear region write: offsets must be actual chunk starts") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArrayRectilinear("/rw", Seq(10), Seq(Seq(3L, 5L, 2L)),
      userData = """{"dtype":"int64"}""")
    TensorPlane.writeValues(s, "/rw",
      spark.range(10).select(col("id").as("i0"), lit(1L).as("value")),
      "int64")
    s.commit("init")
    val s2 = repo.writableSession("main")
    // 3 IS a chunk start ([0,3,8]); overwrite the middle chunk
    TensorPlane.writeRegion(s2, "/rw",
      spark.range(5).select(col("id").as("i0"), lit(7L).as("value")),
      Seq(3L), "int64")
    s2.commit("region")
    // 4 is not a chunk start
    intercept[GraftException](TensorPlane.writeRegion(
      repo.writableSession("main"), "/rw",
      spark.range(2).select(col("id").as("i0"), lit(9L).as("value")),
      Seq(4L), "int64"))
    val v = TensorPlane.values(
      repo.readonlySession(VersionRef.Branch("main")), "/rw", "int64")
    assert(v.filter(col("i0").between(3, 7) && col("value") =!= 7).count() == 0)
    assert(v.filter(!col("i0").between(3, 7) && col("value") =!= 1).count() == 0)
  }

  test("concat falls back to a rectilinear destination: zero-copy for rect sources") {
    val dir = tmpDir("repo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    s.addArrayRectilinear("/a", Seq(10), Seq(Seq(3L, 5L, 2L)),
      userData = """{"dtype":"int64"}""")
    TensorPlane.writeValues(s, "/a",
      spark.range(10).select(col("id").as("i0"), col("id").as("value")),
      "int64")
    s.addArrayRectilinear("/b", Seq(6), Seq(Seq(4L, 2L)),
      userData = """{"dtype":"int64"}""")
    TensorPlane.writeValues(s, "/b",
      spark.range(6).select(col("id").as("i0"),
        (col("id") + 10).as("value")), "int64")
    s.commit("init")
    val s2 = repo.writableSession("main")
    TensorPlane.concat(s2, Seq("/a", "/b"), "/ab", axis = 0,
      dtype = "int64")
    // zero-copy: every destination ref reuses a source chunk object
    val srcIds = s2.refs("/a").unionByName(s2.refs("/b"))
      .select("chunk_id").distinct().collect().map(_.getString(0)).toSet
    val dstIds = s2.refs("/ab")
      .select("chunk_id").distinct().collect().map(_.getString(0)).toSet
    assert(dstIds.subsetOf(srcIds))
    s2.commit("concat")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val n = ro.node("/ab").get
    assert(n.isRectilinear &&
      n.chunkSizesPerDim == Seq(Seq(3L, 5L, 2L, 4L, 2L)))
    val v = TensorPlane.values(ro, "/ab", "int64")
    assert(v.count() == 16)
    assert(v.filter(col("value") =!= col("i0")).count() == 0)
    // the DSv2 path reads the concatenated rect grid too
    val v2 = spark.read.format("graft-v2").option("path", dir)
      .option("array", "/ab").option("mode", "values")
      .option("dtype", "int64").load()
    assert(v2.count() == 16)
    assert(v2.filter(col("value") =!= col("i0")).count() == 0)
  }

  test("concat rect fallback truncates a ragged regular source's padded tail") {
    val dir = tmpDir("repo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    // regular grid, ragged along dim 0: 10 = 4+4+2 (tail buffer PADDED)
    s.addArray("/ra", Seq(10), Seq(4), userData = """{"dtype":"int64"}""")
    TensorPlane.writeValues(s, "/ra",
      spark.range(10).select(col("id").as("i0"), col("id").as("value")),
      "int64")
    s.addArrayRectilinear("/rb", Seq(6), Seq(Seq(3L, 3L)),
      userData = """{"dtype":"int64"}""")
    TensorPlane.writeValues(s, "/rb",
      spark.range(6).select(col("id").as("i0"),
        (col("id") + 10).as("value")), "int64")
    s.commit("init")
    val s2 = repo.writableSession("main")
    TensorPlane.concat(s2, Seq("/ra", "/rb"), "/rc", axis = 0,
      dtype = "int64")
    s2.commit("concat")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val n = ro.node("/rc").get
    assert(n.isRectilinear &&
      n.chunkSizesPerDim == Seq(Seq(4L, 4L, 2L, 3L, 3L)))
    // the 2-cell tail chunk was re-encoded to exact extent: its stored
    // payload is 16 bytes, not the padded 32
    val tailLen = ro.refs("/rc")
      .filter(element_at(col("coord"), 1) === 2)
      .select("length").head().getLong(0)
    assert(tailLen == 16L)
    val v = TensorPlane.values(ro, "/rc", "int64")
    assert(v.count() == 16)
    assert(v.filter(col("value") =!= col("i0")).count() == 0)
    val v2 = spark.read.format("graft-v2").option("path", dir)
      .option("array", "/rc").option("mode", "values")
      .option("dtype", "int64").load()
    assert(v2.count() == 16)
    assert(v2.filter(col("value") =!= col("i0")).count() == 0)
    // a source ragged along an INNER dim cannot relabel — refused.
    // (axis extent 5 % 2 != 0 forces the rect fallback; dim-1 5 % 3 != 0
    // is the inner raggedness that trips the refusal)
    val s3 = repo.writableSession("main")
    s3.addArray("/m1", Seq(5, 5), Seq(2, 3), userData = """{"dtype":"int64"}""")
    s3.addArray("/m2", Seq(4, 5), Seq(2, 3), userData = """{"dtype":"int64"}""")
    val ex = intercept[GraftException](
      TensorPlane.concat(s3, Seq("/m1", "/m2"), "/m3", axis = 0,
        dtype = "int64"))
    assert(ex.getMessage.contains("inner dim"))
  }

  test("concat tail truncation targets the SHIFTED tail coord when the " +
      "ragged source is not first") {
    // regression: the tail filter once compared relabeled (shifted)
    // coords against the UNSHIFTED tail index — with the ragged regular
    // source second on axis 0 it truncated a FULL chunk and staged the
    // padded tail untouched (silent corruption)
    val dir = tmpDir("repo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    s.addArrayRectilinear("/first", Seq(6), Seq(Seq(3L, 3L)),
      userData = """{"dtype":"int64"}""")
    TensorPlane.writeValues(s, "/first",
      spark.range(6).select(col("id").as("i0"), col("id").as("value")),
      "int64")
    // ragged regular SECOND: 10 = 4+4+2, values continue the identity
    s.addArray("/second", Seq(10), Seq(4), userData = """{"dtype":"int64"}""")
    TensorPlane.writeValues(s, "/second",
      spark.range(10).select(col("id").as("i0"),
        (col("id") + 6).as("value")), "int64")
    s.commit("init")
    val s2 = repo.writableSession("main")
    TensorPlane.concat(s2, Seq("/first", "/second"), "/fs", axis = 0,
      dtype = "int64")
    s2.commit("concat")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.node("/fs").get.chunkSizesPerDim ==
      Seq(Seq(3L, 3L, 4L, 4L, 2L)))
    // the truncated chunk is the SHIFTED tail (coord 4), cut to 16 bytes;
    // the full chunks (coords 2, 3) keep their 32-byte payloads
    val lens = ro.refs("/fs")
      .select(element_at(col("coord"), 1).as("c0"), col("length"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(lens(2) == 32L && lens(3) == 32L && lens(4) == 16L)
    val v = TensorPlane.values(ro, "/fs", "int64")
    assert(v.count() == 16)
    assert(v.filter(col("value") =!= col("i0")).count() == 0)
  }

  test("concat refuses a decode dtype that disagrees with stored metadata") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/d32", Seq(5), Seq(2), userData = """{"dtype":"int32"}""")
    s.addArray("/d64", Seq(5), Seq(2), userData = """{"dtype":"int64"}""")
    val ex = intercept[GraftException](
      TensorPlane.concat(s, Seq("/d32", "/d64"), "/dc", axis = 0,
        dtype = "int64"))
    assert(ex.getMessage.contains("stores dtype int32"))
  }

  test("downsample over a rectilinear grid: blocks cross the irregular " +
      "chunk seams") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    // 5x6, dim0 chunks [2,3], dim1 chunks [4,2]: the 2x2 mean blocks
    // straddle both irregular seams, so partials must combine across
    // exact-extent buffers with table-derived offsets
    s.addArrayRectilinear("/rd", Seq(5, 6), Seq(Seq(2L, 3L), Seq(4L, 2L)),
      userData = """{"dtype":"int64"}""")
    TensorPlane.writeValues(s, "/rd",
      spark.range(30).select(expr("id div 6").as("i0"),
        expr("id % 6").as("i1"), col("id").as("value")), "int64")
    s.commit("init")
    val s2 = repo.writableSession("main")
    TensorPlane.downsample(s2, "/rd", "/rd_l1", Seq(2, 2), "int64")
    s2.commit("level 1")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val got = TensorPlane.values(ro, "/rd_l1", "float64")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // expected: mean over each 2x2 block of v(i,j) = i*6 + j, edge
    // blocks averaging what exists
    for (bi <- 0 until 3; bj <- 0 until 3) {
      val cells = for {
        i <- bi * 2 until math.min(bi * 2 + 2, 5)
        j <- bj * 2 until math.min(bj * 2 + 2, 6)
      } yield (i * 6 + j).toDouble
      assert(math.abs(got((bi.toLong, bj.toLong)) -
        cells.sum / cells.size) < 1e-9, s"block ($bi,$bj)")
    }
    assert(got.size == 9)
  }

  test("DSv2 rect scans prune input partitions to the sliced chunk range") {
    val dir = tmpDir("repo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    // 20 equal-table chunks (still a rect grid — planning goes through
    // the start-table binary search, not the regular division)
    s.addArrayRectilinear("/pp", Seq(2000), Seq(Seq.fill(20)(100L)),
      userData = """{"dtype":"int64"}""")
    for (c <- 0 until 20)
      s.writeChunk("/pp", Seq(c), graft.functions.ChunkCodec.encodeLongs(
        Array.tabulate(100)(i => c * 100L + i), "int64"))
    s.commit("rect 20 chunks")
    val v = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/pp")
      .option("mode", "values").option("dtype", "int64").load()
    val full = v.rdd.getNumPartitions
    // slice covering exactly chunks 4 and 5: the planner must map the
    // element bounds to those chunks and plan ONLY them (plus any
    // subdivision), not scan the array
    val narrow = v.filter(col("i0") >= 450 && col("i0") < 550)
    val pruned = narrow.rdd.getNumPartitions
    assert(narrow.count() == 100)
    assert(pruned < full && pruned <= 4,
      s"expected <=4 pruned partitions (2 chunks), got $pruned of $full")
  }

  test("appendValues with an empty input is a no-op, not an NPE") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArrayRectilinear("/e", Seq(5), Seq(Seq(3L, 2L)),
      userData = """{"dtype":"int64"}""")
    TensorPlane.writeValues(s, "/e",
      spark.range(5).select(col("id").as("i0"), col("id").as("value")),
      "int64")
    s.commit("init")
    val s2 = repo.writableSession("main")
    TensorPlane.appendValues(s2, "/e",
      spark.range(0).select(col("id").as("i0"), col("id").as("value")),
      dim = 0, "int64")
    assert(s2.node("/e").get.shape == Seq(5L)) // unchanged
    // explicit sizes with nothing to append is a loud error
    val ex = intercept[IllegalArgumentException](
      TensorPlane.appendValues(s2, "/e",
        spark.range(0).select(col("id").as("i0"), col("id").as("value")),
        dim = 0, "int64", appendChunkSizes = Seq(2L)))
    assert(ex.getMessage.contains("EMPTY"))
  }

  test("rectilinear transpose permutes the chunk-length tables") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArrayRectilinear("/t", Seq(5, 6), Seq(Seq(2L, 3L), Seq(4L, 2L)),
      userData = """{"dtype":"int64"}""")
    TensorPlane.writeValues(s, "/t",
      spark.range(30).select(expr("id div 6").as("i0"),
        expr("id % 6").as("i1"), (col("id") * 3 - 7).as("value")), "int64")
    s.commit("init")
    val s2 = repo.writableSession("main")
    TensorPlane.transpose(s2, "/t", "/tt", Seq(1, 0), "int64")
    s2.commit("transpose")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val n = ro.node("/tt").get
    assert(n.isRectilinear && n.shape == Seq(6L, 5L) &&
      n.chunkSizesPerDim == Seq(Seq(4L, 2L), Seq(2L, 3L)))
    val v = TensorPlane.values(ro, "/tt", "int64")
    assert(v.count() == 30)
    // transposed: value at (i0,i1) = original (i1,i0) = (i1*6+i0)*3-7
    assert(v.filter(col("value") =!= (col("i1") * 6 + col("i0")) * 3 - 7)
      .count() == 0)
  }
}
