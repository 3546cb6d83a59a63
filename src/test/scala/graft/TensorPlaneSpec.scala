package graft

import org.apache.spark.sql.functions._
import graft.functions.ChunkCodec
import graft.repo._
import graft.storage.Store
import graft.tensor.TensorPlane

/** The §7-step-2 north star: create → write → commit → reopen →
  * decode → `SELECT avg(value)`.
  */
class TensorPlaneSpec extends SparkTestBase {

  test("int64 cube round-trips through codec and answers avg(value)") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    // scaled-down cube_int64 (FIXTURES A1): 8x4x4, chunks 2x4x4
    s.addArray("/cube", Seq(8, 4, 4), Seq(2, 4, 4), Seq("t", "y", "x"))
    val chunkVals = 2 * 4 * 4
    for (c <- 0 until 4) {
      val vals = Array.tabulate(chunkVals)(i => (c * chunkVals + i).toLong)
      s.writeChunk("/cube", Seq(c, 0, 0),
        ChunkCodec.encodeLongs(vals, "int64"))
    }
    s.commit("cube")

    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val values = TensorPlane.values(ro, "/cube", "int64")
    values.createOrReplaceTempView("cube")
    assert(values.count() == 128)
    // global mean of 0..127
    val avg = spark.sql("SELECT avg(value) FROM cube").head().getDouble(0)
    assert(math.abs(avg - 63.5) < 1e-9)
    // per-slice aggregation uses the i0 coordinate
    val bySlice = spark.sql(
      "SELECT i0, sum(value) AS s FROM cube GROUP BY i0 ORDER BY i0")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bySlice.length == 8)
    assert(bySlice.head._2 == (0 until 16).sum)
    // point lookup by full coordinate
    val v = values.filter(col("i0") === 3 && col("i1") === 2 && col("i2") === 1)
      .head().getLong(3)
    assert(v == 3 * 16 + 2 * 4 + 1 + 0) // row-major within chunk 1, t=3

    // native stats kernel agrees with the row-exploded aggregate
    val st = TensorPlane.arrayStats(ro, "/cube", "int64").head()
    assert(st.getAs[Long]("n") == 128)
    assert(st.getAs[Double]("avg") == 63.5)
    assert(st.getAs[Double]("min") == 0.0 && st.getAs[Double]("max") == 127.0)
  }

  test("float32 zstd chunks decode; edge chunks clip to array bounds") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/f", Seq(10), Seq(4)) // 3 chunks, last partial (2 cells)
    for (c <- 0 until 3) {
      val vals = Array.tabulate(4)(i => (c * 4 + i) * 0.5)
      s.writeChunk("/f", Seq(c),
        ChunkCodec.compress(ChunkCodec.encodeDoubles(vals, "float32"), "zstd"))
    }
    s.commit("f")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val values = TensorPlane.values(ro, "/f", "float32", "zstd")
    assert(values.count() == 10) // 12 decoded cells, 2 clipped by bounds
    val total = values.agg(sum("value")).head().getDouble(0)
    assert(math.abs(total - (0 until 10).map(_ * 0.5).sum) < 1e-6)
  }

  test("append_dim grows the array; region writes land chunk-aligned") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/ts", Seq(20), Seq(10), Seq("time"))
    TensorPlane.writeValues(s, "/ts", spark.range(20)
      .select(col("id").as("i0"), col("id").cast("double").as("value")),
      "float64")
    s.commit("initial")

    // append 10 more along time — shape grows, old data intact
    val s2 = repo.writableSession("main")
    TensorPlane.appendValues(s2, "/ts", spark.range(10)
      .select(col("id").as("i0"), lit(99.0).as("value")), dim = 0,
      dtype = "float64")
    s2.commit("append")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.node("/ts").get.shape == Seq(30))
    val v = TensorPlane.values(ro, "/ts", "float64")
    assert(v.count() == 30)
    assert(v.filter(col("i0") >= 20).agg(sum("value")).head().getDouble(0)
      == 990.0)
    assert(v.filter(col("i0") < 20).agg(sum("value")).head().getDouble(0)
      == (0 until 20).sum.toDouble)

    // region write replaces exactly one aligned chunk
    val s3 = repo.writableSession("main")
    TensorPlane.writeRegion(s3, "/ts", spark.range(10)
      .select(col("id").as("i0"), lit(-1.0).as("value")),
      offsets = Seq(10L), dtype = "float64")
    s3.commit("region")
    val v3 = TensorPlane.values(
      repo.readonlySession(VersionRef.Branch("main")), "/ts", "float64")
    assert(v3.filter(col("i0").between(10, 19)).agg(sum("value"))
      .head().getDouble(0) == -10.0)
    assert(v3.filter(col("i0") < 10).agg(sum("value"))
      .head().getDouble(0) == (0 until 10).sum.toDouble)

    // unaligned region rejected
    intercept[GraftException] {
      TensorPlane.writeRegion(repo.writableSession("main"), "/ts",
        spark.range(5).select(col("id").as("i0"), lit(0.0).as("value")),
        offsets = Seq(7L), dtype = "float64")
    }
  }

  test("distributed value-plane write: DataFrame -> chunks -> read back") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/w", Seq(100), Seq(10))
    val df = spark.range(100).select(col("id").as("i0"),
      (col("id") * 2).cast("double").as("value"))
    TensorPlane.writeValues(s, "/w", df, "float64")
    s.commit("values written")

    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/w").count() == 10)
    val back = TensorPlane.values(ro, "/w", "float64")
    assert(back.count() == 100)
    assert(back.agg(sum("value")).head().getDouble(0) == (0 until 100).map(_ * 2.0).sum)
    val v42 = back.filter(col("i0") === 42).head().getDouble(1)
    assert(v42 == 84.0)
  }

  test("writeValues uploads each chunk exactly once; staging is cleaned up") {
    val dir = tmpDir("repo")
    val store = Store.local(dir)
    val repo = Repository.create(store, spark)
    val s = repo.writableSession("main")
    s.addArray("/w", Seq(100), Seq(10))
    val df = spark.range(100).select(col("id").as("i0"),
      col("id").cast("double").as("value"))
    TensorPlane.writeValues(s, "/w", df, "float64")
    // flush evaluates the changeset several times (node-id collect,
    // manifest write, tx log) — the upload must not re-run
    s.commit("once")
    // 10 chunks referenced -> exactly 10 chunk objects, zero orphans
    assert(store.list("chunks/").size == 10)
    assert(store.list("staging/").isEmpty) // cleaned on commit
  }

  test("region reads: sub-block decode and slice stats match the full scan") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    // 12x10 array, 4x5 chunks (3x2 grid), ragged nothing (aligned)
    s.addArray("/r", Seq(12, 10), Seq(4, 5))
    val df = spark.range(120).select(
      expr("id div 10").as("i0"), expr("id % 10").as("i1"),
      col("id").cast("double").as("value"))
    TensorPlane.writeValues(s, "/r", df, "float64")
    s.commit("grid")
    val ro = repo.readonlySession(VersionRef.Branch("main"))

    // region [2,7) x [3,9): oracle from the full value scan
    val full = TensorPlane.values(ro, "/r", "float64")
      .filter(col("i0") >= 2 && col("i0") < 7 &&
        col("i1") >= 3 && col("i1") < 9)
    val region = TensorPlane.valuesRegion(ro, "/r", "float64",
      Seq((2L, 7L), (3L, 9L)))
    assert(region.count() == 5 * 6)
    assert(region.unionByName(full).except(
      region.intersect(full)).isEmpty) // set-equal
    // pruning: only chunks overlapping the region are scanned (rows c0 in
    // {0,1}, c1 in {0,1} -> 4 of 6 chunks)
    assert(ro.refsBounded("/r", Seq((0, 1), (0, 1))).count() == 4)

    // kernel stats over the same region match the exploded aggregate
    val st = TensorPlane.sliceStats(ro, "/r", "float64",
      Seq((2L, 7L), (3L, 9L))).head()
    val oracle = full.agg(count(lit(1)), sum("value"), min("value"),
      max("value")).head()
    assert(st.getAs[Long]("n") == oracle.getLong(0))
    assert(st.getAs[Double]("sum") == oracle.getDouble(1))
    assert(st.getAs[Double]("min") == oracle.getDouble(2))
    assert(st.getAs[Double]("max") == oracle.getDouble(3))

    // degenerate 1-cell region
    val one = TensorPlane.valuesRegion(ro, "/r", "float64",
      Seq((11L, 12L), (9L, 10L))).collect()
    assert(one.length == 1 && one(0).getDouble(2) == 119.0)

    // py4j exact-arity forms (VERDICT r15 item 7): Python callers get
    // the same region read/stats through ONE gateway call — results
    // must be identical to the Scala-native forms
    def jl(xs: Long*): java.util.List[java.lang.Number] = {
      val l = new java.util.ArrayList[java.lang.Number]()
      xs.foreach(x => l.add(java.lang.Long.valueOf(x)))
      l
    }
    // lo/hi are per-DIMENSION vectors: region [2,7) × [3,9)
    val stJ = ro.sliceStatsJ("/r", "float64", jl(2, 3), jl(7, 9), "raw")
      .head()
    assert(stJ.getAs[Long]("n") == st.getAs[Long]("n") &&
      stJ.getAs[Double]("sum") == st.getAs[Double]("sum") &&
      stJ.getAs[Double]("min") == st.getAs[Double]("min") &&
      stJ.getAs[Double]("max") == st.getAs[Double]("max"))
    val valsJ = ro.sliceValuesJ("/r", "float64", jl(2, 3), jl(7, 9), "raw")
    assert(valsJ.count() == 5 * 6)
    assert(valsJ.unionByName(region).except(
      valsJ.intersect(region)).isEmpty)
    intercept[IllegalArgumentException](
      ro.sliceStatsJ("/r", "float64", jl(2, 3), jl(7), "raw"))
    // bounds must cover EVERY dimension — a short list would silently
    // leave trailing axes unconstrained (wrong region, not an error)
    intercept[IllegalArgumentException](
      ro.sliceStatsJ("/r", "float64", jl(2), jl(7), "raw"))
    intercept[IllegalArgumentException](
      ro.sliceValuesJ("/r", "float64", jl(2), jl(7), "raw"))
  }

  test("histogram kernel matches exploded counts; quantiles within a bin") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/h", Seq(4000), Seq(500)) // aligned: no padding caveat
    for (c <- 0 until 8) {
      val vals = Array.tabulate(500) { i =>
        val g = c * 500L + i; (g * 13) % 400 - 100 // values in [-100, 300)
      }
      s.writeChunk("/h", Seq(c), ChunkCodec.encodeLongs(vals, "int64"))
    }
    s.commit("init")
    val ro = repo.readonlySession(VersionRef.Branch("main"))

    // kernel histogram vs the row-exploded oracle, incl. under/overflow
    val hist = TensorPlane.histogram(ro, "/h", "int64", 0.0, 200.0, 10)
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n")).toMap
    val vals = TensorPlane.values(ro, "/h", "int64")
      .select("value").collect().map(_.getLong(0))
    val oracle = vals.groupBy { v =>
      if (v < 0) -1L else if (v >= 200) 10L else v / 20
    }.map { case (b, xs) => b -> xs.length.toLong }
    assert(hist == oracle)
    assert(hist(-1L) > 0 && hist(10L) > 0) // both sentinels exercised
    // bin bounds surface correctly
    val row0 = TensorPlane.histogram(ro, "/h", "int64", 0.0, 200.0, 10)
      .filter(col("bin") === 3).head()
    assert(row0.getAs[Double]("lo") == 60.0 && row0.getAs[Double]("hi") == 80.0)

    // approx quantiles land within one bin width of the exact ones
    val sortedVals = vals.sorted
    val probs = Seq(0.1, 0.5, 0.9)
    val approx = TensorPlane.approxQuantiles(ro, "/h", "int64", probs,
      nbins = 200)
    val binW = (sortedVals.last - sortedVals.head).toDouble / 200
    probs.zip(approx).foreach { case (p, a) =>
      val exact = sortedVals(math.min(sortedVals.length - 1,
        (p * sortedVals.length).toInt)).toDouble
      assert(math.abs(a - exact) <= binW + 1e-9,
        s"p$p: approx $a vs exact $exact (binW $binW)")
    }
    // degenerate constant array short-circuits
    val s2 = repo.writableSession("main")
    s2.addArray("/const", Seq(100), Seq(50))
    for (c <- 0 until 2) s2.writeChunk("/const", Seq(c),
      ChunkCodec.encodeLongs(Array.fill(50)(7L), "int64"))
    s2.commit("const")
    val ro2 = repo.readonlySession(VersionRef.Branch("main"))
    assert(TensorPlane.approxQuantiles(ro2, "/const", "int64",
      Seq(0.0, 0.5, 1.0)) == Seq(7.0, 7.0, 7.0))
  }

  test("combine: 2-D ragged max, fill for one-sided chunks, sparse stays sparse") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    // 5x7 arrays on 2x3 chunks: ragged edges on both dims
    s.addArray("/x", Seq(5, 7), Seq(2, 3))
    s.addArray("/y", Seq(5, 7), Seq(2, 3))
    def block(f: (Int, Int) => Long)(ci: Int, cj: Int): Array[Byte] =
      ChunkCodec.encodeLongs(Array.tabulate(6) { k =>
        f(ci * 2 + k / 3, cj * 3 + k % 3) }, "int64")
    for (ci <- 0 until 3; cj <- 0 until 3)
      s.writeChunk("/x", Seq(ci, cj), block((i, j) => i * 10L + j)(ci, cj))
    // y: leave chunk (0,0) absent -> fill 0 on that block
    for (ci <- 0 until 3; cj <- 0 until 3 if !(ci == 0 && cj == 0))
      s.writeChunk("/y", Seq(ci, cj), block((i, j) => 50L - i * j)(ci, cj))
    s.commit("init")
    val t = repo.writableSession("main")
    TensorPlane.combine(t, "/x", "/y", "/z", "max", "int64")
    t.commit("max")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val got = TensorPlane.values(ro, "/z", "int64")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(got.size == 35)
    for (i <- 0 until 5; j <- 0 until 7) {
      val y = if (i < 2 && j < 3) 0L else 50L - i * j
      assert(got((i.toLong, j.toLong)) == math.max(i * 10L + j, y),
        s"cell ($i,$j)")
    }

    // sparse stays sparse: both sides absent everywhere but one chunk
    val s2 = repo.writableSession("main")
    s2.addArray("/sx", Seq(100), Seq(10))
    s2.addArray("/sy", Seq(100), Seq(10))
    s2.writeChunk("/sx", Seq(3),
      ChunkCodec.encodeLongs(Array.fill(10)(5L), "int64"))
    s2.commit("sparse init")
    val t2 = repo.writableSession("main")
    TensorPlane.combine(t2, "/sx", "/sy", "/sz", "add", "int64")
    t2.commit("sparse add")
    val ro2 = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro2.refs("/sz").count() == 1)

    // grid-mismatch and unknown op are refused before any job runs
    val t3 = repo.writableSession("main")
    t3.addArray("/w", Seq(5, 7), Seq(2, 2))
    val e1 = intercept[GraftException](
      TensorPlane.combine(t3, "/x", "/w", "/bad", "add", "int64"))
    assert(e1.kind == GraftError.InvalidConfig)
    val e2 = intercept[GraftException](
      TensorPlane.combine(t3, "/x", "/y", "/bad", "xor", "int64"))
    assert(e2.kind == GraftError.InvalidConfig)
    val e3 = intercept[GraftException](
      TensorPlane.combine(t3, "/x", "/y", "/bad", "div", "int64",
        dstDtype = "int64"))
    assert(e3.kind == GraftError.InvalidConfig)
  }

  test("combine across versions: current minus tagged snapshot; int div lands float64") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(40), Seq(10))
    for (c <- 0 until 4) s.writeChunk("/a", Seq(c),
      ChunkCodec.encodeLongs(Array.tabulate(10)(i =>
        (c * 10 + i).toLong), "int64"))
    val v1 = s.commit("v1")
    repo.createTag("base", v1)
    val s2 = repo.writableSession("main")
    for (c <- 2 until 4) s2.writeChunk("/a", Seq(c),
      ChunkCodec.encodeLongs(Array.tabulate(10)(i =>
        (c * 10 + i) * 3L), "int64"))
    s2.commit("v2")
    // delta = current - base, B side read from the TAG
    val t = repo.writableSession("main")
    val base = repo.readonlySession(VersionRef.Tag("base"))
    TensorPlane.combine(t, "/a", "/a", "/delta", "sub", "int64",
      sessionB = base)
    t.commit("delta")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val d = TensorPlane.values(ro, "/delta", "int64")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (g <- 0 until 40)
      assert(d(g.toLong) == (if (g >= 20) 2L * g else 0L), s"cell $g")

    // integer division defaults to a float64 destination
    val t2 = repo.writableSession("main")
    TensorPlane.combine(t2, "/a", "/a", "/ratio", "div", "int64",
      sessionB = base)
    t2.commit("ratio")
    val ro2 = repo.readonlySession(VersionRef.Branch("main"))
    val r0 = TensorPlane.values(ro2, "/ratio", "float64")
      .filter(col("i0") === 25).collect()(0).getDouble(1)
    assert(math.abs(r0 - 3.0) < 1e-12)
  }

  test("mapValues: affine per-chunk map; identity is a zero-copy alias") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/k", Seq(30), Seq(10))
    for (c <- 0 until 3) s.writeChunk("/k", Seq(c),
      ChunkCodec.encodeLongs(Array.tabulate(10)(i =>
        (c * 10 + i).toLong), "int64"))
    s.commit("init")
    val t = repo.writableSession("main")
    // celsius -> fahrenheit-ish float transform
    TensorPlane.mapValues(t, "/k", "/f", 1.8, 32.0, "int64")
    // integral affine keeps the int dtype
    TensorPlane.mapValues(t, "/k", "/k2", 2.0, 1.0, "int64")
    // identity -> refs staged verbatim (zero-copy alias)
    TensorPlane.mapValues(t, "/k", "/alias", 1.0, 0.0, "int64")
    t.commit("maps")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val f = TensorPlane.values(ro, "/f", "float64")
      .filter(col("i0") === 25).collect()(0).getDouble(1)
    assert(math.abs(f - (25 * 1.8 + 32.0)) < 1e-12)
    val k2 = TensorPlane.values(ro, "/k2", "int64")
      .filter(col("i0") === 7).collect()(0).getLong(1)
    assert(k2 == 15L)
    // alias shares the source's chunk objects
    val srcIds = ro.refs("/k").select("chunk_id").collect()
      .map(_.getString(0)).toSet
    val aliasIds = ro.refs("/alias").select("chunk_id").collect()
      .map(_.getString(0)).toSet
    assert(aliasIds == srcIds)
  }

  test("mapUnary: abs/square/sqrt/clip; fill materializes only when clip moves 0") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/m", Seq(30), Seq(10)) // 3 chunks; chunk 2 absent
    s.writeChunk("/m", Seq(0), ChunkCodec.encodeLongs(
      Array.tabulate(10)(i => (i - 5).toLong), "int64"))
    s.writeChunk("/m", Seq(1), ChunkCodec.encodeLongs(
      Array.tabulate(10)(i => (10 + i).toLong), "int64"))
    s.commit("init")
    val t = repo.writableSession("main")
    TensorPlane.mapUnary(t, "/m", "/abs", "abs", "int64")
    TensorPlane.mapUnary(t, "/m", "/sq", "square", "int64")
    TensorPlane.mapUnary(t, "/m", "/rt", "sqrt", "int64")
    TensorPlane.mapUnary(t, "/m", "/cl", "clip", "int64",
      lo = 2.0, hi = 12.0)
    t.commit("unary")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    // f(0) = 0 ops keep sparsity; clip(0) = 2 materializes the fill
    assert(ro.refs("/abs").count() == 2 && ro.refs("/sq").count() == 2)
    assert(ro.refs("/rt").count() == 2)
    assert(ro.refs("/cl").count() == 3)
    def m(p: String) = TensorPlane.values(ro, p,
        if (p == "/rt") "float64" else "int64").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val cl = m("/cl")
    assert(cl(25L) == 2L && cl(0L) == 2L && cl(12L) == 12L &&
      cl(19L) == 12L)
    val ab = m("/abs")
    assert(ab(0L) == 5L && ab(12L) == 12L)
    assert(m("/sq")(0L) == 25L)
    val rt = m("/rt")
    assert(rt(16L) == 4.0)
    assert(rt(0L).asInstanceOf[Double].isNaN) // sqrt(-5), numpy-style
    val e = intercept[GraftException](
      TensorPlane.mapUnary(t, "/m", "/bad", "exp", "int64"))
    assert(e.kind == GraftError.InvalidConfig)
  }

  test("mapValues: offset != 0 materializes one shared fill chunk; combine refuses dtype mismatch") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    // 4-chunk array, only chunk 1 present
    s.addArray("/sp", Seq(40), Seq(10))
    s.writeChunk("/sp", Seq(1),
      ChunkCodec.encodeLongs(Array.tabulate(10)(i =>
        (10 + i).toLong), "int64"))
    s.commit("init")
    val t = repo.writableSession("main")
    TensorPlane.mapValues(t, "/sp", "/aff", 2.0, 5.0, "int64")
    t.commit("affine")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    // all 4 destination chunks exist; the 3 fill chunks share ONE object
    val refs = ro.refs("/aff").select("coord", "chunk_id").collect()
      .map(r => (r.getSeq[Int](0).head, r.getString(1)))
    assert(refs.length == 4)
    assert(refs.filter(_._1 != 1).map(_._2).toSet.size == 1)
    val got = TensorPlane.values(ro, "/aff", "int64").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 40)
    for (i <- 0 until 40) {
      val src = if (i >= 10 && i < 20) i.toLong else 0L
      assert(got(i.toLong) == src * 2 + 5, s"cell $i")
    }
    // offset == 0: fill maps to fill, sparse stays sparse
    val t2 = repo.writableSession("main")
    TensorPlane.mapValues(t2, "/sp", "/sc", 3.0, 0.0, "int64")
    t2.commit("scale")
    val ro2 = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro2.refs("/sc").count() == 1)
    // combine: a side whose STORED dtype differs from the decode dtype
    // would silently misdecode — refused with schema_mismatch instead
    val t3 = repo.writableSession("main")
    t3.addArray("/f64", Seq(40), Seq(10),
      userData = """{"dtype":"float64"}""")
    val e = intercept[GraftException](
      TensorPlane.combine(t3, "/sp", "/f64", "/bad", "add", "int64"))
    assert(e.kind == GraftError.SchemaMismatch)
  }

  test("writeValues drops out-of-shape rows on the regular grid instead " +
      "of aliasing them onto valid chunks (ADVICE r16 high)") {
    val repo = Repository.create(Store.local(tmpDir("wv-clip")), spark)
    val s = repo.writableSession("main")
    s.addArray("/g", Seq(10, 10), Seq(4, 4)) // grid 3x3
    // valid cells (i,j) in-shape valued i*10+j, PLUS poison rows:
    // (13, 0) linearizes to per-dim chunk (3, 0) -> _cl 9... out of grid;
    // before the clip it aliased into a WRONG chunk's cell
    val rows = (for { i <- 0 until 10; j <- 0 until 10 }
      yield (i, j, (i * 10 + j).toLong)) ++
      Seq((13, 0, 999L), (0, 13, 888L), (-1, 2, 777L))
    import spark.implicits._
    val df = rows.toDF("i0", "i1", "value")
    TensorPlane.writeValues(s, "/g", df, "int64")
    s.commit("clipped write")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val got = TensorPlane.values(ro, "/g", "int64")
      .select(col("i0").cast("long"), col("i1").cast("long"),
        col("value").cast("long"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // chunk padding cells read as 0; every written cell exact, no poison
    for { i <- 0 until 10; j <- 0 until 10 }
      assert(got((i.toLong, j.toLong)) == i * 10 + j, s"cell ($i,$j)")
    assert(!got.values.exists(v => v == 999L || v == 888L || v == 777L))
  }
}
