package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.functions.ChunkCodec
import graft.ops.ZarrImport
import graft.repo._
import graft.storage.Store
import graft.tensor.TensorPlane

/** Adopting a plain Zarr v3 store: virtual (zero-copy) and copy modes,
  * both chunk-key encodings, metadata preservation, refusal paths.
  */
class ZarrImportSpec extends SparkTestBase {

  /** Write a small zarr v3 store: root group, 1-D int64 array `temp`
    * (default `c/` keys), 2-D float64 array `grid` (v2 `.` keys).
    */
  private def writeFixture(dir: String): Unit = {
    def put(rel: String, bytes: Array[Byte]): Unit = {
      val p = Paths.get(dir, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
    }
    def putS(rel: String, s: String): Unit =
      put(rel, s.getBytes("UTF-8"))
    putS("zarr.json", """{"zarr_format":3,"node_type":"group"}""")
    putS("temp/zarr.json",
      """{"zarr_format":3,"node_type":"array","shape":[10],
        |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[4]}},
        |"data_type":"int64","dimension_names":["x"],
        |"codecs":[{"name":"bytes","configuration":{"endian":"little"}}],
        |"attributes":{"units":"kelvin"}}""".stripMargin)
    for (c <- 0 until 3)
      put(s"temp/c/$c", ChunkCodec.encodeLongs(
        Array.tabulate(4)(i => c * 40L + i * 10), "int64"))
    putS("grid/zarr.json",
      """{"zarr_format":3,"node_type":"array","shape":[4,6],
        |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[2,3]}},
        |"data_type":"float64",
        |"chunk_key_encoding":{"name":"v2","configuration":{"separator":"."}}}
        |""".stripMargin)
    for (c0 <- 0 until 2; c1 <- 0 until 2)
      put(s"grid/$c0.$c1", ChunkCodec.encodeDoubles(
        Array.tabulate(6)(i => (c0 * 100 + c1 * 10 + i).toDouble),
        "float64"))
  }

  test("virtual import: zero-copy adoption, values readable, metadata kept") {
    val srcDir = tmpDir("zsrc")
    writeFixture(srcDir)
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val id = ZarrImport.importStore(repo, "main", Store.local(srcDir))
    assert(id.nonEmpty)

    val ro = repo.readonlySession(VersionRef.Branch("main"))
    // node tree + metadata survived (full zarr.json doc as userData)
    val temp = ro.node("/temp").get
    assert(temp.shape == Seq(10L) && temp.chunkShape == Seq(4L))
    assert(temp.dimNames == Seq("x"))
    assert(temp.userData.contains("\"units\":\"kelvin\"") ||
      temp.userData.contains("kelvin"))
    // refs are VIRTUAL and point at the source files
    val refs = ro.refs("/temp").collect()
    assert(refs.length == 3)
    assert(refs.forall(_.getAs[String]("kind") == "virtual"))
    assert(refs.forall(_.getAs[String]("location")
      .startsWith("file:")), refs.map(_.getAs[String]("location")).toSeq)
    // values decode through the virtual fetch; bounds clip cell 10,11
    val vals = TensorPlane.values(ro, "/temp", "int64").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vals.size == 10)
    assert(vals(0L) == 0 && vals(5L) == 50 && vals(9L) == 90)

    // 2-D v2-encoded array
    val g = TensorPlane.values(ro, "/grid", "float64").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(g.size == 24)
    assert(g((0L, 0L)) == 0.0 && g((2L, 4L)) == 111.0 &&
      g((3L, 5L)) == 115.0)

    // catalog dtype probe reads data_type straight from the adopted doc
    val cat = "zimp" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path",
      repo.store.rootUri.stripPrefix("file:"))
    val r = spark.sql(s"SELECT sum(value) AS s FROM $cat.temp").head()
    assert(r.getLong(0) == (0 until 10).map(_ * 10L).sum)
  }

  test("copy import decouples from the source store") {
    val srcDir = tmpDir("zsrc2")
    writeFixture(srcDir)
    val repo = Repository.create(Store.local(tmpDir("repo2")), spark)
    ZarrImport.importStore(repo, "main", Store.local(srcDir), copy = true)
    // delete the source entirely: native chunk objects must still serve
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(srcDir))
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/temp").collect()
      .forall(_.getAs[String]("kind") == "ref"))
    val vals = TensorPlane.values(ro, "/temp", "int64").collect()
    assert(vals.length == 10)
    val st = TensorPlane.arrayStats(ro, "/grid", "float64").head()
    assert(st.getAs[Long]("n") == 24) // aligned: no padding
  }

  test("refusals: unsupported codecs, bad chunk keys, non-zarr dirs") {
    val d1 = tmpDir("zbad1")
    Files.createDirectories(Paths.get(d1, "a"))
    Files.write(Paths.get(d1, "a", "zarr.json"),
      """{"zarr_format":3,"node_type":"array","shape":[4],
        |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[2]}},
        |"data_type":"int64","codecs":[{"name":"blosc"}]}"""
        .stripMargin.getBytes("UTF-8"))
    val r1 = Repository.create(Store.local(tmpDir("zr1")), spark)
    val e1 = intercept[GraftException] {
      ZarrImport.importStore(r1, "main", Store.local(d1))
    }
    assert(e1.getMessage.contains("unsupported top-level codecs"),
      e1.getMessage)

    val d2 = tmpDir("zbad2")
    Files.createDirectories(Paths.get(d2, "a", "c"))
    Files.write(Paths.get(d2, "a", "zarr.json"),
      """{"zarr_format":3,"node_type":"array","shape":[4],
        |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[2]}},
        |"data_type":"int64"}""".stripMargin.getBytes("UTF-8"))
    Files.write(Paths.get(d2, "a", "c", "notanumber"),
      Array[Byte](1, 2))
    val r2 = Repository.create(Store.local(tmpDir("zr2")), spark)
    val e2 = intercept[GraftException] {
      ZarrImport.importStore(r2, "main", Store.local(d2))
    }
    assert(e2.getMessage.contains("unparseable chunk key"), e2.getMessage)

    val d3 = tmpDir("zbad3")
    Files.createDirectories(Paths.get(d3))
    Files.write(Paths.get(d3, "readme.txt"), "hi".getBytes("UTF-8"))
    val r3 = Repository.create(Store.local(tmpDir("zr3")), spark)
    val e3 = intercept[GraftException] {
      ZarrImport.importStore(r3, "main", Store.local(d3))
    }
    assert(e3.getMessage.contains("no zarr.json"), e3.getMessage)
  }

  test("export: a pinned version publishes as plain zarr; round-trips") {
    val repo = Repository.create(Store.local(tmpDir("xrepo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/t", Seq(10), Seq(4), Seq("x"),
      userData = """{"dtype":"int64"}""")
    for (c <- 0 until 3)
      s.writeChunk("/t", Seq(c), ChunkCodec.encodeLongs(
        Array.tabulate(4)(i => c * 4L + i), "int64"))
    s.commit("v1")
    val v1 = repo.readonlySession(VersionRef.Branch("main")).base.id
    // branch advances AFTER the pin: the export must not see this
    val s2 = repo.writableSession("main")
    s2.writeChunk("/t", Seq(0),
      ChunkCodec.encodeLongs(Array.fill(4)(99L), "int64"))
    s2.commit("v2")

    val out = tmpDir("zout")
    val pinned = repo.readonlySession(VersionRef.SnapshotVer(v1))
    val nChunks = graft.ops.ZarrExport.exportStore(pinned,
      Store.local(out))
    assert(nChunks == 3)
    // the published layout is plain zarr v3
    val doc = new String(Files.readAllBytes(Paths.get(out, "t/zarr.json")),
      "UTF-8")
    assert(doc.contains("\"zarr_format\":3") &&
      doc.contains("\"chunk_shape\":[4]") &&
      doc.contains("\"data_type\":\"int64\"") &&
      doc.contains("\"dimension_names\":[\"x\"]"), doc)
    // chunk 0 carries v1 bytes, not the later edit
    assert(Files.readAllBytes(Paths.get(out, "t/c/0")).sameElements(
      ChunkCodec.encodeLongs(Array.tabulate(4)(_.toLong), "int64")))

    // round trip: re-import the export into a fresh repo
    val repo2 = Repository.create(Store.local(tmpDir("xrepo2")), spark)
    graft.ops.ZarrImport.importStore(repo2, "main", Store.local(out))
    val vals = TensorPlane.values(
      repo2.readonlySession(VersionRef.Branch("main")), "/t", "int64")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vals == (0 until 10).map(i => i.toLong -> i.toLong).toMap)
  }

  test("rectilinear export publishes the rect chunk_grid; re-import " +
      "round-trips byte-identically") {
    val repo = Repository.create(Store.local(tmpDir("rxrepo")), spark)
    val s = repo.writableSession("main")
    val sizes = Seq(3L, 5L, 2L)
    s.addArrayRectilinear("/r", Seq(10), Seq(sizes), Seq("x"),
      userData = """{"dtype":"int64"}""")
    var start = 0L
    sizes.zipWithIndex.foreach { case (len, c) =>
      s.writeChunk("/r", Seq(c), ChunkCodec.encodeLongs(
        Array.tabulate(len.toInt)(i => start + i), "int64"))
      start += len
    }
    s.commit("rect")
    val out = tmpDir("rzout")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(graft.ops.ZarrExport.exportStore(ro, Store.local(out)) == 3)
    val doc = new String(Files.readAllBytes(Paths.get(out, "r/zarr.json")),
      "UTF-8")
    assert(doc.contains("\"rectilinear\"") &&
      doc.contains("\"chunk_shapes\":[[3,5,2]]"), doc)
    // exact-extent payloads: the 5-cell chunk is 40 bytes on disk
    assert(Files.readAllBytes(Paths.get(out, "r/c/1")).length == 40)
    val repo2 = Repository.create(Store.local(tmpDir("rxrepo2")), spark)
    graft.ops.ZarrImport.importStore(repo2, "main", Store.local(out))
    val ro2 = repo2.readonlySession(VersionRef.Branch("main"))
    val n2 = ro2.node("/r").get
    assert(n2.isRectilinear && n2.chunkSizesPerDim == Seq(sizes))
    val vals = TensorPlane.values(ro2, "/r", "int64")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vals == (0 until 10).map(i => i.toLong -> i.toLong).toMap)
    // sharded export of a rect grid is refused, not silently regularized
    val ex = intercept[GraftException](graft.ops.ZarrExport.exportStore(
      ro, Store.local(tmpDir("rzout2")), shardChunks = Seq(2)))
    assert(ex.getMessage.contains("regular chunk grid"))
  }

  /** Reference chunk_shapes grammar (store.rs:1303-1330): entries mix
    * plain sizes with run-length-encoded [size, count] runs. Import must
    * expand them (stores written by the reference with RLE tables), and
    * export can emit them (`rleChunkShapes = true`, runs >= 3 compress).
    */
  test("RLE chunk_shapes: import expands [size,count] runs; export emits them") {
    val repo = Repository.create(Store.local(tmpDir("rlerepo")), spark)
    val s = repo.writableSession("main")
    // 1,1,1,1,1,4,2,2,2 (a >=3 run, a single, another run) tiling 15
    val sizes = Seq(1L, 1L, 1L, 1L, 1L, 4L, 2L, 2L, 2L)
    s.addArrayRectilinear("/r", Seq(15), Seq(sizes), Seq("x"),
      userData = """{"dtype":"int64"}""")
    var start = 0L
    sizes.zipWithIndex.foreach { case (len, c) =>
      s.writeChunk("/r", Seq(c), ChunkCodec.encodeLongs(
        Array.tabulate(len.toInt)(i => start + i), "int64"))
      start += len
    }
    s.commit("rle rect")
    val out = tmpDir("rleout")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    graft.ops.ZarrExport.exportStore(ro, Store.local(out),
      rleChunkShapes = true)
    val doc = new String(Files.readAllBytes(Paths.get(out, "r/zarr.json")),
      "UTF-8")
    assert(doc.contains("\"chunk_shapes\":[[[1,5],4,[2,3]]]"), doc)
    // import expands the runs back to the full table
    val repo2 = Repository.create(Store.local(tmpDir("rlerepo2")), spark)
    graft.ops.ZarrImport.importStore(repo2, "main", Store.local(out))
    val ro2 = repo2.readonlySession(VersionRef.Branch("main"))
    val n2 = ro2.node("/r").get
    assert(n2.isRectilinear && n2.chunkSizesPerDim == Seq(sizes))
    val vals = TensorPlane.values(ro2, "/r", "int64")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vals == (0 until 15).map(i => i.toLong -> i.toLong).toMap)
    // the zarr facade's metadata parser accepts the RLE form too
    val s3 = repo.writableSession("main")
    val z = new graft.zarr.ZarrStore(s3)
    z.set("q/zarr.json",
      ("""{"zarr_format":3,"node_type":"array","shape":[15],""" +
        """"chunk_grid":{"name":"rectilinear","configuration":""" +
        """{"chunk_shapes":[[[1,5],4,[2,3]]]}},"data_type":"int64",""" +
        """"chunk_key_encoding":{"name":"default","configuration":""" +
        """{"separator":"/"}},"fill_value":0,"codecs":[{"name":"bytes",""" +
        """"configuration":{"endian":"little"}}]}""").getBytes)
    assert(s3.node("/q").get.chunkSizesPerDim == Seq(sizes))
  }

  test("export re-emits adopted zarr docs verbatim (attributes survive)") {
    val srcDir = tmpDir("zsrc4")
    writeFixture(srcDir)
    val repo = Repository.create(Store.local(tmpDir("arepo")), spark)
    ZarrImport.importStore(repo, "main", Store.local(srcDir))
    val out = tmpDir("zout2")
    graft.ops.ZarrExport.exportStore(
      repo.readonlySession(VersionRef.Branch("main")), Store.local(out))
    val doc = new String(
      Files.readAllBytes(Paths.get(out, "temp/zarr.json")), "UTF-8")
    assert(doc.contains("kelvin"), doc) // attributes preserved end to end
    // exported chunks are byte-identical to the adopted source
    assert(Files.readAllBytes(Paths.get(out, "temp/c/1")).sameElements(
      Files.readAllBytes(Paths.get(srcDir, "temp/c/1"))))
  }

  test("zarr v2 stores import; import -> export is the v2 -> v3 migration") {
    val srcDir = tmpDir("v2src")
    def put(rel: String, bytes: Array[Byte]): Unit = {
      val p = Paths.get(srcDir, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
    }
    def putS(rel: String, s: String): Unit = put(rel, s.getBytes("UTF-8"))
    putS(".zgroup", """{"zarr_format":2}""")
    putS("legacy/.zarray",
      """{"zarr_format":2,"shape":[6],"chunks":[3],"dtype":"<i8",
        |"compressor":null,"order":"C","filters":null}""".stripMargin)
    putS("legacy/.zattrs", """{"source":"pre-graft pipeline"}""")
    for (c <- 0 until 2)
      put(s"legacy/$c", ChunkCodec.encodeLongs(
        Array.tabulate(3)(i => c * 30L + i), "int64"))

    val repo = Repository.create(Store.local(tmpDir("v2repo")), spark)
    ZarrImport.importStore(repo, "main", Store.local(srcDir))
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val n = ro.node("/legacy").get
    assert(n.shape == Seq(6L) && n.chunkShape == Seq(3L))
    // synthesized v3 doc: dtype mapped, .zattrs folded in
    assert(n.userData.contains("\"data_type\":\"int64\"") &&
      n.userData.contains("pre-graft pipeline"), n.userData)
    val vals = TensorPlane.values(ro, "/legacy", "int64").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vals == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 30L,
      4L -> 31L, 5L -> 32L))

    // migration: export the adopted v2 store -> plain zarr V3
    val out = tmpDir("v2out")
    graft.ops.ZarrExport.exportStore(ro, Store.local(out))
    val doc = new String(
      Files.readAllBytes(Paths.get(out, "legacy/zarr.json")), "UTF-8")
    assert(doc.contains("\"zarr_format\":3") &&
      doc.contains("pre-graft pipeline"), doc)
    // v3 keys use the doc's declared (v2 ".") encoding? No: export
    // always writes default c/ keys and says so in the fresh doc it
    // could not have copied — the ADOPTED doc declares v2 encoding, so
    // the exporter's verbatim re-emit would mislabel the keys it wrote.
    // Instead the exported chunks must be readable as declared:
    val repo2 = Repository.create(Store.local(tmpDir("v2repo2")), spark)
    ZarrImport.importStore(repo2, "main", Store.local(out))
    val vals2 = TensorPlane.values(
      repo2.readonlySession(VersionRef.Branch("main")), "/legacy",
      "int64").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vals2 == vals)

    // refusals: big-endian dtype, blosc compressor
    val bad = tmpDir("v2bad")
    Files.createDirectories(Paths.get(bad, "x"))
    Files.write(Paths.get(bad, "x", ".zarray"),
      """{"zarr_format":2,"shape":[4],"chunks":[2],"dtype":">i8",
        |"compressor":null,"order":"C","filters":null}"""
        .stripMargin.getBytes("UTF-8"))
    val rb = Repository.create(Store.local(tmpDir("v2rb")), spark)
    val e = intercept[GraftException] {
      ZarrImport.importStore(rb, "main", Store.local(bad))
    }
    assert(e.getMessage.contains("unsupported v2 dtype"), e.getMessage)
  }

  test("imported store keeps versioning: edits fork, original time-travels") {
    val srcDir = tmpDir("zsrc3")
    writeFixture(srcDir)
    val repo = Repository.create(Store.local(tmpDir("repo3")), spark)
    ZarrImport.importStore(repo, "main", Store.local(srcDir))
    val v0 = repo.readonlySession(VersionRef.Branch("main")).base.id

    // overwrite one chunk natively; source files stay untouched
    val s = repo.writableSession("main")
    s.writeChunk("/temp", Seq(0),
      ChunkCodec.encodeLongs(Array.fill(4)(-1L), "int64"))
    s.commit("edit after adoption")
    val now = TensorPlane.values(
      repo.readonlySession(VersionRef.Branch("main")), "/temp", "int64")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(now(0L) == -1 && now(5L) == 50)
    val old = TensorPlane.values(
      repo.readonlySession(VersionRef.SnapshotVer(v0)), "/temp", "int64")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(old(0L) == 0)
    // the source chunk file is byte-identical (nothing wrote through)
    assert(Files.readAllBytes(Paths.get(srcDir, "temp/c/0")).sameElements(
      ChunkCodec.encodeLongs(Array.tabulate(4)(i => i * 10L), "int64")))
  }

  /** A `sharding_indexed` store: 1-D shape 40, shard shape 20, inner
    * chunks of 5 — 2 shard objects × 4 inner chunks, with inner chunk
    * (shard 1, idx 2) ABSENT (all-ones index entry). v(i) = i*3 + 7.
    */
  private def writeShardedFixture(dir: String,
                                  indexAtEnd: Boolean): Unit = {
    def put(rel: String, bytes: Array[Byte]): Unit = {
      val p = Paths.get(dir, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
    }
    val loc = if (indexAtEnd) "end" else "start"
    put("zarr.json",
      """{"zarr_format":3,"node_type":"group"}""".getBytes("UTF-8"))
    put("v/zarr.json",
      s"""{"zarr_format":3,"node_type":"array","shape":[40],
         |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[20]}},
         |"data_type":"int64","attributes":{"origin":"sharded"},
         |"codecs":[{"name":"sharding_indexed","configuration":{
         |  "chunk_shape":[5],
         |  "codecs":[{"name":"bytes","configuration":{"endian":"little"}}],
         |  "index_codecs":[{"name":"bytes"},{"name":"crc32c"}],
         |  "index_location":"$loc"}}]}""".stripMargin.getBytes("UTF-8"))
    for (s <- 0 until 2) {
      val inner = (0 until 4).map { e =>
        if (s == 1 && e == 2) None
        else Some(ChunkCodec.encodeLongs(Array.tabulate(5) { i =>
          (s * 20 + e * 5 + i) * 3L + 7 }, "int64"))
      }
      val payload = inner.flatten.flatMap(_.toSeq).toArray
      val index = java.nio.ByteBuffer.allocate(4 * 16 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var off = if (indexAtEnd) 0L else (4 * 16 + 4).toLong
      inner.foreach {
        case Some(b) => index.putLong(off).putLong(b.length.toLong)
          off += b.length
        case None => index.putLong(-1L).putLong(-1L)
      }
      index.putInt(0) // crc32c placeholder (length-accounted, unverified)
      val bytes =
        if (indexAtEnd) payload ++ index.array()
        else index.array() ++ payload
      put(s"v/c/$s", bytes)
    }
  }

  test("sharded store adoption: per-inner-chunk virtual refs from shard indexes") {
    for (atEnd <- Seq(true, false)) {
      val srcDir = tmpDir("zshard")
      writeShardedFixture(srcDir, indexAtEnd = atEnd)
      val repo = Repository.create(Store.local(tmpDir("zshard-repo")), spark)
      ZarrImport.importStore(repo, "main", Store.local(srcDir))
      val ro = repo.readonlySession(VersionRef.Branch("main"))
      // graft adopts the INNER grid: 7 present inner chunks of 8 slots
      val n = ro.node("/v").get
      assert(n.chunkShape == Seq(5L), s"inner grid (atEnd=$atEnd)")
      assert(ro.refs("/v").count() == 7)
      // refs point INTO the shard objects with nonzero offsets
      val offs = ro.refs("/v").select("kind", "offset", "length").collect()
      assert(offs.forall(_.getString(0) == "virtual"))
      assert(offs.map(_.getLong(2)).toSet == Set(40L))
      if (atEnd) assert(offs.map(_.getLong(1)).toSet.size > 1)
      // values decode through the ranged virtual fetch; the absent inner
      // chunk (cells 30..34) reads as missing
      val vals = TensorPlane.values(ro, "/v", "int64")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(vals.size == 35, s"35 cells, got ${vals.size}")
      for (i <- 0 until 40 if i < 30 || i >= 35)
        assert(vals(i.toLong) == i * 3L + 7, s"cell $i (atEnd=$atEnd)")
      assert(!vals.contains(32L))
      // the stored doc was re-synthesized on the inner grid (attributes
      // kept, sharding codec dropped) so export reconstructs correctly
      val doc = n.userData
      assert(doc.contains("\"origin\":\"sharded\""))
      assert(!doc.contains("sharding_indexed"))
      assert(doc.contains("\"chunk_shape\":[5]"))
    }
  }

  test("sharded export: publish with sharding_indexed, re-import round-trips") {
    val repo = Repository.create(Store.local(tmpDir("shx-repo")), spark)
    val s = repo.writableSession("main")
    // 5 chunks of 4 cells, one absent -> 3 shards of 2 chunks (ragged
    // last), absent chunk = missing index entry
    s.addArray("/t", Seq(20), Seq(4), userData = """{"dtype":"int64"}""")
    for (c <- Seq(0, 1, 2, 4))
      s.writeChunk("/t", Seq(c), ChunkCodec.encodeLongs(
        Array.tabulate(4)(i => c * 100L + i), "int64"))
    s.commit("data")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    val out = tmpDir("shx-out")
    val nObjects = graft.ops.ZarrExport.exportStore(ro, Store.local(out),
      shardChunks = Seq(2))
    assert(nObjects == 3, s"3 shard objects, got $nObjects")
    // the published doc declares the sharding codec on the shard grid
    val doc = new String(Files.readAllBytes(Paths.get(out, "t/zarr.json")),
      "UTF-8")
    assert(doc.contains("sharding_indexed") &&
      doc.contains("\"chunk_shape\":[8]"), doc)
    // a real crc32c rides at the index end of each shard
    val shard0 = Files.readAllBytes(Paths.get(out, "t/c/0"))
    val idxOff = shard0.length - (2 * 16 + 4)
    val crc = new java.util.zip.CRC32C
    crc.update(shard0, idxOff, 2 * 16)
    val stored = java.nio.ByteBuffer.wrap(shard0, idxOff + 32, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(stored == crc.getValue.toInt, "index crc32c")
    // re-import the sharded publication: inner grid, same values
    val repo2 = Repository.create(Store.local(tmpDir("shx-repo2")), spark)
    ZarrImport.importStore(repo2, "main", Store.local(out))
    val ro2 = repo2.readonlySession(VersionRef.Branch("main"))
    assert(ro2.node("/t").get.chunkShape == Seq(4L))
    assert(ro2.refs("/t").count() == 4)
    val vals = TensorPlane.values(ro2, "/t", "int64")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vals.size == 16)
    for (c <- Seq(0, 1, 2, 4); i <- 0 until 4)
      assert(vals((c * 4 + i).toLong) == c * 100L + i)
  }

  test("sharded copy mode: inner chunks re-upload as native objects") {
    val srcDir = tmpDir("zshard-c")
    writeShardedFixture(srcDir, indexAtEnd = true)
    val repo = Repository.create(Store.local(tmpDir("zshardc-repo")), spark)
    ZarrImport.importStore(repo, "main", Store.local(srcDir), copy = true)
    // source can vanish — payloads are native now
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(srcDir))
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/v").select("kind").collect()
      .forall(_.getString(0) == "ref"))
    val vals = TensorPlane.values(ro, "/v", "int64")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vals.size == 35 && vals(17L) == 17 * 3L + 7)
  }
}
