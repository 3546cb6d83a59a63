package graft

import graft.functions.ChunkCodec
import graft.meta.ChunkRef
import graft.repo._
import graft.storage._
import graft.storage.s3.S3MemServer
import graft.virt.{HttpAccess, VirtualChunkContainer, VirtualChunkResolver}

/** Credentialed virtual chunk containers (the reference's per-container
  * object-store config, virtual_chunks.rs:122-180): `s3://` virtual refs
  * fetched through a container-scoped store client with ranged GETs, etag
  * / last-modified freshness enforcement via store HEAD, and the
  * connector option surface (`virtual.<name>.*`).
  */
class VirtualContainersSpec extends SparkTestBase {

  /** External bucket holding raw bytes the repo never copied. */
  private def extFixture(): (S3MemServer, S3StoreConf, Array[Byte]) = {
    val server = new S3MemServer
    server.createBucket("ext")
    val conf = S3StoreConf(server.endpoint, "us-east-1", "ext",
      accessKey = "k", secretKey = "s")
    val payload = Array.tabulate[Byte](4096)(i => (i % 251).toByte)
    conf.open().putBytes("data/blob.bin", payload)
    (server, conf, payload)
  }

  test("s3 container: ranged fetch through the container store; vcc:// relative refs") {
    val (server, extConf, payload) = extFixture()
    try {
      val resolver = new VirtualChunkResolver(Seq(
        VirtualChunkContainer("s3://ext/data/", "ext", Some(extConf))))
      val repo = Repository.create(Store.local(tmpDir("vcs")), spark,
        resolver = resolver)
      val s = repo.writableSession("main")
      s.addArray("/v", Seq(4), Seq(1))
      s.setVirtualRef("/v", Seq(0), "s3://ext/data/blob.bin", 0, 100)
      s.setVirtualRef("/v", Seq(1), "s3://ext/data/blob.bin", 1000, 50)
      // relative ref against the named container
      s.setVirtualRef("/v", Seq(2), "vcc://ext/blob.bin", 2000, 25)
      s.commit("virtual refs")

      val ro = repo.readonlySession(VersionRef.Branch("main"))
      assert(ro.getChunk("/v", Seq(0)).get.toSeq == payload.take(100).toSeq)
      assert(ro.getChunk("/v", Seq(1)).get.toSeq ==
        payload.slice(1000, 1050).toSeq)
      assert(ro.getChunk("/v", Seq(2)).get.toSeq ==
        payload.slice(2000, 2025).toSeq)
      // the engine issued ranged GETs against the external store, never a
      // full-object read
      assert(server.opCounts.get("get_range").get() >= 3)
      // locations outside the registered prefix are rejected at set-time
      // raw setChunkRef is validated too, not just setVirtualRef
      val bad = intercept[GraftException] {
        s.setChunkRef("/v", Seq(3), ChunkRef.virtualRef("", Seq(3),
          "s3://other/data/x.bin", 0, 10))
      }
      assert(bad.getMessage.contains("no virtual chunk container"))
    } finally server.stop()
  }

  test("s3 container: etag + last-modified freshness checks via store HEAD") {
    val (server, extConf, _) = extFixture()
    try {
      val ext = extConf.open()
      val st = ext.stat("data/blob.bin").get
      assert(st.size == 4096 && st.etag.nonEmpty && st.mtimeMillis > 0)

      val resolver = new VirtualChunkResolver(Seq(
        VirtualChunkContainer("s3://ext/", "ext", Some(extConf))))
      val repo = Repository.create(Store.local(tmpDir("vce")), spark,
        resolver = resolver)
      val s = repo.writableSession("main")
      s.addArray("/v", Seq(3), Seq(1))
      s.setVirtualRef("/v", Seq(0), "s3://ext/data/blob.bin", 0, 16,
        etag = st.etag)
      s.setVirtualRef("/v", Seq(1), "s3://ext/data/blob.bin", 16, 16,
        lastModified = (st.mtimeMillis / 1000 + 3600).toInt)
      s.setVirtualRef("/v", Seq(2), "s3://ext/data/blob.bin", 32, 16,
        etag = st.etag)
      s.commit("checked refs")

      val ro = repo.readonlySession(VersionRef.Branch("main"))
      // matching etag and a future last-modified bound both pass
      assert(ro.getChunk("/v", Seq(0)).get.length == 16)
      assert(ro.getChunk("/v", Seq(1)).get.length == 16)

      // rewrite the external object: etag changes -> recorded etag fails
      ext.putBytes("data/blob.bin", Array.fill[Byte](4096)(7))
      val err = intercept[GraftException] { ro.getChunk("/v", Seq(2)) }
      assert(err.getMessage.contains("changed"))
      // unchecked ranged reads still work (freshness is per-ref opt-in)
      assert(ro.getChunk("/v", Seq(1)).get.toSeq ==
        Array.fill[Byte](16)(7).toSeq)
    } finally server.stop()
  }

  test("executor-path fetch: value plane + graft-v2 values scan over s3 virtual refs") {
    val (server, extConf, _) = extFixture()
    try {
      // external object = 64 raw int64 little-endian values 0..63
      val ext = extConf.open()
      ext.putBytes("data/ints.bin",
        ChunkCodec.encodeLongs(Array.tabulate(64)(_.toLong), "int64"))

      val dir = tmpDir("vcx")
      val resolver = new VirtualChunkResolver(Seq(
        VirtualChunkContainer("s3://ext/data/", "ext", Some(extConf))))
      val repo = Repository.create(Store.local(dir), spark,
        resolver = resolver)
      val s = repo.writableSession("main")
      s.addArray("/ints", Seq(64), Seq(16))
      for (c <- 0 until 4) // each chunk = a 128-byte range of the object
        s.setVirtualRef("/ints", Seq(c), "s3://ext/data/ints.bin",
          c * 128L, 128L)
      s.commit("virtual int chunks")

      // library value plane: resolver ships inside the fetch UDF closure
      val ro = repo.readonlySession(VersionRef.Branch("main"))
      val stats = graft.tensor.TensorPlane.arrayStats(ro, "/ints", "int64")
        .head()
      assert(stats.getAs[Long]("n") == 64L)
      assert(stats.getAs[Double]("sum") == (0 until 64).sum.toDouble)

      // DSv2 values scan with containers supplied as connector options
      val v = spark.read.format("graft-v2")
        .option("path", dir).option("array", "/ints")
        .option("mode", "values").option("dtype", "int64")
        .option("virtual.ext.prefix", "s3://ext/data/")
        .option("virtual.ext.s3.endpoint", extConf.endpoint)
        .option("virtual.ext.s3.bucket", "ext")
        .option("virtual.ext.s3.access-key", "k")
        .option("virtual.ext.s3.secret-key", "s")
        .load()
      import org.apache.spark.sql.functions._
      val r = v.agg(sum(col("value")), count(lit(1))).head()
      assert(r.getLong(0) == (0 until 64).sum.toLong && r.getLong(1) == 64L)
    } finally server.stop()
  }

  test("http+graft / http+g schemes resolve to plain-http targets (#2262)") {
    val server = new graft.storage.http.HttpMemServer
    try {
      val payload = Array.tabulate[Byte](512)(i => (i % 127).toByte)
      server.put("data/blob.bin", payload)
      // the container is registered against the CANONICAL http:// prefix;
      // refs carrying a +graft/+g disambiguation scheme must match it
      val resolver = new VirtualChunkResolver(Seq(
        VirtualChunkContainer(s"${server.endpoint}/data/", "pub",
          access = Some(HttpAccess))))
      assert(resolver.expandLocation(
        s"http+graft://127.0.0.1:${server.port}/data/blob.bin") ==
        s"${server.endpoint}/data/blob.bin")
      assert(resolver.expandLocation("https+g://h/x") == "https://h/x")
      val repo = Repository.create(Store.local(tmpDir("plushttp")), spark,
        resolver = resolver)
      val s = repo.writableSession("main")
      s.addArray("/v", Seq(2), Seq(1))
      s.setVirtualRef("/v", Seq(0),
        s"http+graft://127.0.0.1:${server.port}/data/blob.bin", 0, 64)
      s.setVirtualRef("/v", Seq(1),
        s"http+g://127.0.0.1:${server.port}/data/blob.bin", 100, 32)
      s.commit("tagged-scheme refs")
      val ro = repo.readonlySession(VersionRef.Branch("main"))
      assert(ro.getChunk("/v", Seq(0)).get.toSeq == payload.take(64).toSeq)
      assert(ro.getChunk("/v", Seq(1)).get.toSeq ==
        payload.slice(100, 132).toSeq)
    } finally server.stop()
  }

  test("fromOptions: prefix-only containers need an explicit access sentinel (#2194)") {
    // no store options AND no access sentinel: registered but refused
    // BY NAME at set-time validation — never silently anonymous
    val bare = VirtualChunkResolver.fromOptions(Map(
      "virtual.pub.prefix" -> "https://example.org/data/"))
    assert(bare.containerMap == Map("pub" -> "https://example.org/data/"))
    assert(bare.expandLocation("vcc://pub/x.bin") ==
      "https://example.org/data/x.bin")
    val e = intercept[graft.repo.GraftException] {
      bare.validateLocation("https://example.org/data/x.bin")
    }
    assert(e.getMessage.contains("'pub'") &&
      e.getMessage.contains("sentinel"), e.getMessage)
    // with the sentinel the same container authorizes
    val ok = VirtualChunkResolver.fromOptions(Map(
      "virtual.pub.prefix" -> "https://example.org/data/",
      "virtual.pub.access" -> "http"))
    ok.validateLocation("https://example.org/data/x.bin")
    // a sentinel that does not cover the scheme refuses too
    val wrong = VirtualChunkResolver.fromOptions(Map(
      "virtual.ext.prefix" -> "s3://extbucket/",
      "virtual.ext.access" -> "http"))
    val e2 = intercept[graft.repo.GraftException] {
      wrong.validateLocation("s3://extbucket/x.bin")
    }
    assert(e2.getMessage.contains("does not cover"), e2.getMessage)
    // unknown sentinel name is refused at parse time
    intercept[graft.repo.GraftException] {
      VirtualChunkResolver.fromOptions(Map(
        "virtual.p.prefix" -> "s3://b/", "virtual.p.access" -> "maybe"))
    }
    // file: catch-all stays registered (LocalFileSystemAccess sentinel)
    ok.validateLocation("file:/tmp/whatever")
    val none = VirtualChunkResolver.fromOptions(Map("path" -> "/tmp/x"))
    assert(none eq VirtualChunkResolver.default)
  }

  test("sentinel container fetches anonymously; bare container refuses at fetch (#2194)") {
    val server = new graft.storage.http.HttpMemServer
    try {
      val payload = Array.tabulate[Byte](256)(i => (i % 101).toByte)
      server.put("data/pub.bin", payload)
      // explicit HttpAccess: anonymous fetch through scheme dispatch
      val authorized = new VirtualChunkResolver(Seq(
        VirtualChunkContainer(s"${server.endpoint}/data/", "pub",
          access = Some(HttpAccess))))
      assert(authorized.ranged(s"${server.endpoint}/data/pub.bin", 16, 32)
        .toSeq == payload.slice(16, 48).toSeq)
      // same container WITHOUT the sentinel: refused by name, both at
      // set-time validation and on the fetch hot path
      val bare = new VirtualChunkResolver(Seq(
        VirtualChunkContainer(s"${server.endpoint}/data/", "pub")))
      val e = intercept[graft.repo.GraftException] {
        bare.ranged(s"${server.endpoint}/data/pub.bin", 16, 32)
      }
      assert(e.getMessage.contains("'pub'"), e.getMessage)
      // a location matching NO container refuses as well (readers opt in
      // per container; there is no anonymous scheme-dispatch fallback)
      val e2 = intercept[graft.repo.GraftException] {
        authorized.ranged(s"${server.endpoint}/other/x.bin", 0, 8)
      }
      assert(e2.getMessage.contains("no virtual chunk container"),
        e2.getMessage)
    } finally server.stop()
  }
}
