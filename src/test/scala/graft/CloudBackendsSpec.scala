package graft

import graft.repo._
import graft.storage._
import graft.storage.az.AzureMemServer
import graft.storage.gcs.GcsMemServer
import graft.storage.s3.S3MemServer
import graft.virt.{VirtualChunkContainer, VirtualChunkResolver}

/** The engine running on the native GCS and Azure backends (the
  * reference's backend matrix beyond S3,
  * icechunk-arrow-object-store/src/lib.rs): repository lifecycle, Spark
  * Parquet IO through graft://, commits through each store's
  * conditional-create primitive, and virtual-chunk fetch for `gs://` and
  * `az://` locations — credentialed container stores and bare-scheme
  * anonymous fetch.
  */
class CloudBackendsSpec extends SparkTestBase {

  private def gcsRepo(): (GcsMemServer, Repository) = {
    val server = new GcsMemServer
    server.createBucket("engine")
    val store = GcsStoreConf(server.endpoint, "engine",
      prefix = "repos/alpha", bearerToken = "tok").open()
    (server, Repository.create(store, spark))
  }

  private def azureRepo(): (AzureMemServer, Repository) = {
    val server = new AzureMemServer
    server.createContainer("engine")
    val store = AzureStoreConf(server.endpoint, "acct", "engine",
      prefix = "repos/alpha", sasToken = "sv=1&sig=x").open()
    (server, Repository.create(store, spark))
  }

  test("repo on GCS: write chunks, commit via ifGenerationMatch, read back") {
    val (server, repo) = gcsRepo()
    try {
      val s = repo.writableSession("main")
      s.addArray("/cube", Seq(16, 16), Seq(4, 4))
      for (i <- 0 until 2; j <- 0 until 2)
        s.writeChunk("/cube", Seq(i, j),
          Array.fill[Byte](2048)((i * 2 + j).toByte))
      val c1 = s.commit("four chunks")
      assert(c1.nonEmpty)
      // commits rode the conditional-create primitive
      assert(server.opCounts.get("insert_conditional").get() >= 1)

      val ro = repo.readonlySession(VersionRef.Branch("main"))
      assert(ro.refs("/cube").count() == 4) // manifest Parquet via graft://
      assert(ro.getChunk("/cube", Seq(1, 1)).get.head == 3.toByte)
      // ranged read against the JSON API media path
      val ref = ro.getChunkRef("/cube", Seq(0, 1)).get
      assert(repo.assets.readChunk(ref.chunk_id, 100, 16).toSeq ==
        Array.fill[Byte](16)(1.toByte).toSeq)

      // concurrent committers serialize through the conditional insert
      import scala.concurrent._
      import scala.concurrent.duration._
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val ids = Await.result(Future.sequence((0 until 3).map(w => Future {
        val sw = repo.writableSession("main")
        sw.writeChunk("/cube", Seq(w, 3), Array[Byte](w.toByte))
        sw.commit(s"w$w")
      })), 300.seconds)
      pool.shutdown()
      assert(ids.distinct.size == 3)
      assert(repo.readonlySession(VersionRef.Branch("main"))
        .refs("/cube").count() == 7)
    } finally server.stop()
  }

  test("repo on Azure: write chunks, commit via If-None-Match, read back") {
    val (server, repo) = azureRepo()
    try {
      val s = repo.writableSession("main")
      s.addArray("/cube", Seq(16, 16), Seq(4, 4))
      for (i <- 0 until 2; j <- 0 until 2)
        s.writeChunk("/cube", Seq(i, j),
          Array.fill[Byte](2048)((i * 2 + j).toByte))
      assert(s.commit("four chunks").nonEmpty)
      assert(server.opCounts.get("put_conditional").get() >= 1)

      val ro = repo.readonlySession(VersionRef.Branch("main"))
      assert(ro.refs("/cube").count() == 4)
      assert(ro.getChunk("/cube", Seq(1, 1)).get.head == 3.toByte)
      val ref = ro.getChunkRef("/cube", Seq(0, 1)).get
      assert(repo.assets.readChunk(ref.chunk_id, 100, 16).toSeq ==
        Array.fill[Byte](16)(1.toByte).toSeq)
      // a second commit wins a fresh generation (gap-free CAS chain)
      val s2 = repo.writableSession("main")
      s2.writeChunk("/cube", Seq(0, 3), Array[Byte](9))
      s2.commit("one more")
      assert(repo.info().gen >= 2)
    } finally server.stop()
  }

  test("gcs container: gs:// virtual refs fetch ranged through the container store") {
    val server = new GcsMemServer
    server.createBucket("extg")
    try {
      val extConf = GcsStoreConf(server.endpoint, "extg", bearerToken = "t")
      val payload = Array.tabulate[Byte](4096)(i => (i % 251).toByte)
      extConf.open().putBytes("data/blob.bin", payload)

      val resolver = new VirtualChunkResolver(Seq(
        VirtualChunkContainer("gs://extg/data/", "extg", Some(extConf))))
      val repo = Repository.create(Store.local(tmpDir("vgcs")), spark,
        resolver = resolver)
      val s = repo.writableSession("main")
      s.addArray("/v", Seq(4), Seq(1))
      s.setVirtualRef("/v", Seq(0), "gs://extg/data/blob.bin", 0, 100)
      s.setVirtualRef("/v", Seq(1), "gs://extg/data/blob.bin", 1000, 50)
      s.setVirtualRef("/v", Seq(2), "vcc://extg/blob.bin", 2000, 25)
      s.commit("virtual refs")

      val ro = repo.readonlySession(VersionRef.Branch("main"))
      assert(ro.getChunk("/v", Seq(0)).get.toSeq == payload.take(100).toSeq)
      assert(ro.getChunk("/v", Seq(1)).get.toSeq ==
        payload.slice(1000, 1050).toSeq)
      assert(ro.getChunk("/v", Seq(2)).get.toSeq ==
        payload.slice(2000, 2025).toSeq)
      assert(server.opCounts.get("get_range").get() >= 3)
      // etag freshness via the metadata endpoint
      val st = extConf.open().stat("data/blob.bin").get
      s.setVirtualRef("/v", Seq(3), "gs://extg/data/blob.bin", 0, 16,
        etag = st.etag)
      s.commit("checked ref")
      val ro2 = repo.readonlySession(VersionRef.Branch("main"))
      assert(ro2.getChunk("/v", Seq(3)).get.length == 16)
      extConf.open().putBytes("data/blob.bin", Array.fill[Byte](4096)(7))
      val err = intercept[GraftException] { ro2.getChunk("/v", Seq(3)) }
      assert(err.getMessage.contains("changed"))
      // unauthorized locations rejected at set-time
      val bad = intercept[GraftException] {
        s.setVirtualRef("/v", Seq(0), "gs://other/data/x.bin", 0, 10)
      }
      assert(bad.getMessage.contains("no virtual chunk container"))
    } finally server.stop()
  }

  test("azure container: az:// virtual refs fetch ranged through the container store") {
    val server = new AzureMemServer
    server.createContainer("extc")
    try {
      val extConf = AzureStoreConf(server.endpoint, "acct", "extc",
        sasToken = "sig=y")
      val payload = Array.tabulate[Byte](4096)(i => (i % 199).toByte)
      extConf.open().putBytes("data/blob.bin", payload)

      val resolver = new VirtualChunkResolver(Seq(
        VirtualChunkContainer("az://acct/extc/data/", "extc", Some(extConf))))
      val repo = Repository.create(Store.local(tmpDir("vaz")), spark,
        resolver = resolver)
      val s = repo.writableSession("main")
      s.addArray("/v", Seq(3), Seq(1))
      s.setVirtualRef("/v", Seq(0), "az://acct/extc/data/blob.bin", 0, 100)
      s.setVirtualRef("/v", Seq(1), "az://acct/extc/data/blob.bin", 1000, 50)
      s.setVirtualRef("/v", Seq(2), "vcc://extc/blob.bin", 2000, 25)
      s.commit("virtual refs")

      val ro = repo.readonlySession(VersionRef.Branch("main"))
      assert(ro.getChunk("/v", Seq(0)).get.toSeq == payload.take(100).toSeq)
      assert(ro.getChunk("/v", Seq(1)).get.toSeq ==
        payload.slice(1000, 1050).toSeq)
      assert(ro.getChunk("/v", Seq(2)).get.toSeq ==
        payload.slice(2000, 2025).toSeq)
      assert(server.opCounts.get("get_range").get() >= 3)
    } finally server.stop()
  }

  test("bare-scheme gs:// and az:// locations fetch anonymously via ByteFetch") {
    // gs://bucket/key resolves against the XML-API URL shape
    // ({endpoint}/bucket/key) — served here by the S3-style stub, which
    // speaks exactly that path + Range protocol
    val gcsXml = new S3MemServer
    gcsXml.createBucket("pub")
    val az = new AzureMemServer
    az.createContainer("pubc")
    try {
      val payload = Array.tabulate[Byte](2048)(i => (i % 83).toByte)
      S3StoreConf(gcsXml.endpoint, "us-east-1", "pub")
        .open().putBytes("d/x.bin", payload)
      AzureStoreConf(az.endpoint, "pubacct", "pubc").open()
        .putBytes("d/y.bin", payload)
      System.setProperty("graft.gcs.endpoint", gcsXml.endpoint)
      System.setProperty("graft.azure.endpoint", az.endpoint)
      try {
        val resolver = VirtualChunkResolver(
          "gs://pub/", "az://pubacct/pubc/")
        assert(resolver.ranged("gs://pub/d/x.bin", 100, 64).toSeq ==
          payload.slice(100, 164).toSeq)
        assert(resolver.ranged("az://pubacct/pubc/d/y.bin", 200, 32).toSeq ==
          payload.slice(200, 232).toSeq)
        // open-ended and past-EOF ranges behave like every other scheme
        assert(resolver.ranged("gs://pub/d/x.bin", 2000, -1).toSeq ==
          payload.drop(2000).toSeq)
        assert(resolver.ranged("az://pubacct/pubc/d/y.bin", 5000, 10).isEmpty)
      } finally {
        System.clearProperty("graft.gcs.endpoint")
        System.clearProperty("graft.azure.endpoint")
      }
    } finally { gcsXml.stop(); az.stop() }
  }

  test("Store.fromOptions selects gcs and azure backends") {
    val gcs = new GcsMemServer
    gcs.createBucket("ob")
    val az = new AzureMemServer
    az.createContainer("oc")
    try {
      val g = Store.fromOptions(Map(
        "gcs.endpoint" -> gcs.endpoint, "gcs.bucket" -> "ob",
        "gcs.prefix" -> "p", "gcs.token" -> "t"))
      g.putBytes("k1", Array[Byte](1, 2))
      assert(g.getBytes("k1").toSeq == Seq[Byte](1, 2))
      val a = Store.fromOptions(Map(
        "azure.endpoint" -> az.endpoint, "azure.account" -> "acct",
        "azure.container" -> "oc", "azure.sas" -> "sig=z"))
      a.putBytes("k2", Array[Byte](3))
      assert(a.getBytes("k2").toSeq == Seq[Byte](3))
    } finally { gcs.stop(); az.stop() }
  }

  test("azure block list: blob assembles in LIST order, unstaged id is 400") {
    // raw-protocol vector: Put Block / Put Block List semantics the
    // client relies on — the committed blob is the concatenation in
    // BLOCK-LIST order (not upload order), and a list naming an unstaged
    // id fails whole (nothing committed)
    val server = new AzureMemServer
    server.createContainer("bl")
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def put(url: String, body: Array[Byte]): Int =
        http.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(url))
          .PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
          .build(), java.net.http.HttpResponse.BodyHandlers.discarding())
          .statusCode()
      val base = s"${server.endpoint}/bl/obj"
      // stage B FIRST, then A — upload order must not matter
      assert(put(s"$base?comp=block&blockid=QjI%3D", "BBBB".getBytes) == 201)
      assert(put(s"$base?comp=block&blockid=QTE%3D", "AAAA".getBytes) == 201)
      // a list naming an unstaged id fails whole and consumes NOTHING —
      // the same staged blocks then commit with a corrected list
      assert(put(s"$base?comp=blocklist",
        ("<?xml version=\"1.0\"?><BlockList><Latest>QTE=</Latest>" +
          "<Latest>nope</Latest></BlockList>").getBytes) == 400)
      assert(put(s"$base?comp=blocklist",
        ("<?xml version=\"1.0\"?><BlockList><Latest>QTE=</Latest>" +
          "<Latest>QjI=</Latest></BlockList>").getBytes) == 201)
      val got = http.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(base)).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      assert(got == "AAAABBBB") // list order, not upload order
    } finally server.stop()
  }

  test("gcs resumable: 308 echoes received range; wrong resume offset is 400") {
    val server = new GcsMemServer
    server.createBucket("rv")
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      val init = http.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${server.endpoint}/upload/storage/v1/b/rv/o" +
            "?uploadType=resumable&name=big"))
        .POST(java.net.http.HttpRequest.BodyPublishers.noBody()).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(init.statusCode() == 200)
      val session = init.headers().firstValue("Location").get()
      val quantum = 256 * 1024
      val total = quantum + 1000
      def putChunk(from: Int, to: Int, body: Array[Byte]) =
        http.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(session))
          .PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
          .header("Content-Range", s"bytes $from-$to/$total")
          .build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      val c1 = putChunk(0, quantum - 1, new Array[Byte](quantum))
      assert(c1.statusCode() == 308)
      // 308 echoes the byte range received so far (resume protocol)
      assert(c1.headers().firstValue("Range").get() ==
        s"bytes=0-${quantum - 1}")
      // resuming at the wrong offset is 400 (server tracks received size)
      assert(putChunk(1000, 1999, new Array[Byte](1000)).statusCode() == 400)
      // correct final chunk completes the object
      assert(putChunk(quantum, total - 1,
        new Array[Byte](1000)).statusCode() == 200)
    } finally server.stop()
  }

  test("gcs resumable upload rounds an unaligned chunk size to 256 KiB") {
    val server = new GcsMemServer
    server.createBucket("rs")
    try {
      // 300 000 is NOT a 256 KiB multiple; the client must round up to
      // 524 288 or the stub (like production) rejects each intermediate
      // chunk with 400
      val store = GcsStoreConf(server.endpoint, "rs",
        resumableThresholdBytes = 512L * 1024,
        resumableChunkBytes = 300000L).open()
      val payload = Array.tabulate(700000)(i => (i * 31 % 251).toByte)
      store.putBytes("big/object", payload)
      assert(server.opCounts.get("resumable_chunk").get() >= 2)
      assert(store.getBytes("big/object").toSeq == payload.toSeq)
      // ranged read straddling the chunk boundary the upload used
      assert(store.getRange("big/object", 524280, 16).toSeq ==
        payload.slice(524280, 524296).toSeq)
    } finally server.stop()
  }

  test("S3 multipart part bounds stay positive past 2 GiB of parts " +
      "(Long arithmetic, ADVICE r14)") {
    import graft.storage.s3.S3Store
    val part = 32 * 1024 * 1024 // the default 32 MiB part size
    // part 64's end is 64 * 32 MiB = 2^31 — Int arithmetic made it
    // negative and copyOfRange rejected the largest legal byte arrays
    val total = Int.MaxValue
    val nParts = ((total.toLong + part - 1) / part).toInt
    assert(nParts == 64)
    var covered = 0L
    (0 until nParts).foreach { i =>
      val (from, until) = S3Store.partBounds(total, part, i)
      assert(from >= 0 && until > from && until <= total,
        s"part $i bounds [$from, $until) out of range")
      assert(from == i.toLong * part, s"part $i misaligned")
      covered += until - from
    }
    assert(covered == total, "parts do not cover the object exactly")
    // last part is the remainder, not a negative-bound slice
    assert(S3Store.partBounds(total, part, 63) ==
      ((63 * part, Int.MaxValue)))
  }
}
