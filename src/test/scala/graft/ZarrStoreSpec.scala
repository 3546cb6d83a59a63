package graft

import graft.repo._
import graft.storage.Store
import graft.zarr.ZarrStore

class ZarrStoreSpec extends SparkTestBase {

  private def freshStore() = {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    (repo, new ZarrStore(repo.writableSession("main")))
  }

  test("metadata set/get round-trips zarr.json documents") {
    val (_, store) = freshStore()
    store.set("g/zarr.json", """{"zarr_format":3,"node_type":"group"}""".getBytes)
    val arrDoc = """{"zarr_format":3,"node_type":"array","shape":[100,20],""" +
      """"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[10,20]}},""" +
      """"dimension_names":["t","x"]}"""
    store.set("g/temp/zarr.json", arrDoc.getBytes)
    assert(new String(store.get("g/temp/zarr.json").get) == arrDoc)
    val n = store.session.node("/g/temp").get
    assert(n.isArray && n.shape == Seq(100, 20) && n.chunkShape == Seq(10, 20))
    assert(n.dimNames == Seq("t", "x"))
    // byte-range read of metadata
    assert(new String(store.get("g/temp/zarr.json",
      Some((0L, 14L))).get) == """{"zarr_format"""")
  }

  test("chunk set/get, exists, getsize, partial values") {
    val (_, store) = freshStore()
    val arrDoc = """{"zarr_format":3,"node_type":"array","shape":[100],""" +
      """"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[10]}}}"""
    store.set("a/zarr.json", arrDoc.getBytes)
    store.set("a/c/0", Array.tabulate(20)(_.toByte))
    store.set("a/c/3", Array.fill(700)(7.toByte))
    assert(store.exists("a/c/0") && !store.exists("a/c/1"))
    assert(store.get("a/c/0").get.toSeq == Array.tabulate(20)(_.toByte).toSeq)
    // ranged chunk read (ByteRange slice)
    assert(store.get("a/c/0", Some((5L, 8L))).get.toSeq ==
      Seq(5.toByte, 6.toByte, 7.toByte))
    assert(store.getSize("a/c/0").contains(20L))
    assert(store.getSize("a/c/3").contains(700L))
    val multi = store.getPartialValues(Seq(
      ("a/c/0", Some((0L, 2L))), ("a/c/9", None), ("a/zarr.json", None)))
    assert(multi(0).get.toSeq == Seq(0.toByte, 1.toByte))
    assert(multi(1).isEmpty)
    assert(multi(2).isDefined)
    // set_if_not_exists
    assert(!store.setIfNotExists("a/c/0", Array[Byte](1)))
    assert(store.setIfNotExists("a/c/5", Array[Byte](1)))
  }

  test("delete of an impossible chunk key is a no-op; writes still reject (#2312)") {
    val (_, store) = freshStore()
    val arrDoc = """{"zarr_format":3,"node_type":"array","shape":[100],""" +
      """"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[10]}}}"""
    store.set("g/zarr.json", """{"node_type":"group"}""".getBytes)
    store.set("a/zarr.json", arrDoc.getBytes)
    store.set("a/c/0", Array.tabulate(20)(_.toByte))
    // out-of-grid coordinate, missing node, group path: all no-ops
    store.delete("a/c/99")
    store.delete("nope/c/0")
    store.delete("g/c/0")
    // metadata delete of a missing node also no-ops
    store.delete("nope/zarr.json")
    assert(store.get("a/c/0").isDefined)
    // a real delete still works
    store.delete("a/c/0")
    assert(store.get("a/c/0").isEmpty)
    // WRITES outside the grid still reject
    intercept[GraftException](store.set("a/c/99", Array[Byte](1)))
    intercept[GraftException](store.set("nope/c/0", Array[Byte](1)))
    intercept[GraftException](store.set("g/c/0", Array[Byte](1)))
  }

  test("list_prefix, list_dir, getsize_prefix over committed + staged") {
    val (repo, store) = freshStore()
    store.set("g/zarr.json", """{"node_type":"group"}""".getBytes)
    val arr = """{"node_type":"array","shape":[30],""" +
      """"chunk_grid":{"configuration":{"chunk_shape":[10]}}}"""
    store.set("g/a/zarr.json", arr.getBytes)
    store.set("g/b/zarr.json", arr.getBytes)
    store.set("g/a/c/0", Array.fill(10)(1.toByte))
    store.set("g/a/c/2", Array.fill(10)(2.toByte))
    store.session.commit("setup")

    val ro = new ZarrStore(repo.readonlySession(VersionRef.Branch("main")))
    assert(ro.listPrefix("g/a") ==
      Seq("g/a/c/0", "g/a/c/2", "g/a/zarr.json"))
    assert(ro.listDir("g") == Seq("a", "b", "zarr.json"))
    assert(ro.listDir("") == Seq("g", "zarr.json"))
    assert(ro.getSizePrefix("g/a") == 20L + arr.getBytes.length)
    // delete_dir removes subtree
    val ws = new ZarrStore(repo.writableSession("main"))
    ws.deleteDir("g/a")
    assert(!ws.exists("g/a/zarr.json") && !ws.exists("g/a/c/0"))
    assert(ws.exists("g/b/zarr.json"))
  }

  test("byte-range get is ONE ranged GET, never a whole-chunk fetch") {
    val inner = Store.local(tmpDir("repo"))
    val logging = new graft.storage.LoggingStore(inner, _ => ())
    val repo = Repository.create(logging, spark)
    val store = new ZarrStore(repo.writableSession("main"))
    val arr = """{"zarr_format":3,"node_type":"array","shape":[10],""" +
      """"chunk_grid":{"configuration":{"chunk_shape":[10]}}}"""
    store.set("a/zarr.json", arr.getBytes)
    val payload = Array.tabulate[Byte](4096)(i => (i % 100).toByte)
    store.set("a/c/0", payload) // > inline threshold: chunk object
    store.session.commit("setup")

    val ro = new ZarrStore(repo.readonlySession(VersionRef.Branch("main")))
    logging.counts.clear()
    val got = ro.get("a/c/0", Some((100L, 116L))).get
    assert(got.toSeq == payload.slice(100, 116).toSeq)
    assert(logging.counts.containsKey("getRange"),
      "partial read must go through a ranged GET")
    assert(!logging.counts.containsKey("getBytes"),
      "partial read must not fetch the whole chunk")
    // clamping semantics preserved at the pushed-down layer
    assert(ro.get("a/c/0", Some((4000L, 9000L))).get.length == 96)
    assert(ro.get("a/c/0", Some((9000L, 9100L))).get.isEmpty)
  }
}
