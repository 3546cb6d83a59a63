package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.zarr.ZarrKey

class CoreKernelSpec extends AnyFunSuite {
  test("base32 round-trips ids") {
    for (_ <- 1 to 50) {
      val id = Ids.newObjectId()
      assert(Ids.fromBase32(Ids.toBase32(id)).toSeq == id.toSeq)
      val nid = Ids.newNodeId()
      assert(Ids.fromBase32(Ids.toBase32(nid)).toSeq == nid.toSeq)
    }
  }

  test("path normalize / ancestors / child") {
    assert(NodePath.normalize("a/b/") == "/a/b")
    assert(NodePath.normalize("//a///b") == "/a/b")
    assert(NodePath.normalize("/") == "/")
    assert(NodePath.parent("/a/b").contains("/a"))
    assert(NodePath.parent("/a").contains("/"))
    assert(NodePath.parent("/").isEmpty)
    assert(NodePath.ancestors("/a/b/c") == List("/", "/a", "/a/b"))
    assert(NodePath.isAncestorOf("/a", "/a/b"))
    assert(!NodePath.isAncestorOf("/a", "/ab"))
    assert(NodePath.child("/", "x") == "/x")
    assert(NodePath.child("/a", "x") == "/a/x")
  }

  test("array shape chunk grid and bounds") {
    val s = ArrayShape.regular(Seq(512, 512, 512), Seq(64, 512, 512))
    assert(s.dims.map(_.numChunks) == Seq(8, 1, 1))
    assert(s.totalChunks == 8)
    assert(s.validChunkCoord(Seq(7, 0, 0)))
    assert(!s.validChunkCoord(Seq(8, 0, 0)))
    assert(!s.validChunkCoord(Seq(0, 0)))
    val r = ArrayShape.regular(Seq(10), Seq(3))
    assert(r.dims.head.numChunks == 4) // ceil(10/3)
    assert(r.allCoords.toSeq == Seq(Seq(0), Seq(1), Seq(2), Seq(3)))
  }

  test("zarr key parse/format round-trip (store.rs:1048-1156 semantics)") {
    assert(ZarrKey.parse("zarr.json") == Right(ZarrKey.Metadata("/")))
    assert(ZarrKey.parse("a/b/zarr.json") == Right(ZarrKey.Metadata("/a/b")))
    assert(ZarrKey.parse("a/b/c/0/1/2") ==
      Right(ZarrKey.Chunk("/a/b", Seq(0, 1, 2))))
    assert(ZarrKey.parse("a/b/c") == Right(ZarrKey.Chunk("/a/b", Nil)))
    assert(ZarrKey.parse("c/0") == Right(ZarrKey.Chunk("/", Seq(0))))
    assert(ZarrKey.parse("a/b/0/1").isLeft) // no chunk marker
    assert(ZarrKey.parse("/abs/key").isLeft)
    for (k <- Seq(ZarrKey.Metadata("/"), ZarrKey.Metadata("/x/y"),
        ZarrKey.Chunk("/t", Seq(3, 2, 1)), ZarrKey.Chunk("/t", Nil)))
      assert(ZarrKey.parse(ZarrKey.format(k)) == Right(k))
  }

  test("nested c segments resolve to last numeric suffix") {
    // an array named "c" under group "c": key "c/c/0" must parse
    assert(ZarrKey.parse("c/c/0") == Right(ZarrKey.Chunk("/c", Seq(0))))
  }
}
