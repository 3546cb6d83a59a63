package graft

import org.apache.spark.sql.functions._
import graft.repo._
import graft.storage.Store
import graft.streaming.ChangesFeed

class FeedAndInspectSpec extends SparkTestBase {

  test("changes feed polls commits incrementally; inspect rolls up metadata") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(100), Seq(1))
    val c0 = s.commit("init")

    assert(ChangesFeed.poll(repo, "main", c0).isEmpty) // no movement

    val s1 = repo.writableSession("main")
    s1.writeChunk("/a", Seq(0), Array[Byte](1))
    s1.writeChunk("/a", Seq(1), Array[Byte](2))
    s1.commit("c1")
    val Some((tip1, feed1)) = ChangesFeed.poll(repo, "main", c0)
    assert(feed1.filter(col("edit") === "chunk").count() == 2)

    val s2 = repo.writableSession("main")
    s2.writeChunk("/a", Seq(2), Array[Byte](3))
    s2.commit("c2")
    val Some((tip2, feed2)) = ChangesFeed.poll(repo, "main", tip1)
    assert(feed2.filter(col("edit") === "chunk").count() == 1) // only c2

    val ins = repo.inspect().orderBy("flushed_at").collect()
    assert(ins.length == 4) // root + 3 commits
    assert(ins.last.getAs[Long]("n_chunk_refs") == 3)
    assert(ins.last.getAs[Int]("n_arrays") == 1)
  }

  test("clear tombstones the whole hierarchy") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s = repo.writableSession("main")
    s.addGroup("/g")
    s.addArray("/g/a", Seq(10), Seq(1))
    s.writeChunk("/g/a", Seq(0), Array[Byte](1))
    s.commit("data")

    val s2 = repo.writableSession("main")
    s2.clear()
    s2.commit("cleared")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.nodes.map(_.path) == Seq("/"))
    // history still has the data
    val old = repo.ancestry(VersionRef.Branch("main"))(1)
    assert(repo.readonlySession(VersionRef.SnapshotVer(old.id))
      .refs("/g/a").count() == 1)
  }

  test("inspectManifests: one row per (node, split) with extents and counts") {
    val repo = Repository.create(
      graft.storage.Store.local(tmpDir("repo")), spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 4))))
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(16), Seq(1)) // 16 chunks, 4 per split
    for (c <- 0 until 16) s.writeChunk("/a", Seq(c), Array[Byte](c.toByte))
    s.commit("grid")
    val rows = repo.inspectManifests().collect()
    assert(rows.length == 4) // 4 splits
    assert(rows.forall(_.getAs[String]("path") == "/a"))
    assert(rows.map(_.getAs[Long]("n_refs")).sum == 16)
    val first = rows.head
    assert(first.getAs[Int]("split") == 0)
    assert(first.getAs[String]("extent_min") == "0")
    assert(first.getAs[String]("extent_max") == "3")
  }
}
