package graft

import org.apache.spark.sql.functions._
import graft.repo._
import graft.storage.Store

class GraftTableProviderSpec extends SparkTestBase {

  test("DSv2 format(graft-v2): reads refs; c0 predicates prune partitions") {
    val dir = tmpDir("repo")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 2))))
    val s = repo.writableSession("main")
    s.addArray("/t", Seq(16), Seq(2)) // 8 chunks, 4 splits
    for (c <- 0 until 8)
      s.writeChunk("/t", Seq(c), Array.fill(c + 1)(c.toByte))
    s.commit("data")

    val df = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/t").load()
    assert(df.count() == 8)
    // values faithful: inline payload lengths are c+1
    val lens = df.select("c0", "length").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert((0 until 8).forall(c => lens(c) == c + 1))
    // coord array survives the Group conversion
    assert(df.filter(col("c0") === 5).select("coord")
      .head().getSeq[Int](0) == Seq(5))

    // predicate prunes partitions at planning: only split 3 scanned
    val filtered = df.filter(col("c0") >= 6)
    val scanDesc = filtered.queryExecution.executedPlan.toString()
    assert(filtered.count() == 2)
    assert(scanDesc.contains("c0 in [6,2147483647]"))

    // time travel option
    repo.createTag("v1", repo.lookupBranch("main").get)
    val s2 = repo.writableSession("main")
    s2.deleteChunk("/t", Seq(0))
    s2.commit("delete one")
    val atTag = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/t")
      .option("version", "tag:v1").load()
    assert(atTag.count() == 8)
    val atMain = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/t").load()
    assert(atMain.count() == 7)
  }
}
