package graft

import graft.repo._
import graft.storage._
import graft.storage.s3.S3MemServer

/** Plan-time object-store traffic: a DSv2 values scan over a
  * many-split array must resolve manifest data files with ONE LIST per
  * distinct manifest id — not one per kept split. At 100 TB an array
  * has thousands of splits, and a per-split `store.list` on the driver
  * serializes thousands of round-trips into query planning.
  */
class PlanListingSpec extends SparkTestBase {

  test("values-scan planning lists O(manifests), not O(splits)") {
    val server = new S3MemServer
    try {
      server.createBucket("engine")
      val store = S3StoreConf(server.endpoint, "us-east-1", "engine",
        "repos/plan", "ak", "sk").open()
      // 200 chunks, 10 chunks per split -> 20 splits in ONE manifest
      val repo = Repository.create(store, spark,
        GraftConfig(splits = Seq(SplitRule(".*", 0, 10))))
      val s = repo.writableSession("main")
      s.addArray("/a", Seq(200L), Seq(1L), userData = """{"dtype":"int64"}""")
      for (c <- 0 until 200)
        s.writeChunk("/a", Seq(c), graft.functions.ChunkCodec.encodeLongs(
          Array(c.toLong * 3), "int64"))
      s.commit("init")
      val node = repo.readonlySession(VersionRef.Branch("main")).node("/a").get
      val manifests = repo.readonlySession(VersionRef.Branch("main"))
        .base.manifests.getOrElse(node.id, Nil)
      assert(manifests.size >= 20, s"expected many splits, got $manifests")
      val manifestIds = manifests.map(_.manifestId).distinct.size

      val df = spark.read.format("graft-v2")
        .option("s3.endpoint", server.endpoint)
        .option("s3.bucket", "engine").option("s3.prefix", "repos/plan")
        .option("s3.access-key", "ak").option("s3.secret-key", "sk")
        .option("array", "/a").option("mode", "values")
        .option("dtype", "int64").load()
      def lists: Long =
        Option(server.opCounts.get("list")).map(_.get()).getOrElse(0L)
      // materializing the scan RDD runs planInputPartitions on the
      // driver WITHOUT launching tasks — exactly the plan-time window
      // (executor parquet reads later do their own bounded single-key
      // getFileStatus probes, which are per-file, not per-split LISTs)
      val before = lists
      val nParts = df.rdd.getNumPartitions
      val delta = lists - before
      assert(nParts > 0)
      // one LIST per manifest id plus constant session/branch plumbing
      // (measured: 6 total) — strictly below the split count, where a
      // per-split implementation lands (>= 20 here, thousands at 100 TB)
      assert(delta <= manifestIds + 7,
        s"planning issued $delta LISTs for ${manifests.size} splits / " +
          s"$manifestIds manifest(s)")
      assert(delta < manifests.size,
        s"plan-time LISTs ($delta) scale with splits (${manifests.size})")
      assert(df.count() == 200L)
      // and the values really came through: spot-check the sum
      import org.apache.spark.sql.functions._
      assert(df.agg(sum("value")).head().getLong(0) ==
        (0L until 200L).map(_ * 3).sum)
    } finally server.stop()
  }
}
