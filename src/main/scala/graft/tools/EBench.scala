package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.repo._
import graft.storage.Store

/** Focused engine-workload timing harness (the cube value-plane entries
  * of [[graft.Bench]], run in isolation, twice each): the iterate-fast
  * loop for value-plane plan/perf work.
  * `runMain graft.tools.EBench [cubeSide]`
  */
object EBench {
  def main(args: Array[String]): Unit = {
    val cube = args.headOption.map(_.toInt).getOrElse(512)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[ebench] $name ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(cacheBytes=${graft.storage.ChunkCache.currentBytes}, " +
        f"hits=${graft.storage.ChunkCache.hits}, " +
        f"misses=${graft.storage.ChunkCache.misses})")
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-ebench")
    val repo = Repository.create(Store.local(dir.toString), spark)
    val chunkElems = 4 * cube * cube
    timed("cube_write") {
      val s = repo.writableSession("main")
      s.addArray("/cube", Seq(cube, cube, cube), Seq(4, cube, cube),
        Seq("t", "y", "x"))
      for (c <- 0 until cube / 4) {
        val vals = Array.tabulate(chunkElems)(i =>
          ((c.toLong * chunkElems + i) % 1000) - 500)
        s.writeChunk("/cube", Seq(c, 0, 0),
          graft.functions.ChunkCodec.encodeLongs(vals, "int64"))
      }
      s.commit("cube")
    }
    (1 to 2).foreach { r =>
      timed(s"cube_read_$r") {
        val ro = repo.readonlySession(VersionRef.Branch("main"))
        val stats = graft.tensor.TensorPlane.arrayStats(ro, "/cube", "int64")
          .head()
        assert(stats.getAs[Long]("n") == cube.toLong * cube * cube)
      }
    }
    (1 to 2).foreach { r =>
      timed(s"v2_columnar_scan_$r") {
        val v = spark.read.format("graft-v2")
          .option("path", dir.toString).option("array", "/cube")
          .option("mode", "values").option("dtype", "int64").load()
        val res = v.agg(sum(col("value")), count(lit(1))).head()
        assert(res.getLong(1) == cube.toLong * cube * cube)
      }
    }
    timed("slice_read") {
      val ro = repo.readonlySession(VersionRef.Branch("main"))
      val st = graft.tensor.TensorPlane.sliceStats(ro, "/cube", "int64",
        Seq((0L, 4L), (0L, cube.toLong), (0L, cube.toLong))).head()
      assert(st.getAs[Long]("n") == 4L * cube * cube)
    }
    spark.stop()
  }
}
