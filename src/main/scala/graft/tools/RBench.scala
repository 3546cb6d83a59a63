package graft.tools

import org.apache.spark.sql.SparkSession
import graft.repo._
import graft.storage.Store

/** Focused rechunk timing harness: build the 1 GiB cube once, then time
  * regrids in isolation (fresh array per rep so each rechunk sees the
  * same input grid). `runMain graft.tools.RBench [cubeSide] [reps]`
  */
object RBench {
  def main(args: Array[String]): Unit = {
    val cube = args.headOption.map(_.toInt).getOrElse(512)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(body: => Unit): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      body
      println(f"[rbench] $name ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(cache hits=${graft.storage.ChunkCache.hits}, " +
        f"misses=${graft.storage.ChunkCache.misses})")
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-rbench")
    val repo = Repository.create(Store.local(dir.toString), spark,
      GraftConfig())
    val chunkElems = 4 * cube * cube
    timed("cube_write") {
      val s = repo.writableSession("main")
      s.addArray("/cube", Seq(cube, cube, cube), Seq(4, cube, cube))
      for (c <- 0 until cube / 4) {
        val vals = Array.tabulate(chunkElems)(i =>
          ((c.toLong * chunkElems + i) % 1000) - 500)
        s.writeChunk("/cube", Seq(c, 0, 0),
          graft.functions.ChunkCodec.encodeLongs(vals, "int64"))
      }
      s.commit("cube")
    }
    for (r <- 0 until reps) {
      // fresh copy of the grid each rep: rechunk /cube -> same-input job
      timed(s"rechunk_pass$r") {
        val s = repo.writableSession("main")
        graft.tensor.TensorPlane.rechunk(s, "/cube",
          Seq(8L, (cube / 2).toLong, (cube / 2).toLong), "int64")
        s.commit("rechunk")
      }
      // revert the grid for the next pass
      timed(s"rechunk_back$r") {
        val s = repo.writableSession("main")
        graft.tensor.TensorPlane.rechunk(s, "/cube",
          Seq(4L, cube.toLong, cube.toLong), "int64")
        s.commit("back")
      }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    spark.stop()
  }
}
