package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.repo._
import graft.storage.Store

/** One-off per-phase profile of the bench's engine_merge_branch shape:
  * 500 k-ref array, fork at the tip, 1% deltas on each side, 3-way
  * merge. Prints the merge span's ms_* attributes.
  */
object MergeTimeProbe {
  def main(args: Array[String]): Unit = {
    val refCount = args.headOption.map(_.toInt).getOrElse(500000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mem = graft.core.Trace.toMemory()
    val dir = java.nio.file.Files.createTempDirectory("merge-probe")
    val repo = Repository.create(Store.local(dir.toString), spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, refCount / 100))))
    val s0 = repo.writableSession("main")
    s0.addArray("/long1d", Seq(refCount.toLong * 1000), Seq(1000))
    s0.commit("init")
    def refsDf(from: Int, until: Int) =
      spark.range(from, until).select(
        array(col("id").cast("int")).as("coord"),
        lit("virtual").as("kind"),
        concat(lit("file:///ext/part-"), col("id") % 1000).as("location"),
        (col("id") * 8000).as("offset"),
        lit(8000L).as("length"))
    val s = repo.writableSession("main")
    s.stageChunkRefs("/long1d", refsDf(0, refCount))
    s.commit("bulk")
    val tip = repo.resolveVersion(VersionRef.Branch("main"))
    repo.createBranch("mb", tip)
    val f = repo.writableSession("mb")
    f.stageChunkRefs("/long1d", refsDf(0, refCount / 100))
    f.commit("branch delta")
    val m = repo.writableSession("main")
    m.stageChunkRefs("/long1d",
      refsDf(2 * (refCount / 100), 3 * (refCount / 100)))
    m.commit("main delta")
    val t0 = System.nanoTime()
    repo.mergeBranch("mb", "main")
    println(f"[probe] merge total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    mem.spans.filter(_.name == "merge").foreach { sp =>
      println("[probe] merge attrs: " + sp.attrs.toSeq.sorted.map {
        case (k, v) => s"$k=$v" }.mkString(" "))
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    spark.stop()
  }
}
