package graft.tools
import org.apache.spark.sql.SparkSession
object DbgCol {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("dbg").toString
    val repo = graft.repo.Repository.create(graft.storage.Store.local(dir), spark,
      graft.repo.GraftConfig(splits = Seq(graft.repo.SplitRule(".*", 0, 2))))
    val s = repo.writableSession("main")
    s.addArray("/t", Seq(16), Seq(2))
    for (c <- 0 until 8) s.writeChunk("/t", Seq(c), Array.fill(c + 1)(c.toByte))
    s.commit("data")
    val df = spark.read.format("graft-v2").option("path", dir).option("array", "/t").load()
    df.select("c0", "coord", "chunk_id", "length").collect().sortBy(_.getInt(0)).foreach(r =>
      println(s"[dbg] c0=${r.getInt(0)} coord=${r.getSeq[Int](1)} len=${r.getLong(3)}"))
    spark.stop()
  }
}
