package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query timing harness: `runMain graft.tools.QBench <sfdir> <q>...`
  * Runs each named [[graft.Queries]] entry twice (cold + warm) and prints
  * the timings — the iterate-fast loop for plan work.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val q = graft.Queries.all(name)
      (1 to 2).foreach { round =>
        val t0 = System.nanoTime()
        val n = q(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[qbench] $name round$round rows=$n%d ${sec}%.2f s")
      }
    }
    spark.stop()
  }
}
