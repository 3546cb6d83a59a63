package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query result dump: `runMain graft.tools.QShow <sfdir> <q>...`
  * Prints each named [[graft.Queries]] entry's rows (up to 100) — the
  * eyeball loop for new correctness entries before the driver runs them.
  */
object QShow {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = graft.Queries.all(name)(spark, sfDir)
      println(s"== $name ==")
      df.show(100, truncate = false)
    }
    spark.stop()
  }
}
