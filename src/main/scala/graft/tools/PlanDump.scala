package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named queries (default: the bench
  * HEADLINE set) to `<outDir>/<query>_<suffix>.txt` — the optimization
  * rounds' before/after plan evidence
  * (`runMain graft.tools.PlanDump <sfdir> <outdir> <suffix> [q1,q2,...]`).
  * Uses the same session shape as Bench/Verify so Exchange counts and
  * join strategies match what the bench runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = graft.SparkEntry.queries.keys
      .filter(n => only.forall(_.contains(n)))
      .filter(n => only.isDefined || graft.Bench.HeadlineQueries.contains(n))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        System.err.println(s"[plandump] $name ok")
      } catch { case t: Throwable =>
        System.err.println(s"[plandump] $name failed: $t")
      }
      graft.pipeline.Dedup.releaseCaches()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
