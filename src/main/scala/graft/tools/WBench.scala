package graft.tools

import org.apache.spark.sql.SparkSession
import graft.repo._
import graft.storage.Store

/** Focused values-WRITE timing harness: the provider-clustered
  * (`_c0.._cN` helper columns) route vs the SQL-catalog INSERT
  * (`chunk_coord` transform) route, in isolation, with the INSERT's
  * physical plan printed so the exchange/sort expressions are visible.
  * `runMain graft.tools.WBench [cubeSide] [reps]`
  */
object WBench {
  def main(args: Array[String]): Unit = {
    val cube = args.headOption.map(_.toInt).getOrElse(256)
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
      println(f"[wbench] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // SPARK_GRAFT_WBENCH_CONTEXT=1 reproduces the Bench repo state the
    // values writes run against (split config + a 500 k-ref /long1d
    // manifest already on the branch): the standalone numbers and the
    // in-bench numbers have historically disagreed 3-5×, and the state
    // is the suspect, not the write path.
    val context = sys.env.getOrElse("SPARK_GRAFT_WBENCH_CONTEXT", "0") == "1"
    val refCount = 500000
    val n = cube
    (0 until reps).foreach { rep =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-wbench-$rep")
      val repo = Repository.create(Store.local(dir.toString), spark,
        if (context) GraftConfig(splits = Seq(SplitRule(".*", 0, refCount / 100)))
        else GraftConfig())
      val s = repo.writableSession("main")
      s.addArray("/cube2", Seq(n, n, n), Seq(4, n, n))
      s.addArray("/cube3", Seq(n, n, n), Seq(4, n, n),
        userData = """{"dtype":"int64"}""")
      s.commit("init")
      if (context) timed(s"context_500k_refs_$rep") {
        val sc = repo.writableSession("main")
        sc.addArray("/long1d", Seq(refCount.toLong * 1000), Seq(1000))
        sc.stageChunkRefs("/long1d", spark.range(0, refCount).select(
          org.apache.spark.sql.functions.array(
            org.apache.spark.sql.functions.col("id").cast("int")).as("coord"),
          org.apache.spark.sql.functions.lit("virtual").as("kind"),
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("file:///ext/part-"),
            org.apache.spark.sql.functions.col("id") % 1000).as("location"),
          (org.apache.spark.sql.functions.col("id") * 8000).as("offset"),
          org.apache.spark.sql.functions.lit(8000L).as("length")))
        sc.commit("bulk")
      }

      def providerWrite(): Unit = timed(s"provider_helper_clustered_$rep") {
        spark.range(n.toLong * n * n).selectExpr(
          s"id div ${n.toLong * n} as i0",
          s"(id div $n) % $n as i1",
          s"id % $n as i2",
          "id % 1000 - 500 as value",
          s"id div ${4L * n * n} as _c0",
          s"((id div $n) % $n) div $n as _c1",
          s"(id % $n) div $n as _c2")
          .write.format("graft-v2")
          .option("path", dir.toString).option("array", "/cube2")
          .option("mode", "values").option("dtype", "int64")
          .option("clustered", "true")
          .option("message", "wbench provider").mode("append").save()
      }

      val cat = s"graftwbench$rep"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.path", dir.toString)
      val insert =
        s"""INSERT INTO $cat.cube3
           |SELECT id div ${n.toLong * n} AS i0,
           |       (id div $n) % $n AS i1,
           |       id % $n AS i2,
           |       id % 1000 - 500 AS value
           |FROM range(${n.toLong * n * n})""".stripMargin
      if (rep == 0)
        spark.sql(s"EXPLAIN FORMATTED $insert").collect()
          .foreach(r => println(r.getString(0)))
      def catalogWrite(): Unit =
        timed(s"catalog_insert_$rep") { spark.sql(insert) }

      // SPARK_GRAFT_WBENCH_ORDER=catalog_first swaps entry order: the
      // first large write after a heavy commit historically absorbs the
      // JVM's deferred cost (GC debt, page-cache pressure), and order —
      // not route — may be what the in-bench gap measures.
      if (sys.env.getOrElse("SPARK_GRAFT_WBENCH_ORDER", "") == "catalog_first") {
        catalogWrite(); providerWrite()
      } else { providerWrite(); catalogWrite() }

      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
    spark.stop()
  }
}
