package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** One-off probe: for each ANN query family, print the exact-top-k rows
  * the approximate path MISSES at a given SF, with their cosines — the
  * empirical input to pinning the `*_ok` recall margins in Queries.
  */
object AnnAuditProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val exact = Similarity.bruteForceTopK(emb, query, 20)
      .select(col("vec_id"), col("cos"))

    def misses(name: String, approx: org.apache.spark.sql.DataFrame): Unit = {
      val miss = exact.join(approx.select(col("vec_id")).distinct(),
        Seq("vec_id"), "left_anti").orderBy(col("cos").desc)
      val rows = miss.collect()
      // n_approx feeds the sound-bit fullness decision: the bit is only
      // non-vacuous if the approximate path deterministically fills k
      println(s"[$name] n_approx=${approx.count()} misses=${rows.length} " +
        rows.map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
    }

    misses("ann", Similarity.annTopK(emb, query, 20, numPlanes = 4))
    locally {
      val (indexed, centers) = Similarity.ivfIndex(emb, nlist = 32)
      misses("ivf", Similarity.ivfTopK(indexed, centers, query, 20,
        nprobe = 8))
    }
    locally {
      val model = Similarity.pqFit(emb, m = 8, k = 16)
      misses("pq", Similarity.pqTopK(Similarity.pqEncode(emb, model),
        model, query, 20))
    }
    // neighbors-per-vector: exact top-5 per id vs the LSH-blocked result
    locally {
      import org.apache.spark.sql.expressions.Window
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
      val w = Window.partitionBy("id_a")
        .orderBy(col("cos").desc, col("id_b"))
      val exactNb = a.join(b, col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Similarity.cosine(col("v_a").cast("array<double>"),
            col("v_b").cast("array<double>")), 6).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
      val lsh = Similarity.neighborsPerVector(emb, k = 5, numPlanes = 6)
        .select(col("id_a"), col("id_b"), lit(1).as("hit"))
      val miss = exactNb.join(lsh, Seq("id_a", "id_b"), "left_anti")
      val top = miss.orderBy(col("cos").desc).limit(10).collect()
      // per-vector fullness: how many vectors got FEWER than k=5 LSH
      // rows (each would be a vacuously-sound rank under coalesce-true)
      val short = lsh.groupBy("id_a").count().filter(col("count") < 5)
      println(s"[neighbors] misses=${miss.count()} " +
        s"short_vectors=${short.count()} top10=" +
        top.map(r => s"${r.get(0)}->${r.get(1)}:${r.get(2)}").mkString(" "))
    }
    spark.stop()
  }
}
