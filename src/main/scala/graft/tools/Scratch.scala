package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextAnalysis}

/** Throwaway profiling main (iterate here, keep nothing load-bearing). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    timed("baseline_count")(docs.count())
    timed("baseline_strlen")(docs.select(sum(length(lower(col("text")))))
      .head().getLong(0))
    timed("split_only")(docs.select(
      sum(size(split(lower(col("text")), "\\s+")))).head().getLong(0))
    timed("tokens")(docs.select(TextAnalysis.tokens(col("text")).as("t"))
      .select(sum(size(col("t")))).head().getLong(0))
    timed("tokens2")(docs.select(TextAnalysis.tokens(col("text")).as("t"))
      .select(sum(size(col("t")))).head().getLong(0))
    timed("shingles")(docs.select(Dedup.shingles(col("text"), 3).as("s"))
      .select(sum(size(col("s")))).head().getLong(0))
    timed("posting_explode")(docs.select(col("doc_id"), col("lang"),
      explode(Dedup.shingles(col("text"), 3)).as("g")).count())
    timed("full_pairs")(Dedup.ngramJaccardPairs(docs, threshold = 0.05).count())
    spark.stop()
  }
}
