package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag training documents that share n-gram
  * shingles with a benchmark/eval set — the standard guard against test-set
  * leakage in a pretraining corpus.
  *
  * Shape at 100 TB: the corpus side streams as an exploded posting list
  * (one row per shingle), the benchmark side is tiny by construction
  * (eval sets are thousands of items, not billions) and BROADCASTS — the
  * join is map-side, no corpus shuffle; only the per-(doc, bench) overlap
  * count aggregates. Work scales with Σ shingles, never
  * |corpus| × |benchmark|.
  */
object Decontaminate {

  /** Per-(corpus doc, benchmark doc) distinct-shingle overlap counts,
    * keeping pairs with at least `minShared` shared n-grams. Shingles are
    * distinct per document ([[Dedup.shingles]]), so `count` IS the
    * distinct overlap.
    */
  def overlap(corpus: DataFrame, benchmark: DataFrame,
              textCol: String = "text", n: Int = 8,
              corpusIdCol: String = "doc_id",
              benchIdCol: String = "doc_id",
              minShared: Int = 1,
              broadcastBenchmark: Boolean = true): DataFrame = {
    val c = corpus
      .select(col(corpusIdCol).as("doc_id"),
        Dedup.shingles(col(textCol), n).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("g"))
    val b0 = benchmark
      .select(col(benchIdCol).as("bench_id"),
        Dedup.shingles(col(textCol), n).as("sh"))
      .select(col("bench_id"), explode(col("sh")).as("g"))
    val b = if (broadcastBenchmark) broadcast(b0) else b0
    c.join(b, Seq("g"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= minShared)
  }

  /** [[overlap]] with a BLOOM PREFILTER on the corpus side — the shape
    * for benchmarks too large to broadcast as raw posting lists, or to
    * cut the exact join's probe volume by ~100×: the benchmark's shingle
    * hashes build a driver-side Bloom bitset (bounded — eval sets are
    * thousands of items) that rides into a map-side membership
    * expression, so the overwhelming majority of corpus shingles drop
    * BEFORE any join. Bloom gives false positives only; the exact
    * broadcast join + overlap count runs on the survivors, so the
    * result is IDENTICAL to [[overlap]] — which is what the oracle and
    * PipelineSpec check.
    */
  def overlapBloom(corpus: DataFrame, benchmark: DataFrame,
                   textCol: String = "text", n: Int = 8,
                   corpusIdCol: String = "doc_id",
                   benchIdCol: String = "doc_id",
                   minShared: Int = 1): DataFrame = {
    val bSh = benchmark
      .select(col(benchIdCol).as("bench_id"),
        Dedup.shingles(col(textCol), n).as("sh"))
      .select(col("bench_id"), explode(col("sh")).as("g"))
    val hashes = bSh.select(xxhash64(col("g"))).distinct()
      .collect().map(_.getLong(0))
    val (bits, k) = graft.functions.BloomBuild.fromHashes(hashes)
    val c = corpus
      .select(col(corpusIdCol).as("doc_id"),
        Dedup.shingles(col(textCol), n).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .filter(graft.functions.VectorFunctions.bloom_contains(
        xxhash64(col("g")), bits, k))
    c.join(broadcast(bSh), Seq("g"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= minShared)
  }

  /** One row per contaminated corpus doc: how many benchmark items it
    * overlaps and the worst (max) shared-gram count — the drop list a
    * cleaning pass consumes.
    */
  def flag(corpus: DataFrame, benchmark: DataFrame,
           textCol: String = "text", n: Int = 8,
           corpusIdCol: String = "doc_id",
           benchIdCol: String = "doc_id",
           minShared: Int = 1): DataFrame =
    overlap(corpus, benchmark, textCol, n, corpusIdCol, benchIdCol,
      minShared)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bench_hits"),
        max(col("shared_grams")).as("max_shared_grams"))
}
