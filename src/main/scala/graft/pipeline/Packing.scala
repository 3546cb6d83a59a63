package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence assembly over a document corpus: deterministic
  * global shuffling into shards and concat-and-chunk sequence packing.
  * Both are order-critical operations that naive Spark spells as a
  * GLOBAL window (`sum(x) over (order by id)`) — a single-partition
  * sort that dies at 100 TB. The implementations here keep every
  * window PER-BUCKET and move only #buckets rows through the driver.
  */
object Packing {

  /** Deterministic monotonic bucketing of `orderCol`: boundaries from
    * one `approxQuantile` pass (driver holds #buckets values), bucket
    * membership as a codegen'd CASE chain. Rows in bucket b all order
    * BEFORE every row of bucket b+1, so per-bucket windows + bucket
    * prefix offsets reproduce the global running total exactly.
    */
  private def bucketBoundaries(df: DataFrame, orderCol: String,
                               buckets: Int): Array[Double] = {
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    if (probes.isEmpty) Array.empty
    else df.stat.approxQuantile(orderCol, probes, 0.001).distinct.sorted
  }

  private def bucketOf(c: Column, bounds: Array[Double]): Column =
    bounds.zipWithIndex.foldRight(lit(bounds.length)) {
      case ((b, i), elseCol) => when(c < lit(b), lit(i)).otherwise(elseCol)
    }

  /** Exact running total of `tokensCol` in `orderCol` order, without a
    * global sort: per-bucket window cumsum + driver-prefix-summed bucket
    * offsets (a #buckets-row collect, bounded metadata). Output adds
    * `cum` (inclusive running total). Ties in `orderCol` must not exist
    * (use a unique id), or the running total is order-ambiguous.
    */
  def withRunningTotal(df: DataFrame, orderCol: String, tokensCol: String,
                       buckets: Int): DataFrame = {
    val bounds = bucketBoundaries(df, orderCol, math.max(1, buckets))
    val bucketed = df.withColumn("_bkt", bucketOf(col(orderCol), bounds))
    // #buckets rows: the only driver-side data, independent of corpus size
    val totals = bucketed.groupBy("_bkt")
      .agg(sum(col(tokensCol)).as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 to bounds.length).scanLeft(0L) {
      case (acc, b) => acc + totals.getOrElse(b, 0L)
    }
    val offCol = offsets.init.zipWithIndex.foldRight(lit(0L)) {
      case ((off, b), elseCol) =>
        when(col("_bkt") === lit(b), lit(off)).otherwise(elseCol)
    }
    val w = Window.partitionBy("_bkt").orderBy(orderCol)
    bucketed
      .withColumn("cum", sum(col(tokensCol)).over(w) + offCol)
      .drop("_bkt")
  }

  /** Concat-and-chunk sequence packing (the GPT-style pretraining
    * layout): documents are concatenated in `orderCol` order and cut
    * into fixed `window`-token training sequences; a document may span
    * several sequences. Emits per document: token count, global start
    * offset, first/last pack (sequence) index, and span count. Zero-
    * token documents are dropped (they occupy no positions).
    *
    * Every Spark window here is per-bucket — the plan survives a corpus
    * whose token total is 10^13.
    */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: Column,
                    window: Long, buckets: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val b = if (buckets > 0) buckets
            else spark.sparkContext.defaultParallelism
    val toks = docs.select(col(idCol), tokensCol.cast("long").as("tokens"))
      .filter(col("tokens") > 0)
    withRunningTotal(toks, idCol, "tokens", b)
      .withColumn("start_pos", col("cum") - col("tokens"))
      .withColumn("pack_first", expr(s"start_pos div ${window}L"))
      .withColumn("pack_last", expr(s"(cum - 1L) div ${window}L"))
      .withColumn("n_spans", col("pack_last") - col("pack_first") + 1)
      .drop("cum")
  }

  /** Deterministic pseudo-random training order: a seeded multiplicative
    * mix of the id assigns each document a shard and a position within
    * it. The permutation is reproducible across runs and engines (plain
    * int64 arithmetic — an oracle can recompute it), and the windows are
    * per-shard, so shard count scales parallelism, not a global sort.
    */
  def shuffleShards(docs: DataFrame, idCol: String, shards: Int,
                    seed: Long = 42L): DataFrame = {
    // Knuth multiplicative hash mod a prime below 2^32: id order and mix
    // order are decorrelated, and every value stays well inside int64
    val mix = pmod(col(idCol) * lit(2654435761L) + lit(seed),
      lit(4294967291L))
    val w = Window.partitionBy("shard").orderBy("mix", idCol)
    docs.select(col(idCol), mix.as("mix"))
      .withColumn("shard", pmod(col("mix"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }
}
