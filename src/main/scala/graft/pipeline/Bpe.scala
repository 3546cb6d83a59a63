package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction + encoding over a corpus —
  * the tokenizer-training step of an LLM data pipeline (Sennrich et al.
  * 2016, the construction GPT-2/BPE tokenizers descend from).
  *
  * Scale shape: the ONLY corpus-sized pass is one word-count aggregation
  * (map-side combined, shuffle bounded by word-TYPE cardinality, capped
  * at `maxWordTypes` by frequency). BPE merge decisions depend solely on
  * the word-type frequency table, so the driver-side merge loop costs
  * O(types × merges) regardless of corpus size — 100 TB of text changes
  * the counts, not the loop. Encoding is then a distributed pass with
  * the learned merge ranks shipped as expression literals
  * ([[graft.functions.BpeEncodeExpr]], codegen-fallback native kernel).
  */
object Bpe {

  /** One learned merge: at `rank`, adjacent symbol pair (left, right)
    * had the highest corpus frequency `freq` and fused into left+right.
    */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** End-of-word marker symbol (kept distinct from any character). */
  val EndOfWord = "</w>"

  /** Whitespace-lowercase word counts — the bounded table BPE trains on.
    * Ties and caps are deterministic: top `maxWordTypes` by
    * (count desc, word asc).
    */
  def wordCounts(docs: DataFrame, textCol: String = "text",
                 maxWordTypes: Int = 100000): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(maxWordTypes)

  /** Learn `numMerges` BPE merges from the corpus. The word-count pass is
    * distributed; the merge loop runs on the driver over the collected
    * (word, count) table — bounded by `maxWordTypes` rows by construction.
    * Deterministic: the best pair is max frequency, ties broken by
    * lexicographic (left, right). Stops early when no adjacent pair
    * repeats.
    */
  def learn(docs: DataFrame, numMerges: Int, textCol: String = "text",
            maxWordTypes: Int = 100000): Seq[Merge] = {
    val wc = wordCounts(docs, textCol, maxWordTypes).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    learnFromCounts(wc.toSeq, numMerges)
  }

  /** The driver-side merge loop, exposed for spec-level verification
    * against hand-computed examples.
    */
  def learnFromCounts(wordCounts: Seq[(String, Long)],
                      numMerges: Int): Seq[Merge] = {
    // word types as mutable symbol sequences: chars + end-of-word marker
    var words: Array[(Array[String], Long)] = wordCounts.map { case (w, n) =>
      (w.map(_.toString).toArray :+ EndOfWord, n)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairFreq = scala.collection.mutable.HashMap[(String, String), Long]()
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        pairFreq.updateWith((syms(i), syms(i + 1)))(o => Some(o.getOrElse(0L) + n))
      if (pairFreq.isEmpty || pairFreq.valuesIterator.max < 2) done = true
      else {
        val ((l, r), f) = pairFreq.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        merges += Merge(rank, l, r, f)
        val fused = l + r
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += fused; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, n)
          }
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Learned merges as a DataFrame: (rank, left, right, merged, freq). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.left + m.right, m.freq))
      .toDF("rank", "left", "right", "merged", "freq")
  }

  /** Encode a text column into BPE subword tokens with the learned merges
    * (greedy lowest-rank-first per word, the standard BPE segmenter).
    * The merge table rides inside the expression as literals — no join,
    * no broadcast variable, pure per-row kernel.
    */
  def encode(text: Column, merges: Seq[Merge]): Column =
    graft.functions.VectorFunctions.bpe_encode(
      lower(text), merges.map(m => (m.left, m.right)))

  /** Per-document BPE token count under the learned vocabulary — the
    * number an LLM data pipeline budgets with.
    */
  def tokenCount(text: Column, merges: Seq[Merge]): Column =
    size(encode(text, merges))
}
