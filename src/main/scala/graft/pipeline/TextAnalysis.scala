package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All operators are pure column expressions (whole-stage codegen, no UDFs)
  * so they stream through a scan at 100 TB without shuffles; every one is
  * deterministic and mirrored by an ANSI-SQL oracle in
  * [[graft.SparkEntry.oracleSql]].
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Token count: whitespace tokenization. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-alphanumeric-non-space characters (a cheap proxy for byte-pair
    * token counts used to budget LLM training data).
    */
  def bpeishCount(text: Column): Column =
    size(filter(split(lower(text), "(?<=[a-z0-9])(?=[^a-z0-9])|(?<=[^a-z0-9])(?=[a-z0-9])|\\s+"),
      t => length(t) > 0))

  private val stopwordsEn = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "are", "was", "for", "on", "with", "as", "at", "by")

  /** Stopword ratio against a fixed English stopword list. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stopwordsEn.map(lit(_)): _*))).cast("double")
        / size(toks).cast("double"))
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[\\.,;:!\\?]", "")))
        .cast("double") / length(text).cast("double"))

  /** Mean token length. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: length band + stopword presence +
    * reasonable mean word length − punctuation noise. A deterministic
    * variant of the C4/Gopher-style heuristics.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val swScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val mtl = meanTokenLength(text)
    val mtlScore = when(mtl >= 3.0 && mtl <= 10.0, lit(1.0)).otherwise(lit(0.5))
    val punctPenalty = least(punctRatio(text) * 5.0, lit(1.0))
    // explicit floor-based rounding: identical bit-level behavior in any
    // engine given the same double input (plain `round` differs between
    // BigDecimal-based and scaled-multiply implementations at midpoints)
    floor((lenScore * 0.4 + swScore * 0.3 + mtlScore * 0.3) *
      (lit(1.0) - punctPenalty * 0.5) * 1000000 + 0.5) / 1000000
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "es", "una", "que", "para"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不"))

  /** N-gram/stopword-marker language ID: count marker-token hits per
    * language, pick the argmax (ties → first in fixed order), "und"
    * (undetermined) when nothing matches. Heuristic langid in the spirit
    * of fastText/langdetect but SQL-expressible and shuffle-free.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (lang, markers) =>
      (lang, size(filter(toks, t => t.isin(markers.map(lit(_)): _*))))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Polynomial rolling-hash document fingerprint over tokens:
    * `sum(hash31(token) * 31^posFromEnd) mod 2^61-1`-style, computed as a
    * left fold so identical token sequences — not just identical strings —
    * collide. Cheap shift-invariant near-dup prefilter.
    */
  def fingerprint(text: Column): Column =
    // modulus 2^31-1 keeps acc*31 + h < 2^37 — no Long overflow under
    // ANSI arithmetic. Per-token hash is 32-bit FNV-1a over the token's
    // characters: pure portable integer arithmetic, so the DuckDB oracle
    // recomputes the fingerprint bit-for-bit (q_fingerprint is
    // oracle-matched; crc32 had no DuckDB twin)
    aggregate(tokens(text), lit(7L),
      (acc, t) => pmod(acc * 31L + fnv1a32(t), lit(2147483647L)))

  /** 32-bit FNV-1a over a string's characters (`ascii` = full codepoint
    * of each 1-char split, matching DuckDB's `unicode`; h stays < 2^56
    * before each mod, no overflow under ANSI).
    */
  private def fnv1a32(t: Column): Column =
    aggregate(filter(split(t, ""), c => length(c) > 0),
      lit(2166136261L),
      (h, c) => pmod(h.bitwiseXOR(ascii(c)) * 16777619L,
        lit(4294967296L)))

  /** Canonical text normalization — the first pass of every text
    * pipeline: Unicode NFC (composed forms, so visually-identical
    * strings hash identically downstream — dedup/fingerprint inputs
    * MUST be normalized or é ≠ é), control characters stripped (TAB/
    * LF/CR become spaces first), whitespace runs collapsed, edges
    * trimmed, optional lowercasing. NFC itself has no Spark built-in —
    * `java.text.Normalizer` is the one genuinely-needed JVM call (UAX#15
    * is deterministic, so DuckDB's `nfc_normalize` agrees byte-for-byte
    * and q_normalize is oracle-matched); everything else is codegen'd
    * `regexp_replace`.
    */
  def normalizeText(text: Column, lowercase: Boolean = true): Column = {
    val nfc = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFC))
    val cleaned = trim(regexp_replace(regexp_replace(nfc(text),
      "[\\x00-\\x1f\\x7f]", " "), " +", " "))
    if (lowercase) lower(cleaned) else cleaned
  }

  /** Redact common PII shapes — emails, IPv4 addresses, phone-like digit
    * runs — with typed placeholders: the standard pre-training scrub
    * pass. A pure `regexp_replace` chain (codegen'd, shuffle-free);
    * patterns stay inside the dialect `java.util.regex` and RE2 agree on
    * (no lookaround, no alternation) so the DuckDB oracle matches
    * byte-for-byte. IPs are scrubbed before phones so the dotted quads
    * aren't half-eaten as digit runs.
    */
  def piiScrub(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+?\\d[\\d() .-]{6,}\\d", "<PHONE>")
  }

  /** Distinct whitespace tokens — with [[tokenCount]] this gives the
    * within-document repetition ratio (Gopher-style repetition filters).
    * Kept as integers so oracles compare exactly, no float drift.
    */
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** Corpus-level token statistics per group (default: per language):
    * doc counts, token totals, mean, exact interpolated percentiles
    * (p50/p90) and max. One groupBy shuffle; the percentile aggregate
    * keeps per-group value buffers, so at extreme cardinality swap in
    * `approx_percentile` (same shape, bounded memory).
    */
  def corpusStats(docs: DataFrame, textCol: String = "text",
                  groupCol: String = "lang"): DataFrame =
    docs.select(col(groupCol), tokenCount(col(textCol)).as("n_tokens"))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        round(avg("n_tokens"), 4).as("avg_tokens"),
        round(percentile(col("n_tokens"), lit(0.5)), 4).as("p50_tokens"),
        round(percentile(col("n_tokens"), lit(0.9)), 4).as("p90_tokens"),
        max("n_tokens").as("max_tokens"))

  /** Per-source corpus curation rollup — the FineWeb/C4-style source
    * (dump/domain) pruning step: exact duplicate rate, short-document
    * rate, size stats, and language entropy per source, with a
    * keep/drop decision by threshold. Two hash aggregations on
    * `source` (one via (source, lang) for the entropy) plus a join of
    * two ~#sources-row relations — at 100 TB this is the cheapest
    * possible full-corpus pass: map-side partial aggregation reduces
    * each partition to #sources rows before any shuffle, and the final
    * join is broadcast-sized by construction.
    */
  def sourceCuration(docs: DataFrame, textCol: String = "text",
                     minChars: Int = 100, maxDupRate: Double = 0.5,
                     maxShortRate: Double = 0.5): DataFrame = {
    val base = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col(textCol)).as("n_distinct_texts"),
      round(lit(1.0) - countDistinct(col(textCol)) / count(lit(1)), 4)
        .as("dup_rate"),
      round(avg(when(col("n_chars") < minChars, 1.0).otherwise(0.0)), 4)
        .as("short_rate"),
      round(avg(col("n_chars")), 4).as("avg_chars"))
    // Shannon entropy over the language mix: H = ln N − Σ n·ln n / N
    val perLang = docs.groupBy("source", "lang").agg(count(lit(1)).as("n"))
    val ent = perLang.groupBy("source").agg(
      round(log(sum("n")) -
        sum(col("n") * log(col("n"))) / sum("n"), 4).as("lang_entropy"))
    base.join(ent, "source")
      .withColumn("keep",
        col("dup_rate") < maxDupRate && col("short_rate") < maxShortRate)
  }

  /** TF-IDF keyword extraction: the top-`topK` tokens of every document
    * by `tf · ln(N/df)` — the corpus-contrastive keyword/topic signal
    * (tokens frequent HERE but rare corpus-wide float up; stopwords get
    * idf ≈ 0 and sink without a list).
    *
    * Scale shape: one (doc, token) tf aggregation (map-side combined),
    * one token-keyed df aggregation whose OUTPUT is vocabulary-sized and
    * joins back by hash on the token, one bounded driver-side count for
    * N, and one per-doc window for the top-k — every shuffle is keyed on
    * the token or the document, linear in the corpus; nothing
    * corpus-sized ever sits on the driver. Ties rank deterministically
    * (rounded score desc, then token asc) and the arithmetic is
    * closed-form, so an external engine reproduces every row
    * (see q_tfidf_keywords).
    */
  def tfidfKeywords(docs: DataFrame, textCol: String = "text",
                    topK: Int = 5): DataFrame = {
    require(topK >= 1, s"tfidfKeywords: topK >= 1, got $topK")
    val tf = docs
      .select(col("doc_id"), explode(tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // tf is already distinct per (doc, token): df = plain count per token
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // corpus size as a driver-side bounded count: a scalar at any
    // corpus size (the crossJoin-a-singleton alternative plans the
    // BroadcastNestedLoopJoin the pipeline plan guard bans)
    val nDocs = docs.count()
    val scored = tf.join(df, Seq("token"))
      .withColumn("score", round(
        col("tf") * log(lit(nDocs.toDouble) / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"),
        col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** N-gram novelty: per document, the fraction of its DISTINCT word
    * n-grams whose first corpus appearance (lowest doc id) is this
    * document — "how much does this doc actually add". Low-novelty docs
    * are rehashes of earlier material even when no single pair clears a
    * near-dup threshold; the signal drives dedup-aware sampling and
    * crawl-snapshot triage.
    *
    * Scale shape: a codegen'd slide over the token array builds the
    * grams (never on the driver), one gram-keyed min-aggregation finds
    * each gram's first seer, one hash join back, one per-doc rollup —
    * shuffles carry gram TYPES and (doc, gram) pairs, linear in the
    * corpus. Deterministic given the id order (use an ingest sequence id
    * at 100 TB, not an arbitrary one).
    */
  def ngramNovelty(docs: DataFrame, n: Int = 3, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    require(n >= 1 && n <= 8, s"ngramNovelty: n in 1..8, got $n")
    val grams = docs
      .select(col(idCol), tokens(col(textCol)).as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("ts")) - n),
        i => concat_ws(" ", slice(col("ts"), i + 1, lit(n))))).as("g"))
      .distinct()
    val firstSeen = grams.groupBy("g").agg(min(col(idCol)).as("first_doc"))
    grams.join(firstSeen, Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col(idCol), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty", round(col("n_novel") / col("n_grams"), 6))
      .orderBy(idCol)
  }

  /** Composed quality-curation cascade (the C4/FineWeb-shaped keep/drop
    * pass): every document gets a keep decision and the FIRST failing
    * rule as an audit reason — `too_short` (< minTokens), `lang`
    * (predicted language not allowlisted), `repetitive` (distinct-token
    * ratio below the floor, the Gopher within-doc repetition gate),
    * `low_quality` (composite [[qualityScore]] below the cut), else
    * `ok`. The reason column is what makes a 100 TB drop set auditable
    * (the curation complement of [[Dedup.dedupPipeline]]'s reasons).
    *
    * Pure column arithmetic end to end — one scan, zero shuffles, whole-
    * stage codegen; every rule is engine-recomputable (q_curation).
    */
  def curationPipeline(docs: DataFrame, minTokens: Int = 20,
                       langs: Seq[String] = Seq("en"),
                       minDistinctRatio: Double = 0.3,
                       minQuality: Double = 0.35,
                       textCol: String = "text"): DataFrame = {
    require(minTokens >= 0 && langs.nonEmpty, "curationPipeline: bad args")
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val dr = when(nTok === 0, lit(0.0)).otherwise(
      size(array_distinct(toks)).cast("double") / nTok.cast("double"))
    docs.select(col("doc_id"),
        nTok.as("n_tokens"),
        langId(col(textCol)).as("lang_pred"),
        round(dr, 6).as("distinct_ratio"),
        qualityScore(col(textCol)).as("quality"))
      .withColumn("reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(!col("lang_pred").isin(langs.map(x => x: Any): _*),
            "lang")
          .when(col("distinct_ratio") < minDistinctRatio, "repetitive")
          .when(col("quality") < minQuality, "low_quality")
          .otherwise("ok"))
      .withColumn("keep", col("reason") === "ok")
  }

  /** Sliding-window document chunking — the retrieval/RAG layout step:
    * each document becomes overlapping token windows of `window` tokens
    * at `stride` steps (stride < window overlaps, stride == window
    * tiles). The last window may be short; zero-token docs emit nothing.
    * Pure per-row array arithmetic (codegen'd slide + posexplode, no
    * shuffle): row count multiplies by ~len/stride, the 100 TB cost is
    * the write, not the transform. Engine-portable (q_doc_chunks).
    *
    * Returns (id, chunk_idx, n_tokens, chunk_text).
    */
  def slidingChunks(docs: DataFrame, window: Int, stride: Int,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(window >= 1, s"slidingChunks: window >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"slidingChunks: 1 <= stride <= window, got $stride")
    docs
      .select(col(idCol), tokens(col(textCol)).as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0),
          floor((size(col("ts")) - lit(1)) / lit(stride)).cast("int")),
        k => slice(col("ts"), k * stride + 1, lit(window)))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        size(col("col")).as("n_tokens"),
        concat_ws(" ", col("col")).as("chunk_text"))
  }

  /** Corpus word-frequency table: total occurrences + document frequency
    * per token, top-k by occurrence count. ONE explode feeding a
    * map-side-combined aggregation (the expand for `count_distinct` keeps
    * partials bounded by word-type cardinality per partition), and the
    * top-k is a `TakeOrdered` — no global sort shuffle. The standard
    * vocabulary/Zipf audit over a training corpus; at 100 TB the shuffle
    * carries word TYPES, not tokens.
    */
  def wordFrequencies(docs: DataFrame, textCol: String = "text",
                      topK: Int = 100): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_occ"),
        count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occ").desc, col("token"))
      .limit(topK)

  /** Count-min sketch over the corpus token stream: `depth` independent
    * md5-derived hash rows × `width` buckets, each cell the exact count
    * of tokens hashing into it. THE bounded-memory frequency structure:
    * the aggregation shuffles at most `depth × width` rows no matter how
    * large the vocabulary (billions of token types at 100 TB), and
    * estimates are `min_j cell(j, h_j(token))` — always ≥ the true count
    * (soundness), within `ε·N` of it with the classic CMS guarantee.
    *
    * Hashes are engine-portable by construction — `h_j(t) = first 4 md5
    * hex chars of "<j>:<t>" mod width` (the [[Sampling.hashBucket]] md5
    * recipe with a depth-salt) — so an external engine recomputes every
    * cell and every estimate bit-for-bit (see q_cms_heavy).
    */
  def cmsSketch(docs: DataFrame, textCol: String = "text",
                depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth 1..16, got $depth")
    require(width >= 16 && width <= 65536, s"width 16..65536, got $width")
    val tok = docs.select(explode(tokens(col(textCol))).as("token"))
    tok.select(col("token"),
        posexplode(array((0 until depth).map(j =>
          pmod(conv(substring(md5(concat(lit(s"$j:"), col("token"))),
            1, 4), 16, 10).cast("int"), lit(width))): _*)))
      .withColumnRenamed("pos", "depth").withColumnRenamed("col", "bucket")
      .groupBy("depth", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Point-estimate token counts from a [[cmsSketch]]: join each query
    * token's `depth` buckets against the sketch and take the min cell.
    * The sketch is at most `depth × width` rows — always broadcastable.
    */
  def cmsEstimate(queryTokens: DataFrame, sketch: DataFrame,
                  tokenCol: String = "token", depth: Int = 4,
                  width: Int = 512): DataFrame =
    queryTokens.select(col(tokenCol).as("token"),
        posexplode(array((0 until depth).map(j =>
          pmod(conv(substring(md5(concat(lit(s"$j:"), col(tokenCol))),
            1, 4), 16, 10).cast("int"), lit(width))): _*)))
      .withColumnRenamed("pos", "depth").withColumnRenamed("col", "bucket")
      .join(broadcast(sketch), Seq("depth", "bucket"))
      .groupBy("token").agg(min("n").as("est"))

  /** HyperLogLog register table for distinct-count estimation of
    * `valueCol` per `groupCol`: 2^p registers per group, each holding
    * the max leading-zero rank of the md5-derived 60-bit hashes landing
    * in it. THE bounded-memory cardinality structure: the shuffle is at
    * most `groups × 2^p` rows no matter how many distinct values exist
    * (billions of token types / URLs / ids at 100 TB). Same
    * engine-portable hash recipe as [[cmsSketch]], so an external
    * engine rebuilds every register (see q_hll_distinct).
    */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
                   p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 14, s"p in 4..14, got $p")
    val m = 1 << p
    val restBits = 60 - p
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15),
      16, 10).cast("long")
    df.select(col(groupCol), h.as("_h"))
      .withColumn("idx", pmod(col("_h"), lit(m.toLong)).cast("int"))
      .withColumn("_rest", expr(s"_h div $m"))
      .withColumn("rank",
        when(col("_rest") === 0, lit(restBits + 1))
          .otherwise(lit(restBits + 1) - length(bin(col("_rest")))))
      .groupBy(col(groupCol), col("idx"))
      .agg(max("rank").as("mrank"))
  }

  /** Distinct-count estimates from [[hllRegisters]]: the classic HLL
    * estimator (`α_m·m²/Σ2^−M`) with the standard small-range linear
    * counting correction (`m·ln(m/V)` when the raw estimate ≤ 2.5m and
    * zero registers remain). Standard error ≈ 1.04/√m. All arithmetic
    * is the identical closed form on every engine; estimates round to
    * 2 dp so last-ulp float differences can't flip a comparison.
    */
  def hllEstimate(registers: DataFrame, groupCol: String,
                  p: Int = 8): DataFrame = {
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    registers.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_active"),
        sum(pow(lit(2.0), -col("mrank"))).as("_sumActive"))
      .withColumn("_zeros", lit(m) - col("_active"))
      .withColumn("_raw",
        lit(alpha * m.toDouble * m) /
          (col("_sumActive") + col("_zeros").cast("double")))
      .withColumn("est_distinct",
        round(when(col("_raw") <= 2.5 * m && col("_zeros") > 0,
          lit(m.toDouble) * log(lit(m).cast("double") / col("_zeros")))
          .otherwise(col("_raw")), 2))
      .select(col(groupCol), col("est_distinct"))
  }

  /** BM25 ranking of every document against a small bag-of-terms query —
    * classical sparse retrieval (Robertson–Spärck Jones), using Lucene's
    * non-negative idf form `ln(1 + (N − df + 0.5)/(df + 0.5))`.
    *
    * Scale shape: for a fixed small query the per-term term frequencies
    * are pure projections over the scan (`filter` HOF per term — no
    * posting-list explode, no per-document shuffle); the corpus statistics
    * (N, avgdl, per-term document frequencies) reduce to ONE row that
    * broadcasts back onto the same projection, so the whole ranking is two
    * streaming passes over the corpus and the only exchanged row is that
    * singleton. The top-k is a `TakeOrdered`.
    *
    * Oracle parity: literal arithmetic mirrors the DuckDB SQL token for
    * token (same association order, same literals) so the rounded scores
    * hash-match.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, topK: Int = 20,
           textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32, "bm25: 1..32 query terms")
    val base = docs.select(
      col("doc_id") +: size(tokens(col(textCol))).as("dl") +:
        terms.zipWithIndex.map { case (term, i) =>
          size(filter(tokens(col(textCol)), x => x === lit(term)))
            .as(s"tf_$i")
        }: _*)
    val statAggs =
      count(lit(1)).as("nn") +: avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1).otherwise(0)).as(s"df_$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i")
      val df = col(s"df_$i")
      val idf = log(lit(1.0) + (col("nn") - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * (lit(k1) + lit(1))) /
        (tf + lit(k1) * (lit(1) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** A persistable inverted index: token-keyed posting lists plus the
    * corpus scalars BM25 needs. `postings` is an ordinary DataFrame
    * (write it as Parquet bucketed by token for co-located query
    * joins). The token total is kept as an EXACT long so merged indexes
    * recombine `avgdl` bit-identically (a stored double average would
    * double-round under `(avgA·nA + avgB·nB)/n`).
    */
  final case class InvertedIndex(postings: DataFrame, nDocs: Long,
                                 sumDl: Long) {
    def avgdl: Double = if (nDocs == 0) 0.0 else sumDl.toDouble / nDocs
  }

  /** Build the inverted index in ONE tf aggregation + one token-keyed
    * rollup: `(token, df, plist[(doc_id, tf, dl)], shard)`, postings
    * sorted by doc id. This is the retrieval-serving layout — a query
    * then reads ONLY its terms' posting lists instead of re-scanning the
    * corpus ([[searchIndex]]). The build shuffles (doc, token) pairs —
    * linear in the corpus.
    *
    * Zipf-head guard: a token whose df exceeds `maxPostingsPerRow`
    * auto-splits into `ceil(df / maxPostingsPerRow)` `(token, shard)`
    * rows (shard = hash(doc_id) mod nShards — deterministic, balanced in
    * expectation), so at 100 TB the token `the` with df ≈ 10⁹ becomes
    * ~15 k bounded rows built by many tasks instead of ONE df-sized
    * array row blowing the 2 GiB JVM array limit in a single task.
    * `df` on every shard row is the token's TOTAL document frequency —
    * the serving-side idf never changes with the layout, and all
    * consumers ([[searchIndex]], [[booleanSearch]], [[mergeIndexes]])
    * fold per doc, so the split is invisible to them. Below the
    * threshold the layout is the classic single row (shard 0).
    * `nDocs`/`avgdl` include zero-token documents, matching [[bm25]]'s
    * corpus statistics exactly.
    */
  def buildInvertedIndex(docs: DataFrame, textCol: String = "text",
                         maxPostingsPerRow: Int = 1 << 16): InvertedIndex = {
    require(maxPostingsPerRow >= 1, "buildInvertedIndex: maxPostingsPerRow >= 1")
    val (n, sumDl) = {
      val r = docs.agg(count(lit(1)),
        sum(size(tokens(col(textCol))).cast("long"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val tf = docs
      .select(col("doc_id"), size(tokens(col(textCol))).as("dl"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy("token", "doc_id", "dl")
      .agg(count(lit(1)).cast("int").as("tf"))
    val postings = shardedRollup(tf, maxPostingsPerRow,
      struct(col("doc_id"), col("tf"), col("dl")))
    InvertedIndex(postings, n, sumDl)
  }

  /** Token-keyed posting rollup with the Zipf-head shard split: df per
    * token first (one aggregation), joined back token-keyed, then the
    * list collect groups by `(token, shard)` so no single row exceeds
    * ~`maxPerRow` entries. `entry` builds the posting struct per
    * (token, doc) row.
    */
  private def shardedRollup(perDoc: DataFrame, maxPerRow: Int,
                            entry: Column): DataFrame = {
    val dfs = perDoc.groupBy("token").agg(count(lit(1)).as("df"))
    perDoc.join(dfs, Seq("token"))
      .withColumn("shard",
        pmod(xxhash64(col("doc_id")),
          greatest(ceil(col("df") / lit(maxPerRow.toDouble)), lit(1L))))
      .groupBy("token", "shard")
      .agg(max(col("df")).as("df"),
        sort_array(collect_list(entry)).as("plist"))
      .select("token", "df", "plist", "shard")
  }

  /** BM25 over the INDEX: reads only the query terms' posting lists
    * (sub-linear in the corpus — the serving path; [[bm25]] is the
    * scan path). Identical literal arithmetic, and per-doc partials
    * fold in FIXED term order (sorted by term index; absent terms
    * contribute an exact +0.0), so every MATCHING doc's score is
    * bit-identical to the scan-side bm25 (spec-pinned). Result-set
    * contract: only docs containing ≥1 query term appear — the scan
    * path ranks zero-score docs too, so the two agree row-for-row
    * exactly when ≥ topK docs match (q_bm25_indexed carries its own
    * positive-score oracle for this reason).
    */
  def searchIndex(ix: InvertedIndex, terms: Seq[String],
                  k1: Double = 1.2, b: Double = 0.75,
                  topK: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32,
      "searchIndex: 1..32 query terms")
    val spark = ix.postings.sparkSession
    val tdf = spark.createDataFrame(terms.zipWithIndex)
      .toDF("token", "tidx")
    ix.postings.join(broadcast(tdf), Seq("token"))
      .select(col("tidx"), col("df"), explode(col("plist")).as("p"))
      .select(col("tidx"), col("df"), col("p.doc_id").as("doc_id"),
        col("p.tf").as("tf"), col("p.dl").as("dl"))
      .withColumn("part",
        log(lit(1.0) + (lit(ix.nDocs.toDouble) - col("df") + lit(0.5))
          / (col("df") + lit(0.5))) *
          (col("tf") * (lit(k1) + lit(1))) /
          (col("tf") + lit(k1) *
            (lit(1) - lit(b) + lit(b) * col("dl") / lit(ix.avgdl))))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("tidx"), col("part"))))
        .as("ps"))
      .withColumn("bm25", round(aggregate(col("ps"), lit(0.0),
        (a, s) => a + s.getField("part")), 4))
      .select(col("doc_id"), col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Positional inverted index: token → sorted posting list of
    * `(doc_id, positions[])` — [[buildInvertedIndex]]'s sibling for
    * PHRASE and proximity queries (frequency postings cannot answer
    * "these words adjacent, in order"). Same build shape: one
    * per-(doc, token) position collect, one token-keyed rollup — and the
    * same Zipf-head `(token, shard)` split bounding every row to
    * ~`maxPostingsPerRow` documents (positions within one document are
    * document-length bounded, never corpus bounded).
    */
  def buildPositionalIndex(docs: DataFrame, textCol: String = "text",
                           maxPostingsPerRow: Int = 1 << 16): DataFrame = {
    require(maxPostingsPerRow >= 1, "buildPositionalIndex: maxPostingsPerRow >= 1")
    val perDoc = docs
      .select(col("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .groupBy("token", "doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
    shardedRollup(perDoc, maxPostingsPerRow,
      struct(col("doc_id"), col("positions")))
  }

  /** Exact phrase search over the positional index: term i's positions
    * shift left by i, and the phrase's start positions are the
    * INTERSECTION across terms — `m-1` doc-keyed hash joins plus one
    * codegen'd `array_intersect` fold, touching only the phrase terms'
    * posting lists (never the corpus). Returns
    * (doc_id, n_occurrences > 0) rows; a repeated term in the phrase
    * just joins its own posting list twice.
    */
  def phraseSearch(positional: DataFrame,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty && phrase.size <= 16,
      "phraseSearch: 1..16 phrase terms")
    val rels = phrase.zipWithIndex.map { case (t, i) =>
      positional.filter(col("token") === t)
        .select(explode(col("plist")).as("p"))
        .select(col("p.doc_id").as("doc_id"),
          transform(col("p.positions"), x => x - i).as(s"pos_$i"))
    }
    rels.reduce((a, b) => a.join(b, Seq("doc_id")))
      .withColumn("starts", phrase.indices.map(i => col(s"pos_$i"))
        .reduce((a, b) => array_intersect(a, b)))
      .filter(size(col("starts")) > 0)
      .select(col("doc_id"),
        size(col("starts")).as("n_occurrences"),
        (array_min(col("starts")) + 1).as("first_pos"))
      .orderBy("doc_id")
  }

  /** Proximity search over the positional index: documents where the
    * two terms occur within `window` token positions of each other (any
    * order) — one doc-keyed hash join of the two posting lists and one
    * codegen'd nested `exists` over the position arrays (O(|pa|·|pb|)
    * per doc, bounded by in-doc term frequency, never corpus-sized).
    */
  def proximitySearch(positional: DataFrame, termA: String,
                      termB: String, window: Int): DataFrame = {
    require(window >= 1, s"proximitySearch: window >= 1, got $window")
    def side(t: String, name: String) =
      positional.filter(col("token") === t)
        .select(explode(col("plist")).as("p"))
        .select(col("p.doc_id").as("doc_id"),
          col("p.positions").as(name))
    side(termA, "pa").join(side(termB, "pb"), Seq("doc_id"))
      .withColumn("n_pairs", size(filter(
        flatten(transform(col("pa"),
          x => transform(col("pb"), y => abs(x - y)))),
        d => d <= window && d =!= 0)))
      .filter(col("n_pairs") > 0)
      .select(col("doc_id"), col("n_pairs"))
      .orderBy("doc_id")
  }

  /** Boolean retrieval over the frequency index: documents containing
    * EVERY `must` term and NONE of the `mustNot` terms — |must|−1
    * doc-keyed semi joins plus one anti join against the union of the
    * excluded terms' postings; only the named terms' posting lists are
    * ever read.
    */
  def booleanSearch(postings: DataFrame, must: Seq[String],
                    mustNot: Seq[String] = Nil): DataFrame = {
    require(must.nonEmpty, "booleanSearch: at least one must term")
    def docsOf(ts: Seq[String]) =
      postings.filter(col("token").isin(ts.map(x => x: Any): _*))
        .select(explode(col("plist")).as("p"))
        .select(col("p.doc_id").as("doc_id")).distinct()
    val hits = must.map(t => docsOf(Seq(t)))
      .reduce((a, b) => a.join(b, Seq("doc_id"), "left_semi"))
    (if (mustNot.isEmpty) hits
     else hits.join(docsOf(mustNot), Seq("doc_id"), "left_anti"))
      .orderBy("doc_id")
  }

  /** Merge two inverted indexes built over DISJOINT corpora into the
    * index of their union — the incremental-ingest path: index the new
    * batch alone, merge in metadata space (token-keyed full-outer join,
    * df addition, posting-list concat re-sorted), never re-scan the old
    * corpus. Spec-pinned: mergeIndexes(ix(A), ix(B)) equals ix(A ∪ B)
    * exactly, including BM25 scores (avgdl/nDocs recombine from the
    * exact counts).
    */
  def mergeIndexes(a: InvertedIndex, b: InvertedIndex,
                   maxPostingsPerRow: Int = 1 << 16): InvertedIndex = {
    // token-total df first (max per token: every shard row carries the
    // total), THEN pair posting rows by (token, shard) — sub-threshold
    // tokens sit at shard 0 on both sides, so their merge is the classic
    // single-row concat; a hot token's shards pair by number and
    // unpaired shards pass through
    def tot(p: DataFrame, n: String) =
      p.groupBy("token").agg(max(col("df")).as(n))
    val dfs = tot(a.postings, "df_a")
      .join(tot(b.postings, "df_b"), Seq("token"), "full_outer")
      .select(col("token"),
        (coalesce(col("df_a"), lit(0L)) + coalesce(col("df_b"), lit(0L)))
          .as("df"))
    val paired = a.postings.drop("df").withColumnRenamed("plist", "pl_a")
      .join(b.postings.drop("df").withColumnRenamed("plist", "pl_b"),
        Seq("token", "shard"), "full_outer")
      .select(col("token"), col("shard"),
        when(col("pl_a").isNull, col("pl_b"))
          .when(col("pl_b").isNull, col("pl_a"))
          .otherwise(sort_array(concat(col("pl_a"), col("pl_b"))))
          .as("plist"))
    // RE-SHARD rows the concat pushed past the bound — without this,
    // repeated incremental merges regrow single rows without limit
    // (k merges of sub-threshold batches -> one k·df row) and defeat
    // the Zipf-head guard on exactly the ingest path it exists for.
    // Oversized rows split into ≤maxPostingsPerRow slices (slices of a
    // sorted array stay sorted); shard ids renumber densely per token
    // so future merges pair on clean (token, shard) keys.
    val B = maxPostingsPerRow
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("token").orderBy("shard", "_j")
    val resharded = paired
      .withColumn("_k",
        greatest(ceil(size(col("plist")) / lit(B.toDouble)), lit(1L)))
      .withColumn("_j", explode(sequence(lit(0L), col("_k") - 1)))
      .withColumn("plist",
        expr(s"slice(plist, _j * $B + 1, $B)"))
      .withColumn("shard", row_number().over(w).cast("long") - 1)
      .drop("_k", "_j")
    InvertedIndex(
      resharded.join(dfs, Seq("token"))
        .select("token", "df", "plist", "shard"),
      a.nDocs + b.nDocs, a.sumDl + b.sumDl)
  }

  /** Character-trigram language-model score: per document, the average
    * negative log-likelihood under a per-language Laplace-smoothed
    * trigram model trained on the corpus itself — the perplexity-style
    * quality filter (a document statistically unlike its language's
    * corpus scores high: mojibake, binary spill, boilerplate soup).
    * `p(c₃|c₁c₂) = (n₃ + 1) / (n₂ + V)` with the context count n₂
    * derived from the same trigram table (Σ over completions), so the
    * model is self-consistent and the oracle can rebuild it in SQL.
    *
    * Scale shape: the trigram explode streams off the scan (native
    * one-pass shingler); BOTH model tables are bounded by charset³ per
    * language, so they broadcast and the scoring joins are map-side —
    * the only per-corpus shuffles are the two model-count aggregations
    * and the final per-doc rollup.
    */
  def charTrigramScore(docs: DataFrame, textCol: String = "text",
                       langCol: String = "lang",
                       vocab: Double = 32.0): DataFrame = {
    val tri = docs.select(col("doc_id"), col(langCol).as("lang"),
        explode(graft.functions.VectorFunctions.char_shingles(
          lower(col(textCol)), 3, 1, hashed = false)).as("ps"))
      .select(col("doc_id"), col("lang"), col("ps.sub").as("g"))
      .withColumn("pfx", substring(col("g"), 1, 2))
    val c3 = tri.groupBy("lang", "g").agg(count(lit(1)).as("n3"))
    // prefix totals roll up from the trigram counts (every tri row
    // contributes exactly 1 to its prefix): identical values to grouping
    // the exploded corpus again, at the cost of a rollup over the tiny
    // c3 aggregate instead of a THIRD full corpus explode (guide §2.3)
    val c2 = c3.groupBy(col("lang"), substring(col("g"), 1, 2).as("pfx"))
      .agg(sum("n3").as("n2"))
    tri.join(broadcast(c3), Seq("lang", "g"))
      .join(broadcast(c2), Seq("lang", "pfx"))
      .withColumn("lp",
        log((col("n3") + lit(1.0)) / (col("n2") + lit(vocab))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"),
        round(-sum(col("lp")) / count(lit(1)), 4).as("nll"))
  }

  /** Per-document report: one row per doc with all text metrics. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      tokenCount(t).as("n_tokens"),
      bpeishCount(t).as("n_bpeish"),
      round(stopwordRatio(t), 6).as("stopword_ratio"),
      round(punctRatio(t), 6).as("punct_ratio"),
      round(meanTokenLength(t), 6).as("mean_token_len"),
      qualityScore(t).as("quality"),
      langId(t).as("lang_pred"),
      fingerprint(t).as("fingerprint"))
  }
}
