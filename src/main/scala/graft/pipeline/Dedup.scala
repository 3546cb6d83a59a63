package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape: exact dedup is one hash-shuffle; the near-dup family
  * (MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine) all reduce the
  * O(n²) pair space to a band/bucket join before any pairwise work, so the
  * shuffle volume is O(n · bands), never O(n²).
  */
object Dedup {

  /** Intermediates persisted by the near-dup builders (bucket/block/posting
    * relations referenced by both sides of a self-join). They must outlive
    * the returned lazy DataFrame, so the builders cannot unpersist them —
    * instead every persisted handle is registered here and the caller
    * releases them once the consuming action has materialized:
    * {{{  val pairs = Dedup.minhashCandidates(docs); pairs.write...;
    *      Dedup.releaseCaches()  }}}
    * Verify/Bench call this between entries so one query's cache never
    * pressures the next query's executors.
    *
    * Contract limits (JVM-global registry, deliberately simple): run ONE
    * dedup pipeline at a time per JVM — releaseCaches() drains every
    * registered handle, so concurrent pipelines would unpersist each
    * other's in-flight inputs (they recompute correctly, just slower).
    * A caller that never releases holds the staged frames for the JVM
    * lifetime; long-running services should release between pipelines
    * (or call `spark.catalog.clearCache()`, which subsumes this).
    */
  private val liveCaches =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist an intermediate both self-join sides reference, and register
    * it for [[releaseCaches]]. At cluster scale this is a checkpoint to
    * storage instead of executor memory.
    */
  private def stageCached(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    liveCaches.add(p)
    p
  }

  /** Unpersist every intermediate staged by dedup builders since the last
    * release. Non-blocking: the block manager frees asynchronously.
    */
  def releaseCaches(): Unit = {
    var d = liveCaches.poll()
    while (d != null) { d.unpersist(false); d = liveCaches.poll() }
  }

  /** Exact duplicates by content hash: one groupBy shuffle on a 256-bit
    * digest. Returns (doc_id, canonical_id, n_copies) for every row in a
    * duplicate group; survivors are `doc_id == canonical_id` (min id wins).
    */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), sha2(col(textCol), 256).as("h"))
      .groupBy("h")
      .agg(min("doc_id").as("canonical_id"), count("*").as("n_copies"),
        collect_list("doc_id").as("ids"))
      .select(explode(col("ids")).as("doc_id"), col("canonical_id"),
        col("n_copies"))

  /** Keep one row per distinct content (exact dedup applied). */
  def exactSurvivors(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val keep = exact(docs, textCol)
      .filter(col("doc_id") === col("canonical_id")).select("doc_id")
    docs.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Word shingles of size n as an array column (distinct, first-occurrence
    * order). Native one-pass expression ([[graft.functions
    * .WordShinglesExpr]]) — the HOF formulation
    * (`array_distinct(transform(sequence, slice+concat_ws))`) interprets
    * its lambda per shingle and was the dominant cost of the n-gram family.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.VectorFunctions.word_shingles(lower(text), n)

  /** MinHash signature: `numHashes` permutation-style hashes
    * `min((a_j * x + b_j) mod p)` over 64-bit shingle hashes — the standard
    * MinHashLSH construction (same family as Spark MLlib's MinHashLSH,
    * re-expressed as codegen'd column ops).
    */
  private val MinhashPrime = 4294967291L // largest 32-bit prime

  /** Seeded (a, b) coefficient pairs; pmod(x,p) < 2^32 and a < 2^30, so
    * a*x + b < 2^63 (no ANSI overflow).
    */
  private def minhashCoeffs(numHashes: Int): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(42)
    Seq.fill(numHashes)(
      (rng.nextInt(1 << 30).toLong + 1L, rng.nextInt(1 << 30).toLong))
  }

  /** Closed-form coefficient pairs for the PORTABLE minhash mode:
    * Knuth-multiplicative residues of the hash index, replayable as
    * plain integer arithmetic by any engine (same bounds as the seeded
    * pairs: a in [1, 2^30], b in [0, 2^30)).
    */
  private[graft] def portableMinhashCoeffs(numHashes: Int): Seq[(Long, Long)] =
    (1 to numHashes).map(j =>
      ((2654435761L * j) % (1L << 30) + 1L, (2246822519L * j) % (1L << 30)))

  /** MinHash signature from a precomputed ARRAY<LONG> of shingle hashes:
    * ONE pass over the array, folding a `numHashes`-wide accumulator with
    * `zip_with(acc, hashes_of(x), least)`. Keeping it single-pass matters:
    * n separate `array_min(transform(...))` calls would re-walk the shingle
    * array n times per row.
    */
  def minhashSignatureFromHashes(sh: Column, numHashes: Int): Column =
    graft.functions.VectorFunctions.minhash_signature(sh,
      minhashCoeffs(numHashes), MinhashPrime)

  def minhashSignature(text: Column, shingleSize: Int,
                       numHashes: Int): Column =
    minhashSignatureFromHashes(
      transform(shingles(text, shingleSize), s => xxhash64(s)), numHashes)

  /** MinHash + LSH banding: split the signature into `bands` bands, hash
    * each band, and emit one (band_idx, band_hash) bucket key per doc —
    * docs sharing any bucket are candidate near-duplicates. The candidate
    * join is an equi-join on the bucket key (shuffle O(n·bands)).
    *
    * Returns candidate pairs (doc_a < doc_b) with their estimated Jaccard
    * (fraction of matching minhashes).
    */
  /** `portable = true` switches every hash in the construction to
    * engine-replayable arithmetic — FNV shingle hashes
    * ([[portableTokenHash]]), closed-form (a, b) coefficients, and the
    * raw band-slice STRING as the bucket key (no band hash at all, so
    * bucket membership is exact slice equality) — which is what lets
    * q_dedup_minhash be oracle-checked bit-for-bit by DuckDB. The
    * default stays the seeded xxhash construction the dedup pipeline
    * queries' recall contracts were pinned against.
    */
  def minhashCandidates(docs: DataFrame, textCol: String = "text",
                        shingleSize: Int = 3, numHashes: Int = 32,
                        bands: Int = 8,
                        portable: Boolean = false): DataFrame = {
    val rows = numHashes / bands
    // stage shingle hashes as their own column so the signature fold walks
    // a materialized array (CollapseProject keeps multi-referenced
    // non-cheap expressions staged)
    val shingleHash: Column => Column =
      if (portable) portableTokenHash else xxhash64(_)
    val coeffs =
      if (portable) portableMinhashCoeffs(numHashes)
      else minhashCoeffs(numHashes)
    val sig = docs
      .select(col("doc_id"),
        transform(shingles(col(textCol), shingleSize),
          s => shingleHash(s)).as("_sh"))
      .select(col("doc_id"),
        graft.functions.VectorFunctions.minhash_signature(col("_sh"),
          coeffs, MinhashPrime).as("sig"))
    // materialize once (registered for releaseCaches): both self-join sides
    // would otherwise re-evaluate the whole shingle→minhash expression tree
    val bucketOf: Column => Column =
      if (portable) b => concat_ws("_",
        slice(col("sig"), b * rows + 1, lit(rows)))
      else b => xxhash64(concat_ws("_",
        slice(col("sig"), b * rows + 1, lit(rows))))
    val buckets = stageCached(sig.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), bucketOf)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket"))
    val a = buckets.select(col("band"), col("bucket"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = buckets.select(col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)).cast("double") /
          lit(numHashes.toDouble)).as("est_jaccard"))
      .distinct()
  }

  /** [[minhashCandidates]]'s default (seeded xxhash) construction over a
    * PRECOMPUTED `(doc_id, sh)` shingle frame — the LSH verify path
    * shares one staged shingle pass between banding and exact verify
    * (identical signatures/buckets/pairs to calling minhashCandidates on
    * the raw docs; only the shingle computation is shared).
    */
  private def minhashCandidatesFromShingles(withSh: DataFrame,
      numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val sig = withSh
      .select(col("doc_id"), col("sz"),
        graft.functions.VectorFunctions.minhash_signature(
          transform(col("sh"), s => xxhash64(s)),
          minhashCoeffs(numHashes), MinhashPrime).as("sig"))
    // `sz` (shingle-set size) rides along so the LSH verify stage can
    // size-ratio-prefilter candidate pairs BEFORE re-attaching the heavy
    // shingle arrays (r17, guide §3.2: reduce the join input). sz is a
    // function of doc_id, so carrying it through the pair distinct cannot
    // change which (doc_a, doc_b) pairs come out.
    val buckets = stageCached(sig.select(col("doc_id"), col("sz"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_",
          slice(col("sig"), b * rows + 1, lit(rows)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket"))
    val a = buckets.select(col("band"), col("bucket"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"),
      col("sz").as("sz_a"))
    val b = buckets.select(col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"),
      col("sz").as("sz_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)).cast("double") /
          lit(numHashes.toDouble)).as("est_jaccard"))
      .distinct()
  }

  /** Engine-portable 64-bit token hash: two 32-bit FNV-1a folds over
    * code points packed (hi << 32) | lo — plain integer arithmetic any
    * engine replays exactly, so simhash fingerprints computed here are
    * reproducible ACROSS engines (they get persisted and compared
    * incrementally, where an engine-private hash like xxhash64's Spark
    * seeding would silently diverge). One pass, no allocation — costs
    * what xxhash64 did in the interpreted HOF lambda path.
    */
  def portableTokenHash(t: Column): Column =
    graft.functions.VectorFunctions.fnv_long64(t)

  /** 64-bit SimHash over token hashes: per bit, sum +1/−1 across tokens,
    * bit set where the sum is positive. Near-dups have small Hamming
    * distance; pairs are blocked on 4 16-bit sub-keys (any exact sub-key
    * match → candidate), the classic simhash sharding trick. Token hash
    * = [[portableTokenHash]] (dual 32-bit FNV-1a over code points), so
    * fingerprints are stable across engines and releases.
    */
  def simhash(text: Column): Column =
    simhashFromHashes(transform(TextAnalysis.tokens(text),
      t => portableTokenHash(t)))

  /** SimHash from a precomputed ARRAY<LONG> of token hashes — native
    * expression ([[graft.functions.SimhashExpr]]): one tight loop per row.
    */
  def simhashFromHashes(hashes: Column): Column =
    graft.functions.VectorFunctions.simhash64(hashes)

  /** SimHash near-dup candidates: block on 16-bit sub-keys, verify by
    * Hamming distance ≤ `maxHamming`.
    */
  def simhashCandidates(docs: DataFrame, textCol: String = "text",
                        maxHamming: Int = 8): DataFrame = {
    val sh = docs
      .select(col("doc_id"), transform(TextAnalysis.tokens(col(textCol)),
        t => portableTokenHash(t)).as("_h"))
      .select(col("doc_id"), simhashFromHashes(col("_h")).as("sh"))
    // materialize once (registered for releaseCaches): the 64 per-bit
    // aggregates are expensive and both self-join sides reference them
    val blocked = stageCached(sh.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "block").withColumnRenamed("col", "key"))
    val a = blocked.select(col("block"), col("key"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = blocked.select(col("block"), col("key"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for all pairs within a blocking key
    * (default: same `lang`) — the verification stage of near-dup dedup.
    * Blocking keeps the pair space tractable; at 100 TB the blocking key
    * would be an LSH bucket from [[minhashCandidates]] instead of a
    * metadata column.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
                        n: Int = 3, blockCol: String = "lang",
                        threshold: Double = 0.0): DataFrame = {
    // Sparse formulation: explode shingles into a posting list, equi-join
    // postings on (block, shingle), count common shingles per pair, then
    // |A∩B| / (|A|+|B|−|A∩B|). Work scales with Σ posting-list sizes (the
    // data), never with the O(n²) dense pair space — the difference between
    // 100 s and 3 s at sf0.1, and between feasible and not at 100 TB.
    // Pairs sharing no shingle have jaccard 0 and are (correctly) absent;
    // a zero threshold would also report nothing for them.
    require(threshold > 0.0,
      "sparse jaccard emits only pairs with at least one common shingle")
    val withSh = docs
      .select(col("doc_id"), col(blockCol).as("block"),
        shingles(col(textCol), n).as("sh"))
      .withColumn("sz", size(col("sh")))
    // materialize the posting list once (registered for releaseCaches):
    // both self-join sides reference it
    val posting = stageCached(withSh.select(col("block"), col("doc_id"),
      col("sz"), explode(col("sh")).as("g")))
    val a = posting.select(col("block"), col("g"),
      col("doc_id").as("doc_a"), col("sz").as("sz_a"))
    val b = posting.select(col("block"), col("g"),
      col("doc_id").as("doc_b"), col("sz").as("sz_b"))
    a.join(b, Seq("block", "g"))
      .filter(col("doc_a") < col("doc_b"))
      // size-ratio necessary condition (r17, guide §3, same cut as the
      // LSH verify): jaccard ≤ min(|A|,|B|)/max(|A|,|B|), so pairs with
      // min < threshold·max can never pass the final jaccard filter —
      // dropping their posting-match rows HERE (Catalyst pushes this
      // into the join condition) shrinks the pair aggregation's input;
      // the ≥ keeps every boundary pair, so the output is bit-identical
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b")).cast("double"))
      .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("common"))
      .select(col("doc_a"), col("doc_b"),
        (col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact duplicated-SUBSTRING spans (character shingles), the
    * within-document granularity of Lee et al. 2022's "Deduplicating
    * Training Data" — a document that merely EMBEDS a copied passage
    * slips past whole-document dedup, but its duplicated span shows up
    * here. For every document (≥ k chars), every k-char shingle at
    * positions 1, 1+stride, … is checked for occurrence in ANY OTHER
    * document; duplicated positions then merge into maximal runs
    * (consecutive stride-spaced positions), and the result is one row
    * per affected document: total shingles, duplicated shingles, merged
    * span count, and the char width those spans cover
    * (`max−min+k` per run).
    *
    * Scale shape: the only data-sized shuffles are the shingle groupBy
    * and the posting join back — both keyed on the shingle, so work
    * scales with corpus chars/stride, never with the pair space. The
    * run-merge is a per-document window (partition = doc). At 100 TB:
    * raise `stride` (span boundaries coarsen to ±stride) and set
    * `hashed=true` so the shuffle carries 8-byte xxhash64 keys instead
    * of k-char strings — a false merge needs a 64-bit collision AND
    * co-location, vanishingly rare and harmless for a dedup *detector*.
    * (The oracle query runs `hashed=false` so DuckDB can mirror it;
    * PipelineSpec pins hashed ≡ raw on the test corpus.)
    */
  def duplicatedSpans(docs: DataFrame, k: Int = 40, stride: Int = 1,
                      hashed: Boolean = true,
                      textCol: String = "text"): DataFrame = {
    require(k >= 2 && stride >= 1, "duplicatedSpans: k >= 2, stride >= 1")
    val eligible = docs.filter(length(col(textCol)) >= k)
    // native one-pass shingler (rolling hash in hashed mode): the HOF
    // formulation (transform(sequence, p -> struct(p, substr))) interprets
    // its lambda per window — the dominant cost of this operator at bench
    // scale, same pathology WordShinglesExpr fixed for the n-gram family
    val sh = eligible.select(
      col("doc_id"),
      explode(graft.functions.VectorFunctions.char_shingles(
        col(textCol), k, stride, hashed)).as("ps"))
      .select(col("doc_id"), col("ps.pos").as("pos"), col("ps.sub").as("sub"))
    // "appears in more than one distinct doc" ⟺ min(doc_id) ≠ max(doc_id)
    // over the shingle's group — evaluated as ONE window over the single
    // exploded relation (r17, guide §2.3/§2.4): the agg+join-back form ran
    // the corpus shingle explode TWICE (once for the per-sub aggregate,
    // once for the join side) and paid a second exchange for the join.
    // The window shuffles the same posting rows once and streams the
    // min/max per sub with no join at all. Identical rows out: a posting
    // survives iff its sub's group has ≥2 distinct docs, same as before.
    val wSub = org.apache.spark.sql.expressions.Window.partitionBy("sub")
    val dp = sh
      .withColumn("_mn", min("doc_id").over(wSub))
      .withColumn("_mx", max("doc_id").over(wSub))
      .filter(col("_mn") =!= col("_mx"))
      .select("doc_id", "pos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val isl = dp.withColumn("grp",
      col("pos") - (row_number().over(w) - 1) * stride)
    val spans = isl.groupBy("doc_id", "grp")
      .agg(count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"))
    val tot = eligible.select(col("doc_id"),
      (length(col(textCol)) - (k - 1)).as("n_shingles"))
    spans.groupBy("doc_id")
      .agg(sum("n").as("n_dup_shingles"), count(lit(1)).as("n_spans"),
        sum(col("mx") - col("mn") + k).as("dup_chars"))
      .join(tot, Seq("doc_id"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup_shingles"),
        col("n_spans"), col("dup_chars"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): hash every k-char shingle, then from every window of
    * `w` consecutive positions keep the MINIMUM hash (rightmost on
    * ties). Guarantees: any shared substring of length ≥ k + w − 1
    * yields at least one shared fingerprint (detection), and ~2/(w+1)
    * of positions are kept (density) — the robust sampled alternative
    * to full substring postings for plagiarism/attribution-style dedup.
    *
    * Shape: the shingle pass is the native one-pass rolling hasher; the
    * per-window argmin is ONE window function over (doc, pos) — the
    * lexicographic min of (hash, −pos) structs gives rightmost-tie
    * semantics — followed by a distinct. Work is corpus-linear.
    */
  def winnowedFingerprints(docs: DataFrame, k: Int = 8, w: Int = 4,
                           textCol: String = "text"): DataFrame = {
    require(w >= 1, "winnow: window >= 1")
    val sh = docs
      .select(col("doc_id"),
        explode(graft.functions.VectorFunctions.char_shingles(
          lower(col(textCol)), k, 1, hashed = true)).as("ps"))
      .select(col("doc_id"), col("ps.pos").as("pos"), col("ps.sub").as("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    sh.withColumn("_n", count(lit(1)).over(win))
      .withColumn("_sel", min(struct(col("h"), (-col("pos")).as("np")))
        .over(win))
      .filter(col("_n") === w) // only complete windows select
      .select(col("doc_id"), (-col("_sel.np")).as("pos"),
        col("_sel.h").as("h"))
      .distinct()
  }

  /** The 100 TB n-gram verification path: block candidate pairs on
    * MinHash-LSH buckets instead of a metadata column, then verify each
    * candidate with EXACT n-gram Jaccard. A metadata block key (e.g.
    * `lang`) puts ~the whole corpus in one skewed block at scale; LSH
    * buckets stay balanced and recall is tunable via (numHashes, bands).
    * Output ⊆ the metadata-blocked exact result, within LSH recall.
    */
  def ngramJaccardPairsLsh(docs: DataFrame, textCol: String = "text",
                           n: Int = 3, threshold: Double = 0.5,
                           numHashes: Int = 32, bands: Int = 8): DataFrame = {
    // ONE shingle pass feeds both the banding (via hashed signatures) and
    // the exact-Jaccard verify sides (r16: the shingler ran 3× per call —
    // once inside minhashCandidates, once per verify join side)
    val withSh = stageCached(docs.select(col("doc_id"),
        shingles(col(textCol), n).as("sh"))
      .withColumn("sz", size(col("sh"))))
    // size-ratio prefilter (r17, guide §3): jaccard(A,B) ≤ min/max of the
    // set sizes (|A∩B| ≤ min, |A∪B| ≥ max), so any pair with
    // min < threshold·max fails the final jaccard ≥ threshold filter —
    // dropping it HERE is a pure necessary-condition cut that shrinks the
    // verify join's input before either shingle array is shipped. The ≥
    // keeps every boundary pair, so the output is bit-identical.
    val candidates = minhashCandidatesFromShingles(withSh, numHashes, bands)
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b")))
      .select("doc_a", "doc_b")
    val a = withSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      col("sz").as("sz_a"))
    val b = withSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      col("sz").as("sz_b"))
    // stage the intersection size once — it is the dominant per-pair cost
    // of the verify stage. The threshold filter is the single-reference
    // form c·(1+t) ≥ t·(|A|+|B|) (⇔ c/(|A|+|B|−c) ≥ t, exact for t with
    // a short binary expansion like 0.5): a jaccard-form filter would be
    // pushed into the join condition with `common` re-expanded, costing a
    // SECOND array_intersect per candidate pair.
    candidates.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .withColumn("common",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("common") * lit(1.0 + threshold) >=
        lit(threshold) * (col("sz_a") + col("sz_b")))
      .select(col("doc_a"), col("doc_b"),
        (col("common") /
          (col("sz_a") + col("sz_b") - col("common")).cast("double"))
          .as("jaccard"))
  }

  /** Near-duplicate *clusters*: MinHash-LSH candidate pairs (filtered by
    * estimated Jaccard) collapsed into connected components, so that
    * transitive chains A~B~C dedup to one canonical doc even when A~C was
    * never a candidate pair. Returns one row per input doc:
    * `(doc_id, cluster_id)` with `cluster_id` = min doc_id of the
    * component (singletons label themselves). Survivors of the dedup are
    * `doc_id == cluster_id`.
    */
  def nearDupClusters(docs: DataFrame, textCol: String = "text",
                      shingleSize: Int = 3, numHashes: Int = 32,
                      bands: Int = 8,
                      minEstJaccard: Double = 0.5): DataFrame = {
    val pairs = minhashCandidates(docs, textCol, shingleSize, numHashes,
      bands).filter(col("est_jaccard") >= minEstJaccard)
    val labels = ConnectedComponents.run(pairs)
      .withColumnRenamed("id", "doc_id")
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** Embedding-cosine near-duplicates: exact all-pairs with cosine ≥
    * threshold, as a '''block-matrix similarity join''' — never a row-pair
    * cross join. Vectors hash into `numBlocks` blocks; the O(m²) block
    * pairs (m = numBlocks) join as single rows and a native kernel
    * ([[graft.functions.CosinePairsExpr]]) evaluates the B×B cosine tile
    * with per-block-precomputed norms, emitting only qualifying pairs.
    *
    * Why this shape at 100 TB: a row-pair cross join ships every vector
    * n times and pays row machinery per pair; the block join ships every
    * vector m times (m ≪ n) and the pair loop is a tight JVM kernel.
    * Exact cosine join is inherently Ω(n²) FLOPs — when the threshold is
    * high (≥ ~0.7), cut the pair space first with
    * [[Similarity.lshBuckets]] and use this as the verify stage.
    */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double,
                        vecCol: String = "embedding",
                        idCol: String = "vec_id",
                        numBlocks: Int = 16): DataFrame = {
    require(embeddings.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"embeddingNearDups needs a numeric id column; '$idCol' is " +
        s"${embeddings.schema(idCol).dataType.simpleString} — add a " +
        "monotonically_increasing_id() surrogate first")
    val staged = embeddings.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("blk",
        pmod(xxhash64(col("id")), lit(numBlocks)).cast("int"))
    val blocks = staged.groupBy("blk")
      .agg(collect_list(struct(col("id"), col("v"))).as("vecs"))
    val a = blocks.select(col("blk").as("blk_a"), col("vecs").as("vecs_a"))
    val b = blocks.select(col("blk").as("blk_b"), col("vecs").as("vecs_b"))
    // enumerate the upper-triangle block PAIRS as a tiny broadcast
    // relation and equi-join each side: hash joins that distribute block
    // rows to their tiles. A `blk_a <= blk_b` theta-join would plan a
    // BroadcastNestedLoopJoin and broadcast EVERY vector — fine at test
    // scale, a >8 GB broadcast at 100 TB (PlanCheckSpec guards this).
    val spark = embeddings.sparkSession
    import scala.jdk.CollectionConverters._
    val pairDf = spark.createDataFrame(
      (for { i <- 0 until numBlocks; j <- i until numBlocks }
        yield org.apache.spark.sql.Row(i, j)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("blk_a",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("blk_b",
          org.apache.spark.sql.types.IntegerType))))
    broadcast(pairDf).join(a, Seq("blk_a")).join(b, Seq("blk_b"))
      .select(explode(graft.functions.VectorFunctions.cosine_pairs(
        col("vecs_a"), col("vecs_b"), col("blk_a") === col("blk_b"),
        threshold)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.cos").as("cos"))
  }

  /** INCREMENTAL near-dup dedup — the steady-state production shape:
    * screen a NEW batch against an existing corpus without re-pairing
    * the corpus with itself. New docs' minhash band buckets equi-join
    * the corpus's band buckets (plus the new batch's own, so
    * within-batch dups are caught too); candidates verify by exact
    * n-gram Jaccard. Cost scales with the BATCH (its bands, its
    * candidate pairs), never corpus² — the corpus side contributes one
    * bucket scan. Returns one row per new doc: `(doc_id, kept,
    * dup_of)` — `dup_of` the smallest matched id (corpus or
    * earlier-in-batch), null when kept.
    */
  def incrementalNearDups(newDocs: DataFrame, corpus: DataFrame,
                          textCol: String = "text",
                          shingleSize: Int = 3, threshold: Double = 0.5,
                          numHashes: Int = 32,
                          bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    def banded(df: DataFrame) = stageCached(df
      .select(col("doc_id"),
        shingles(col(textCol), shingleSize).as("sh"))
      .withColumn("_sh", transform(col("sh"), s => xxhash64(s)))
      .withColumn("sig", minhashSignatureFromHashes(col("_sh"), numHashes))
      .withColumn("sz", size(col("sh")))
      .select(col("doc_id"), col("sh"), col("sz"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws("_",
            slice(col("sig"), b * rows + 1, lit(rows)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket"))
    val nb = banded(newDocs)
    val cb = banded(corpus)
    // candidate = a new doc sharing any band bucket with the corpus or
    // with a SMALLER-id new doc (batch-internal dups resolve min-first)
    val vs = cb.select(col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("sz").as("sz_b"))
      .unionByName(nb.select(col("band"), col("bucket"),
        col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("sz").as("sz_b")))
    val cand = nb.select(col("band"), col("bucket"),
        col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("sz").as("sz_a"))
      .join(vs, Seq("band", "bucket"))
      .filter(col("doc_a") =!= col("doc_b"))
      // same size-ratio necessary-condition cut as ngramJaccardPairsLsh
      // (r17): pairs with min-size < threshold·max-size cannot pass the
      // jaccard filter below — drop them before the array-carrying
      // distinct and the intersect
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b")))
      .select("doc_a", "doc_b", "sh_a", "sh_b", "sz_a", "sz_b")
      .distinct()
      .withColumn("common",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("common") * lit(1.0 + threshold) >=
        lit(threshold) * (col("sz_a") + col("sz_b")))
    // a new doc is a dup of the smallest matched id; batch-internal
    // matches only count against SMALLER new ids (min-first survival)
    val newIds = newDocs.select(col("doc_id").as("doc_a"))
    val dupOf = cand
      .join(newDocs.select(col("doc_id").as("doc_b")), Seq("doc_b"),
        "left_semi")
      .filter(col("doc_b") < col("doc_a"))
      .unionByName(cand.join(
        corpus.select(col("doc_id").as("doc_b")), Seq("doc_b"),
        "left_semi"))
      .groupBy("doc_a").agg(min("doc_b").as("dup_of"))
    newIds.join(dupOf, Seq("doc_a"), "left")
      .select(col("doc_a").as("doc_id"),
        col("dup_of").isNull.as("kept"), col("dup_of"))
  }

  /** End-to-end corpus dedup in one call — the composed pipeline a
    * user of this library runs on a raw crawl:
    *   1. EXACT pass (sha-256 groupBy): byte-identical copies collapse
    *      to the min-id canonical;
    *   2. NEAR-DUP pass over the exact survivors: MinHash-LSH candidate
    *      generation → exact n-gram-Jaccard verify at `threshold` →
    *      connected components, so transitive chains A~B~C keep ONE
    *      representative.
    * Returns one row per input doc: `(doc_id, kept, reason,
    * canonical_id)` — `reason` ∈ keep | exact_dup | near_dup names WHY a
    * drop happened (the audit trail reviewers ask for), `canonical_id`
    * the surviving representative. Every stage is the bucket/band-joined
    * shape of its standalone operator; nothing here adds a shuffle the
    * parts didn't already have. Call [[releaseCaches]] after the
    * consuming action.
    */
  def dedupPipeline(docs: DataFrame, textCol: String = "text",
                    shingleSize: Int = 3, threshold: Double = 0.5,
                    numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val ex = exact(docs, textCol) // (doc_id, canonical_id, n_copies)
    val exactSurv = docs.join(
      ex.filter(col("doc_id") === col("canonical_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val verified = ngramJaccardPairsLsh(exactSurv, textCol, shingleSize,
      threshold, numHashes, bands).select("doc_a", "doc_b")
    val labels = ConnectedComponents.run(verified)
      .withColumnRenamed("id", "doc_id")
      .withColumnRenamed("cluster_id", "near_canonical")
    val nearOf = exactSurv.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("near_canonical"), col("doc_id"))
          .as("near_canonical"))
    // exact drops chain THROUGH their canonical's near-dup resolution:
    // if B == A byte-wise and A ~ C, B's final canonical is C's
    ex.select(col("doc_id"), col("canonical_id").as("exact_canonical"))
      .join(nearOf.withColumnRenamed("doc_id", "exact_canonical"),
        Seq("exact_canonical"))
      .select(col("doc_id"), col("exact_canonical"),
        col("near_canonical").as("canonical_id"))
      .withColumn("kept", col("doc_id") === col("canonical_id"))
      .withColumn("reason",
        when(col("kept"), "keep")
          .when(col("doc_id") =!= col("exact_canonical"), "exact_dup")
          .otherwise("near_dup"))
      .select(col("doc_id"), col("kept"), col("reason"),
        col("canonical_id"))
  }

  /** '''SemDeDup''' (Abbas et al. 2023): semantic deduplication of an
    * embedded corpus — drop all but one member of every group of
    * semantically near-identical documents. Returns one row per vector:
    * `(id, group_id, keep)` with `group_id` = min id of the connected
    * component of ≥-threshold cosine pairs, `keep` = (id == group_id).
    *
    * Two modes:
    *  - `numCentroids <= 1` — exact: global block-matrix cosine pairs
    *    ([[embeddingNearDups]]). Ω(n²) FLOPs; the ORACLE mode.
    *  - `numCentroids > 1` — the paper's scale shape: a k-means coarse
    *    quantizer (fit on a bounded sample, one codegen'd assignment
    *    pass — [[Similarity.ivfIndex]] machinery) partitions the corpus,
    *    and pairs are searched only WITHIN each centroid's cell. FLOPs
    *    drop to Σ|cell|² ≈ n²/k; cross-cell near-dups are missed by
    *    construction (the paper's documented recall trade). Within each
    *    cell the pair search is still the block-matrix kernel, keyed on
    *    `(centroid, block)`, so a giant cell never becomes one task:
    *    the per-cell block-pair relation is `k·m²` broadcast rows.
    *
    * Both modes end with the same O(log n) connected-components solve,
    * so chains A~B~C collapse to one survivor either way.
    */
  def semanticDedup(embeddings: DataFrame, threshold: Double,
                    vecCol: String = "embedding", idCol: String = "vec_id",
                    numCentroids: Int = 0, numBlocks: Int = 8,
                    seed: Long = 42L): DataFrame = {
    val pairs =
      if (numCentroids <= 1)
        embeddingNearDups(embeddings, threshold, vecCol, idCol)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      else {
        val (indexed, centers) = Similarity.ivfIndex(embeddings,
          nlist = numCentroids, seed = seed, vecCol = vecCol)
        val staged = indexed.select(col(idCol).cast("long").as("id"),
            col(vecCol).cast("array<double>").as("v"), col("list_id"))
          .withColumn("blk",
            pmod(xxhash64(col("id")), lit(numBlocks)).cast("int"))
        val blocks = staged.groupBy("list_id", "blk")
          .agg(collect_list(struct(col("id"), col("v"))).as("vecs"))
        val a = blocks.select(col("list_id"), col("blk").as("blk_a"),
          col("vecs").as("vecs_a"))
        val b = blocks.select(col("list_id"), col("blk").as("blk_b"),
          col("vecs").as("vecs_b"))
        val spark = embeddings.sparkSession
        import scala.jdk.CollectionConverters._
        val pairDf = spark.createDataFrame(
          (for { i <- 0 until numBlocks; j <- i until numBlocks }
            yield org.apache.spark.sql.Row(i, j)).asJava,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("blk_a",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("blk_b",
              org.apache.spark.sql.types.IntegerType))))
        broadcast(pairDf).join(a, Seq("blk_a"))
          .join(b, Seq("list_id", "blk_b"))
          .select(explode(graft.functions.VectorFunctions.cosine_pairs(
            col("vecs_a"), col("vecs_b"), col("blk_a") === col("blk_b"),
            threshold)).as("p"))
          .select(col("p.id_a").as("doc_a"), col("p.id_b").as("doc_b"))
      }
    val labels = ConnectedComponents.run(pairs)
      .withColumnRenamed("id", idCol)
    embeddings.select(col(idCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("group_id"))
      .withColumn("keep", col(idCol) === col("group_id"))
  }
}
