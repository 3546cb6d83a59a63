package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.pipeline.{Classifier, Decontaminate, Dedup, Multimodal,
  Packing, Sampling, Similarity, TextAnalysis}

/** The declared operator surface (SURVEY.md §2) exercised as relational
  * queries over the driver-provided parquet tables, each mirrored by an
  * ANSI-SQL DuckDB oracle in [[Oracles]]. Engine operators (changeset
  * merge, conflict semi-joins, GC anti-join, extents aggregation, ops-log
  * windows, ...) are validated here in their relational *shape* (FIXTURES
  * §B); the end-to-end engine behavior is covered by the ScalaTest specs.
  *
  * Conventions for oracle parity:
  *  - every computed column is aliased identically in Spark and SQL;
  *  - double aggregates are `round`ed (2–6 dp) on both sides;
  *  - deterministic ORDER BY on both sides;
  *  - timestamps never leave as raw values (formatted/truncated strings).
  */
object Queries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as LONG
    * (spark.sql.legacy.parquet.nanosAsLong=true, set in Verify/Bench/tests)
    * — convert to a proper timestamp (micros, truncating) for parity with
    * DuckDB's native ns timestamps.
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------
  // §2.4 aggregations
  // ---------------------------------------------------------------

  /** TPC-H Q1 shape: groupBy-agg with map-side partials. */
  val q1_agg: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** aggregate_extents: per-key coordinate bounding boxes (min/max). */
  val q_extents: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy("l_suppkey")
      .agg(min("l_linenumber").as("emin"), max("l_linenumber").as("emax"),
        round(min("l_quantity"), 2).as("qmin"),
        round(max("l_quantity"), 2).as("qmax"),
        count(lit(1)).as("refs"))
      .orderBy("l_suppkey")

  /** updated_chunks_counts: per-node counts over an edit stream. */
  val q_counts_per_node: Q = (s, d) =>
    events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("event_type")

  /** chunk_storage_stats: sum of sizes deduped by chunk id (dedupe →
    * rollup, stats.rs:181-260).
    */
  val q_storage_stats: Q = (s, d) => {
    val perChunk = t(s, d, "lineitem")
      .groupBy("l_partkey")
      .agg(max("l_extendedprice").as("sz"))
    perChunk.join(t(s, d, "part"),
        perChunk("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_chunks"), round(sum("sz"), 2).as("bytes"))
      .orderBy("p_brand")
  }

  /** getsize_prefix: filter by key prefix + sum of lengths. */
  val q_getsize_prefix: Q = (s, d) =>
    t(s, d, "part")
      .filter(col("p_name").startsWith("small"))
      .agg(count(lit(1)).as("n"),
        round(sum("p_retailprice"), 2).as("total_size"))

  // ---------------------------------------------------------------
  // §2.2 projections / filters / predicates
  // ---------------------------------------------------------------

  /** Filter + projection pushed to the parquet scan. */
  val q_filter_pushdown: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01") && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity"), 2).as("qty"),
        round(col("l_extendedprice"), 2).as("price"))
      .orderBy("l_orderkey", "l_linenumber")

  /** list_prefix / list_dir: prefix scan over a name-keyed relation. */
  val q_prefix_scan: Q = (s, d) =>
    t(s, d, "part")
      .filter(col("p_name").startsWith("large"))
      .select("p_partkey", "p_name", "p_brand")
      .orderBy("p_partkey")

  /** exists / is_empty: key-membership semi-join. */
  val q_exists: Q = (s, d) => {
    val li = t(s, d, "lineitem").filter(col("l_quantity") > 49)
    t(s, d, "orders")
      .join(li.select(col("l_orderkey")), col("o_orderkey") === col("l_orderkey"),
        "left_semi")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
      .orderBy("o_orderkey")
  }

  /** valid_chunk_coord: conjunctive bounds predicate. */
  val q_bounds_filter: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_linenumber") >= 1 && col("l_linenumber") < 3 &&
        col("l_quantity") >= 10 && col("l_quantity") < 20)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------
  // §2.3 joins (the engine's five join shapes)
  // ---------------------------------------------------------------

  /** Chunk point-lookup: key-set filter (broadcast lookup join shape). */
  val q_point_lookup: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(997)) === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity"), 2).as("qty"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Changeset-over-snapshot merge: prev LEFT-ANTI changed ∪ changed
    * (write_manifest_with_changes, session.rs:2587-2635).
    */
  val q_changeset_merge: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    val prev = li.filter(col("l_shipdate") < lit("1995-06-01"))
    val changed = li.filter(col("l_shipdate") >= lit("1995-06-01"))
    val key = Seq("l_orderkey", "l_linenumber")
    prev.join(changed.select(key.map(col): _*), key, "left_anti")
      .unionByName(changed)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy("l_returnflag")
  }

  /** Conflict detection: chunk double-update semi-join on composite key
    * (detector.rs:21-305).
    */
  val q_conflict_semijoin: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    val ours = li.filter(col("l_discount") >= 0.05)
    val theirs = li.filter(col("l_tax") >= 0.05)
      .select("l_orderkey", "l_linenumber")
    ours.join(theirs, Seq("l_orderkey", "l_linenumber"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("conflicts"))
      .orderBy("l_returnflag")
  }

  /** GC reachability: listed objects LEFT-ANTI live set (gc.rs:261-320):
    * customers not "pointed at" by any order in the retention window.
    */
  val q_gc_antijoin: Q = (s, d) =>
    t(s, d, "customer")
      .join(t(s, d, "orders")
          .filter(col("o_orderdate") < lit("1995-07-01"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Diff path resolution: edit set ⨝ node dimension (diff.rs:53-61). */
  val q_diff_join: Q = (s, d) =>
    t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("p_brand")

  // ---------------------------------------------------------------
  // §2.5 / §2.6 windows, sorts, top-k
  // ---------------------------------------------------------------

  /** ancestry / ops-log ordering: per-key lag over an ordered log. */
  val q_ancestry_lag: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    events(s, d)
      .withColumn("prev_value", lag("value", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        round(sum(abs(col("value") - coalesce(col("prev_value"),
          col("value")))), 2).as("total_delta"))
      .orderBy("user_id")
  }

  /** latest-N ring: global top-k with deterministic tiebreak. */
  val q_topk: Q = (s, d) =>
    events(s, d)
      .orderBy(col("value").desc, col("event_id"))
      .limit(100)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"))

  /** Running aggregate (cumulative window). */
  val q_window_running: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    events(s, d)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"),
        round(sum("value").over(w), 2).as("running"))
      .orderBy("user_id", "event_id")
  }

  // ---------------------------------------------------------------
  // §2.7 set operations
  // ---------------------------------------------------------------

  /** Diff sets: intersect / except over edit key sets (diff.rs:12-24). */
  val q_setops: Q = (s, d) => {
    val o = t(s, d, "orders")
    def custsIn(y: Int) =
      o.filter(col("o_orderdate") >= lit(f"$y%04d-01-01") &&
        col("o_orderdate") < lit(f"${y + 1}%04d-01-01"))
        .select("o_custkey").distinct()
    custsIn(1996).intersect(custsIn(1997))
      .except(custsIn(1998))
      .orderBy("o_custkey")
  }

  // ---------------------------------------------------------------
  // §2.8 scalar functions
  // ---------------------------------------------------------------

  /** Zarr key parse/format round-trip as a relational op: format chunk
    * keys, parse coords back out, aggregate (store.rs:1048-1156 shape).
    */
  val q_zarr_keys: Q = (s, d) =>
    t(s, d, "lineitem")
      .select(concat(lit("temp/c/"), pmod(col("l_orderkey"), lit(16)),
        lit("/"), col("l_linenumber")).as("key"))
      .select(
        regexp_extract(col("key"), "^temp/c/([0-9]+)/([0-9]+)$", 1)
          .cast("int").as("c0"),
        regexp_extract(col("key"), "^temp/c/([0-9]+)/([0-9]+)$", 2)
          .cast("int").as("c1"))
      .groupBy("c0")
      .agg(count(lit(1)).as("n"), max("c1").as("max_c1"))
      .orderBy("c0")

  /** ByteRange arithmetic: clamped [from, to) long math
    * (construct_valid_byte_range, lib.rs:252-312 shape).
    */
  val q_byterange: Q = (s, d) =>
    t(s, d, "lineitem")
      .select(col("l_returnflag"),
        least(floor(col("l_extendedprice")).cast("long") % 8192, lit(8192L))
          .as("ofrom"),
        floor(col("l_quantity")).cast("long").as("len"))
      .select(col("l_returnflag"), col("ofrom"),
        least(col("ofrom") + col("len"), lit(8192L)).as("oto"))
      .groupBy("l_returnflag")
      .agg(sum(col("oto") - col("ofrom")).as("bytes"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------
  // §2.9 streaming-shaped (batch-equivalent of the streaming aggs;
  // true readStream covered in StreamingSpec)
  // ---------------------------------------------------------------

  /** Tumbling-window aggregation over the event stream. */
  val q_stream_window: Q = (s, d) =>
    events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("hour", "event_type")

  /** Sessionization: 30-minute-gap sessions per user (stateful-stream
    * shape, computed declaratively with windows).
    */
  val q_sessionize: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    events(s, d)
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("gap",
        when(col("sec") - lag("sec", 1).over(w) > 1800, 1).otherwise(0))
      .groupBy("user_id")
      .agg((sum("gap") + 1).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** AS-OF join: every purchase event picks up the user's latest
    * prior-or-simultaneous view event (id + value) — the time-series
    * join Spark has no native operator for, planned as ONE union +
    * window pass ([[graft.pipeline.Events.asofJoin]]: hash shuffle on
    * the key, no range-join pair blowup). The oracle is DuckDB's NATIVE
    * `ASOF LEFT JOIN` — two independent implementations of the
    * operator's semantics.
    */
  val q_asof_join: Q = (s, d) => {
    val ev = events(s, d)
    val w = Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)
    val rights = ev.filter(col("event_type") === "view")
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("user_id"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"),
        round(col("value"), 4).as("r_value"))
    val lefts = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    graft.pipeline.Events.asofJoin(lefts, rights, "user_id", "ts", "r_ts",
        Seq("r_event_id", "r_value"), tieBreak = "r_event_id")
      .select("event_id", "user_id", "r_event_id", "r_value")
      .orderBy("event_id")
  }

  /** Conversion funnel: per signed-up user, purchases within 7 days of
    * the FIRST signup and the seconds-to-first-conversion — the
    * activation metric of an event pipeline. One aggregate for the
    * signup anchor, one keyed join, one rollup.
    */
  val q_funnel: Q = (s, d) => {
    val ev = events(s, d)
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min(unix_timestamp(col("ts"))).as("su"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_timestamp(col("ts")).as("pt"))
    signup.join(purch, Seq("user_id"), "left")
      .withColumn("inw",
        col("pt").isNotNull && col("pt") >= col("su") &&
          col("pt") <= col("su") + lit(7L * 86400))
      .groupBy("user_id")
      .agg(sum(when(col("inw"), 1).otherwise(0)).as("n_purchases_7d"),
        min(when(col("inw"), col("pt") - col("su"))).as("first_gap_s"))
      .orderBy("user_id")
  }

  /** BAND join: (purchase, error) event pairs of the same user within
    * 600 s, bucketed into an EQUI-join on (user, ts div 600) with the
    * right side tripled into neighbor buckets — the inequality-join
    * shape Catalyst would otherwise nest-loop. Rolled up per user; the
    * oracle runs the plain inequality join in DuckDB.
    */
  val q_band_join: Q = (s, d) => {
    val ev = events(s, d)
    val lefts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_timestamp(col("ts")).as("pts"))
    val rights = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("e_id"),
        unix_timestamp(col("ts")).as("ets"))
    graft.pipeline.Events.bandJoin(lefts, rights, "user_id", "pts", "ets",
        maxGap = 600L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("pts") - col("ets"))).as("min_gap"),
        max(abs(col("pts") - col("ets"))).as("max_gap"))
      .orderBy("user_id")
  }

  /** Skew-safe salted join: lineitem ⨝ orders with a deliberately low
    * hot threshold so most keys take the salted path (left rows spread
    * over 4 salt buckets, right hot rows replicated); the rolled-up
    * result must equal the PLAIN join's — salting only re-buckets rows —
    * which is exactly what the oracle's naive join checks.
    */
  val q_salted_join: Q = (s, d) => {
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val ord = t(s, d, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.pipeline.Events.saltedJoin(li, ord, "l_orderkey",
        salts = 4, hotThreshold = 3, maxHotKeys = 100000)
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        2).as("revenue"), count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  // ---------------------------------------------------------------
  // Training-data pipeline: dedup
  // ---------------------------------------------------------------

  val q_dedup_exact: Q = (s, d) =>
    Dedup.exact(t(s, d, "documents")).orderBy("doc_id")

  val q_dedup_ngram_jaccard: Q = (s, d) =>
    Dedup.ngramJaccardPairs(t(s, d, "documents"), n = 3,
        blockCol = "lang", threshold = 0.05)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** The 100 TB n-gram dedup path, audited for containment: the production
    * plan is [[Dedup.ngramJaccardPairsLsh]] at a REALISTIC banding
    * (32 hashes, 8 bands × 4 rows, threshold 0.5 — the S-curve knee sits
    * near j ≈ (1/8)^(1/4) ≈ 0.6), and the query emits one row per exact
    * all-pairs match (j ≥ 0.5) with `lsh_ok` encoding the containment
    * contract the oracle can check by plain equality:
    *   - an LSH pair outside the exact set would surface as an extra row
    *     with `lsh_ok = false` (soundness: output ⊆ exact all-pairs);
    *   - an exact pair with j ≥ 0.85 that LSH missed gets
    *     `lsh_ok = false` (recall WELL ABOVE the knee: per-pair miss
    *     probability at j = 0.85 is (1−0.85⁴)^8 ≈ 0.3%, vs ~33% at the
    *     knee itself — the audit must not fire on the S-curve's
    *     legitimate probabilistic misses);
    *   - exact pairs with j < 0.85 are `lsh_ok = true` either way (the
    *     probabilistic band, allowed to miss by construction).
    * The oracle is the exact all-pairs CTE with constant TRUE — equality
    * holds iff both containment directions hold. The exact all-pairs side
    * exists only to audit at test scale; at 100 TB one runs the LSH path
    * alone (bucket join, no lang mega-block, no all-pairs anywhere).
    */
  val q_dedup_ngram_lsh: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val lsh = Dedup.ngramJaccardPairsLsh(docs, n = 3, threshold = 0.5,
        numHashes = 32, bands = 8)
      .select(col("doc_a"), col("doc_b"), col("jaccard").as("j_lsh"))
    val exact = Dedup.ngramJaccardPairs(docs.withColumn("_all", lit(1)),
        n = 3, blockCol = "_all", threshold = 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard").as("j_exact"))
    exact.join(lsh, Seq("doc_a", "doc_b"), "full_outer")
      .select(col("doc_a"), col("doc_b"),
        round(coalesce(col("j_exact"), col("j_lsh")), 6).as("jaccard"),
        when(col("j_exact").isNull, lit(false)) // unsound LSH pair
          .otherwise(col("j_lsh").isNotNull || col("j_exact") < 0.85)
          .as("lsh_ok"))
      .orderBy("doc_a", "doc_b")
  }

  /** Train/eval decontamination: corpus docs (doc_id % 20 != 0) sharing
    * ≥ 5 distinct 3-gram shingles with any doc of a held-out benchmark
    * slice (doc_id % 20 == 0). The benchmark posting list broadcasts;
    * the corpus streams exploded — no corpus-side shuffle before the
    * overlap agg.
    */
  val q_decontaminate: Q = (s, d) => {
    val docs = t(s, d, "documents")
    Decontaminate.overlap(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        n = 3, minShared = 5)
      .orderBy("doc_id", "bench_id")
  }

  /** Same decontamination through the BLOOM-prefiltered path: benchmark
    * shingle hashes become a literal bitset tested map-side before any
    * join, exact verification on the survivors — identical result to
    * [[q_decontaminate]], same oracle.
    */
  val q_decontaminate_bloom: Q = (s, d) => {
    val docs = t(s, d, "documents")
    Decontaminate.overlapBloom(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        n = 3, minShared = 5)
      .orderBy("doc_id", "bench_id")
  }

  /** MinHash-LSH near-dup candidates in the PORTABLE construction
    * (FNV shingle hashes, closed-form coefficients, raw band-slice
    * bucket keys). Oracle-matched: DuckDB replays the signatures, the
    * banding and the match-fraction estimate exactly.
    */
  val q_dedup_minhash: Q = (s, d) =>
    Dedup.minhashCandidates(t(s, d, "documents"), numHashes = 32, bands = 8,
        portable = true)
      .filter(col("est_jaccard") >= 0.4)
      .orderBy("doc_a", "doc_b")

  /** SimHash near-dup candidates. Oracle-matched since the token hash
    * moved to dual FNV-1a (engine-portable): DuckDB replays votes,
    * sub-key blocking and Hamming arithmetic bit-for-bit.
    */
  val q_dedup_simhash: Q = (s, d) =>
    Dedup.simhashCandidates(t(s, d, "documents"), maxHamming = 6)
      .orderBy("doc_a", "doc_b")

  val q_embedding_neardups: Q = (s, d) =>
    Dedup.embeddingNearDups(t(s, d, "embeddings"), threshold = 0.35)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy("id_a", "id_b")

  /** Incremental dedup: docs with id % 10 == 0 arrive as the NEW batch
    * and screen against the remaining corpus (plus smaller-id batch
    * mates) — cost scales with the batch, never corpus². Oracle:
    * first-principles Jaccard at the 0.6 banding knee (fixed minhash
    * seed ⇒ deterministic recall, as with q_dedup_pipeline).
    */
  val q_dedup_incremental: Q = (s, d) => {
    val docs = t(s, d, "documents")
    Dedup.incrementalNearDups(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0), threshold = 0.6)
      .orderBy("doc_id")
  }

  /** The composed end-to-end dedup pipeline: exact pass → MinHash-LSH
    * candidates → exact Jaccard verify (0.6, the banding knee) →
    * clusters → keep/drop with audit reasons. The oracle recomputes the
    * same decision from first principles (exact grouping + all-pairs
    * shingle Jaccard + recursive-CTE components): the minhash seed is
    * fixed, so LSH recall on this corpus is deterministic and the two
    * ends agree row-for-row.
    */
  val q_dedup_pipeline: Q = (s, d) =>
    Dedup.dedupPipeline(t(s, d, "documents"), threshold = 0.6)
      .orderBy("doc_id")

  /** SemDeDup keep/drop decision (exact mode): one survivor per
    * connected component of ≥0.35-cosine pairs, everything else marked
    * for dropping. The DuckDB oracle recomputes components with a
    * recursive CTE and the keep rule as `vec_id = group_id`. The
    * k-means-partitioned scale mode is spec-covered (PipelineSpec:
    * exact keeps ⊆ partitioned keeps, high agreement).
    */
  val q_semantic_keep: Q = (s, d) =>
    Dedup.semanticDedup(t(s, d, "embeddings"), threshold = 0.35)
      .orderBy("vec_id")

  /** Embedding near-dup CLUSTERS: exact block-matrix cosine pairs at the
    * threshold collapsed into connected components (large-star/small-star
    * — the same O(log n)-round solver as the n-gram cluster path), so
    * transitive chains of near-identical embeddings dedup to one
    * canonical vector. DuckDB mirrors with a recursive CTE.
    */
  val q_embedding_clusters: Q = (s, d) => {
    val emb = t(s, d, "embeddings")
    val pairs = Dedup.embeddingNearDups(emb, threshold = 0.35)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val labels = graft.pipeline.ConnectedComponents.run(pairs)
      .withColumnRenamed("id", "vec_id")
    emb.select(col("vec_id"))
      .join(labels, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .orderBy("vec_id")
  }

  /** Per-label embedding centroids: one map-side-combined aggregation
    * over the exploded (label, dim) space — the class-prototype /
    * cluster-center primitive of curation pipelines (shuffle carries
    * labels × dims partials, never vectors).
    */
  val q_embedding_centroids: Q = (s, d) =>
    t(s, d, "embeddings")
      .select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos")
      .agg(round(avg(col("col")), 4).as("mean_v"), count(lit(1)).as("n"))
      .orderBy("label", "pos")

  // ---------------------------------------------------------------
  // Training-data pipeline: similarity search
  // ---------------------------------------------------------------

  /** Brute-force cosine top-k against the vec_id=0 embedding. */
  val q_similarity_topk: Q = (s, d) => {
    val emb = t(s, d, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    Similarity.bruteForceTopK(emb, query, 20)
  }

  /** Invariant-audit reshaping for the approximate-search queries (the
    * `lsh_ok` playbook from [[q_dedup_ngram_lsh]]): the seeded
    * RNG inside each index (hyperplanes, k-means) cannot be replayed in
    * SQL, but the result's CONTRACT can. Output rows are the EXACT
    * top-k (engine-portable arithmetic both engines compute identically)
    * with two audit booleans the oracle emits as constant TRUE:
    *
    *   - `sound`: rank-domination — the approximate path's i-th best
    *     (rounded) score never exceeds the exact i-th best. Holds for
    *     ANY candidate subset by optimality of the exact top-k (rounding
    *     is monotone, so it survives the round-6 grid), i.e. a violation
    *     means the approximate path scored or ranked WRONG, not that it
    *     sampled unluckily.
    *   - `*_ok`: recall-at-margin — every exact neighbor with cosine ≥
    *     the pinned margin must appear in the approximate result. The
    *     margins (0.45 query-probe / 0.6 all-pairs) sit well above the
    *     observed miss ceiling of the seeded indexes on the gate
    *     fixtures (worst missed cosine 0.370 / 0.513 across sf0.001 and
    *     sf0.01 — AnnAuditProbe measures this), so the bit only flips
    *     when the index regresses into missing STRONG neighbors, never
    *     on the probabilistic tail it is allowed to miss.
    *
    * Hash equality against the oracle therefore proves both directions;
    * the approximate relation itself is exercised as the join's right
    * side. The exact side exists only to audit at test scale — at
    * 100 TB one runs the approximate path alone.
    */
  private[graft] def annAudit(exact: DataFrame, approx: DataFrame,
                              margin: Double, okCol: String): DataFrame = {
    val byScore = Window.orderBy(col("cos").desc, col("vec_id"))
    val exactR = exact.withColumn("rank", row_number().over(byScore))
    val approxR = approx
      .withColumn("rank", row_number().over(byScore))
      .select(col("rank"), col("cos").as("_acos"))
    val hits = approx.select(col("vec_id"), lit(true).as("_hit"))
    // missing `_acos` (the approximate path returned FEWER rows than the
    // exact top-k) counts as NOT sound: the single-query paths (sign-LSH
    // multi-probe, IVF nprobe, PQ re-scoring) deterministically fill k
    // on the gate fixtures (AnnAuditProbe: n_approx=20 at sf0.001 and
    // sf0.01 for all three), so a short result is a regression, not an
    // unlucky sample — a coalesce-to-true here would let a truncated
    // approximate relation pass rank-domination vacuously.
    exactR.join(approxR, Seq("rank"), "left")
      .join(hits, Seq("vec_id"), "left")
      .select(col("rank"), col("vec_id"), col("cos"),
        coalesce(col("_acos") <= col("cos"), lit(false)).as("sound"),
        (coalesce(col("_hit"), lit(false)) || col("cos") < lit(margin))
          .as(okCol))
      .orderBy("rank")
  }

  /** Batched ANN join: exact top-5 per vector (both engines compute it)
    * audited against the LSH-bucketed result — `sound` by per-vector
    * rank domination, `ann_ok` by recall at the 0.6 margin (worst
    * observed LSH miss on the fixtures: cosine 0.513).
    */
  val q_ann_neighbors: Q = (s, d) => {
    val emb = t(s, d, "embeddings")
    // cast + self-norm hoisted above the all-pairs audit join (same
    // dot/(n·n) op order as Similarity.cosine — values bit-identical)
    val pre = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("_v"))
      .withColumn("_n", sqrt(Similarity.dot(col("_v"), col("_v"))))
    // the audit join is a BroadcastNestedLoop over a one-partition
    // parquet side — repartition the PROBE side so the n² kernel runs
    // on every core instead of one task (6 s → sub-second at sf0.1)
    val a = pre.repartition(32, col("vec_id"))
      .select(col("vec_id").as("id_a"), col("_v").as("v_a"),
        col("_n").as("n_a"))
    val b = pre.select(col("vec_id").as("id_b"), col("_v").as("v_b"),
      col("_n").as("n_b"))
    val byScore = Window.partitionBy("id_a")
      .orderBy(col("cos").desc, col("id_b"))
    val exact = a.join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.dot(col("v_a"), col("v_b")) /
          (col("n_a") * col("n_b")), 6).as("cos"))
      .withColumn("rank", row_number().over(byScore))
      .filter(col("rank") <= 5)
    val lsh = Similarity.neighborsPerVector(emb, k = 5, numPlanes = 6)
    val lshR = lsh.select(col("id_a"), col("rank"),
      col("cos").as("_acos"))
    val hits = lsh.select(col("id_a"), col("id_b"), lit(true).as("_hit"))
    // per-vector results may LEGITIMATELY be short (a vector whose LSH
    // buckets hold < 5 mates has < 5 rows — ~50 such vectors on each
    // gate fixture), so a missing `_acos` cannot flip `sound` here the
    // way annAudit's does. The null case is still non-vacuous: `_acos`
    // null at rank r means the vector has < r approximate rows, and if
    // exact cos at rank r ≥ 0.6 then ranks 1..r are ALL ≥ 0.6 (sorted),
    // so `ann_ok` forces r hits for this vector — contradiction. A
    // truncated approximate relation therefore fails `ann_ok` on any
    // strong rank it vacates; only sub-margin tails (which the audit
    // design explicitly tolerates missing) coalesce to true.
    exact.join(lshR, Seq("id_a", "rank"), "left")
      .join(hits, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"), col("rank"), col("cos"),
        coalesce(col("_acos") <= col("cos"), lit(true)).as("sound"),
        (coalesce(col("_hit"), lit(false)) || col("cos") < lit(0.6))
          .as("ann_ok"))
      .orderBy("id_a", "rank")
  }

  /** LSH-bucketed ANN top-k, audited against the exact top-20 (margin
    * 0.45; worst observed multi-probe miss on the fixtures: 0.370).
    */
  val q_similarity_ann: Q = (s, d) => {
    val emb = t(s, d, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    annAudit(Similarity.bruteForceTopK(emb, query, 20),
      Similarity.annTopK(emb, query, 20, numPlanes = 4), 0.45, "ann_ok")
  }

  /** Product-quantization ANN: vectors compress to 8 subspace codes,
    * search is 8 table lookups per row by asymmetric distance — the scan
    * never touches the original vectors. Audited at margin 0.45 (worst
    * observed ADC-ranked miss: 0.370); rank domination uses the TRUE
    * cosines of the PQ-reported ids, so a PQ result that ranked a
    * genuinely-worse vector above the exact i-th best flips `sound`.
    */
  val q_similarity_pq: Q = (s, d) => {
    val emb = t(s, d, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val model = Similarity.pqFit(emb, m = 8, k = 16)
    val pq = Similarity.pqTopK(Similarity.pqEncode(emb, model), model,
      query, 20)
    // re-score the PQ-selected ids by true cosine for the audit columns
    val rescored = pq.join(emb.select(col("vec_id"), col("embedding")),
        Seq("vec_id"))
      .select(col("vec_id"),
        round(Similarity.cosine(col("embedding").cast("array<double>"),
          typedLit(query.map(_.toDouble))), 6).as("cos"))
    annAudit(Similarity.bruteForceTopK(emb, query, 20), rescored,
      0.45, "pq_ok")
  }

  /** IVF ANN top-k: k-means coarse quantizer + nprobe-list search,
    * audited at margin 0.45 (worst observed nprobe-8 miss: 0.363).
    */
  val q_similarity_ivf: Q = (s, d) => {
    val emb = t(s, d, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val (indexed, centers) = Similarity.ivfIndex(emb, nlist = 32)
    annAudit(Similarity.bruteForceTopK(emb, query, 20),
      Similarity.ivfTopK(indexed, centers, query, 20, nprobe = 8),
      0.45, "ivf_ok")
  }

  // ---------------------------------------------------------------
  // Training-data pipeline: text analysis
  // ---------------------------------------------------------------

  val q_text_analysis: Q = (s, d) => {
    val tcol = col("text")
    t(s, d, "documents").select(
      col("doc_id"),
      TextAnalysis.tokenCount(tcol).as("n_tokens"),
      size(regexp_extract_all(lower(tcol),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("n_bpeish"),
      round(TextAnalysis.stopwordRatio(tcol), 6).as("stopword_ratio"),
      round(TextAnalysis.meanTokenLength(tcol), 6).as("mean_token_len"),
      TextAnalysis.langId(tcol).as("lang_pred"))
      .orderBy("doc_id")
  }

  val q_quality_score: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text"))
        .as("quality"))
      .orderBy("doc_id")

  /** Concat-and-chunk sequence packing (512-token training sequences):
    * per-bucket windows + driver prefix offsets — no global sort.
    */
  val q_pack_sequences: Q = (s, d) =>
    Packing.packSequences(t(s, d, "documents"), "doc_id",
      TextAnalysis.tokenCount(col("text")), window = 512L)
      .orderBy("doc_id")

  /** Deterministic seeded shuffle into 8 training shards: reproducible
    * permutation via int64 arithmetic, per-shard windows.
    */
  val q_shuffle_shard: Q = (s, d) =>
    Packing.shuffleShards(t(s, d, "documents"), "doc_id", shards = 8)
      .orderBy("shard", "pos")

  /** PII scrub over synthesized PII (the fixture is clean, so the query
    * plants a deterministic email/phone/IP per doc with plain concat —
    * identically in the oracle — and both engines must redact them the
    * same way).
    */
  val q_pii_scrub: Q = (s, d) =>
    t(s, d, "documents").select(
      col("doc_id"),
      TextAnalysis.piiScrub(concat(
        col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or +1 555-01"), col("doc_id"),
        lit(" at 10.0.0."), pmod(col("doc_id"), lit(256))))
        .as("scrubbed"))
      .orderBy("doc_id")

  /** Within-document repetition: token totals vs distinct tokens. */
  val q_repetition: Q = (s, d) =>
    t(s, d, "documents").select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.distinctTokenCount(col("text")).as("n_distinct"))
      .orderBy("doc_id")

  /** Duplicate clustering: connected components (large-star/small-star)
    * over a candidate-pair graph. The pair rule here is SQL-expressible
    * (same lang, |Δn_chars| ≤ 10) so DuckDB can mirror it with a
    * recursive CTE; the production path feeds
    * [[Dedup.minhashCandidates]] pairs into the same component solver
    * ([[Dedup.nearDupClusters]], spec-verified).
    */
  /** Duplicate-cluster SIZE histogram: how many components of each
    * cardinality — the one-page audit of a dedup pass ("mostly pairs,
    * one 400-doc blob" reads very differently from a flat count). Two
    * tiny rollups on top of the component labels; oracle recomputes the
    * components with the recursive CTE.
    */
  val q_cluster_sizes: Q = (s, d) =>
    q_dedup_clusters(s, d)
      .groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
      .groupBy("n_members").agg(count(lit(1)).as("n_clusters"))
      .orderBy("n_members")

  val q_dedup_clusters: Q = (s, d) => {
    val docs = t(s, d, "documents")
    // The proximity rule lives on a line, so CONSECUTIVE-neighbor edges
    // (sorted by n_chars within lang) generate the identical transitive
    // closure as the full O(n·density) pair join: a direct edge
    // |Δn_chars| ≤ 10 implies every consecutive gap between its
    // endpoints is ≤ 10. O(n) edges into the component solver.
    val w = Window.partitionBy("lang").orderBy("n_chars", "doc_b")
    val pairs = docs
      .select(col("doc_id").as("doc_b"), col("lang"), col("n_chars"))
      .withColumn("doc_a", lag("doc_b", 1).over(w))
      .withColumn("gap", col("n_chars") - lag("n_chars", 1).over(w))
      .where(col("doc_a").isNotNull && col("gap") <= 10)
    val labels = graft.pipeline.ConnectedComponents.run(pairs)
      .withColumnRenamed("id", "doc_id")
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test split: md5-bucket assignment (the
    * cross-engine-reproducible [[graft.pipeline.Sampling.hashBucket]]
    * mode), aggregated per (lang, split) so the oracle hash-checks every
    * document's membership.
    */
  val q_sample_split: Q = (s, d) => {
    val split = graft.pipeline.Sampling.assignSplit(
      t(s, d, "documents"), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      buckets = 10000, method = "md5")
    split.groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("lang", "split")
  }

  /** Corpus token statistics with exact interpolated percentiles. */
  val q_corpus_stats: Q = (s, d) =>
    TextAnalysis.corpusStats(t(s, d, "documents")).orderBy("lang")

  /** Per-source curation rollup: dup rate, short rate, language
    * entropy, keep/drop decision (the source-pruning pass of a
    * training-data pipeline).
    */
  val q_source_curation: Q = (s, d) =>
    TextAnalysis.sourceCuration(t(s, d, "documents")).orderBy("source")

  /** Cross-source leakage audit: documents whose leading-prefix probe
    * (40 chars — byte-exact duplicates rarely survive re-crawling, a
    * prefix fingerprint does) appears under MORE THAN ONE source — a
    * benchmark document leaking into several dumps, or syndicated
    * content inflating several domains. One hash aggregation on a
    * fixed-width key; the 100 TB shape is identical with the prefix
    * replaced by any digest column.
    */
  val q_cross_source: Q = (s, d) =>
    t(s, d, "documents")
      .groupBy(substring(col("text"), 1, 40).as("probe"))
      .agg(
        countDistinct(col("source")).as("n_sources"),
        count(lit(1)).as("n_copies"),
        min("doc_id").as("canonical_id"),
        min("source").as("first_source"),
        max("source").as("last_source"))
      .filter(col("n_sources") > 1)
      .select("canonical_id", "n_sources", "n_copies",
        "first_source", "last_source")
      .orderBy("canonical_id")

  /** Perplexity-style quality score: per-doc average negative
    * log-likelihood under a per-language corpus-trained char-trigram
    * model; the oracle rebuilds the identical model in SQL.
    */
  val q_lm_score: Q = (s, d) =>
    TextAnalysis.charTrigramScore(t(s, d, "documents")).orderBy("doc_id")

  /** Hashed-feature logistic scoring with a CLOSED-FORM weight table
    * (w[d] = (d % 21 − 10)/1000, bias −0.05, dim 64): exercises the real
    * scoring plan — explode → broadcast weight join → one aggregation —
    * while DuckDB recomputes every md5 feature index, weight, and
    * sigmoid bit-for-bit (4-dp rounded, like q_bm25).
    */
  val q_classifier_score: Q = (s, d) => {
    val w = Array.tabulate(64)(i => (i % 21 - 10) / 1000.0)
    Classifier.score(t(s, d, "documents"), "doc_id", "text",
        Classifier.LogRegModel(w, -0.05))
      .select(col("doc_id"), round(col("score"), 4).as("score"))
      .orderBy("doc_id")
  }

  /** REAL trained classifier end-to-end (rows-only: the oracle cannot
    * run gradient descent): learn a topical label from the corpus
    * itself — "does the document mention spark or stream?" — score
    * every document with the learned weights, and report per-source
    * rollups incl. agreement with the true label. The fixture's lang
    * column is text-independent (verified: a model trained on it
    * converges to the base rate), so the topical label is what makes
    * this an honest learning demo. Deterministic full-batch GD.
    */
  val q_classifier_train: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val labeled = docs.withColumn("label",
      col("text").rlike("\\bspark\\b").cast("int"))
    val model = Classifier.train(labeled, "text", "label", dim = 256,
      iters = 100, lr = 1.0)
    Classifier.score(docs, "doc_id", "text", model)
      .join(labeled.select("doc_id", "source", "label"), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum("label").as("n_true"),
        sum((col("score") > 0.5).cast("long")).as("n_pred"),
        sum(((col("score") > 0.5) === (col("label") === 1))
          .cast("long")).as("n_agree"))
      .orderBy("source")
  }

  /** Cohort retention triangle over the event stream: users bucketed by
    * first-event day, distinct-active counts per day offset. Integral
    * epoch-day arithmetic — DuckDB reproduces every cell.
    */
  val q_retention: Q = (s, d) =>
    graft.pipeline.Events.retentionCohorts(events(s, d))
      .orderBy("cohort_day", "day_offset")

  /** Per-event-type value quantiles: exact interpolated percentiles
    * over integer hundredths (both engines share the classical
    * interpolation on identical integer inputs — the corpusStats
    * recipe applied to the metric plane). Oracle-matched.
    */
  val q_value_quantiles: Q = (s, d) =>
    t(s, d, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(v, 0.5)") / 100.0, 6).as("p50"),
        round(expr("percentile(v, 0.9)") / 100.0, 6).as("p90"),
        round(expr("percentile(v, 0.99)") / 100.0, 6).as("p99"))
      .orderBy("event_type")

  /** Funnel time-to-convert: per stage ≥ 2, exact percentiles of the
    * seconds from stage-1 arrival (oracle-matched — the percentile
    * recipe over integral gaps).
    */
  val q_funnel_timing: Q = (s, d) =>
    graft.pipeline.Events.funnelTiming(events(s, d),
      Seq("view", "click", "purchase"))

  /** Trailing-window anomaly scores: per-user z against the previous 20
    * events — exact scaled-integer window sums make every z
    * engine-reproducible (oracle-matched).
    */
  val q_event_anomaly: Q = (s, d) =>
    graft.pipeline.Events.anomalies(events(s, d), n = 20, minPrior = 5)
      .orderBy("event_id")

  /** Ordered multi-stage funnel (view → click → purchase, strict
    * ordering, arrival = earliest qualifying event): per-stage reached
    * counts. Epoch-second arithmetic — DuckDB replays the walk exactly.
    */
  val q_funnel_stages: Q = (s, d) =>
    graft.pipeline.Events.funnel(events(s, d),
      Seq("view", "click", "purchase"))

  /** TF-IDF keywords: top-5 tokens per doc by tf·ln(N/df), ranked by
    * rounded score then token — closed-form, oracle-matched.
    */
  val q_tfidf_keywords: Q = (s, d) =>
    TextAnalysis.tfidfKeywords(t(s, d, "documents"), topK = 5)

  /** N-gram novelty: fraction of each doc's distinct word trigrams first
    * seen (lowest doc_id) in that doc — the "what does this doc add"
    * dedup-adjacent signal, oracle-matched.
    */
  val q_ngram_novelty: Q = (s, d) =>
    TextAnalysis.ngramNovelty(t(s, d, "documents"), n = 3)

  /** PCA of the embedding corpus, invariant-audited (the eigenvectors
    * themselves are solver-specific — sign/rotation — so the raw pc
    * columns cannot be oracled; the CONTRACT can). Output per vector:
    * `center_dist` — the centered L2 norm computed with the same exact
    * scaled-integer portable arithmetic as [[q_embedding_outliers]], so
    * DuckDB recomputes it bit-for-bit — and `pca_ok`, true iff
    *   - the fitted basis is orthonormal (max |QᵢᵀQⱼ − δᵢⱼ| < 1e-6) with
    *     eigenvalues non-negative and non-increasing (driver-checked),
    *   - the vector's projection is a CONTRACTION: ‖top-8 projection‖ ≤
    *     its centered norm (+1e-3 for the float-vs-portable mean gap) —
    *     true for any orthonormal basis, so a violation means the solver
    *     or projection is WRONG, never that the data was unlucky.
    * The oracle recomputes center_dist and asserts constant TRUE.
    */
  val q_embedding_pca: Q = (s, d) => {
    val emb = t(s, d, "embeddings")
    val m = graft.pipeline.Pca.fit(emb, k = 8)
    var orthoErr = 0.0
    for (i <- 0 until m.k; j <- i until m.k) {
      var dot = 0.0
      var t0 = 0
      while (t0 < m.dim) {
        dot += m.components(i)(t0) * m.components(j)(t0); t0 += 1
      }
      orthoErr = math.max(orthoErr,
        math.abs(dot - (if (i == j) 1.0 else 0.0)))
    }
    val eigsOk = m.explained.forall(_ >= -1e-9) &&
      m.explained.zip(m.explained.drop(1)).forall {
        case (a, b) => a >= b - 1e-9 }
    val basisOk = orthoErr < 1e-6 && eigsOk
    val norm2 = (0 until 8).map(i =>
      col(s"pc_$i") * col(s"pc_$i")).reduce(_ + _)
    val centered = graft.pipeline.Similarity.labelOutliers(
        emb.withColumn("_l", lit(0)), threshold = Double.MaxValue,
        labelCol = "_l")
      .select(col("vec_id"), col("dist"))
    graft.pipeline.Pca.project(emb, m)
      .select(col("vec_id"), norm2.as("_p2"))
      .join(centered, Seq("vec_id"))
      .select(col("vec_id"), col("dist").as("center_dist"),
        (lit(basisOk) && sqrt(col("_p2")) <= col("dist") + lit(1e-3))
          .as("pca_ok"))
      .orderBy("vec_id")
  }

  /** Prototypicality outliers: distance to the own-label centroid,
    * flagged above 1.01 — the label-noise / novelty audit. Oracle
    * recomputes centroids and every distance (index-order folds on both
    * engines).
    */
  val q_embedding_outliers: Q = (s, d) =>
    graft.pipeline.Similarity.labelOutliers(t(s, d, "embeddings"),
        threshold = 1.01)
      .orderBy("vec_id")

  /** Composed quality-curation cascade: keep/drop with the first
    * failing rule as an audit reason (too_short / lang / repetitive /
    * low_quality / ok) — all five fire on this corpus; every rule is
    * recomputed from first principles by the DuckDB oracle.
    */
  val q_curation: Q = (s, d) =>
    TextAnalysis.curationPipeline(t(s, d, "documents"), minTokens = 20,
        langs = Seq("en"), minDistinctRatio = 0.3, minQuality = 0.5)
      .orderBy("doc_id")

  /** Symmetric int8 embedding quantization with a reconstruction-error
    * audit: codes, max |code|, and max per-coordinate error — every code
    * recomputed bit-for-bit by the DuckDB oracle.
    */
  val q_embedding_quantize: Q = (s, d) =>
    graft.pipeline.Similarity.quantizeEmbeddings(t(s, d, "embeddings"))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c).as("sum_codes"),
        col("max_code"), round(col("max_err"), 6).as("max_err"))
      .orderBy("vec_id")

  /** Sliding-window chunking (RAG layout): 64-token windows at stride
    * 16, per-chunk token counts and text — oracle-matched.
    */
  val q_doc_chunks: Q = (s, d) =>
    TextAnalysis.slidingChunks(t(s, d, "documents"), window = 64,
        stride = 16)
      .orderBy("doc_id", "chunk_idx")

  /** Per-source deterministic audit sample: 3 docs per source by md5
    * order — identical rows on any engine (oracle-matched).
    */
  val q_group_sample: Q = (s, d) =>
    graft.pipeline.Sampling.deterministicSamplePerGroup(
        t(s, d, "documents"), "source", "doc_id", 3)
      .orderBy("source", "doc_id")

  /** Semi-structured extraction: pull a typed field out of the JSON
    * `props` column and aggregate per event type — the routine
    * log-enrichment pass (`get_json_object` is codegen'd; DuckDB's JSON
    * extension recomputes the identical extraction).
    */
  val q_json_extract: Q = (s, d) =>
    t(s, d, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"),
        round(avg("k"), 6).as("avg_k"))
      .orderBy("event_type")

  /** Canonical normalization end-to-end: each doc gets a decomposed-
    * Unicode + control-char + run-of-spaces suffix appended, then
    * normalizes (NFC → controls → collapse → trim → lower). DuckDB's
    * `nfc_normalize` implements the same UAX#15, so the oracle matches
    * byte-for-byte — including the é-composition cases where a
    * non-normalizing pipeline would split dedup groups.
    */
  val q_normalize: Q = (s, d) => {
    // decomposed accents (E + combining acute), TAB, double spaces
    val messy = concat(col("text"),
      lit("\tE\u0301cole  CAFE\u0301 "))
    t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.normalizeText(messy).as("norm"))
      .orderBy("doc_id")
  }

  /** HyperLogLog distinct-token estimates per source next to the exact
    * count: the register table (source × 256 rows max) is the only
    * shuffle however large the vocabulary. DuckDB rebuilds every
    * register and the identical estimator (linear-counting regime at
    * this scale) — an oracle-checked cardinality sketch.
    */
  val q_hll_distinct: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val tok = docs.select(col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("token"))
    val exact = tok.groupBy("source")
      .agg(count_distinct(col("token")).as("n_exact"))
    TextAnalysis.hllEstimate(
        TextAnalysis.hllRegisters(tok, "source", "token"), "source")
      .join(exact, Seq("source"))
      .select(col("source"), col("n_exact"), col("est_distinct"))
      .orderBy("source")
  }

  /** Deterministic uniform sample: the 50 documents whose md5(doc_id)
    * sorts lowest — same rows on every engine and every rerun (the
    * reproducible-audit sample). DuckDB recomputes the identical order.
    */
  val q_deterministic_sample: Q = (s, d) =>
    Sampling.deterministicSample(
        t(s, d, "documents").select("doc_id", "source", "n_chars"),
        "doc_id", k = 50)
      .orderBy("doc_id")

  /** Count-min-sketch heavy hitters: build the bounded-memory sketch
    * (4 × 512 cells — the shuffle is ≤2048 rows regardless of vocabulary
    * size), estimate the exact top-30 tokens through it, and emit
    * (token, exact, est). The md5-salted hashes are engine-portable, so
    * DuckDB rebuilds every cell and every min-estimate bit-for-bit —
    * an ORACLE-CHECKED approximate sketch.
    */
  val q_cms_heavy: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val sketch = TextAnalysis.cmsSketch(docs, depth = 4, width = 512)
    val top = TextAnalysis.wordFrequencies(docs, topK = 30)
      .select(col("token"), col("n_occ"))
    TextAnalysis.cmsEstimate(top, sketch, depth = 4, width = 512)
      .join(top, Seq("token"))
      .select(col("token"), col("n_occ"), col("est"))
      .orderBy(col("n_occ").desc, col("token"))
  }

  /** Corpus word-frequency table (vocabulary/Zipf audit): top 100 tokens
    * by occurrence count with document frequencies.
    */
  val q_word_freq: Q = (s, d) =>
    TextAnalysis.wordFrequencies(t(s, d, "documents"), topK = 100)

  /** BM25 sparse retrieval: rank the corpus against a 4-term query. The
    * oracle recomputes the identical closed-form arithmetic in DuckDB.
    */
  val q_bm25: Q = (s, d) =>
    TextAnalysis.bm25(t(s, d, "documents"),
      Seq("spark", "vector", "stream", "window"), topK = 20)

  /** BM25 over a BUILT inverted index (the serving path: only the query
    * terms' posting lists are read) — bit-identical scores to the scan
    * path by construction, so it answers q_bm25's oracle.
    */
  val q_bm25_indexed: Q = (s, d) => {
    val ix = TextAnalysis.buildInvertedIndex(t(s, d, "documents"))
    TextAnalysis.searchIndex(ix,
      Seq("spark", "vector", "stream", "window"), topK = 20)
  }

  /** Boolean retrieval: docs with 'merge' AND 'sort' but NOT 'spark',
    * straight off the posting lists — oracle via EXISTS logic.
    */
  val q_boolean_search: Q = (s, d) => {
    val ix = TextAnalysis.buildInvertedIndex(t(s, d, "documents"))
    TextAnalysis.booleanSearch(ix.postings, Seq("merge", "sort"),
      Seq("spark"))
  }

  /** Proximity search over the positional index: docs where 'merge' and
    * 'sort' fall within 5 token positions (any order), with the pair
    * count — oracle recomputes via position-list arithmetic.
    */
  val q_proximity_search: Q = (s, d) => {
    val ix = TextAnalysis.buildPositionalIndex(t(s, d, "documents"))
    TextAnalysis.proximitySearch(ix, "merge", "sort", window = 5)
  }

  /** Exact phrase search over the positional index: docs containing
    * "merge sort" as adjacent in-order tokens, with occurrence counts
    * and the first (1-based) position — oracle recomputes via token
    * n-gram scanning.
    */
  val q_phrase_search: Q = (s, d) => {
    val ix = TextAnalysis.buildPositionalIndex(t(s, d, "documents"))
    TextAnalysis.phraseSearch(ix, Seq("merge", "sort"))
  }

  /** Exact duplicated-substring spans (Lee et al. 2022 granularity):
    * per-document duplicated 40-char shingle runs. `hashed=false` so the
    * DuckDB oracle can group by the raw substring; PipelineSpec pins the
    * hashed (8-byte-shuffle) scale path to identical output.
    */
  val q_substring_spans: Q = (s, d) =>
    Dedup.duplicatedSpans(t(s, d, "documents"), k = 40, stride = 1,
        hashed = false)
      .orderBy("doc_id")

  /** BPE vocabulary induction: 40 merges learned from the corpus word
    * counts. Oracle-matched: DuckDB replays the merge loop in a
    * recursive CTE and emits each iteration's chosen pair.
    */
  val q_bpe_vocab: Q = (s, d) =>
    graft.pipeline.Bpe.mergesDf(s,
        graft.pipeline.Bpe.learn(t(s, d, "documents"), numMerges = 40))
      .orderBy("rank")

  /** Distributed BPE encoding under the learned merges: per-document
    * subword token counts. Oracle-matched: DuckDB replays the full
    * Sennrich learn loop in a recursive CTE (greedy segmentation is
    * deterministic) and re-derives every doc's count.
    */
  val q_bpe_encode: Q = (s, d) => {
    val merges = graft.pipeline.Bpe.learn(t(s, d, "documents"), numMerges = 40)
    t(s, d, "documents")
      .select(col("doc_id"),
        graft.pipeline.Bpe.tokenCount(col("text"), merges).as("n_bpe"))
      .orderBy("doc_id")
  }

  /** Winnowing fingerprints (oracle-matched: the rolling hash is a
    * plain polynomial mod 2^64 that DuckDB recomputes in HUGEINT, and
    * rightmost-min-tie selection is an injective-key arg_min): per-doc
    * selected fingerprint count and position span.
    */
  val q_winnow: Q = (s, d) =>
    Dedup.winnowedFingerprints(t(s, d, "documents"), k = 8, w = 4)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fp"), min("pos").as("first_pos"),
        max("pos").as("last_pos"))
      .orderBy("doc_id")

  /** Order-sensitive fingerprint (oracle-matched: per-token FNV-1a
    * folded mod 2^31-1, portable integer arithmetic both engines).
    */
  val q_fingerprint: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------
  // Training-data pipeline: multimodal columns (stubbed decode)
  // ---------------------------------------------------------------

  /** Binary media plumbing: metadata + frame counting over an opaque
    * binary payload (text bytes stand in for image bytes).
    */
  val q_multimodal_meta: Q = (s, d) =>
    Multimodal.extractFeatures(
        t(s, d, "documents").select(col("doc_id"),
          encode(col("text"), "utf-8").as("media")), "media")
      .select(col("doc_id"), col("media_meta.n_bytes").as("n_bytes"),
        col("n_frames"))
      .orderBy("doc_id")

  /** Frame sampling plumbing: rows-out-per-row-in batch shape. */
  val q_frame_sample: Q = (s, d) =>
    Multimodal.sampleFrames(
        t(s, d, "documents").select(col("doc_id"),
          encode(col("text"), "utf-8").as("media")),
        "media", frameBytes = 64, stride = 4)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("doc_id")

  /** Full multimodal features incl. stub decode. The feature vector is
    * the 16-bucket L1-normalized byte histogram over the base64 "pixel"
    * codes — pure integer/ratio arithmetic on the payload bytes, so the
    * values are DuckDB-replayable. The output explodes the vector to
    * one row per bucket and converts each rounded fraction back to its
    * EXACT integer count (`pixels = round(frac · n)` — frac carries
    * ≤ 5e-7 absolute rounding error and n ≤ a few thousand, so the
    * product lands within 0.5 of the true count): raw fractions like
    * 41/640 sit exactly on a round-half tie where Spark (HALF_UP) and
    * DuckDB disagree in the 6th digit, while the recovered counts are
    * tie-free integers. `n` models Spark's MIME-chunked base64 (76-char
    * CRLF lines) arithmetically from the byte length.
    */
  val q_multimodal_features: Q = (s, d) => {
    val b64len = (floor((col("media_bytes") + 2) / 3) * 4).cast("long")
    Multimodal.extractFeatures(
        t(s, d, "documents").select(col("doc_id"),
          encode(col("text"), "utf-8").as("media")), "media")
      .select(col("doc_id"), col("media_meta.n_bytes").as("media_bytes"),
        col("n_frames"), posexplode(col("features")))
      .withColumn("_b64len", b64len)
      .withColumn("_nb", when(col("_b64len") > 0,
        floor((col("_b64len") - 1) / 76)).otherwise(0L).cast("long"))
      .withColumn("_n",
        greatest(col("_b64len") + col("_nb") * 2, lit(1L)))
      .select(col("doc_id"), col("media_bytes"), col("n_frames"),
        col("pos").as("bucket"),
        round(col("col") * col("_n")).cast("long").as("pixels"),
        col("_n").as("n_pixels"))
      .orderBy("doc_id", "bucket")
  }

  /** REAL image near-dup dedup end-to-end (rows-only: bilinear
    * thumbnail interpolation is not SQL material): per doc, synthesize a
    * deterministic lossless PNG whose pattern repeats every 25 ids —
    * docs sharing a pattern are byte-identical images, so perceptual
    * hashing must pair them at Hamming 0 while distinct patterns stay
    * apart. Emits per-doc pair counts through the bucket-joined
    * [[graft.pipeline.Multimodal.imageNearDups]].
    */
  val q_image_phash: Q = (s, d) => {
    val synth = udf((id: Long) =>
      Multimodal.pngGray(64, 48, id % 25))
    Multimodal.imageNearDups(
        t(s, d, "documents").select(col("doc_id"))
          .withColumn("png", synth(col("doc_id"))),
        "doc_id", "png", maxHamming = 0)
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_dups"))
      .orderBy("doc_id")
  }

  /** REAL audio decode end-to-end: per doc, synthesize a deterministic
    * 16-bit PCM WAV (square wave — amplitude and length are closed-form
    * functions of doc_id), decode it with `javax.sound.sampled`, and emit
    * format facts + signal features. A square wave's RMS equals its
    * amplitude exactly, so every output column is plain arithmetic the
    * DuckDB oracle reproduces — the decode path itself is what's under
    * test.
    */
  val q_multimodal_audio: Q = (s, d) => {
    val synth = udf((id: Long) => {
      val n = ((id % 5) + 1).toInt * 800
      val amp = (1000 + (id % 7) * 100).toShort
      Multimodal.wavPcm16Mono(8000,
        Array.tabulate(n)(i => if ((i / 8) % 2 == 0) amp
          else (-amp).toShort))
    })
    Multimodal.audioFeatures(
        t(s, d, "documents").select(col("doc_id"))
          .withColumn("wav", synth(col("doc_id"))), "wav")
      .select(col("doc_id"), col("audio_sample_rate"), col("audio_channels"),
        col("audio_bits"), col("audio_frames"), col("audio_duration_s"),
        col("audio_rms"), col("audio_peak"))
      .orderBy("doc_id")
  }

  /** REAL video decode end-to-end: per doc, synthesize an MJPEG-in-AVI
    * (k solid-gray JPEG frames, k = doc_id%3+2), walk the RIFF container
    * and JPEG-decode every 2nd frame. Container facts (dimensions, fps
    * from the stream header, frame counts) are exact closed-form
    * arithmetic for the oracle; pixel-level accuracy is asserted with a
    * JPEG tolerance in PipelineSpec (lossy codec — not oracle material).
    */
  val q_video_frames: Q = (s, d) => {
    val synth = udf((id: Long) => {
      val k = (id % 3).toInt + 2
      val frames = (0 until k).map { i =>
        val lum = ((id * 10 + i * 40) % 256).toInt
        val img = new java.awt.image.BufferedImage(16, 16,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (lum << 16) | (lum << 8) | lum
        for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, rgb)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      Multimodal.aviMjpeg(frames, 16, 16, 25)
    })
    Multimodal.videoFeatures(
        t(s, d, "documents").select(col("doc_id"))
          .withColumn("avi", synth(col("doc_id"))), "avi", stride = 2)
      .select(col("doc_id"), col("video_width"), col("video_height"),
        col("video_fps"), col("video_frames"), col("video_decoded_frames"))
      .orderBy("doc_id")
  }

  /** Temperature-weighted source mixing (alpha = 0.5, target = corpus
    * size): small sources upsample (rows repeat with an `epoch` copy
    * index), large sources downsample — the multinomial mixture step of
    * a multi-source training pipeline, deterministic via the md5 bucket
    * so DuckDB recomputes every membership and copy count.
    */
  val q_temperature_mix: Q = (s, d) => {
    val docs = t(s, d, "documents")
    Sampling.temperatureMix(docs.select(col("doc_id"), col("source")),
      "doc_id", "source", alpha = 0.5, targetRows = docs.count(),
      method = "md5")
      .select("doc_id", "source", "epoch")
      .orderBy("doc_id", "epoch")
  }

  /** REAL value-plane snapshot diff: v1 writes a closed-form pattern,
    * v2 rewrites chunks 5..9 bumping every 5th cell by 1000, and the
    * diff must emit EXACTLY those cells (ref prune picks the 5 chunks,
    * the [[graft.functions.DiffChunkExpr]] kernel picks the cells) with
    * both sides' values — all plain arithmetic for the DuckDB oracle.
    */
  val q_value_diff: Q = (s, _) => {
    val dir = java.nio.file.Files.createTempDirectory("graft-q-vdiff")
    val repo = graft.repo.Repository.create(
      graft.storage.Store.local(dir.toString), s)
    def pattern(c: Int, bump: Boolean): Array[Long] =
      Array.tabulate(1000) { i =>
        val g = c * 1000L + i
        val base = (g * 3) % 1000
        if (bump && g % 5 == 0) base + 1000 else base
      }
    val w = repo.writableSession("main")
    w.addArray("/a", Seq(60000L), Seq(1000L))
    for (c <- 0 until 60)
      w.writeChunk("/a", Seq(c),
        graft.functions.ChunkCodec.encodeLongs(pattern(c, bump = false),
          "int64"))
    val v1 = w.commit("v1")
    val w2 = repo.writableSession("main")
    for (c <- 5 until 10)
      w2.writeChunk("/a", Seq(c),
        graft.functions.ChunkCodec.encodeLongs(pattern(c, bump = true),
          "int64"))
    w2.commit("v2")
    finishFixture(dir,
      graft.tensor.TensorPlane.valueDiff(
          repo.readonlySession(graft.repo.VersionRef.SnapshotVer(v1)),
          repo.readonlySession(graft.repo.VersionRef.Branch("main")),
          "/a", "int64")
        .orderBy("i0"))
  }

  /** REAL multiscale downsample: write a closed-form pattern, build the
    * factor-8 mean pyramid level with
    * [[graft.tensor.TensorPlane.downsample]] (per-chunk partial kernel —
    * rows scale with the destination volume), read the level back. Sums
    * of ≤8 small ints are exact in double, so DuckDB reproduces every
    * mean bit-for-bit.
    */
  val q_downsample: Q = (s, _) => {
    val dir = java.nio.file.Files.createTempDirectory("graft-q-down")
    val repo = graft.repo.Repository.create(
      graft.storage.Store.local(dir.toString), s)
    val w = repo.writableSession("main")
    w.addArray("/a", Seq(60000L), Seq(1000L))
    for (c <- 0 until 60) {
      val vals = Array.tabulate(1000) { i =>
        val g = c * 1000L + i; (g * 3) % 1000
      }
      w.writeChunk("/a", Seq(c),
        graft.functions.ChunkCodec.encodeLongs(vals, "int64"))
    }
    w.commit("src")
    val w2 = repo.writableSession("main")
    graft.tensor.TensorPlane.downsample(w2, "/a", "/l1", Seq(8), "int64")
    w2.commit("level 1")
    val ro = repo.readonlySession(graft.repo.VersionRef.Branch("main"))
    finishFixture(dir,
      graft.tensor.TensorPlane.values(ro, "/l1", "float64").orderBy("i0"))
  }

  /** Value histogram with counting pushed into the chunk kernel: build a
    * repo with the (non-uniform) quadratic-residue pattern
    * v(i) = (i²) % 1000 − 500, histogram it in-engine (one decode pass,
    * per-chunk count arrays, no row explode), and compare every bin
    * count against DuckDB's integral arithmetic over `range(60000)`.
    */
  val q_histogram: Q = (s, _) => {
    val dir = java.nio.file.Files.createTempDirectory("graft-q-hist")
    val repo = graft.repo.Repository.create(
      graft.storage.Store.local(dir.toString), s)
    val w = repo.writableSession("main")
    w.addArray("/a", Seq(60000L), Seq(1000L))
    for (c <- 0 until 60) {
      val vals = Array.tabulate(1000) { i =>
        val g = c * 1000L + i; (g * g) % 1000 - 500
      }
      w.writeChunk("/a", Seq(c),
        graft.functions.ChunkCodec.encodeLongs(vals, "int64"))
    }
    w.commit("init")
    val ro = repo.readonlySession(graft.repo.VersionRef.Branch("main"))
    finishFixture(dir,
      graft.tensor.TensorPlane.histogram(ro, "/a", "int64",
          -500.0, 500.0, 20)
        .select(col("bin").cast("long").as("bin"), col("n"))
        .orderBy("bin"))
  }

  /** REAL distributed rechunk end-to-end: build a repo with a closed-form
    * int64 pattern on a 1,000-cell grid, regrid it to 1,600-cell chunks
    * with [[graft.tensor.TensorPlane.rechunk]] (block copies — no cell
    * shuffle), then aggregate per NEW chunk. Every output is plain
    * arithmetic over `range(60000)` for the DuckDB oracle, so a block
    * misplaced by even one cell changes a sum. The fixture is rebuilt per
    * call (temp dir) — deterministic by construction.
    */
  val q_rechunk: Q = (s, _) => {
    val dir = java.nio.file.Files.createTempDirectory("graft-q-rechunk")
    val repo = graft.repo.Repository.create(
      graft.storage.Store.local(dir.toString), s)
    val w = repo.writableSession("main")
    w.addArray("/a", Seq(60000L), Seq(1000L))
    for (c <- 0 until 60) {
      val vals = Array.tabulate(1000) { i =>
        val g = c * 1000L + i; (g * 7) % 1000 - 500
      }
      w.writeChunk("/a", Seq(c),
        graft.functions.ChunkCodec.encodeLongs(vals, "int64"))
    }
    w.commit("init")
    val rs = repo.writableSession("main")
    graft.tensor.TensorPlane.rechunk(rs, "/a", Seq(1600L), "int64")
    rs.commit("regrid")
    val ro = repo.readonlySession(graft.repo.VersionRef.Branch("main"))
    finishFixture(dir,
      graft.tensor.TensorPlane.values(ro, "/a", "int64")
        .groupBy(expr("i0 div 1600").as("chunk_id"))
        .agg(count(lit(1)).as("n"), sum("value").as("total"),
          min("value").as("vmin"), max("value").as("vmax"))
        .orderBy("chunk_id"))
  }

  /** Rectilinear chunk grid through the DSv2 values scan (the SQL-table
    * read path; reference store.rs:1158-1241): a 60k-cell 1-D array
    * tiled with VARYING chunk lengths (700/1300/1000/500/1500 cycling)
    * reads through `format("graft-v2")` values mode with an
    * element-bound slice whose edges cut chunks of every size; the
    * oracle enumerates the closed-form fill directly. The per-dim
    * start-offset binary search replaces the regular-grid division in
    * both split pruning and in-chunk index arithmetic.
    */
  val q_rectilinear_scan: Q = (s, _) => {
    val dir = java.nio.file.Files.createTempDirectory("graft-q-rect")
    val repo = graft.repo.Repository.create(
      graft.storage.Store.local(dir.toString), s)
    val w = repo.writableSession("main")
    val sizes = Seq.fill(12)(Seq(700L, 1300L, 1000L, 500L, 1500L)).flatten
    w.addArrayRectilinear("/r", Seq(60000L), Seq(sizes))
    var start = 0L
    sizes.zipWithIndex.foreach { case (len, c) =>
      val vals = Array.tabulate(len.toInt)(i =>
        ((start + i) * 13) % 1000 - 500)
      w.writeChunk("/r", Seq(c),
        graft.functions.ChunkCodec.encodeLongs(vals, "int64"))
      start += len
    }
    w.commit("rect")
    val v = s.read.format("graft-v2")
      .option("path", dir.toString).option("array", "/r")
      .option("mode", "values").option("dtype", "int64").load()
    finishFixture(dir,
      v.filter(col("i0") >= 10000 && col("i0") <= 49999)
        .groupBy(expr("i0 div 2000").as("blk"))
        .agg(count(lit(1)).as("n"), sum("value").as("total"),
          min("value").as("vmin"), max("value").as("vmax"))
        .orderBy("blk"))
  }

  /** Axis permutation: a 200x300 int64 array (64x64 chunks, ragged
    * edges) transposes to 300x200 via the per-chunk re-stride job; the
    * oracle recomputes every cell of the TRANSPOSED array from the
    * closed-form fill and checks per-block rollups.
    */
  val q_transpose: Q = (s, _) => {
    val dir = java.nio.file.Files.createTempDirectory("graft-q-transpose")
    val repo = graft.repo.Repository.create(
      graft.storage.Store.local(dir.toString), s)
    val w = repo.writableSession("main")
    w.addArray("/m", Seq(200L, 300L), Seq(64L, 64L))
    for (ci <- 0 until 4; cj <- 0 until 5) {
      val vals = Array.tabulate(64 * 64) { k =>
        val i = ci * 64 + k / 64; val j = cj * 64 + k % 64
        if (i < 200 && j < 300) ((i * 7L + j * 13L) % 1000) - 500 else -1L
      }
      w.writeChunk("/m", Seq(ci, cj),
        graft.functions.ChunkCodec.encodeLongs(vals, "int64"))
    }
    w.commit("init")
    val t = repo.writableSession("main")
    graft.tensor.TensorPlane.transpose(t, "/m", "/mt", Seq(1, 0), "int64")
    t.commit("transpose")
    val ro = repo.readonlySession(graft.repo.VersionRef.Branch("main"))
    finishFixture(dir,
      graft.tensor.TensorPlane.values(ro, "/mt", "int64")
        .groupBy(expr("i0 div 64").as("blk"))
        .agg(count(lit(1)).as("n"), sum("value").as("total"),
          min("value").as("vmin"), max("value").as("vmax"))
        .orderBy("blk"))
  }

  /** Zero-copy concatenation: 40k + 20.5k cells (1000-cell chunks, ragged
    * tail on the LAST source) concatenate by ref relabeling only; the
    * oracle recomputes every cell of the combined array from the two
    * closed-form fills.
    */
  val q_concat: Q = (s, _) => {
    val dir = java.nio.file.Files.createTempDirectory("graft-q-concat")
    val repo = graft.repo.Repository.create(
      graft.storage.Store.local(dir.toString), s)
    val w = repo.writableSession("main")
    w.addArray("/p", Seq(40000L), Seq(1000L))
    for (c <- 0 until 40)
      w.writeChunk("/p", Seq(c), graft.functions.ChunkCodec.encodeLongs(
        Array.tabulate(1000) { i =>
          val g = c * 1000L + i; (g * 3) % 1000 - 500 }, "int64"))
    w.addArray("/q", Seq(20500L), Seq(1000L))
    for (c <- 0 until 21)
      w.writeChunk("/q", Seq(c), graft.functions.ChunkCodec.encodeLongs(
        Array.tabulate(1000) { i =>
          val g = c * 1000L + i; (g * 11) % 997 - 498 }, "int64"))
    w.commit("init")
    val t = repo.writableSession("main")
    graft.tensor.TensorPlane.concat(t, Seq("/p", "/q"), "/pq", axis = 0,
      "int64")
    t.commit("concat")
    val ro = repo.readonlySession(graft.repo.VersionRef.Branch("main"))
    finishFixture(dir,
      graft.tensor.TensorPlane.values(ro, "/pq", "int64")
        .groupBy(expr("i0 div 1000").as("chunk_id"))
        .agg(count(lit(1)).as("n"), sum("value").as("total"),
          min("value").as("vmin"), max("value").as("vmax"))
        .orderBy("chunk_id"))
  }

  /** Rect-destination concat + rect append end-to-end: a RAGGED regular
    * source (tail chunk stored PADDED) concatenated with a rectilinear
    * source forces the rect fallback — the destination's axis
    * chunk-length table is the sources' tables laid end to end, and the
    * regular tail chunk is prefix-truncated to exact extent — then
    * `appendValues` grows the rect chunk table with explicit sizes.
    * DuckDB recomputes every cell from the closed forms, so a single
    * mis-truncated or mis-shifted cell breaks a block rollup.
    */
  val q_rect_concat: Q = (s, _) => {
    val dir = java.nio.file.Files.createTempDirectory("graft-q-rectcat")
    val repo = graft.repo.Repository.create(
      graft.storage.Store.local(dir.toString), s)
    val w = repo.writableSession("main")
    w.addArray("/a", Seq(2500L), Seq(1000L))
    for (c <- 0 until 3)
      w.writeChunk("/a", Seq(c), graft.functions.ChunkCodec.encodeLongs(
        Array.tabulate(1000) { i =>
          val g = c * 1000L + i
          if (g < 2500) (g * 3) % 1000 - 500 else -1L
        }, "int64"))
    val bSizes = Seq(700L, 1300L, 1000L)
    w.addArrayRectilinear("/b", Seq(3000L), Seq(bSizes))
    var start = 0L
    bSizes.zipWithIndex.foreach { case (len, c) =>
      w.writeChunk("/b", Seq(c), graft.functions.ChunkCodec.encodeLongs(
        Array.tabulate(len.toInt)(i => ((start + i) * 11) % 997 - 498),
        "int64"))
      start += len
    }
    w.commit("init")
    val t = repo.writableSession("main")
    graft.tensor.TensorPlane.concat(t, Seq("/a", "/b"), "/ab", axis = 0,
      "int64")
    t.commit("concat")
    val ap = repo.writableSession("main")
    val tail = s.range(0, 500).select(col("id").as("i0"),
      (col("id") * 5 % 991 - 495).as("value"))
    graft.tensor.TensorPlane.appendValues(ap, "/ab", tail, dim = 0,
      "int64", appendChunkSizes = Seq(200L, 300L))
    ap.commit("append")
    val ro = repo.readonlySession(graft.repo.VersionRef.Branch("main"))
    finishFixture(dir,
      graft.tensor.TensorPlane.values(ro, "/ab", "int64")
        .groupBy(expr("i0 div 500").as("blk"))
        .agg(count(lit(1)).as("n"), sum("value").as("total"),
          min("value").as("vmin"), max("value").as("vmax"))
        .orderBy("blk"))
  }

  /** REAL tensor map algebra end-to-end: two closed-form int64 arrays
    * (b missing chunks 10..19 — the absent side reads as fill 0),
    * `a * b` via [[graft.tensor.TensorPlane.combine]] (ref-relation
    * full-outer join, payloads combined task-side, no cell shuffle),
    * then the affine `2v - 1` via [[graft.tensor.TensorPlane.mapValues]]
    * (pure per-chunk map, zero shuffle). Per-chunk rollups: a cell off
    * by one anywhere changes a sum, and the 0-product blocks prove fill
    * semantics. All plain arithmetic for the DuckDB oracle.
    */
  /** Unary tensor math end-to-end: clip to [50, 250] with chunks 10-19
    * absent — clip(0) = 50 ≠ 0, so the absent coords must materialize
    * the shared constant chunk; DuckDB recomputes every cell closed-form.
    */
  val q_tensor_unary: Q = (s, _) => {
    val dir = java.nio.file.Files.createTempDirectory("graft-q-unary")
    val repo = graft.repo.Repository.create(
      graft.storage.Store.local(dir.toString), s)
    val w = repo.writableSession("main")
    w.addArray("/u", Seq(60000L), Seq(1000L))
    for (c <- 0 until 60 if c < 10 || c >= 20)
      w.writeChunk("/u", Seq(c), graft.functions.ChunkCodec.encodeLongs(
        Array.tabulate(1000) { i =>
          val g = c * 1000L + i; (g * 3) % 1000 - 500 }, "int64"))
    w.commit("init")
    val t = repo.writableSession("main")
    graft.tensor.TensorPlane.mapUnary(t, "/u", "/uc", "clip", "int64",
      lo = 50.0, hi = 250.0)
    t.commit("clip")
    val ro = repo.readonlySession(graft.repo.VersionRef.Branch("main"))
    finishFixture(dir,
      graft.tensor.TensorPlane.values(ro, "/uc", "int64")
        .groupBy(expr("i0 div 1000").as("blk"))
        .agg(count(lit(1)).as("n"), sum("value").as("total"),
          min("value").as("vmin"), max("value").as("vmax"))
        .orderBy("blk"))
  }

  val q_tensor_binop: Q = (s, _) => {
    val dir = java.nio.file.Files.createTempDirectory("graft-q-binop")
    val repo = graft.repo.Repository.create(
      graft.storage.Store.local(dir.toString), s)
    val w = repo.writableSession("main")
    w.addArray("/a", Seq(60000L), Seq(1000L))
    for (c <- 0 until 60)
      w.writeChunk("/a", Seq(c), graft.functions.ChunkCodec.encodeLongs(
        Array.tabulate(1000) { i =>
          val g = c * 1000L + i; (g * 3) % 1000 - 500 }, "int64"))
    w.addArray("/b", Seq(60000L), Seq(1000L))
    for (c <- 0 until 60 if c < 10 || c >= 20)
      w.writeChunk("/b", Seq(c), graft.functions.ChunkCodec.encodeLongs(
        Array.tabulate(1000) { i =>
          val g = c * 1000L + i; (g * 7) % 997 }, "int64"))
    w.commit("init")
    val t = repo.writableSession("main")
    graft.tensor.TensorPlane.combine(t, "/a", "/b", "/ab", "mul", "int64")
    graft.tensor.TensorPlane.mapValues(t, "/ab", "/ab2", 2.0, -1.0,
      "int64")
    t.commit("algebra")
    val ro = repo.readonlySession(graft.repo.VersionRef.Branch("main"))
    finishFixture(dir,
      graft.tensor.TensorPlane.values(ro, "/ab2", "int64")
        .groupBy(expr("i0 div 1000").as("blk"))
        .agg(count(lit(1)).as("n"), sum("value").as("total"),
          min("value").as("vmin"), max("value").as("vmax"))
        .orderBy("blk"))
  }

  /** Fixture-backed queries build a throwaway repo per call: materialize
    * the (small) result with an eager localCheckpoint so the repo
    * directory can be deleted immediately instead of leaking per bench
    * pass — the returned frame no longer references it.
    */
  private def finishFixture(dir: java.nio.file.Path,
                            df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(true)
    try org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    catch { case _: Throwable => () }
    out
  }

  // insertion-ordered: Verify/Bench iterate this map, and a stable entry
  // order is what makes bench runs comparable round-over-round
  val all: Map[String, Q] = scala.collection.immutable.ListMap(
    "q1_agg" -> q1_agg,
    "q_extents" -> q_extents,
    "q_counts_per_node" -> q_counts_per_node,
    "q_storage_stats" -> q_storage_stats,
    "q_getsize_prefix" -> q_getsize_prefix,
    "q_filter_pushdown" -> q_filter_pushdown,
    "q_prefix_scan" -> q_prefix_scan,
    "q_exists" -> q_exists,
    "q_bounds_filter" -> q_bounds_filter,
    "q_point_lookup" -> q_point_lookup,
    "q_changeset_merge" -> q_changeset_merge,
    "q_conflict_semijoin" -> q_conflict_semijoin,
    "q_gc_antijoin" -> q_gc_antijoin,
    "q_diff_join" -> q_diff_join,
    "q_ancestry_lag" -> q_ancestry_lag,
    "q_topk" -> q_topk,
    "q_window_running" -> q_window_running,
    "q_setops" -> q_setops,
    "q_zarr_keys" -> q_zarr_keys,
    "q_byterange" -> q_byterange,
    "q_stream_window" -> q_stream_window,
    "q_sessionize" -> q_sessionize,
    "q_asof_join" -> q_asof_join,
    "q_band_join" -> q_band_join,
    "q_funnel" -> q_funnel,
    "q_funnel_stages" -> q_funnel_stages,
    "q_funnel_timing" -> q_funnel_timing,
    "q_event_anomaly" -> q_event_anomaly,
    "q_value_quantiles" -> q_value_quantiles,
    "q_retention" -> q_retention,
    "q_json_extract" -> q_json_extract,
    "q_salted_join" -> q_salted_join,
    "q_dedup_exact" -> q_dedup_exact,
    "q_dedup_clusters" -> q_dedup_clusters,
    "q_cluster_sizes" -> q_cluster_sizes,
    "q_sample_split" -> q_sample_split,
    "q_temperature_mix" -> q_temperature_mix,
    "q_corpus_stats" -> q_corpus_stats,
    "q_source_curation" -> q_source_curation,
    "q_cross_source" -> q_cross_source,
    "q_dedup_ngram_jaccard" -> q_dedup_ngram_jaccard,
    "q_dedup_ngram_lsh" -> q_dedup_ngram_lsh,
    "q_decontaminate" -> q_decontaminate,
    "q_decontaminate_bloom" -> q_decontaminate_bloom,
    "q_dedup_minhash" -> q_dedup_minhash,
    "q_dedup_simhash" -> q_dedup_simhash,
    "q_embedding_neardups" -> q_embedding_neardups,
    "q_embedding_clusters" -> q_embedding_clusters,
    "q_semantic_keep" -> q_semantic_keep,
    "q_dedup_pipeline" -> q_dedup_pipeline,
    "q_dedup_incremental" -> q_dedup_incremental,
    "q_embedding_centroids" -> q_embedding_centroids,
    "q_similarity_topk" -> q_similarity_topk,
    "q_similarity_ann" -> q_similarity_ann,
    "q_similarity_ivf" -> q_similarity_ivf,
    "q_similarity_pq" -> q_similarity_pq,
    "q_ann_neighbors" -> q_ann_neighbors,
    "q_text_analysis" -> q_text_analysis,
    "q_quality_score" -> q_quality_score,
    "q_pack_sequences" -> q_pack_sequences,
    "q_shuffle_shard" -> q_shuffle_shard,
    "q_rechunk" -> q_rechunk,
    "q_rectilinear_scan" -> q_rectilinear_scan,
    "q_transpose" -> q_transpose,
    "q_concat" -> q_concat,
    "q_rect_concat" -> q_rect_concat,
    "q_tensor_binop" -> q_tensor_binop,
    "q_tensor_unary" -> q_tensor_unary,
    "q_histogram" -> q_histogram,
    "q_value_diff" -> q_value_diff,
    "q_downsample" -> q_downsample,
    "q_pii_scrub" -> q_pii_scrub,
    "q_repetition" -> q_repetition,
    "q_lm_score" -> q_lm_score,
    "q_classifier_score" -> q_classifier_score,
    "q_classifier_train" -> q_classifier_train,
    "q_word_freq" -> q_word_freq,
    "q_tfidf_keywords" -> q_tfidf_keywords,
    "q_ngram_novelty" -> q_ngram_novelty,
    "q_doc_chunks" -> q_doc_chunks,
    "q_curation" -> q_curation,
    "q_group_sample" -> q_group_sample,
    "q_embedding_quantize" -> q_embedding_quantize,
    "q_embedding_outliers" -> q_embedding_outliers,
    "q_embedding_pca" -> q_embedding_pca,
    "q_cms_heavy" -> q_cms_heavy,
    "q_normalize" -> q_normalize,
    "q_hll_distinct" -> q_hll_distinct,
    "q_deterministic_sample" -> q_deterministic_sample,
    "q_bm25" -> q_bm25,
    "q_bm25_indexed" -> q_bm25_indexed,
    "q_phrase_search" -> q_phrase_search,
    "q_proximity_search" -> q_proximity_search,
    "q_boolean_search" -> q_boolean_search,
    "q_substring_spans" -> q_substring_spans,
    "q_bpe_vocab" -> q_bpe_vocab,
    "q_bpe_encode" -> q_bpe_encode,
    "q_winnow" -> q_winnow,
    "q_fingerprint" -> q_fingerprint,
    "q_multimodal_meta" -> q_multimodal_meta,
    "q_frame_sample" -> q_frame_sample,
    "q_multimodal_features" -> q_multimodal_features,
    "q_image_phash" -> q_image_phash,
    "q_multimodal_audio" -> q_multimodal_audio,
    "q_video_frames" -> q_video_frames)
}
