package graft

/** DuckDB oracle SQL for EVERY query in [[Queries]] — since round 11
  * nothing is rows-only. Column aliases, rounding, and ORDER BY match
  * the Spark side exactly (driver compares sorted-by-name columns and
  * hashed values). Three families of oracle:
  *  - exact replays (most queries): DuckDB recomputes the same
  *    engine-portable arithmetic (dual-FNV simhash, minhash signatures,
  *    the BPE learn loop as a recursive CTE, scaled-integer centroids,
  *    winnowing, document fingerprints, ...);
  *  - invariant audits (the RNG-seeded / float-iterative ops: ANN
  *    LSH/IVF/PQ, batched neighbors, PCA, classifier training): the
  *    Spark side outputs an EXACT deterministic relation plus audit
  *    columns (soundness by rank domination, recall at an empirically
  *    pinned margin, orthonormality/contraction, perfect separable-task
  *    training accuracy) the oracle states in closed form — hash
  *    equality proves the invariants without replaying RNG or libm;
  *  - contract replays (binary codecs: image phash pairing, audio
  *    square-wave features, base64 pixel histograms): the oracle states
  *    the closed-form CONTRACT of the decode; the codec stays
  *    engine-side.
  */
object Oracles {
  /** Exact cosine top-20 against the vec_id=0 query, ranked — the shared
    * exact side of the ANN invariant audits (see Queries.annAudit).
    */
  private def annAuditSql(okCol: String): String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |c AS (
       |  SELECT e.vec_id,
       |    round(list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) /
       |      (sqrt(list_dot_product(e.embedding::DOUBLE[],
       |         e.embedding::DOUBLE[])) *
       |       sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6)
       |      AS cos
       |  FROM embeddings e, q),
       |t AS (SELECT vec_id, cos FROM c ORDER BY cos DESC, vec_id LIMIT 20)
       |SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT)
       |    AS rank, vec_id, cos, TRUE AS sound, TRUE AS $okCol
       |FROM t ORDER BY rank""".stripMargin

  /** Shared by q_bpe_encode / q_bpe_vocab: the Sennrich merge loop as a
    * recursive CTE. State = one row per word type per iteration, with
    * the iteration's chosen merge (ml, mr, mf) replicated on each row;
    * fusion is replace() over wrapped-symbol strings (exactly the
    * engine's one left-to-right non-overlapping pass).
    */
  private val BpeLearnCte =
    """WITH RECURSIVE
      |wc AS (
      |  SELECT w, count(*)::BIGINT AS n FROM (
      |    SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |      x -> len(x) > 0)) AS w FROM documents)
      |  GROUP BY 1 ORDER BY n DESC, w LIMIT 100000),
      |st AS (
      |  SELECT 0 AS it, w,
      |    array_to_string(list_transform(string_split(w, ''),
      |      c -> chr(2) || c || chr(3)), '') || chr(2) || '</w>' || chr(3) AS s,
      |    n, NULL::VARCHAR AS ml, NULL::VARCHAR AS mr, NULL::BIGINT AS mf
      |  FROM wc
      |  UNION ALL
      |  SELECT it + 1, w,
      |    replace(s, chr(2) || best.l || chr(3) || chr(2) || best.r || chr(3),
      |      chr(2) || best.l || best.r || chr(3)),
      |    n, best.l, best.r, best.f
      |  FROM st, (
      |    SELECT l, r, f FROM (
      |      SELECT sy[i] AS l, sy[i + 1] AS r, sum(n) AS f
      |      FROM (SELECT regexp_extract_all(s,
      |              chr(2) || '([^' || chr(3) || ']*)' || chr(3), 1) AS sy, n
      |            FROM st),
      |        unnest(range(1, len(sy))) AS t(i)
      |      GROUP BY 1, 2)
      |    WHERE f >= 2 ORDER BY f DESC, l, r LIMIT 1) best
      |  WHERE it < 40),
      |""".stripMargin

  /** q_dedup_minhash oracle, generated: replay the PORTABLE minhash
    * construction — FNV dual-fold shingle hashes (signed-64 built in
    * HUGEINT, pmod p), the 32 closed-form (a, b) permutation mins, 8×4
    * banding as raw slice equality, and the match-fraction estimate.
    * The 32 signature expressions and coefficient pairs are baked in
    * from [[graft.pipeline.Dedup.portableMinhashCoeffs]], so engine and
    * oracle cannot drift apart.
    */
  private val MinhashOracle: String = {
    val p = 4294967291L
    // the dual FNV-1a fold of shingle w (hi basis 0x811c9dc5, lo basis
    // 0x811c9dc5 xor 0x5bd1e995), as in Fnv64TokenExpr
    def fnv(basis: Long): String =
      s"list_reduce(list_prepend(CAST($basis AS BIGINT), " +
        "list_transform(list_filter(string_split(w, ''), " +
        "c -> len(c) > 0), c -> CAST(unicode(c) AS BIGINT))), " +
        "(h, c) -> (xor(h, c) * 16777619) % 4294967296)"
    val hi = fnv(2166136261L)
    val lo = fnv(3670897744L)
    // signed 64-bit (hi<<32)|lo in HUGEINT, then mathematical mod p
    val xmLambda =
      s"""CAST((((CASE WHEN $hi >= 2147483648
         |  THEN CAST($hi AS HUGEINT) * 4294967296 + $lo
         |    - 18446744073709551616
         |  ELSE CAST($hi AS HUGEINT) * 4294967296 + $lo END) % $p)
         |  + $p) % $p AS BIGINT)""".stripMargin
    val sigExprs = graft.pipeline.Dedup.portableMinhashCoeffs(32)
      .map { case (a, b) =>
        s"list_min(list_transform(xs, x -> (x * $a + $b) % $p))" }
      .mkString("[\n    ", ",\n    ", "]")
    val eqTerms = (1 to 32).map(i =>
      s"(CASE WHEN a.sig[$i] = b.sig[$i] THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val bandClauses = (0 until 8).map(bd =>
      s"a.sig[${bd * 4 + 1}:${bd * 4 + 4}] = b.sig[${bd * 4 + 1}:${bd * 4 + 4}]")
      .mkString(" OR ")
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |      ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
       |        for i in range(1, len(toks) - 1)])
       |    END AS s
       |  FROM (SELECT doc_id,
       |      list_filter(string_split_regex(lower(text), '\\s+'),
       |        x -> len(x) > 0) AS toks
       |    FROM documents)),
       |hm AS (
       |  SELECT doc_id, list_transform(s, w -> $xmLambda) AS xs
       |  FROM sh),
       |sg AS (SELECT doc_id, $sigExprs AS sig FROM hm),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    ($eqTerms) / 32.0 AS est_jaccard
       |  FROM sg a JOIN sg b ON a.doc_id < b.doc_id AND ($bandClauses))
       |SELECT doc_a, doc_b, est_jaccard FROM cand
       |WHERE est_jaccard >= 0.4 ORDER BY doc_a, doc_b""".stripMargin
  }

  private val stop =
    "['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by']"

  /** Shared by q_decontaminate and q_decontaminate_bloom: the bloom
    * prefilter is exact-by-construction, so both paths answer to the
    * same naive-overlap SQL.
    */
  private val DecontaminateSql =
    """WITH sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |      ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
      |        for i in range(1, len(toks) - 1)])
      |    END AS s
      |  FROM (SELECT doc_id,
      |      list_filter(string_split_regex(lower(text), '\s+'),
      |        x -> len(x) > 0) AS toks
      |    FROM documents))
      |SELECT c.doc_id, b.doc_id AS bench_id,
      |  len(list_intersect(c.s, b.s)) AS shared_grams
      |FROM sh c JOIN sh b
      |  ON c.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
      |    AND len(list_intersect(c.s, b.s)) >= 5
      |ORDER BY c.doc_id, bench_id""".stripMargin

  private val base: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_extents" ->
      """SELECT l_suppkey, min(l_linenumber) AS emin, max(l_linenumber) AS emax,
        |  round(min(l_quantity), 2) AS qmin, round(max(l_quantity), 2) AS qmax,
        |  count(*) AS refs
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q_counts_per_node" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_storage_stats" ->
      """WITH per AS (
        |  SELECT l_partkey, max(l_extendedprice) AS sz
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT p_brand, count(*) AS n_chunks, round(sum(sz), 2) AS bytes
        |FROM per JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_getsize_prefix" ->
      """SELECT count(*) AS n, round(sum(p_retailprice), 2) AS total_size
        |FROM part WHERE p_name LIKE 'small%'""".stripMargin,

    "q_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty,
        |  round(l_extendedprice, 2) AS price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_prefix_scan" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE p_name LIKE 'large%' ORDER BY p_partkey""".stripMargin,

    "q_exists" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS total FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q_bounds_filter" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |WHERE l_linenumber >= 1 AND l_linenumber < 3
        |  AND l_quantity >= 10 AND l_quantity < 20
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_point_lookup" ->
      """SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty
        |FROM lineitem WHERE l_orderkey % 997 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_changeset_merge" ->
      """WITH prev AS (SELECT * FROM lineitem
        |    WHERE l_shipdate < TIMESTAMP '1995-06-01'),
        |  changed AS (SELECT * FROM lineitem
        |    WHERE l_shipdate >= TIMESTAMP '1995-06-01'),
        |  merged AS (
        |    SELECT * FROM prev p WHERE NOT EXISTS (
        |      SELECT 1 FROM changed c WHERE c.l_orderkey = p.l_orderkey
        |        AND c.l_linenumber = p.l_linenumber)
        |    UNION ALL SELECT * FROM changed)
        |SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM merged GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_conflict_semijoin" ->
      """SELECT l_returnflag, count(*) AS conflicts
        |FROM lineitem o
        |WHERE o.l_discount >= 0.05 AND EXISTS (
        |  SELECT 1 FROM lineitem t WHERE t.l_tax >= 0.05
        |    AND t.l_orderkey = o.l_orderkey
        |    AND t.l_linenumber = o.l_linenumber)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_gc_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate < TIMESTAMP '1995-07-01')
        |ORDER BY c_custkey""".stripMargin,

    "q_diff_join" ->
      """SELECT p_brand, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_ancestry_lag" ->
      """WITH w AS (SELECT user_id, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS prev_value
        |  FROM events)
        |SELECT user_id, count(*) AS n,
        |  round(sum(abs(value - coalesce(prev_value, value))), 2)
        |    AS total_delta
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_topk" ->
      """SELECT event_id, event_type, round(value, 2) AS value
        |FROM events ORDER BY value DESC, event_id LIMIT 100""".stripMargin,

    "q_window_running" ->
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM events WHERE user_id < 10
        |ORDER BY user_id, event_id""".stripMargin,

    "q_setops" ->
      """SELECT o_custkey FROM (
        |  SELECT DISTINCT o_custkey FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |      AND o_orderdate < TIMESTAMP '1997-01-01'
        |  INTERSECT
        |  SELECT DISTINCT o_custkey FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |      AND o_orderdate < TIMESTAMP '1998-01-01'
        |  EXCEPT
        |  SELECT DISTINCT o_custkey FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |      AND o_orderdate < TIMESTAMP '1999-01-01')
        |ORDER BY o_custkey""".stripMargin,

    "q_zarr_keys" ->
      """WITH keys AS (
        |  SELECT 'temp/c/' || (l_orderkey % 16) || '/' || l_linenumber AS key
        |  FROM lineitem)
        |SELECT CAST(regexp_extract(key, '^temp/c/([0-9]+)/([0-9]+)$', 1)
        |    AS INT) AS c0,
        |  count(*) AS n,
        |  max(CAST(regexp_extract(key, '^temp/c/([0-9]+)/([0-9]+)$', 2)
        |    AS INT)) AS max_c1
        |FROM keys GROUP BY c0 ORDER BY c0""".stripMargin,

    "q_byterange" ->
      """WITH r AS (
        |  SELECT l_returnflag,
        |    least(CAST(floor(l_extendedprice) AS BIGINT) % 8192, 8192)
        |      AS ofrom,
        |    CAST(floor(l_quantity) AS BIGINT) AS len
        |  FROM lineitem),
        |  r2 AS (SELECT l_returnflag, ofrom,
        |    least(ofrom + len, 8192) AS oto FROM r)
        |SELECT l_returnflag, CAST(sum(oto - ofrom) AS BIGINT) AS bytes,
        |  count(*) AS n
        |FROM r2 GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_stream_window" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY hour, event_type
        |ORDER BY hour, event_type""".stripMargin,

    "q_sessionize" ->
      """WITH w AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
        |      PARTITION BY user_id ORDER BY event_id) AS prev_sec
        |  FROM events),
        |  g AS (SELECT user_id,
        |    CASE WHEN sec - prev_sec > 1800 THEN 1 ELSE 0 END AS gap
        |  FROM w)
        |SELECT user_id, CAST(sum(gap) + 1 AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the oracle is DuckDB's NATIVE ASOF JOIN — an independent
    // implementation of the same semantics as the union+window operator
    "q_asof_join" ->
      """WITH rights AS (
        |  SELECT user_id, ts, event_id AS r_event_id,
        |    round(value, 4) AS r_value,
        |    row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'view'),
        |r1 AS (SELECT user_id, ts, r_event_id, r_value
        |       FROM rights WHERE rn = 1),
        |lefts AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, r.r_event_id, r.r_value
        |FROM lefts l ASOF LEFT JOIN r1 r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q_embedding_centroids" ->
      """WITH e AS (
        |  SELECT label, unnest(range(1, len(embedding) + 1)) AS i,
        |    embedding
        |  FROM embeddings)
        |SELECT label, CAST(i - 1 AS INT) AS pos,
        |  round(avg(embedding[i]), 4) AS mean_v, count(*) AS n
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the oracle runs the NAIVE inequality join; the engine side runs
    // the bucketed equi-join band formulation — same pair set
    "q_band_join" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS p_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS pts
        |  FROM events WHERE event_type = 'purchase'),
        |e AS (
        |  SELECT user_id, event_id AS e_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ets
        |  FROM events WHERE event_type = 'error')
        |SELECT p.user_id, count(*) AS n_pairs,
        |  min(abs(pts - ets)) AS min_gap,
        |  max(abs(pts - ets)) AS max_gap
        |FROM p JOIN e ON p.user_id = e.user_id AND abs(pts - ets) <= 600
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the engine side salts the join; result must equal the naive join
    "q_salted_join" ->
      """SELECT o.o_orderpriority,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_funnel" ->
      """WITH su AS (
        |  SELECT user_id, CAST(min(floor(epoch(ts))) AS BIGINT) AS su
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |p AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS pt
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT su.user_id, su.su, p.pt,
        |    (p.pt IS NOT NULL AND p.pt >= su.su
        |      AND p.pt <= su.su + 604800) AS inw
        |  FROM su LEFT JOIN p ON su.user_id = p.user_id)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN inw THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_purchases_7d,
        |  min(CASE WHEN inw THEN pt - su END) AS first_gap_s
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_retention" ->
      """WITH ud AS (
        |  SELECT user_id,
        |    CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS d
        |  FROM events),
        |fd AS (SELECT user_id, min(d) AS cohort_day FROM ud GROUP BY 1)
        |SELECT fd.cohort_day, ud.d - fd.cohort_day AS day_offset,
        |  count(DISTINCT ud.user_id) AS n_users
        |FROM ud JOIN fd ON ud.user_id = fd.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_value_quantiles" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events)
        |SELECT event_type, count(*) AS n,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY v)
        |    / 100.0, 6) AS p50,
        |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY v)
        |    / 100.0, 6) AS p90,
        |  round(percentile_cont(0.99) WITHIN GROUP (ORDER BY v)
        |    / 100.0, 6) AS p99
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical exact scaled-integer window statistics and association
    // order as Events.anomalies; ordering ties break on (epoch seconds,
    // event_id) in both engines
    "q_event_anomaly" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    CAST(round(value * 100) AS BIGINT) AS v100 FROM events),
        |w AS (SELECT event_id, user_id, v100,
        |    count(*) OVER win AS n_prior,
        |    sum(v100) OVER win AS s1,
        |    sum(v100 * v100) OVER win AS s2
        |  FROM e WINDOW win AS (PARTITION BY user_id
        |    ORDER BY sec, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT event_id, user_id, n_prior,
        |    (CAST(s1 AS DOUBLE) / 100.0) / n_prior AS mean,
        |    (CAST(s2 AS DOUBLE) / 10000.0) / n_prior AS ex2, v100
        |  FROM w WHERE n_prior >= 5),
        |v AS (SELECT event_id, user_id, n_prior, mean,
        |    CASE WHEN ex2 - mean * mean > 0
        |      THEN sqrt(ex2 - mean * mean) ELSE 0 END AS sd, v100
        |  FROM m)
        |SELECT event_id, user_id, CAST(n_prior AS BIGINT) AS n_prior,
        |  round(CASE WHEN sd = 0 THEN 0
        |    ELSE (CAST(v100 AS DOUBLE) / 100.0 - mean) / sd END, 4) AS z,
        |  abs(round(CASE WHEN sd = 0 THEN 0
        |    ELSE (CAST(v100 AS DOUBLE) / 100.0 - mean) / sd END, 4))
        |    > 3.0 AS is_anomaly
        |FROM v ORDER BY event_id""".stripMargin,

    // the clip fixture recomputed closed-form: present chunks carry
    // (g*3)%1000-500, absent chunks 10-19 read fill 0 -> clip to 50
    "q_tensor_unary" ->
      """WITH cells AS (
        |  SELECT g, CASE WHEN (g // 1000) BETWEEN 10 AND 19 THEN 0
        |    ELSE (g * 3) % 1000 - 500 END AS v
        |  FROM range(0, 60000) t(g)),
        |c AS (SELECT g // 1000 AS blk,
        |    least(greatest(v, 50), 250) AS cv FROM cells)
        |SELECT blk, count(*) AS n, CAST(sum(cv) AS BIGINT) AS total,
        |  min(cv) AS vmin, max(cv) AS vmax
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // ordered multi-stage funnel: stage-k arrival = earliest event of
    // that type STRICTLY after the stage-(k-1) arrival, same walk as
    // Events.funnel (epoch-second integral comparisons)
    "q_funnel_stages" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT ev.user_id, min(ev.t) AS t2 FROM ev
        |       JOIN s1 ON ev.user_id = s1.user_id AND ev.t > s1.t1
        |       WHERE ev.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT ev.user_id, min(ev.t) AS t3 FROM ev
        |       JOIN s2 ON ev.user_id = s2.user_id AND ev.t > s2.t2
        |       WHERE ev.event_type = 'purchase' GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users
        |  FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |ORDER BY stage_idx""".stripMargin,

    // same stage walk as q_funnel_stages, carrying the stage-1 arrival;
    // exact interpolated percentiles over integral second gaps
    "q_funnel_timing" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT ev.user_id, min(ev.t) AS t2, min(s1.t1) AS t1
        |       FROM ev JOIN s1 ON ev.user_id = s1.user_id
        |         AND ev.t > s1.t1
        |       WHERE ev.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT ev.user_id, min(ev.t) AS t3, min(s2.t1) AS t1
        |       FROM ev JOIN s2 ON ev.user_id = s2.user_id
        |         AND ev.t > s2.t2
        |       WHERE ev.event_type = 'purchase' GROUP BY 1),
        |g AS (SELECT 2 AS stage_idx, 'click' AS stage, t2 - t1 AS gap
        |      FROM s2
        |      UNION ALL
        |      SELECT 3, 'purchase', t3 - t1 FROM s3)
        |SELECT stage_idx, stage, count(*) AS n_users,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap), 4)
        |    AS p50_sec,
        |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY gap), 4)
        |    AS p90_sec,
        |  max(gap) AS max_sec
        |FROM g GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q_json_extract" ->
      """WITH e AS (SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k, round(avg(k), 6) AS avg_k
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // the composed pipeline from first principles: exact text groups,
    // all-pairs 3-gram jaccard >= 0.6 among exact survivors, recursive
    // components, min-id keeps; reasons name which stage dropped a doc
    "q_dedup_pipeline" ->
      """WITH RECURSIVE ex AS (
        |  SELECT doc_id, text,
        |    min(doc_id) OVER (PARTITION BY text) AS exact_canonical
        |  FROM documents),
        |surv AS (SELECT doc_id, text FROM ex WHERE doc_id = exact_canonical),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |      ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
        |        for i in range(1, len(toks) - 1)])
        |    END AS s
        |  FROM (SELECT doc_id,
        |      list_filter(string_split_regex(lower(text), '\s+'),
        |        x -> len(x) > 0) AS toks
        |    FROM surv)),
        |edges AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v FROM sh a JOIN sh b
        |  ON a.doc_id <> b.doc_id AND
        |    len(list_intersect(a.s, b.s))::DOUBLE /
        |      len(list_distinct(list_concat(a.s, b.s))) >= 0.6),
        |reach(id, label) AS (
        |  SELECT doc_id, doc_id FROM surv
        |  UNION
        |  SELECT e.u, r.label FROM reach r JOIN edges e ON e.v = r.id),
        |lbl AS (
        |  SELECT id AS doc_id, min(label) AS near_canonical
        |  FROM reach GROUP BY id)
        |SELECT e.doc_id, e.doc_id = l.near_canonical AS kept,
        |  CASE WHEN e.doc_id = l.near_canonical THEN 'keep'
        |       WHEN e.doc_id <> e.exact_canonical THEN 'exact_dup'
        |       ELSE 'near_dup' END AS reason,
        |  l.near_canonical AS canonical_id
        |FROM ex e JOIN lbl l ON l.doc_id = e.exact_canonical
        |ORDER BY e.doc_id""".stripMargin,

    // incremental screen from first principles: new-batch docs against
    // corpus + smaller-id batch mates at jaccard >= 0.6
    "q_dedup_incremental" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |      ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
        |        for i in range(1, len(toks) - 1)])
        |    END AS s
        |  FROM (SELECT doc_id,
        |      list_filter(string_split_regex(lower(text), '\s+'),
        |        x -> len(x) > 0) AS toks
        |    FROM documents)),
        |newd AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
        |m AS (
        |  SELECT a.doc_id AS doc_a, min(b.doc_id) AS dup_of
        |  FROM newd a JOIN sh b
        |  ON a.doc_id <> b.doc_id
        |    AND (b.doc_id % 10 <> 0 OR b.doc_id < a.doc_id)
        |    AND len(list_intersect(a.s, b.s))::DOUBLE /
        |      len(list_distinct(list_concat(a.s, b.s))) >= 0.6
        |  GROUP BY 1)
        |SELECT n.doc_id, m.dup_of IS NULL AS kept, m.dup_of
        |FROM newd n LEFT JOIN m ON n.doc_id = m.doc_a
        |ORDER BY n.doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT d.doc_id, m.canonical_id, m.n_copies
        |FROM documents d JOIN (
        |  SELECT text, min(doc_id) AS canonical_id, count(*) AS n_copies
        |  FROM documents GROUP BY text) m ON d.text = m.text
        |ORDER BY d.doc_id""".stripMargin,

    "q_source_curation" ->
      """WITH base AS (
        |  SELECT source, count(*) AS n_docs,
        |    count(DISTINCT text) AS n_distinct_texts,
        |    round(1 - count(DISTINCT text) * 1.0 / count(*), 4) AS dup_rate,
        |    round(avg(CASE WHEN n_chars < 100 THEN 1.0 ELSE 0.0 END), 4)
        |      AS short_rate,
        |    round(avg(n_chars), 4) AS avg_chars
        |  FROM documents GROUP BY source),
        |pl AS (
        |  SELECT source, lang, count(*) AS n
        |  FROM documents GROUP BY source, lang),
        |ent AS (
        |  SELECT source,
        |    round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 4) AS lang_entropy
        |  FROM pl GROUP BY source)
        |SELECT b.source, b.n_docs, b.n_distinct_texts, b.dup_rate,
        |  b.short_rate, b.avg_chars, e.lang_entropy,
        |  (b.dup_rate < 0.5 AND b.short_rate < 0.5) AS keep
        |FROM base b JOIN ent e ON b.source = e.source
        |ORDER BY b.source""".stripMargin,

    "q_cross_source" ->
      """SELECT min(doc_id) AS canonical_id,
        |  count(DISTINCT source) AS n_sources,
        |  count(*) AS n_copies,
        |  min(source) AS first_source,
        |  max(source) AS last_source
        |FROM documents GROUP BY substr(text, 1, 40)
        |HAVING count(DISTINCT source) > 1
        |ORDER BY canonical_id""".stripMargin,

    "q_dedup_clusters" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, lang, n_chars FROM documents),
        |edges AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v FROM docs a JOIN docs b
        |  ON a.lang = b.lang AND abs(a.n_chars - b.n_chars) <= 10
        |  AND a.doc_id <> b.doc_id),
        |reach(id, label) AS (
        |  SELECT doc_id, doc_id FROM docs
        |  UNION
        |  SELECT e.u, r.label FROM reach r JOIN edges e ON e.v = r.id),
        |lbl AS (
        |  SELECT id AS doc_id, min(label) AS cluster_id
        |  FROM reach GROUP BY id)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS n_members
        |FROM lbl ORDER BY doc_id""".stripMargin,

    // identical components, rolled into a size histogram
    "q_cluster_sizes" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, lang, n_chars FROM documents),
        |edges AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v FROM docs a JOIN docs b
        |  ON a.lang = b.lang AND abs(a.n_chars - b.n_chars) <= 10
        |  AND a.doc_id <> b.doc_id),
        |reach(id, label) AS (
        |  SELECT doc_id, doc_id FROM docs
        |  UNION
        |  SELECT e.u, r.label FROM reach r JOIN edges e ON e.v = r.id),
        |lbl AS (
        |  SELECT id AS doc_id, min(label) AS cluster_id
        |  FROM reach GROUP BY id),
        |sizes AS (
        |  SELECT cluster_id, count(*) AS n_members FROM lbl GROUP BY 1)
        |SELECT n_members, count(*) AS n_clusters FROM sizes
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sample_split" ->
      """WITH b AS (
        |  SELECT lang, n_chars,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 10000 AS bk
        |  FROM documents),
        |s AS (
        |  SELECT lang, n_chars,
        |    CASE WHEN bk < 8000 THEN 'train'
        |         WHEN bk < 9000 THEN 'val' ELSE 'test' END AS split
        |  FROM b)
        |SELECT lang, split, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM s GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    "q_corpus_stats" ->
      """WITH base AS (
        |  SELECT lang,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0)) AS n_tokens
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  round(avg(n_tokens), 4) AS avg_tokens,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY n_tokens), 4)
        |    AS p50_tokens,
        |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY n_tokens), 4)
        |    AS p90_tokens,
        |  max(n_tokens) AS max_tokens
        |FROM base GROUP BY lang ORDER BY lang""".stripMargin,

    // generated above: the portable minhash construction replayed
    "q_dedup_minhash" -> MinhashOracle,

    "q_dedup_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |      ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
        |        for i in range(1, len(toks) - 1)])
        |    END AS s
        |  FROM (SELECT doc_id, lang,
        |      list_filter(string_split_regex(lower(text), '\s+'),
        |        x -> len(x) > 0) AS toks
        |    FROM documents)),
        |  pairs AS (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |      len(list_intersect(a.s, b.s))::DOUBLE /
        |        len(list_distinct(list_concat(a.s, b.s))) AS j
        |    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, round(j, 6) AS jaccard
        |FROM pairs WHERE j >= 0.05 ORDER BY doc_a, doc_b""".stripMargin,

    // simhash is engine-portable arithmetic since the token hash moved
    // to dual 32-bit FNV-1a over code points (round 10; the
    // q_fingerprint integer arithmetic, second fold seeded from basis
    // xor 0x5bd1e995): DuckDB replays the folds and the per-bit +1/−1
    // votes, folds each 16-bit sub-key (avoiding signed-64 wraparound),
    // blocks on sub-key equality and sums per-sub-key bit_count XORs
    // for the Hamming distance. LEFT join keeps zero-token docs at
    // simhash 0 (they pair with each other at distance 0, as in the
    // engine).
    "q_dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0)) AS w
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT), cps),
        |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS hi,
        |    list_reduce(list_prepend(CAST(3670897744 AS BIGINT), cps),
        |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS lo
        |  FROM (SELECT doc_id, list_transform(string_split(w, ''),
        |          c -> CAST(unicode(c) AS BIGINT)) AS cps
        |        FROM tok)),
        |votes AS (
        |  SELECT doc_id, b,
        |    sum(CASE WHEN (CASE WHEN b < 32 THEN (lo >> b) & 1
        |                   ELSE (hi >> (b - 32)) & 1 END) = 1
        |        THEN 1 ELSE -1 END) AS s
        |  FROM h, (SELECT unnest(range(0, 64)) AS b)
        |  GROUP BY 1, 2),
        |keys AS (
        |  SELECT d.doc_id,
        |    coalesce(sum(CASE WHEN v.s > 0 AND v.b // 16 = 0
        |      THEN 1 << (v.b % 16) ELSE 0 END), 0) AS k0,
        |    coalesce(sum(CASE WHEN v.s > 0 AND v.b // 16 = 1
        |      THEN 1 << (v.b % 16) ELSE 0 END), 0) AS k1,
        |    coalesce(sum(CASE WHEN v.s > 0 AND v.b // 16 = 2
        |      THEN 1 << (v.b % 16) ELSE 0 END), 0) AS k2,
        |    coalesce(sum(CASE WHEN v.s > 0 AND v.b // 16 = 3
        |      THEN 1 << (v.b % 16) ELSE 0 END), 0) AS k3
        |  FROM documents d LEFT JOIN votes v USING (doc_id)
        |  GROUP BY 1),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(bit_count(xor(a.k0, b.k0)) + bit_count(xor(a.k1, b.k1)) +
        |         bit_count(xor(a.k2, b.k2)) + bit_count(xor(a.k3, b.k3))
        |      AS INT) AS hamming
        |  FROM keys a JOIN keys b ON a.doc_id < b.doc_id AND
        |    (a.k0 = b.k0 OR a.k1 = b.k1 OR a.k2 = b.k2 OR a.k3 = b.k3))
        |SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 6
        |ORDER BY doc_a, doc_b""".stripMargin,

    // oracle for the LSH-blocked scale path: exact ALL-pairs jaccard (no
    // lang blocking) with constant TRUE — the Spark side emits lsh_ok =
    // false for any soundness violation (LSH pair outside the exact set)
    // or recall violation (exact pair with j ≥ 0.85 the 8×4 banding
    // missed — miss prob ≈ 0.3% per pair up there, vs ~33% at the 0.6
    // knee), so hash equality proves both containment directions
    "q_dedup_ngram_lsh" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |      ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
        |        for i in range(1, len(toks) - 1)])
        |    END AS s
        |  FROM (SELECT doc_id,
        |      list_filter(string_split_regex(lower(text), '\s+'),
        |        x -> len(x) > 0) AS toks
        |    FROM documents)),
        |  pairs AS (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |      len(list_intersect(a.s, b.s))::DOUBLE /
        |        len(list_distinct(list_concat(a.s, b.s))) AS j
        |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, round(j, 6) AS jaccard, TRUE AS lsh_ok
        |FROM pairs WHERE j >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,

    "q_decontaminate" -> DecontaminateSql,
    // the bloom-prefiltered path must produce the IDENTICAL result (no
    // false negatives; false positives die in the exact verify join)
    "q_decontaminate_bloom" -> DecontaminateSql,

    "q_embedding_neardups" ->
      """WITH p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(a.embedding::DOUBLE[],
        |         a.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(b.embedding::DOUBLE[],
        |         b.embedding::DOUBLE[]))) AS c
        |  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(c, 4) AS cos
        |FROM p WHERE c >= 0.35 ORDER BY id_a, id_b""".stripMargin,

    "q_embedding_clusters" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS u, b.vec_id AS v FROM embeddings a
        |  JOIN embeddings b ON a.vec_id <> b.vec_id AND
        |    list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(a.embedding::DOUBLE[],
        |         a.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(b.embedding::DOUBLE[],
        |         b.embedding::DOUBLE[]))) >= 0.35),
        |reach(id, label) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT p.u, r.label FROM reach r JOIN pairs p ON p.v = r.id),
        |lbl AS (
        |  SELECT id AS vec_id, min(label) AS cluster_id
        |  FROM reach GROUP BY id)
        |SELECT vec_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS n_members
        |FROM lbl ORDER BY vec_id""".stripMargin,

    // SemDeDup exact mode: same recursive-CTE components as
    // q_embedding_clusters; keep rule = representative (min id) survives
    "q_semantic_keep" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS u, b.vec_id AS v FROM embeddings a
        |  JOIN embeddings b ON a.vec_id <> b.vec_id AND
        |    list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(a.embedding::DOUBLE[],
        |         a.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(b.embedding::DOUBLE[],
        |         b.embedding::DOUBLE[]))) >= 0.35),
        |reach(id, label) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT p.u, r.label FROM reach r JOIN pairs p ON p.v = r.id),
        |lbl AS (
        |  SELECT id AS vec_id, min(label) AS group_id
        |  FROM reach GROUP BY id)
        |SELECT vec_id, group_id, vec_id = group_id AS keep
        |FROM lbl ORDER BY vec_id""".stripMargin,

    "q_similarity_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) /
        |    (sqrt(list_dot_product(e.embedding::DOUBLE[],
        |       e.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6)
        |    AS cos
        |FROM embeddings e, q
        |ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin,

    // invariant-audit oracles for the approximate-search queries: the
    // Spark side emits the EXACT top-k (engine-portable arithmetic) with
    // `sound` (rank domination of the approximate result — optimality
    // makes TRUE the only correct value) and `*_ok` (recall at a margin
    // pinned above the seeded index's observed miss ceiling) booleans;
    // the oracle recomputes the exact top-k and asserts constant TRUE,
    // so hash equality proves both audit directions without replaying
    // the index's RNG (hyperplanes / k-means — not SQL-replayable)
    "q_similarity_ann" -> annAuditSql("ann_ok"),
    "q_similarity_ivf" -> annAuditSql("ivf_ok"),
    "q_similarity_pq" -> annAuditSql("pq_ok"),

    "q_ann_neighbors" ->
      """WITH p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_dot_product(a.embedding::DOUBLE[],
        |        b.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(a.embedding::DOUBLE[],
        |         a.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(b.embedding::DOUBLE[],
        |         b.embedding::DOUBLE[]))), 6) AS cos
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
        |rk AS (
        |  SELECT id_a, id_b, cos,
        |    CAST(row_number() OVER (PARTITION BY id_a
        |      ORDER BY cos DESC, id_b) AS INT) AS rank
        |  FROM p)
        |SELECT id_a, id_b, rank, cos, TRUE AS sound, TRUE AS ann_ok
        |FROM rk WHERE rank <= 5 ORDER BY id_a, rank""".stripMargin,

    "q_text_analysis" ->
      s"""WITH base AS (
        |  SELECT doc_id, lower(text) AS t,
        |    list_filter(string_split_regex(lower(text), '\\s+'),
        |      x -> len(x) > 0) AS toks
        |  FROM documents),
        |  scored AS (SELECT doc_id, t, toks,
        |    len(list_filter(toks, x -> list_contains(
        |      ['the','and','of','is','to','a'], x))) AS s_en,
        |    len(list_filter(toks, x -> list_contains(
        |      ['der','die','das','und','ist','nicht'], x))) AS s_de,
        |    len(list_filter(toks, x -> list_contains(
        |      ['le','la','les','et','est','une'], x))) AS s_fr,
        |    len(list_filter(toks, x -> list_contains(
        |      ['el','los','es','una','que','para'], x))) AS s_es,
        |    len(list_filter(toks, x -> list_contains(
        |      ['的','是','了','在','我','不'], x))) AS s_zh
        |  FROM base)
        |SELECT doc_id,
        |  len(toks) AS n_tokens,
        |  len(regexp_extract_all(t, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
        |    AS n_bpeish,
        |  round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |    len(list_filter(toks, x -> list_contains($stop, x)))::DOUBLE
        |      / len(toks) END, 6) AS stopword_ratio,
        |  round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |    list_aggregate(list_transform(toks, x -> len(x)), 'sum')::DOUBLE
        |      / len(toks) END, 6) AS mean_token_len,
        |  CASE
        |    WHEN s_en > 0 AND s_en >= greatest(s_de, s_fr, s_es, s_zh)
        |      THEN 'en'
        |    WHEN s_de > 0 AND s_de >= greatest(s_en, s_fr, s_es, s_zh)
        |      THEN 'de'
        |    WHEN s_fr > 0 AND s_fr >= greatest(s_en, s_de, s_es, s_zh)
        |      THEN 'fr'
        |    WHEN s_es > 0 AND s_es >= greatest(s_en, s_de, s_fr, s_zh)
        |      THEN 'es'
        |    WHEN s_zh > 0 AND s_zh >= greatest(s_en, s_de, s_fr, s_es)
        |      THEN 'zh'
        |    ELSE 'und' END AS lang_pred
        |FROM scored ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      s"""WITH base AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '\\s+'),
        |      x -> len(x) > 0) AS toks
        |  FROM documents),
        |  m AS (SELECT doc_id,
        |    least(len(text)::DOUBLE / 500.0, 1.0) AS len_score,
        |    least(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |      len(list_filter(toks, x -> list_contains($stop, x)))::DOUBLE
        |        / len(toks) END * 5.0, 1.0) AS sw_score,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |      list_aggregate(list_transform(toks, x -> len(x)),
        |        'sum')::DOUBLE / len(toks) END AS mtl,
        |    least(CASE WHEN len(text) = 0 THEN 0.0 ELSE
        |      (len(text) - len(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))
        |        ::DOUBLE / len(text) END * 5.0, 1.0) AS punct_penalty
        |  FROM base)
        |SELECT doc_id,
        |  floor((len_score * 0.4 + sw_score * 0.3 +
        |    (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.5 END)
        |      * 0.3) * (1.0 - punct_penalty * 0.5) * 1000000 + 0.5)
        |    / 1000000 AS quality
        |FROM m ORDER BY doc_id""".stripMargin,

    // concat-and-chunk packing: DuckDB can afford the single global
    // window at oracle scale; the engine reproduces it with per-bucket
    // windows + prefix offsets
    "q_pack_sequences" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0)) AS BIGINT) AS tokens
        |  FROM documents),
        |nz AS (SELECT * FROM toks WHERE tokens > 0),
        |c AS (SELECT doc_id, tokens,
        |  CAST(sum(tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum
        |  FROM nz)
        |SELECT doc_id, tokens,
        |  cum - tokens AS start_pos,
        |  (cum - tokens) // 512 AS pack_first,
        |  (cum - 1) // 512 AS pack_last,
        |  (cum - 1) // 512 - (cum - tokens) // 512 + 1 AS n_spans
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_shuffle_shard" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    (doc_id * 2654435761 + 42) % 4294967291 AS mix
        |  FROM documents)
        |SELECT doc_id, mix % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY mix % 8
        |    ORDER BY mix, doc_id) AS BIGINT) AS pos
        |FROM m ORDER BY shard, pos""".stripMargin,

    // temperature mixing: rate_s = n_s^0.5 / Σ n^0.5 * N / n_s, copies =
    // floor(rate) + (md5 bucket < fractional remainder); epoch enumerates
    // the copies. Engine and oracle share the md5-bucket definition.
    "q_temperature_mix" ->
      """WITH c AS (
        |  SELECT source, count(*)::DOUBLE AS n FROM documents
        |  GROUP BY source),
        |t AS (
        |  SELECT sum(pow(n, 0.5)) AS w,
        |    (SELECT count(*) FROM documents) AS target FROM c),
        |r AS (
        |  SELECT source, pow(n, 0.5) / (SELECT w FROM t)
        |    * (SELECT target FROM t) / n AS rate FROM c),
        |k AS (
        |  SELECT d.doc_id, d.source,
        |    CAST(floor(r.rate) AS INT) +
        |    CASE WHEN (('0x' || substr(md5(d.source || '|' ||
        |        d.doc_id::VARCHAR), 1, 4))::INT % 10000)
        |      < CAST(round((r.rate - floor(r.rate)) * 10000) AS INT)
        |      THEN 1 ELSE 0 END AS copies
        |  FROM documents d JOIN r ON d.source = r.source)
        |SELECT doc_id, source,
        |  CAST(unnest(generate_series(0, copies - 1)) AS BIGINT) AS epoch
        |FROM k WHERE copies > 0
        |ORDER BY doc_id, epoch""".stripMargin,

    // factor-8 mean pyramid level over v(i) = (i*3) % 1000; sums of 8
    // small ints are exact in double so the means compare bit-for-bit
    "q_downsample" ->
      """WITH cells AS (
        |  SELECT range AS i, (range * 3) % 1000 AS v FROM range(60000))
        |SELECT i // 8 AS i0,
        |  CAST(sum(v) AS DOUBLE) / count(*) AS value
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin,

    // the engine diffs two committed versions; only cells rewritten in
    // chunks 5..9 AND actually changed (every 5th) may appear
    "q_value_diff" ->
      """SELECT range AS i0,
        |  (range * 3) % 1000 AS old_value,
        |  (range * 3) % 1000 + 1000 AS new_value
        |FROM range(5000, 10000) WHERE range % 5 = 0
        |ORDER BY i0""".stripMargin,

    // the engine side histograms v(i) = (i*i) % 1000 - 500 inside the
    // chunk kernel (20 bins over [-500, 500)); integral bin arithmetic
    // here reproduces the kernel's fp binning exactly (quotients of
    // small ints by 50 are either exact or far from bin boundaries)
    "q_histogram" ->
      """WITH cells AS (
        |  SELECT (range * range) % 1000 - 500 AS v FROM range(60000))
        |SELECT CAST((v + 500) // 50 AS BIGINT) AS bin, count(*) AS n
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin,

    // the engine side runs a REAL distributed rechunk (1,000-cell ->
    // 1,600-cell grid) and aggregates per NEW chunk; the pattern
    // v(i) = (i*7) % 1000 - 500 makes every column closed-form arithmetic
    "q_rechunk" ->
      """WITH cells AS (
        |  SELECT range AS i, (range * 7) % 1000 - 500 AS v
        |  FROM range(60000))
        |SELECT i // 1600 AS chunk_id,
        |  count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS total,
        |  CAST(min(v) AS BIGINT) AS vmin,
        |  CAST(max(v) AS BIGINT) AS vmax
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin,

    // the engine side reads a RECTILINEAR 1-D array (60k cells, chunk
    // lengths cycling 700/1300/1000/500/1500) through the DSv2 values
    // scan with a [10000, 49999] element slice; the oracle enumerates
    // the closed-form fill v(i) = (i*13) % 1000 - 500 directly
    "q_rectilinear_scan" ->
      """WITH cells AS (
        |  SELECT range AS i, (range * 13) % 1000 - 500 AS v
        |  FROM range(60000))
        |SELECT i // 2000 AS blk, count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS total,
        |  CAST(min(v) AS BIGINT) AS vmin,
        |  CAST(max(v) AS BIGINT) AS vmax
        |FROM cells WHERE i BETWEEN 10000 AND 49999
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the engine side transposes a 200x300 array (64x64 chunks, ragged
    // edges) via the per-chunk re-stride job; the oracle enumerates the
    // TRANSPOSED cells directly: at(i0,i1) = v(i1,i0) with the
    // closed-form fill v(i,j) = (i*7 + j*13) % 1000 - 500
    "q_transpose" ->
      """WITH cells AS (
        |  SELECT (range // 200) AS i0, (range % 200) AS i1,
        |    ((range % 200) * 7 + (range // 200) * 13) % 1000 - 500 AS v
        |  FROM range(60000))
        |SELECT i0 // 64 AS blk, count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS total,
        |  CAST(min(v) AS BIGINT) AS vmin,
        |  CAST(max(v) AS BIGINT) AS vmax
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin,

    // zero-copy concat of two closed-form 1-D fills (40k + 20.5k cells,
    // 1000-cell chunks, ragged tail): the oracle enumerates the combined
    // coordinate space directly
    "q_concat" ->
      """WITH cells AS (
        |  SELECT range AS i,
        |    CASE WHEN range < 40000 THEN (range * 3) % 1000 - 500
        |         ELSE ((range - 40000) * 11) % 997 - 498 END AS v
        |  FROM range(60500))
        |SELECT i // 1000 AS chunk_id, count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS total,
        |  CAST(min(v) AS BIGINT) AS vmin,
        |  CAST(max(v) AS BIGINT) AS vmax
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin,

    // rect-fallback concat (ragged regular + rectilinear → rect dest,
    // tail truncation) then a rect append: cells recomputed closed-form
    "q_rect_concat" ->
      """WITH cells AS (
        |  SELECT range AS i,
        |    CASE WHEN range < 2500 THEN (range * 3) % 1000 - 500
        |         WHEN range < 5500 THEN ((range - 2500) * 11) % 997 - 498
        |         ELSE ((range - 5500) * 5) % 991 - 495 END AS v
        |  FROM range(6000))
        |SELECT i // 500 AS blk, count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS total,
        |  CAST(min(v) AS BIGINT) AS vmin,
        |  CAST(max(v) AS BIGINT) AS vmax
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin,

    // tensor map algebra: v = 2*(a*b) - 1 with b's chunks 10..19 absent
    // (fill 0) — recomputed cell-by-cell from the closed forms
    "q_tensor_binop" ->
      """WITH cells AS (
        |  SELECT range AS i,
        |    2 * (((range * 3) % 1000 - 500) *
        |         (CASE WHEN range // 1000 BETWEEN 10 AND 19 THEN 0
        |               ELSE (range * 7) % 997 END)) - 1 AS v
        |  FROM range(60000))
        |SELECT i // 1000 AS blk, count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS total,
        |  CAST(min(v) AS BIGINT) AS vmin,
        |  CAST(max(v) AS BIGINT) AS vmax
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pii_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    text || ' contact user' || doc_id ||
        |      '@example.com or +1 555-01' || doc_id ||
        |      ' at 10.0.0.' || (doc_id % 256),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
        |    'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+?\d[\d() .-]{6,}\d', '<PHONE>', 'g') AS scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,

    // winnowing (k=8, w=4): the Spark side's rolling hash is a plain
    // polynomial with base 1099511628211 mod 2^64 over the lowercased
    // text's chars — recomputed here exactly in HUGEINT (then re-signed
    // to match Java Long comparison order). Rightmost-min-tie selection
    // is arg_min over key = h·2^32 − pos (key is injective per (h,pos)).
    // Caveat: Spark hashes UTF-16 code units (charAt), DuckDB hashes
    // codepoints — identical on BMP text; the gate corpora are ASCII
    // (checked), and astral-plane text would diverge by design of the
    // JVM-side shingler, not by an arithmetic error here.
    "q_winnow" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
        |starts AS (
        |  SELECT doc_id, t, unnest(range(len(t) - 7)) AS r FROM d),
        |sh AS (
        |  SELECT doc_id, CAST(r + 1 AS INT) AS pos,
        |    list_reduce(
        |      [CAST(unicode(substr(t, CAST(r + i + 1 AS INT), 1)) AS HUGEINT)
        |        for i in range(8)],
        |      (a, c) -> (a * 1099511628211 + c) % 18446744073709551616
        |    ) AS hu
        |  FROM starts),
        |keyed AS (
        |  SELECT doc_id, pos,
        |    CAST(CASE WHEN hu >= 9223372036854775808
        |      THEN hu - 18446744073709551616 ELSE hu END AS HUGEINT)
        |      * 4294967296 - pos AS key
        |  FROM sh),
        |sel AS (
        |  SELECT doc_id,
        |    arg_min(pos, key) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS spos,
        |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
        |  FROM keyed),
        |fp AS (SELECT DISTINCT doc_id, spos FROM sel WHERE wn = 4)
        |SELECT doc_id, count(*) AS n_fp,
        |  CAST(min(spos) AS INT) AS first_pos,
        |  CAST(max(spos) AS INT) AS last_pos
        |FROM fp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // BPE: the full Sennrich learn loop REPLAYED in a recursive CTE —
    // word types as wrapped-symbol strings (chr(2)||sym||chr(3)), where
    // replace() of the wrapped pair IS the engine's left-to-right
    // non-overlapping fuse (wrapping shares no boundary chars, so one
    // pass = one pass); best pair per iteration by (freq DESC, l, r)
    // with the freq>=2 stop, 40 merges. Every corpus word is inside the
    // 100k type cap at gate scale, so the final learning state of a
    // word IS its greedy BPE segmentation (merge components always
    // predate their pair in a LEARNED list), and per-doc n_bpe is a
    // join + sum. Zero-token docs keep n_bpe = 0 via the LEFT join.
    "q_bpe_encode" -> (BpeLearnCte +
      """fin AS (
        |  SELECT w, len(s) - len(replace(s, chr(2), '')) AS n_syms
        |  FROM st WHERE it = (SELECT max(it) FROM st)),
        |doc_tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS w
        |  FROM documents)
        |SELECT d.doc_id, CAST(coalesce(sum(f.n_syms), 0) AS INT) AS n_bpe
        |FROM documents d
        |LEFT JOIN (SELECT dt.doc_id, f.n_syms
        |           FROM doc_tok dt JOIN fin f USING (w)) f
        |  ON d.doc_id = f.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // the learned merge table itself: iteration k's chosen pair rides on
    // every word row of iteration k (ml/mr/mf), so rank k-1 = the
    // distinct merge of iteration k
    "q_bpe_vocab" -> (BpeLearnCte +
      """m AS (SELECT DISTINCT it, ml, mr, mf FROM st WHERE it >= 1)
        |SELECT CAST(it - 1 AS INT) AS rank, ml AS "left", mr AS "right",
        |  ml || mr AS merged, CAST(mf AS BIGINT) AS freq
        |FROM m ORDER BY rank""".stripMargin),

    // order-sensitive fingerprint: per-token 32-bit FNV-1a folded as
    // acc*31 + h mod 2^31-1 — portable integer arithmetic, recomputed
    // bit-for-bit (init values prepended; list_reduce seeds from the
    // first element)
    "q_fingerprint" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0) AS toks
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id,
        |    list_transform(toks, w -> list_reduce(
        |      list_prepend(CAST(2166136261 AS BIGINT),
        |        list_transform(string_split(w, ''),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |      (h, c) -> (xor(h, c) * 16777619) % 4294967296)) AS hs
        |  FROM tok)
        |SELECT doc_id,
        |  list_reduce(list_prepend(CAST(7 AS BIGINT), hs),
        |    (a, h) -> (a * 31 + h) % 2147483647) AS fingerprint
        |FROM hashed ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0) AS toks
        |  FROM documents)
        |SELECT doc_id, len(toks) AS n_tokens,
        |  len(list_distinct(toks)) AS n_distinct
        |FROM base ORDER BY doc_id""".stripMargin,

    // rebuilds the SAME per-language trigram model from the corpus:
    // identical counts, identical smoothing arithmetic, round(.,4)
    "q_lm_score" ->
      """WITH tri AS (
        |  SELECT doc_id, lang,
        |    substr(lower(text), i, 3) AS g,
        |    substr(lower(text), i, 2) AS pfx
        |  FROM (SELECT doc_id, lang, text,
        |          unnest(range(1, len(text) - 1)) AS i
        |        FROM documents WHERE len(text) >= 3)),
        |c3 AS (SELECT lang, g, count(*) AS n3 FROM tri GROUP BY 1, 2),
        |c2 AS (SELECT lang, pfx, count(*) AS n2 FROM tri GROUP BY 1, 2),
        |sc AS (
        |  SELECT t.doc_id,
        |    ln((c3.n3 + 1.0) / (c2.n2 + 32.0)) AS lp
        |  FROM tri t
        |  JOIN c3 ON t.lang = c3.lang AND t.g = c3.g
        |  JOIN c2 ON t.lang = c2.lang AND t.pfx = c2.pfx)
        |SELECT doc_id, count(*) AS n_tri,
        |  round(-sum(lp) / count(*), 4) AS nll
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,

    // recomputes every hashed feature index (first 4 md5 hex chars mod
    // 64), the closed-form weight (d % 21 - 10)/1000, and the sigmoid —
    // identical arithmetic to Classifier.score (raw tf), round(.,4)
    // LEFT join from documents so a zero-token doc keeps its row and
    // scores sigmoid(bias), matching Classifier.score's explode_outer
    "q_classifier_score" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0)) AS token
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    (((('0x' || substr(md5(token), 1, 4))::INT % 64) % 21 - 10)
        |      / 1000.0) AS w
        |  FROM tok),
        |z AS (SELECT doc_id, sum(w) AS sw FROM f GROUP BY doc_id)
        |SELECT d.doc_id,
        |  round(1.0 / (1.0 + exp(-(-0.05 + coalesce(z.sw, 0.0)))), 4)
        |    AS score
        |FROM documents d LEFT JOIN z ON d.doc_id = z.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_deterministic_sample" ->
      """SELECT doc_id, source, n_chars FROM documents
        |ORDER BY md5(doc_id::VARCHAR), doc_id LIMIT 50""".stripMargin,

    // identical normalization order: NFC -> controls -> collapse ->
    // trim -> lower; DuckDB's nfc_normalize implements the same UAX#15
    "q_normalize" ->
      """SELECT doc_id,
        |  lower(trim(regexp_replace(regexp_replace(
        |    nfc_normalize(text || chr(9) || 'E' || chr(769) ||
        |      'cole  CAFE' || chr(769) || ' '),
        |    '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g'))) AS norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    // rebuilds the identical HLL register table (60-bit md5 hashes,
    // 256 registers, max leading-zero rank) and the same estimator with
    // linear-counting correction; round(.,2)
    "q_hll_distinct" ->
      """WITH tok AS (
        |  SELECT source,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0)) AS token
        |  FROM documents),
        |h AS (
        |  SELECT source, token,
        |    ('0x' || substr(md5(token), 1, 15))::BIGINT AS hv
        |  FROM tok),
        |regs AS (
        |  SELECT source, hv % 256 AS idx,
        |    max(CASE WHEN hv // 256 = 0 THEN 53
        |        ELSE 53 - length(bin(hv // 256)) END) AS mrank
        |  FROM h GROUP BY 1, 2),
        |agg AS (
        |  SELECT source, count(*) AS active,
        |    sum(pow(2.0, -mrank)) AS sum_active
        |  FROM regs GROUP BY 1),
        |est AS (
        |  SELECT source,
        |    (0.7213 / (1.0 + 1.079 / 256)) * 256.0 * 256.0 /
        |      (sum_active + (256 - active)) AS raw,
        |    256 - active AS zeros
        |  FROM agg),
        |ex AS (
        |  SELECT source, count(DISTINCT token) AS n_exact
        |  FROM tok GROUP BY 1)
        |SELECT e.source, x.n_exact,
        |  round(CASE WHEN e.raw <= 640.0 AND e.zeros > 0
        |    THEN 256.0 * ln(256.0 / e.zeros) ELSE e.raw END, 2)
        |    AS est_distinct
        |FROM est e JOIN ex x ON e.source = x.source
        |ORDER BY e.source""".stripMargin,

    // rebuilds the identical count-min sketch (md5-salted buckets) and
    // takes the same min-cell estimates — exact integer arithmetic
    "q_cms_heavy" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text),
        |    '\s+'), x -> len(x) > 0)) AS token
        |  FROM documents),
        |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
        |cells AS (
        |  SELECT j,
        |    ('0x' || substr(md5(j::VARCHAR || ':' || token), 1, 4))::INT
        |      % 512 AS bucket,
        |    count(*) AS n
        |  FROM tok, js GROUP BY 1, 2),
        |exact AS (
        |  SELECT token, count(*) AS n_occ FROM tok GROUP BY 1
        |  ORDER BY n_occ DESC, token LIMIT 30)
        |SELECT e.token, e.n_occ, min(c.n) AS est
        |FROM exact e
        |JOIN js ON true
        |JOIN cells c ON c.j = js.j AND c.bucket =
        |  ('0x' || substr(md5(js.j::VARCHAR || ':' || e.token), 1, 4))::INT
        |    % 512
        |GROUP BY 1, 2
        |ORDER BY n_occ DESC, token""".stripMargin,

    "q_word_freq" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0)) AS token
        |  FROM documents)
        |SELECT token, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
        |FROM tok GROUP BY token
        |ORDER BY n_occ DESC, token LIMIT 100""".stripMargin,

    // identical closed-form arithmetic as TextAnalysis.tfidfKeywords;
    // ranking ties break on the ROUNDED score then token in both engines
    "q_tfidf_keywords" ->
      """WITH tf AS (
        |  SELECT doc_id, t AS token, count(*) AS tf FROM (
        |    SELECT doc_id,
        |      unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |        x -> len(x) > 0)) AS t FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |         round(tf.tf * ln(n.n_docs::DOUBLE / df.df), 6) AS score
        |       FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
        |rk AS (SELECT doc_id, token, tf, df, score,
        |         CAST(row_number() OVER (PARTITION BY doc_id
        |           ORDER BY score DESC, token) AS INT) AS rank
        |       FROM sc)
        |SELECT doc_id, rank, token, tf, df, score FROM rk
        |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,

    // the full curation cascade from first principles: langid marker
    // argmax, distinct-token ratio, the composite quality formula
    // (identical literals/association as q_quality_score), then the
    // ordered CASE with the same thresholds as the query
    "q_curation" ->
      s"""WITH base AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '\\s+'),
        |      x -> len(x) > 0) AS toks
        |  FROM documents),
        |sc AS (SELECT doc_id, text, toks, len(toks) AS n_tokens,
        |    len(list_filter(toks, x -> list_contains(
        |      ['the','and','of','is','to','a'], x))) AS s_en,
        |    len(list_filter(toks, x -> list_contains(
        |      ['der','die','das','und','ist','nicht'], x))) AS s_de,
        |    len(list_filter(toks, x -> list_contains(
        |      ['le','la','les','et','est','une'], x))) AS s_fr,
        |    len(list_filter(toks, x -> list_contains(
        |      ['el','los','es','una','que','para'], x))) AS s_es,
        |    len(list_filter(toks, x -> list_contains(
        |      ['的','是','了','在','我','不'], x))) AS s_zh
        |  FROM base),
        |lg AS (SELECT *, CASE
        |    WHEN s_en > 0 AND s_en >= greatest(s_de, s_fr, s_es, s_zh)
        |      THEN 'en'
        |    WHEN s_de > 0 AND s_de >= greatest(s_en, s_fr, s_es, s_zh)
        |      THEN 'de'
        |    WHEN s_fr > 0 AND s_fr >= greatest(s_en, s_de, s_es, s_zh)
        |      THEN 'fr'
        |    WHEN s_es > 0 AND s_es >= greatest(s_en, s_de, s_fr, s_zh)
        |      THEN 'es'
        |    WHEN s_zh > 0 AND s_zh >= greatest(s_en, s_de, s_fr, s_es)
        |      THEN 'zh'
        |    ELSE 'und' END AS lang_pred
        |  FROM sc),
        |m AS (SELECT doc_id, n_tokens, lang_pred,
        |    round(CASE WHEN n_tokens = 0 THEN 0.0 ELSE
        |      len(list_distinct(toks))::DOUBLE / n_tokens END, 6)
        |      AS distinct_ratio,
        |    least(len(text)::DOUBLE / 500.0, 1.0) AS len_score,
        |    least(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |      len(list_filter(toks, x -> list_contains($stop, x)))::DOUBLE
        |        / len(toks) END * 5.0, 1.0) AS sw_score,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |      list_aggregate(list_transform(toks, x -> len(x)),
        |        'sum')::DOUBLE / len(toks) END AS mtl,
        |    least(CASE WHEN len(text) = 0 THEN 0.0 ELSE
        |      (len(text) - len(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))
        |        ::DOUBLE / len(text) END * 5.0, 1.0) AS punct_penalty
        |  FROM lg),
        |q AS (SELECT doc_id, n_tokens, lang_pred, distinct_ratio,
        |    floor((len_score * 0.4 + sw_score * 0.3 +
        |      (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.5 END)
        |        * 0.3) * (1.0 - punct_penalty * 0.5) * 1000000 + 0.5)
        |      / 1000000 AS quality
        |  FROM m)
        |SELECT doc_id, n_tokens, lang_pred, distinct_ratio, quality,
        |  CASE WHEN n_tokens < 20 THEN 'too_short'
        |       WHEN lang_pred NOT IN ('en') THEN 'lang'
        |       WHEN distinct_ratio < 0.3 THEN 'repetitive'
        |       WHEN quality < 0.5 THEN 'low_quality'
        |       ELSE 'ok' END AS reason,
        |  (CASE WHEN n_tokens < 20 THEN 'too_short'
        |       WHEN lang_pred NOT IN ('en') THEN 'lang'
        |       WHEN distinct_ratio < 0.3 THEN 'repetitive'
        |       WHEN quality < 0.5 THEN 'low_quality'
        |       ELSE 'ok' END = 'ok') AS keep
        |FROM q ORDER BY doc_id""".stripMargin,

    // centroid coords from an EXACT scaled-integer sum (order-free long
    // addition — a double avg could flip a 6-dp rounding boundary with
    // summation order), then the identical deterministic division;
    // distance is an index-order fold on both engines
    // classifier-training audit: n / n_true replay the label rule in
    // closed form; on this linearly-separable keyword task the
    // deterministic full-batch GD reaches PERFECT training accuracy at
    // the gate scales (verified at sf0.001 and sf0.01), so n_pred =
    // n_true and n_agree = n are the exact expected values — any
    // training/scoring regression (feature hash, gradient, bias, sigmoid
    // threshold) breaks per-source equality and fails the hash
    "q_classifier_train" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN regexp_matches(text, '\bspark\b')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        |  CAST(sum(CASE WHEN regexp_matches(text, '\bspark\b')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
        |  CAST(count(*) AS BIGINT) AS n_agree
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // PCA invariant audit: center_dist replays the exact scaled-integer
    // centered-norm arithmetic (the q_embedding_outliers formula with
    // one global centroid); pca_ok (orthonormal basis + descending
    // eigenvalues + projection contraction) is constant TRUE by the
    // mathematics — a solver/projection regression flips it
    "q_embedding_pca" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |x AS (SELECT unnest(v) AS val,
        |    generate_subscripts(v, 1) AS pos FROM e),
        |c AS (SELECT pos,
        |    round((CAST(sum(CAST(round(val * 1000000) AS BIGINT))
        |      AS DOUBLE) / 1000000.0) / count(*), 6) AS m
        |  FROM x GROUP BY 1),
        |cv AS (SELECT list(m ORDER BY pos) AS cv FROM c)
        |SELECT e.vec_id,
        |  round(sqrt(list_aggregate(list_transform(range(1, len(v) + 1),
        |    i -> (v[i] - cv[i]) * (v[i] - cv[i])), 'sum')), 6)
        |    AS center_dist,
        |  TRUE AS pca_ok
        |FROM e CROSS JOIN cv ORDER BY vec_id""".stripMargin,

    "q_embedding_outliers" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |x AS (SELECT label, unnest(v) AS val,
        |    generate_subscripts(v, 1) AS pos FROM e),
        |c AS (SELECT label, pos,
        |    round((CAST(sum(CAST(round(val * 1000000) AS BIGINT))
        |      AS DOUBLE) / 1000000.0) / count(*), 6) AS m
        |  FROM x GROUP BY 1, 2),
        |cv AS (SELECT label, list(m ORDER BY pos) AS cv FROM c
        |  GROUP BY 1),
        |d AS (SELECT e.vec_id, e.label,
        |    round(sqrt(list_aggregate(list_transform(range(1, len(v) + 1),
        |      i -> (v[i] - cv[i]) * (v[i] - cv[i])), 'sum')), 6) AS dist
        |  FROM e JOIN cv USING (label))
        |SELECT vec_id, label, dist, dist > 1.01 AS outlier
        |FROM d ORDER BY vec_id""".stripMargin,

    // identical per-vector arithmetic as Similarity.quantizeEmbeddings:
    // scale from the double-cast floats, codes = round(v/scale) as INT,
    // max_err over the same products — all order-insensitive rollups
    "q_embedding_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |m AS (SELECT vec_id, v,
        |    greatest(list_max(v), -list_min(v)) AS maxabs FROM e),
        |s AS (SELECT vec_id, v, CASE WHEN maxabs = 0 THEN 1.0
        |    ELSE maxabs / 127 END AS scale FROM m),
        |q AS (SELECT vec_id, v, scale,
        |    list_transform(v, x -> CAST(round(x / scale) AS INT))
        |      AS codes FROM s)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  CAST(list_aggregate(codes, 'sum') AS BIGINT) AS sum_codes,
        |  list_max(list_transform(codes, c -> abs(c))) AS max_code,
        |  round(list_max(list_transform(range(1, len(v) + 1),
        |    i -> abs(codes[i] * scale - v[i]))), 6) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,

    // same slide: starts k*16 for k in 0..floor((len-1)/16), window 64
    // truncated at the array end (1-based inclusive slices)
    "q_doc_chunks" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0) AS ts
        |  FROM documents),
        |w AS (SELECT doc_id, ts,
        |    unnest(range(0,
        |      CAST(floor((len(ts) - 1) / 16) AS BIGINT) + 1)) AS k
        |  FROM toks WHERE len(ts) > 0)
        |SELECT doc_id, CAST(k AS INT) AS chunk_idx,
        |  CAST(len(ts[k * 16 + 1 : least(k * 16 + 64, len(ts))]) AS INT)
        |    AS n_tokens,
        |  array_to_string(ts[k * 16 + 1 : least(k * 16 + 64, len(ts))],
        |    ' ') AS chunk_text
        |FROM w ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_group_sample" ->
      """WITH r AS (SELECT *,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
        |      AS _rk
        |  FROM documents)
        |SELECT doc_id, text, lang, source, n_chars FROM r WHERE _rk <= 3
        |ORDER BY source, doc_id""".stripMargin,

    // first-seer per distinct trigram = min doc_id, then per-doc rollup;
    // trigram construction mirrors the Spark slide (1-based 3-slices)
    "q_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0) AS ts FROM documents),
        |ng AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1),
        |    i -> array_to_string(ts[i:i+2], ' '))) AS g
        |  FROM toks WHERE len(ts) >= 3)),
        |fs AS (SELECT g, min(doc_id) AS first_doc FROM ng GROUP BY 1)
        |SELECT ng.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN fs.first_doc = ng.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  round(CAST(sum(CASE WHEN fs.first_doc = ng.doc_id
        |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS novelty
        |FROM ng JOIN fs ON ng.g = fs.g
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical literal arithmetic and association order as the Spark
    // side (TextAnalysis.bm25) so the 4-dp-rounded scores hash-match;
    // avgdl is EXACT in both engines (sum of small ints in double), so
    // the only inexact steps are the shared per-document expression
    "q_bm25" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0) AS toks
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, len(toks) AS dl,
        |    len(list_filter(toks, x -> x = 'spark')) AS tf_0,
        |    len(list_filter(toks, x -> x = 'vector')) AS tf_1,
        |    len(list_filter(toks, x -> x = 'stream')) AS tf_2,
        |    len(list_filter(toks, x -> x = 'window')) AS tf_3
        |  FROM base),
        |st AS (
        |  SELECT count(*) AS nn, avg(dl) AS avgdl,
        |    sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
        |    sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
        |    sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2,
        |    sum(CASE WHEN tf_3 > 0 THEN 1 ELSE 0 END) AS df_3
        |  FROM tf),
        |sc AS (
        |  SELECT doc_id, round(
        |    ln(1.0 + (nn - df_0 + 0.5) / (df_0 + 0.5)) * (tf_0 * (1.2 + 1))
        |      / (tf_0 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        |    + ln(1.0 + (nn - df_1 + 0.5) / (df_1 + 0.5)) * (tf_1 * (1.2 + 1))
        |      / (tf_1 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        |    + ln(1.0 + (nn - df_2 + 0.5) / (df_2 + 0.5)) * (tf_2 * (1.2 + 1))
        |      / (tf_2 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        |    + ln(1.0 + (nn - df_3 + 0.5) / (df_3 + 0.5)) * (tf_3 * (1.2 + 1))
        |      / (tf_3 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 4) AS bm25
        |  FROM tf, st)
        |SELECT doc_id, bm25 FROM sc
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    "q_boolean_search" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0) AS ts FROM documents)
        |SELECT doc_id FROM toks
        |WHERE list_contains(ts, 'merge') AND list_contains(ts, 'sort')
        |  AND NOT list_contains(ts, 'spark')
        |ORDER BY doc_id""".stripMargin,

    // in-window term-pair counts from position arithmetic (1-based vs
    // the index's 0-based positions — only DIFFERENCES matter)
    "q_proximity_search" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0) AS ts FROM documents),
        |pos AS (SELECT doc_id,
        |    list_filter(range(1, len(ts) + 1), i -> ts[i] = 'merge')
        |      AS pa,
        |    list_filter(range(1, len(ts) + 1), i -> ts[i] = 'sort')
        |      AS pb
        |  FROM toks),
        |c AS (SELECT doc_id, CAST(len(list_filter(
        |    flatten(list_transform(pa,
        |      x -> list_transform(pb, y -> abs(x - y)))),
        |    d -> d <= 5 AND d <> 0)) AS INT) AS n_pairs
        |  FROM pos WHERE len(pa) > 0 AND len(pb) > 0)
        |SELECT doc_id, n_pairs FROM c WHERE n_pairs > 0
        |ORDER BY doc_id""".stripMargin,

    // phrase occurrences by scanning token bigrams — the index path's
    // position-intersection must agree exactly (1-based first_pos)
    "q_phrase_search" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0) AS ts FROM documents),
        |hits AS (SELECT doc_id,
        |    list_filter(range(1, len(ts)), i ->
        |      array_to_string(ts[i:i+1], ' ') = 'merge sort') AS starts
        |  FROM toks WHERE len(ts) >= 2)
        |SELECT doc_id, CAST(len(starts) AS INT) AS n_occurrences,
        |  CAST(starts[1] AS INT) AS first_pos
        |FROM hits WHERE len(starts) > 0 ORDER BY doc_id""".stripMargin,

    "q_substring_spans" ->
      """WITH sh AS (
        |  SELECT doc_id, pos, substr(text, pos, 40) AS sub
        |  FROM (SELECT doc_id, text,
        |          unnest(range(1, len(text) - 40 + 2)) AS pos
        |        FROM documents WHERE len(text) >= 40)),
        |dup AS (
        |  SELECT sub FROM sh GROUP BY sub
        |  HAVING count(DISTINCT doc_id) > 1),
        |dp AS (SELECT s.doc_id, s.pos FROM sh s JOIN dup d USING (sub)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    pos - (row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1)
        |      AS grp
        |  FROM dp),
        |sp AS (
        |  SELECT doc_id, grp, count(*) AS n, min(pos) AS mn, max(pos) AS mx
        |  FROM isl GROUP BY doc_id, grp),
        |agg AS (
        |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_dup_shingles,
        |    count(*) AS n_spans,
        |    CAST(sum(mx - mn + 40) AS BIGINT) AS dup_chars
        |  FROM sp GROUP BY doc_id)
        |SELECT a.doc_id, (len(d.text) - 39) AS n_shingles,
        |  a.n_dup_shingles, a.n_spans, a.dup_chars
        |FROM agg a JOIN documents d ON a.doc_id = d.doc_id
        |ORDER BY a.doc_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  CAST(floor(greatest(octet_length(encode(text)) - 1, 0) / 256) + 1
        |    AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(floor(greatest(octet_length(encode(text)) - 1, 0) / 64)
        |      AS BIGINT) + 1 AS nf
        |  FROM documents)
        |SELECT doc_id, CAST(floor((nf - 1) / 4) AS BIGINT) + 1 AS n_sampled
        |FROM f ORDER BY doc_id""".stripMargin,

    // the stub-decode feature pass is pure arithmetic on the payload
    // bytes: pixels = ascii codes of the base64 rendering, features =
    // 16-bucket L1-normalized histogram — DuckDB replays every value.
    // One engine quirk to model: Spark's base64() is MIME-CHUNKED
    // (76-char lines joined by CRLF, no trailing break), so each line
    // break contributes one '\r' (13) and one '\n' (10) pixel; DuckDB's
    // to_base64 is unchunked, so the oracle adds nb = (len-1)/76 breaks
    // arithmetically to buckets 13 and 10 and to the denominator
    "q_multimodal_features" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS INT) AS media_bytes,
        |    CAST(floor(greatest(octet_length(encode(text)) - 1, 0) / 256)
        |      + 1 AS INT) AS n_frames,
        |    to_base64(encode(text)) AS b64,
        |    CASE WHEN len(to_base64(encode(text))) > 0
        |      THEN (len(to_base64(encode(text))) - 1) // 76 ELSE 0
        |    END AS nb
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id, unnest(string_split(b64, '')) AS c FROM m),
        |bc AS (
        |  SELECT doc_id, bucket, sum(k)::BIGINT AS k FROM (
        |    SELECT doc_id, ascii(c) % 16 AS bucket, count(*) AS k
        |    FROM ch GROUP BY 1, 2
        |    UNION ALL SELECT doc_id, 10, nb FROM m WHERE nb > 0
        |    UNION ALL SELECT doc_id, 13, nb FROM m WHERE nb > 0)
        |  GROUP BY 1, 2),
        |d AS (
        |  SELECT doc_id, media_bytes, n_frames,
        |    greatest(len(b64) + 2 * nb, 1) AS n
        |  FROM m)
        |SELECT d.doc_id, d.media_bytes, d.n_frames,
        |  CAST(b.bucket AS INT) AS bucket,
        |  coalesce(bc.k, 0)::BIGINT AS pixels,
        |  d.n::BIGINT AS n_pixels
        |FROM d CROSS JOIN (SELECT unnest(range(16)) AS bucket) b
        |LEFT JOIN bc ON bc.doc_id = d.doc_id AND bc.bucket = b.bucket
        |ORDER BY d.doc_id, b.bucket""".stripMargin,

    // perceptual-hash dedup over the synthesized PNG fixture: docs with
    // equal pattern (doc_id % 25) are byte-identical images (decode →
    // 9×8 bilinear thumbnail → identical ahash+dhash → Hamming 0,
    // structurally guaranteed), and DISTINCT patterns sit ≥ 19 phash
    // bits apart (pngGray's splitmix64 block mixing — measured across
    // all 25 patterns), so "n_dups = same-pattern count − 1" is the
    // exact closed-form result: equality proves both recall (every
    // identical pair found through the 16-bit dHash blocking) and
    // soundness (no cross-pattern pair at Hamming 0). The hash VALUES
    // stay engine-side by design — ImageIO's bilinear resample is not
    // portably replayable in SQL; the pairing contract is.
    "q_image_phash" ->
      """WITH g AS (SELECT doc_id, doc_id % 25 AS p FROM documents),
        |c AS (SELECT p, count(*) AS m FROM g GROUP BY p)
        |SELECT g.doc_id, m - 1 AS n_dups
        |FROM g JOIN c ON g.p = c.p WHERE m > 1
        |ORDER BY doc_id""".stripMargin,

    // the Spark side synthesizes a square-wave WAV per doc (amplitude and
    // length closed-form in doc_id) and REALLY decodes it via
    // javax.sound.sampled; a square wave's RMS == amplitude, so the
    // decoded features are exactly this arithmetic
    "q_multimodal_audio" ->
      """SELECT doc_id,
        |  CAST(8000 AS DOUBLE) AS audio_sample_rate,
        |  1 AS audio_channels,
        |  16 AS audio_bits,
        |  CAST(((doc_id % 5) + 1) * 800 AS BIGINT) AS audio_frames,
        |  round(CAST(((doc_id % 5) + 1) * 800 AS DOUBLE) / 8000, 6)
        |    AS audio_duration_s,
        |  round(CAST(1000 + (doc_id % 7) * 100 AS DOUBLE), 4) AS audio_rms,
        |  CAST(1000 + (doc_id % 7) * 100 AS DOUBLE) AS audio_peak
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the Spark side synthesizes an MJPEG AVI per doc (k = doc_id%3+2
    // frames at 16x16, 25 fps), walks the RIFF container and JPEG-decodes
    // every 2nd frame — container facts are exact arithmetic
    "q_video_frames" ->
      """SELECT doc_id,
        |  16 AS video_width,
        |  16 AS video_height,
        |  CAST(25 AS DOUBLE) AS video_fps,
        |  CAST((doc_id % 3) + 2 AS INT) AS video_frames,
        |  CAST(((doc_id % 3) + 2 + 1) // 2 AS INT) AS video_decoded_frames
        |FROM documents ORDER BY doc_id""".stripMargin)

  /** The index path produces bit-identical scores to the scan path for
    * every MATCHING doc (fixed-order fold, exact +0.0 for absent
    * terms) but emits only docs containing ≥1 query term — so its
    * oracle is q_bm25's restricted to docs with a positive term count
    * (NOT to a positive rounded score, which would drop a tiny-positive
    * doc the index path keeps). With ≥ topK matching docs the output is
    * identical to q_bm25's.
    */
  val all: Map[String, String] = {
    val filtered = base("q_bm25").replace("FROM tf, st)",
      "FROM tf, st WHERE tf_0 + tf_1 + tf_2 + tf_3 > 0)")
    require(filtered != base("q_bm25"),
      "q_bm25 oracle shape changed; fix the q_bm25_indexed rewrite")
    base.updated("q_bm25_indexed", filtered)
  }
}
