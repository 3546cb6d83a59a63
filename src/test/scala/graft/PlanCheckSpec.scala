package graft

/** Plan-shape guards for the scale-critical queries: these assert the
  * OPTIMIZED plan keeps the properties the operators were designed for —
  * a regression here is invisible to correctness tests but multiplies
  * work at 100 TB.
  */
class PlanCheckSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("lsh verify stage evaluates array_intersect once per candidate") {
    // one staged eval in the filter (per candidate) + one in the
    // survivors' jaccard projection — never two per candidate (a
    // jaccard-form threshold gets pushed into the join with the staged
    // alias re-expanded)
    plan(Queries.q_dedup_ngram_lsh(spark, sf)).split("\n").foreach { l =>
      val n = "array_intersect".r.findAllIn(l).size
      assert(n <= 1, s"array_intersect evaluated $n times in: ${l.trim.take(200)}")
    }
  }

  test("flagship star-schema rollup broadcasts every dimension") {
    val p = plan(SparkEntry.entry(spark))
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4,
      "expected all 4 dimension joins broadcast")
    assert(!p.contains("SortMergeJoin"),
      "a dimension fell off the broadcast path onto a full shuffle join")
  }

  test("predicate pushdown reaches the parquet scan") {
    val p = plan(Queries.q_filter_pushdown(spark, sf))
    assert(p.contains("PushedFilters: ["), "no PushedFilters in scan")
    assert(!p.contains("PushedFilters: []"),
      "predicates did not reach the parquet scan")
  }

  test("exact dedup is a single shuffle") {
    val p = plan(Queries.q_dedup_exact(spark, sf))
    // one exchange for the hash groupBy; the explode and projection stay
    // in the same stage (orderBy in the query entry adds a display sort)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, found $exchanges")
  }

  test("decontamination broadcasts the benchmark side") {
    val p = plan(Queries.q_decontaminate(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "benchmark posting list is not broadcast — corpus would shuffle")
  }

  test("similarity top-k avoids a global sort") {
    val p = plan(Queries.q_similarity_topk(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k lost TakeOrderedAndProject (global Sort+Exchange instead)")
  }

  test("no pipeline query plans a cartesian or nested-loop join") {
    val checked = Seq("q_dedup_minhash", "q_dedup_simhash",
      "q_dedup_ngram_jaccard", "q_dedup_ngram_lsh", "q_embedding_neardups",
      "q_ann_neighbors", "q_decontaminate", "q_dedup_clusters")
    checked.foreach { name =>
      val p = plan(Queries.all(name)(spark, sf))
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name plans a BroadcastNestedLoopJoin")
    }
  }
}
