package graft

/** Plan-shape guards for the scale-critical queries: these assert the
  * OPTIMIZED plan keeps the properties the operators were designed for —
  * a regression here is invisible to correctness tests but multiplies
  * work at 100 TB.
  */
class PlanCheckSpec extends SparkTestBase {
  test("lsh verify stage evaluates array_intersect once per candidate") {
    val df = Queries.q_dedup_ngram_lsh(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // one staged eval in the filter (per candidate) + one in the
    // survivors' jaccard projection — never two per candidate (a
    // jaccard-form threshold gets pushed into the join with the staged
    // alias re-expanded)
    plan.split("\n").foreach { l =>
      val n = "array_intersect".r.findAllIn(l).size
      assert(n <= 1, s"array_intersect evaluated $n times in: ${l.trim.take(200)}")
    }
  }
}
