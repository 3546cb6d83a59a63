package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Packing, TextAnalysis}

/** Sequence packing + deterministic shard shuffle: exact equivalence
  * with the single-window definition (computed brute-force in the test),
  * plus the scale guarantee — the plan must contain NO single-partition
  * window exchange (that is the whole point of the bucketed design).
  */
class PackingSpec extends SparkTestBase {
  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("packSequences equals the global-window definition exactly") {
    val w = 512L
    val out = Packing.packSequences(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), w, buckets = 4)
      .orderBy("doc_id").collect()

    // brute force: one global cumsum in test code
    val toks = docs
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text"))
        .cast("long").as("t"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 > 0)
    var cum = 0L
    val expected = toks.map { case (id, t) =>
      val start = cum; cum += t
      (id, t, start, start / w, (cum - 1) / w, (cum - 1) / w - start / w + 1)
    }
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, e) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)) == e, s"row ${r.getLong(0)}")
    }
    // long docs straddle pack boundaries; the fixture must exercise that
    assert(expected.exists(_._6 > 1), "no multi-span docs in fixture")
    // bucket count must not change results (prefix offsets line up)
    val out1 = Packing.packSequences(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), w, buckets = 1)
      .orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq == out1.map(_.toSeq).toSeq)
  }

  test("packSequences plans per-bucket windows, not a global sort") {
    val plan = Packing.packSequences(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), 512L, buckets = 8)
      .queryExecution.executedPlan.toString
    // a global running total would show a single-partition exchange
    // feeding the window; the bucketed design must never do that
    assert(!plan.contains("Exchange SinglePartition"), plan.take(2000))
  }

  test("shuffleShards: reproducible permutation, dense per-shard ranks") {
    val a = Packing.shuffleShards(docs, "doc_id", 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Packing.shuffleShards(docs, "doc_id", 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq) // deterministic across runs
    assert(a.length == docs.count())
    // per shard: positions are exactly 1..n
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // the permutation decorrelates from id order: within a shard,
    // consecutive positions should not be consecutive ids
    val monotone = a.groupBy(_._2).values.map { rows =>
      val byPos = rows.sortBy(_._3).map(_._1)
      byPos.zip(byPos.drop(1)).count { case (x, y) => y == x + 1 }
    }.sum
    assert(monotone < a.length / 4, s"shuffle looks ordered: $monotone")
  }
}
