package graft

import org.apache.spark.sql.functions._
import graft.repo._
import graft.storage.Store

/** Partial aggregate pushdown on values scans: COUNT/SUM/MIN/MAX reduce
  * inside the chunk decoder (one partial row per partition), composing
  * with exactly-pushed i-dim slice bounds. Results must be bit-identical
  * to the unpushed per-cell plan, including NULL semantics on empty
  * slices.
  */
class AggPushdownSpec extends SparkTestBase {

  private def mkRepo(dtype: String): String = {
    val dir = tmpDir("aggrepo")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 100))))
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(8, 10), Seq(4, 5), userData = s"""{"dtype":"$dtype"}""")
    s.commit("init")
    val cast = if (dtype.startsWith("float")) "CAST(id - 40 AS DOUBLE)"
               else "id - 40"
    spark.range(80).selectExpr("id div 10 as i0", "id % 10 as i1",
      s"$cast as value")
      .write.format("graft-v2").option("path", dir).option("array", "/a")
      .option("mode", "values").option("dtype", dtype)
      .mode("append").save()
    dir
  }

  private def read(dir: String, dtype: String) =
    spark.read.format("graft-v2").option("path", dir).option("array", "/a")
      .option("mode", "values").option("dtype", dtype).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString("\n")

  test("global count/sum/min/max push into the chunk decoder") {
    val dir = mkRepo("int64")
    val agg = read(dir, "int64").agg(
      count(lit(1)).as("n"), sum("value").as("s"),
      min("value").as("lo"), max("value").as("hi"))
    assert(scanOf(agg).contains("PushedAggregates"), scanOf(agg))
    val r = agg.head()
    assert(r.getLong(0) == 80L)
    assert(r.getLong(1) == (0 until 80).map(_ - 40).sum.toLong)
    assert(r.getLong(2) == -40L && r.getLong(3) == 39L)
  }

  test("pushdown composes with exactly-pushed slice bounds") {
    val dir = mkRepo("int64")
    // cuts through chunk interiors on both dims: the clip must be exact
    val agg = read(dir, "int64").filter(col("i0").between(1, 6) &&
      col("i1") >= 2 && col("i1") < 9)
      .agg(sum("value").as("s"), count(lit(1)).as("n"))
    assert(scanOf(agg).contains("PushedAggregates"), scanOf(agg))
    val r = agg.head()
    val exp = (0 until 80).map(id => (id / 10, id % 10, id - 40))
      .filter { case (i0, i1, _) => i0 >= 1 && i0 <= 6 && i1 >= 2 && i1 < 9 }
    assert(r.getLong(1) == exp.length.toLong)
    assert(r.getLong(0) == exp.map(_._3).sum.toLong)
  }

  test("avg decomposes to pushed sum+count; value filters disable pushdown") {
    val dir = mkRepo("float32")
    val avgDf = read(dir, "float32").agg(avg("value").as("a"))
    assert(scanOf(avgDf).contains("PushedAggregates"), scanOf(avgDf))
    assert(math.abs(avgDf.head().getDouble(0) -
      (0 until 80).map(_ - 40.0).sum / 80.0) < 1e-9)

    // a predicate on value cannot be pushed exactly -> no agg pushdown,
    // plain per-cell plan, still correct
    val filtered = read(dir, "float32").filter(col("value") > 0)
      .agg(sum("value").as("s"), count(lit(1)).as("n"))
    assert(!scanOf(filtered).contains("PushedAggregates"), scanOf(filtered))
    val r = filtered.head()
    assert(r.getLong(1) == 39L)
    assert(math.abs(r.getDouble(0) - (1 until 40).sum.toDouble) < 1e-6)
  }

  test("empty slice: pushed count is 0 and pushed sum is NULL") {
    val dir = mkRepo("int64")
    val r = read(dir, "int64").filter(col("i0") >= 100)
      .agg(count(lit(1)).as("n"), sum("value").as("s")).head()
    assert(r.getLong(0) == 0L)
    assert(r.isNullAt(1))
  }

  test("GROUP BY index dims pushes with the aggregates") {
    val dir = mkRepo("int64")
    // outer dim: group key constant per decode run (fast path)
    val byI0 = read(dir, "int64").groupBy("i0").agg(
      sum("value").as("s"), count(lit(1)).as("n"), max("value").as("m"))
      .orderBy("i0")
    assert(scanOf(byI0).contains("PushedGroupBy"), scanOf(byI0))
    val rows = byI0.collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val i0 = r.getLong(0)
      val exp = (0 until 80).filter(_ / 10 == i0).map(_ - 40)
      assert(r.getLong(1) == exp.sum.toLong, s"i0=$i0")
      assert(r.getLong(2) == 10L && r.getLong(3) == exp.max.toLong)
    }

    // innermost dim: key changes per cell (slow path), plus slice bounds
    val byI1 = read(dir, "int64").filter(col("i0") >= 2)
      .groupBy("i1").agg(min("value").as("lo")).orderBy("i1")
    assert(scanOf(byI1).contains("PushedGroupBy"), scanOf(byI1))
    val r1 = byI1.collect()
    assert(r1.length == 10)
    r1.foreach { r =>
      val i1 = r.getLong(0)
      val exp = (0 until 80).filter(id => id % 10 == i1 && id / 10 >= 2)
        .map(_ - 40)
      assert(r.getLong(1) == exp.min.toLong, s"i1=$i1")
    }

    // both dims grouped = per-cell identity: equals the raw relation
    val byBoth = read(dir, "int64").groupBy("i0", "i1")
      .agg(sum("value").as("v")).orderBy("i0", "i1").collect()
    assert(byBoth.length == 80)
    assert(byBoth.map(_.getLong(2)).toSeq ==
      (0 until 80).map(id => (id - 40).toLong))
  }

  test("sliced values scans report post-pushdown stats and broadcast") {
    val dir = mkRepo("int64")
    val sliced = read(dir, "int64").filter(col("i0") === 2)
    // rows estimate = bounds ∩ shape (10 cells) -> tiny sizeInBytes
    val stats = sliced.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes < 10000, s"stats=$stats")
    // ... which is what lets Catalyst broadcast the tensor side of a
    // join instead of shuffling both sides
    val joined = spark.range(100000).toDF("i1").join(sliced, "i1")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("SQL over the catalog takes the same pushed path") {
    val dir = mkRepo("int64")
    val cat = "gagg" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    val df = spark.sql(s"SELECT sum(value), count(*), min(value) FROM $cat.a " +
      "WHERE i0 < 6")
    assert(scanOf(df).contains("PushedAggregates"), scanOf(df))
    val r = df.head()
    val exp = (0 until 60).map(_ - 40)
    assert(r.getLong(0) == exp.sum.toLong && r.getLong(1) == 60L &&
      r.getLong(2) == -40L)
  }
}
