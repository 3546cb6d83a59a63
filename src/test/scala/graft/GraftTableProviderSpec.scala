package graft

import org.apache.spark.sql.functions._
import graft.repo._
import graft.storage.Store

class GraftTableProviderSpec extends SparkTestBase {

  test("DSv2 format(graft-v2): reads refs; c0 predicates prune partitions") {
    val dir = tmpDir("repo")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 2))))
    val s = repo.writableSession("main")
    s.addArray("/t", Seq(16), Seq(2)) // 8 chunks, 4 splits
    for (c <- 0 until 8)
      s.writeChunk("/t", Seq(c), Array.fill(c + 1)(c.toByte))
    s.commit("data")

    val df = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/t").load()
    assert(df.count() == 8)
    // values faithful: inline payload lengths are c+1
    val lens = df.select("c0", "length").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert((0 until 8).forall(c => lens(c) == c + 1))
    // coord array survives the Group conversion
    assert(df.filter(col("c0") === 5).select("coord")
      .head().getSeq[Int](0) == Seq(5))

    // predicate prunes partitions at planning: only split 3 scanned
    val filtered = df.filter(col("c0") >= 6)
    val scanDesc = filtered.queryExecution.executedPlan.toString()
    assert(filtered.count() == 2)
    assert(scanDesc.contains("d0 in [6,9223372036854775807]"))

    // time travel option
    repo.createTag("v1", repo.lookupBranch("main").get)
    val s2 = repo.writableSession("main")
    s2.deleteChunk("/t", Seq(0))
    s2.commit("delete one")
    val atTag = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/t")
      .option("version", "tag:v1").load()
    assert(atTag.count() == 8)
    val atMain = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/t").load()
    assert(atMain.count() == 7)
  }

  test("DSv2 values mode: decoded cells with element-bound pushdown") {
    val dir = tmpDir("repo")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 1))))
    val s = repo.writableSession("main")
    s.addArray("/v", Seq(8, 6), Seq(2, 3)) // 4x2 chunk grid, split per c0
    val df0 = spark.range(48).select(
      expr("id div 6").as("i0"), expr("id % 6").as("i1"),
      col("id").as("value"))
    graft.tensor.TensorPlane.writeValues(s, "/v", df0, "int64")
    s.commit("values")

    val v = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/v")
      .option("mode", "values").option("dtype", "int64").load()
    assert(v.columns.toSeq == Seq("i0", "i1", "value"))
    assert(v.count() == 48)
    assert(v.agg(sum("value")).head().getLong(0) == (0 until 48).sum)

    // element-bound pushdown: i0 in [2,3], i1 >= 4
    val sliced = v.filter(col("i0") >= 2 && col("i0") <= 3 && col("i1") >= 4)
    val rows = sliced.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 4)
    assert(rows.toSet == Set((2L,4L,16L),(2L,5L,17L),(3L,4L,22L),(3L,5L,23L)))
    // split pruning reached the plan (bounds visible in scan description)
    val desc = sliced.queryExecution.executedPlan.toString()
    assert(desc.contains("mode=values"))
    // the values scan feeds Spark columnar batches (ColumnarToRow above it)
    assert(v.queryExecution.executedPlan.toString().contains("ColumnarToRow"))

    // unknown dtypes are rejected at plan time, not decoded as float64
    val bad = intercept[Exception] {
      spark.read.format("graft-v2")
        .option("path", dir).option("array", "/v")
        .option("mode", "values").option("dtype", "int").load()
    }
    assert(bad.getMessage.contains("unknown dtype"))
  }

  test("DSv2 values mode: rectilinear grids scan, slice and aggregate") {
    import graft.functions.ChunkCodec
    val dir = tmpDir("repo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    // 2-D rectilinear: rows tiled [2,3], cols tiled [4,2] over a 5x6
    // array -> chunk (r,c) extents vary per coordinate
    s.addArrayRectilinear("/r", Seq(5, 6), Seq(Seq(2L, 3L), Seq(4L, 2L)),
      userData = """{"dtype":"int64"}""")
    // value = global row-major index i0*6 + i1, written chunk by chunk
    def cellVal(i0: Long, i1: Long) = i0 * 6 + i1
    val rowStarts = Seq(0L, 2L); val rowExt = Seq(2L, 3L)
    val colStarts = Seq(0L, 4L); val colExt = Seq(4L, 2L)
    for (cr <- 0 until 2; cc <- 0 until 2) {
      val vals = for {
        r <- 0L until rowExt(cr); c <- 0L until colExt(cc)
      } yield cellVal(rowStarts(cr) + r, colStarts(cc) + c)
      s.writeChunk("/r", Seq(cr, cc),
        ChunkCodec.encodeLongs(vals.toArray, "int64"))
    }
    s.commit("rect values")

    val v = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/r")
      .option("mode", "values").option("dtype", "int64").load()
    assert(v.columns.toSeq == Seq("i0", "i1", "value"))
    assert(v.count() == 30)
    // every cell's index arithmetic correct across variable extents
    assert(v.filter(col("value") =!= col("i0") * 6 + col("i1"))
      .count() == 0)
    // element-bound slice crossing both chunk boundaries
    val sliced = v.filter(col("i0") >= 1 && col("i0") <= 3 &&
      col("i1") >= 3 && col("i1") <= 4)
    val rows = sliced.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == (for (i0 <- 1L to 3L; i1 <- 3L to 4L)
      yield (i0, i1, cellVal(i0, i1))).toSet)
    // aggregation over the rect table (grouped + global) — and the
    // aggregate PUSHES into the chunk decoder exactly as on regular
    // grids (the runs-based reader reads per-chunk geometry)
    val aggDf = v.agg(sum("value"))
    assert(aggDf.queryExecution.executedPlan.toString()
      .contains("PushedAggregates"))
    assert(aggDf.head().getLong(0) == (0 until 30).sum)
    val byRow = v.groupBy("i0").agg(sum("value").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byRow(2L) == (12L to 17L).sum)
    // SQL over the catalog reaches the same rect table
    val cat = "rcat" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    val rowsSql = spark.sql(s"SELECT sum(value) FROM $cat.r " +
      "WHERE i0 >= 1 AND i0 <= 3").head().getLong(0)
    assert(rowsSql == (for (i0 <- 1L to 3L; i1 <- 0L to 5L)
      yield cellVal(i0, i1)).sum)
    // SQL DELETE: rect-aligned ranges are metadata deletes (alignment
    // means landing on the grid's REAL chunk starts, not divisibility)
    val delErr = intercept[Exception] {
      spark.sql(s"DELETE FROM $cat.r WHERE i0 >= 1") // mid-chunk: 1 not a start
    }
    assert(delErr.getMessage.toLowerCase.contains("delete"))
    spark.sql(s"DELETE FROM $cat.r WHERE i0 >= 2") // chunk-row 1 starts at 2
    assert(spark.sql(s"SELECT count(*) FROM $cat.r").head().getLong(0) == 12)

    // writes keep refusing rectilinear grids loudly
    val err = intercept[Exception] {
      v.limit(1).write.format("graft-v2")
        .option("path", dir).option("array", "/r")
        .option("mode", "values").option("dtype", "int64")
        .mode("append").save()
    }
    assert(err.getMessage.contains("regular chunk grid"))
  }

  test("DSv2 write: distributed refs staged and committed through CAS") {
    val dir = tmpDir("repo")
    val store = Store.local(dir)
    val repo = Repository.create(store, spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 4))))
    val s = repo.writableSession("main")
    s.addArray("/w", Seq(64), Seq(1))
    s.commit("init")
    // pre-upload chunk payloads, then write the REFS through V2 (the
    // dask-style flow: workers hold refs, driver commits once)
    val ids = (0 until 16).map { c =>
      (c, repo.assets.writeChunk(Array.fill(8)(c.toByte)))
    }
    import spark.implicits._
    val refs = ids.toDF("c", "chunk_id")
      .select(array(col("c")).as("coord"), col("chunk_id"),
        lit("ref").as("kind"), lit(0L).as("offset"), lit(8L).as("length"))
    refs.repartition(4).write.format("graft-v2")
      .option("path", dir).option("array", "/w")
      .option("message", "v2 refs").mode("append").save()

    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/w").count() == 16)
    assert(ro.getChunk("/w", Seq(7)).get.head == 7.toByte)
    assert(store.list("staging/").isEmpty) // staging cleaned after commit
    assert(repo.info().ancestry(repo.lookupBranch("main").get).head
      .message == "v2 refs")
  }

  test("DSv2 custom metrics report executor-side storage traffic") {
    val dir = tmpDir("repo")
    val store = Store.local(dir)
    val repo = Repository.create(store, spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 8))))
    val s = repo.writableSession("main")
    // 1 KiB chunk payloads: above the 512 B inline threshold, so reads
    // issue real store GETs (inline refs would legitimately report 0)
    s.addArray("/t", Seq(512), Seq(128))
    (0 until 4).foreach { c =>
      s.writeChunk("/t", Seq(c),
        graft.functions.ChunkCodec.encodeLongs(
          Array.tabulate(128)(i => (c * 128 + i).toLong), "int64"))
    }
    s.commit("data")

    val v = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/t")
      .option("mode", "values").option("dtype", "int64").load()
    assert(v.count() == 512)
    // the executed plan's BatchScan carries our custom metrics, summed
    // from executor task accumulators — LoggingStore can't see this
    // traffic (per-JVM cached clients), the SQL metric plumbing can
    import org.apache.spark.sql.execution.SparkPlan
    def findScan(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScan(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScan(q.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        Seq(b)
      case other => other.children.flatMap(findScan)
    }
    // the earlier count() warmed the JVM-wide chunk cache; clear it so
    // the metered scan below observes real storage traffic (gets/bytes
    // count only cache MISSES by design)
    graft.storage.ChunkCache.clear()
    val agg = v.groupBy().sum("value")
    assert(agg.collect().head.getLong(0) == (0 until 512).sum.toLong)
    val scan = findScan(agg.queryExecution.executedPlan)
    assert(scan.nonEmpty, agg.queryExecution.executedPlan.toString)
    val m = scan.head.metrics
    info("metrics: " + m.map { case (k, v) => s"$k=${v.value}" }.mkString(", "))
    assert(m.contains("graftStoreGets"), m.keys.mkString(","))
    assert(m("graftStoreGets").value == 4)
    assert(m("graftChunksDecoded").value == 4)
    assert(m("graftChunkBytesFetched").value == 4 * 128 * 8)
  }

  test("DSv2 values write: Spark arranges chunks, tasks stream-encode") {
    val dir = tmpDir("repo")
    val store = Store.local(dir)
    val repo = Repository.create(store, spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 4))))
    val s = repo.writableSession("main")
    s.addArray("/m", Seq(8, 10), Seq(4, 5)) // 2x2 chunks, 80 cells
    s.commit("init")

    // sparse input, shuffled order, one cell duplicated: the connector
    // must cluster+sort rows itself (RequiresDistributionAndOrdering)
    import spark.implicits._
    val rows = (for {
      i <- 0L until 8L; j <- 0L until 10L if (i + j) % 3 != 0
    } yield (i, j, (i * 100 + j).toDouble))
    val df = scala.util.Random.shuffle(rows).toDF("i0", "i1", "value")
      .repartition(7) // deliberately unaligned with the chunk grid
    df.write.format("graft-v2")
      .option("path", dir).option("array", "/m")
      .option("mode", "values").option("dtype", "float64")
      .option("message", "v2 values").mode("append").save()

    val back = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/m")
      .option("mode", "values").option("dtype", "float64").load()
    assert(back.count() == 80) // absent cells materialize as fill 0.0
    val got = back.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { case (i, j, v) => assert(got((i, j)) == v, s"($i,$j)") }
    assert(got((0L, 3L)) == 0.0) // (0+3)%3==0 -> absent -> fill
    assert(store.list("staging/").isEmpty)
    // exactly one chunk object per grid cell: tasks never split a chunk
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/m").count() == 4)
    assert(repo.info().ancestry(repo.lookupBranch("main").get).head
      .message == "v2 values")
  }

  test("DSv2 values write: _c helper columns take the clustered plan") {
    val dir = tmpDir("repo")
    val store = Store.local(dir)
    val repo = Repository.create(store, spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 4))))
    val s = repo.writableSession("main")
    s.addArray("/m", Seq(8, 10), Seq(4, 5)) // 2x2 chunks, 80 cells
    s.commit("init")

    // provider route + precomputed chunk-coord columns: Spark clusters on
    // the plain _c0/_c1 references (no FunctionCatalog), every task gets
    // whole chunks, nothing takes the boundary-leftover path
    import spark.implicits._
    val rows = (for {
      i <- 0L until 8L; j <- 0L until 10L if (i + j) % 3 != 0
    } yield (i, j, (i * 100 + j).toDouble))
    scala.util.Random.shuffle(rows).toDF("i0", "i1", "value")
      .selectExpr("i0", "i1", "value", "i0 div 4 as _c0", "i1 div 5 as _c1")
      .repartition(7)
      .write.format("graft-v2")
      .option("path", dir).option("array", "/m")
      .option("mode", "values").option("dtype", "float64")
      .option("clustered", "true")
      .option("message", "v2 clustered").mode("append").save()

    val back = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/m")
      .option("mode", "values").option("dtype", "float64").load()
    assert(back.count() == 80)
    val got = back.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { case (i, j, v) => assert(got((i, j)) == v, s"($i,$j)") }
    assert(store.list("staging/").isEmpty)
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/m").count() == 4) // whole chunks, one object each
  }

  test("mis-computed _c helpers fail the write loudly, never a silent " +
      "partial chunk") {
    val dir = tmpDir("repo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    s.addArray("/m", Seq(8, 10), Seq(4, 5))
    s.commit("init")

    // _c1 = i1 (identity, not i1 div 5): rows of one TRUE chunk spread
    // over several clusters, hence several tasks; each task uploads a
    // partial fill-0 chunk for the same coord, and last-wins would
    // silently drop cells. Because the mis-clustering is still MONOTONE
    // in the true coord, no task ever revisits a flushed coord — the
    // intra-task flushedCoords guard cannot see it; only the driver-side
    // cross-task duplicate check can, with the stable
    // write_not_clustered kind.
    import spark.implicits._
    val rows = for { i <- 0L until 8L; j <- 0L until 10L }
      yield (i, j, (i * 100 + j).toDouble)
    // keep AQE from coalescing this tiny input into ONE task (which
    // would hide the cross-task hazard this test exists to exercise)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    val thrown = intercept[Throwable] {
      try {
        spark.conf.set(coalesceKey, "false")
        rows.toDF("i0", "i1", "value")
          .selectExpr("i0", "i1", "value", "i0 div 4 as _c0", "i1 as _c1")
          .write.format("graft-v2")
          .option("path", dir).option("array", "/m")
          .option("mode", "values").option("dtype", "float64")
          .option("clustered", "true")
          .option("message", "bad helpers").mode("append").save()
      } finally spark.conf.set(coalesceKey, prev)
    }
    val graftCause = Iterator.iterate(thrown)(_.getCause)
      .takeWhile(_ != null).collectFirst { case g: GraftException => g }
    assert(graftCause.exists(_.kind == GraftError.WriteNotClustered),
      s"expected write_not_clustered, got $thrown")
    // nothing landed: the branch still has zero refs for /m
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/m").count() == 0)
  }
}
