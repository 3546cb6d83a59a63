package graft

import org.apache.spark.sql.functions._
import graft.repo._
import graft.storage.Store

/** Storage-partitioned joins: two arrays sharing a chunk grid join on
  * their index columns with NO shuffle on either side — each scan
  * reports KeyGroupedPartitioning over `chunk_coord(i_d)` and plans one
  * keyed partition per chunk. The chunk-diff / mask-apply family at
  * 100 TB is exactly this shape.
  */
class StoragePartitionedJoinSpec extends SparkTestBase {

  private def setup(): (String, String) = {
    val dir = tmpDir("spjrepo")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 100))))
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(8, 10), Seq(4, 5), userData = """{"dtype":"int64"}""")
    s.addArray("/b", Seq(8, 10), Seq(4, 5), userData = """{"dtype":"int64"}""")
    // same grid, different chunking -> incompatible partitioning
    s.addArray("/c", Seq(8, 10), Seq(2, 5), userData = """{"dtype":"int64"}""")
    s.commit("init")
    val cat = "gspj" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    Seq("a" -> 1L, "b" -> 7L, "c" -> 7L).foreach { case (t, mult) =>
      spark.sql(s"INSERT INTO $cat.$t SELECT id div 10, id % 10, " +
        s"id * $mult FROM range(80)")
    }
    (cat, dir)
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))

  private def withSpj[A](body: => A): A = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("same-grid arrays join with zero shuffles") {
    val (cat, _) = setup()
    withSpj {
      val df = spark.sql(
        s"""SELECT sum(abs(a.value - b.value)) AS d, count(*) AS n
           |FROM $cat.a a JOIN $cat.b b
           |ON a.i0 = b.i0 AND a.i1 = b.i1""".stripMargin)
      assert(shuffles(df) == 0,
        df.queryExecution.executedPlan.toString.take(3000))
      val r = df.head()
      assert(r.getLong(1) == 80L)
      assert(r.getLong(0) == (0 until 80).map(id => math.abs(id - id * 7L)).sum)
    }
  }

  test("rectilinear same-grid arrays join shuffle-free; mismatched rect grids fall back") {
    val dir = tmpDir("spjrect")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    val grid = Seq(Seq(2L, 3L), Seq(4L, 2L))
    s.addArrayRectilinear("/ra", Seq(5, 6), grid,
      userData = """{"dtype":"int64"}""")
    s.addArrayRectilinear("/rb", Seq(5, 6), grid,
      userData = """{"dtype":"int64"}""")
    s.addArrayRectilinear("/rc", Seq(5, 6), Seq(Seq(3L, 2L), Seq(4L, 2L)),
      userData = """{"dtype":"int64"}""")
    val df = spark.range(30).select(
      expr("id div 6").as("i0"), expr("id % 6").as("i1"),
      col("id").as("value"))
    graft.tensor.TensorPlane.writeValues(s, "/ra", df, "int64")
    graft.tensor.TensorPlane.writeValues(s, "/rb",
      df.withColumn("value", col("value") * 7), "int64")
    graft.tensor.TensorPlane.writeValues(s, "/rc",
      df.withColumn("value", col("value") * 7), "int64")
    s.commit("rect spj")
    val cat = "gspjr" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    withSpj {
      // same rect grid: the chunk_coord_rect_<sizes> transforms match
      val j = spark.sql(
        s"""SELECT sum(abs(a.value - b.value)) AS d, count(*) AS n
           |FROM $cat.ra a JOIN $cat.rb b
           |ON a.i0 = b.i0 AND a.i1 = b.i1""".stripMargin)
      assert(shuffles(j) == 0,
        j.queryExecution.executedPlan.toString.take(3000))
      val r = j.head()
      assert(r.getLong(1) == 30L)
      assert(r.getLong(0) == (0 until 30).map(id => 6L * id).sum)
      // different chunk-length tables: canonicalNames differ -> shuffle
      val m = spark.sql(
        s"""SELECT sum(a.value + c.value) AS s
           |FROM $cat.ra a JOIN $cat.rc c
           |ON a.i0 = c.i0 AND a.i1 = c.i1""".stripMargin)
      assert(shuffles(m) > 0)
      assert(m.head().getLong(0) == (0 until 30).map(id => id + id * 7L).sum)
    }
  }

  test("rect grid wider than the inline-name boundary still joins shuffle-free (digest transform)") {
    val dir = tmpDir("spjrectbig")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    // 80 chunks on one dim (> RectSpjMaxChunksPerDim=64): the
    // chunk-length table no longer fits the transform name, so the scan
    // must emit the chunk_coord_rectd_<n>_<digest> spelling
    val sizes = (0 until 80).map(i => 1L + (i % 3)) // 1,2,3,1,2,3,...
    val n = sizes.sum
    assert(sizes.size > graft.sources.GraftScan.RectSpjMaxChunksPerDim)
    s.addArrayRectilinear("/ba", Seq(n), Seq(sizes),
      userData = """{"dtype":"int64"}""")
    s.addArrayRectilinear("/bb", Seq(n), Seq(sizes),
      userData = """{"dtype":"int64"}""")
    // same chunk COUNT, different table -> digests differ -> shuffle
    val other = (0 until 80).map(i => 1L + ((i + 1) % 3))
    s.addArrayRectilinear("/bc", Seq(other.sum), Seq(other),
      userData = """{"dtype":"int64"}""")
    val df = spark.range(n).select(
      col("id").as("i0"), col("id").as("value"))
    graft.tensor.TensorPlane.writeValues(s, "/ba", df, "int64")
    graft.tensor.TensorPlane.writeValues(s, "/bb",
      df.withColumn("value", col("value") * 7), "int64")
    graft.tensor.TensorPlane.writeValues(s, "/bc",
      df.withColumn("value", col("value") * 7), "int64")
    s.commit("big rect spj")
    val cat = "gspjb" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    withSpj {
      val j = spark.sql(
        s"""SELECT sum(abs(a.value - b.value)) AS d, count(*) AS n
           |FROM $cat.ba a JOIN $cat.bb b ON a.i0 = b.i0""".stripMargin)
      val plan = j.queryExecution.executedPlan.toString
      assert(shuffles(j) == 0, plan.take(3000))
      // the wide table really took the digest spelling, and the catalog
      // resolves that name back to a function over the same table
      val dn = graft.sources.ChunkCoordFunction.rectNameFor(sizes)
      assert(dn.startsWith("chunk_coord_rectd_80_"), dn)
      val fn = new graft.sources.GraftCatalog().loadFunction(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array.empty, dn))
      assert(fn.name() == dn)
      val r = j.head()
      assert(r.getLong(1) == n)
      assert(r.getLong(0) == (0L until n).map(id => 6L * id).sum)
      // same length, different table: digest names differ -> shuffle,
      // still correct
      val m = spark.sql(
        s"""SELECT sum(a.value + c.value) AS s
           |FROM $cat.ba a JOIN $cat.bc c ON a.i0 = c.i0""".stripMargin)
      assert(shuffles(m) > 0)
      val expectN = math.min(n, other.sum)
      assert(m.head().getLong(0) ==
        (0L until expectN).map(id => id + id * 7L).sum)
    }
  }

  test("grid beyond SpjMaxPartitions coarsens to a supergrid and still joins shuffle-free") {
    val dir = tmpDir("spjsuper")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 2000))))
    val s = repo.writableSession("main")
    // 9000 chunks of 2 cells: past the 8192 keyed-partition cap, so the
    // scan must coarsen (g = 2 -> 4500 supercells) instead of falling
    // back to a shuffled join
    val n = 18000L
    assert(n / 2 > graft.sources.GraftScan.SpjMaxPartitions)
    s.addArray("/sa", Seq(n), Seq(2), userData = """{"dtype":"int64"}""")
    s.addArray("/sb", Seq(n), Seq(2), userData = """{"dtype":"int64"}""")
    val df = spark.range(n).select(col("id").as("i0"),
      (col("id") % 101).as("value"))
    graft.tensor.TensorPlane.writeValues(s, "/sa", df, "int64")
    graft.tensor.TensorPlane.writeValues(s, "/sb",
      df.withColumn("value", col("value") * 5), "int64")
    s.commit("supergrid")
    val cat = "gspjs" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    withSpj {
      val j = spark.sql(
        s"""SELECT sum(b.value - a.value) AS d, count(*) AS cnt
           |FROM $cat.sa a JOIN $cat.sb b ON a.i0 = b.i0""".stripMargin)
      assert(shuffles(j) == 0,
        j.queryExecution.executedPlan.toString.take(3000))
      // keyed partitions = supercells (4500 here), within the cap
      val parts = spark.table(s"$cat.sa").rdd.getNumPartitions
      assert(parts <= graft.sources.GraftScan.SpjMaxPartitions &&
        parts > 0, parts)
      val r = j.head()
      assert(r.getLong(1) == n)
      assert(r.getLong(0) == (0L until n).map(i => 4L * (i % 101)).sum)
      // a slice of one side still joins correctly (absolute supercell
      // keys survive pushed bounds)
      val sliced = spark.sql(
        s"""SELECT count(*) AS cnt
           |FROM $cat.sa a JOIN $cat.sb b ON a.i0 = b.i0
           |WHERE a.i0 >= 9001 AND a.i0 < 12345""".stripMargin)
      assert(sliced.head().getLong(0) == 12345L - 9001L)
    }
  }

  test("million-chunk grid: supergrid SPJ plans shuffle-free in bounded time") {
    // the 100 TB shape: ~10^6 chunk refs across 100 split manifests.
    // Metadata-only — refs are virtual (no payloads exist), and the test
    // never executes the join; it asserts the PLAN (zero exchanges,
    // <= SpjMaxPartitions keyed partitions) and the planning wall time.
    val dir = tmpDir("spjmillion")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 10000))))
    val s = repo.writableSession("main")
    val nChunks = 1000000L
    s.addArray("/ma", Seq(nChunks * 2), Seq(2),
      userData = """{"dtype":"int64"}""")
    s.addArray("/mb", Seq(nChunks * 2), Seq(2),
      userData = """{"dtype":"int64"}""")
    def refs = spark.range(nChunks).select(
      org.apache.spark.sql.functions.array(col("id").cast("int"))
        .as("coord"),
      org.apache.spark.sql.functions.lit("virtual").as("kind"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("file:///ext/p-"),
        col("id") % 1000).as("location"),
      (col("id") * 8000).as("offset"),
      org.apache.spark.sql.functions.lit(8000L).as("length"))
    s.stageChunkRefs("/ma", refs)
    s.stageChunkRefs("/mb", refs)
    s.commit("million refs")
    val cat = "gspjm" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    withSpj {
      val t0 = System.nanoTime()
      val j = spark.sql(
        s"""SELECT count(*) AS n FROM $cat.ma a JOIN $cat.mb b
           |ON a.i0 = b.i0""".stripMargin)
      assert(shuffles(j) == 0,
        j.queryExecution.executedPlan.toString.take(3000))
      val parts = spark.table(s"$cat.ma").rdd.getNumPartitions
      val planSec = (System.nanoTime() - t0) / 1e9
      assert(parts <= graft.sources.GraftScan.SpjMaxPartitions &&
        parts > 0, parts)
      // bounded planning: enumeration is manifests x intersected cells
      // (workCap'd), never per-chunk — a per-chunk path would take
      // minutes here. 60 s is weather headroom; typical is ~2 s.
      assert(planSec < 60.0, f"supergrid planning took $planSec%.1f s")
      System.err.println(
        f"[spec] million-chunk SPJ planning: $planSec%.2f s, $parts parts")
    }
  }

  test("work-cap bail: planning past spark.graft.spj.workCap falls back " +
      "to the shuffled plan, still correct") {
    val dir = tmpDir("spjbail")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 2000))))
    val s = repo.writableSession("main")
    val n = 18000L // 9000 chunks -> coarsens to 4500 cells normally
    s.addArray("/ba", Seq(n), Seq(2), userData = """{"dtype":"int64"}""")
    s.addArray("/bb", Seq(n), Seq(2), userData = """{"dtype":"int64"}""")
    val df = spark.range(n).select(col("id").as("i0"),
      (col("id") % 13).as("value"))
    graft.tensor.TensorPlane.writeValues(s, "/ba", df, "int64")
    graft.tensor.TensorPlane.writeValues(s, "/bb",
      df.withColumn("value", col("value") + 1), "int64")
    s.commit("bail fixture")
    val cat = "gspjb" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    withSpj {
      spark.conf.set("spark.graft.spj.workCap", "10")
      try {
        val j = spark.sql(
          s"""SELECT sum(b.value - a.value) AS d, count(*) AS cnt
             |FROM $cat.ba a JOIN $cat.bb b ON a.i0 = b.i0""".stripMargin)
        // enumeration (4500+ cell intersections) exceeds the 10-unit cap
        // -> spjInfo bails -> no keyed partitioning -> shuffled join
        assert(shuffles(j) > 0,
          j.queryExecution.executedPlan.toString.take(3000))
        val r = j.head()
        assert(r.getLong(1) == n && r.getLong(0) == n) // +1 per row
      } finally spark.conf.unset("spark.graft.spj.workCap")
    }
  }

  test("row-level UPDATE composes with supergrid coarsening (runtime ords -> cell pruning)") {
    val dir = tmpDir("spjsuperupd")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 2000))))
    val s = repo.writableSession("main")
    val n = 18000L // 9000 chunks of 2 -> coarsened (g = 2)
    s.addArray("/ua", Seq(n), Seq(2), userData = """{"dtype":"int64"}""")
    graft.tensor.TensorPlane.writeValues(s, "/ua",
      spark.range(n).select(col("id").as("i0"), col("id").as("value")),
      "int64")
    s.commit("update target")
    val cat = "gspju" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    withSpj {
      // the runtime group filter delivers CHUNK ordinals; the coarsened
      // scan must map them to supergrid cells, prune to the touched
      // cells, and still skip non-matching chunks inside a kept cell
      spark.sql(s"UPDATE $cat.ua SET value = value + 1000000 " +
        "WHERE i0 >= 100 AND i0 < 104")
      val t = spark.table(s"$cat.ua")
      assert(t.filter(col("i0") >= 100 && col("i0") < 104 &&
        col("value") =!= col("i0") + 1000000L).count() == 0)
      assert(t.filter((col("i0") < 100 || col("i0") >= 104) &&
        col("value") =!= col("i0")).count() == 0)
      assert(t.count() == n)
    }
  }

  test("rect grid beyond the cap composes coarsening with the digest transform") {
    val dir = tmpDir("spjsuperrect")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 2000))))
    val s = repo.writableSession("main")
    // 9000 rect chunks (1,2,3,1,2,3,... cells): past the cap, so the
    // scan coarsens (g = 2) AND the coarsened 4500-entry table rides
    // the digest spelling
    val sizes = (0 until 9000).map(i => 1L + i % 3)
    val n = sizes.sum
    s.addArrayRectilinear("/ra", Seq(n), Seq(sizes),
      userData = """{"dtype":"int64"}""")
    s.addArrayRectilinear("/rb", Seq(n), Seq(sizes),
      userData = """{"dtype":"int64"}""")
    val df = spark.range(n).select(col("id").as("i0"),
      (col("id") % 89).as("value"))
    graft.tensor.TensorPlane.writeValues(s, "/ra", df, "int64")
    graft.tensor.TensorPlane.writeValues(s, "/rb",
      df.withColumn("value", col("value") * 3), "int64")
    s.commit("super rect")
    val cat = "gspjsr" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    withSpj {
      val j = spark.sql(
        s"""SELECT sum(b.value - a.value) AS d, count(*) AS cnt
           |FROM $cat.ra a JOIN $cat.rb b ON a.i0 = b.i0""".stripMargin)
      assert(shuffles(j) == 0,
        j.queryExecution.executedPlan.toString.take(3000))
      val parts = spark.table(s"$cat.ra").rdd.getNumPartitions
      assert(parts <= graft.sources.GraftScan.SpjMaxPartitions &&
        parts > 0, parts)
      val r = j.head()
      assert(r.getLong(1) == n)
      assert(r.getLong(0) == (0L until n).map(i => 2L * (i % 89)).sum)
    }
  }

  test("mismatched chunk grids fall back to a shuffle join, still correct") {
    val (cat, _) = setup()
    withSpj {
      val df = spark.sql(
        s"""SELECT sum(a.value + c.value) AS s
           |FROM $cat.a a JOIN $cat.c c
           |ON a.i0 = c.i0 AND a.i1 = c.i1""".stripMargin)
      assert(shuffles(df) > 0)
      assert(df.head().getLong(0) == (0 until 80).map(id => id + id * 7L).sum)
    }
  }

  test("bucketing off keeps the old plans (no keyed partitions)") {
    val (cat, _) = setup()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.sql(
        s"""SELECT count(*) AS n FROM $cat.a a JOIN $cat.b b
           |ON a.i0 = b.i0 AND a.i1 = b.i1""".stripMargin)
      assert(shuffles(df) > 0)
      assert(df.head().getLong(0) == 80L)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("snapshot-vs-snapshot value diff via time travel joins shuffle-free") {
    val (cat, dir) = setup()
    // tag the current state, then overwrite one chunk's worth of cells
    val repo = Repository.open(Store.local(dir), spark)
    repo.createTag("v1", repo.resolveVersion(VersionRef.Branch("main")))
    spark.sql(s"UPDATE $cat.a SET value = value + 1000 " +
      "WHERE i0 >= 4 AND i1 >= 5")
    withSpj {
      val df = spark.sql(
        s"""SELECT count(*) AS changed
           |FROM $cat.a cur JOIN $cat.a VERSION AS OF 'v1' old
           |ON cur.i0 = old.i0 AND cur.i1 = old.i1
           |WHERE cur.value <> old.value""".stripMargin)
      assert(shuffles(df) == 0,
        df.queryExecution.executedPlan.toString.take(3000))
      assert(df.head().getLong(0) == 20L) // one 4x5 chunk rewritten
    }
  }

  test("SPJ composes with slice bounds and runtime-pruned scans") {
    val (cat, _) = setup()
    withSpj {
      // slice both sides to the same chunk rows; keys stay aligned
      val df = spark.sql(
        s"""SELECT sum(a.value - b.value) AS d, count(*) AS n
           |FROM $cat.a a JOIN $cat.b b
           |ON a.i0 = b.i0 AND a.i1 = b.i1
           |WHERE a.i0 >= 4 AND b.i0 >= 4""".stripMargin)
      val r = df.head()
      val ids = (0 until 80).filter(_ / 10 >= 4)
      assert(r.getLong(1) == ids.length.toLong)
      assert(r.getLong(0) == ids.map(id => id - id * 7L).sum)
    }
  }
}
