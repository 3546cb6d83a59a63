package graft

import graft.repo._
import graft.storage.Store

/** SQL UPDATE / MERGE INTO over values tables: group-based (copy-on-
  * write) row-level operations where the GROUP is the CHUNK. Spark's
  * runtime group filter computes the affected `_chunk_ord` set; only
  * those chunks are re-read and rewritten, everything else is untouched
  * — and the untouched chunks keep their exact chunk objects (verified
  * by chunk_id identity, not just values).
  */
class RowLevelOpsSpec extends SparkTestBase {

  private def setup(): (String, Repository, String) = {
    val dir = tmpDir("rlrepo")
    val repo = Repository.create(Store.local(dir), spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 100))))
    val s = repo.writableSession("main")
    // 8x10 array, 4x5 chunks -> 4 chunks in a 2x2 grid
    s.addArray("/climate/temp", Seq(8, 10), Seq(4, 5),
      userData = """{"dtype":"int64"}""")
    s.commit("init")
    val cat = "grl" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    spark.sql(s"INSERT INTO $cat.climate.temp " +
      "SELECT id div 10 AS i0, id % 10 AS i1, id AS value FROM range(80)")
    (cat, repo, dir)
  }

  private def chunkIds(repo: Repository): Map[Seq[Int], String] = {
    import org.apache.spark.sql.functions.col
    repo.readonlySession(VersionRef.Branch("main")).refs("/climate/temp")
      .select(col("coord"), col("chunk_id")).collect()
      .map(r => (r.getSeq[Int](0), r.getString(1))).toMap
  }

  test("UPDATE rewrites only the chunks holding matching rows") {
    val (cat, repo, dir) = setup()
    val before = chunkIds(repo)
    assert(before.size == 4)

    // matches cells only inside chunk (1, 1)
    spark.sql(s"UPDATE $cat.climate.temp SET value = value + 1000 " +
      "WHERE i0 >= 4 AND i1 >= 5")

    val r = spark.sql(s"SELECT sum(value) AS s FROM $cat.climate.temp").head()
    val expected = (0 until 80).map(id =>
      if (id / 10 >= 4 && id % 10 >= 5) id + 1000L else id.toLong).sum
    assert(r.getLong(0) == expected)

    // copy-on-write at CHUNK granularity: 3 chunks keep their exact
    // object, only (1,1) got a new one
    val after = chunkIds(repo)
    assert(after.size == 4)
    val changed = before.keySet.filter(k => before(k) != after(k))
    assert(changed == Set(Seq(1, 1)), s"changed=$changed")

    // the previous snapshot still reads the old values (commit-per-op)
    val anc = repo.ancestry(VersionRef.Branch("main"))
    val prev = anc(1).id
    val old = spark.read.format("graft-v2")
      .option("path", dir)
      .option("array", "/climate/temp").option("mode", "values")
      .option("dtype", "int64").option("version", s"snapshot:$prev").load()
    assert(old.agg(org.apache.spark.sql.functions.sum("value")).head()
      .getLong(0) == (0 until 80).sum.toLong)
  }

  test("UPDATE with a value-only predicate group-filters on _chunk_ord") {
    val (cat, repo, _) = setup()
    val before = chunkIds(repo)

    // value 7 lives at (0, 7) -> chunk (0, 1) only; no index bounds, so
    // pruning can come only from the runtime group filter
    spark.sql(s"UPDATE $cat.climate.temp SET value = -7 WHERE value = 7")

    assert(spark.sql(
      s"SELECT sum(value) AS s FROM $cat.climate.temp").head()
      .getLong(0) == (0 until 80).sum - 14L)
    val after = chunkIds(repo)
    val changed = before.keySet.filter(k => before(k) != after(k))
    assert(changed == Set(Seq(0, 1)), s"changed=$changed")
  }

  test("MERGE INTO: matched update + unmatched insert into a free chunk") {
    val (cat, repo, _) = setup()
    val s = repo.writableSession("main")
    // grow to 12x10: chunks (2,0) and (2,1) exist in the grid but hold
    // no data yet -> legal insert targets
    s.updateArray("/climate/temp", Seq(12, 10), Seq(4, 5))
    s.commit("grow")

    spark.sql(s"""MERGE INTO $cat.climate.temp t
      |USING (SELECT 0L AS i0, 0L AS i1, 111L AS v
      |       UNION ALL SELECT 9L, 3L, 222L) s
      |ON t.i0 = s.i0 AND t.i1 = s.i1
      |WHEN MATCHED THEN UPDATE SET value = s.v""".stripMargin)
    // (0,0) existed -> updated; (9,3) is outside any existing chunk's
    // data -> unmatched, no insert clause, ignored
    val sum1 = spark.sql(s"SELECT sum(value) FROM $cat.climate.temp")
      .head().getLong(0)
    assert(sum1 == (0 until 80).sum.toLong + 111L)

    spark.sql(s"""MERGE INTO $cat.climate.temp t
      |USING (SELECT 9L AS i0, 3L AS i1, 500L AS v) s
      |ON t.i0 = s.i0 AND t.i1 = s.i1
      |WHEN MATCHED THEN UPDATE SET value = s.v
      |WHEN NOT MATCHED THEN INSERT (i0, i1, value) VALUES (s.i0, s.i1, s.v)
      |""".stripMargin)
    val r = spark.sql(s"SELECT sum(value) AS s, count(*) AS n " +
      s"FROM $cat.climate.temp").head()
    // the insert materialized chunk (2,0): its other 19 cells read as
    // fill (0), so count grows by a whole chunk
    assert(r.getLong(1) == 100L, s"count=${r.getLong(1)}")
    assert(r.getLong(0) == (0 until 80).sum.toLong + 111L + 500L)
  }

  test("MERGE insert aimed at an existing unscanned chunk is refused") {
    val (cat, _, _) = setup()
    // ON can never match (value predicate excludes), so (0,0) -> NOT
    // MATCHED -> INSERT into chunk (0,0), which EXISTS but was not
    // scanned: rewriting it from one row would zero 39 cells
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO $cat.climate.temp t
        |USING (SELECT 0L AS i0, 0L AS i1, 999L AS v) s
        |ON t.i0 = s.i0 AND t.i1 = s.i1 AND t.value = -12345
        |WHEN MATCHED THEN UPDATE SET value = s.v
        |WHEN NOT MATCHED THEN INSERT (i0, i1, value)
        |  VALUES (s.i0, s.i1, s.v)""".stripMargin)
    }
    def kinds(t: Throwable): Seq[String] = Option(t).toSeq.flatMap {
      case g: graft.repo.GraftException => g.kind +: kinds(t.getCause)
      case other => kinds(other.getCause)
    }
    assert(kinds(e).contains(graft.repo.GraftError.WriteNotClustered),
      s"unexpected failure: $e")
  }

  test("row-level DELETE is refused; chunk-aligned DELETE still works") {
    val (cat, repo, _) = setup()
    // unaligned: would need cell-level deletion -> refused with a clear
    // kind (not silently zero-filled)
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM $cat.climate.temp WHERE value = 3")
    }
    def kinds(t: Throwable): Seq[String] = Option(t).toSeq.flatMap {
      case g: graft.repo.GraftException => g.kind +: kinds(t.getCause)
      case other => kinds(other.getCause)
    }
    assert(kinds(e).contains(graft.repo.GraftError.Unsupported),
      s"unexpected failure: $e")

    // chunk-aligned: metadata delete path (SupportsDelete) unaffected
    spark.sql(s"DELETE FROM $cat.climate.temp WHERE i0 >= 4")
    assert(spark.sql(s"SELECT count(*) FROM $cat.climate.temp").head()
      .getLong(0) == 40L)
    assert(chunkIds(repo).keySet == Set(Seq(0, 0), Seq(0, 1)))
  }

  test("concurrent UPDATEs on disjoint chunks both land via rebase") {
    val (cat, repo, _) = setup()
    val latch = new java.util.concurrent.CountDownLatch(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def updater(cond: String, delta: Long): Thread = {
      val t = new Thread(() => {
        try {
          latch.countDown(); latch.await()
          spark.sql(s"UPDATE $cat.climate.temp " +
            s"SET value = value + $delta WHERE $cond")
        } catch { case e: Throwable => errs.add(e) }
      })
      t.start(); t
    }
    // chunk (0,0) vs chunk (1,1): disjoint edits — the loser of the CAS
    // race must rebase its staged chunk over the winner's snapshot
    val a = updater("i0 < 4 AND i1 < 5", 1000)
    val b = updater("i0 >= 4 AND i1 >= 5", 2000)
    a.join(60000); b.join(60000)
    assert(errs.isEmpty, errs.toArray.mkString(";"))
    val r = spark.sql(s"SELECT sum(value) FROM $cat.climate.temp").head()
    val expected = (0 until 80).map { id =>
      val (i0, i1) = (id / 10, id % 10)
      if (i0 < 4 && i1 < 5) id + 1000L
      else if (i0 >= 4 && i1 >= 5) id + 2000L
      else id.toLong
    }.sum
    assert(r.getLong(0) == expected)
    // two commits on top of the insert — nothing was lost or collapsed
    assert(repo.ancestry(VersionRef.Branch("main"))
      .count(_.message.startsWith("v2 values write")) >= 3)
  }

  test("_chunk_ord is a queryable metadata column") {
    val (cat, _, _) = setup()
    val rows = spark.sql(s"SELECT _chunk_ord, count(*) AS n " +
      s"FROM $cat.climate.temp GROUP BY 1 ORDER BY 1").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.forall(_.getLong(1) == 20L))
  }
}
