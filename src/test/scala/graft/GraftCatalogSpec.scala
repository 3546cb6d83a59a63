package graft

import graft.repo._
import graft.storage.Store
import org.apache.spark.sql.functions.col

/** The SQL catalog surface: arrays as tables, groups as namespaces, DDL
  * as commits, and the FunctionCatalog-backed chunk_coord transform that
  * gives catalog-routed INSERTs a chunk-clustered write distribution.
  */
class GraftCatalogSpec extends SparkTestBase {

  test("catalog: SQL reads, DDL commits, chunk-clustered INSERT") {
    val dir = tmpDir("repo")
    val store = Store.local(dir)
    val repo = Repository.create(store, spark,
      GraftConfig(splits = Seq(SplitRule(".*", 0, 4))))
    val s = repo.writableSession("main")
    s.addArray("/climate/temp", Seq(8, 10), Seq(4, 5),
      userData = """{"dtype":"float64"}""")
    s.commit("init")

    val cat = "gcat" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)

    // INSERT INTO routes through the catalog -> FunctionCatalog present ->
    // the write clusters on chunk_coord (whole chunks per task, no
    // boundary-leftover merge job)
    spark.sql(s"INSERT INTO $cat.climate.temp " +
      "SELECT id div 10 AS i0, id % 10 AS i1, CAST(id AS DOUBLE) AS value " +
      "FROM range(80)")
    val r = spark.sql(
      s"SELECT sum(value) AS s, count(*) AS n FROM $cat.climate.temp").head()
    assert(r.getLong(1) == 80L)
    assert(r.getDouble(0) == (0 until 80).sum.toDouble)
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/climate/temp").count() == 4) // one object per grid cell
    assert(store.list("staging/").isEmpty)

    // dtype comes from the node's userData — predicate pushdown intact
    val sliced = spark.sql(
      s"SELECT sum(value) FROM $cat.climate.temp WHERE i0 < 4").head()
    assert(sliced.getDouble(0) == (0 until 40).sum.toDouble)

    // SHOW TABLES sees arrays as tables of the group namespace
    val tables = spark.sql(s"SHOW TABLES IN $cat.climate").collect()
      .map(_.getString(1))
    assert(tables.contains("temp"), tables.mkString(","))

    // CREATE TABLE = addArray + commit; INSERT + read back
    spark.sql(s"CREATE TABLE $cat.climate.t2 (i0 BIGINT, value BIGINT) " +
      "TBLPROPERTIES('shape'='12','chunk_shape'='4')")
    spark.sql(s"INSERT INTO $cat.climate.t2 SELECT id, id * 2 FROM range(12)")
    assert(spark.sql(s"SELECT sum(value) FROM $cat.climate.t2").head()
      .getLong(0) == 132L)

    // RENAME = graft move; DROP = deleteNode; each one commit
    spark.sql(s"ALTER TABLE $cat.climate.t2 RENAME TO climate.t3")
    assert(spark.sql(s"SELECT count(*) FROM $cat.climate.t3").head()
      .getLong(0) == 12L)
    spark.sql(s"DROP TABLE $cat.climate.t3")
    val ro2 = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro2.node("/climate/t3").isEmpty)
    // the DDL trail is ordinary commits (time travel covers DDL too)
    val msgs = repo.ancestry(VersionRef.Branch("main")).map(_.message)
    assert(msgs.exists(_.startsWith("create table")))
    assert(msgs.exists(_.startsWith("drop table")))
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF " +
      "(readonly_session branch/tag/snapshot_id/as_of analog)") {
    val dir = tmpDir("ttrepo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    s.addArray("/t", Seq(8), Seq(4), userData = """{"dtype":"int64"}""")
    s.commit("init")

    val cat = "gtt" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)

    spark.sql(s"INSERT INTO $cat.t SELECT id AS i0, id AS value FROM range(8)")
    val snap1 = repo.resolveVersion(VersionRef.Branch("main"))
    repo.createTag("v1", snap1)
    Thread.sleep(25) // commits straddle tMid by a visible margin
    val tMid = java.time.Instant.now()
    Thread.sleep(25)
    spark.sql(
      s"INSERT INTO $cat.t SELECT id AS i0, id * 10 AS value FROM range(8)")

    val now = spark.sql(s"SELECT sum(value) FROM $cat.t").head().getLong(0)
    assert(now == (0 until 8).map(_ * 10).sum)
    // snapshot id, tag name, and branch name all resolve via VERSION AS OF
    for (v <- Seq(snap1, "v1", s"tag:v1", s"snapshot:$snap1")) {
      val old = spark.sql(
        s"SELECT sum(value) FROM $cat.t VERSION AS OF '$v'").head().getLong(0)
      assert(old == (0 until 8).sum, s"VERSION AS OF '$v'")
    }
    assert(spark.sql(s"SELECT sum(value) FROM $cat.t VERSION AS OF 'main'")
      .head().getLong(0) == now)
    // TIMESTAMP AS OF between the two commits sees the first state
    val oldTs = spark.sql(s"SELECT sum(value) FROM $cat.t " +
      s"TIMESTAMP AS OF '$tMid'").head().getLong(0)
    assert(oldTs == (0 until 8).sum)
    // a timestamp before the repo existed is an error, matching the
    // reference's InvalidAsOfSpec (repository.rs:1794-1799)
    val err = intercept[Exception] {
      spark.sql(s"SELECT sum(value) FROM $cat.t " +
        "TIMESTAMP AS OF '1999-01-01 00:00:00'").head()
    }
    val errChain = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
    assert(errChain.exists(_.contains("no snapshot at or before")))

    // provider route: the asof:<branch>@<instant> version option
    val viaProvider = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/t")
      .option("mode", "values").option("dtype", "int64")
      .option("version", s"asof:main@$tMid").load()
      .agg(org.apache.spark.sql.functions.sum("value")).head().getLong(0)
    assert(viaProvider == (0 until 8).sum)
    // same, with the epoch-millis spelling of the instant
    val viaMillis = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/t")
      .option("mode", "values").option("dtype", "int64")
      .option("version", s"asof:main@${tMid.toEpochMilli}").load()
      .agg(org.apache.spark.sql.functions.sum("value")).head().getLong(0)
    assert(viaMillis == (0 until 8).sum)
  }

  test("metadata tables: snapshots / branches / tags / ops local scans, " +
      "array refs as a distributed relation") {
    val dir = tmpDir("metarepo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    s.addArray("/g/a", Seq(8), Seq(4), userData = """{"dtype":"int64"}""")
    s.commit("init array")
    val snap = repo.resolveVersion(VersionRef.Branch("main"))
    repo.createTag("rel", snap)
    repo.createBranch("dev", snap)

    val cat = "gmeta" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    spark.sql(s"INSERT INTO $cat.g.a " +
      "SELECT id AS i0, id * 7 AS value FROM range(8)")

    // snapshots: ancestry newest-first; LocalScan reflects current state
    val snaps = spark.sql(
      s"SELECT snapshot_id, message FROM $cat.snapshots").collect()
    assert(snaps.length >= 3) // repo init + array init + insert
    assert(snaps.exists(_.getString(1) == "init array"))
    // plain SQL over the relation works (filter/agg on the local rows)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.snapshots " +
      "WHERE message = 'init array'").head().getLong(0) == 1)

    val branches = spark.sql(s"SELECT name FROM $cat.branches").collect()
      .map(_.getString(0)).toSet
    assert(branches == Set("main", "dev"))
    val tags = spark.sql(
      s"SELECT name, snapshot_id FROM $cat.tags").collect()
    assert(tags.map(_.getString(0)).toSeq == Seq("rel"))
    assert(tags.head.getString(1) == snap)
    assert(spark.sql(s"SELECT op FROM $cat.ops").collect()
      .map(_.getString(0)).contains("create_tag"))

    // array-level refs: the chunk-ref relation as a DSv2 scan
    val refs = spark.sql(
      s"SELECT count(*) AS n FROM $cat.g.a.refs").head().getLong(0)
    assert(refs == 2) // 8 cells / 4-cell chunks

    // per-shard manifest stats (the fragmentation / pruning view)
    val man = spark.sql(s"SELECT split, num_refs, size_bytes, " +
      s"extent_min, extent_max FROM $cat.g.a.manifests").collect()
    assert(man.map(_.getLong(1)).sum == 2) // both chunk refs accounted
    assert(man.forall(_.getLong(2) > 0))
    assert(man.map(_.getString(3)).min == "0")

    // the refs table resolves existence at the REQUESTED version: the
    // array stays readable under VERSION AS OF after a DROP at the tip
    val preDrop = repo.resolveVersion(VersionRef.Branch("main"))
    spark.sql(s"DROP TABLE $cat.g.a")
    assert(spark.sql(s"SELECT count(*) FROM $cat.g.a.refs " +
      s"VERSION AS OF '$preDrop'").head().getLong(0) == 2)
    val gone = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM $cat.g.a.refs").collect()
    }
    assert(gone.getMessage.toLowerCase.contains("table"))

    // a real array shadows nothing: unknown names still error
    val nope = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.nosuch").collect()
    }
    assert(nope.getMessage.toLowerCase.contains("table"))
  }

  test("SQL DELETE tombstones chunk-aligned ranges; TRUNCATE clears; " +
      "mid-chunk predicates are refused") {
    val dir = tmpDir("delrepo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    s.addArray("/t", Seq(16), Seq(4), userData = """{"dtype":"int64"}""")
    s.commit("init")
    val cat = "gdel" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    spark.sql(s"INSERT INTO $cat.t SELECT id AS i0, id AS value FROM range(16)")

    // [0, 8) covers chunks 0-1 exactly -> metadata delete, one commit
    spark.sql(s"DELETE FROM $cat.t WHERE i0 < 8")
    val left = spark.sql(
      s"SELECT count(*) AS n, sum(value) AS s FROM $cat.t").head()
    assert(left.getLong(0) == 8)
    assert(left.getLong(1) == (8 until 16).sum)
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/t").count() == 2) // chunks 2,3 survive

    // mid-chunk cut: refused (the engine does not silently rewrite)
    val err = intercept[Exception] {
      spark.sql(s"DELETE FROM $cat.t WHERE i0 >= 10")
    }
    assert(err.getMessage.toLowerCase.contains("delete"), err.getMessage)

    // aligned range via two bounds; also an empty region is a no-op
    spark.sql(s"DELETE FROM $cat.t WHERE i0 >= 8 AND i0 < 12")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 4)
    spark.sql(s"DELETE FROM $cat.t WHERE i0 >= 12 AND i0 < 12")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 4)

    // TRUNCATE TABLE = delete-all (SupportsDelete.truncateTable default)
    spark.sql(s"TRUNCATE TABLE $cat.t")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 0)
    val ro2 = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro2.refs("/t").count() == 0)
    // history preserved: time travel still sees the pre-delete state
    val full = repo.ancestry(VersionRef.Branch("main"))
      .find(_.message.startsWith("v2 values write")).get.id
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.t VERSION AS OF '$full'")
      .head().getLong(0) == 16)
  }

  test("CREATE TABLE AS SELECT: one DDL commit + clustered write") {
    val dir = tmpDir("ctasrepo")
    Repository.create(Store.local(dir), spark)
    val cat = "gctas" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)

    spark.sql(s"""CREATE TABLE $cat.ct
      |TBLPROPERTIES('shape'='24','chunk_shape'='8')
      |AS SELECT id AS i0, id * 3 AS value FROM range(24)""".stripMargin)
    val r = spark.sql(s"SELECT sum(value) AS s, count(*) AS n FROM $cat.ct")
      .head()
    assert(r.getLong(1) == 24L)
    assert(r.getLong(0) == (0 until 24).map(_ * 3).sum.toLong)
    // REPLACE TABLE AS SELECT overwrites in place
    spark.sql(s"""REPLACE TABLE $cat.ct
      |TBLPROPERTIES('shape'='24','chunk_shape'='8')
      |AS SELECT id AS i0, id AS value FROM range(24)""".stripMargin)
    assert(spark.sql(s"SELECT sum(value) FROM $cat.ct").head()
      .getLong(0) == (0 until 24).sum.toLong)
  }

  test("namespaces: CREATE / SHOW / DROP NAMESPACE are group commits") {
    val dir = tmpDir("nsrepo")
    val repo = Repository.create(Store.local(dir), spark)
    val cat = "gns" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)

    spark.sql(s"CREATE NAMESPACE $cat.climate.eu")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.node("/climate").exists(n => !n.isArray))
    assert(ro.node("/climate/eu").exists(n => !n.isArray))
    assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).contains("climate"))
    assert(spark.sql(s"SHOW NAMESPACES IN $cat.climate").collect()
      .map(_.getString(0)).contains("climate.eu"))

    // a populated namespace refuses a bare DROP, cascades on request
    spark.sql(s"CREATE TABLE $cat.climate.eu.t (i0 BIGINT, value BIGINT) " +
      "TBLPROPERTIES('shape'='8','chunk_shape'='4')")
    intercept[Exception] {
      spark.sql(s"DROP NAMESPACE $cat.climate.eu")
    }
    spark.sql(s"DROP NAMESPACE $cat.climate.eu CASCADE")
    val ro2 = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro2.node("/climate/eu").isEmpty)
    assert(ro2.node("/climate/eu/t").isEmpty)
    assert(ro2.node("/climate").isDefined) // parent untouched
    // each namespace op is an ordinary commit in the history
    val msgs = repo.ancestry(VersionRef.Branch("main")).map(_.message)
    assert(msgs.exists(_.startsWith("create namespace")))
    assert(msgs.exists(_.startsWith("drop namespace")))

    // WITH PROPERTIES lands in the group's userData and reads back
    spark.sql(s"CREATE NAMESPACE $cat.tagged WITH PROPERTIES('team'='x')")
    val ro3 = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro3.node("/tagged").exists(_.userData.contains("\"team\"")))

    // arrays are leaves: namespaces can neither collide with nor nest
    // under an array
    spark.sql(s"CREATE TABLE $cat.arr (i0 BIGINT, value BIGINT) " +
      "TBLPROPERTIES('shape'='8','chunk_shape'='4')")
    val collide = intercept[Exception] {
      spark.sql(s"CREATE NAMESPACE $cat.arr.sub")
    }
    assert(collide.getMessage.contains("array"), collide.getMessage)
    assert(repo.readonlySession(VersionRef.Branch("main"))
      .node("/arr/sub").isEmpty)

    // SHOW TBLPROPERTIES surfaces the array geometry
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.arr").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("shape").contains("8"), props)
    assert(props.get("chunk_shape").contains("4"), props)
  }

  test("INSERT OVERWRITE replaces the table in ONE commit (tombstones + " +
      "new refs together)") {
    val dir = tmpDir("ovrrepo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    s.addArray("/t", Seq(16), Seq(4), userData = """{"dtype":"int64"}""")
    s.commit("init")
    val cat = "govr" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    spark.sql(s"INSERT INTO $cat.t SELECT id AS i0, id AS value FROM range(16)")
    val depthBefore = repo.ancestry(VersionRef.Branch("main")).size

    // new data covers chunks 0-1 only; chunks 2-3 must be tombstoned in
    // the SAME commit
    spark.sql(s"INSERT OVERWRITE $cat.t " +
      "SELECT id AS i0, id * 100 AS value FROM range(8)")
    val after = spark.sql(
      s"SELECT count(*) AS n, sum(value) AS s FROM $cat.t").head()
    assert(after.getLong(0) == 8)
    assert(after.getLong(1) == (0 until 8).map(_ * 100L).sum)
    val anc = repo.ancestry(VersionRef.Branch("main"))
    assert(anc.size == depthBefore + 1, anc.map(_.message)) // one commit
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/t").count() == 2)
    // the pre-overwrite snapshot still reads the full 16 rows
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF " +
      s"'${anc(1).id}'").head().getLong(0) == 16)

    // ALTER TABLE SET TBLPROPERTIES('shape') grows the array (update_
    // array / append_dim as DDL); the new region is writable immediately
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('shape'='24')")
    spark.sql(s"INSERT INTO $cat.t SELECT id + 16 AS i0, id AS value " +
      "FROM range(8)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 16)
    // rank-breaking grid changes are rejected before any job runs
    val bad = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('chunk_shape'='8,8')")
    }
    assert(bad.getMessage.contains("rank"), bad.getMessage)
  }

  test("catalog codec probe: adopted compressed arrays decode correctly") {
    val dir = tmpDir("gzrepo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    // a zarr-doc userData with a gzip codec — what ZarrImport adopts
    s.addArray("/z", Seq(8), Seq(4), userData =
      """{"zarr_format":3,"node_type":"array","data_type":"int64",
        |"codecs":[{"name":"bytes","configuration":{"endian":"little"}},
        |{"name":"gzip"}]}""".stripMargin)
    for (c <- 0 until 2)
      s.writeChunk("/z", Seq(c), graft.functions.ChunkCodec.compress(
        graft.functions.ChunkCodec.encodeLongs(
          Array.tabulate(4)(i => c * 4L + i), "int64"), "gzip"))
    s.commit("gz")
    val cat = "gzc" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    // without the probe this decoded gzip streams as raw ints — garbage
    val r = spark.sql(
      s"SELECT sum(value) AS s, count(*) AS n FROM $cat.z").head()
    assert(r.getLong(1) == 8 && r.getLong(0) == (0 until 8).sum)
    // ALTER TABLE chunk_shape re-encodes under the SAME codec
    spark.sql(s"ALTER TABLE $cat.z SET TBLPROPERTIES('chunk_shape'='8')")
    val r2 = spark.sql(
      s"SELECT sum(value) AS s, count(*) AS n FROM $cat.z").head()
    assert(r2.getLong(1) == 8 && r2.getLong(0) == (0 until 8).sum)
  }

  test("ALTER TABLE chunk_shape regrids through the distributed rechunk") {
    val dir = tmpDir("rchrepo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    s.addArray("/t", Seq(24), Seq(4), userData = """{"dtype":"int64"}""")
    s.commit("init")
    val cat = "grch" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    spark.sql(s"INSERT INTO $cat.t SELECT id AS i0, id * 3 AS value " +
      "FROM range(24)")
    val before = spark.sql(
      s"SELECT count(*) AS n, sum(value) AS s FROM $cat.t").head()

    // regrid 4 -> 6 cells per chunk: one DDL commit, values identical
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('chunk_shape'='6')")
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.node("/t").get.chunkShape == Seq(6L))
    assert(ro.refs("/t").count() == 4)
    val after = spark.sql(
      s"SELECT count(*) AS n, sum(value) AS s FROM $cat.t").head()
    assert(after.getLong(0) == before.getLong(0))
    assert(after.getLong(1) == before.getLong(1))
    // point reads land on the new grid
    assert(spark.sql(s"SELECT value FROM $cat.t WHERE i0 = 17").head()
      .getLong(0) == 51)
    // time travel still decodes the OLD grid
    val anc = repo.ancestry(VersionRef.Branch("main"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF " +
      s"'${anc(1).id}'").head().getLong(0) == 24)
  }

  test("stored procedures: CALL system.push / fsck / compact through SQL") {
    val dir = tmpDir("proc-repo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(8), Seq(2), userData = """{"dtype":"int64"}""")
    (0 until 4).foreach(c =>
      s.writeChunk("/a", Seq(c), Array.fill(1024)((c + 1).toByte)))
    s.commit("data")
    val cat = "pcat" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)

    // healthy repo: fsck returns zero problem rows
    assert(spark.sql(s"CALL $cat.system.fsck('main')").count() == 0)

    // push to a mirror; the summary comes back as a relation
    val mirror = tmpDir("proc-mirror")
    val sum = spark.sql(
      s"CALL $cat.system.push('main', '$mirror')").head()
    assert(sum.getAs[Long]("chunks_copied") == 4L)
    assert(Repository.open(Store.local(mirror), spark)
      .lookupBranch("main") == repo.lookupBranch("main"))
    // named-argument re-push: zero new chunks
    val again = spark.sql(
      s"CALL $cat.system.push(ref => 'main', dst => '$mirror')").head()
    assert(again.getAs[Long]("chunks_copied") == 0L)

    // compact returns the new snapshot id and advances the branch
    val cid = spark.sql(s"CALL $cat.system.compact()").head().getString(0)
    assert(repo.lookupBranch("main").contains(cid))

    // merge: fork, write on the branch, CALL merge folds it into main,
    // and cat.snapshots exposes the second-parent link
    repo.createBranch("feature", cid)
    val f = repo.writableSession("feature")
    f.writeChunk("/a", Seq(1), Array.fill(1024)(9.toByte))
    val featTip = f.commit("feature work")
    val m = repo.writableSession("main")
    m.writeChunk("/a", Seq(3), Array.fill(1024)(8.toByte))
    m.commit("main work")
    val mergedId = spark.sql(
      s"CALL $cat.system.merge('feature', 'main')").head().getString(0)
    assert(repo.lookupBranch("main").contains(mergedId))
    val mrow = spark.sql(s"SELECT merged_from FROM $cat.snapshots " +
      s"WHERE snapshot_id = '$mergedId'").head()
    assert(mrow.getString(0) == featTip)
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.getChunk("/a", Seq(1)).get.head == 9.toByte)
    assert(ro.getChunk("/a", Seq(3)).get.head == 8.toByte)

    // inspect (#2216 analog): one row per metadata artifact of the
    // resolved version — pointer tip, snapshot doc, tx log, manifests
    val insp = spark.sql(s"CALL $cat.system.inspect('main')").collect()
    val kinds = insp.map(_.getString(0))
    assert(kinds.count(_ == "pointer") == 1)
    assert(kinds.count(_ == "snapshot") == 1)
    assert(kinds.contains("transaction") && kinds.contains("manifest"))
    // every artifact has real on-disk bytes
    assert(insp.forall(_.getLong(2) > 0),
      insp.map(r => s"${r.getString(1)}=${r.getLong(2)}").mkString(";"))
    val snapRow = insp.find(_.getString(0) == "snapshot").get
    assert(snapRow.getString(1) == s"snapshots/$mergedId.json")
    assert(snapRow.getString(4).contains("merge feature into main"))
    val manRow = insp.find(_.getString(0) == "manifest").get
    assert(manRow.getString(3) == "/a" &&
      manRow.getString(4).startsWith("refs="))
    // a tag ref and a raw snapshot id resolve too
    repo.createTag("vi", mergedId)
    assert(spark.sql(s"CALL $cat.system.inspect('vi')").count() ==
      insp.length.toLong)
    assert(spark.sql(s"CALL $cat.system.inspect('$cid')")
      .collect().find(_.getString(0) == "snapshot").get
      .getString(1) == s"snapshots/$cid.json")

    // unknown procedure is a stable-kind refusal
    val ex = intercept[Exception] {
      spark.sql(s"CALL $cat.system.nope()").collect()
    }
    assert(ex.getMessage.contains("no procedure") ||
      ex.getMessage.toLowerCase.contains("nope"))

    // the listing surface: SHOW PROCEDURES enumerates system.*
    val listed = spark.sql(s"SHOW PROCEDURES IN $cat.system").collect()
      .map(_.toString).mkString(",")
    assert(listed.contains("push") && listed.contains("fsck"), listed)
  }

  test("tensor procedures: CALL system.tensor_{combine,map,transpose,downsample}") {
    val dir = tmpDir("tproc-repo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(40), Seq(10), userData = """{"dtype":"int64"}""")
    s.addArray("/b", Seq(40), Seq(10), userData = """{"dtype":"int64"}""")
    for (c <- 0 until 4) {
      s.writeChunk("/a", Seq(c), graft.functions.ChunkCodec.encodeLongs(
        Array.tabulate(10)(i => (c * 10 + i).toLong), "int64"))
      s.writeChunk("/b", Seq(c), graft.functions.ChunkCodec.encodeLongs(
        Array.fill(10)(100L), "int64"))
    }
    s.commit("init")
    val cat = "tcat" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)

    // combine lands one commit and the result reads back through SQL
    val cid = spark.sql(
      s"CALL $cat.system.tensor_combine('/a', '/b', '/sum', 'add')")
      .head().getString(0)
    assert(repo.lookupBranch("main").contains(cid))
    val sum25 = spark.sql(
      s"SELECT value FROM $cat.sum WHERE i0 = 25").head().getLong(0)
    assert(sum25 == 125L)

    // affine map (integral -> keeps int64)
    spark.sql(
      s"CALL $cat.system.tensor_map('/a', '/a2', scale => 2.0D, " +
        "offset => 1.0D)").collect()
    assert(spark.sql(s"SELECT value FROM $cat.a2 WHERE i0 = 7")
      .head().getLong(0) == 15L)

    // unary clip through SQL (named args for the bounds)
    spark.sql(
      s"CALL $cat.system.tensor_unary('/a', '/a_cl', 'clip', " +
        "lo => 3.0D, hi => 20.0D)").collect()
    assert(spark.sql(s"SELECT value FROM $cat.a_cl WHERE i0 = 0")
      .head().getLong(0) == 3L) // value 0 clipped up
    assert(spark.sql(s"SELECT value FROM $cat.a_cl WHERE i0 = 30")
      .head().getLong(0) == 20L) // clipped down

    // downsample by 4 (mean): 40 -> 10 cells
    spark.sql(
      s"CALL $cat.system.tensor_downsample('/a', '/a_l1', '4')").collect()
    val l1 = spark.sql(s"SELECT value FROM $cat.a_l1 WHERE i0 = 0")
      .head().getDouble(0)
    assert(math.abs(l1 - 1.5) < 1e-12) // mean(0,1,2,3)

    // transpose needs a 2-D array; identity perm on 1-D aliases refs
    spark.sql(
      s"CALL $cat.system.tensor_transpose('/a', '/a_t', '0')").collect()
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/a_t").select("chunk_id").collect().map(_.getString(0))
      .toSet == ro.refs("/a").select("chunk_id").collect()
      .map(_.getString(0)).toSet)

    // zero-copy concat through SQL: /a ++ /a along axis 0 doubles cells
    spark.sql(
      s"CALL $cat.system.tensor_concat('/a,/a', '/a_cat')").collect()
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.a_cat")
      .head().getLong(0) ==
      spark.sql(s"SELECT count(*) AS n FROM $cat.a").head().getLong(0) * 2)

    // publish sharded + adopt back, all through SQL
    val out = tmpDir("tproc-zarr")
    val n = spark.sql(
      s"CALL $cat.system.zarr_export('main', '$out', 'raw', '2')")
      .head().getLong(0)
    assert(n > 0)
    val dir2 = tmpDir("tproc-repo2")
    Repository.create(Store.local(dir2), spark)
    val cat2 = "tcat2" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat2",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat2.path", dir2)
    spark.sql(s"CALL $cat2.system.zarr_import('$out')").collect()
    assert(spark.sql(s"SELECT value FROM $cat2.sum WHERE i0 = 25")
      .head().getLong(0) == 125L)

    // dtype probe failure surfaces as a stable-kind refusal
    val s2 = repo.writableSession("main")
    s2.addArray("/nodt", Seq(10), Seq(10))
    s2.commit("no dtype")
    val ex = intercept[Exception](spark.sql(
      s"CALL $cat.system.tensor_map('/nodt', '/nodt2')").collect())
    assert(ex.getMessage.contains("dtype"))
  }

  test("tensor transforms carry the source codec into the destination " +
      "doc; SQL reads decode it") {
    // regression: transform destinations recorded only dtype, so a
    // compressed source produced a dest whose SQL reads decoded zstd
    // bytes as raw — silently. The procedures probe the codec and the
    // dest doc must now carry it.
    val dir = tmpDir("codec-repo")
    val repo = Repository.create(Store.local(dir), spark)
    val s = repo.writableSession("main")
    s.addArray("/z", Seq(40), Seq(10), userData =
      """{"dtype":"int64","codecs":[{"name":"bytes",""" +
        """"configuration":{"endian":"little"}},{"name":"zstd"}]}""")
    graft.tensor.TensorPlane.writeValues(s, "/z",
      spark.range(40).selectExpr("id as i0", "id * 7 as value"),
      "int64", compression = "zstd")
    s.commit("zstd source")
    val cat = "zcat" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)
    // affine map via SQL: codec probed from the source doc, dest doc
    // records it, the read decodes through it
    spark.sql(s"CALL $cat.system.tensor_map('/z', '/z2', " +
      "scale => 3.0D, offset => 0.0D)").collect()
    assert(spark.sql(s"SELECT value FROM $cat.z2 WHERE i0 = 7")
      .head().getLong(0) == 147L) // 7*7*3
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.node("/z2").get.userData.contains("zstd"))
    // zero-copy concat of compressed sources via SQL: relabeled refs
    // keep zstd bytes, the dest doc says zstd, SQL reads stay correct
    spark.sql(s"CALL $cat.system.tensor_concat('/z,/z', '/zc')").collect()
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.zc")
      .head().getLong(0) == 80L)
    assert(spark.sql(s"SELECT value FROM $cat.zc WHERE i0 = 47")
      .head().getLong(0) == 49L) // second copy's cell 7: 7*7
    // a mismatched explicit codec is refused by name, not misdecoded
    val ex2 = intercept[Exception](graft.tensor.TensorPlane.mapValues(
      repo.writableSession("main"), "/z", "/z3", 2.0, 0.0, "int64"))
    assert(ex2.getMessage.contains("stores compression zstd"))
  }

  test("pipeline procedures: CALL system.{dedup_exact,minhash_candidates," +
      "temperature_mix} register lazy views matching the Scala API") {
    val dir = tmpDir("pipe-proc")
    Repository.create(Store.local(dir), spark)
    val cat = "ppcat" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dir)

    val docs = spark.createDataFrame(Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web"),
      (2L, "the quick brown fox jumps over the lazy dog", "web"),
      (3L, "an entirely different document about spark", "books"),
      (4L, "the quick brown fox jumps over the lazy cat", "web"),
      (5L, "an entirely different document about spark", "books")))
      .toDF("doc_id", "text", "source")
    docs.createOrReplaceTempView("proc_docs")

    // dedup_exact: the CALL returns (view, columns); the view is the
    // SAME relation Dedup.exact builds
    val r1 = spark.sql(s"CALL $cat.system.dedup_exact('proc_docs')").head()
    assert(r1.getString(0) == "dedup_exact")
    assert(r1.getString(1) == "doc_id,canonical_id,n_copies")
    val viaSql = spark.table("dedup_exact").orderBy("doc_id").collect()
    val viaApi = graft.pipeline.Dedup.exact(docs).orderBy("doc_id").collect()
    assert(viaSql.toSeq == viaApi.toSeq)
    assert(viaSql.exists(r => r.getLong(0) == 2L && r.getLong(1) == 1L))

    // minhash_candidates with named args + custom view name
    spark.sql(s"CALL $cat.system.minhash_candidates(" +
      "input => 'proc_docs', output_view => 'mh_out')").head()
    val mhSql = spark.table("mh_out").orderBy("doc_a", "doc_b").collect()
    val mhApi = graft.pipeline.Dedup.minhashCandidates(docs,
        numHashes = 32, bands = 8, portable = true)
      .orderBy("doc_a", "doc_b").collect()
    assert(mhSql.toSeq == mhApi.toSeq)
    // the exact duplicate pair is a candidate
    assert(mhSql.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))

    // temperature_mix: default target_rows = input count
    spark.sql(s"CALL $cat.system.temperature_mix(" +
      "'proc_docs', 'doc_id', 'source')").head()
    val tmSql = spark.table("temperature_mix")
      .select("doc_id", "source", "epoch").orderBy("doc_id", "epoch")
      .collect()
    val tmApi = graft.pipeline.Sampling.temperatureMix(
        docs.select(col("doc_id"), col("source")), "doc_id", "source",
        alpha = 0.5, targetRows = docs.count(), method = "md5")
      .select("doc_id", "source", "epoch").orderBy("doc_id", "epoch")
      .collect()
    assert(tmSql.toSeq == tmApi.toSeq && tmSql.nonEmpty)

    // the views are LAZY relations: re-resolving reflects source changes
    // (no driver-side materialization happened at CALL time)
    assert(spark.table("dedup_exact").queryExecution.logical != null)
  }
}
