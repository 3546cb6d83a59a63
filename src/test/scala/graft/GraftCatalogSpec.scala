package graft

import graft.repo._
import graft.storage.Store

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
}
