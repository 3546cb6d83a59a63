#!/usr/bin/env python3
"""PySpark user-path smoke (docs/pyspark.md quickstart, runnable).

Drives the graft engine's Python surface end-to-end with NOTHING but
pyspark + the compiled Scala classes on the driver classpath:

  create repo (py4j factory) -> CREATE TABLE -> INSERT -> SELECT ->
  time travel (VERSION AS OF) -> CALL system.inspect ->
  CALL system.push -> open the replica and read it back.

Run from the repo root after `sbt compile`:

    python3 tools/pyspark_smoke.py

Prints `[pyspark-smoke] OK` last on success. This script is a doc/test
artifact for the Python user path — the library itself has no Python
dependency.
"""
import os
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession

CLASSES = os.path.join(os.path.dirname(__file__), "..",
                       "target", "scala-2.13", "classes")

def main():
    if not os.path.isdir(CLASSES):
        sys.exit("run `sbt compile` first: missing " + CLASSES)
    work = tempfile.mkdtemp(prefix="graft-pyspark-")
    repo_dir = os.path.join(work, "repo")
    replica_dir = os.path.join(work, "replica")
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.driver.extraClassPath", os.path.abspath(CLASSES))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        # the catalog is plain Spark conf — same lines a SQL-only user sets
        .config("spark.sql.catalog.g", "graft.sources.GraftCatalog")
        .config("spark.sql.catalog.g.path", repo_dir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    try:
        jvm = spark._jvm
        # 1. create the repository (the one step SQL can't do) via the
        #    py4j-friendly exact-arity factory
        store = jvm.graft.storage.Store.local(repo_dir)
        jvm.graft.repo.Repository.create(store, spark._jsparkSession)
        print("[pyspark-smoke] repo created at", repo_dir)

        # 2. DDL + DML straight through SQL
        spark.sql("CREATE TABLE g.t (i0 BIGINT, value BIGINT) "
                  "TBLPROPERTIES('shape'='64','chunk_shape'='8')")
        spark.sql("INSERT INTO g.t SELECT id, id * 2 FROM range(64)")
        # g.snapshots lists ancestry newest-first: row 0 is the tip
        v1 = spark.sql(
            "SELECT snapshot_id FROM g.snapshots LIMIT 1").first()[0]
        spark.sql("INSERT OVERWRITE g.t SELECT id, id * 10 FROM range(64)")

        now = spark.sql("SELECT sum(value) FROM g.t").first()[0]
        assert now == sum(i * 10 for i in range(64)), now
        print("[pyspark-smoke] read-after-write sum =", now)

        # 3. time travel: snapshot id via VERSION AS OF
        old = spark.sql(
            f"SELECT sum(value) FROM g.t VERSION AS OF '{v1}'").first()[0]
        assert old == sum(i * 2 for i in range(64)), old
        print("[pyspark-smoke] time travel sum =", old)

        # 4. metadata procedures
        n_inspect = spark.sql("CALL g.system.inspect()").count()
        assert n_inspect > 0
        print("[pyspark-smoke] inspect rows =", n_inspect)

        # 5. push the branch to a second store, then read the replica
        row = spark.sql(
            f"CALL g.system.push('main', '{replica_dir}')").first()
        assert row.chunks_copied > 0, row
        print("[pyspark-smoke] pushed chunks =", row.chunks_copied)
        rep = (spark.read.format("graft-v2")
               .option("path", replica_dir).option("array", "/t")
               .option("mode", "values").option("dtype", "int64").load())
        assert rep.count() == 64
        print("[pyspark-smoke] replica rows =", rep.count())
        print("[pyspark-smoke] OK")
    except Exception as e:  # noqa: BLE001 — smoke must name its failure
        ok = False
        print("[pyspark-smoke] FAILED:", e)
        raise
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
