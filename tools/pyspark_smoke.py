#!/usr/bin/env python3
"""PySpark user-path smoke (docs/pyspark.md quickstart, runnable).

Drives the graft engine's Python surface end-to-end with NOTHING but
pyspark + the compiled Scala classes on the driver classpath:

  create repo (py4j factory) -> CREATE TABLE -> INSERT -> SELECT ->
  time travel (VERSION AS OF) -> CALL system.inspect ->
  CALL system.push -> open the replica and read it back ->
  pipeline procedures (dedup_exact / minhash_candidates /
  temperature_mix) over a temp view -> Structured Streaming sink
  round-trip (readStream json -> writeStream graft-v2, availableNow).

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

        # 6. pipeline procedures over any resolvable relation (round 13:
        #    the Python-first pipeline surface, not just the repo ops)
        docs = spark.createDataFrame(
            [(i, "sample doc text %d" % (i % 7), "web" if i % 2 else "books")
             for i in range(40)],
            "doc_id BIGINT, text STRING, source STRING")
        docs.createOrReplaceTempView("docs")

        spark.sql("CALL g.system.dedup_exact('docs')").collect()
        dedup = spark.table("dedup_exact")
        assert dedup.count() == 40, dedup.count()
        # 7 distinct texts -> 7 canonical keepers
        kept = dedup.filter("doc_id = canonical_id").count()
        assert kept == 7, kept
        print("[pyspark-smoke] dedup_exact keepers =", kept)

        spark.sql("CALL g.system.minhash_candidates('docs', "
                  "num_hashes => 16, bands => 4)").collect()
        cand = spark.table("minhash_candidates")
        # exact duplicates always collide in every band
        assert cand.count() > 0, cand.count()
        print("[pyspark-smoke] minhash candidate pairs =", cand.count())

        spark.sql("CALL g.system.temperature_mix('docs', 'doc_id', "
                  "'source', alpha => 0.5, target_rows => 20)").collect()
        mix = spark.table("temperature_mix")
        n_mix = mix.count()
        assert 0 < n_mix <= 40, n_mix
        print("[pyspark-smoke] temperature_mix rows =", n_mix)

        # 7. Structured Streaming sink round-trip: file source ->
        #    graft-v2 values sink, one commit per epoch, availableNow
        spark.sql("CREATE TABLE g.s (i0 BIGINT, value BIGINT) "
                  "TBLPROPERTIES('shape'='16','chunk_shape'='4')")
        stream_in = os.path.join(work, "stream_in")
        os.makedirs(stream_in)
        with open(os.path.join(stream_in, "batch0.json"), "w") as fh:
            for i in range(16):
                fh.write('{"i0": %d, "value": %d}\n' % (i, i * 3))
        sdf = (spark.readStream.schema("i0 BIGINT, value BIGINT")
               .json(stream_in)
               .selectExpr("i0", "value", "i0 div 4 as _c0"))
        q = (sdf.writeStream.format("graft-v2")
             .option("path", repo_dir).option("array", "/s")
             .option("mode", "values").option("dtype", "int64")
             .option("clustered", "true")
             .option("checkpointLocation", os.path.join(work, "ckpt"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(120)
        back = spark.sql("SELECT count(*) AS n, sum(value) AS s FROM g.s") \
            .first()
        assert back.n == 16 and back.s == sum(i * 3 for i in range(16)), back
        print("[pyspark-smoke] streaming sink rows =", back.n)

        # 8. error-path parity (round 14): the engine's error taxonomy
        #    must surface as CATCHABLE Python exceptions with the same
        #    classes/kinds a Scala caller sees — not as opaque crashes.
        import re
        from py4j.protocol import Py4JJavaError

        # 8a. conflict on concurrent commit: two sessions from one tip
        #     edit the SAME cell; the loser's rebase must raise the
        #     conflict error class, and catching it leaves the repo usable
        repo = jvm.graft.repo.Repository.open(store, spark._jsparkSession)
        s_a = repo.writableSession("main")
        s_b = repo.writableSession("main")
        s_a.writeChunkJ("/s", [0], bytearray(b"\x01" * 8))
        s_b.writeChunkJ("/s", [0], bytearray(b"\x02" * 8))
        s_a.commitJ("winner")
        try:
            # fail-on-conflict commit: the reference's Python commit()
            # semantics (no silent auto-resolution of double-writes)
            s_b.commitFailOnConflictJ("loser")
            raise AssertionError("conflicting commit did not raise")
        except Py4JJavaError as e:
            jmsg = str(e.java_exception)
            assert "ConflictException" in jmsg, jmsg
            print("[pyspark-smoke] conflict surfaced:",
                  jmsg.splitlines()[0][:90])

        # 8b. UnsupportedFormat: a pointer generation stamped by a NEWER
        #     library version must refuse to open, naming the versions
        ptr = jvm.graft.meta.RepoPointer(store)
        gen = ptr.latestGen()
        key = jvm.graft.meta.Layout.pointerKey(gen)
        doc = bytes(store.getBytes(key)).decode("utf-8")
        doc2 = re.sub(r'("specVersion"\s*:\s*)\d+', r"\g<1>99", doc)
        assert doc2 != doc, "specVersion field not found in pointer doc"
        store.putBytes(jvm.graft.meta.Layout.pointerKey(gen + 1),
                       bytearray(doc2.encode("utf-8")))
        try:
            jvm.graft.repo.Repository.open(store, spark._jsparkSession)
            raise AssertionError("newer-format pointer did not refuse open")
        except Py4JJavaError as e:
            jmsg = str(e.java_exception)
            assert "UnsupportedFormat" in jmsg or "newer than" in jmsg, jmsg
            print("[pyspark-smoke] format refusal surfaced:",
                  jmsg.splitlines()[0][:90])
        finally:
            # restore the tip so the repo stays openable (deletePrefix
            # with the exact key: Store.delete takes a Scala Iterable,
            # which py4j cannot supply)
            store.deletePrefix(jvm.graft.meta.Layout.pointerKey(gen + 1))

        # 8c. authorization: a virtual ref against an UNREGISTERED
        #     container is refused at set-time (session.rs:631-655 parity)
        s_c = repo.writableSession("main")
        try:
            s_c.setVirtualRefJ("/s", [1], "s3://not-registered/obj", 0, 10)
            raise AssertionError("unregistered virtual container accepted")
        except Py4JJavaError as e:
            jmsg = str(e.java_exception)
            assert ("container" in jmsg or "virtual" in jmsg
                    or "authorization" in jmsg.lower()), jmsg
            print("[pyspark-smoke] virtual auth refusal surfaced:",
                  jmsg.splitlines()[0][:90])

        # 9. batch-read parity (round 15): an ERA5-style time slice across
        #    4 arrays goes through ONE py4j call and one concurrent warm
        #    wave — not one round trip per coordinate
        s_w = repo.writableSession("main")
        arrays = ["/era/%s" % v for v in ("t2m", "u10", "v10", "sp")]
        for k, p in enumerate(arrays):
            s_w.addArrayJ(p, [16], [4])
            for c in range(4):
                s_w.writeChunkJ(p, [c], bytearray([k * 16 + c] * 8))
        s_w.commitJ("era arrays")
        ro = repo.readonlySessionJ("main")
        paths, coords = [], []
        for p in arrays:          # the same time index across all arrays
            paths.append(p)
            coords.append([2])
        chunks = ro.getChunksBatchJ(paths, coords)
        assert chunks.size() == 4, chunks.size()
        for k in range(4):
            got = bytes(chunks[k])
            assert got == bytes([k * 16 + 2] * 8), (k, got)
        refs = ro.getChunkRefsBatchJ(paths, coords)
        assert refs.size() == 4 and all(
            refs[k] is not None for k in range(4))
        # a miss maps to Python None, aligned by index
        miss = ro.getChunkRefsBatchJ(["/era/t2m"], [[15]])
        assert miss[0] is None, miss[0]
        print("[pyspark-smoke] 4-array batch slice read OK")

        # 10. values-plane batched slice (round 16): region stats AND
        #     region cells through ONE py4j call each — the
        #     TensorPlane.sliceStats / valuesRegion shapes — asserted
        #     against a Python-side recomputation of the same region
        import struct
        from pyspark.sql import DataFrame as PyDF
        s_v = repo.writableSession("main")
        s_v.addArrayJ("/vals", [8, 8], [4, 4])
        for ci in range(2):
            for cj in range(2):
                payload = struct.pack(
                    "<16d", *[float(ci * 1000 + cj * 100 + k)
                              for k in range(16)])
                s_v.writeChunkJ("/vals", [ci, cj], bytearray(payload))
        s_v.commitJ("value cube")

        def cell(i, j):  # chunk-local row-major layout, see write above
            return float((i // 4) * 1000 + (j // 4) * 100 +
                         (i % 4) * 4 + (j % 4))
        exp = {(i, j): cell(i, j) for i in range(2, 6) for j in range(2, 6)}
        ro_v = repo.readonlySessionJ("main")
        stats = PyDF(ro_v.sliceStatsJ("/vals", "float64", [2, 2], [6, 6],
                                      "raw"), spark).collect()[0]
        assert stats["n"] == 16, stats
        assert abs(stats["sum"] - sum(exp.values())) < 1e-9, stats
        assert stats["min"] == min(exp.values()), stats
        assert stats["max"] == max(exp.values()), stats
        got = {(r["i0"], r["i1"]): r["value"] for r in
               PyDF(ro_v.sliceValuesJ("/vals", "float64", [2, 2], [6, 6],
                                      "raw"), spark).collect()}
        assert got == exp, sorted(got.items())[:4]
        print("[pyspark-smoke] values-plane slice via one py4j call OK")

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
