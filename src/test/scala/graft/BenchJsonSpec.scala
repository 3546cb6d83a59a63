package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON-line contract: a crashed entry must be EXPLICIT in the
  * line — negative wall time plus an `errors` entry — never
  * indistinguishable from a fast success (the driver reads this line as
  * the round's official numbers).
  */
class BenchJsonSpec extends AnyFunSuite {
  test("a failing entry records negative time and an errors[] marker") {
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val ok = Bench.timedEntry("fine", errors) { Thread.sleep(5); 42 }
    assert(ok > 0)
    val bad = Bench.timedEntry("broken", errors) {
      throw new IllegalStateException("exploded \"mid\"-entry")
    }
    assert(bad < 0) // first marker: negated wall time
    assert(errors.size == 1 && errors.head.startsWith(
      "broken: IllegalStateException: exploded"))

    val results = scala.collection.mutable.LinkedHashMap(
      "fine" -> ok, "broken" -> bad)
    val line = Bench.jsonLine(results, errors, "/sf")
    // second marker: explicit errors array, with quotes escaped so the
    // line stays parseable JSON
    assert(line.contains("\"errors\":[\"broken: IllegalStateException: " +
      "exploded \\\"mid\\\"-entry\"]"))
    assert(line.contains("\"broken\":-"))
    // well-formed: the driver json-parses this line
    assert(line.startsWith("{\"metric\":\"total\"") && line.endsWith("}"))
  }

  test("a pile of failures caps the errors array, keeping the line short") {
    val errs = (1 to 10).map(i => s"entry$i: Boom: detail $i")
    val line = Bench.jsonLine(
      scala.collection.mutable.LinkedHashMap("a" -> 1.0), errs, "/sf")
    assert(line.contains("entry1") && line.contains("entry2"))
    assert(!line.contains("entry3") && line.contains("+8 more failures"))
  }

  test("a clean run emits an empty errors array") {
    val line = Bench.jsonLine(
      scala.collection.mutable.LinkedHashMap("a" -> 1.5), Nil, "/sf")
    assert(line.contains("\"errors\":[]"))
    assert(line.contains("\"a\":1.5"))
  }

  test("numbers are compact (3 sig figs, <=4 decimals) but keep sub-ms visibility") {
    assert(Bench.jnum(25.337620562) == "25.3")
    assert(Bench.jnum(0.579926638) == "0.58")
    assert(Bench.jnum(0.001683668) == "0.0017") // hot-cache entries stay visible
    assert(Bench.jnum(0.0005639) == "0.0006")
    assert(Bench.jnum(1.5) == "1.5")
    assert(Bench.jnum(-0.25) == "-0.25") // failure markers keep their sign
    assert(Bench.jnum(0.0) == "0")
  }

  test("a full-size result line fits the driver's 2000-char tail capture") {
    // the REAL key set (headline queries + every engine entry) at the
    // WORST-CASE value width ("0.0006"): the driver keeps exactly the
    // last 2000 stdout chars — a longer line loses its START and the
    // round's parsed timings with it (rounds 1-6's failure mode)
    val engineKeys = Seq(
      "engine_write_500k_refs", "engine_append_one_shard",
      "engine_commit_rebase", "engine_commit_small_x10",
      "engine_read_refs_scan", "engine_v2_refs_scan",
      "engine_point_lookups_x20", "engine_point_lookups_batch",
      "engine_point_lookups_hot",
      "engine_getsize_prefix", "engine_cube_write_1g",
      "engine_cube_read_1g", "engine_cube_slice_read",
      "engine_v2_columnar_scan", "engine_v2_groupby_agg",
      "engine_v2_values_write",
      "engine_catalog_values_write", "engine_values_diff",
      "engine_zarr_export_1g", "engine_zarr_adopt",
      "engine_rechunk_1g", "engine_downsample_1g",
      "engine_cube_slice_rows", "engine_transpose_1g",
      "engine_tensor_combine_1g",
      "engine_repo_push", "engine_repo_push_incr", "engine_fsck",
      "engine_merge_branch", "engine_merge_many_arrays",
      "engine_rect_concat_1g", "engine_rect_slice_read",
      "engine_rect_spj", "engine_calib", "engine_io_w_mbps")
    // every headline name must actually exist in the query map (a
    // renamed query would silently fall out of the bench line)
    val missing = Bench.HeadlineQueries -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"headline names not in Queries.all: $missing")
    val timedKeys = SparkEntry.queries.keys.toSeq
      .filter(Bench.HeadlineQueries.contains)
    val results = scala.collection.mutable.LinkedHashMap(
      (timedKeys ++ engineKeys).map(_ -> 0.00056395): _*)
    val line = Bench.jsonLine(results, Nil, "/root/testdata/sf0.1",
      "bench_raws.json",
      // worst-width floor + weather: the r14 fields ride the same budget
      floor = 0.00056395,
      weather = "calib_spread=40.1x io_w=9999MBps noisy")
    // 2000 is the hard capture limit; 1985 leaves newline margin at the
    // pathological all-sub-ms width (real lines run ~1840 at 72 entries)
    assert(line.length < 1985, s"bench JSON line too long: ${line.length}")
    // and it is parse-checkable: balanced object, last char is '}'
    assert(line.startsWith("{\"metric\":\"total\"") && line.endsWith("}"))
    // at pathological width the metadata fields yield their seats in
    // redundancy order — triage first (the sidecar's mins + calib carry
    // the same facts), then the raws pointer (it is the FIXED default
    // path, still discoverable); at realistic width (~73 mixed-width
    // entries, lines ~1850) all of them ride the line
    assert(!line.contains("\"weather\""),
      "triage fields must be dropped before the line start is truncated")
    // realistic width: values like "4.36"/"0.729" (mixed 3-5 chars) —
    // every metadata field present
    val realistic = scala.collection.mutable.LinkedHashMap(
      (timedKeys ++ engineKeys).zipWithIndex
        .map { case (k, i) => k -> (0.1 + (i % 9)) }: _*)
    val rline = Bench.jsonLine(realistic, Nil, "/root/testdata/sf0.1",
      "bench_raws.json", floor = 116.4,
      weather = "calib_spread=1.4x io_w=384MBps clear")
    assert(rline.length < 1985, s"realistic line too long: ${rline.length}")
    assert(rline.contains("\"raws\":\"bench_raws.json\"") &&
      rline.contains("\"floor\":116") && rline.contains("\"weather\""),
      "metadata fields must ride the line at realistic width")
  }

  test("floor and weather ride the line; absent by default") {
    val r = scala.collection.mutable.LinkedHashMap("a" -> 1.5)
    val bare = Bench.jsonLine(r, Nil, "/sf")
    assert(!bare.contains("\"floor\"") && !bare.contains("\"weather\""))
    val full = Bench.jsonLine(r, Nil, "/sf", "raws.json", 1.23,
      "calib_spread=1.1x io_w=400MBps clear")
    assert(full.contains("\"floor\":1.23"))
    assert(full.contains(
      "\"weather\":\"calib_spread=1.1x io_w=400MBps clear\""))
  }

  test("raws sidecar carries per-entry minima of successful samples") {
    val raws = Bench.rawsJson("/sf",
      Seq(("engine0/start", 0.2)),
      Seq(
        ("query0", Map("q" -> 5.0, "bad" -> -1.0)),
        ("query1", Map("q" -> 2.5, "bad" -> -2.0))))
    assert(raws.contains("\"mins\":{\"q\":2.5}"), raws)
    // failed-only entries have no floor; samples keep the negatives
    assert(raws.contains("\"bad\":[[\"query0\",-1],[\"query1\",-2]]"))
  }

  test("calibration probe: fixed work, positive wall time, repeatable") {
    val tmp = java.nio.file.Files.createTempDirectory("calib-spec")
    try {
      val a = Bench.calibSample(tmp)
      val b = Bench.calibSample(tmp)
      // a real measurement, not elided: the probe does 2^26 hash folds,
      // 256 MB of page-touched allocation and 256 MB of file I/O — even a
      // fast box needs real milliseconds, and a DCE'd probe would read 0
      assert(a > 0.01 && b > 0.01, s"calib probe too fast: $a / $b")
      // the temp dir is left clean (every sample deletes its file)
      assert(java.nio.file.Files.list(tmp).count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }

  test("io probe: fsync'd write bandwidth, sane range, temp left clean") {
    val tmp = java.nio.file.Files.createTempDirectory("io-spec")
    try {
      val mbps = Bench.ioProbe(tmp)
      // a real fsync'd 256 MB write: physically possible bounds only
      // (spinning rust ~100, NVMe ~3000; 0 or 7-digit values mean the
      // probe elided or mis-measured)
      assert(mbps > 5 && mbps < 100000, s"io probe out of range: $mbps")
      assert(java.nio.file.Files.list(tmp).count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }

  test("raw-sample sidecar holds every per-pass sample and calibration") {
    val p0 = scala.collection.mutable.LinkedHashMap(
      "q1_agg" -> 1.25, "engine_rechunk_1g" -> 2.93)
    val p1 = scala.collection.mutable.LinkedHashMap(
      "q1_agg" -> 1.31, "engine_rechunk_1g" -> 9.8) // the weather sample
    val json = Bench.rawsJson("/sf",
      Seq(("engine0/start", 0.91), ("engine0/end", 1.04)),
      Seq(("engine0", p0), ("engine1", p1)))
    // both raw samples for the drifted entry are recoverable, pass-tagged
    assert(json.contains(
      """"engine_rechunk_1g":[["engine0",2.93],["engine1",9.8]]"""))
    assert(json.contains(""""q1_agg":[["engine0",1.25],["engine1",1.31]]"""))
    assert(json.contains(
      """"calib":[["engine0/start",0.91],["engine0/end",1.04]]"""))
    // well-formed JSON object (driver/judge parse this file)
    assert(json.startsWith("{\"sf\":") && json.endsWith("}"))
    assert(json.count(_ == '{') == json.count(_ == '}'))
    assert(json.count(_ == '[') == json.count(_ == ']'))
  }
}
