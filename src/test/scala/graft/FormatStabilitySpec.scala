package graft

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.meta.EditRow
import graft.repo._
import graft.storage.Store
import graft.tensor.TensorPlane

/** Format-stability gate: the golden repository under
  * `src/test/resources/golden-r9/` was written at round-9 HEAD by
  * [[graft.tools.MakeGoldenFixture]] and its BYTES are committed. Every
  * future HEAD must open and FULLY read it — branches, tags, ancestry,
  * node tree, regular + rectilinear values, snapshot properties, diff,
  * ops log — without touching a byte (reads must not rewrite the repo).
  * The reference ships the same promise as `test_can_read_old.py` over
  * `spec_version_cases` (icechunk/src/lib.rs:84-92). If a format change
  * breaks this spec, that is a BREAKING format change: regenerate the
  * fixture under a NEW directory (golden-r10, keeping this one) and add
  * a migration or a loud refusal — never silently drop readability.
  */
class FormatStabilitySpec extends SparkTestBase {

  private val fixture = Paths.get("src/test/resources/golden-r9")

  /** Copy the fixture to a temp dir (so even a buggy write path cannot
    * corrupt the committed bytes) and fingerprint every file.
    */
  private def stage(): (Path, Map[String, String]) = {
    val dst = Files.createTempDirectory("golden-stage")
    var sums = Map.empty[String, String]
    Files.walk(fixture).forEach { p =>
      val rel = fixture.relativize(p).toString
      if (Files.isDirectory(p)) {
        if (rel.nonEmpty) Files.createDirectories(dst.resolve(rel))
      } else {
        Files.copy(p, dst.resolve(rel))
        val md = MessageDigest.getInstance("MD5")
        sums += rel -> md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }
    }
    (dst, sums)
  }

  private def checksums(root: Path): Map[String, String] = {
    var sums = Map.empty[String, String]
    Files.walk(root).forEach { p =>
      if (!Files.isDirectory(p)) {
        val md = MessageDigest.getInstance("MD5")
        sums += root.relativize(p).toString ->
          md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }
    }
    sums
  }

  test("golden r9 repository opens and fully reads at this HEAD") {
    assume(Files.isDirectory(fixture), s"fixture missing at $fixture")
    val (dir, sums) = stage()
    val repo = Repository.open(Store.local(dir.toString), spark)

    // refs
    assert(repo.listBranches() == Seq("feature", "main"))
    assert(repo.listTags() == Seq("v1"))

    // ancestry on main: init + 2 commits, newest first
    val chain = repo.ancestry(VersionRef.Branch("main"))
    assert(chain.map(_.message) == Seq("golden: overwrite + rectilinear",
      "golden: initial data", "Repository initialized"))
    // snapshot properties survived
    assert(repo.lookupSnapshot(chain(1).id)
      .properties.get("epoch").contains("r9"))

    // node tree at main tip
    val tip = repo.readonlySession(VersionRef.Branch("main"))
    assert(tip.nodes.map(_.path).sorted == Seq("/", "/climate",
      "/climate/rect", "/climate/series", "/climate/temp"))
    val rectNode = tip.node("/climate/rect").get
    assert(rectNode.isRectilinear &&
      rectNode.chunkSizesPerDim == Seq(Seq(3L, 5L, 2L)))

    // regular array at the TAG: pristine v1 values (i0*6 + i1)
    val v1 = repo.readonlySession(VersionRef.Tag("v1"))
    val temp1 = TensorPlane.values(v1, "/climate/temp", "int64")
    assert(temp1.count() == 48)
    assert(temp1.filter(col("value") =!= col("i0") * 6 + col("i1"))
      .count() == 0)
    // chunk-OBJECT-backed array (payloads > inline threshold)
    val series = TensorPlane.values(v1, "/climate/series", "int64")
    assert(series.count() == 200)
    assert(series.filter(col("value") =!= col("i0")).count() == 0)

    // at main tip: chunk (0,0) overwritten with 1000+, rest unchanged
    val tempTip = TensorPlane.values(tip, "/climate/temp", "int64")
    assert(tempTip.filter(col("i0") < 4 && col("i1") < 3 &&
      col("value") =!= lit(1000) + col("i0") * 3 + col("i1")).count() == 0)
    assert(tempTip.filter((col("i0") >= 4 || col("i1") >= 3) &&
      col("value") =!= col("i0") * 6 + col("i1")).count() == 0)

    // rectilinear values identity — via the DSv2 values scan too
    val rect = spark.read.format("graft-v2")
      .option("path", dir.toString).option("array", "/climate/rect")
      .option("mode", "values").option("dtype", "int64").load()
    assert(rect.count() == 10)
    assert(rect.filter(col("i0") =!= col("value")).count() == 0)

    // feature branch: its own edit visible, main's second commit not
    val feat = repo.readonlySession(VersionRef.Branch("feature"))
    val tempF = TensorPlane.values(feat, "/climate/temp", "int64")
    assert(tempF.filter(col("i0") >= 4 && col("i1") >= 3)
      .agg(min("value"), max("value")).head().toSeq == Seq(-7L, -7L))
    assert(feat.node("/climate/rect").isEmpty)

    // diff tag..main names the overwritten chunk and the new array
    val d = repo.diff(VersionRef.Tag("v1"), VersionRef.Branch("main"))
      .select("edit", "path").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(d.exists { case (e, p) => p == "/climate/rect" })
    assert(d.contains((EditRow.Chunk, "/climate/temp")))

    // ops log intact
    val ops = repo.opsLog().map(_.op)
    assert(ops.contains("create_tag") && ops.contains("create_branch"))

    // reading wrote NOTHING: every staged byte identical, no new files
    assert(checksums(dir) == sums,
      "opening/reading the golden repo modified its bytes")
  }

  /** The same promise for the S3 PROTOCOL layout (#2239 regression
    * class): `golden-r10-s3/` holds the object dump (key → bytes) of the
    * fixture repository written THROUGH the S3 store at round-10 HEAD —
    * prefix joining, partition-style manifest keys, and the
    * `repo/r.<inverted>` pointer chain as object keys. Every future HEAD
    * must serve it from a fresh in-process S3 server, byte-identical
    * after a full read.
    */
  test("golden r10 S3-layout object dump opens and fully reads at this HEAD") {
    val s3fix = Paths.get("src/test/resources/golden-r10-s3")
    assume(Files.isDirectory(s3fix), s"fixture missing at $s3fix")
    val server = new graft.storage.s3.S3MemServer
    try {
      server.createBucket("golden")
      val raw = graft.storage.S3StoreConf(server.endpoint, "us-east-1",
        "golden", "", "ak", "sk").open()
      var sums = Map.empty[String, String]
      Files.walk(s3fix).forEach { p =>
        if (!Files.isDirectory(p)) {
          val key = s3fix.relativize(p).toString.replace('\\', '/')
          val bytes = Files.readAllBytes(p)
          raw.putBytes(key, bytes)
          val md = MessageDigest.getInstance("MD5")
          sums += key -> md.digest(bytes).map("%02x".format(_)).mkString
        }
      }
      assert(sums.nonEmpty)

      val repo = Repository.open(graft.storage.S3StoreConf(server.endpoint,
        "us-east-1", "golden", "repos/g", "ak", "sk").open(), spark)
      assert(repo.listBranches() == Seq("feature", "main"))
      assert(repo.listTags() == Seq("v1"))
      val chain = repo.ancestry(VersionRef.Branch("main"))
      assert(chain.map(_.message) == Seq("golden: overwrite + rectilinear",
        "golden: initial data", "Repository initialized"))
      val tip = repo.readonlySession(VersionRef.Branch("main"))
      // regular values (object-backed chunks come over ranged S3 GETs)
      val series = TensorPlane.values(tip, "/climate/series", "int64")
      assert(series.count() == 200)
      assert(series.filter(col("value") =!= col("i0")).count() == 0)
      // overwritten chunk at tip, pristine at the tag
      val tempTip = TensorPlane.values(tip, "/climate/temp", "int64")
      assert(tempTip.filter(col("i0") < 4 && col("i1") < 3 &&
        col("value") =!= lit(1000) + col("i0") * 3 + col("i1"))
        .count() == 0)
      val v1 = repo.readonlySession(VersionRef.Tag("v1"))
      assert(TensorPlane.values(v1, "/climate/temp", "int64")
        .filter(col("value") =!= col("i0") * 6 + col("i1")).count() == 0)
      // rectilinear identity
      val rect = TensorPlane.values(tip, "/climate/rect", "int64")
      assert(rect.count() == 10)
      assert(rect.filter(col("i0") =!= col("value")).count() == 0)

      // reading wrote NOTHING: identical key set, identical bytes
      val after = raw.list("").map { o =>
        val md = MessageDigest.getInstance("MD5")
        o.key -> md.digest(raw.getBytes(o.key)).map("%02x".format(_))
          .mkString
      }.toMap
      assert(after == sums,
        "opening/reading the golden S3 repo modified its objects")
    } finally server.stop()
  }

  test("committing on a pre-versioned pointer upgrades it in place: " +
      "specVersion stamped, history intact, still fully readable") {
    // the golden fixture's pointer predates BOTH the windowed snapshot
    // index and the persisted specVersion (round 13) — a commit on top
    // must stamp the current format and keep every pre-upgrade commit
    // reachable, and a fresh open must read the upgraded pointer
    assume(Files.isDirectory(fixture), s"fixture missing at $fixture")
    val (dir, _) = stage()
    val repo = Repository.open(graft.storage.Store.local(dir.toString), spark)
    val preChain = repo.ancestry(VersionRef.Branch("main")).map(_.message)
    val s = repo.writableSession("main")
    s.writeChunk("/climate/series", Seq(0),
      graft.functions.ChunkCodec.encodeLongs(
        Array.tabulate(100)(_.toLong + 7000), "int64"))
    s.commit("post-upgrade commit")
    val tipPath = Files.list(dir.resolve("repo")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("r."))
      .minBy(_.getFileName.toString) // reverse-encoded: min = latest
    val raw = graft.meta.MetaJson.readRepoInfo(
      new String(Files.readAllBytes(tipPath), "UTF-8"))
    assert(raw.specVersion == Repository.SpecVersion,
      s"upgraded pointer carries specVersion ${raw.specVersion}")
    val reopened = Repository.open(graft.storage.Store.local(dir.toString),
      spark)
    val chain = reopened.ancestry(VersionRef.Branch("main")).map(_.message)
    assert(chain == "post-upgrade commit" +: preChain, chain.toString)
    // pre-upgrade data still reads; the new chunk lands
    val tip = reopened.readonlySession(VersionRef.Branch("main"))
    val series = TensorPlane.values(tip, "/climate/series", "int64")
    assert(series.filter(col("i0") === 5).head().getLong(1) == 7005L)
    assert(series.filter(col("i0") === 150).head().getLong(1) == 150L)
  }
}
