package graft

import scala.collection.mutable
import scala.util.Random
import graft.repo._
import graft.storage.Store

/** Stateful model-based test (the analog of the reference's Hypothesis
  * `RuleBasedStateMachine` suites, test_stateful_repo_ops.py:99-230):
  * a seeded random sequence of engine operations runs against a simple
  * in-memory model; after every commit the engine's visible state must
  * equal the model's, and every branch/tag snapshot taken along the way
  * must stay exactly reproducible (time travel is total).
  */
class StatefulModelSpec extends SparkTestBase {

  /** model: branch -> (array path -> coord -> payload byte) */
  type ModelState = mutable.Map[String, mutable.Map[Int, Byte]]

  test("300 random ops: engine state equals model at every commit") {
    val rng = new Random(4242)
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s0 = repo.writableSession("main")
    s0.addArray("/m", Seq(64), Seq(4))
    s0.commit("init")

    val model = mutable.Map[Int, Byte]() // committed state of main:/m
    val snapshots = mutable.ArrayBuffer[(String, Map[Int, Byte])]()
    var session = repo.writableSession("main")
    val pending = mutable.Map[Int, Option[Byte]]() // None = delete

    def verifyAgainst(state: Map[Int, Byte], ver: VersionRef): Unit = {
      val ro = repo.readonlySession(ver)
      assert(ro.refs("/m").count() == state.size,
        s"ref count mismatch at $ver")
      // sample a few cells incl. absent ones
      val coords = (state.keys.take(3) ++ Seq(0, 17, 63)).toSet
      coords.foreach { c =>
        val got = ro.getChunk("/m", Seq(c)).map(_.head)
        assert(got == state.get(c),
          s"cell $c mismatch at $ver: got $got want ${state.get(c)}")
      }
    }

    for (step <- 1 to 300) {
      rng.nextInt(10) match {
        case 0 | 1 | 2 | 3 | 4 => // write
          val c = rng.nextInt(16)
          val v = rng.nextInt(120).toByte
          session.writeChunk("/m", Seq(c), Array(v))
          pending(c) = Some(v)
        case 5 => // delete a (possibly missing) chunk
          val c = rng.nextInt(16)
          session.deleteChunk("/m", Seq(c))
          pending(c) = None
        case 6 | 7 => // commit pending edits
          if (pending.nonEmpty) {
            session.commit(s"step $step")
            pending.foreach {
              case (c, Some(v)) => model(c) = v
              case (c, None) => model.remove(c)
            }
            pending.clear()
            verifyAgainst(model.toMap, VersionRef.Branch("main"))
          }
        case 8 => // snapshot the current committed state under a tag
          if (rng.nextBoolean() && snapshots.size < 8) {
            val tip = repo.lookupBranch("main").get
            val name = s"t${snapshots.size}"
            repo.createTag(name, tip)
            snapshots += ((name, model.toMap))
          }
        case 9 => // discard pending edits
          session.discardChanges()
          pending.clear()
      }
      if (session.changeSet.isEmpty && rng.nextInt(4) == 0)
        session = repo.writableSession("main")
    }
    if (pending.nonEmpty) {
      session.commit("final")
      pending.foreach {
        case (c, Some(v)) => model(c) = v
        case (c, None) => model.remove(c)
      }
    }
    // the tip equals the model...
    verifyAgainst(model.toMap, VersionRef.Branch("main"))
    // ...and every tagged historical state is still exactly reproducible
    snapshots.foreach { case (tag, state) =>
      verifyAgainst(state, VersionRef.Tag(tag))
    }
    assert(snapshots.nonEmpty, "scenario should have taken tags")
  }

  /** Widened op vocabulary (VERDICT r11 #7): the reference's stateful
    * suite covers commits/branches/tags/GC; merge/expire/rechunk
    * interactions are where silent metadata bugs hide. Many SHORT seeded
    * sequences (default 100, `GRAFT_MODEL_SEQS` overrides) each drive a
    * fresh repo through writes/deletes/fork-edit-merge/rechunk/tag/expire
    * against a chunk-level byte model; the tip must equal the model after
    * every commit-granular op, and every tagged historical state must
    * stay exactly reproducible across LATER rechunks (old grid) and
    * expirations (squashed ancestry, snapshot files retained).
    */
  test("widened vocabulary: merge/expire/rechunk sequences match the model") {
    val seqs = sys.env.getOrElse("GRAFT_MODEL_SEQS", "100").toInt
    for (seed <- 1 to seqs) runSequence(seed)
  }

  private def runSequence(seed: Int): Unit = {
    val rng = new Random(9000 + seed)
    val repo = Repository.create(Store.local(tmpDir(s"mrepo$seed")), spark)
    locally {
      val s0 = repo.writableSession("main")
      s0.addArray("/m", Seq(64), Seq(4))
      s0.commit("init")
    }
    var cs = 4 // current chunk size (4 | 8 | 16 — all divide 64)
    def nChunks = 64 / cs
    // committed state of main:/m — full-chunk payloads by chunk index
    val chunks = mutable.Map[Int, Array[Byte]]()
    // tag -> (chunk size at tag time, deep-copied state)
    val tags = mutable.ArrayBuffer[(String, Int, Map[Int, Array[Byte]])]()

    def verify(state: Map[Int, Array[Byte]], size: Int,
               ver: VersionRef, full: Boolean): Unit = {
      val ro = repo.readonlySession(ver)
      assert(ro.refs("/m").count() == state.size,
        s"seed $seed: ref count at $ver")
      val sample =
        if (full) (0 until 64 / size).toSeq
        else (state.keys.take(2) ++ Seq(rng.nextInt(64 / size))).toSeq
      sample.foreach { c =>
        val got = ro.getChunk("/m", Seq(c))
        (got, state.get(c)) match {
          case (Some(g), Some(w)) =>
            assert(java.util.Arrays.equals(g, w),
              s"seed $seed: chunk $c bytes at $ver")
          case (None, None) => ()
          case other => fail(s"seed $seed: chunk $c presence at $ver: $other")
        }
      }
    }

    for (step <- 1 to 8) {
      rng.nextInt(20) match {
        case n if n < 9 => // batch write + maybe delete, one commit
          val s = repo.writableSession("main")
          val writes = (0 to rng.nextInt(2)).map { _ =>
            (rng.nextInt(nChunks),
              Array.fill(cs)(rng.nextInt(120).toByte)) }
          writes.foreach { case (c, v) => s.writeChunk("/m", Seq(c), v) }
          val del = if (rng.nextBoolean()) Some(rng.nextInt(nChunks)) else None
          del.foreach(c => s.deleteChunk("/m", Seq(c)))
          s.commit(s"step $step")
          // model applies in session call order: writes first, delete
          // last — so a coord both written and deleted in one batch nets
          // to deleted, same as the changeset
          writes.foreach { case (c, v) => chunks(c) = v }
          del.foreach(chunks.remove)
          verify(chunks.toMap, cs, VersionRef.Branch("main"), full = false)
        case n if n < 12 => // fork-edit-(concurrent main edit)-merge
          val tip = repo.lookupBranch("main").get
          val bn = s"seq$step"
          repo.createBranch(bn, tip)
          val f = repo.writableSession(bn)
          // branch edits upper half, concurrent main edit lower half —
          // disjoint by construction, so the 3-way merge applies both
          val bc = nChunks / 2 + rng.nextInt(nChunks / 2)
          val bv = Array.fill(cs)((64 + rng.nextInt(60)).toByte)
          f.writeChunk("/m", Seq(bc), bv)
          f.commit("branch edit")
          val mainEdit = if (rng.nextBoolean()) {
            val m = repo.writableSession("main")
            val mc = rng.nextInt(nChunks / 2)
            val mv = Array.fill(cs)(rng.nextInt(60).toByte)
            m.writeChunk("/m", Seq(mc), mv)
            m.commit("main edit during fork")
            Some((mc, mv))
          } else None
          repo.mergeBranch(bn, "main")
          repo.deleteBranch(bn)
          mainEdit.foreach { case (c, v) => chunks(c) = v }
          chunks(bc) = bv
          verify(chunks.toMap, cs, VersionRef.Branch("main"), full = false)
        case n if n < 15 => // rechunk onto a different grid
          val ncs = rng.shuffle(Seq(4, 8, 16).filter(_ != cs)).head
          val s = repo.writableSession("main")
          graft.tensor.TensorPlane.rechunk(s, "/m", Seq(ncs.toLong), "int8")
          s.commit(s"rechunk $cs -> $ncs")
          val next = mutable.Map[Int, Array[Byte]]()
          for (j <- 0 until 64 / ncs) {
            val srcs = (j * ncs / cs) until
              math.min(((j + 1) * ncs + cs - 1) / cs, 64 / cs)
            if (srcs.exists(chunks.contains))
              next(j) = Array.tabulate(ncs) { k =>
                val g = j * ncs + k
                chunks.get(g / cs)
                  .map(a => if (g % cs < a.length) a(g % cs) else 0.toByte)
                  .getOrElse(0.toByte)
              }
          }
          chunks.clear(); chunks ++= next
          cs = ncs
          verify(chunks.toMap, cs, VersionRef.Branch("main"), full = false)
        case n if n < 17 => // tag the committed state (bounded per seq)
          if (tags.size < 3) {
            val name = s"t${tags.size}"
            repo.createTag(name, repo.lookupBranch("main").get)
            tags += ((name, cs, chunks.map { case (k, v) =>
              k -> v.clone() }.toMap))
          }
        case _ => // expire everything but the tips; tags must survive
          graft.ops.GC.expire(repo, java.time.Instant.now().plusSeconds(60))
          assert(repo.ancestry(VersionRef.Branch("main")).size == 1,
            s"seed $seed: expire left extra ancestry")
          verify(chunks.toMap, cs, VersionRef.Branch("main"), full = false)
      }
    }
    // end of sequence: the tip equals the model cell-for-cell, and every
    // tag reproduces its recorded state on its recorded grid
    verify(chunks.toMap, cs, VersionRef.Branch("main"), full = true)
    tags.foreach { case (name, size, state) =>
      verify(state, size, VersionRef.Tag(name), full = true)
    }
  }

  test("zarr store model: 200 random string-keyed ops match a dict, " +
      "impossible deletes no-op (#2312)") {
    val rng = new Random(777)
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val store = new graft.zarr.ZarrStore(repo.writableSession("main"))
    store.set("a/zarr.json",
      ("""{"zarr_format":3,"node_type":"array","shape":[80],""" +
        """"chunk_grid":{"name":"regular","configuration":""" +
        """{"chunk_shape":[5]}}}""").getBytes)
    val model = mutable.Map[Int, Byte]() // chunk index -> payload head
    for (step <- 1 to 200) {
      rng.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // in-grid chunk write (16 chunks)
          val c = rng.nextInt(16)
          val v = rng.nextInt(120).toByte
          store.set(s"a/c/$c", Array(v))
          model(c) = v
        case 4 => // in-grid delete, present or not: model delete
          val c = rng.nextInt(16)
          store.delete(s"a/c/$c")
          model.remove(c)
        case 5 => // impossible deletes are no-ops, never errors (#2312)
          rng.nextInt(3) match {
            case 0 => store.delete(s"a/c/${16 + rng.nextInt(100)}")
            case 1 => store.delete("missing/c/0")
            case 2 => store.delete("missing/zarr.json")
          }
        case 6 => // out-of-grid / missing-node WRITES still reject
          intercept[GraftException](
            store.set(s"a/c/${16 + rng.nextInt(100)}", Array[Byte](1)))
          intercept[GraftException](
            store.set("missing/c/0", Array[Byte](1)))
        case 7 | 8 => // point read equals the model
          val c = rng.nextInt(20)
          assert(store.get(s"a/c/$c").map(_.head) == model.get(c),
            s"step $step chunk $c")
          assert(store.exists(s"a/c/$c") == model.contains(c))
        case 9 => // full listing equals the model's key set
          val keys = store.listPrefix("a/c").toSet
          assert(keys == model.keys.map(c => s"a/c/$c").toSet,
            s"step $step listing mismatch")
      }
    }
    // commit and re-read through a fresh session: state survives
    store.session.commit("model final")
    val ro = new graft.zarr.ZarrStore(
      repo.readonlySession(VersionRef.Branch("main")))
    model.foreach { case (c, v) =>
      assert(ro.get(s"a/c/$c").map(_.head).contains(v))
    }
    assert(ro.getSizePrefix("a/c") == model.size.toLong) // 1 byte each
  }

  test("tensor model: random region writes then region reads match the array") {
    import org.apache.spark.sql.functions._
    val rng = new Random(7)
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s0 = repo.writableSession("main")
    s0.addArray("/t", Seq(64), Seq(8))
    val model = Array.tabulate(64)(i => i.toDouble)
    def df(vals: Seq[(Long, Double)]) = {
      import spark.implicits._
      vals.toDF("i0", "value")
    }
    graft.tensor.TensorPlane.writeValues(s0, "/t",
      df(model.indices.map(i => (i.toLong, model(i)))), "float64")
    s0.commit("init")

    for (round <- 1 to 8) {
      // chunk-aligned region write [a*8, b*8)
      val a = rng.nextInt(8)
      val b = a + 1 + rng.nextInt(8 - a)
      val s = repo.writableSession("main")
      val vals = (0 until (b - a) * 8).map(j =>
        (j.toLong, rng.nextInt(1000).toDouble))
      graft.tensor.TensorPlane.writeRegion(s, "/t", df(vals),
        offsets = Seq(a * 8L), "float64")
      vals.foreach { case (j, v) => model(a * 8 + j.toInt) = v }
      s.commit(s"region $round")

      // arbitrary (unaligned) region read + kernel stats vs the model
      val ro = repo.readonlySession(VersionRef.Branch("main"))
      val lo = rng.nextInt(60).toLong
      val hi = lo + 1 + rng.nextInt((64 - lo).toInt)
      val got = graft.tensor.TensorPlane
        .valuesRegion(ro, "/t", "float64", Seq((lo, hi)))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = (lo until hi).map(i => i -> model(i.toInt)).toMap
      assert(got == want, s"region [$lo,$hi) mismatch at round $round")
      val st = graft.tensor.TensorPlane
        .sliceStats(ro, "/t", "float64", Seq((lo, hi))).head()
      assert(st.getAs[Long]("n") == hi - lo)
      assert(st.getAs[Double]("sum") == want.values.sum)
      assert(st.getAs[Double]("min") == want.values.min)
      assert(st.getAs[Double]("max") == want.values.max)
    }
  }
}
