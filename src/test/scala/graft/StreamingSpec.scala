package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.repo._
import graft.storage.Store
import graft.streaming.StreamingAppend

class StreamingSpec extends SparkTestBase {

  test("streaming appends commit one snapshot per micro-batch") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s0 = repo.writableSession("main")
    s0.addArray("/stream", Seq(1000), Seq(1))
    s0.commit("init")

    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val stream = source.toDF().select(col("value"))

    // data must be in the source BEFORE start: AvailableNow snapshots
    // the available offsets at query start, so late addData races the
    // planner and the query can exit having committed nothing
    source.addData(0L until 10L: _*)
    val query = StreamingAppend.start(stream, repo, "main",
      tmpDir("ckpt"), Trigger.AvailableNow()) { (session, batch, _) =>
      val refs = batch.select(
        array(col("value").cast("int")).as("coord"),
        lit("virtual").as("kind"),
        concat(lit("file:///ext/"), col("value")).as("location"),
        lit(0L).as("offset"), lit(8L).as("length"))
      session.stageChunkRefs("/stream", refs)
    }
    query.processAllAvailable()
    query.stop()

    source.addData(10L until 25L: _*)
    val q2 = StreamingAppend.start(stream, repo, "main",
      tmpDir("ckpt2"), Trigger.AvailableNow()) { (session, batch, _) =>
      val refs = batch.select(
        array(col("value").cast("int")).as("coord"),
        lit("virtual").as("kind"),
        concat(lit("file:///ext/"), col("value")).as("location"),
        lit(0L).as("offset"), lit(8L).as("length"))
      session.stageChunkRefs("/stream", refs)
    }
    q2.processAllAvailable()
    q2.stop()

    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/stream").count() == 25)
    // one commit per non-empty micro-batch, linear history
    val msgs = repo.ancestry(VersionRef.Branch("main")).map(_.message)
    assert(msgs.count(_.startsWith("stream batch")) >= 2)
  }

  test("change feed: batch + micro-batch tail of the commit log") {
    val dir = tmpDir("repo")
    val repo = Repository.create(Store.local(dir), spark)
    val s0 = repo.writableSession("main")
    s0.addArray("/a", Seq(16), Seq(1))
    (0 until 3).foreach(c => s0.writeChunk("/a", Seq(c), Array[Byte](1)))
    s0.commit("c1")
    val s1 = repo.writableSession("main")
    (3 until 5).foreach(c => s1.writeChunk("/a", Seq(c), Array[Byte](2)))
    s1.commit("c2")

    // batch: whole history, commit-stamped, newest commit has seq = depth
    val all = spark.read.format("graft-changes").option("path", dir).load()
    val byMsg = all.groupBy("message").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMsg("c1") == 4L) // new_array + 3 chunk edits
    assert(byMsg("c2") == 2L)
    val seqs = all.select("message", "seq").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seqs("c2") == seqs("c1") + 1)

    // streaming: first run drains history, second run (same checkpoint)
    // emits ONLY the commit appended in between
    val ckpt = tmpDir("cf-ckpt")
    val got = scala.collection.mutable.ArrayBuffer[String]()
    def run(): Unit = {
      val q = spark.readStream.format("graft-changes")
        .option("path", dir).load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized {
            got ++= df.select("message").collect().map(_.getString(0))
          }: Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(got.size == 6, got)
    got.clear()
    val s2 = repo.writableSession("main")
    s2.writeChunk("/a", Seq(9), Array[Byte](3))
    s2.commit("c3")
    run()
    assert(got.toSeq == Seq("c3"), got)
  }

  test("continuous mirror: the change feed triggers incremental pushes") {
    val dir = tmpDir("mirror-src")
    val repo = Repository.create(Store.local(dir), spark)
    val s0 = repo.writableSession("main")
    s0.addArray("/a", Seq(8), Seq(2))
    s0.writeChunk("/a", Seq(0), Array.fill(1024)(1.toByte))
    s0.commit("c1")
    val mirror = Store.local(tmpDir("mirror-dst"))
    val ckpt = tmpDir("mirror-ckpt")
    // follow = change feed + incremental sync per micro-batch: each push
    // copies only the new closure delta (content-addressed skips)
    def follow(): Unit = {
      val q = spark.readStream.format("graft-changes")
        .option("path", dir).load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!df.isEmpty) {
            graft.ops.Replicate.sync(repo, mirror, "main")
            ()
          }: Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    follow()
    assert(Repository.open(mirror, spark).lookupBranch("main") ==
      repo.lookupBranch("main"))
    val s1 = repo.writableSession("main")
    s1.writeChunk("/a", Seq(1), Array.fill(1024)(2.toByte))
    s1.commit("c2")
    follow()
    val m = Repository.open(mirror, spark)
    assert(m.lookupBranch("main") == repo.lookupBranch("main"))
    assert(m.readonlySession(VersionRef.Branch("main"))
      .getChunk("/a", Seq(1)).get.head == 2)
  }

  test("cell-level change feed: pollValues emits exactly the changed " +
      "cells per poll") {
    import graft.functions.ChunkCodec
    val dir = tmpDir("vcf")
    val repo = Repository.create(Store.local(dir), spark)
    val s0 = repo.writableSession("main")
    s0.addArray("/a", Seq(20), Seq(5))
    for (c <- 0 until 4)
      s0.writeChunk("/a", Seq(c), ChunkCodec.encodeLongs(
        Array.tabulate(5)(i => c * 5L + i), "int64"))
    val base = s0.commit("base")

    // no movement -> no batch
    assert(graft.streaming.ChangesFeed.pollValues(repo, "main", base,
      "/a", "int64").isEmpty)

    // one chunk rewritten, one cell actually changed
    val s1 = repo.writableSession("main")
    val edited = Array.tabulate(5)(i => 10L + i); edited(2) = -7L
    s1.writeChunk("/a", Seq(2), ChunkCodec.encodeLongs(edited, "int64"))
    s1.commit("patch")
    val Some((tip1, batch1)) = graft.streaming.ChangesFeed.pollValues(
      repo, "main", base, "/a", "int64")
    val rows1 = batch1.collect()
    assert(rows1.length == 1)
    assert(rows1.head.getLong(0) == 12 && rows1.head.getLong(1) == 12 &&
      rows1.head.getLong(2) == -7)

    // subsequent poll from the consumed tip sees only the NEXT commit
    val s2 = repo.writableSession("main")
    s2.writeChunk("/a", Seq(0), ChunkCodec.encodeLongs(
      Array.fill(5)(99L), "int64"))
    s2.commit("rewrite chunk 0")
    val Some((_, batch2)) = graft.streaming.ChangesFeed.pollValues(
      repo, "main", tip1, "/a", "int64")
    val rows2 = batch2.collect()
    assert(rows2.length == 5) // 0..4 all changed to 99
    assert(rows2.forall(_.getLong(2) == 99L))
    assert(rows2.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("stateful streaming sessions: gap timeout closes via watermark, in-batch gap splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val stream = source.toDF().toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val sessions = graft.streaming.StreamingSessions.sessions(
      stream, gapSeconds = 30, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("ssess")
      .outputMode("append").start()
    // u1: two events 10s apart (one session); u2: an IN-BATCH gap of
    // 100s -> the first singleton session emits from the fold itself.
    // The batch's own watermark (110s) then also times out u1's session
    // (last 20 + gap 30 < 110) on the drain; u2's second stays open.
    source.addData((1L, 10L), (1L, 20L), (2L, 10L), (2L, 110L))
    q.processAllAvailable()
    val early = spark.table("ssess").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(early.toSet == Set((2L, 10L, 10L, 1), (1L, 10L, 20L, 2)))
    // advance the watermark far past every open session's last+gap:
    // both remaining sessions time out and emit
    source.addData((99L, 1000L))
    q.processAllAvailable()
    source.addData((99L, 2000L)) // push watermark past 1000+30 too
    q.processAllAvailable()
    q.stop()
    val all = spark.table("ssess").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4))).toSet
    assert(all.contains((1L, 10L, 20L, 2, 10L)), all)   // u1 session
    assert(all.contains((2L, 110L, 110L, 1, 0L)), all)  // u2 second
    assert(all.contains((99L, 1000L, 1000L, 1, 0L)), all)
  }

  test("streaming funnel: ordered advances across batches; completed users cannot restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val stream = source.toDF().toDF("user_id", "event_type", "sec")
      .select(col("user_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))
    val prog = graft.streaming.StreamingFunnel.progress(
      stream, Seq("a", "b", "c"), withinSeconds = 100L)
    val q = prog.writeStream.format("memory").queryName("sfunnel")
      .outputMode("append").start()
    // u1: a then b in batch 1; u2: b BEFORE a never advances past a;
    // u3: a then b at the same instant (strict > refuses b)
    source.addData((1L, "a", 10L), (1L, "b", 20L),
      (2L, "b", 5L), (2L, "a", 10L), (3L, "a", 10L), (3L, "b", 10L))
    q.processAllAvailable()
    val r1 = spark.table("sfunnel").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(r1 == Set((1L, 1, "a"), (1L, 2, "b"), (2L, 1, "a"),
      (3L, 1, "a")))
    // batch 2: u1 completes; a later duplicate 'c' and even a fresh
    // 'a' (restart attempt) emit nothing against the completed
    // sentinel; u2's c cannot skip b; u3's horizon-busted b refused
    source.addData((1L, "c", 30L), (1L, "c", 40L), (1L, "a", 150L),
      (2L, "c", 120L), (3L, "b", 200L))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("sfunnel").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(all == Set((1L, 1, "a", 10L), (1L, 2, "b", 20L),
      (1L, 3, "c", 30L), (2L, 1, "a", 10L), (3L, 1, "a", 10L)), all)
  }

  test("streaming funnel: no-advance user takes no state; watermark advance survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    // REALISTIC epoch timestamps: the regression this pins was a state
    // initialized at last=Long.MinValue whose timeout overflowed to
    // ~epoch-1970 — the moment the watermark advanced past any real
    // event time, Spark failed the whole query ('Timeout timestamp
    // cannot be earlier than the current watermark')
    val base = 1700000000L
    val stream = source.toDF().toDF("user_id", "event_type", "sec")
      .select(col("user_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))
    val prog = graft.streaming.StreamingFunnel.progress(
      stream, Seq("a", "b"), expireAfterSeconds = 3600L,
      watermarkDelay = "5 seconds")
    val q = prog.writeStream.format("memory").queryName("sfunnel_nostate")
      .outputMode("append").start()
    // batch 1: u9's FIRST batch has no stage-1 event -> must not
    // materialize state; u1 advances normally
    source.addData((9L, "b", base), (9L, "zz", base + 1),
      (1L, "a", base + 2))
    q.processAllAvailable()
    // batch 2: much later events push the watermark far past batch 1 —
    // with the buggy state this is where the query died
    source.addData((1L, "b", base + 1000), (9L, "a", base + 1000))
    q.processAllAvailable()
    // batch 3: expiry housekeeping at yet-later times still works
    source.addData((2L, "a", base + 8000))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("sfunnel_nostate").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(all == Set((1L, 1, "a", base + 2), (1L, 2, "b", base + 1000),
      (9L, 1, "a", base + 1000), (2L, 1, "a", base + 8000)), all)
  }

  test("streaming exact dedup suppresses in-window duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = source.toDF().toDF("sec", "text")
      .select(timestamp_seconds(col("sec")).as("ts"), col("text"))
    val deduped = graft.streaming.StreamingDedup.exact(
      stream, delay = "1 hour")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    source.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
    q.processAllAvailable()
    source.addData((100L, "alpha"), (101L, "gamma"))
    q.processAllAvailable()
    q.stop()
    val texts = spark.table("sdedup").select("text").collect()
      .map(_.getString(0)).toSeq
    // both "alpha" copies land inside the watermark window -> one survivor
    assert(texts.sorted == Seq("alpha", "beta", "gamma"), texts)
  }

  test("DSv2 streaming values sink: writeStream format(graft-v2), one " +
      "commit per epoch with exactly-once markers") {
    val dir = tmpDir("v2stream")
    val repo = Repository.create(Store.local(dir), spark)
    val s0 = repo.writableSession("main")
    s0.addArray("/a", Seq(16), Seq(4), userData = """{"dtype":"int64"}""")
    s0.commit("init")

    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    // (i0, value) + precomputed chunk-coord helper — the provider-route
    // clustered plan, per micro-batch
    val q = source.toDF().selectExpr("value as i0", "value * 3 as value",
        "value div 4 as _c0")
      .writeStream.format("graft-v2")
      .option("path", dir).option("array", "/a")
      .option("mode", "values").option("dtype", "int64")
      .option("clustered", "true")
      .option("checkpointLocation", tmpDir("v2ckpt"))
      .start()
    source.addData(0L until 8L: _*)
    q.processAllAvailable()
    source.addData(8L until 16L: _*)
    q.processAllAvailable()
    q.stop()

    val back = spark.read.format("graft-v2")
      .option("path", dir).option("array", "/a")
      .option("mode", "values").option("dtype", "int64").load()
    assert(back.count() == 16)
    assert(back.agg(sum("value")).head().getLong(0) ==
      (0 until 16).map(_ * 3L).sum)

    // each non-empty epoch committed once, stamped with query/epoch props
    val marked = repo.ancestry(VersionRef.Branch("main"))
      .map(si => repo.assets.readSnapshot(si.id))
      .filter(_.properties.contains(
        graft.sources.GraftStreamingWrite.QueryProp))
    assert(marked.size == 2, marked.map(_.message))
    assert(marked.map(_.properties(
      graft.sources.GraftStreamingWrite.EpochProp)).toSet == Set("0", "1"))
  }

  test("streaming epoch replay is skipped (lost-ack commit recovery)") {
    val dir = tmpDir("v2replay")
    val repo = Repository.create(Store.local(dir), spark)
    val s0 = repo.writableSession("main")
    s0.addArray("/a", Seq(8), Seq(4), userData = """{"dtype":"int64"}""")
    s0.commit("init")
    val opts = Map("path" -> dir, "array" -> "/a", "mode" -> "refs")
    val w = new graft.sources.GraftStreamingWrite(opts, "query-xyz",
      new graft.sources.GraftBatchWrite(opts,
        graft.sources.GraftTableProvider.RefSchema))
    val none = Array.empty[org.apache.spark.sql.connector.write.WriterCommitMessage]
    w.commit(0L, none)
    w.commit(0L, none) // replay after a lost acknowledgement
    w.commit(1L, none)
    w.commit(1L, none)
    val depth0 = repo.ancestry(VersionRef.Branch("main")).size
    // init commit + repo-init + exactly TWO epoch commits — replays no-op
    def epochs() = repo.ancestry(VersionRef.Branch("main"))
      .map(si => repo.assets.readSnapshot(si.id))
      .filter(_.properties.get(
        graft.sources.GraftStreamingWrite.QueryProp).contains("query-xyz"))
    assert(epochs().size == 2, s"depth=$depth0")
    assert(epochs().map(_.properties(
      graft.sources.GraftStreamingWrite.EpochProp)).toSet == Set("0", "1"))

    // replay detection survives OTHER writers' commits landing between
    // the original epoch and its replay (the marker is no longer at the
    // tip — the bounded ancestry walk finds it deeper)
    (0 until 3).foreach { i =>
      val o = repo.writableSession("main")
      o.writeChunk("/a", Seq(i % 2), Array[Byte](9))
      o.commit(s"other writer $i")
    }
    w.commit(1L, none) // replay of epoch 1, three commits deep
    assert(epochs().size == 2, "replay behind foreign commits must no-op")
  }

  test("cell-changes streaming source: each micro-batch carries exactly " +
      "the changed cells, checkpointed offsets resume") {
    val dir = tmpDir("cc-repo")
    val repo = Repository.create(Store.local(dir), spark)
    val s0 = repo.writableSession("main")
    s0.addArray("/v", Seq(30), Seq(10), userData = """{"dtype":"int64"}""")
    for (c <- 0 until 3) s0.writeChunk("/v", Seq(c),
      graft.functions.ChunkCodec.encodeLongs(
        Array.tabulate(10)(i => (c * 10 + i).toLong), "int64"))
    s0.commit("base")

    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val ckpt = tmpDir("cc-ckpt")
    def run(): Unit = {
      val q = spark.readStream.format("graft-cell-changes")
        .option("path", dir).option("array", "/v")
        .option("dtype", "int64").load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized {
            got ++= df.select("i0", "old_value", "new_value").collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          }: Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // first drain: baseline = every current cell as (0 -> v); cell 0
    // holds the fill value so 0 -> 0 is correctly NOT a change
    run()
    assert(got.size == 29, s"baseline ${got.size}")
    assert(got.forall { case (i, o, n) => o == 0L && n == i && i != 0 })
    got.clear()

    // a one-cell patch: exactly one row arrives on resume
    val s1 = repo.writableSession("main")
    val chunk = graft.functions.ChunkCodec.encodeLongs(
      Array.tabulate(10)(i => if (i == 5) 999L else (10 + i).toLong),
      "int64")
    s1.writeChunk("/v", Seq(1), chunk)
    s1.commit("patch cell 15")
    run()
    assert(got.toSeq == Seq((15L, 15L, 999L)), got)
    got.clear()

    // no movement -> empty batch
    run()
    assert(got.isEmpty, got)
  }
}
