package graft.tools

import org.apache.spark.sql.SparkSession
import graft.repo._
import graft.storage.{LatencyStore, LoggingStore, Store}

/** Object-store latency soak (round 13): measure the engine's driver-side
  * metadata paths under injected per-operation RTT, and count the store
  * round trips on each critical path.
  *
  * Motivation: every prior bench/soak ran against local disk (sub-ms
  * RTT), while the production target is an object store at 50–200 ms RTT
  * — where cost is #round-trips, not bytes (the reference's own latency
  * recipe: MinIO+toxiproxy, `icechunk/benches/README.md`,
  * `ICECHUNK_BENCH_LATENCY_MS`). A path that is "fast" locally but
  * performs N *sequential* store operations costs N×RTT there; this tool
  * reports, per workload entry: wall time, total store ops by kind, and
  * the effective serial-RTT depth (wall / RTT), which is the number the
  * fixes drive down.
  *
  * Scope: the latency decorator wraps the `Store` interface, which
  * carries the metadata plane (pointer chain, segments, snapshots,
  * driver-side manifest shards, chunk blobs through the byte cache).
  * Spark executor scans read Parquet through `file:`/`graft:` URIs and
  * are parallel by construction — their latency behavior is governed by
  * task parallelism, not by the driver chains under test here.
  *
  * Usage: `runMain graft.tools.LatencySoak [rttMs ...]` (default:
  * 0 50 150). The repo is BUILT at zero latency (setup is not under
  * test), then reopened behind `LatencyStore` for the measured phase.
  */
object LatencySoak {

  final case class Entry(name: String, rttMs: Long, wallMs: Long,
                         ops: Map[String, Long]) {
    def totalOps: Long = ops.values.sum
    def serialDepth: String =
      if (rttMs == 0) "-" else f"${wallMs.toDouble / rttMs}%.1f"
    def render: String =
      f"$name%-28s rtt=$rttMs%4dms wall=$wallMs%6dms serialRTTs=$serialDepth%6s " +
        s"ops=[${ops.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" ")}]"
  }

  def main(args: Array[String]): Unit = {
    val rtts = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(0L, 50L, 150L)
    val spark = SparkSession.builder()
      .appName("graft-latency-soak").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try rtts.foreach(rtt => soakOnce(spark, rtt))
    finally spark.stop()
  }

  private def soakOnce(spark: SparkSession, rttMs: Long): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"latsoak-$rttMs")
    val raw = Store.local(dir.toString)

    // ---- build phase (zero latency): 400-commit history, two arrays ----
    val cfg = GraftConfig(snapshotIndexWindow = 16,
      splits = Seq(SplitRule(".*", 0, 8)))
    val build = Repository.create(raw, spark, cfg)
    locally {
      val s = build.writableSession("main")
      s.addArray("/a", Seq(512), Seq(4)) // 128 chunks / 16 splits
      s.commit("init")
    }
    (0 until 400).foreach { i =>
      val s = build.writableSession("main")
      s.writeChunk("/a", Seq(i % 128), Array[Byte](i.toByte, 1, 2, 3))
      s.commit(s"c$i")
    }

    // ---- measured phase: fresh Repository over latency + counting ----
    val counting = new LoggingStore(new LatencyStore(raw, rttMs), _ => ())
    def measure(name: String)(body: Repository => Unit)(
        implicit repo: Repository): Entry = {
      counting.counts.clear()
      val t0 = System.nanoTime()
      body(repo)
      val e = Entry(name, rttMs, (System.nanoTime() - t0) / 1000000L,
        {
          import scala.jdk.CollectionConverters._
          counting.counts.asScala.map { case (k, v) => k -> v.get() }.toMap
        })
      println("SOAK " + e.render)
      e
    }

    implicit val repo: Repository = {
      counting.counts.clear()
      val t0 = System.nanoTime()
      val r = Repository.open(counting, spark)
      r.info() // force pointer load + full segment hydration
      val e = Entry("open_cold_depth400", rttMs,
        (System.nanoTime() - t0) / 1000000L,
        {
          import scala.jdk.CollectionConverters._
          counting.counts.asScala.map { case (k, v) => k -> v.get() }.toMap
        })
      println("SOAK " + e.render)
      r
    }

    measure("commit_small_x10") { r =>
      (0 until 10).foreach { i =>
        val s = r.writableSession("main")
        s.writeChunk("/a", Seq((i * 13) % 128), Array[Byte](9, 9, 9, 9))
        s.commit(s"soak $i")
      }
    }
    measure("lookup_cold_serial_x20") { r =>
      val ro = r.readonlySession(VersionRef.Branch("main"))
      (0 until 20).foreach(i => ro.getChunkRef("/a", Seq(i * 6 + 1)))
    }
    // fresh session/assets? split cache is per-AssetManager (per repo) —
    // use coords in splits the serial pass did not touch
    measure("lookup_cold_batch_x20") { r =>
      val ro = r.readonlySession(VersionRef.Branch("main"))
      ro.getChunkRefs("/a", (0 until 20).map(i => Seq(i * 6 + 3)))
    }
    measure("lookup_hot_x20") { r =>
      val ro = r.readonlySession(VersionRef.Branch("main"))
      (0 until 20).foreach(i => ro.getChunkRef("/a", Seq(i * 6 + 1)))
    }
    measure("ops_log_full") { r => r.opsLog() }
    measure("fsck_main") { r =>
      graft.ops.Integrity.check(r, "main").count()
    }
    // push: DRIVER-side metadata phase through the latency store (the
    // executor-side payload copies re-open the raw store via StoreConf
    // and are parallel by construction — out of scope here)
    measure("push_first") { r =>
      val dst = java.nio.file.Files.createTempDirectory(s"latsoak-dst-$rttMs")
      val dstStore =
        new LatencyStore(Store.local(dst.toString), rttMs)
      graft.ops.Replicate.sync(r, dstStore, "main")
    }
    measure("branch_tag_admin") { r =>
      r.createTag("soak-tag", r.lookupBranch("main").get)
      r.deleteTag("soak-tag")
    }
    measure("expire_keep_tip") { r =>
      graft.ops.GC.expire(r, java.time.Instant.now().plusSeconds(60))
    }
    measure("gc_full") { r =>
      graft.ops.GC.garbageCollect(r,
        java.time.Instant.now().plusSeconds(3600))
    }
    println()
  }
}
