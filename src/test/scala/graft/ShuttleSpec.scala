package graft

import graft.repo._
import graft.storage.{ScheduledStore, Store}

/** Deterministic schedule exploration of the CAS/commit path — the analog
  * of the reference's shuttle suite (icechunk/tests/test_shuttle.rs:28-60),
  * which replays exhaustive interleavings instead of hoping a thread race
  * hits the bad one. Store operations are the only cross-thread state, so
  * gating every store op through a scheduler and releasing exactly one
  * blocked thread at a time replays ONE exact interleaving; DFS over the
  * choice tree then covers the protocol's interleaving space up to a
  * schedule budget. Invariants checked after every schedule: no lost
  * writes, gap-free pointer-generation chain, newest-first ops log.
  */
class ShuttleSpec extends SparkTestBase {

  /** One deterministic scheduler run. Worker threads register, then block
    * at every gated store op until [[drive]] releases them one at a time
    * along the decision `path` (index into the sorted waiting set; past
    * the end of the path, always 0 — the DFS default branch). Returns the
    * realized (trace, arities) so the caller can enumerate siblings.
    */
  private final class ShuttleScheduler {
    private val lock = new Object
    private var started = 0
    private var registered = Set.empty[Long]
    private var waiting = Map.empty[Long, String]
    private var granted: Option[Long] = None
    private var done = false

    def register(): Unit = lock.synchronized {
      started += 1
      registered += Thread.currentThread().getId
      lock.notifyAll()
    }

    def finish(): Unit = lock.synchronized {
      registered -= Thread.currentThread().getId
      waiting -= Thread.currentThread().getId
      lock.notifyAll()
    }

    /** The [[ScheduledStore]] gate: unmanaged threads (Spark executors)
      * pass through untouched.
      */
    def gate(op: String, key: String): Unit = {
      val id = Thread.currentThread().getId
      lock.synchronized {
        if (!registered.contains(id) || done) return
        waiting += id -> s"$op:$key"
        lock.notifyAll()
        while (!granted.contains(id) && !done) lock.wait(1000)
        granted = None
        waiting -= id
        lock.notifyAll()
      }
    }

    def drive(nThreads: Int, path: Seq[Int],
              timeoutMs: Long = 180000): (Vector[Int], Vector[Int]) = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      def checkTime(): Unit =
        if (System.nanoTime() > deadline) {
          done = true; lock.notifyAll()
          throw new IllegalStateException("shuttle schedule timed out")
        }
      val trace = Vector.newBuilder[Int]
      val arities = Vector.newBuilder[Int]
      var rest = path.toList
      lock.synchronized {
        while (started < nThreads) { checkTime(); lock.wait(1000) }
        while (registered.nonEmpty) {
          while (registered.nonEmpty && waiting.size < registered.size) {
            checkTime(); lock.wait(1000)
          }
          if (registered.nonEmpty) {
            val choices = waiting.keys.toSeq.sorted
            val pick = rest match {
              case h :: t => rest = t; math.min(h, choices.size - 1)
              case Nil => 0
            }
            trace += pick
            arities += choices.size
            granted = Some(choices(pick))
            lock.notifyAll()
            while (granted.nonEmpty) { checkTime(); lock.wait(1000) }
          }
        }
        done = true
        lock.notifyAll()
      }
      (trace.result(), arities.result())
    }
  }

  /** Run `workers` under the schedule `path`; rethrows the first worker
    * failure; returns the realized choice trace and arities.
    */
  private def runScheduled(path: Vector[Int])(
      mkWorkers: ScheduledStore => (Repository, Seq[() => Unit]))
      : (Vector[Int], Vector[Int], Repository) = {
    val sched = new ShuttleScheduler
    val store = new ScheduledStore(Store.local(tmpDir("shuttle")), sched.gate)
    val (repo, workers) = mkWorkers(store)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = workers.zipWithIndex.map { case (w, i) =>
      new Thread(() => {
        sched.register()
        try w()
        catch { case t: Throwable => errs.add(t) }
        finally sched.finish()
      }, s"shuttle-$i")
    }
    threads.foreach(_.start())
    val (trace, arities) = sched.drive(workers.size, path)
    threads.foreach(_.join(180000))
    if (!errs.isEmpty) throw errs.peek()
    (trace, arities, repo)
  }

  /** DFS over the decision tree: run the default path, then flip one
    * decision at a time (deepest-last frontier), up to `maxSchedules`
    * runs. `check` validates the invariants after every schedule.
    */
  private def explore(maxSchedules: Int,
                      mkWorkers: ScheduledStore => (Repository, Seq[() => Unit]))(
      check: Repository => Unit): Int = {
    var frontier = List(Vector.empty[Int])
    val tried = scala.collection.mutable.Set.empty[Vector[Int]]
    var runs = 0
    while (frontier.nonEmpty && runs < maxSchedules) {
      val prefix = frontier.head
      frontier = frontier.tail
      if (tried.add(prefix)) {
        val (trace, arities, repo) = runScheduled(prefix)(mkWorkers)
        runs += 1
        check(repo)
        var d = prefix.length
        while (d < trace.length) {
          var b = 0
          while (b < arities(d)) {
            if (b != trace(d)) frontier = frontier :+ (trace.take(d) :+ b)
            b += 1
          }
          d += 1
        }
      }
    }
    runs
  }

  /** Pointer chain must be the contiguous range 0..gen — every CAS winner
    * owns exactly one generation, nothing is overwritten or skipped (the
    * reference's unique-backup-paths invariant).
    */
  private def assertGapFreeChain(repo: Repository): Unit = {
    val gens = repo.store.list("repo/").map(o =>
      graft.meta.Layout.genOf(o.key)).sorted
    assert(gens == (0L to repo.info().gen),
      s"pointer chain has gaps or strays: $gens")
  }

  private def assertOpsNewestFirst(repo: Repository): Unit = {
    val ts = repo.opsLog().map(e => java.time.Instant.parse(e.ts))
    ts.sliding(2).foreach {
      case Seq(a, b) => assert(!a.isBefore(b),
        s"ops log out of order: $a before $b")
      case _ => ()
    }
  }

  test("exhaustive schedules: 3 racing branch creators never lose an op") {
    val runs = explore(40, { store =>
      val repo = Repository.create(store, spark)
      val root = repo.lookupBranch("main").get
      (repo, (0 until 3).map(i =>
        () => repo.createBranch(s"b$i", root)))
    }) { repo =>
      val root = repo.lookupBranch("main").get
      (0 until 3).foreach { i =>
        assert(repo.lookupBranch(s"b$i").contains(root), s"b$i lost")
      }
      assertGapFreeChain(repo)
      assertOpsNewestFirst(repo)
      val creates = repo.opsLog().count(_.op == "create_branch")
      assert(creates == 3, s"expected 3 create_branch ops, saw $creates")
    }
    // 3 workers x ~3 gated ops each: the 40-schedule budget must actually
    // explore distinct interleavings, not re-run one
    assert(runs == 40, s"only $runs schedules explored")
  }

  test("scheduled GC vs concurrent commit: no live chunk ever deleted") {
    // the reference's gc-vs-writer protection (ops/gc.rs:360-380 age
    // guard + retry-on-concurrent-update): garbage_collect computes
    // liveness from one pointer read, then deletes — a commit landing
    // anywhere inside that window must keep every chunk its snapshot
    // references, under EVERY explored interleaving of their store ops.
    val payload = Array.tabulate(1024)(_.toByte) // > inline threshold
    val runs = explore(25, { store =>
      val repo = Repository.create(store, spark)
      // reachable base data (must survive GC even though it pre-dates
      // the cutoff: it is live via main's ancestry)
      val s0 = repo.writableSession("main")
      s0.addArray("/a", Seq(8), Seq(1))
      s0.writeChunk("/a", Seq(0), payload)
      s0.commit("base")
      // orphan garbage: a branch committed then deleted — its snapshot,
      // manifest, and chunk object become unreachable
      repo.createBranch("tmp", repo.lookupBranch("main").get)
      val st = repo.writableSession("tmp")
      st.writeChunk("/a", Seq(7), payload.map(b => (b ^ 0x5a).toByte))
      st.commit("orphan")
      repo.deleteBranch("tmp")
      Thread.sleep(30) // mtime granularity: everything above < cutoff
      val cutoff = java.time.Instant.now()
      // file mtimes come from the kernel's COARSE clock, which can lag
      // Instant.now() by a tick — settle past it so racer uploads can
      // never stamp "before" the cutoff (at production cutoffs, hours in
      // the past, this window does not exist; see GC.garbageCollect doc)
      Thread.sleep(50)
      (repo, Seq(
        () => {
          val s = repo.writableSession("main")
          s.writeChunk("/a", Seq(3), payload.map(b => (b ^ 0x33).toByte))
          s.commit("racer")
          ()
        },
        () => {
          graft.ops.GC.garbageCollect(repo, cutoff)
          ()
        }))
    }) { repo =>
      // the racer's commit is on main and every chunk of the final tip
      // resolves — GC never deleted a live object
      val tip = repo.readonlySession(VersionRef.Branch("main"))
      assert(tip.getChunk("/a", Seq(0)).get.toSeq == payload.toSeq,
        "base chunk lost to GC")
      assert(tip.getChunk("/a", Seq(3)).isDefined, "racer chunk lost")
      val messages = repo.ancestry(VersionRef.Branch("main")).map(_.message)
      assert(messages.contains("racer"), "racer commit lost")
      assert(messages.contains("base"))
      assertOpsNewestFirst(repo)
    }
    assert(runs == 25, s"only $runs schedules explored")
  }

  test("scheduled expire vs concurrent commit: history cut, tip intact") {
    val payload = Array.tabulate(600)(_.toByte)
    val runs = explore(15, { store =>
      val repo = Repository.create(store, spark)
      val s0 = repo.writableSession("main")
      s0.addArray("/a", Seq(4), Seq(1))
      s0.writeChunk("/a", Seq(0), payload)
      s0.commit("old-1")
      val s1 = repo.writableSession("main")
      s1.writeChunk("/a", Seq(1), payload)
      s1.commit("old-2")
      Thread.sleep(30)
      val cutoff = java.time.Instant.now()
      Thread.sleep(50) // coarse-clock settle (see the GC race test)
      (repo, Seq(
        () => {
          val s = repo.writableSession("main")
          s.writeChunk("/a", Seq(2), payload)
          s.commit("fresh")
          ()
        },
        () => {
          graft.ops.GC.expire(repo, cutoff)
          ()
        }))
    }) { repo =>
      // whatever the interleaving, the branch tip stays readable and the
      // fresh commit is never lost; expire only squashes pre-cutoff links
      val tip = repo.readonlySession(VersionRef.Branch("main"))
      assert(tip.getChunk("/a", Seq(0)).isDefined, "old chunk data lost")
      assert(tip.getChunk("/a", Seq(2)).isDefined, "fresh chunk lost")
      val messages = repo.ancestry(VersionRef.Branch("main")).map(_.message)
      assert(messages.contains("fresh"), "fresh commit lost")
      assertOpsNewestFirst(repo)
    }
    assert(runs == 15, s"only $runs schedules explored")
  }

  test("scheduled 2-committer races: every interleaving keeps both commits") {
    val runs = explore(10, { store =>
      val repo = Repository.create(store, spark)
      (repo, (0 until 2).map(i => () => {
        val s = repo.writableSession("main")
        s.addGroup(s"/g$i")
        s.commit(s"commit g$i")
        ()
      }))
    }) { repo =>
      // no lost commit: the final tip holds BOTH groups, whichever order
      // the CAS serialized them in (the loser must have rebased)
      val tip = repo.readonlySession(VersionRef.Branch("main"))
      assert(tip.node("/g0").isDefined, "g0 lost")
      assert(tip.node("/g1").isDefined, "g1 lost")
      val messages = repo.ancestry(VersionRef.Branch("main")).map(_.message)
      assert(messages.contains("commit g0") && messages.contains("commit g1"))
      assertGapFreeChain(repo)
      assertOpsNewestFirst(repo)
    }
    assert(runs == 10, s"only $runs schedules explored")
  }

  test("scheduled merge vs concurrent dst commit: neither side's data lost") {
    val runs = explore(8, { store =>
      val repo = Repository.create(store, spark)
      // setup outside the scheduled region: fork with a divergence
      val s0 = repo.writableSession("main")
      s0.addArray("/a", Seq(10), Seq(1))
      val base = s0.commit("base")
      repo.createBranch("side", base)
      val sd = repo.writableSession("side")
      sd.writeChunk("/a", Seq(1), Array[Byte](11))
      sd.commit("side edit")
      val sm = repo.writableSession("main")
      sm.writeChunk("/a", Seq(2), Array[Byte](22))
      sm.commit("main edit")
      (repo, Seq(
        () => { repo.mergeBranch("side", "main"); () },
        () => {
          val s = repo.writableSession("main")
          s.writeChunk("/a", Seq(3), Array[Byte](33))
          s.commit("racer")
          ()
        }))
    }) { repo =>
      // whatever the interleaving, the tip holds the side edit, main's
      // pre-merge edit, AND the racing commit (rebase machinery)
      val tip = repo.readonlySession(VersionRef.Branch("main"))
      assert(tip.getChunk("/a", Seq(1)).exists(_.head == 11), "merge lost")
      assert(tip.getChunk("/a", Seq(2)).exists(_.head == 22), "dst lost")
      assert(tip.getChunk("/a", Seq(3)).exists(_.head == 33), "racer lost")
      assertGapFreeChain(repo)
    }
    assert(runs == 8, s"only $runs schedules explored")
  }

  test("scheduled 2-committer race with a lost CAS success response: " +
      "one landing each, never a duplicate (#2156)") {
    val runs = explore(10, { store =>
      // the first pointer CAS that SUCCEEDS has its success response
      // dropped (the PUT lands, the 200 is lost): the write-id read-back
      // must recognize the landed generation as its own — a committer
      // that instead treated it as a lost race would rebase over ITSELF
      // and land its commit twice
      val lossy = new graft.storage.LostResponseStore(store, losses = 0)
      val repo = Repository.create(lossy, spark)
      lossy.losses = 1
      (repo, (0 until 2).map(i => () => {
        val s = repo.writableSession("main")
        s.addGroup(s"/g$i")
        s.commit(s"commit g$i")
        ()
      }))
    }) { repo =>
      val tip = repo.readonlySession(VersionRef.Branch("main"))
      assert(tip.node("/g0").isDefined, "g0 lost")
      assert(tip.node("/g1").isDefined, "g1 lost")
      val messages = repo.ancestry(VersionRef.Branch("main")).map(_.message)
      assert(messages.count(_ == "commit g0") == 1, s"duplicate g0: $messages")
      assert(messages.count(_ == "commit g1") == 1, s"duplicate g1: $messages")
      assertGapFreeChain(repo)
      assertOpsNewestFirst(repo)
    }
    assert(runs == 10, s"only $runs schedules explored")
  }
}
