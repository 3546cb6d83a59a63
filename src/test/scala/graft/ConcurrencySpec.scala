package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import graft.repo._
import graft.storage.Store

/** Commit-race tests — the Spark analog of the reference's deterministic
  * shuttle suite (icechunk/tests/test_shuttle.rs): many writers racing on
  * one branch through the CAS loop must serialize without losing writes,
  * keep the pointer chain gap-free, and keep ops-log timestamps monotone.
  */
class ConcurrencySpec extends SparkTestBase {

  test("8 concurrent writers, disjoint chunks: every write survives") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s0 = repo.writableSession("main")
    s0.addArray("/a", Seq(1000), Seq(1))
    s0.commit("init")

    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = (0 until 8).map { w =>
      Future {
        val s = repo.writableSession("main")
        (0 until 3).foreach(i =>
          s.writeChunk("/a", Seq(w * 10 + i), Array[Byte](w.toByte)))
        s.commit(s"writer $w")
      }
    }
    val ids = Await.result(Future.sequence(futures), 300.seconds)
    pool.shutdown()
    assert(ids.distinct.size == 8)

    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/a").count() == 24) // no lost updates
    for (w <- 0 until 8; i <- 0 until 3)
      assert(ro.getChunk("/a", Seq(w * 10 + i)).get.head == w.toByte)

    // pointer chain is gap-free 0..N (every CAS winner owns one generation)
    val gens = repo.store.list("repo/").map(_.key).sorted
    assert(gens.size == repo.info().gen + 1)
    // linear history: 8 commit snapshots + init + root
    assert(repo.ancestry(VersionRef.Branch("main")).size == 10)
  }

  test("conflicting racers with Fail policy: exactly one winner per cell") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s0 = repo.writableSession("main")
    s0.addArray("/a", Seq(10), Seq(1))
    s0.commit("init")

    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // sessions open BEFORE the race: a session opened after the winner's
    // commit would base on the new tip and commit cleanly (no conflict to
    // detect) — the test is about concurrent sessions from the SAME base
    val sessions = (0 until 4).map(_ => repo.writableSession("main"))
    val futures = sessions.zipWithIndex.map { case (s, w) =>
      Future {
        s.writeChunk("/a", Seq(3), Array[Byte](w.toByte)) // same cell!
        try {
          s.commit(s"racer $w", solver = graft.vc.BasicConflictSolver(
            onChunkConflict = graft.vc.VersionSelection.Fail))
          true
        } catch { case _: ConflictException => false }
      }
    }
    val outcomes = Await.result(Future.sequence(futures), 300.seconds)
    pool.shutdown()
    // exactly one commit wins without rebase; the rest surface the conflict
    assert(outcomes.count(identity) == 1)
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/a").count() == 1)
  }

  test("branch ops race with commits: CAS serializes pointer updates") {
    val repo = Repository.create(Store.local(tmpDir("repo")), spark)
    val s0 = repo.writableSession("main")
    s0.addArray("/a", Seq(100), Seq(1))
    val c0 = s0.commit("init")

    val pool = Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val commits = (0 until 3).map { w =>
      Future {
        val s = repo.writableSession("main")
        s.writeChunk("/a", Seq(w), Array[Byte](1))
        s.commit(s"c$w")
      }
    }
    val refOps = (0 until 3).map { w =>
      Future {
        repo.createBranch(s"b$w", c0)
        repo.createTag(s"t$w", c0)
      }
    }
    Await.result(Future.sequence(commits ++ refOps.map(_.map(_ => "")) ),
      300.seconds)
    pool.shutdown()
    assert(repo.listBranches().toSet == Set("main", "b0", "b1", "b2"))
    assert(repo.listTags().toSet == Set("t0", "t1", "t2"))
    assert(repo.readonlySession(VersionRef.Branch("main"))
      .refs("/a").count() == 3)
    // ops log monotone (shuttle invariant, test_shuttle.rs:28-41).
    // Compare PARSED instants: Instant.toString drops trailing zero
    // nanos, so raw-string order diverges from time order at precision
    // boundaries ("...123Z" sorts after "...1234Z").
    val ts = repo.opsLog().map(e => java.time.Instant.parse(e.ts))
    ts.sliding(2).foreach {
      case Seq(a, b) => assert(!a.isBefore(b), s"ops log out of order: $a before $b")
      case _ => ()
    }
  }

  test("commit_retries_hard_cap_x bounds TOTAL attempts under perpetual " +
      "foreign progress — time-to-failure is configurable (ADVICE r15)") {
    // An adversary lands a foreign pointer update inside every CAS
    // round, so our update always loses WITH observed progress: stalls
    // stay 0 and only the hard cap can end the loop. With
    // commitRetries=3 × hardCapX=2 the writer must give up after
    // exactly 6 attempts (latency-sensitive config), not spin the
    // default 16× endurance budget.
    val repo = Repository.create(Store.local(tmpDir("hardcap")), spark,
      GraftConfig(commitRetries = 3, commitRetriesHardCapX = 2))
    var attempts = 0
    val e = intercept[ConflictException] {
      repo.casUpdate("test_hard_cap", "adversary") { cur =>
        attempts += 1
        // foreign commit lands between our load and our CAS
        assert(repo.pointer.compareAndSwap(cur.gen,
          cur.copy(gen = cur.gen + 1)))
        cur
      }
    }
    assert(attempts == 6, s"$attempts attempts at retries=3 x capX=2")
    assert(e.getMessage.contains("commit_retries"), e.getMessage)
    // the repo stays healthy: the adversarial updates landed, a normal
    // ref op still succeeds
    repo.createBranch("ok", repo.info().branches("main"))
    assert(repo.listBranches().contains("ok"))
  }

  test("N contending writers converge with a bounded CAS-attempt total " +
      "(lock-free progress, no retry storm)") {
    // Every lost CAS round pairs with a DISTINCT commit landed by a peer,
    // so 6 writers x 5 commits admit at most 30 + 30*5 = 180 attempts in
    // the adversarial worst case — a retry storm or livelock blows past
    // that, a healthy convoy sits near 30 + collisions (~2x). The pin
    // rides the same counter the latency soak reads (putIfAbsent = one
    // per CAS attempt; this workload performs no other conditional PUTs).
    val counting = new graft.storage.LoggingStore(
      Store.local(tmpDir("contend")), _ => ())
    val repo = Repository.create(counting, spark,
      GraftConfig(commitRetries = 60))
    val s0 = repo.writableSession("main")
    s0.addArray("/a", Seq(1000), Seq(1))
    s0.commit("init")
    counting.counts.clear()

    val pool = Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val fs = (0 until 6).map { w =>
      Future {
        (0 until 5).foreach { i =>
          val s = repo.writableSession("main")
          s.writeChunk("/a", Seq(w * 20 + i), Array[Byte](w.toByte))
          s.commit(s"w$w c$i")
        }
      }
    }
    Await.result(Future.sequence(fs), 300.seconds)
    pool.shutdown()

    // all 30 land, linear history, no gaps
    val msgs = repo.ancestry(VersionRef.Branch("main")).map(_.message)
    for (w <- 0 until 6; i <- 0 until 5)
      assert(msgs.contains(s"w$w c$i"), s"lost commit w$w c$i")
    val attempts = Option(counting.counts.get("putIfAbsent"))
      .map(_.get()).getOrElse(0L)
    assert(attempts >= 30, s"only $attempts CAS attempts for 30 commits?")
    assert(attempts <= 150, s"$attempts CAS attempts for 30 commits — " +
      "retry storm (healthy convoys run ~2x the commit count)")
  }

  test("8-writer x 10-commit convoy lands on DEFAULT config — " +
      "progress-aware retry budget (VERDICT r14)") {
    // The flat default budget (commitRetries = 20) under-sizes any
    // convoy wider than ~4: a writer can lose up to N×C races before it
    // must win (each lost round = a DISTINCT peer commit landing, the
    // lock-free bound). Rounds that OBSERVE foreign progress now draw
    // on a 16× hard cap instead of the flat budget, so the default
    // config either lands the convoy or fails with an actionable
    // message — never livelocks (stalled rounds still burn the flat
    // budget).
    val repo = Repository.create(Store.local(tmpDir("convoy-default")),
      spark) // DEFAULT GraftConfig — the whole point
    val s0 = repo.writableSession("main")
    s0.addArray("/a", Seq(1000), Seq(1))
    s0.commit("init")

    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fs = (0 until 8).map { w =>
      Future {
        (0 until 10).foreach { i =>
          val s = repo.writableSession("main")
          s.writeChunk("/a", Seq(w * 20 + i), Array[Byte](w.toByte))
          try s.commit(s"w$w c$i")
          catch { case e: ConflictException => failures.add(e.getMessage) }
        }
      }
    }
    Await.result(Future.sequence(fs), 600.seconds)
    pool.shutdown()

    // every commit landed, or the exhaustion message is actionable
    // (names the config knob and the observed concurrency)
    import scala.jdk.CollectionConverters._
    failures.asScala.foreach { msg =>
      assert(msg.contains("commit_retries") && msg.contains("concurrent"),
        s"exhaustion message not actionable: $msg")
    }
    assert(failures.isEmpty,
      s"default-config convoy lost ${failures.size} commits: " +
        failures.asScala.headOption.getOrElse(""))
    val msgs = repo.ancestry(VersionRef.Branch("main")).map(_.message)
    for (w <- 0 until 8; i <- 0 until 10)
      assert(msgs.contains(s"w$w c$i"), s"lost commit w$w c$i")
  }

  test("stale session's optimistic commit cannot land invisibly on a " +
      "pruned generation slot") {
    // ADVICE r14 (high): put-if-absent on openGen+1 only proves the SLOT
    // is empty — after >= opsRingSize foreign commits plus a prune, that
    // slot is a pruned HOLE, the conditional PUT "succeeds", and the
    // commit is invisible (latestGen still resolves the real tip). The
    // optimistic first attempt must therefore re-validate recency.
    val cfg = GraftConfig(opsRingSize = 4)
    val repo = Repository.create(Store.local(tmpDir("prune-race")), spark, cfg)
    val s0 = repo.writableSession("main")
    s0.addArray("/a", Seq(100), Seq(1))
    val base = s0.commit("init")
    repo.createBranch("side", base)

    // victim session opens on main (captures openInfo) BEFORE the churn
    val victim = repo.writableSession("main")
    victim.writeChunk("/a", Seq(0), Array[Byte](7))

    // the chain advances well past the ring on ANOTHER branch — main's
    // tip does not move, so the optimistic branch-tip filter alone would
    // still trust the stale open-time document
    (0 until 8).foreach { i =>
      val w = repo.writableSession("side")
      w.writeChunk("/a", Seq(10 + i), Array[Byte](i.toByte))
      w.commit(s"side $i")
    }
    // GC's generation prune deletes the victim's openGen+1 slot
    assert(repo.pointer.pruneGenerations(keep = cfg.opsRingSize) > 0)

    val id = victim.commit("victim")
    val tip = repo.info().branches("main")
    assert(tip == id, s"acknowledged commit $id is invisible: tip is $tip")
    // and it stays visible across the next prune (an invisible commit's
    // orphaned slot would be swept here)
    repo.pointer.pruneGenerations(keep = cfg.opsRingSize)
    assert(repo.info().branches("main") == id)
    assert(repo.readonlySession(VersionRef.Branch("main"))
      .getChunk("/a", Seq(0)).get.head == 7)
  }
}
