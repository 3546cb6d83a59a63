package graft

import graft.repo._
import graft.storage._

/** Fault-injection tests (test_flaky_connections.rs analog): the engine
  * must survive transient storage failures through the retry decorator,
  * and the CAS protocol must stay correct when put-if-absent itself fails.
  */
class FlakyStorageSpec extends SparkTestBase {

  test("commits succeed over a flaky store wrapped with retries") {
    val dir = tmpDir("repo")
    val flaky = new FlakyStore(Store.local(dir), failures = 0)
    val store = new RetryingStore(flaky, baseBackoffMs = 1)
    val repo = Repository.create(store, spark)
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(10), Seq(1))

    // a few transient failures sprinkled over the write and commit paths
    flaky.failures = 3
    s.writeChunk("/a", Seq(0), Array.fill(600)(1.toByte)) // chunk upload
    flaky.failures = 3
    val c1 = s.commit("through the flakiness")
    assert(repo.lookupBranch("main").contains(c1))
    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.getChunk("/a", Seq(0)).get.length == 600)
  }

  test("failed putIfAbsent: transient heals via read-back, persistent " +
      "surfaces without corruption") {
    val dir = tmpDir("repo")
    val flaky = new FlakyStore(Store.local(dir), failures = 0,
      failOps = Set("putIfAbsent"))
    val store = new RetryingStore(flaky, baseBackoffMs = 1)
    val repo = Repository.create(store, spark)
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(10), Seq(1))
    s.commit("init")

    val s2 = repo.writableSession("main")
    s2.writeChunk("/a", Seq(1), Array[Byte](1))
    // fail exactly at the pointer swap. The CAS read-back (#2156) finds
    // NOTHING landed, so the conditional semantics still hold and the
    // protocol-level retry inside compareAndSwap heals the commit — a
    // transient transport blip at the swap is invisible to the caller.
    flaky.failures = 1
    s2.commit("heals through transient CAS failure")
    assert(repo.readonlySession(VersionRef.Branch("main"))
      .refs("/a").count() == 1)

    // persistent transport failure: surfaces after bounded attempts, and
    // the repo is NOT corrupted — a fresh session commits cleanly
    val s3 = repo.writableSession("main")
    s3.writeChunk("/a", Seq(2), Array[Byte](2))
    flaky.failures = 100
    intercept[Exception](s3.commit("will fail at CAS"))
    flaky.failures = 0
    val s4 = repo.writableSession("main")
    s4.writeChunk("/a", Seq(3), Array[Byte](3))
    s4.commit("recovers")
    assert(repo.readonlySession(VersionRef.Branch("main"))
      .refs("/a").count() == 2)
  }

  test("lost CAS success response: exactly one commit lands, no " +
      "duplicate, no spurious self-rebase (#2156)") {
    val dir = tmpDir("repo")
    val lossy = new LostResponseStore(Store.local(dir), losses = 0)
    val repo = Repository.create(lossy, spark)
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(10), Seq(1))
    s.commit("init")
    val baseLen = repo.ancestry(VersionRef.Branch("main")).size

    // the conditional PUT LANDS but its success response is lost: the
    // write-id read-back must recognize the landed generation as our own
    // write — success, not a conflict to rebase over (which would land
    // the commit twice)
    val s2 = repo.writableSession("main")
    s2.writeChunk("/a", Seq(1), Array[Byte](1))
    lossy.losses = 1
    val cid = s2.commit("landed but unacknowledged")
    assert(lossy.losses == 0) // the injection fired
    val chain = repo.ancestry(VersionRef.Branch("main"))
    assert(chain.size == baseLen + 1) // exactly one new commit
    assert(chain.head.id == cid)
    assert(chain.count(_.message == "landed but unacknowledged") == 1)
    assert(repo.readonlySession(VersionRef.Branch("main"))
      .refs("/a").count() == 1)
  }

  test("latency store slows but does not change behavior") {
    val dir = tmpDir("repo")
    val repo = Repository.create(
      new LatencyStore(Store.local(dir), delayMs = 5), spark)
    val s = repo.writableSession("main")
    s.addArray("/a", Seq(5), Seq(1))
    s.writeChunk("/a", Seq(0), Array[Byte](7))
    s.commit("slow but sure")
    assert(repo.readonlySession(VersionRef.Branch("main"))
      .getChunk("/a", Seq(0)).get.toSeq == Seq(7.toByte))
  }

  test("Transfer's server-side copy route retries transient failures") {
    // the fast paths dispatch on unwrapped stores (outside
    // RetryingStore), so Transfer carries its own transient retry — a
    // copy that 5xx's twice must land on the third try, and a
    // non-transient failure must NOT be retried
    var calls = 0
    graft.storage.Transfer.retryTransient {
      calls += 1
      if (calls < 3)
        throw new graft.storage.TransientStorageException("injected 503")
    }
    assert(calls == 3)
    var hard = 0
    intercept[IllegalArgumentException](
      graft.storage.Transfer.retryTransient {
        hard += 1
        throw new IllegalArgumentException("not transient")
      })
    assert(hard == 1)
  }
}
