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

  test("failed putIfAbsent surfaces as a retryable commit, not corruption") {
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
    // fail exactly at the pointer swap: the commit loop reloads and retries
    // (the snapshot files written before the failed CAS are orphans -> GC)
    flaky.failures = 1
    intercept[Exception](s2.commit("will fail at CAS"))
    // the repo is NOT corrupted: a fresh session commits cleanly
    val s3 = repo.writableSession("main")
    s3.writeChunk("/a", Seq(2), Array[Byte](2))
    s3.commit("recovers")
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
}
