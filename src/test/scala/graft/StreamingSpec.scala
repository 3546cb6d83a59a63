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

    val query = StreamingAppend.start(stream, repo, "main",
      tmpDir("ckpt"), Trigger.AvailableNow()) { (session, batch, _) =>
      val refs = batch.select(
        array(col("value").cast("int")).as("coord"),
        lit("virtual").as("kind"),
        concat(lit("file:///ext/"), col("value")).as("location"),
        lit(0L).as("offset"), lit(8L).as("length"))
      session.stageChunkRefs("/stream", refs)
    }
    source.addData(0L until 10L: _*)
    query.processAllAvailable()
    query.stop()

    val q2 = StreamingAppend.start(stream, repo, "main",
      tmpDir("ckpt2"), Trigger.AvailableNow()) { (session, batch, _) =>
      val refs = batch.select(
        array(col("value").cast("int")).as("coord"),
        lit("virtual").as("kind"),
        concat(lit("file:///ext/"), col("value")).as("location"),
        lit(0L).as("offset"), lit(8L).as("length"))
      session.stageChunkRefs("/stream", refs)
    }
    source.addData(10L until 25L: _*)
    q2.processAllAvailable()
    q2.stop()

    val ro = repo.readonlySession(VersionRef.Branch("main"))
    assert(ro.refs("/stream").count() == 25)
    // one commit per non-empty micro-batch, linear history
    val msgs = repo.ancestry(VersionRef.Branch("main")).map(_.message)
    assert(msgs.count(_.startsWith("stream batch")) >= 2)
  }
}
