package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.repo.{Repository, VersionRef}

/** Change-data feed over the commit log: poll a branch for commits since a
  * known snapshot and get their accumulated edit rows (the transaction-log
  * union that `diff` computes) — the batch CDC complement of
  * [[StreamingAppend]]. A caller loop (or a scheduler) turns this into a
  * continuous pipeline: each poll is one micro-batch of metadata changes.
  */
object ChangesFeed {
  /** @return (new tip, edit rows from `sinceSnapshot` exclusive to tip) —
    *         None when the branch hasn't moved.
    */
  def poll(repo: Repository, branch: String,
           sinceSnapshot: String): Option[(String, DataFrame)] = {
    val tip = repo.resolveVersion(VersionRef.Branch(branch))
    if (tip == sinceSnapshot) None
    else Some((tip, repo.diff(VersionRef.SnapshotVer(sinceSnapshot),
      VersionRef.SnapshotVer(tip))))
  }
}
