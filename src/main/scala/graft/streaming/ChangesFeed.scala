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
    *         None when the branch hasn't moved. A consumed snapshot that
    *         is no longer on the branch's chain (expired, or the branch
    *         was reset/rewritten) throws kind `expired`/`ref_not_found`
    *         so the consumer re-baselines explicitly instead of
    *         receiving the whole history as one silent "change".
    */
  def poll(repo: Repository, branch: String,
           sinceSnapshot: String): Option[(String, DataFrame)] = {
    val tip = repo.resolveVersion(VersionRef.Branch(branch))
    if (tip == sinceSnapshot) None
    else Some((tip, repo.diff(VersionRef.SnapshotVer(sinceSnapshot),
      VersionRef.SnapshotVer(tip))))
  }

  /** CELL-level change feed for one array: `(i0..iN, old_value,
    * new_value)` for every cell that changed between two versions —
    * [[graft.tensor.TensorPlane.valueDiff]] with version resolution, so
    * a poll loop (or a `foreachBatch` over the `graft-changes` commit
    * feed) can turn "the branch advanced" into the exact cells to
    * re-embed / re-train on. Cost scales with the change at chunk AND
    * cell granularity (ref prune + diff kernel): polling a 100 TB array
    * that gained one chunk decodes one chunk.
    */
  def valueChangesBetween(repo: Repository, from: VersionRef,
                          to: VersionRef, path: String, dtype: String,
                          compression: String = "raw"): DataFrame =
    graft.tensor.TensorPlane.valueDiff(
      repo.readonlySession(from), repo.readonlySession(to), path, dtype,
      compression)

  /** [[poll]]'s cell-level sibling: `(new tip, changed cells)` since a
    * known snapshot, None when the branch hasn't moved.
    */
  def pollValues(repo: Repository, branch: String, sinceSnapshot: String,
                 path: String, dtype: String,
                 compression: String = "raw")
      : Option[(String, DataFrame)] = {
    val tip = repo.resolveVersion(VersionRef.Branch(branch))
    if (tip == sinceSnapshot) None
    else Some((tip, valueChangesBetween(repo,
      VersionRef.SnapshotVer(sinceSnapshot), VersionRef.SnapshotVer(tip),
      path, dtype, compression)))
  }
}
