package graft.meta

import org.json4s._
import org.json4s.jackson.Serialization

/** Metadata model of the engine — the driver-side "metadata kernel".
  *
  * Mirrors the reference's format crate, re-expressed for a Spark-first
  * engine (SURVEY.md §1): snapshots and the repo pointer are small JSON
  * documents (human-debuggable, driver-parsed); manifests and transaction
  * logs are Parquet datasets (columnar, scanned/joined/pruned by Spark).
  * Ids are base32 strings of random bytes (reference: 12-byte binary ids,
  * icechunk-format/src/lib.rs:105-115 — capability parity, not format
  * parity).
  *
  * On-disk layout (mirrors spec-v2.md:160-170):
  * {{{
  *   $ROOT/repo/r.<generation>.json   pointer chain (CAS, one file per gen)
  *   $ROOT/snapshots/<id>.json        immutable snapshot documents
  *   $ROOT/manifests/<id>/            immutable Parquet chunk-ref datasets
  *   $ROOT/transactions/<id>/         immutable Parquet edit logs
  *   $ROOT/chunks/<id>                immutable chunk byte blobs
  * }}}
  * Unlike the reference (mutable `repo` object + `overwritten/` backups,
  * repo_info.rs:90), the pointer is a generation-numbered file chain: commit
  * = put-if-absent of generation N+1. Nothing is ever overwritten, and the
  * historical generations ARE the ops-log history chain.
  */

/** A node in the hierarchy: group or array (snapshot.rs:135-150).
  * `userData` carries the opaque Zarr `zarr.json` document verbatim.
  */
final case class NodeSpec(
    id: String,
    path: String,
    nodeType: String, // "group" | "array"
    shape: Seq[Long] = Nil,
    chunkShape: Seq[Long] = Nil,
    dimNames: Seq[String] = Nil,
    userData: String = "",
    // rectilinear grids (store.rs:1158-1241): explicit chunk lengths per
    // dim; empty = regular grid from chunkShape
    chunkSizesPerDim: Seq[Seq[Long]] = Nil) {
  def isArray: Boolean = nodeType == NodeSpec.Array
  def isRectilinear: Boolean = chunkSizesPerDim.nonEmpty
  def arrayShape: graft.core.ArrayShape =
    graft.core.ArrayShape.regular(shape, chunkShape, dimNames)

  /** Chunk-grid extent per dimension, regular or rectilinear. */
  def numChunksPerDim: Seq[Int] =
    if (isRectilinear) chunkSizesPerDim.map(_.size)
    else arrayShape.dims.map(_.numChunks.toInt)

  def validCoord(coord: Seq[Int]): Boolean =
    coord.size == numChunksPerDim.size &&
      coord.zip(numChunksPerDim).forall { case (c, n) => c >= 0 && c < n }

  /** Chunk lengths along dim `d` as an explicit list, regular or
    * rectilinear — the common currency for grid-compatibility checks
    * (concat off-axis match, rect destinations built from regular
    * sources). A regular dim expands to full chunks plus the remainder
    * tail; note the STORED buffer of a regular tail chunk is padded to
    * the full chunk shape, so callers relabeling regular refs into a
    * rectilinear grid must handle the padded-vs-exact layout (see
    * TensorPlane.concat).
    */
  def effectiveChunkSizes(d: Int): Seq[Long] =
    if (isRectilinear) chunkSizesPerDim(d)
    else {
      val c = chunkShape(d)
      val full = shape(d) / c
      val rem = shape(d) % c
      Seq.fill(full.toInt)(c) ++ (if (rem > 0) Seq(rem) else Nil)
    }
}
object NodeSpec {
  val Group = "group"
  val Array = "array"
}

/** Rectilinear chunk-grid geometry (store.rs:1158-1241) — the ONE
  * element→chunk lookup shared by the catalog's SPJ bound function,
  * the DSv2 partition planner/enumerator, and TensorPlane region
  * reads. Storage-partitioned-join co-partitioning requires the bound
  * function's value and the scan's partition key to agree bit-for-bit,
  * so this math must never fork.
  */
object RectGrid {
  /** Per-dim global start offsets: prefix sums of the chunk lengths. */
  def starts(sizes: Seq[Long]): Array[Long] =
    sizes.scanLeft(0L)(_ + _).dropRight(1).toArray

  /** Chunk index containing element `e` (callers pass `e >= 0`; handle
    * negatives before the call). Elements at or past the array end
    * clamp to the last chunk.
    */
  def chunkOf(starts: Array[Long], e: Long): Long = {
    var i = java.util.Arrays.binarySearch(starts, e)
    if (i < 0) i = -i - 2
    math.min(starts.length - 1, i).toLong
  }
}

/** Pointer from an array node to one split of a manifest Parquet dataset,
  * with its coordinate bounding box (= `ManifestExtents`, manifest.rs:46)
  * and file info (= `ManifestFileInfo`, snapshot.rs:325).
  * Extents are inclusive min / inclusive max per axis.
  */
final case class ManifestRef(
    manifestId: String,
    split: Int,
    emin: Seq[Int],
    emax: Seq[Int],
    numRefs: Long,
    sizeBytes: Long) {
  def contains(coord: Seq[Int]): Boolean =
    coord.size == emin.size &&
      coord.indices.forall(i => coord(i) >= emin(i) && coord(i) <= emax(i))
  def overlaps(omin: Seq[Int], omax: Seq[Int]): Boolean =
    emin.indices.forall(i => emin(i) <= omax(i) && omin(i) <= emax(i))
}

/** Immutable snapshot of the whole hierarchy (snapshot.rs:351). */
final case class Snapshot(
    id: String,
    parentId: Option[String],
    message: String,
    flushedAt: String, // ISO-8601 UTC
    properties: Map[String, String] = Map.empty,
    nodes: Seq[NodeSpec] = Nil,
    manifests: Map[String, Seq[ManifestRef]] = Map.empty // nodeId -> refs
) {
  def node(path: String): Option[NodeSpec] = nodes.find(_.path == path)
  def nodeById(id: String): Option[NodeSpec] = nodes.find(_.id == id)

  /** Properties decoded as JSON values ([[SnapshotProps]]). */
  def typedProperties: Map[String, JValue] = SnapshotProps.decode(properties)
}

/** JSON-typed snapshot properties (the reference commits carry a
  * `BTreeMap<String, serde_json::Value>`, snapshot.rs:304). The wire
  * format stays `Map[String, String]` — each value holds one JSON
  * document — so structured values (numbers, booleans, arrays, nested
  * objects) round-trip losslessly through commit → snapshot → inspect,
  * and snapshots written with plain-string values keep parsing (a value
  * that is not valid JSON decodes as a JSON string).
  */
object SnapshotProps {
  import org.json4s.jackson.JsonMethods

  def encode(props: Map[String, JValue]): Map[String, String] =
    props.map { case (k, v) => k -> write(v) }

  def decode(props: Map[String, String]): Map[String, JValue] =
    props.map { case (k, v) => k -> read(v) }

  def write(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))

  /** Lenient: legacy non-JSON values become JSON strings.
    *
    * Known edge, by design: a value written through the PLAIN string API
    * that happens to be valid JSON (`"123"`, `"true"`, `"null"`) decodes
    * as the typed value (number/boolean/null), not as a string — under
    * the wire contract "each value holds one JSON document" a stored
    * `123` IS the JSON number 123. Callers who need a value to stay a
    * string must write through [[graft.repo.Session.commitJson]] with
    * `JString`, which quotes on encode and round-trips losslessly.
    */
  def read(s: String): JValue =
    try JsonMethods.parse(s)
    catch { case _: Exception => JString(s) }
}

/** Summary row kept in the pointer (SnapshotInfo, snapshot.rs:378).
  * `prunedAncestors`: when `expire` squashes ancestry beneath this
  * snapshot, the removed snapshot ids are recorded here (newest first,
  * accumulated across repeated expirations) so diff/rebase/inspect can
  * answer "that snapshot was expired under X" instead of "unknown
  * snapshot" — the reference's `pruned_ancestor_tx_logs` (Changelog
  * #2184). Older pointers without the field decode to Nil.
  */
final case class SnapshotInfo(
    id: String,
    parentId: Option[String],
    flushedAt: String,
    message: String,
    writtenBy: String = "graft",
    prunedAncestors: Seq[String] = Nil,
    /** Second-parent link of a merge commit: the SOURCE branch's tip at
      * merge time (git's merge parent). History stays first-parent
      * linear for ancestry walks; this records provenance and lets
      * [[graft.repo.Repository.mergeBranch]] detect an already-merged
      * source. Older pointers decode to None.
      */
    mergedFrom: Option[String] = None)

final case class OpLogEntry(ts: String, op: String, detail: String)

/** The single mutable root object (repo_info.rs:90): branches, tags, the
  * snapshot index, config, and the latest-N ops ring (older ops entries
  * live in previous pointer generations — config default 1000 mirrors
  * config.rs:570). The snapshot index is WINDOWED on storage: only the
  * most recent `snapshotIndexWindow` entries stay inline, the rest spill
  * to immutable `repo/seg.*` files, so the per-commit pointer write is
  * O(window + opsRing), not O(history).
  */
final case class RepoInfo(
    gen: Long,
    branches: Map[String, String] = Map.empty,
    tags: Map[String, String] = Map.empty,
    deletedTags: Seq[String] = Nil, // tags are tombstoned, repo_info.rs:713
    /** In a STORED pointer document: only the most recent
      * `snapshotIndexWindow` entries (older ones spill to the immutable
      * `repo/seg.*` files named by [[snapshotSegments]]). In a LOADED
      * `RepoInfo` (via `RepoPointer.load`): the FULL hydrated index —
      * every consumer (`ancestry`, `snapshotInfo`, `expiredBoundaryOf`,
      * inspect) sees complete history and needs no segment awareness.
      */
    snapshots: Seq[SnapshotInfo] = Nil,
    /** Keys of spilled snapshot-index segments, oldest first (empty on
      * pre-upgrade pointers — those carry the full index inline and keep
      * parsing). Segments are write-once; `RepoPointer` caches their
      * contents by key for the JVM's lifetime.
      */
    snapshotSegments: Seq[String] = Nil,
    ops: Seq[OpLogEntry] = Nil,
    config: Map[String, String] = Map.empty,
    /** Persisted feature flags gating history-affecting ops — the
      * repo-level switchboard of the reference's feature_flags.rs (e.g.
      * move-requires-flag, session.rs:1548-1554). Absent = enabled.
      */
    flags: Map[String, Boolean] = Map.empty,
    /** Unique id stamped by [[RepoPointer.compareAndSwap]] on every
      * generation upload — the lost-success-response recovery token
      * (reference Changelog #2156): a committer whose conditional PUT
      * landed but whose 200 was lost reads generation N+1 back and
      * recognizes its own `writeId` as success instead of rebasing over
      * its own commit. Empty in pre-upgrade pointer files (still valid).
      */
    writeId: String = "",
    /** Repository-level user metadata (reference `set_metadata` /
      * `update_metadata`): values are JSON documents in the
      * [[SnapshotProps]] wire encoding. Admin state, not versioned —
      * lives on the pointer, changes CAS like branch ops.
      */
    metadata: Map[String, String] = Map.empty,
    /** Availability status (reference `RepoStatus`): "online" (default)
      * or "read_only" — an admin lock that refuses new writable sessions
      * and in-flight commits until lifted. `statusSetAt` ISO instant,
      * `statusReason` optional operator note.
      */
    statusAvailability: String = "online",
    statusSetAt: String = "",
    statusReason: String = "",
    /** Default commit metadata (reference `set_default_commit_metadata`):
      * merged under every commit's properties (commit-provided keys win)
      * for sessions created after the setting landed. JSON-encoded
      * values, same wire form as `metadata`.
      */
    defaultCommitMeta: Map[String, String] = Map.empty,
    /** On-disk format revision stamped into EVERY stored pointer
      * generation by [[RepoPointer.compareAndSwap]] (the reference
      * persists `spec_version` in every metadata file,
      * spec-v2.md/repo_info.rs). `RepoPointer.load` refuses a pointer
      * whose version is NEWER than [[Layout.SpecVersion]]: a binary that
      * does not understand the windowed snapshot index (or any later
      * format change) must fail loudly instead of silently reading a
      * truncated history — and, worse, committing a pointer without the
      * segment list, after which GC would sweep pre-window history.
      * Decodes to 0 on pre-upgrade pointers (always readable).
      */
    specVersion: Int = 0) {
  def snapshotInfo(id: String): Option[SnapshotInfo] =
    snapshots.find(_.id == id)

  /** The retained snapshot under which `id` was expired, if any — lets
    * callers turn "unknown snapshot" into a precise `expired` error
    * (reference #2184). */
  def expiredBoundaryOf(id: String): Option[SnapshotInfo] =
    snapshots.find(_.prunedAncestors.contains(id))

  def flagEnabled(name: String): Boolean = flags.getOrElse(name, true)

  /** Ordered commit list from `id` to the root, most recent first —
    * `ancestry` (repository.rs:970-985). Parent pointers form a linear
    * chain per branch; walk is driver-side over the in-memory list.
    */
  def ancestry(id: String): Seq[SnapshotInfo] = {
    val byId = snapshots.map(s => s.id -> s).toMap
    Iterator.iterate(byId.get(id))(_.flatMap(_.parentId).flatMap(byId.get))
      .takeWhile(_.isDefined).flatten.toSeq
  }
}

object MetaJson {
  implicit val formats: Formats = Serialization.formats(NoTypeHints)

  def writeSnapshot(s: Snapshot): String = Serialization.writePretty(s)
  def readSnapshot(json: String): Snapshot = Serialization.read[Snapshot](json)
  def writeRepoInfo(r: RepoInfo): String = Serialization.writePretty(r)
  def readRepoInfo(json: String): RepoInfo = Serialization.read[RepoInfo](json)
  def writeSnapshotInfos(s: Seq[SnapshotInfo]): String =
    Serialization.writePretty(s)
  def readSnapshotInfos(json: String): Seq[SnapshotInfo] =
    Serialization.read[Seq[SnapshotInfo]](json)
}
