package graft.meta

/** The chunk-reference relation — THE data plane of the engine.
  *
  * One row per chunk of an array, payload one of inline / native ref /
  * virtual ref (manifest.rs:462-466); `kind == "delete"` rows are changeset
  * tombstones and never reach a committed manifest.
  *
  * `coord` is the general n-dim chunk coordinate; `c0..c3` duplicate the
  * first four axes as flat INT columns (−1 where the axis is absent) so
  * that Parquet row-group min/max stats and range partitioning can prune by
  * coordinate — the Spark-native equivalent of `ManifestExtents` pruning
  * (manifest.rs:66-69; reference caps test dims at 4, strategies.rs:50).
  * Manifest files are written sorted by (node_id, c0..c3), mirroring the
  * manifest sort at session.rs:2564, so stats-based skipping is tight.
  */
final case class ChunkRef(
    node_id: String,
    coord: Seq[Int],
    c0: Int, c1: Int, c2: Int, c3: Int,
    kind: String, // inline | ref | virtual | delete
    inline: Array[Byte],
    chunk_id: String,
    location: String,
    offset: Long,
    length: Long,
    etag: String,
    last_modified: Int)

object ChunkRef {
  val KindInline = "inline"
  val KindRef = "ref"
  val KindVirtual = "virtual"
  val KindDelete = "delete"

  private def cs(coord: Seq[Int], i: Int): Int =
    if (i < coord.size) coord(i) else -1

  private def base(node: String, coord: Seq[Int], kind: String) =
    ChunkRef(node, coord, cs(coord, 0), cs(coord, 1), cs(coord, 2),
      cs(coord, 3), kind, null, null, null, 0L, 0L, null, 0)

  def inlineRef(node: String, coord: Seq[Int], bytes: Array[Byte]): ChunkRef =
    base(node, coord, KindInline).copy(inline = bytes,
      length = bytes.length.toLong)

  def nativeRef(node: String, coord: Seq[Int], chunkId: String,
                offset: Long, length: Long): ChunkRef =
    base(node, coord, KindRef).copy(chunk_id = chunkId, offset = offset,
      length = length)

  def virtualRef(node: String, coord: Seq[Int], location: String,
                 offset: Long, length: Long, etag: String = null,
                 lastModified: Int = 0): ChunkRef =
    base(node, coord, KindVirtual).copy(location = location, offset = offset,
      length = length, etag = etag, last_modified = lastModified)

  def tombstone(node: String, coord: Seq[Int]): ChunkRef =
    base(node, coord, KindDelete)
}

/** One row of a transaction log — the per-commit record of what changed
  * (transaction_log.rs:19-187). Stored as a Parquet dataset per commit;
  * conflict detection and diff are joins over these.
  */
final case class EditRow(
    edit: String, // new_group|new_array|update_array|update_group|
                  // delete_array|delete_group|chunk|move
    node_id: String,
    path: String,
    coord: Seq[Int],
    to_path: String)

object EditRow {
  val NewGroup = "new_group"
  val NewArray = "new_array"
  val UpdateArray = "update_array"
  val UpdateGroup = "update_group"
  val DeleteArray = "delete_array"
  val DeleteGroup = "delete_group"
  val Chunk = "chunk"
  val Move = "move"

  def node(edit: String, nodeId: String, path: String): EditRow =
    EditRow(edit, nodeId, path, Seq.empty, null)
  def chunk(nodeId: String, path: String, coord: Seq[Int]): EditRow =
    EditRow(Chunk, nodeId, path, coord, null)
  def move(nodeId: String, from: String, to: String): EditRow =
    EditRow(Move, nodeId, from, Seq.empty, to)
}
