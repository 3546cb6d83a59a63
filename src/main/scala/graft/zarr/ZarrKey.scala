package graft.zarr

import graft.core.NodePath

/** Zarr v3 store-key codec.
  *
  * Mirrors `Key::parse` / `Display` (icechunk/src/store.rs:1048-1156):
  *  - metadata key:  `zarr.json` (root) or `a/b/zarr.json`
  *  - chunk key:     `a/b/c/0/1/2`  -> (path="/a/b", coords=[0,1,2])
  *  - scalar chunk:  `a/b/c`        -> (path="/a/b", coords=[])
  */
sealed trait ZarrKey
object ZarrKey {
  final case class Metadata(path: String) extends ZarrKey
  final case class Chunk(path: String, coords: Seq[Int]) extends ZarrKey

  val MetadataSuffix = "zarr.json"
  val ChunkMarker = "c"

  def parse(key: String): Either[String, ZarrKey] = {
    if (key.isEmpty) return Left("empty key")
    if (key.startsWith("/")) return Left(s"key must be relative: $key")
    if (key == MetadataSuffix) return Right(Metadata("/"))
    if (key.endsWith("/" + MetadataSuffix))
      return Right(Metadata(NodePath.normalize(
        key.dropRight(MetadataSuffix.length + 1))))
    // chunk key: find the LAST standalone "c" segment such that everything
    // after it is all-numeric (store.rs parses node path vs coords this way)
    val segs = key.split("/", -1)
    if (segs.exists(_.isEmpty)) return Left(s"empty segment in key: $key")
    val cIdx = segs.lastIndexWhere(_ == ChunkMarker)
    if (cIdx < 0) return Left(s"not a chunk or metadata key: $key")
    val coordSegs = segs.drop(cIdx + 1)
    if (!coordSegs.forall(s => s.nonEmpty && s.forall(_.isDigit)))
      return Left(s"non-numeric chunk coords in key: $key")
    val path = NodePath.normalize(segs.take(cIdx).mkString("/"))
    Right(Chunk(path, coordSegs.map(_.toInt).toSeq))
  }

  def format(k: ZarrKey): String = k match {
    case Metadata("/") => MetadataSuffix
    case Metadata(p) => NodePath.normalize(p).stripPrefix("/") +
      "/" + MetadataSuffix
    case Chunk(p, coords) =>
      val base = NodePath.normalize(p) match {
        case "/" => ChunkMarker
        case np => np.stripPrefix("/") + "/" + ChunkMarker
      }
      if (coords.isEmpty) base else base + coords.mkString("/", "/", "")
  }
}
