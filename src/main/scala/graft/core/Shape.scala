package graft.core

/** Array shape / chunk-grid model.
  *
  * Mirrors `ArrayShape(Vec<DimensionShape>)` with
  * `DimensionShape{array_length, num_chunks}` and the bounds predicate
  * `valid_chunk_coord` (icechunk-format/src/snapshot.rs:28-98), plus the
  * regular chunk grid arithmetic (`div_ceil`, snapshot.rs:205).
  */
final case class DimShape(arrayLength: Long, chunkLength: Long) {
  require(chunkLength > 0, "chunkLength must be > 0")
  /** Number of chunks along this dimension (ceil division). */
  def numChunks: Long =
    if (arrayLength == 0) 0 else (arrayLength + chunkLength - 1) / chunkLength
}

final case class ArrayShape(dims: Seq[DimShape],
                            dimNames: Seq[Option[String]] = Nil) {
  def ndim: Int = dims.size

  /** Bounds predicate per dim — snapshot.rs:91-98. */
  def validChunkCoord(coord: Seq[Int]): Boolean =
    coord.size == dims.size &&
      coord.zip(dims).forall { case (c, d) => c >= 0 && c < d.numChunks }

  def totalChunks: Long = dims.map(_.numChunks).product

  /** All chunk coordinates in row-major order (test/helper use only —
    * at scale coords live in DataFrames, never materialized on the driver).
    */
  def allCoords: Iterator[Seq[Int]] = {
    def rec(ds: List[DimShape]): Iterator[List[Int]] = ds match {
      case Nil => Iterator(Nil)
      case d :: rest =>
        Iterator.range(0, d.numChunks.toInt)
          .flatMap(i => rec(rest).map(i :: _))
    }
    rec(dims.toList)
  }
}

object ArrayShape {
  def regular(shape: Seq[Long], chunks: Seq[Long],
              dimNames: Seq[String] = Nil): ArrayShape = {
    require(shape.size == chunks.size, "shape/chunks rank mismatch")
    ArrayShape(shape.zip(chunks).map { case (s, c) => DimShape(s, c) },
      if (dimNames.isEmpty) shape.map(_ => None)
      else dimNames.map(Option(_)))
  }
}
