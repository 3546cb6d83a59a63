package graft.meta

import org.apache.spark.sql.{Encoder, Encoders}

/** Explicit encoders for the metadata relations (usable without a stable
  * `spark.implicits` path).
  */
object GraftEncoders {
  implicit val chunkRefEnc: Encoder[ChunkRef] = Encoders.product[ChunkRef]
  implicit val editRowEnc: Encoder[EditRow] = Encoders.product[EditRow]
  implicit val nodeSpecEnc: Encoder[NodeSpec] = Encoders.product[NodeSpec]
  implicit val snapInfoEnc: Encoder[SnapshotInfo] =
    Encoders.product[SnapshotInfo]
  implicit val chunkRefIdxEnc: Encoder[(ChunkRef, Int)] =
    Encoders.product[(ChunkRef, Int)]
  implicit val strPairEnc: Encoder[(String, String)] =
    Encoders.product[(String, String)]
  implicit val opLogEnc: Encoder[OpLogEntry] = Encoders.product[OpLogEntry]
}
