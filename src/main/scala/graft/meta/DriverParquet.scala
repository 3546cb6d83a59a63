package graft.meta

import java.nio.file.Files
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.io.LocalOutputFile
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

/** Driver-side Parquet IO for the small-commit fast path: a point-only
  * flush of a few refs must not pay a Spark job per manifest/tx-log write
  * (the reference's sub-second interactive commits, benches/manifest.rs:329
  * — one sync file write per asset). Schemas are byte-compatible with what
  * Spark's writer produces for the same rows, so every existing reader
  * (explicit-schema manifest scans, inferred-schema tx-log reads, DSv2)
  * works on files from either writer interchangeably.
  */
object DriverParquet {

  /** Manifest DATA-file schema — [[ChunkRef]] minus the `node_id` and
    * `split` partition columns, exactly as Spark lays it out under
    * `node_id=X/split=N/` dirs (standard 3-level LIST for `coord`).
    */
  private val manifestType: MessageType = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  optional group coord (LIST) {
      |    repeated group list { required int32 element; }
      |  }
      |  required int32 c0;
      |  required int32 c1;
      |  required int32 c2;
      |  required int32 c3;
      |  optional binary kind (UTF8);
      |  optional binary inline;
      |  optional binary chunk_id (UTF8);
      |  optional binary location (UTF8);
      |  required int64 offset;
      |  required int64 length;
      |  optional binary etag (UTF8);
      |  required int32 last_modified;
      |}""".stripMargin)

  /** Tx-log schema — [[EditRow]], matching Spark's layout. */
  private val txType: MessageType = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  optional binary edit (UTF8);
      |  optional binary node_id (UTF8);
      |  optional binary path (UTF8);
      |  optional group coord (LIST) {
      |    repeated group list { required int32 element; }
      |  }
      |  optional binary to_path (UTF8);
      |}""".stripMargin)

  private def withWriter(schema: MessageType)(fill: (SimpleGroupFactory,
      Group => Unit) => Unit): Array[Byte] = {
    val tmp = Files.createTempFile("graft-driver", ".parquet")
    Files.delete(tmp) // writer refuses to overwrite
    try {
      val w = ExampleParquetWriter.builder(new LocalOutputFile(tmp))
        .withType(schema)
        .withCompressionCodec(CompressionCodecName.ZSTD)
        .withConf(new org.apache.hadoop.conf.Configuration(false))
        .build()
      try fill(new SimpleGroupFactory(schema), w.write)
      finally w.close()
      Files.readAllBytes(tmp)
    } finally Files.deleteIfExists(tmp)
  }

  private def addCoord(g: Group, coord: Seq[Int]): Unit =
    if (coord != null) {
      val list = g.addGroup("coord")
      coord.foreach(c => list.addGroup("list").append("element", c))
    }

  private def addStr(g: Group, field: String, v: String): Unit =
    if (v != null) g.append(field, Binary.fromString(v))

  /** One manifest shard's rows as Parquet bytes (caller sorts by c0..c3
    * for tight row-group stats, mirroring the Spark writer's
    * sortWithinPartitions).
    */
  def writeChunkRefs(refs: Seq[ChunkRef]): Array[Byte] =
    withWriter(manifestType) { (f, write) =>
      refs.foreach { r =>
        val g = f.newGroup()
        addCoord(g, r.coord)
        g.append("c0", r.c0).append("c1", r.c1)
          .append("c2", r.c2).append("c3", r.c3)
        addStr(g, "kind", r.kind)
        if (r.inline != null)
          g.append("inline", Binary.fromConstantByteArray(r.inline))
        addStr(g, "chunk_id", r.chunk_id)
        addStr(g, "location", r.location)
        g.append("offset", r.offset).append("length", r.length)
        addStr(g, "etag", r.etag)
        g.append("last_modified", r.last_modified)
        write(g)
      }
    }

  /** One commit's tx-log rows as Parquet bytes. */
  def writeEditRows(rows: Seq[EditRow]): Array[Byte] =
    withWriter(txType) { (f, write) =>
      rows.foreach { r =>
        val g = f.newGroup()
        addStr(g, "edit", r.edit)
        addStr(g, "node_id", r.node_id)
        addStr(g, "path", r.path)
        addCoord(g, r.coord)
        addStr(g, "to_path", r.to_path)
        write(g)
      }
    }

  /** Read one manifest data file (either writer's output) back into
    * [[ChunkRef]]s — the zero-job read side of the fast path. `node_id`
    * is restored from the partition directory the caller read from.
    */
  def readChunkRefs(bytes: Array[Byte], nodeId: String): Seq[ChunkRef] = {
    val tmp = Files.createTempFile("graft-driver-read", ".parquet")
    try {
      Files.write(tmp, bytes)
      val reader = ParquetReader
        .builder(new GroupReadSupport(),
          new org.apache.hadoop.fs.Path(tmp.toUri))
        .withConf(new org.apache.hadoop.conf.Configuration())
        .build()
      try {
        val out = Vector.newBuilder[ChunkRef]
        var g = reader.read()
        while (g != null) {
          out += groupToRef(g, nodeId)
          g = reader.read()
        }
        out.result()
      } finally reader.close()
    } finally Files.deleteIfExists(tmp)
  }

  /** Read one tx-log data file (either writer's output) back into
    * [[EditRow]]s — feeds driver-side conflict detection on rebase.
    */
  def readEditRows(bytes: Array[Byte]): Seq[EditRow] = {
    val tmp = Files.createTempFile("graft-driver-tx", ".parquet")
    try {
      Files.write(tmp, bytes)
      val reader = ParquetReader
        .builder(new GroupReadSupport(),
          new org.apache.hadoop.fs.Path(tmp.toUri))
        .withConf(new org.apache.hadoop.conf.Configuration())
        .build()
      try {
        val out = Vector.newBuilder[EditRow]
        var g = reader.read()
        while (g != null) {
          val coord =
            if (g.getFieldRepetitionCount("coord") == 0) null
            else {
              val lg = g.getGroup("coord", 0)
              (0 until lg.getFieldRepetitionCount("list"))
                .map(i => lg.getGroup("list", i).getInteger("element", 0))
            }
          out += EditRow(optStr(g, "edit"), optStr(g, "node_id"),
            optStr(g, "path"), coord, optStr(g, "to_path"))
          g = reader.read()
        }
        out.result()
      } finally reader.close()
    } finally Files.deleteIfExists(tmp)
  }

  private def optStr(g: Group, field: String): String =
    if (g.getFieldRepetitionCount(field) == 0) null
    else g.getString(field, 0)

  private def groupToRef(g: Group, nodeId: String): ChunkRef = {
    val coord =
      if (g.getFieldRepetitionCount("coord") == 0) null
      else {
        val lg = g.getGroup("coord", 0)
        (0 until lg.getFieldRepetitionCount("list"))
          .map(i => lg.getGroup("list", i).getInteger("element", 0))
      }
    val inline =
      if (g.getFieldRepetitionCount("inline") == 0) null
      else g.getBinary("inline", 0).getBytes
    ChunkRef(nodeId, coord,
      g.getInteger("c0", 0), g.getInteger("c1", 0),
      g.getInteger("c2", 0), g.getInteger("c3", 0),
      optStr(g, "kind"), inline, optStr(g, "chunk_id"),
      optStr(g, "location"), g.getLong("offset", 0),
      g.getLong("length", 0), optStr(g, "etag"),
      g.getInteger("last_modified", 0))
  }
}
