package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.repo.{Repository, VersionRef}
import graft.storage.Store

/** Commit-log change feed (`format("graft-changes")`) — the repository's
  * history as a relation, batch or streaming (the CDF pattern: consumers
  * tail a table's commits instead of re-scanning state).
  *
  *  - '''Batch''': every edit of every commit reachable from the branch
  *    tip, stamped with (seq, snapshot_id, committed_at, message).
  *  - '''Micro-batch streaming''' (`readStream`): each trigger emits the
  *    edits of commits appended since the last processed offset. The
  *    offset is the ancestry DEPTH of the branch tip — monotone under
  *    append-only history; `expire`/squash rewrites depth, which the
  *    source detects and refuses (restart the query to re-baseline).
  *
  * Commits are the unit of parallelism (one `InputPartition` per commit;
  * executors read the commit's transaction-log Parquet directly). Tx logs
  * are compact edit records — partitions stay small no matter how large
  * the referenced chunks are.
  *
  * Reference analog: `ancestry` / `diff` (repository.rs:970,
  * diff.rs:27-75) re-expressed as a Structured Streaming source.
  */
class GraftChangesProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-changes"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftChangesProvider.ChangesSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftChangesTable(properties.asScala.toMap)
}

object GraftChangesProvider {
  val ChangesSchema: StructType = StructType(Seq(
    StructField("seq", LongType),
    StructField("snapshot_id", StringType),
    StructField("committed_at", StringType),
    StructField("message", StringType),
    StructField("edit", StringType),
    StructField("node_id", StringType),
    StructField("path", StringType),
    StructField("coord", ArrayType(IntegerType, containsNull = true)),
    StructField("to_path", StringType)))

  def open(opts: Map[String, String]): (Repository, String) = {
    val spark = org.apache.spark.sql.SparkSession.active
    (Repository.open(Store.fromOptions(opts), spark,
      resolver = graft.virt.VirtualChunkResolver.fromOptions(opts)),
      opts.getOrElse("branch", "main"))
  }

  /** Partitions for commits with depth in `(startDepth, endDepth]` of the
    * branch chain (depth 1 = root). One partition per commit.
    */
  def partitionsFor(repo: Repository, branch: String, startDepth: Long,
                    endDepth: Long): Array[InputPartition] = {
    val chain = repo.ancestry(VersionRef.Branch(branch)) // newest first
    val len = chain.length.toLong
    if (endDepth > len)
      throw new graft.repo.GraftException(
        s"change-feed offset $endDepth exceeds branch depth $len — " +
          "history was rewritten (expire/reset); restart the stream to " +
          "re-baseline")
    val fsConf =
      graft.storage.hadoop.GraftFileSystem.shippableConf(repo.store)
    chain.slice((len - endDepth).toInt, (len - startDepth).toInt)
      .zipWithIndex.map { case (si, i) =>
        val files = repo.store
          .list(graft.meta.Layout.txLogPrefix(si.id) + "/")
          .map(_.key).filter(_.endsWith(".parquet"))
          .map(repo.store.uri).toArray
        ChangesPartition(files, endDepth - i, si.id, si.flushedAt,
          si.message, fsConf): InputPartition
      }.toArray
  }
}

case class ChangesPartition(files: Array[String], seq: Long,
                            snapshotId: String, committedAt: String,
                            message: String,
                            fsConf: Map[String, String])
  extends InputPartition

class GraftChangesTable(opts: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-changes:${opts.getOrElse("path", "?")}" +
      s"@${opts.getOrElse("branch", "main")}"
  override def schema(): StructType = GraftChangesProvider.ChangesSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = schema()
      override def pruneColumns(requiredSchema: StructType): Unit =
        if (requiredSchema.nonEmpty) required = requiredSchema
      override def build(): Scan = new GraftChangesScan(opts, required)
    }
}

class GraftChangesScan(opts: Map[String, String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"GraftChangesScan(${opts.getOrElse("path", "?")})"

  // batch: the whole reachable history
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val (repo, branch) = GraftChangesProvider.open(opts)
    val depth = repo.ancestry(VersionRef.Branch(branch)).length.toLong
    GraftChangesProvider.partitionsFor(repo, branch, 0L, depth)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ChangesReaderFactory(required)

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream = new GraftChangesStream(opts, required)
}

/** Ancestry-depth offset: commits are append-only, so the chain length is
  * a monotone cursor.
  */
case class DepthOffset(depth: Long) extends Offset {
  override def json(): String = depth.toString
}

class GraftChangesStream(opts: Map[String, String], required: StructType)
    extends MicroBatchStream {
  private lazy val (repo, branch) = GraftChangesProvider.open(opts)

  override def initialOffset(): Offset =
    opts.getOrElse("startingOffset", "earliest") match {
      case "earliest" => DepthOffset(0L)
      case "latest" => DepthOffset(
        repo.ancestry(VersionRef.Branch(branch)).length.toLong)
      case other => throw new graft.repo.GraftException(
        s"startingOffset must be earliest|latest, got '$other'")
    }

  override def latestOffset(): Offset =
    DepthOffset(repo.ancestry(VersionRef.Branch(branch)).length.toLong)

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] =
    GraftChangesProvider.partitionsFor(repo, branch,
      start.asInstanceOf[DepthOffset].depth,
      end.asInstanceOf[DepthOffset].depth)

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangesReaderFactory(required)

  override def deserializeOffset(json: String): Offset =
    DepthOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class ChangesReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ChangesPartitionReader(p.asInstanceOf[ChangesPartition], required)
}

/** Reads one commit's tx-log Parquet (parquet-mr, no Spark session) and
  * stamps every edit row with the commit identity.
  */
class ChangesPartitionReader(part: ChangesPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val it = new SplitGroupIterator(part.files, part.fsConf)
  private var current: org.apache.parquet.example.data.Group = _

  override def next(): Boolean = { current = it.next(); current != null }

  private def field(name: String): Any = name match {
    case "seq" => part.seq
    case "snapshot_id" => UTF8String.fromString(part.snapshotId)
    case "committed_at" => UTF8String.fromString(part.committedAt)
    case "message" => UTF8String.fromString(part.message)
    case "coord" =>
      if (!it.has(current, "coord")) null
      else new GenericArrayData(it.coordOf(current))
    case s =>
      if (!it.has(current, s)) null
      else UTF8String.fromString(current.getString(s, 0))
  }

  override def get(): InternalRow =
    new GenericInternalRow(
      required.fields.map(f => field(f.name)).toArray[Any])

  override def close(): Unit = it.close()
}
