package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.example.data.Group
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.repo.{Repository, VersionRef}
import graft.storage.Store

/** DataSource V2 connector (`format("graft-v2")`): the chunk-ref relation
  * of one array as a DSv2 `Table`.
  *
  * Planning: one `InputPartition` per referenced (manifest, node, split) —
  * the natural parallelism unit of the storage layout — with split-level
  * pruning from pushed `c0` predicates (the `ManifestExtents` check at
  * plan time). Execution: each reader iterates its split's Parquet files
  * with parquet-mr directly (no Spark session on executors), emitting
  * `InternalRow`s. Column pruning is honored in the produced schema.
  *
  * The full-featured source (values mode, writes, time travel options)
  * remains `format("graft")`; this provider is the DSv2 seam — the
  * read path a columnar batch reader would extend.
  */
class GraftTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-v2"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTableProvider.RefSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftTable(properties.get("path"), properties.get("array"),
      Option(properties.get("version")).getOrElse("branch:main"))
}

object GraftTableProvider {
  /** Fixed physical schema of a manifest split data file + restored
    * partition identity columns.
    */
  val RefSchema: StructType = StructType(Seq(
    StructField("node_id", StringType),
    StructField("coord", ArrayType(IntegerType, containsNull = true)),
    StructField("c0", IntegerType), StructField("c1", IntegerType),
    StructField("c2", IntegerType), StructField("c3", IntegerType),
    StructField("kind", StringType),
    StructField("inline", BinaryType),
    StructField("chunk_id", StringType),
    StructField("location", StringType),
    StructField("offset", LongType),
    StructField("length", LongType),
    StructField("etag", StringType),
    StructField("last_modified", IntegerType),
    StructField("split", IntegerType)))
}

class GraftTable(path: String, array: String, version: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft:$path$array@$version"
  override def schema(): StructType = GraftTableProvider.RefSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, array, version)
}

class GraftScanBuilder(path: String, array: String, version: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var lo = Int.MinValue
  private var hi = Int.MaxValue
  private var required: StructType = GraftTableProvider.RefSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      case EqualTo("c0", v: Number) =>
        lo = math.max(lo, v.intValue); hi = math.min(hi, v.intValue)
      case GreaterThan("c0", v: Number) => lo = math.max(lo, v.intValue + 1)
      case GreaterThanOrEqual("c0", v: Number) => lo = math.max(lo, v.intValue)
      case LessThan("c0", v: Number) => hi = math.min(hi, v.intValue - 1)
      case LessThanOrEqual("c0", v: Number) => hi = math.min(hi, v.intValue)
      case _ => ()
    }
    filters // pruning only — Spark re-evaluates everything
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (requiredSchema.nonEmpty) required = requiredSchema

  override def build(): Scan = new GraftScan(path, array, version, lo, hi,
    required)
}

/** One manifest split to read: the partition-planning unit. */
case class SplitPartition(files: Array[String], nodeId: String, split: Int)
  extends InputPartition

class GraftScan(path: String, array: String, version: String,
                lo: Int, hi: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftScan($array@$version, c0 in [$lo,$hi])"

  override def planInputPartitions(): Array[InputPartition] = {
    // driver-side: resolve the snapshot and prune splits by extents
    val spark = org.apache.spark.sql.SparkSession.active
    val repo = Repository.open(Store.local(path), spark)
    val ref = version match {
      case v if v.startsWith("branch:") => VersionRef.Branch(v.drop(7))
      case v if v.startsWith("tag:") => VersionRef.Tag(v.drop(4))
      case v if v.startsWith("snapshot:") => VersionRef.SnapshotVer(v.drop(9))
      case v => VersionRef.Branch(v)
    }
    val session = repo.readonlySession(ref)
    val node = session.node(array).getOrElse(
      throw new graft.repo.GraftException(s"no array at $array"))
    session.base.manifests.getOrElse(node.id, Nil)
      .filter(m => m.emin.headOption.forall(_ <= hi) &&
        m.emax.headOption.forall(_ >= lo))
      .map { m =>
        val dir = java.nio.file.Paths.get(java.net.URI.create(
          repo.assets.manifestUri(m.manifestId) +
            s"/node_id=${node.id}/split=${m.split}"))
        val files =
          if (!java.nio.file.Files.isDirectory(dir)) Array.empty[String]
          else java.nio.file.Files.list(dir).iterator().asScala
            .map(_.toString).filter(_.endsWith(".parquet")).toArray
        SplitPartition(files, node.id, m.split): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required)
}

class GraftReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(p.asInstanceOf[SplitPartition], required)
}

/** parquet-mr row reader for one manifest split (runs on executors). */
class GraftPartitionReader(part: SplitPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val files = part.files.iterator
  private var reader: ParquetReader[Group] = _
  private var current: Group = _

  private def nextReader(): Boolean = {
    if (reader != null) reader.close()
    if (!files.hasNext) { reader = null; false }
    else {
      reader = ParquetReader.builder(new GroupReadSupport(),
        new Path(files.next())).withConf(new Configuration()).build()
      true
    }
  }

  override def next(): Boolean = {
    while (true) {
      if (reader == null && !nextReader()) return false
      current = reader.read()
      if (current != null) return true
      reader.close(); reader = null
    }
    false
  }

  private def has(g: Group, field: String): Boolean =
    g.getType.containsField(field) &&
      g.getFieldRepetitionCount(field) > 0

  private def field(g: Group, name: String): Any = name match {
    case "node_id" => UTF8String.fromString(part.nodeId)
    case "split" => part.split
    case "coord" =>
      if (!has(g, "coord")) null
      else {
        val list = g.getGroup("coord", 0)
        val n = list.getFieldRepetitionCount("list")
        new GenericArrayData(Array.tabulate(n)(i =>
          list.getGroup("list", i).getInteger("element", 0)))
      }
    case "inline" =>
      if (!has(g, "inline")) null
      else g.getBinary("inline", 0).getBytes
    case s @ ("c0" | "c1" | "c2" | "c3" | "last_modified") =>
      if (!has(g, s)) null else g.getInteger(s, 0)
    case s @ ("offset" | "length") =>
      if (!has(g, s)) null else g.getLong(s, 0)
    case s => // string fields
      if (!has(g, s)) null
      else UTF8String.fromString(g.getString(s, 0))
  }

  override def get(): InternalRow =
    new GenericInternalRow(
      required.fields.map(f => field(current, f.name)).toArray[Any])

  override def close(): Unit = if (reader != null) reader.close()
}
