package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.repo.{Repository, VersionRef}
import graft.storage.Store

/** Spark `TableCatalog` + `FunctionCatalog` over a graft repository:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft.path", "/data/repo")  // or s3.*
  * spark.sql("SELECT avg(value) FROM graft.climate.temp")
  * spark.sql("INSERT INTO graft.climate.temp SELECT ...")
  * }}}
  *
  * Arrays are tables: node path `/climate/temp` ↔ identifier
  * `climate.temp`; the table relation is the VALUES plane (i0..iN, value)
  * with dtype inferred from the node's user metadata (`"dtype":"..."` in
  * userData, else the catalog's `dtype` option). Groups are namespaces.
  *
  * The catalog also exposes the `chunk_coord(i, chunkExtent)` bound
  * function, which is what unlocks the REAL write distribution: writes
  * routed through the catalog (INSERT INTO / saveAsTable) carry a
  * FunctionCatalog, so [[GraftValuesWrite]] can require a distribution
  * CLUSTERED on the chunk coordinate transform — each task receives only
  * whole chunks and nothing takes the boundary-leftover path. (Writes via
  * `df.write.format("graft-v2")` have no FunctionCatalog — Spark only
  * translates plain field references there — and keep the
  * ordered-distribution stripe plan.)
  *
  * DDL: `CREATE TABLE graft.ns.t (i0 BIGINT, ..., value DOUBLE)
  * TBLPROPERTIES('shape'='512,512', 'chunk_shape'='64,64')`, DROP TABLE
  * (deletes the node), and RENAME (graft `move`). Each DDL statement is
  * one commit.
  */
class GraftCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName: String = _
  private var options: Map[String, String] = _

  override def initialize(name: String,
                          opts: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    options = opts.asScala.toMap
  }
  override def name(): String = catalogName

  private def repo: Repository = {
    val spark = org.apache.spark.sql.SparkSession.active
    Repository.open(Store.fromOptions(options), spark,
      resolver = graft.virt.VirtualChunkResolver.fromOptions(options))
  }
  private def pathOf(ident: Identifier): String =
    "/" + (ident.namespace() :+ ident.name()).mkString("/")
  private def identOf(path: String): Identifier = {
    val parts = path.stripPrefix("/").split("/").filter(_.nonEmpty)
    Identifier.of(parts.init, parts.last)
  }

  private val DtypeRe = """"(?:dtype|data_type)"\s*:\s*"([A-Za-z0-9_]+)"""".r
  private def dtypeOf(node: graft.meta.NodeSpec): String =
    DtypeRe.findFirstMatchIn(node.userData).map(_.group(1))
      .orElse(options.get("dtype"))
      .getOrElse(throw new graft.repo.GraftException(
        s"array ${node.path} has no dtype in userData and the catalog " +
          "sets no 'dtype' option"))

  // ----------------------------------------------------------------
  // TableCatalog
  // ----------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = "/" + namespace.mkString("/")
    val session = repo.readonlySession(
      VersionRef.Branch(options.getOrElse("branch", "main")))
    session.listNodes(prefix).filter(_.isArray)
      .filter { n => // direct children of the namespace only
        val rel = n.path.stripPrefix(prefix).stripPrefix("/")
        rel.nonEmpty && !rel.contains('/')
      }
      .map(n => identOf(n.path)).toArray
  }

  override def loadTable(ident: Identifier): Table =
    loadTableAt(ident, None)

  /** `SELECT ... VERSION AS OF 'v'`: `v` is a `branch:`/`tag:`/
    * `snapshot:`-prefixed ref or a bare name resolved as branch, then
    * tag, then snapshot id (the reference's `readonly_session(branch=/
    * tag=/snapshot_id=)` surface, repository.py:1497-1537).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val r = repo
    val normalized = version match {
      case v if v.startsWith("branch:") || v.startsWith("tag:") ||
        v.startsWith("snapshot:") || v.startsWith("asof:") => v
      case v if r.lookupBranch(v).isDefined => s"branch:$v"
      case v if r.lookupTag(v).isDefined => s"tag:$v"
      case v => s"snapshot:$v"
    }
    loadTableAt(ident, Some(normalized))
  }

  /** `SELECT ... TIMESTAMP AS OF t`: the last snapshot on the catalog's
    * branch flushed at or before `t` (`as_of`, repository.py:1520-1522;
    * resolution repository.rs:1785-1799). Spark passes microseconds.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val branch = options.getOrElse("branch", "main")
    val snap = repo.resolveVersion(
      VersionRef.AsOf(branch, timestampMicros / 1000L))
    loadTableAt(ident, Some(s"snapshot:$snap"))
  }

  private def loadTableAt(ident: Identifier,
                          version: Option[String]): Table = {
    val branch = options.getOrElse("branch", "main")
    val ref = version match {
      case None => VersionRef.Branch(branch)
      case Some(v) if v.startsWith("branch:") => VersionRef.Branch(v.drop(7))
      case Some(v) if v.startsWith("tag:") => VersionRef.Tag(v.drop(4))
      case Some(v) if v.startsWith("asof:") =>
        val spec = v.drop(5)
        val at = spec.lastIndexOf('@')
        require(at >= 0, s"asof version must be 'asof:<branch>@<instant>'")
        val when = spec.drop(at + 1)
        VersionRef.AsOf(spec.take(at),
          if (when.forall(_.isDigit)) when.toLong
          else java.time.Instant.parse(when).toEpochMilli)
      case Some(v) => VersionRef.SnapshotVer(v.stripPrefix("snapshot:"))
    }
    val session = repo.readonlySession(ref)
    val path = pathOf(ident)
    val node = session.node(path).filter(_.isArray).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident))
    val opts = options ++ Map(
      "array" -> path, "mode" -> "values", "dtype" -> dtypeOf(node),
      "branch" -> branch,
      // flags the catalog write path: a FunctionCatalog rides along, so
      // the write may require chunk_coord-clustered distribution
      "via-catalog" -> "true") ++
      version.map("version" -> _)
    new GraftTable(opts, GraftTableProvider.schemaFor(opts))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        "graft tables are chunk-partitioned by shape/chunk_shape " +
          "properties, not PARTITIONED BY")
    val props = properties.asScala.toMap
    def dims(key: String): Seq[Long] = props.get(key) match {
      case Some(s) => s.split(",").map(_.trim.toLong).toSeq
      case None => throw new graft.repo.GraftException(
        s"CREATE TABLE requires TBLPROPERTIES('$key'='d0,d1,...')")
    }
    val shape = dims("shape")
    val chunk = dims("chunk_shape")
    val ndim = shape.size
    val valueField = schema.fields.lastOption.getOrElse(
      throw new graft.repo.GraftException("empty schema"))
    val expectedNames = (0 until ndim).map(i => s"i$i") :+ "value"
    if (schema.fieldNames.toSeq != expectedNames)
      throw new graft.repo.GraftException(
        s"schema must be (${expectedNames.mkString(", ")}) for a " +
          s"$ndim-d array, got (${schema.fieldNames.mkString(", ")})")
    val dtype = props.getOrElse("dtype", valueField.dataType match {
      case LongType => "int64"
      case DoubleType => "float64"
      case other => throw new graft.repo.GraftException(
        s"value column must be BIGINT or DOUBLE, got $other")
    })
    val session = repo.writableSession(options.getOrElse("branch", "main"))
    ensureGroups(session, ident.namespace())
    session.addArray(pathOf(ident), shape, chunk,
      userData = s"""{"dtype":"$dtype"}""")
    session.commit(s"create table ${ident.toString}")
    loadTable(ident)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported; use the session API " +
        "(updateArray / reindexArray)")

  override def dropTable(ident: Identifier): Boolean = {
    val session = repo.writableSession(options.getOrElse("branch", "main"))
    // only arrays are tables (loadTable filters the same way): never let
    // DROP TABLE on a namespace path delete a whole group subtree
    val existed = session.node(pathOf(ident)).exists(_.isArray)
    if (existed) {
      session.deleteNode(pathOf(ident))
      session.commit(s"drop table ${ident.toString}")
    }
    existed
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    val session = repo.writableSession(options.getOrElse("branch", "main"))
    if (!session.node(pathOf(oldIdent)).exists(_.isArray))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(oldIdent)
    ensureGroups(session, newIdent.namespace())
    session.moveNode(pathOf(oldIdent), pathOf(newIdent))
    session.commit(s"rename ${oldIdent.toString} to ${newIdent.toString}")
  }

  /** mkdir -p for the namespace chain (catalog namespaces are groups). */
  private def ensureGroups(session: graft.repo.Session,
                           namespace: Array[String]): Unit =
    namespace.inits.toSeq.reverse.filter(_.nonEmpty).foreach { ns =>
      val p = "/" + ns.mkString("/")
      if (session.node(p).isEmpty) session.addGroup(p)
    }

  // ----------------------------------------------------------------
  // FunctionCatalog
  // ----------------------------------------------------------------

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, ChunkCoordFunction.Name))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name() == ChunkCoordFunction.Name) new ChunkCoordFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)
}

object ChunkCoordFunction {
  val Name = "chunk_coord"
}

/** `chunk_coord(i, extent) = floor(i / extent)` — the chunk-grid
  * coordinate of element index `i` along a dimension with chunk extent
  * `extent`. Registered so V2 writes can require distributions clustered
  * on it (resolved through the FunctionCatalog at write planning).
  */
class ChunkCoordFunction extends UnboundFunction {
  override def name(): String = ChunkCoordFunction.Name
  override def description(): String =
    "chunk_coord(i, extent): chunk-grid coordinate floor(i / extent)"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 2)
      throw new UnsupportedOperationException(
        s"chunk_coord takes (index, extent), got ${inputType.simpleString}")
    new ChunkCoordBoundFunction
  }
}

/** Bound scalar: the `invoke` magic method lives on the companion
  * object, so scalac emits a STATIC `invoke(JJ)J` forwarder on this
  * class and Spark's scalar-function resolution binds it as
  * `StaticInvoke` — a direct static call in generated code, no bound
  * object reference in the exchange partitioner or sort comparator.
  * `produceResult` is the interpreted fallback.
  */
private[sources] class ChunkCoordBoundFunction extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(LongType, LongType)
  override def resultType(): DataType = LongType
  override def name(): String = ChunkCoordFunction.Name
  override def canonicalName(): String = "graft." + ChunkCoordFunction.Name
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): java.lang.Long =
    java.lang.Math.floorDiv(input.getLong(0), input.getLong(1))
}

private[sources] object ChunkCoordBoundFunction {
  def invoke(i: Long, extent: Long): Long = java.lang.Math.floorDiv(i, extent)
}
