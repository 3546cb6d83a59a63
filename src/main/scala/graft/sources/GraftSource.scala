package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import graft.repo._
import graft.storage.Store
import graft.tensor.TensorPlane

/** Spark data-source connector: arrays as DataFrames (SURVEY §3.1 trace).
  *
  * {{{
  *   spark.read.format("graft")
  *     .option("path", "/repo/root")
  *     .option("array", "/climate/temp")
  *     .option("version", "branch:main" | "tag:v1" | "snapshot:<id>")
  *     .option("mode", "refs" | "values")   // values needs option("dtype")
  *     .load()
  *
  *   df.write.format("graft")
  *     .option("path", ...).option("array", ...).option("mode", "values")
  *     .option("dtype", "float64").mode(SaveMode.Append).save()
  * }}}
  *
  * Reads prune manifest splits by extent before any file is opened: coord
  * predicates (`c0 >= …`, `i0 = …`) are intersected with each split's
  * bounding box (the `ManifestExtents` check of manifest.rs:66-69, applied
  * at planning time). All filters are also left for Spark to re-evaluate
  * (`unhandledFilters` returns everything), so pruning is pure
  * optimization, never correctness.
  *
  * Writes run the §3.3 fork/merge collapse: executors stage rows, the
  * driver commits once through the CAS loop.
  */
class DefaultSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def open(parameters: Map[String, String],
                   sqlContext: SQLContext): (Repository, Session, String) = {
    val array = parameters.getOrElse("array",
      throw new GraftException("option 'array' (node path) is required"))
    val repo = Repository.open(Store.fromOptions(parameters),
      sqlContext.sparkSession,
      resolver = graft.virt.VirtualChunkResolver.fromOptions(parameters))
    val version = parameters.getOrElse("version", "branch:main") match {
      case v if v.startsWith("branch:") =>
        VersionRef.Branch(v.stripPrefix("branch:"))
      case v if v.startsWith("tag:") => VersionRef.Tag(v.stripPrefix("tag:"))
      case v if v.startsWith("snapshot:") =>
        VersionRef.SnapshotVer(v.stripPrefix("snapshot:"))
      case v => VersionRef.Branch(v)
    }
    (repo, repo.readonlySession(version), array)
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val (_, session, array) = open(parameters, sqlContext)
    GraftRelation(sqlContext, session, array,
      parameters.getOrElse("mode", "refs"), parameters.get("dtype"),
      parameters.getOrElse("compression", "raw"))
  }

  /** `df.write.format("graft")`: stage + commit (append only — the engine
    * is versioned; "overwrite" semantics are a new commit anyway).
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val array = parameters("array")
    val repo = Repository.open(Store.fromOptions(parameters),
      sqlContext.sparkSession,
      resolver = graft.virt.VirtualChunkResolver.fromOptions(parameters))
    val branch = parameters.getOrElse("branch", "main")
    val session = repo.writableSession(branch)
    parameters.getOrElse("mode", "refs") match {
      case "values" =>
        val dtype = parameters.getOrElse("dtype",
          throw new GraftException("option 'dtype' required for values write"))
        TensorPlane.writeValues(session, array, data, dtype,
          parameters.getOrElse("compression", "raw"))
      case _ => session.stageChunkRefs(array, data)
    }
    session.commit(parameters.getOrElse("message", s"write $array"))
    createRelation(sqlContext, parameters)
  }
}

case class GraftRelation(sqlContext: SQLContext, session: Session,
    array: String, mode: String, dtype: Option[String], compression: String)
  extends BaseRelation with PrunedFilteredScan {

  private def df: DataFrame = mode match {
    case "values" =>
      TensorPlane.values(session, array,
        dtype.getOrElse(throw new GraftException(
          "option 'dtype' required for values mode")), compression)
    case _ => session.refs(array).drop("inline") // binary col, rarely wanted
  }

  override lazy val schema: StructType = df.schema

  /** Columns usable for pruning: `c0..cN` (chunk coords) in refs mode,
    * `i0..iN` (element indices) in values mode — bounds on EVERY axis
    * prune manifest splits against their per-dim extents, and in values
    * mode additionally push the element region into the sub-block decode
    * ([[TensorPlane.valuesRegion]]).
    */
  private val prunePrefix = if (mode == "values") "i" else "c"

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters // pruning only; Spark re-evaluates everything

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val node = session.node(array).getOrElse(
      throw new GraftException(s"no array at $array"))
    val ndim = node.shape.size
    // derive [lo, hi] (inclusive) bounds per coordinate axis
    val lo = Array.fill(ndim)(Long.MinValue)
    val hi = Array.fill(ndim)(Long.MaxValue)
    def dimOf(att: String): Option[Int] =
      if (att.startsWith(prunePrefix) && att.drop(1).forall(_.isDigit)) {
        val d = att.drop(1).toInt
        if (d < ndim) Some(d) else None
      } else None
    filters.foreach {
      case EqualTo(a, v: Number) => dimOf(a).foreach { d =>
        lo(d) = math.max(lo(d), v.longValue); hi(d) = math.min(hi(d), v.longValue) }
      case GreaterThan(a, v: Number) => dimOf(a).foreach { d =>
        lo(d) = math.max(lo(d), v.longValue + 1) }
      case GreaterThanOrEqual(a, v: Number) => dimOf(a).foreach { d =>
        lo(d) = math.max(lo(d), v.longValue) }
      case LessThan(a, v: Number) => dimOf(a).foreach { d =>
        hi(d) = math.min(hi(d), v.longValue - 1) }
      case LessThanOrEqual(a, v: Number) => dimOf(a).foreach { d =>
        hi(d) = math.min(hi(d), v.longValue) }
      case _ => ()
    }
    val anyBound = (0 until ndim).exists(d =>
      lo(d) != Long.MinValue || hi(d) != Long.MaxValue)
    val base =
      if (!anyBound || node.isRectilinear) df
      else if (mode == "values") {
        // element bounds [lo, hi) per dim, defaulting to the full extent
        val bounds = (0 until ndim).map { d =>
          (math.max(0L, lo(d)),
            if (hi(d) == Long.MaxValue) node.shape(d)
            else math.min(node.shape(d), hi(d) + 1))
        }
        if (bounds.exists(b => b._2 <= b._1))
          emptyResult()
        else TensorPlane.valuesRegion(session, array, dtype.getOrElse(
          throw new GraftException("option 'dtype' required for values mode")),
          bounds, compression)
      } else {
        // chunk-coord bounds, clamped to the grid
        val nchunks = node.numChunksPerDim
        val bounds = (0 until ndim).map { d =>
          (math.max(0L, lo(d)).toInt,
            math.min(nchunks(d) - 1, hi(d)).toInt)
        }
        if (bounds.exists(b => b._2 < b._1)) emptyResult()
        else session.refsBounded(array, bounds).drop("inline")
      }
    val projected =
      if (requiredColumns.isEmpty) base
      else base.select(requiredColumns.map(col).toSeq: _*)
    projected.rdd
  }

  private def emptyResult(): DataFrame =
    sqlContext.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](), schema)
}
