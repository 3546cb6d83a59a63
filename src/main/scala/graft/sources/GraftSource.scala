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
    val path = parameters.getOrElse("path",
      throw new GraftException("option 'path' (repo root) is required"))
    val array = parameters.getOrElse("array",
      throw new GraftException("option 'array' (node path) is required"))
    val repo = Repository.open(Store.local(path), sqlContext.sparkSession)
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
    val path = parameters("path")
    val array = parameters("array")
    val repo = Repository.open(Store.local(path), sqlContext.sparkSession)
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

  /** Columns usable for split pruning: c0 in refs mode, i0 in values mode
    * (both are the first coordinate axis — splits shard on it by default).
    */
  private val pruneCol = if (mode == "values") "i0" else "c0"

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters // pruning only; Spark re-evaluates everything

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    // derive [lo, hi] bounds on the first coordinate axis from the pushed
    // filters, then keep only manifest splits whose extents overlap
    var lo = Int.MinValue
    var hi = Int.MaxValue
    filters.foreach {
      case EqualTo(`pruneCol`, v: Number) =>
        lo = math.max(lo, v.intValue); hi = math.min(hi, v.intValue)
      case GreaterThan(`pruneCol`, v: Number) =>
        lo = math.max(lo, v.intValue + 1)
      case GreaterThanOrEqual(`pruneCol`, v: Number) =>
        lo = math.max(lo, v.intValue)
      case LessThan(`pruneCol`, v: Number) =>
        hi = math.min(hi, v.intValue - 1)
      case LessThanOrEqual(`pruneCol`, v: Number) =>
        hi = math.min(hi, v.intValue)
      case _ => ()
    }
    val node = session.node(array).getOrElse(
      throw new GraftException(s"no array at $array"))
    val chunk0 = node.chunkShape.headOption.getOrElse(1L)
    val base =
      if (lo == Int.MinValue && hi == Int.MaxValue) df
      else {
        // values-mode bounds are element indices; convert to chunk coords
        val (clo, chi) =
          if (mode == "values")
            ((lo / chunk0).toInt,
              (if (hi == Int.MaxValue) Int.MaxValue else (hi / chunk0).toInt))
          else (lo, hi)
        val refs = session.base.manifests.getOrElse(node.id, Nil)
        val keep = refs.filter(r =>
          r.emin.headOption.forall(_ <= chi) &&
            r.emax.headOption.forall(_ >= clo))
        if (keep.size == refs.size) df
        else {
          // rebuild the frame over the surviving splits only
          val pruned = keep.map(r =>
            session.repo.assets.readManifestSplit(r, node.id).drop("split"))
            .reduceOption(_ unionByName _)
            .getOrElse(session.repo.assets.emptyRefs().drop("split"))
          if (mode == "values")
            TensorPlane.valuesOfRefs(session, node, pruned, dtype.get,
              compression)
          else pruned.drop("inline")
        }
      }
    val projected =
      if (requiredColumns.isEmpty) base
      else base.select(requiredColumns.map(col).toSeq: _*)
    projected.rdd
  }
}
