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
class GraftCatalog extends TableCatalog with FunctionCatalog
    with SupportsNamespaces with ProcedureCatalog {
  private var catalogName: String = _
  private var options: Map[String, String] = _

  override def initialize(name: String,
                          opts: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    options = opts.asScala.toMap
  }
  override def name(): String = catalogName

  // ---- SQL stored procedures: CALL cat.system.<proc>(...) ----
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    (ident.namespace().toSeq, ident.name()) match {
      case (Seq("system"), n) if GraftProcedures.names.contains(n) =>
        GraftProcedures.load(n, () => repo)
      case _ => throw new graft.repo.GraftException(
        s"no procedure ${ident.namespace().mkString(".")}.${ident.name()}" +
          s" — known: system.{${GraftProcedures.names.mkString(",")}}",
        graft.repo.GraftError.RefNotFound)
    }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      GraftProcedures.names
        .map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

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

  /** Per-array codec: a zarr-doc userData (adopted stores) declares it
    * in `codecs`; else the catalog-level `compression` option; else raw.
    * Without this, a gzip/zstd-adopted store would decode its compressed
    * bytes as raw little-endian values — silent garbage.
    */
  private def compressionOf(node: graft.meta.NodeSpec): String =
    GraftCatalog.compressionFromUserData(node.userData)
      .orElse(options.get("compression")).getOrElse("raw")

  private def dtypeOf(node: graft.meta.NodeSpec): String =
    GraftCatalog.dtypeFromUserData(node.userData)
      .orElse(options.get("dtype"))
      .getOrElse(throw new graft.repo.GraftException(
        s"array ${node.path} has no dtype in userData and the catalog " +
          "sets no 'dtype' option"))

  // ----------------------------------------------------------------
  // TableCatalog
  // ----------------------------------------------------------------

  /** Direct children of `prefix` in `session`, arrays or groups. */
  private def directChildren(session: graft.repo.Session, prefix: String,
                             wantArray: Boolean): Seq[graft.meta.NodeSpec] =
    session.listNodes(prefix).filter(_.isArray == wantArray)
      .filter { n =>
        val rel = n.path.stripPrefix(prefix).stripPrefix("/")
        rel.nonEmpty && !rel.contains('/')
      }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = "/" + namespace.mkString("/")
    directChildren(roSession(), prefix, wantArray = true)
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

  /** Shared prefixed-ref grammar lives in [[GraftTableProvider
    * .parseVersion]]; bare strings here are snapshot ids (loadTable
    * already resolved branch/tag names to prefixed forms).
    */
  private def parseRef(version: Option[String],
                       branch: String): VersionRef =
    version.map(GraftTableProvider.parseVersion(_, VersionRef.SnapshotVer(_)))
      .getOrElse(VersionRef.Branch(branch))

  private def loadTableAt(ident: Identifier,
                          version: Option[String]): Table = {
    val branch = options.getOrElse("branch", "main")
    val ref = parseRef(version, branch)
    val session = repo.readonlySession(ref)
    val path = pathOf(ident)
    session.node(path).filter(_.isArray) match {
      case Some(node) =>
        val opts = options ++ Map(
          "array" -> path, "mode" -> "values", "dtype" -> dtypeOf(node),
          "compression" -> compressionOf(node),
          "branch" -> branch,
          // flags the catalog write path: a FunctionCatalog rides along,
          // so the write may require chunk_coord-clustered distribution
          "via-catalog" -> "true") ++
          version.map("version" -> _)
        new GraftTable(opts, GraftTableProvider.schemaFor(opts))
      case None =>
        metadataTable(ident, branch, version).getOrElse(
          throw new org.apache.spark.sql.catalyst.analysis
            .NoSuchTableException(ident))
    }
  }

  // ----------------------------------------------------------------
  // metadata tables (the observability surface as SQL relations —
  // ancestry / refs / ops_log / list_branches / list_tags,
  // repository.rs:970-1461, exposed the way lakehouse catalogs expose
  // their snapshot/file listings)
  // ----------------------------------------------------------------

  /** Repo-level: `cat.snapshots` (catalog branch's ancestry),
    * `cat.branches`, `cat.tags`, `cat.ops`. Array-level:
    * `cat.<ns...>.<array>.refs` — the array's chunk-ref relation as a
    * DISTRIBUTED DSv2 scan (manifest-shard partitions), since refs scale
    * with the array while the others are bounded metadata (LocalScan:
    * driver rows, no job). Real nodes shadow metadata names.
    */
  private def metadataTable(ident: Identifier, branch: String,
                            version: Option[String]): Option[Table] = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    def str(s: String): Any = UTF8String.fromString(s)
    def rows2(xs: Seq[(String, String)]): Array[InternalRow] =
      xs.map { case (a, b) =>
        new GenericInternalRow(Array[Any](str(a), str(b))): InternalRow
      }.toArray
    val r = repo
    (ident.namespace().toSeq, ident.name()) match {
      case (ns, "refs") if ns.nonEmpty =>
        val arrayPath = "/" + ns.mkString("/")
        // existence must be checked at the REQUESTED version — an array
        // dropped at the tip is still readable under VERSION AS OF, and
        // one created after it is not
        val session = r.readonlySession(parseRef(version, branch))
        session.node(arrayPath).filter(_.isArray).map { _ =>
          val opts = options ++ Map(
            "array" -> arrayPath, "mode" -> "refs",
            "branch" -> branch) ++ version.map("version" -> _)
          new GraftTable(opts, GraftTableProvider.schemaFor(opts))
        }
      case (Nil, "snapshots") =>
        val tip = parseRef(version, branch)
        Some(new GraftMetaTable(s"${name()}.snapshots",
          GraftCatalog.SnapshotsSchema,
          () => r.ancestry(tip).map { si =>
            new GenericInternalRow(Array[Any](str(si.id),
              si.parentId.map(str).orNull, str(si.message),
              str(si.flushedAt),
              si.mergedFrom.map(str).orNull)): InternalRow
          }.toArray))
      case (Nil, "branches") =>
        Some(new GraftMetaTable(s"${name()}.branches",
          GraftCatalog.RefsSchema,
          () => rows2(r.listBranches().map(b =>
            b -> r.lookupBranch(b).getOrElse("")))))
      case (Nil, "tags") =>
        Some(new GraftMetaTable(s"${name()}.tags",
          GraftCatalog.RefsSchema,
          () => rows2(r.listTags().map(t =>
            t -> r.lookupTag(t).getOrElse("")))))
      case (Nil, "ops") =>
        Some(new GraftMetaTable(s"${name()}.ops", GraftCatalog.OpsSchema,
          () => r.opsLog().map { e =>
            new GenericInternalRow(Array[Any](str(e.ts), str(e.op),
              str(e.detail))): InternalRow
          }.toArray))
      case (ns, "manifests") if ns.nonEmpty =>
        // per-shard manifest stats for one array — the fragmentation /
        // pruning observability view (is it time for rewrite_manifests?):
        // split ordinal, manifest object, ref count, payload bytes, and
        // the shard's coordinate envelope. Bounded metadata (the session
        // snapshot's manifest list), LocalScan like its siblings.
        val arrayPath = "/" + ns.mkString("/")
        val session = r.readonlySession(parseRef(version, branch))
        session.node(arrayPath).filter(_.isArray).map { node =>
          new GraftMetaTable(s"${name()}.${ns.mkString(".")}.manifests",
            GraftCatalog.ManifestsSchema,
            () => session.base.manifests.getOrElse(node.id, Nil)
              .sortBy(m => (m.split, m.manifestId)).map { m =>
                new GenericInternalRow(Array[Any](m.split,
                  str(m.manifestId), m.numRefs, m.sizeBytes,
                  str(m.emin.mkString(",")), str(m.emax.mkString(",")))):
                  InternalRow
              }.toArray)
        }
      case _ => None
    }
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

  /** `ALTER TABLE t SET TBLPROPERTIES('shape'='d0,d1,...')` — resize the
    * array (the reference's `update_array` shape change; the xarray
    * `append_dim` growth pattern as DDL) — and
    * `SET TBLPROPERTIES('chunk_shape'='c0,c1,...')` — regrid the array
    * through the distributed rechunk job
    * ([[graft.tensor.TensorPlane.rechunk]]: block copies, payloads never
    * shuffle), committed like any other DDL. Other property or schema
    * changes are rejected.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val session = repo.writableSession(options.getOrElse("branch", "main"))
    val path = pathOf(ident)
    val node = session.node(path).filter(_.isArray).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident))
    changes.foreach {
      case p: TableChange.SetProperty if p.property() == "shape" =>
        val shape = p.value().split(",").map(_.trim.toLong).toSeq
        require(shape.size == node.shape.size,
          s"shape must keep rank ${node.shape.size}, got ${shape.size}")
        // growth only: a DDL shrink would silently tombstone committed
        // chunks beyond the new bound (the same refuse-loudly posture as
        // mid-chunk DELETE; shrinking is session-API territory where the
        // data loss is explicit)
        shape.zip(node.shape).zipWithIndex.foreach { case ((n2, cur), d) =>
          if (n2 < cur) throw new graft.repo.GraftException(
            s"ALTER TABLE shape would shrink dim $d from $cur to $n2, " +
              "discarding committed chunks; use the session API " +
              "(updateArray) if that is intended")
        }
        session.updateArray(path, shape, node.chunkShape)
      case p: TableChange.SetProperty if p.property() == "chunk_shape" =>
        val chunks = p.value().split(",").map(_.trim.toLong).toSeq
        require(chunks.size == node.shape.size,
          s"chunk_shape must keep rank ${node.shape.size}, " +
            s"got ${chunks.size}")
        // the node's declared codec, NOT raw: regridding a compressed
        // array with the wrong codec would silently re-encode garbage
        graft.tensor.TensorPlane.rechunk(session, path, chunks,
          dtypeOf(node), compressionOf(node))
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change $other — only " +
          "SET TBLPROPERTIES('shape'=...) resizes and " +
          "SET TBLPROPERTIES('chunk_shape'=...) regrids; use the session " +
          "API (updateArray / reindexArray) for everything else")
    }
    session.commit(s"alter table ${ident.toString}")
    loadTable(ident)
  }

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

  /** mkdir -p for the namespace chain (catalog namespaces are groups).
    * A chain segment occupied by an ARRAY fails loudly — arrays are
    * leaves, and silently nesting under one would corrupt the hierarchy.
    */
  private def ensureGroups(session: graft.repo.Session,
                           namespace: Array[String]): Unit =
    namespace.inits.toSeq.reverse.filter(_.nonEmpty).foreach { ns =>
      val p = "/" + ns.mkString("/")
      session.node(p) match {
        case None => session.addGroup(p)
        case Some(n) if n.isArray => throw new graft.repo.GraftException(
          s"$p is an array; cannot use it as a namespace")
        case _ => ()
      }
    }

  // ----------------------------------------------------------------
  // SupportsNamespaces — groups as SQL namespaces (the reference's
  // group nodes, repository hierarchy of SURVEY §1.1): CREATE/DROP
  // NAMESPACE are group commits, SHOW NAMESPACES lists group children.
  // ----------------------------------------------------------------

  private def roSession() =
    repo.readonlySession(VersionRef.Branch(options.getOrElse("branch", "main")))

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    val session = roSession()
    val prefix = "/" + namespace.mkString("/")
    if (namespace.nonEmpty &&
      !session.node(prefix).exists(n => !n.isArray))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(namespace)
    directChildren(session, prefix, wantArray = false)
      .map(n => namespace :+ n.path.split("/").last).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      roSession().node("/" + namespace.mkString("/")).exists(n => !n.isArray)

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    // one session for check + read: a concurrent drop must surface as
    // NoSuchNamespace, not as empty metadata
    val node =
      if (namespace.isEmpty) None
      else roSession().node("/" + namespace.mkString("/"))
        .filter(n => !n.isArray)
        .map(Some(_)).getOrElse(
          throw new org.apache.spark.sql.catalyst.analysis
            .NoSuchNamespaceException(namespace))
    Map("user_data" -> node.map(_.userData).getOrElse("")).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    // '/'-bearing segments (backtick-quoted idents) would create nodes
    // outside the namespace⇄path bijection — refuse loudly
    namespace.foreach(seg => if (seg.contains('/') || seg.isEmpty)
      throw new IllegalArgumentException(
        s"invalid namespace segment '$seg'"))
    if (namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NamespaceAlreadyExistsException(namespace)
    val session = repo.writableSession(options.getOrElse("branch", "main"))
    // any prefix of the chain occupied by an ARRAY is a collision, not a
    // parent — groups cannot nest under arrays (arrays are leaves)
    namespace.inits.toSeq.reverse.filter(_.nonEmpty).foreach { ns =>
      val p = "/" + ns.mkString("/")
      if (session.node(p).exists(_.isArray))
        throw new graft.repo.GraftException(
          s"cannot create namespace ${namespace.mkString(".")}: $p is an " +
            "array")
    }
    ensureGroups(session, namespace.init)
    // CREATE NAMESPACE ... WITH PROPERTIES lands in the group's userData
    session.addGroup("/" + namespace.mkString("/"),
      userData =
        if (metadata.isEmpty) ""
        else graft.meta.SnapshotProps.write(org.json4s.JObject(
          metadata.asScala.toList.map { case (k, v) =>
            k -> (org.json4s.JString(v): org.json4s.JValue) })))
    session.commit(s"create namespace ${namespace.mkString(".")}")
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "ALTER NAMESPACE is not supported (group user data is set via the " +
        "session API)")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace) || namespace.isEmpty) return false
    val session = repo.writableSession(options.getOrElse("branch", "main"))
    val path = "/" + namespace.mkString("/")
    val children = session.listNodes(path).filter(_.path != path)
    if (children.nonEmpty && !cascade)
      throw new org.apache.spark.sql.catalyst.analysis
        .NonEmptyNamespaceException(namespace)
    session.deleteNode(path) // deletes the subtree (delete_group)
    session.commit(s"drop namespace ${namespace.mkString(".")}")
    true
  }

  // ----------------------------------------------------------------
  // FunctionCatalog
  // ----------------------------------------------------------------

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, ChunkCoordFunction.Name))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name() == ChunkCoordFunction.Name) new ChunkCoordFunction
    else ChunkCoordFunction.parseRect(ident.name())
      .orElse(ChunkCoordFunction.lookupRectDigest(ident.name())) match {
      case Some(sizes) => new ChunkCoordRectFunction(sizes)
      case None => ChunkCoordFunction.parseFixed(ident.name()) match {
        case Some(extent) => new ChunkCoordFixedFunction(extent)
        case None => throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchFunctionException(ident)
      }
    }
}

object ChunkCoordFunction {
  val Name = "chunk_coord"
  /** Single-argument spelling `chunk_coord_<extent>(i)` — the form
    * storage-partitioned-join planning requires (Spark only supports
    * partition transforms with exactly one column child). The extent
    * lives in the function NAME, so two arrays' partitionings compare
    * compatible exactly when their chunk extents match.
    */
  def fixedName(extent: Long): String = s"${Name}_$extent"
  def parseFixed(name: String): Option[Long] =
    if (name.startsWith(Name + "_"))
      name.drop(Name.length + 1).toLongOption.filter(_ > 0)
    else None

  /** Rectilinear sibling `chunk_coord_rect_<l0>_<l1>_...(i)` — the
    * per-dim chunk-length table rides in the NAME (and canonicalName),
    * so two rect arrays' partitionings compare compatible exactly when
    * their grids match. Used for dims whose chunk count is
    * ≤ [[graft.sources.GraftScan.RectSpjMaxChunksPerDim]]; wider tables
    * switch to the digest spelling below (an unbounded table does not
    * belong in an identifier).
    */
  def rectName(sizes: Seq[Long]): String =
    s"${Name}_rect_${sizes.mkString("_")}"
  def parseRect(name: String): Option[Seq[Long]] =
    if (name.startsWith(Name + "_rect_")) {
      val parts = name.drop(Name.length + 6).split('_').toSeq
      val sizes = parts.flatMap(_.toLongOption)
      if (sizes.size == parts.size && sizes.nonEmpty &&
        sizes.forall(_ > 0)) Some(sizes)
      else None
    } else None

  /** Digest spelling `chunk_coord_rectd_<nchunks>_<sha256/16B-hex>(i)`
    * for chunk-length tables too wide to inline in an identifier. SPJ
    * compatibility is pure name equality, so a collision-resistant
    * digest of the table gives the same guarantee — two big rect grids
    * co-partition exactly when their tables match — without a cap. The
    * actual table is resolved from a driver-side registry populated by
    * the scan that emitted the name (SPJ planning, `outputPartitioning`
    * and function resolution, all happens on the driver; the bound
    * function then ships its table with the serialized task).
    *
    * Size-capped LRU (256 entries ≈ ≤16 MB at the 8192-long worst case):
    * a long-lived driver scanning many distinct rect grids must not grow
    * this without bound. Evicting a live entry is safe — the next scan of
    * that grid re-registers it before any resolution needs it (planning
    * always calls [[rectDigestName]] before the name is looked up).
    */
  private val rectRegistry = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Seq[Long]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[Long]]): Boolean = size > 256
    })

  def rectDigestName(sizes: Seq[Long]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    sizes.foreach { s =>
      var v = s; var i = 0
      while (i < 8) { md.update((v & 0xff).toByte); v >>= 8; i += 1 }
    }
    val hex = md.digest().take(16).map(b => f"$b%02x").mkString
    val name = s"${Name}_rectd_${sizes.length}_$hex"
    rectRegistry.putIfAbsent(name, sizes.toIndexedSeq)
    name
  }

  /** Inline spelling when the table fits an identifier, digest
    * spelling otherwise — the single entry point scans use.
    */
  def rectNameFor(sizes: Seq[Long]): String =
    if (sizes.size <= GraftScan.RectSpjMaxChunksPerDim) rectName(sizes)
    else rectDigestName(sizes)

  def lookupRectDigest(name: String): Option[Seq[Long]] =
    if (name.startsWith(Name + "_rectd_")) Option(rectRegistry.get(name))
    else None
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

/** The one-argument family `chunk_coord_<extent>` used as a
  * storage-partitioned-join partition transform. `canonicalName`
  * carries the extent, so the planner treats two scans as co-partitioned
  * only when their chunk grids actually match.
  */
private[sources] class ChunkCoordFixedFunction(extent: Long)
    extends UnboundFunction {
  override def name(): String = ChunkCoordFunction.fixedName(extent)
  override def description(): String =
    s"${name()}(i): chunk-grid coordinate floor(i / $extent)"
  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 1)
      throw new UnsupportedOperationException(
        s"${name()} takes (index), got ${inputType.simpleString}")
    new ChunkCoordFixedBoundFunction(extent)
  }
}

private[sources] class ChunkCoordFixedBoundFunction(extent: Long)
    extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def name(): String = ChunkCoordFunction.fixedName(extent)
  override def canonicalName(): String =
    "graft." + ChunkCoordFunction.fixedName(extent)
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): java.lang.Long =
    java.lang.Math.floorDiv(input.getLong(0), extent)
}

/** The rectilinear transform family `chunk_coord_rect_<sizes>(i)`:
  * chunk index of element `i` under the explicit per-dim chunk-length
  * table (upper bound over the prefix-sum starts).
  */
private[sources] class ChunkCoordRectFunction(sizes: Seq[Long])
    extends UnboundFunction {
  override def name(): String = ChunkCoordFunction.rectNameFor(sizes)
  override def description(): String =
    s"${name()}(i): rect chunk-grid coordinate via start-table lookup"
  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 1)
      throw new UnsupportedOperationException(
        s"${name()} takes (index), got ${inputType.simpleString}")
    new ChunkCoordRectBoundFunction(sizes)
  }
}

private[sources] class ChunkCoordRectBoundFunction(sizes: Seq[Long])
    extends ScalarFunction[java.lang.Long] {
  private val starts: Array[Long] = graft.meta.RectGrid.starts(sizes)
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def name(): String = ChunkCoordFunction.rectNameFor(sizes)
  override def canonicalName(): String =
    "graft." + ChunkCoordFunction.rectNameFor(sizes)
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): java.lang.Long = {
    val e = input.getLong(0)
    if (e < 0) return -1L
    graft.meta.RectGrid.chunkOf(starts, e)
  }
}

object GraftCatalog {
  /** Shared dtype probe over node userData: `"dtype"` or zarr-style
    * `"data_type"` (used by the catalog's table loader and ZarrExport).
    */
  private val DtypeRe =
    """"(?:dtype|data_type)"\s*:\s*"([A-Za-z0-9_]+)"""".r
  def dtypeFromUserData(userData: String): Option[String] =
    DtypeRe.findFirstMatchIn(userData).map(_.group(1))

  /** Codec probe over a zarr-doc userData: the first gzip/zstd codec
    * name inside the `codecs` list (absent or bytes-only = raw/None).
    */
  private val CodecRe = """"name"\s*:\s*"(gzip|zstd)"""".r
  def compressionFromUserData(userData: String): Option[String] = {
    val at = userData.indexOf("\"codecs\"")
    if (at < 0) None
    else CodecRe.findFirstMatchIn(userData.substring(at)).map(_.group(1))
  }

  /** `cat.snapshots` — the catalog branch's ancestry, newest first. */
  val SnapshotsSchema: StructType = StructType(Seq(
    StructField("snapshot_id", StringType, nullable = false),
    StructField("parent_id", StringType),
    StructField("message", StringType),
    StructField("flushed_at", StringType),
    StructField("merged_from", StringType)))
  /** `cat.branches` / `cat.tags` — name → tip snapshot. */
  val RefsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("snapshot_id", StringType)))
  /** `cat.ops` — the repo-pointer operations log, newest first. */
  val OpsSchema: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("op", StringType),
    StructField("detail", StringType)))
  /** `cat.<ns>.<array>.manifests` — per-shard manifest stats. */
  val ManifestsSchema: StructType = StructType(Seq(
    StructField("split", IntegerType, nullable = false),
    StructField("manifest_id", StringType, nullable = false),
    StructField("num_refs", LongType),
    StructField("size_bytes", LongType),
    StructField("extent_min", StringType),
    StructField("extent_max", StringType)))
}

/** Bounded metadata as a driver-local relation: a [[LocalScan]] hands
  * Spark the rows directly (no job, no partitions) — right-sized for
  * ancestry / branch / tag / ops listings, which are pointer-file
  * metadata no matter how big the arrays get. The rows thunk runs at
  * scan time, so the relation always reflects the CURRENT repo state.
  */
private[sources] class GraftMetaTable(
    tableName: String, tableSchema: StructType,
    rowsThunk: () => Array[InternalRow])
    extends Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, LocalScan}

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = tableSchema
        override def rows(): Array[InternalRow] = rowsThunk()
      }
    }
}

/** SQL stored procedures (`CALL cat.system.<proc>(...)`) for the
  * maintenance operations that have no relational form — the surface
  * Iceberg exposes as `CALL system.rewrite_manifests(...)`, built on
  * Spark 4's DSv2 ProcedureCatalog. Each runs driver-side against the
  * catalog's repo (the heavy lifting inside — reachability anti-joins,
  * executor-parallel copies — is the ops module's Spark jobs) and
  * returns its summary as a LocalScan relation.
  */
private[sources] object GraftProcedures {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
    ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.connector.read.{LocalScan, Scan}
  import org.apache.spark.unsafe.types.UTF8String

  val names: Seq[String] = Seq("push", "fsck", "gc", "expire", "compact",
    "merge", "inspect", "tensor_combine", "tensor_map", "tensor_unary",
    "tensor_transpose", "tensor_downsample", "tensor_concat",
    "zarr_import", "zarr_export",
    "dedup_exact", "minhash_candidates", "temperature_mix")

  /** Array dtype from the node's userData (same probe as the SQL table
    * loader) — tensor procedures infer it instead of asking the caller.
    */
  private def probeDtype(s: graft.repo.Session, path: String): String = {
    val n = s.node(path).filter(_.isArray).getOrElse(
      throw new graft.repo.GraftException(s"no array at $path",
        graft.repo.GraftError.NodeNotFound))
    GraftCatalog.dtypeFromUserData(n.userData).getOrElse(
      throw new graft.repo.GraftException(
        s"array $path declares no dtype in its metadata",
        graft.repo.GraftError.InvalidConfig))
  }

  /** Stored codec of an array (raw when its doc declares none) — the
    * SQL procedures pass it through to the tensor transforms, whose
    * stored-vs-decode codec guards would otherwise be unsatisfiable
    * from SQL (no compression parameter on the CALL surface).
    */
  private def probeCompression(s: graft.repo.Session,
                               path: String): String = {
    val n = s.node(path).filter(_.isArray).getOrElse(
      throw new graft.repo.GraftException(s"no array at $path",
        graft.repo.GraftError.NodeNotFound))
    GraftCatalog.compressionFromUserData(n.userData).getOrElse("raw")
  }

  private def parseInts(csv: String, what: String): Seq[Int] =
    try csv.split(",").toSeq.map(_.trim.toInt)
    catch { case _: NumberFormatException =>
      throw new graft.repo.GraftException(
        s"$what must be a comma-separated int list, got '$csv'",
        graft.repo.GraftError.InvalidConfig)
    }

  private def str(s: String): Any = UTF8String.fromString(s)

  private def scanOf(schema: StructType,
                     resultRows: Array[InternalRow]): java.util.Iterator[Scan] =
    java.util.List.of[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = resultRows
    }).iterator()

  private def proc(procName: String, params: Seq[ProcedureParameter],
                   out: StructType)(
      run: InternalRow => Array[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft $procName"
      override def bind(input: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = s"graft $procName"
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(in: InternalRow): java.util.Iterator[Scan] =
            scanOf(out, run(in))
        }
    }

  private def p(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()
  private def pd(n: String, t: DataType,
                 default: String): ProcedureParameter =
    ProcedureParameter.in(n, t).defaultValue(default).build()

  def load(procName: String, repo: () => Repository): UnboundProcedure =
    procName match {
      case "push" => proc("push",
        Seq(p("ref", StringType), p("dst", StringType),
          pd("force", BooleanType, "false"),
          pd("depth", IntegerType, Int.MaxValue.toString),
          pd("exists_via", StringType, "'auto'")),
        StructType(Seq(
          StructField("snapshot_id", StringType),
          StructField("snapshots_copied", IntegerType),
          StructField("chunks_copied", LongType),
          StructField("chunk_bytes_copied", LongType),
          StructField("chunks_skipped", LongType)))) { in =>
        val r = repo()
        val sum = graft.ops.Replicate.sync(r,
          Store.local(in.getUTF8String(1).toString),
          in.getUTF8String(0).toString, force = in.getBoolean(2),
          depth = in.getInt(3),
          existsVia = in.getUTF8String(4).toString)
        Array(new GenericInternalRow(Array[Any](str(sum.snapshotId),
          sum.snapshotsCopied, sum.chunksCopied, sum.chunkBytesCopied,
          sum.chunksSkipped)))
      }
      case "fsck" => proc("fsck",
        Seq(pd("ref", StringType, "'main'")),
        StructType(Seq(StructField("kind", StringType),
          StructField("id", StringType),
          StructField("detail", StringType)))) { in =>
        graft.ops.Integrity.check(repo(), in.getUTF8String(0).toString)
          .collect().map(r => new GenericInternalRow(Array[Any](
            str(r.getString(0)), str(r.getString(1)), str(r.getString(2))))
            : InternalRow)
      }
      // metadata-file header/stat dump (#2216): one row per on-disk
      // metadata artifact backing the resolved version — the pointer
      // tip, the snapshot document, its transaction log files, and every
      // manifest shard (with ref counts and coordinate envelopes). Pure
      // driver metadata + per-key stats; nothing is decoded beyond what
      // the snapshot already loaded.
      case "inspect" => proc("inspect",
        Seq(pd("ref", StringType, "'main'")),
        StructType(Seq(
          StructField("kind", StringType),
          StructField("key", StringType),
          StructField("size_bytes", LongType),
          StructField("node_path", StringType),
          StructField("detail", StringType)))) { in =>
        val r = repo()
        val refStr = in.getUTF8String(0).toString
        val vref = GraftTableProvider.parseVersion(refStr, s =>
          if (r.listBranches().contains(s)) VersionRef.Branch(s)
          else if (r.listTags().contains(s)) VersionRef.Tag(s)
          else VersionRef.SnapshotVer(s))
        val sid = r.resolveVersion(vref)
        val snap = r.lookupSnapshot(sid)
        val store = r.store
        def row(kind: String, key: String, size: Long, path: String,
                detail: String): InternalRow =
          new GenericInternalRow(Array[Any](str(kind), str(key), size,
            if (path == null) null else str(path), str(detail)))
        val pointer = store
          .listPage(graft.meta.Layout.PointerPrefix, None, 1)
          .headOption.map(o => row("pointer", o.key, o.size, null,
            s"generation=${graft.meta.Layout.genOf(o.key)}")).toSeq
        val snapKey = graft.meta.Layout.snapshotKey(sid)
        val snapRow = row("snapshot", snapKey,
          store.stat(snapKey).map(_.size).getOrElse(-1L), null,
          s"id=$sid; message=${snap.message}; nodes=${snap.nodes.size}; " +
            s"flushed_at=${snap.flushedAt}")
        // list only DATA files: Spark job markers (_SUCCESS) and
        // checksum siblings (.crc) are not format artifacts
        def dataFiles(prefix: String) = store.list(prefix).filter { o =>
          val base = o.key.substring(o.key.lastIndexOf('/') + 1)
          base.nonEmpty && !base.startsWith(".") && !base.startsWith("_")
        }
        val txRows = dataFiles(graft.meta.Layout.txLogPrefix(sid) + "/")
          .sortBy(_.key)
          .map(o => row("transaction", o.key, o.size, null, s"snapshot=$sid"))
        val manifestRows = snap.manifests.toSeq.flatMap {
          case (nodeId, refs) =>
            val path = snap.nodeById(nodeId).map(_.path).orNull
            refs.map { m =>
              val prefix = graft.meta.Layout.manifestPrefix(m.manifestId) +
                s"/node_id=$nodeId/split=${m.split}/"
              val files = dataFiles(prefix)
              (path, m.split, row("manifest", prefix,
                files.map(_.size).sum, path,
                s"refs=${m.numRefs}; files=${files.size}; " +
                  s"extent=[${m.emin.mkString(",")}]..[${m.emax.mkString(",")}]"))
            }
        }.sortBy { case (p, sp, _) => (Option(p).getOrElse(""), sp) }
          .map(_._3)
        ((pointer :+ snapRow) ++ txRows ++ manifestRows).toArray
      }
      case "gc" => proc("gc",
        Seq(pd("older_than_hours", IntegerType, "1"),
          pd("dry_run", BooleanType, "false")),
        StructType(Seq(
          StructField("chunks_deleted", LongType),
          StructField("manifests_deleted", LongType),
          StructField("snapshots_deleted", LongType),
          StructField("tx_logs_deleted", LongType),
          StructField("bytes_reclaimed", LongType)))) { in =>
        val s = graft.ops.GC.garbageCollect(repo(),
          java.time.Instant.now().minusSeconds(in.getInt(0) * 3600L),
          dryRun = in.getBoolean(1))
        Array(new GenericInternalRow(Array[Any](s.chunksDeleted,
          s.manifestsDeleted, s.snapshotsDeleted, s.txLogsDeleted,
          s.bytesDeleted)))
      }
      case "expire" => proc("expire",
        Seq(pd("older_than_hours", IntegerType, "24")),
        StructType(Seq(StructField("snapshots_squashed", IntegerType)))) {
        in =>
        val n = graft.ops.GC.expire(repo(),
          java.time.Instant.now().minusSeconds(in.getInt(0) * 3600L))
        Array(new GenericInternalRow(Array[Any](n)))
      }
      case "compact" => proc("compact",
        Seq(pd("branch", StringType, "'main'")),
        StructType(Seq(StructField("snapshot_id", StringType)))) { in =>
        val id = graft.ops.Compaction.rewriteManifests(repo(),
          in.getUTF8String(0).toString)
        Array(new GenericInternalRow(Array[Any](str(id))))
      }
      // on_conflict names the WINNING SIDE BY ROLE — 'source' (the
      // incoming src branch, the default) or 'dest' (the branch being
      // merged into) — NOT git's ours/theirs, whose meaning inverts here
      // (the replayed src edits ARE the session changeset, so git-style
      // 'ours' would be the incoming branch — a silent trap). 'ours' /
      // 'theirs' are refused by name with the translation.
      case "merge" => proc("merge",
        Seq(p("src", StringType), p("dst", StringType),
          pd("on_conflict", StringType, "'source'")),
        StructType(Seq(StructField("snapshot_id", StringType)))) { in =>
        val sel = in.getUTF8String(2).toString match {
          case "source" => graft.vc.VersionSelection.UseOurs
          case "dest" => graft.vc.VersionSelection.UseTheirs
          case "fail" => graft.vc.VersionSelection.Fail
          case "ours" | "theirs" => throw new graft.repo.GraftException(
            "on_conflict: 'ours'/'theirs' are ambiguous here (git's " +
              "'ours' would be the DESTINATION branch but the merge " +
              "session holds the SOURCE edits) — say 'source' (incoming " +
              "branch wins) or 'dest' (current branch wins)",
            graft.repo.GraftError.InvalidConfig)
          case other => throw new graft.repo.GraftException(
            s"on_conflict must be source|dest|fail, got '$other'",
            graft.repo.GraftError.InvalidConfig)
        }
        val id = repo().mergeBranch(in.getUTF8String(0).toString,
          in.getUTF8String(1).toString,
          solver = graft.vc.BasicConflictSolver(onChunkConflict = sel))
        Array(new GenericInternalRow(Array[Any](str(id))))
      }
      // tensor transforms from pure SQL — each runs the distributed job
      // and lands ONE commit; paths are node paths ('/g/a' or 'g/a')
      case "tensor_combine" => proc("tensor_combine",
        Seq(p("a", StringType), p("b", StringType), p("dst", StringType),
          pd("op", StringType, "'add'"),
          pd("branch", StringType, "'main'")),
        StructType(Seq(StructField("snapshot_id", StringType)))) { in =>
        val s = repo().writableSession(in.getUTF8String(4).toString)
        val a = in.getUTF8String(0).toString
        val op = in.getUTF8String(3).toString
        graft.tensor.TensorPlane.combine(s, a,
          in.getUTF8String(1).toString, in.getUTF8String(2).toString,
          op, probeDtype(s, a), compression = probeCompression(s, a))
        Array(new GenericInternalRow(Array[Any](str(
          s.commit(s"tensor_combine $op")))))
      }
      case "tensor_map" => proc("tensor_map",
        Seq(p("src", StringType), p("dst", StringType),
          pd("scale", DoubleType, "1.0"), pd("offset", DoubleType, "0.0"),
          pd("branch", StringType, "'main'")),
        StructType(Seq(StructField("snapshot_id", StringType)))) { in =>
        val s = repo().writableSession(in.getUTF8String(4).toString)
        val src = in.getUTF8String(0).toString
        graft.tensor.TensorPlane.mapValues(s, src,
          in.getUTF8String(1).toString, in.getDouble(2), in.getDouble(3),
          probeDtype(s, src), compression = probeCompression(s, src))
        Array(new GenericInternalRow(Array[Any](str(
          s.commit("tensor_map affine")))))
      }
      case "tensor_unary" => proc("tensor_unary",
        Seq(p("src", StringType), p("dst", StringType),
          p("op", StringType),
          pd("lo", DoubleType, "CAST('-Infinity' AS DOUBLE)"),
          pd("hi", DoubleType, "CAST('Infinity' AS DOUBLE)"),
          pd("branch", StringType, "'main'")),
        StructType(Seq(StructField("snapshot_id", StringType)))) { in =>
        val s = repo().writableSession(in.getUTF8String(5).toString)
        val src = in.getUTF8String(0).toString
        graft.tensor.TensorPlane.mapUnary(s, src,
          in.getUTF8String(1).toString, in.getUTF8String(2).toString,
          probeDtype(s, src), lo = in.getDouble(3), hi = in.getDouble(4),
          compression = probeCompression(s, src))
        Array(new GenericInternalRow(Array[Any](str(
          s.commit(s"tensor_unary ${in.getUTF8String(2)}")))))
      }
      case "tensor_transpose" => proc("tensor_transpose",
        Seq(p("src", StringType), p("dst", StringType),
          p("perm", StringType), pd("branch", StringType, "'main'")),
        StructType(Seq(StructField("snapshot_id", StringType)))) { in =>
        val s = repo().writableSession(in.getUTF8String(3).toString)
        val src = in.getUTF8String(0).toString
        val perm = parseInts(in.getUTF8String(2).toString, "perm")
        graft.tensor.TensorPlane.transpose(s, src,
          in.getUTF8String(1).toString, perm, probeDtype(s, src),
          compression = probeCompression(s, src))
        Array(new GenericInternalRow(Array[Any](str(
          s.commit(s"tensor_transpose ${perm.mkString(",")}")))))
      }
      case "tensor_downsample" => proc("tensor_downsample",
        Seq(p("src", StringType), p("dst", StringType),
          p("factors", StringType), pd("mode", StringType, "'mean'"),
          pd("branch", StringType, "'main'")),
        StructType(Seq(StructField("snapshot_id", StringType)))) { in =>
        val s = repo().writableSession(in.getUTF8String(4).toString)
        val src = in.getUTF8String(0).toString
        val factors = parseInts(in.getUTF8String(2).toString, "factors")
        graft.tensor.TensorPlane.downsample(s, src,
          in.getUTF8String(1).toString, factors, probeDtype(s, src),
          mode = in.getUTF8String(3).toString,
          compression = probeCompression(s, src))
        Array(new GenericInternalRow(Array[Any](str(
          s.commit(s"tensor_downsample ${factors.mkString(",")}")))))
      }
      case "tensor_concat" => proc("tensor_concat",
        Seq(p("srcs", StringType), p("dst", StringType),
          pd("axis", IntegerType, "0"), pd("branch", StringType, "'main'")),
        StructType(Seq(StructField("snapshot_id", StringType)))) { in =>
        val s = repo().writableSession(in.getUTF8String(3).toString)
        val srcs = in.getUTF8String(0).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        if (srcs.isEmpty) throw new graft.repo.GraftException(
          "tensor_concat: srcs must name at least one array " +
            "(comma-separated)", graft.repo.GraftError.InvalidConfig)
        val axis = in.getInt(2)
        graft.tensor.TensorPlane.concat(s, srcs,
          in.getUTF8String(1).toString, axis, probeDtype(s, srcs.head),
          compression = probeCompression(s, srcs.head))
        Array(new GenericInternalRow(Array[Any](str(
          s.commit(s"tensor_concat axis=$axis")))))
      }
      // store adoption / publication from pure SQL
      case "zarr_import" => proc("zarr_import",
        Seq(p("src", StringType), pd("copy", BooleanType, "false"),
          pd("branch", StringType, "'main'")),
        StructType(Seq(StructField("snapshot_id", StringType)))) { in =>
        val id = graft.ops.ZarrImport.importStore(repo(),
          in.getUTF8String(2).toString,
          Store.local(in.getUTF8String(0).toString),
          copy = in.getBoolean(1))
        Array(new GenericInternalRow(Array[Any](str(id))))
      }
      case "zarr_export" => proc("zarr_export",
        Seq(p("ref", StringType), p("dst", StringType),
          pd("compression", StringType, "'raw'"),
          pd("shard", StringType, "''")),
        StructType(Seq(StructField("objects_written", LongType)))) { in =>
        val r = repo()
        val ro = r.readonlySession(
          graft.repo.VersionRef.Branch(in.getUTF8String(0).toString))
        val shard = Option(in.getUTF8String(3).toString)
          .filter(_.nonEmpty)
          .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Nil)
        val n = graft.ops.ZarrExport.exportStore(ro,
          Store.local(in.getUTF8String(1).toString),
          compression = in.getUTF8String(2).toString,
          shardChunks = shard)
        Array(new GenericInternalRow(Array[Any](java.lang.Long.valueOf(n))))
      }
      // ---- pipeline procedures: the north-star LLM-data ops from SQL.
      // Input is any table/view NAME the session can resolve (temp view,
      // catalog table, `parquet`.`/path`); the result registers as a
      // LAZY temp view (output_view) and the returned row names it — the
      // relation itself never collects to the driver, so the CALL costs
      // nothing until the user SELECTs from the view (scale-correct at
      // 100 TB, unlike returning rows through a LocalScan).
      case "dedup_exact" => proc("dedup_exact",
        Seq(p("input", StringType),
          pd("text_col", StringType, "'text'"),
          pd("output_view", StringType, "'dedup_exact'")),
        viewResult) { in =>
        val spark = org.apache.spark.sql.SparkSession.active
        val out = graft.pipeline.Dedup.exact(
          spark.table(in.getUTF8String(0).toString),
          textCol = in.getUTF8String(1).toString)
        viewRow(out, in.getUTF8String(2).toString)
      }
      case "minhash_candidates" => proc("minhash_candidates",
        Seq(p("input", StringType),
          pd("text_col", StringType, "'text'"),
          pd("num_hashes", IntegerType, "32"),
          pd("bands", IntegerType, "8"),
          pd("portable", BooleanType, "true"),
          pd("output_view", StringType, "'minhash_candidates'")),
        viewResult) { in =>
        val spark = org.apache.spark.sql.SparkSession.active
        val out = graft.pipeline.Dedup.minhashCandidates(
          spark.table(in.getUTF8String(0).toString),
          textCol = in.getUTF8String(1).toString,
          numHashes = in.getInt(2), bands = in.getInt(3),
          portable = in.getBoolean(4))
        viewRow(out, in.getUTF8String(5).toString)
      }
      case "temperature_mix" => proc("temperature_mix",
        Seq(p("input", StringType),
          p("id_col", StringType),
          p("source_col", StringType),
          pd("alpha", DoubleType, "0.5"),
          pd("target_rows", LongType, "-1"), // -1 = input row count
          pd("method", StringType, "'md5'"),
          pd("output_view", StringType, "'temperature_mix'")),
        viewResult) { in =>
        val spark = org.apache.spark.sql.SparkSession.active
        val df = spark.table(in.getUTF8String(0).toString)
        val target =
          if (in.getLong(4) > 0) in.getLong(4) else df.count()
        val out = graft.pipeline.Sampling.temperatureMix(df,
          in.getUTF8String(1).toString, in.getUTF8String(2).toString,
          alpha = in.getDouble(3), targetRows = target,
          method = in.getUTF8String(5).toString)
        viewRow(out, in.getUTF8String(6).toString)
      }
      case other => throw new graft.repo.GraftException(
        s"no procedure system.$other", graft.repo.GraftError.RefNotFound)
    }

  /** Pipeline procedures return (view, columns): the registered lazy
    * temp view's name and its schema's column list.
    */
  private val viewResult = StructType(Seq(
    StructField("view", StringType),
    StructField("columns", StringType)))

  private def viewRow(out: org.apache.spark.sql.DataFrame,
                      view: String): Array[InternalRow] = {
    out.createOrReplaceTempView(view)
    Array(new GenericInternalRow(Array[Any](str(view),
      str(out.columns.mkString(",")))))
  }
}
