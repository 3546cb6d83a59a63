package graft.ops

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods
import graft.repo.{GraftException, Session}
import graft.storage.Store

/** Export one VERSION of a repo as a plain Zarr v3 store — the publish
  * path: hand a pinned snapshot to consumers that speak only zarr (no
  * graft, no manifests, no version pointers). Inverse of [[ZarrImport]];
  * `export → import` round-trips.
  *
  * Scale shape: metadata documents are a driver concern (#nodes); chunk
  * payloads move on executors — each task fetches its refs (native,
  * inline, or virtual alike) and writes `<path>/c/<coords>` objects to
  * the destination store. The session is version-pinned, so a branch
  * advancing mid-export cannot tear the published copy.
  */
object ZarrExport {

  /** Export every array/group reachable in `session` to `dst` under
    * `dstPrefix`. Returns the number of chunk objects written.
    *
    * `compression`: what the stored chunk bytes ARE (the engine keeps
    * codec choice with the reader) — declared in the exported
    * `zarr.json` so zarr consumers decode correctly ("raw" → bytes
    * codec only, "zstd"/"gzip" → bytes + that codec).
    */
  def exportStore(session: Session, dst: Store, dstPrefix: String = "",
                  compression: String = "raw",
                  paths: Seq[String] = Nil): Long = {
    val spark = session.repo.spark
    val prefix =
      if (dstPrefix.isEmpty || dstPrefix.endsWith("/")) dstPrefix
      else dstPrefix + "/"
    val all = session.nodes
    // path filter: the named nodes (and their descendants) plus the
    // ancestor groups that give the exported tree its zarr.json docs
    val nodes =
      if (paths.isEmpty) all
      else {
        val wanted = paths.map(graft.core.NodePath.normalize).toSet
        all.filter(n => wanted.exists(w => n.path == w ||
          graft.core.NodePath.isAncestorOf(w, n.path) ||
          graft.core.NodePath.isAncestorOf(n.path, w)))
      }
    if (nodes.isEmpty) throw new GraftException("empty tree: nothing to export")

    var written = 0L
    for (n <- nodes.sortBy(_.path)) {
      val rel = n.path.stripPrefix("/")
      val base = if (rel.isEmpty) prefix else s"$prefix$rel/"
      dst.putBytes(base + "zarr.json",
        docFor(n, compression).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (n.isArray) {
        if (n.isRectilinear) throw new GraftException(
          s"${n.path}: rectilinear grids have no zarr v3 regular-grid " +
            "representation; rechunk first")
        val fetch = graft.tensor.TensorPlane.fetchBytesUdf(
          session.repo.store.conf, session.repo.virtualResolver)
        val dstConf = dst.conf
        import spark.implicits._
        val keys = session.refs(n.path)
          .repartition(spark.sparkContext.defaultParallelism * 2,
            col("coord"))
          .withColumn("bytes", fetch(col("kind"), col("inline"),
            col("chunk_id"), col("location"), col("offset"),
            col("length")))
          .select(
            concat(lit(base + "c/"),
              array_join(col("coord"), "/")).as("key"),
            col("bytes"))
          .as[(String, Array[Byte])]
          .mapPartitions { it =>
            val d = graft.storage.StoreConf.cached(dstConf)
            var cnt = 0L
            it.foreach { case (key, bytes) => d.putBytes(key, bytes); cnt += 1 }
            Iterator.single(cnt)
          }.reduce(_ + _)
        written += keys
      }
    }
    written
  }

  /** zarr.json for a node: if its userData already IS a zarr v3 doc
    * (e.g. the node was imported), re-emit it — attributes and fill
    * values survive the round trip — EXCEPT its `chunk_key_encoding`,
    * which is rewritten to the default `c/` form because that is what
    * this exporter actually writes (an array adopted from zarr v2
    * carries a v2-`.` declaration that would mislabel the exported
    * keys). Otherwise synthesize a doc from the node spec + the
    * userData dtype probe.
    */
  private def docFor(n: graft.meta.NodeSpec, compression: String): String = {
    val defaultEnc: JValue = JObject(
      "name" -> JString("default"),
      "configuration" -> JObject("separator" -> JString("/")))
    val fromUser =
      try {
        val j = JsonMethods.parse(n.userData)
        (j \ "zarr_format", j \ "node_type") match {
          case (JInt(v), JString(t)) if v == 3 &&
            (t == "array") == n.isArray =>
            if (!n.isArray) Some(n.userData)
            else Some(JsonMethods.compact(JsonMethods.render(
              j.removeField(_._1 == "chunk_key_encoding").asInstanceOf[JObject] ~
                ("chunk_key_encoding" -> defaultEnc))))
          case _ => None
        }
      } catch { case _: Exception => None }
    fromUser.getOrElse {
      if (!n.isArray) """{"zarr_format":3,"node_type":"group"}"""
      else {
        val dtype = graft.sources.GraftCatalog.dtypeFromUserData(n.userData)
          .getOrElse(throw new GraftException(
            s"${n.path}: no dtype in userData — write " +
              """{"dtype":"..."} or pass a zarr doc"""))
        val codecs = compression match {
          case "raw" | "" | null =>
            """[{"name":"bytes","configuration":{"endian":"little"}}]"""
          case c =>
            s"""[{"name":"bytes","configuration":{"endian":"little"}},""" +
              s"""{"name":"$c"}]"""
        }
        val dims =
          if (n.dimNames.nonEmpty)
            s""","dimension_names":[${n.dimNames.map(d => s""""$d"""").mkString(",")}]"""
          else ""
        s"""{"zarr_format":3,"node_type":"array",""" +
          s""""shape":[${n.shape.mkString(",")}],""" +
          s""""chunk_grid":{"name":"regular","configuration":""" +
          s"""{"chunk_shape":[${n.chunkShape.mkString(",")}]}},""" +
          s""""data_type":"$dtype",""" +
          s""""chunk_key_encoding":{"name":"default",""" +
          s""""configuration":{"separator":"/"}},""" +
          s""""fill_value":0,"codecs":$codecs$dims}"""
      }
    }
  }
}
