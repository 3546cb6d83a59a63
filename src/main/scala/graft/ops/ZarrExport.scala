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
  /** `shardChunks` (optional): publish SHARDED zarr — each written
    * object aggregates `shardChunks(d)` source chunks per dimension
    * under the `sharding_indexed` codec (inner chunks concatenated,
    * `(offset, nbytes)` uint64-LE index + real crc32c at the object
    * end). One task assembles one shard — object count drops by
    * ∏shardChunks, the standard fix for object-store listing/request
    * overhead on many-chunk arrays. A shard must fit task memory
    * (the same sizing rule zarr itself imposes on writers).
    */
  def exportStore(session: Session, dst: Store, dstPrefix: String = "",
                  compression: String = "raw",
                  paths: Seq[String] = Nil,
                  shardChunks: Seq[Int] = Nil,
                  rleChunkShapes: Boolean = false): Long = {
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
    // refuse BEFORE writing anything: the loop below persists each
    // node's zarr.json as it goes, and shardedDoc over a rect node
    // (empty chunkShape) would leave a corrupt doc in the destination
    // ahead of the exception
    if (shardChunks.nonEmpty)
      nodes.filter(n => n.isArray && n.isRectilinear).foreach { n =>
        throw new GraftException(
          s"${n.path}: sharded export requires a regular chunk grid")
      }

    var written = 0L
    for (n <- nodes.sortBy(_.path)) {
      val rel = n.path.stripPrefix("/")
      val base = if (rel.isEmpty) prefix else s"$prefix$rel/"
      dst.putBytes(base + "zarr.json",
        docFor(n, compression, shardChunks, rleChunkShapes)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (n.isArray) {
        // rect grids publish with the `rectilinear` chunk_grid extension
        // (the same doc the repo's own zarr facade serves) and
        // exact-extent chunk buffers — byte-identical round-trip through
        // ZarrImport. Sharded export stays regular-only (refused up
        // front, before any doc was written).
        val dstConf = dst.conf
        import spark.implicits._
        if (shardChunks.isEmpty) {
          val fetch = graft.tensor.TensorPlane.fetchBytesUdf(
            session.repo.store.conf, session.repo.virtualResolver)
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
        } else {
          val sc = shardChunks
          if (sc.size != n.shape.size || sc.exists(_ < 1))
            throw new GraftException(
              s"${n.path}: shardChunks ${sc.mkString(",")} must give one " +
                s"positive factor per dimension (rank ${n.shape.size})",
              graft.repo.GraftError.InvalidConfig)
          val strides = sc.indices.map(d => sc.drop(d + 1).product)
          val entriesPerShard = sc.product
          val srcConf = session.repo.store.conf
          val resolver = session.repo.virtualResolver
          val shards = session.refs(n.path)
            .select(col("coord"), col("kind"), col("inline"),
              col("chunk_id"), col("location"), col("offset"),
              col("length"))
            .as[(Seq[Int], String, Array[Byte], String, String, Long,
                 Long)]
            .groupByKey { case (coord, _, _, _, _, _, _) =>
              coord.indices.map(d => coord(d) / sc(d)) }
            .mapGroups { (shardCoord, it) =>
              val inner = new Array[Array[Byte]](entriesPerShard)
              it.foreach { case (coord, kind, inline, id, loc, off, len) =>
                val li = coord.indices.map(d =>
                  (coord(d) - shardCoord(d) * sc(d)) * strides(d)).sum
                inner(li) = graft.tensor.TensorPlane.fetchRef(
                  srcConf, resolver, kind, inline, id, loc, off, len,
                  cacheable = false)
              }
              val payloadLen = inner.iterator.filter(_ != null)
                .map(_.length.toLong).sum
              val indexLen = entriesPerShard.toLong * 16 + 4
              if (payloadLen + indexLen > Int.MaxValue)
                throw new GraftException(
                  s"shard ${shardCoord.mkString(",")} would be " +
                    s"${payloadLen + indexLen} bytes (> 2 GiB JVM array " +
                    "limit) — pick smaller shardChunks",
                  graft.repo.GraftError.InvalidConfig)
              val index = java.nio.ByteBuffer
                .allocate(entriesPerShard * 16 + 4)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              val out = java.nio.ByteBuffer
                .allocate((payloadLen + indexLen).toInt)
              var off = 0L
              inner.foreach {
                case null => index.putLong(-1L).putLong(-1L)
                case b =>
                  index.putLong(off).putLong(b.length.toLong)
                  out.put(b); off += b.length
              }
              val crc = new java.util.zip.CRC32C
              crc.update(index.array(), 0, entriesPerShard * 16)
              index.putInt(crc.getValue.toInt)
              out.put(index.array())
              val d = graft.storage.StoreConf.cached(dstConf)
              d.putBytes(base + "c/" + shardCoord.mkString("/"),
                out.array())
              1L
            }.reduce(_ + _)
          written += shards
        }
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
  /** Run-length-encode a chunk-length table per the reference grammar
    * (store.rs:1303-1330): runs of >= 3 equal sizes become `[size,
    * count]`, singles stay plain — mixed entries are legal.
    */
  private def rleTable(sizes: Seq[Long]): String = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < sizes.length) {
      var j = i
      while (j < sizes.length && sizes(j) == sizes(i)) j += 1
      val run = j - i
      if (run >= 3) out += s"[${sizes(i)},$run]"
      else (0 until run).foreach(_ => out += sizes(i).toString)
      i = j
    }
    out.mkString("[", ",", "]")
  }

  private def docFor(n: graft.meta.NodeSpec, compression: String,
                     shardChunks: Seq[Int] = Nil,
                     rleChunkShapes: Boolean = false): String = {
    val defaultEnc: JValue = JObject(
      "name" -> JString("default"),
      "configuration" -> JObject("separator" -> JString("/")))
    if (n.isArray && shardChunks.nonEmpty)
      return shardedDoc(n, compression, shardChunks)
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
        val grid =
          if (n.isRectilinear)
            s""""chunk_grid":{"name":"rectilinear","configuration":""" +
              s"""{"chunk_shapes":[${n.chunkSizesPerDim
                .map(t => if (rleChunkShapes) rleTable(t)
                          else t.mkString("[", ",", "]"))
                .mkString(",")}]}},"""
          else
            s""""chunk_grid":{"name":"regular","configuration":""" +
              s"""{"chunk_shape":[${n.chunkShape.mkString(",")}]}},"""
        s"""{"zarr_format":3,"node_type":"array",""" +
          s""""shape":[${n.shape.mkString(",")}],""" +
          grid +
          s""""data_type":"$dtype",""" +
          s""""chunk_key_encoding":{"name":"default",""" +
          s""""configuration":{"separator":"/"}},""" +
          s""""fill_value":0,"codecs":$codecs$dims}"""
      }
    }
  }

  /** zarr.json for a SHARDED export: chunk_grid = the shard shape
    * (chunkShape × shardChunks), codecs = one `sharding_indexed` layer
    * whose inner chunk_shape is the repo's chunk grid and whose inner
    * codecs match what the stored bytes are. Attributes and fill_value
    * carry over from an adopted zarr doc when present.
    */
  private def shardedDoc(n: graft.meta.NodeSpec, compression: String,
                         sc: Seq[Int]): String = {
    val dtype = graft.sources.GraftCatalog.dtypeFromUserData(n.userData)
      .getOrElse(throw new GraftException(
        s"${n.path}: no dtype in userData — write " +
          """{"dtype":"..."} or pass a zarr doc"""))
    val userJ =
      try Some(JsonMethods.parse(n.userData)) catch { case _: Exception => None }
    def carry(field: String): JValue =
      userJ.map(_ \ field).getOrElse(JNothing)
    val innerCodecs: JValue = compression match {
      case "raw" | "" | null => JArray(List(
        ("name" -> JString("bytes")) ~
          ("configuration" -> JObject("endian" -> JString("little")))))
      case c => JArray(List(
        ("name" -> JString("bytes")) ~
          ("configuration" -> JObject("endian" -> JString("little"))),
        JObject("name" -> JString(c))))
    }
    val shardShape = n.chunkShape.zip(sc).map { case (c, k) => c * k }
    val doc: JObject =
      ("zarr_format" -> JInt(3)) ~
        ("node_type" -> JString("array")) ~
        ("shape" -> JArray(n.shape.toList.map(v => JInt(BigInt(v))))) ~
        ("chunk_grid" -> (
          ("name" -> JString("regular")) ~
            ("configuration" -> ("chunk_shape" -> JArray(
              shardShape.toList.map(v => JInt(BigInt(v)))))))) ~
        ("data_type" -> JString(dtype)) ~
        ("chunk_key_encoding" -> (
          ("name" -> JString("default")) ~
            ("configuration" -> ("separator" -> JString("/"))))) ~
        ("fill_value" -> (carry("fill_value") match {
          case JNothing => JInt(0)
          case v => v
        })) ~
        ("codecs" -> JArray(List(
          ("name" -> JString("sharding_indexed")) ~
            ("configuration" -> (
              ("chunk_shape" -> JArray(
                n.chunkShape.toList.map(v => JInt(BigInt(v))))) ~
                ("codecs" -> innerCodecs) ~
                ("index_codecs" -> JArray(List(
                  JObject("name" -> JString("bytes")),
                  JObject("name" -> JString("crc32c"))))) ~
                ("index_location" -> JString("end")))))))
    val withExtras = List(
      "attributes" -> carry("attributes"),
      "dimension_names" ->
        (if (n.dimNames.nonEmpty)
          JArray(n.dimNames.toList.map(JString(_)))
        else carry("dimension_names")))
      .foldLeft(doc) { case (d, (f, v)) =>
        if (v == JNothing) d else d ~ (f -> v)
      }
    JsonMethods.compact(JsonMethods.render(withExtras))
  }
}
