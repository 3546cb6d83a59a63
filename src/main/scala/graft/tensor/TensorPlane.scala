package graft.tensor

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{ChunkCodec, CodecFunctions}
import graft.meta.ChunkRef
import graft.repo.{GraftException, Session}

/** The tensor value plane: arrays as (i0..iN, value) DataFrames — the
  * Spark-native extension the reference delegates to zarr-python (§3.1's
  * value decode, done inside the query engine so `SELECT avg(value)` works
  * directly).
  *
  * Executor-side chunk fetch is a UDF over the chunk-ref columns (IO-bound
  * — per-row ranged GETs, exactly the reference's fetch dispatch
  * session.rs:1274-1317); decode is the native [[DecodeChunkExpr]].
  */
object TensorPlane {

  private def sessionFetch(session: Session) =
    fetchBytesUdf(session.repo.store.conf, session.repo.virtualResolver)

  /** Fetch chunk bytes on executors from the ref columns — the reference's
    * fetch dispatch (session.rs:1274-1317), per-row '''ranged''' GETs
    * through a per-executor cached store client ([[StoreConf.cached]]:
    * one connection pool per JVM, any backend). Virtual refs dispatch
    * through the serializable resolver — per-container stores, else
    * scheme dispatch via [[graft.virt.ByteFetch]].
    */
  def fetchBytesUdf(conf: graft.storage.StoreConf,
                    resolver: graft.virt.VirtualChunkResolver =
                      graft.virt.VirtualChunkResolver.default) = udf(
    (kind: String, inline: Array[Byte], chunkId: String, location: String,
     offset: Long, length: Long) => {
      kind match {
        case ChunkRef.KindInline => inline
        case ChunkRef.KindRef =>
          val store = graft.storage.StoreConf.cached(conf)
          val key = graft.meta.Layout.chunkKey(chunkId)
          // value-plane scans read each (sub-)range once per query:
          // bypass the chunk cache (bulk-scan contract — see ChunkCache)
          graft.storage.ChunkCache.getOrFetch(store, key, offset, length,
            cacheable = false)(
            store.getRangeSplit(key, offset, length))
        case ChunkRef.KindVirtual =>
          resolver.ranged(location, offset, length)
        case _ => null
      }
    })

  /** Chunk-ref rows with a materialized `bytes` column. */
  def chunkBytes(session: Session, path: String): DataFrame = {
    val fetch = sessionFetch(session)
    session.refs(path).withColumn("bytes",
      fetch(col("kind"), col("inline"), col("chunk_id"), col("location"),
        col("offset"), col("length")))
  }

  /** Explode an array into one row per element: (i0..iN, value), with
    * global indices computed from chunk coord × chunk shape + in-chunk
    * offset (row-major). Rows beyond the array bounds (partial edge
    * chunks) are filtered out. `value` is BIGINT for int dtypes, DOUBLE
    * for float dtypes.
    */
  def values(session: Session, path: String, dtype: String,
             compression: String = "raw"): DataFrame = {
    val node = session.node(path).filter(_.isArray).getOrElse(
      throw new GraftException(s"no array at $path"))
    valuesOfRefs(session, node, session.refs(path), dtype, compression)
  }

  /** Value explode over an explicit chunk-ref frame (lets callers hand in
    * a split-pruned subset — the connector's pushdown path).
    */
  def valuesOfRefs(session: Session, node: graft.meta.NodeSpec,
                   refs: DataFrame, dtype: String,
                   compression: String): DataFrame = {
    val shape = node.shape
    val ndim = shape.size
    val fetch = sessionFetch(session)
    // one ref row = megabytes of decoded values: spread chunks across
    // tasks BEFORE the explode, or a 1 GiB array decodes on one core
    // (a manifest's 128 rows easily fit one parquet partition)
    val spark = refs.sparkSession
    val exploded = refs
      .repartition(spark.sparkContext.defaultParallelism * 2, col("coord"))
      .withColumn("bytes", fetch(col("kind"), col("inline"), col("chunk_id"),
        col("location"), col("offset"), col("length")))
      .select(col("coord"),
        posexplode(CodecFunctions.decode_chunk(col("bytes"), dtype,
          compression)))
    val withIdx =
      if (!node.isRectilinear) regularIndex(exploded, node, ndim)
      else {
        // rectilinear grid (store.rs:1158-1241): chunk extents vary per
        // coordinate; per-dim extent/start tables ship as literal arrays,
        // strides are computed per row right-to-left
        val sizes = node.chunkSizesPerDim
        val starts = sizes.map(_.scanLeft(0L)(_ + _).dropRight(1))
        var df = exploded
        for (i <- 0 until ndim)
          df = df.withColumn(s"_e$i", element_at(typedLit(sizes(i)),
            element_at(col("coord"), i + 1) + 1))
        df = df.withColumn(s"_st${ndim - 1}", lit(1L))
        for (i <- (ndim - 2) to 0 by -1)
          df = df.withColumn(s"_st$i",
            col(s"_st${i + 1}") * col(s"_e${i + 1}"))
        for (i <- 0 until ndim)
          df = df.withColumn(s"i$i",
            element_at(typedLit(starts(i)),
              element_at(col("coord"), i + 1) + 1) +
              pmod(expr(s"pos div _st$i"), col(s"_e$i")))
        df
      }
    val bounded = (0 until ndim).foldLeft(withIdx) { case (df, i) =>
      df.filter(col(s"i$i") < shape(i))
    }
    bounded.select((0 until ndim).map(i => col(s"i$i")) :+
      col("col").as("value"): _*)
  }

  /** Chunk refs that DIFFER between two versions of `path`: full-outer
    * join of the two ref relations on coord, keeping rows where any ref
    * field changed (rewritten chunk id, inline payload, virtual
    * location/range) or where the chunk exists on one side only. This
    * is the metadata prune of [[valueDiff]] — on a 100 TB array with
    * one rewritten chunk it returns one row.
    */
  def changedChunkRefs(oldSession: Session, newSession: Session,
                       path: String): DataFrame = {
    def side(s: Session, tag: String) = s.refs(path).select(col("coord"),
      struct(col("kind"), col("inline"), col("chunk_id"), col("location"),
        col("offset"), col("length")).as(tag))
    side(oldSession, "o")
      .join(side(newSession, "n"), Seq("coord"), "full_outer")
      .filter(!(col("o") <=> col("n")))
  }

  /** Value-plane snapshot diff: `(i0..iN, old_value, new_value)` for
    * every cell whose value differs between two versions — decoding
    * ONLY chunks whose refs differ ([[changedChunkRefs]] prunes first,
    * so cost scales with the CHANGE, not the array). A chunk present on
    * one side only reads as fill (0) on the other, matching zarr's
    * missing-chunk semantics. Both versions must share the chunk grid
    * (diff across a reindex/reshape is a different operation).
    */
  def valueDiff(oldSession: Session, newSession: Session, path: String,
                dtype: String, compression: String = "raw"): DataFrame = {
    val nodeN = newSession.node(path).filter(_.isArray).getOrElse(
      throw new GraftException(s"no array at $path (new version)"))
    val nodeO = oldSession.node(path).filter(_.isArray).getOrElse(
      throw new GraftException(s"no array at $path (old version)"))
    if (nodeN.isRectilinear || nodeO.isRectilinear)
      throw new GraftException("valueDiff requires a regular chunk grid")
    if (nodeN.chunkShape != nodeO.chunkShape)
      throw new GraftException(
        s"valueDiff requires both versions to share the chunk grid " +
          s"(${nodeO.chunkShape.mkString("x")} vs " +
          s"${nodeN.chunkShape.mkString("x")})")
    val ndim = nodeN.shape.size
    val cells = nodeN.chunkShape.product.toInt
    val isInt = ChunkCodec.IntDtypes.contains(dtype)
    val fill =
      if (isInt) array_repeat(lit(0L), cells)
      else array_repeat(lit(0.0), cells)
    val fetch = sessionFetch(newSession)
    def bytesOf(tag: String) = fetch(col(s"$tag.kind"), col(s"$tag.inline"),
      col(s"$tag.chunk_id"), col(s"$tag.location"), col(s"$tag.offset"),
      col(s"$tag.length"))
    val spark = newSession.refs(path).sparkSession
    val decoded = changedChunkRefs(oldSession, newSession, path)
      .repartition(spark.sparkContext.defaultParallelism * 2, col("coord"))
      .select(col("coord"),
        coalesce(CodecFunctions.decode_chunk(bytesOf("o"), dtype,
          compression), fill).as("oa"),
        coalesce(CodecFunctions.decode_chunk(bytesOf("n"), dtype,
          compression), fill).as("na"))
    val exploded = decoded.select(col("coord"),
      posexplode(arrays_zip(col("oa"), col("na"))))
    val withIdx = regularIndex(exploded, nodeN, ndim)
    val bounded = (0 until ndim).foldLeft(withIdx) { case (df, i) =>
      df.filter(col(s"i$i") <
        math.max(nodeO.shape(i), nodeN.shape(i)))
    }
    bounded
      .filter(!(col("col.oa") <=> col("col.na")))
      .select((0 until ndim).map(i => col(s"i$i")) ++ Seq(
        col("col.oa").as("old_value"), col("col.na").as("new_value")): _*)
  }

  /** Global (i0..iN) indices for a regular grid from (coord, pos) —
    * constant chunk extents and strides.
    */
  private def regularIndex(exploded: DataFrame, node: graft.meta.NodeSpec,
                           ndim: Int): DataFrame = {
    val chunkShape = node.chunkShape
    val strides = chunkShape.indices.map(i => chunkShape.drop(i + 1).product)
    (0 until ndim).foldLeft(exploded) { case (df, i) =>
      df.withColumn(s"i$i",
        element_at(col("coord"), i + 1).cast("long") * chunkShape(i) +
          pmod(expr(s"pos div ${strides(i)}"), lit(chunkShape(i))))
    }
  }

  private def chunkBoundsOf(node: graft.meta.NodeSpec,
                            bounds: Seq[(Long, Long)]): Seq[(Int, Int)] = {
    require(!node.isRectilinear,
      "region reads require a regular chunk grid")
    require(bounds.size == node.shape.size, "bounds rank mismatch")
    bounds.zip(node.chunkShape).map { case ((lo, hi), c) =>
      require(lo >= 0 && hi > lo, s"bad bounds [$lo, $hi)")
      ((lo / c).toInt, ((hi - 1) / c).toInt)
    }
  }

  /** Row-returning region read: element bounds `[lo, hi)` per dimension.
    * The 100 TB slice plan, end to end:
    *  - manifest splits are pruned on ALL dims against their extents
    *    before any Parquet is opened ([[Session.refsBounded]]);
    *  - surviving chunks decode ONLY the sub-block inside the region
    *    ([[DecodeChunkSliceExpr]]) — a 1-element slice of a 16 M-element
    *    chunk emits one row, not 16 M filtered rows.
    */
  def valuesRegion(session: Session, path: String, dtype: String,
                   bounds: Seq[(Long, Long)],
                   compression: String = "raw"): DataFrame = {
    val node = session.node(path).filter(_.isArray).getOrElse(
      throw new GraftException(s"no array at $path"))
    val ndim = node.shape.size
    val refs = session.refsBounded(path, chunkBoundsOf(node, bounds))
    val fetch = sessionFetch(session)
    val spark = refs.sparkSession
    val exploded = refs
      .repartition(spark.sparkContext.defaultParallelism * 2, col("coord"))
      .withColumn("bytes", fetch(col("kind"), col("inline"), col("chunk_id"),
        col("location"), col("offset"), col("length")))
      .select(col("coord"), explode(CodecFunctions.decode_chunk_slice(
        col("bytes"), col("coord"), dtype, compression, node.chunkShape,
        bounds.map(_._1), bounds.map(_._2))).as("e"))
      .select(col("coord"), col("e.pos").as("pos"), col("e.value").as("col"))
    val withIdx = regularIndex(exploded, node, ndim)
    // slice decode already bounded; re-filter against the array shape so
    // partial edge chunks stay clipped (pruning never decides correctness)
    val bounded = (0 until ndim).foldLeft(withIdx) { case (df, i) =>
      df.filter(col(s"i$i") < node.shape(i))
    }
    bounded.select((0 until ndim).map(i => col(s"i$i")) :+
      col("col").as("value"): _*)
  }

  /** Region statistics with aggregation pushdown into the chunk kernel:
    * extents prune splits, [[ChunkSliceStatsExpr]] prunes within chunks,
    * and NO row machinery runs — the plan for `sum(value) over a slice`.
    * Exact on any bounds (unlike [[arrayStats]], padding cells of edge
    * chunks are excluded by the sub-block geometry as long as bounds are
    * clipped to the array shape).
    */
  def sliceStats(session: Session, path: String, dtype: String,
                 bounds: Seq[(Long, Long)],
                 compression: String = "raw"): DataFrame = {
    val node = session.node(path).filter(_.isArray).getOrElse(
      throw new GraftException(s"no array at $path"))
    val clipped = bounds.zip(node.shape).map { case ((lo, hi), s) =>
      (lo, math.min(hi, s))
    }
    val refs = session.refsBounded(path, chunkBoundsOf(node, clipped))
    val fetch = sessionFetch(session)
    val spark = refs.sparkSession
    refs
      .repartition(spark.sparkContext.defaultParallelism * 2, col("coord"))
      .withColumn("bytes", fetch(col("kind"), col("inline"), col("chunk_id"),
        col("location"), col("offset"), col("length")))
      .select(CodecFunctions.chunk_slice_stats(col("bytes"), col("coord"),
        dtype, compression, node.chunkShape,
        clipped.map(_._1), clipped.map(_._2)).as("s"))
      .agg(sum(col("s.n")).as("n"), sum(col("s.sum")).as("sum"),
        min(col("s.min")).as("min"), max(col("s.max")).as("max"))
      .withColumn("avg", col("sum") / col("n"))
  }

  /** Whole-array statistics WITHOUT the row explode: per-chunk native
    * reduction (count/sum/min/max inside [[ChunkStatsExpr]]) + a rollup
    * over chunk rows. Decode-bound, not row-machinery-bound — the scale
    * path for `avg(value)`-style tensor aggregates. NOTE: includes
    * partial-edge-chunk padding cells for arrays whose shape is not
    * chunk-aligned (exact on aligned arrays).
    */
  def arrayStats(session: Session, path: String, dtype: String,
                 compression: String = "raw"): DataFrame = {
    val fetch = sessionFetch(session)
    val spark = session.repo.spark
    session.refs(path)
      .repartition(spark.sparkContext.defaultParallelism * 2, col("coord"))
      .withColumn("bytes", fetch(col("kind"), col("inline"), col("chunk_id"),
        col("location"), col("offset"), col("length")))
      .select(CodecFunctions.chunk_stats(col("bytes"), dtype, compression)
        .as("s"))
      .agg(sum(col("s.n")).as("n"), sum(col("s.sum")).as("sum"),
        min(col("s.min")).as("min"), max(col("s.max")).as("max"))
      .withColumn("avg", col("sum") / col("n"))
  }

  /** Append a (i0..iN, value) DataFrame along one dimension
    * (`append_dim`, xarray.py:253-276): grows the array shape by the
    * incoming extent along `dim`, shifts the incoming indices to start at
    * the old boundary, and writes. The incoming extent must be
    * chunk-aligned on `dim` unless it is the final ragged tail — the
    * aligned-write check of xarray.py:277-298.
    */
  def appendValues(session: Session, path: String, values: DataFrame,
                   dim: Int, dtype: String,
                   compression: String = "raw"): Unit = {
    val node = session.node(path).filter(_.isArray).getOrElse(
      throw new GraftException(s"no array at $path"))
    if (node.isRectilinear) throw new GraftException(
      "append_dim requires a regular chunk grid")
    val oldLen = node.shape(dim)
    if (oldLen % node.chunkShape(dim) != 0) throw new GraftException(
      s"cannot append along dim $dim: existing length $oldLen is not " +
        s"chunk-aligned (${node.chunkShape(dim)}) — the tail chunk is ragged")
    val extent = values.agg(max(col(s"i$dim"))).head().getLong(0) + 1
    val newShape = node.shape.updated(dim, oldLen + extent)
    session.updateArray(path, newShape, node.chunkShape)
    val shifted = values.withColumn(s"i$dim", col(s"i$dim") + oldLen)
    writeValues(session, path, shifted, dtype, compression)
  }

  /** Write a (i0..iN, value) DataFrame into a rectangular region starting
    * at `offsets` (region writes, xarray.py:215-216). The region must be
    * chunk-aligned: offsets on chunk boundaries, so no read-modify-write
    * of neighboring data is needed (the "safe chunk" check of
    * xarray.py:277-298 — unaligned regions are rejected, not silently
    * merged).
    */
  def writeRegion(session: Session, path: String, values: DataFrame,
                  offsets: Seq[Long], dtype: String,
                  compression: String = "raw"): Unit = {
    val node = session.node(path).filter(_.isArray).getOrElse(
      throw new GraftException(s"no array at $path"))
    if (node.isRectilinear) throw new GraftException(
      "region writes require a regular chunk grid")
    offsets.zip(node.chunkShape).zipWithIndex.foreach {
      case ((off, chunk), i) =>
        if (off % chunk != 0) throw new GraftException(
          s"region offset $off on dim $i is not chunk-aligned ($chunk)")
    }
    val shifted = offsets.zipWithIndex.foldLeft(values) {
      case (df, (off, i)) => df.withColumn(s"i$i", col(s"i$i") + off)
    }
    writeValues(session, path, shifted, dtype, compression)
  }

  /** Write a (i0..iN, value) DataFrame into an array as chunk objects —
    * the distributed value-plane sink. Scale-shaped plan:
    *
    *  1. rows are bucketed to chunks by coordinate arithmetic;
    *  2. `repartition(coord)` + `sortWithinPartitions(coord, pos)` brings
    *     each chunk's cells together '''in cell order''' — the shuffle
    *     moves (coord, pos, value) triples, never materialized chunk
    *     buffers (a 128 MB chunk would be 16 M structs through ONE
    *     aggregation buffer under a collect_list plan);
    *  3. `mapPartitions` streams the sorted run, holding exactly one
    *     chunk array at a time: fill → encode → compress → upload through
    *     the per-executor store client;
    *  4. the resulting refs are '''materialized once''' to a staging
    *     Parquet dataset under the store, then staged on the session —
    *     re-evaluating the changeset (flush, tx log, rebase retries)
    *     re-reads the staging files instead of re-running the upload job
    *     (no duplicate chunk objects, no write amplification).
    *
    * Staging files are deleted on commit/discard ([[Session]]) and swept
    * by GC if a session dies (ops/Maintenance).
    */
  def writeValues(session: Session, path: String, values: DataFrame,
                  dtype: String, compression: String = "raw"): Unit = {
    val node = session.node(path).filter(_.isArray).getOrElse(
      throw new GraftException(s"no array at $path"))
    if (node.isRectilinear) throw new GraftException(
      "value-plane writes require a regular chunk grid")
    val chunkShape = node.chunkShape
    val ndim = chunkShape.size
    val strides = chunkShape.indices.map(i => chunkShape.drop(i + 1).product)
    val cells = chunkShape.product.toInt
    val withChunk = values
      .withColumn("coord", array((0 until ndim).map(i =>
        expr(s"i$i div ${chunkShape(i)}").cast("int")): _*))
      .withColumn("pos", (0 until ndim).map(i =>
        pmod(col(s"i$i"), lit(chunkShape(i))) * strides(i))
        .reduce(_ + _))
    val isInt = ChunkCodec.IntDtypes.contains(dtype)
    val spark = values.sparkSession
    import spark.implicits._
    val conf = session.repo.store.conf
    val parts = spark.sparkContext.defaultParallelism * 2
    val sorted = withChunk
      .select(col("coord"), col("pos"),
        col("value").cast(if (isInt) "long" else "double").as("value"))
      .repartition(parts, col("coord"))
      .sortWithinPartitions("coord", "pos")
      // tuple encoders resolve by field name, not position
      .toDF("_1", "_2", "_3")
    val refsDf =
      (if (isInt)
        sorted.as[(Seq[Int], Long, Long)].mapPartitions { it =>
          streamEncode[Long](it, cells, () => new Array[Long](cells),
            (arr, p, v) => arr(p) = v,
            arr => ChunkCodec.compress(
              ChunkCodec.encodeLongs(arr, dtype), compression), conf)
        }
      else
        sorted.as[(Seq[Int], Long, Double)].mapPartitions { it =>
          streamEncode[Double](it, cells, () => new Array[Double](cells),
            (arr, p, v) => arr(p) = v,
            arr => ChunkCodec.compress(
              ChunkCodec.encodeDoubles(arr, dtype), compression), conf)
        }).toDF("coord", "chunk_id", "length")
    // run the upload job exactly once; changeset actions replay from the
    // staging Parquet, not from the side-effecting job
    val stagingKey = graft.meta.Layout.stagingPrefix(
      graft.core.Ids.toBase32(graft.core.Ids.newObjectId()))
    refsDf.write.parquet(session.repo.store.uri(stagingKey))
    val refs = spark.read.parquet(session.repo.store.uri(stagingKey))
      .withColumn("kind", lit(ChunkRef.KindRef))
      .withColumn("offset", lit(0L))
    session.trackStaging(stagingKey)
    session.stageChunkRefs(path, refs)
  }

  /** Stream one sorted (coord, pos, value) run: assemble, encode, and
    * upload chunk-at-a-time; emits (coord, chunk_id, encodedLength).
    */
  private[graft] def streamEncode[V](it: Iterator[(Seq[Int], Long, V)], cells: Int,
                              alloc: () => Array[V],
                              set: (Array[V], Int, V) => Unit,
                              encode: Array[V] => Array[Byte],
                              conf: graft.storage.StoreConf)
      : Iterator[(Seq[Int], String, Long)] = {
    val store = graft.storage.StoreConf.cached(conf)
    val buf = it.buffered
    new Iterator[(Seq[Int], String, Long)] {
      override def hasNext: Boolean = buf.hasNext
      override def next(): (Seq[Int], String, Long) = {
        val coord = buf.head._1
        val arr = alloc()
        while (buf.hasNext && buf.head._1 == coord) {
          val (_, pos, v) = buf.next()
          set(arr, pos.toInt, v)
        }
        val bytes = encode(arr)
        val id = graft.core.Ids.toBase32(graft.core.Ids.newObjectId())
        store.putBytes(graft.meta.Layout.chunkKey(id), bytes)
        (coord, id, bytes.length.toLong)
      }
    }
  }
}
