package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.meta.{ChunkRef, Layout}
import graft.repo.{GraftError, GraftException, Repository}
import graft.storage.StoreConf

/** Repository fsck: verify that one ref's reachable closure is actually
  * serviceable from storage — every ancestry snapshot readable, every
  * referenced manifest present, and every native chunk object present
  * and long enough for the byte range its refs claim. The report is a
  * DataFrame of problems (empty = healthy), so at 100 TB the output
  * scales with the DAMAGE, not the repo: metadata checks are a
  * driver-side walk of the (bounded) snapshot/manifest lists, and the
  * chunk check is one distributed pass of `stat` HEADs over the distinct
  * chunk-id relation — the same shape as [[Replicate.sync]]'s
  * incremental skip test, no payload reads.
  *
  * Virtual refs are validated for container COVERAGE (a location no
  * registered container matches can never be fetched); their remote
  * bytes are deliberately not HEAD'd by default — they live in foreign
  * stores with their own lifecycle (`checkVirtual = true` turns presence
  * checks on, at one HEAD per distinct location).
  */
object Integrity {

  /** One problem row. kinds: `missing_snapshot`, `missing_manifest`,
    * `missing_chunk`, `short_chunk`, `unmatched_virtual`,
    * `missing_virtual`.
    */
  def check(repo: Repository, ref: String,
            checkVirtual: Boolean = false): DataFrame = {
    val spark = repo.spark
    import spark.implicits._
    val info = repo.info()
    val tip = info.branches.get(ref).orElse(info.tags.get(ref)).getOrElse(
      throw new GraftException(s"no branch or tag named $ref",
        GraftError.RefNotFound))
    val closure = (info.snapshotInfo(tip).toSeq ++ info.ancestry(tip))
      .distinctBy(_.id)

    // driver-side probes (snapshot exists/parse, manifest-dir listing)
    // run CONCURRENTLY: fsck over a deep history against an object
    // store is otherwise one round trip per snapshot plus one per
    // manifest, sequentially (round-13 latency audit)
    val metaProblems = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    val manifestIds = scala.collection.mutable.LinkedHashSet[String]()
    // width 128: bulk whole-repo probe (see Replicate's rationale)
    graft.storage.Store.parallelIO(closure, maxThreads = 128) { si =>
      val snapKey = Layout.snapshotKey(si.id)
      if (!repo.store.exists(snapKey))
        (Some(("missing_snapshot", si.id, snapKey)), Nil)
      else
        try (None, repo.assets.readSnapshot(si.id)
          .manifests.values.flatten.map(_.manifestId).toSeq)
        catch {
          case e: Exception =>
            (Some(("corrupt_snapshot", si.id,
              Option(e.getMessage).getOrElse("").take(120))), Nil)
        }
    }.foreach { case (problem, mids) =>
      problem.foreach(metaProblems += _)
      manifestIds ++= mids
    }
    val presentManifests =
      graft.storage.Store.parallelIO(manifestIds.toSeq,
          maxThreads = 128)(mid =>
        mid -> repo.store.list(Layout.manifestPrefix(mid) + "/").nonEmpty)
      .flatMap { case (mid, ok) =>
        if (ok) Some(mid)
        else {
          metaProblems += (("missing_manifest", mid,
            Layout.manifestPrefix(mid)))
          None
        }
      }

    val metaDf = metaProblems.toSeq.toDF("kind", "id", "detail")
    if (presentManifests.isEmpty) return metaDf

    // ONE multi-path scan over every present manifest (no per-manifest
    // condition): fsck over a 10k-manifest repo must not spend its time
    // in Catalyst analyzing a 10k-leg union
    val refs = spark.read.schema(repo.assets.manifestSchema)
      .option("recursiveFileLookup", "true")
      .parquet(presentManifests.map(repo.assets.manifestUri): _*)
      .select("kind", "chunk_id", "location", "offset", "length")

    val conf: StoreConf = repo.store.conf
    val chunkProblems = refs.filter(F.col("kind") === ChunkRef.KindRef)
      .groupBy("chunk_id")
      .agg(F.max(F.col("offset") + F.col("length")).as("need"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val store = StoreConf.cached(conf)
        // stat probes WITHIN one task run concurrently (width 8,
        // bounded batches) — a serial per-chunk HEAD loop over a 50 ms
        // store is chunks × RTT of task wall (r14 Spark-plane soak)
        it.grouped(256).flatMap { g =>
          graft.storage.Store.parallelIO(g.toSeq, maxThreads = 8) {
            case (id, need) =>
              store.stat(Layout.chunkKey(id)) match {
                case None =>
                  Some(("missing_chunk", id, Layout.chunkKey(id)))
                case Some(st) if st.size < need =>
                  Some(("short_chunk", id, s"have ${st.size} need $need"))
                case _ => None
              }
          }.flatten
        }
      }.toDF("kind", "id", "detail")

    val resolver = repo.virtualResolver
    val virtProblems = {
      val locs = refs.filter(F.col("kind") === ChunkRef.KindVirtual)
        .groupBy("location")
        .agg(F.max(F.col("offset") + F.col("length")).as("need"))
        .as[(String, Long)]
      locs.mapPartitions { it =>
        it.flatMap { case (loc, need) =>
          // coverage = a container matches AND is authorized (credentials
          // or an explicit no-credential sentinel, #2194) — a registered
          // but unauthorized prefix can no more be fetched than an
          // unmatched one
          val problem =
            try resolver.coverageProblem(loc)
            catch { case e: Exception =>
              Some(Option(e.getMessage).getOrElse("bad location")) }
          if (problem.isDefined)
            Some(("unmatched_virtual", loc, problem.get.take(120)))
          else if (checkVirtual) {
            // presence probe: fetch the range's last byte (1-byte GET)
            try {
              resolver.ranged(loc, math.max(0L, need - 1), 1)
              None
            } catch {
              case e: Exception => Some(("missing_virtual", loc,
                Option(e.getMessage).getOrElse("").take(120)))
            }
          } else None
        }
      }.toDF("kind", "id", "detail")
    }

    metaDf.unionByName(chunkProblems).unionByName(virtProblems)
  }
}
