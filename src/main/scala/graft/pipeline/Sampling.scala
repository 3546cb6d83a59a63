package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training-data
  * pipelines. Everything here is a pure map over the id column — no
  * shuffle, no RNG state, no driver coordination — so a 100 TB corpus
  * splits in one scan and the assignment is stable across reruns,
  * engines, and partitionings (the property that matters when the
  * train/val/test membership of every document must never drift between
  * pipeline runs).
  */
object Sampling {

  /** Deterministic bucket in `[0, buckets)` for an id.
    *
    * `method`:
    *  - `"xxhash64"` (default) — codegen'd, fastest; Spark-specific.
    *  - `"md5"` — first 4 hex chars of md5 of the decimal string form;
    *    slower but reproducible across engines (DuckDB, Trino, Python's
    *    hashlib all agree), which is what you want when another system
    *    must recompute membership.
    */
  def hashBucket(id: Column, buckets: Int,
                 method: String = "xxhash64"): Column = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in [1, 65536], got $buckets")
    method match {
      case "xxhash64" =>
        pmod(xxhash64(id.cast("string")), lit(buckets)).cast("int")
      case "md5" =>
        pmod(conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
          .cast("int"), lit(buckets)).cast("int")
      case other =>
        throw new IllegalArgumentException(
          s"unknown hash method '$other' (xxhash64 | md5)")
    }
  }

  /** Assign each row to a named split by deterministic hash of `idCol`.
    * `splits` are (name, weight) with weights summing to 1; thresholds are
    * cumulative over `buckets` hash buckets, so realized fractions are
    * exact to 1/buckets. Adds a `split` string column.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)],
                  buckets: Int = 10000,
                  method: String = "xxhash64"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0))
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val b = hashBucket(col(idCol), buckets, method)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val assign = splits.zip(cum).init.foldRight(
      lit(splits.last._1): Column) { case (((name, _), c), acc) =>
      when(b < math.round(c * buckets).toInt, lit(name)).otherwise(acc)
    }
    df.withColumn("split", assign)
  }

  /** Deterministic per-stratum subsample: keep a `fraction(stratum)` share
    * of rows, chosen by hash of (stratum, id) so membership is stable and
    * independent across strata. Strata missing from `fractions` fall back
    * to `defaultFraction`. One scan, no shuffle — the distributed analog
    * of `df.stat.sampleBy` minus the RNG nondeterminism.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       buckets: Int = 10000,
                       method: String = "xxhash64"): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction))
      .forall(f => f >= 0 && f <= 1))
    val b = hashBucket(
      concat(col(strataCol).cast("string"), lit("|"),
        col(idCol).cast("string")), buckets, method)
    val thresh = fractions.foldLeft(
      lit(math.round(defaultFraction * buckets).toInt): Column) {
      case (acc, (k, f)) =>
        when(col(strataCol) === k,
          lit(math.round(f * buckets).toInt)).otherwise(acc)
    }
    df.filter(b < thresh)
  }
}
