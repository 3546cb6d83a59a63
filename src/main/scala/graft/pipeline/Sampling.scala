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

  /** Deterministic uniform k-sample: the k rows whose md5(id) sorts
    * lowest — a fixed, engine-recomputable pseudo-random sample (the
    * md5 order is uniform and independent of row order/partitioning).
    * Reruns, other engines, and incremental pipelines all select the
    * SAME rows, which is what makes sampled audits reproducible. The
    * plan is a TakeOrdered (per-partition top-k then merge), never a
    * global sort.
    */
  def deterministicSample(df: DataFrame, idCol: String,
                          k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.withColumn("_rank", md5(col(idCol).cast("string")))
      .orderBy(col("_rank"), col(idCol))
      .limit(k)
      .drop("_rank")
  }

  /** Per-group deterministic k-sample: [[deterministicSample]] stratified
    * by a group column — the k rows of EVERY group whose md5(id) sorts
    * lowest (per-source audit samples, per-language spot checks). One
    * group-keyed window (rank within group over the md5 order), the same
    * shuffle family as any per-group top-k; group skew is governed by
    * the group key exactly like a groupBy. Identical rows on any
    * engine/rerun — the oracle recomputes every rank.
    */
  def deterministicSamplePerGroup(df: DataFrame, groupCol: String,
                                  idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Temperature-weighted source mixing — the multinomial sampling used
    * to build multi-source / multilingual training mixtures: source `s`
    * with `n_s` rows is drawn with probability `n_s^alpha / Σ n^alpha`
    * (alpha < 1 flattens the mix toward small sources; alpha = 1 is
    * proportional; alpha = 0 uniform-by-source), scaled to `targetRows`
    * total. The realized per-source rate can exceed 1, in which case rows
    * REPEAT: each kept row carries an `epoch` column (0-based copy
    * index), `floor(rate)` guaranteed copies plus one more for rows whose
    * deterministic hash falls under the fractional remainder.
    *
    * Scale shape: one small per-source count aggregation (#sources rows
    * through the driver — bounded metadata, not a data-plane collect),
    * then a single scan with a hash filter + bounded explode. No
    * shuffle, no RNG state; membership and copy counts are stable across
    * reruns and engines (`method = "md5"`, like [[hashBucket]]).
    */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
                     alpha: Double, targetRows: Long,
                     buckets: Int = 10000,
                     method: String = "xxhash64"): DataFrame = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    require(targetRows > 0, s"targetRows must be > 0, got $targetRows")
    val counts = df.groupBy(sourceCol).count().collect()
      .map(r => (r.get(0), r.getLong(1)))
    require(counts.nonEmpty, "temperatureMix on an empty relation")
    if (counts.exists(_._1 == null))
      throw new IllegalArgumentException(
        s"temperatureMix: null values in '$sourceCol' — rows without a " +
          "source have no defined mixture weight; filter or impute first")
    // deterministic derivation order (sorted by source) so another
    // engine can reproduce the same double arithmetic
    val sorted = counts.sortBy(_._1.toString)
    val wsum = sorted.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val b = hashBucket(
      concat(col(sourceCol).cast("string"), lit("|"),
        col(idCol).cast("string")), buckets, method)
    val copies = sorted.foldLeft(lit(0): Column) {
      case (acc, (srcVal, n)) =>
        val rate = math.pow(n.toDouble, alpha) / wsum * targetRows / n
        val base = math.floor(rate).toInt
        // integral threshold (bucket count): a rate of 1 ± ulp rounds to
        // exactly `base + 0/10000ths` instead of leaking one stray copy
        // per 10^4 rows — and an integer < integer compare is what lets
        // another engine reproduce membership bit-for-bit
        val thresh = math.round((rate - math.floor(rate)) * buckets).toInt
        when(col(sourceCol) === srcVal,
          lit(base) + when(b < lit(thresh), 1).otherwise(0))
          .otherwise(acc)
    }
    df.withColumn("_copies", copies)
      .filter(col("_copies") > 0)
      // _copies >= 1 here, so the sequence is always ascending (Spark's
      // sequence() would count DOWN for an empty 0..-1 range)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("_copies").cast("long") - 1)))
      .drop("_copies")
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
