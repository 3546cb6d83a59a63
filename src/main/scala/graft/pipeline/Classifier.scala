package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable quality classifier — the fastText/DCLM-style filtering step
  * of a training-data pipeline (score every document with a learned
  * model, keep the top slice). Logistic regression over hashed
  * bag-of-token features, built so both halves have a 100 TB shape:
  *
  *  - '''Features''' are md5-hashed token buckets (`h(t) = first 4 hex
  *    chars of md5 mod dim`, the same engine-portable recipe as
  *    [[Sampling.hashBucket]]): no vocabulary pass, no fit/transform
  *    state to ship — any engine (DuckDB, Trino, Python) recomputes the
  *    exact feature index, which is what makes scoring ORACLE-checkable
  *    and models portable across systems.
  *  - '''Training''' is full-batch gradient descent: the feature matrix
  *    never materializes — each iteration broadcasts the dense weight
  *    vector (≤ 64 Ki doubles = 512 KiB) and tree-aggregates one dense
  *    gradient per partition (`treeAggregate`, depth 2), so the shuffle
  *    per iteration is `partitions × dim` doubles, independent of corpus
  *    size. Deterministic: no sampling, no RNG, stable float order
  *    within each partition fold and a fixed partition count would even
  *    make it bit-stable; in practice two runs on the same input agree
  *    to ~1e-12 and the SPEC pins prediction equality.
  *  - '''Scoring''' is pure relational algebra (explode → broadcast-join
  *    the dim-row weight table → one hash aggregation): whole-stage
  *    codegen end to end, no UDF, one shuffle on the document key.
  *
  * Model: p(doc) = sigmoid(bias + Σ_t w[h(t)]) — raw term-frequency
  * features (one summand per token occurrence), the plain bag-of-words
  * logistic model. Raw counts keep the per-feature margin at ≥ 1, which
  * is what lets full-batch GD converge in tens of iterations; an
  * L1-normalized variant (x = tf/n) shrinks every margin by the document
  * length and needs thousands of iterations to escape the base-rate
  * plateau (measured on the fixture corpus).
  */
object Classifier {

  /** Whitespace tokens of `text`, lowercased — the corpus-wide token
    * convention ([[TextAnalysis]], q_word_freq oracle). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Engine-portable hashed feature index: first 4 hex chars of
    * `md5(token)` as an int, mod `dim`. DuckDB spelling:
    * `('0x' || substr(md5(t), 1, 4))::INT % dim`. */
  def featureIndex(token: Column, dim: Int): Column = {
    require(dim > 0 && dim <= 65536, s"dim must be in [1, 65536], got $dim")
    pmod(conv(substring(md5(token), 1, 4), 16, 10).cast("int"), lit(dim))
  }

  /** Task-side twin of [[featureIndex]] — byte-identical by
    * construction (first 2 md5 bytes big-endian, mod dim). */
  private[graft] def featureIndexLocal(token: String, dim: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % dim
  }

  private def sigmoidLocal(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** The trained model: `weights.length == dim`, plus an intercept. */
  final case class LogRegModel(weights: Array[Double], bias: Double) {
    def dim: Int = weights.length
    def predictLocal(toks: Seq[String]): Double = {
      var z = bias
      toks.foreach(t => z += weights(featureIndexLocal(t, dim)))
      sigmoidLocal(z)
    }
  }

  /** Full-batch logistic regression on `(textCol, labelCol)` —
    * `labelCol` must be 0/1. Returns the dense model.
    *
    * Scale shape: the tokenized corpus is hashed ONCE into per-document
    * index arrays and cached; each of `iters` iterations is one
    * `treeAggregate` pass (per-partition dense gradient, depth-2
    * combine) against the broadcast weight vector — no per-iteration
    * shuffle of the data, no driver-side loop over rows. L2-regularized
    * (`l2`), learning rate `lr`, both plain full-batch GD so the result
    * is a deterministic function of the input.
    */
  def train(docs: DataFrame, textCol: String, labelCol: String, dim: Int,
            iters: Int = 50, lr: Double = 1.0,
            l2: Double = 1e-6): LogRegModel = {
    require(iters > 0 && lr > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val prepared = docs
      .select(col(labelCol).cast("double"), tokens(col(textCol)))
      .as[(Double, Seq[String])]
      .rdd.map { case (y, toks) =>
        (y, toks.map(featureIndexLocal(_, dim)).toArray)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = prepared.count().toDouble
    require(n > 0, "train: empty input")
    val w = new Array[Double](dim)
    var b = 0.0
    val sc = spark.sparkContext
    for (_ <- 0 until iters) {
      val bw = sc.broadcast(w)
      val bb = b
      // (dense grad over dim, bias grad)
      val (gw, gb) = prepared.treeAggregate(
        (new Array[Double](dim), 0.0))(
        seqOp = { case ((g, g0), (y, idx)) =>
          var z = bb
          idx.foreach(i => z += bw.value(i))
          val err = sigmoidLocal(z) - y
          idx.foreach(i => g(i) += err)
          (g, g0 + err)
        },
        combOp = { case ((g1, a1), (g2, a2)) =>
          var i = 0
          while (i < dim) { g1(i) += g2(i); i += 1 }
          (g1, a1 + a2)
        }, depth = 2)
      bw.destroy()
      var i = 0
      while (i < dim) { w(i) -= lr * (gw(i) / n + l2 * w(i)); i += 1 }
      b -= lr * gb / n
    }
    prepared.unpersist(blocking = false)
    LogRegModel(w, b)
  }

  /** Score `docs` with a model: adds `score` = p(label=1). Relational
    * plan only — explode tokens, broadcast-join the `dim`-row weight
    * table, one aggregation keyed on `idCol` — so it survives any corpus
    * size, and an external engine can recompute every score from the
    * weight table (see q_classifier_score).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: LogRegModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wTab = broadcast(
      model.weights.toSeq.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("fidx", "w"))
    // explode_OUTER + left broadcast join: a zero-token document keeps
    // one null-token row (null fidx matches no weight, sum(w) -> null,
    // coalesced to 0) so it scores sigmoid(bias) like predictLocal —
    // same single-shuffle broadcast plan as the inner-join version,
    // which silently DROPPED empty docs.
    val tok = docs
      .select(col(idCol), explode_outer(tokens(col(textCol))).as("token"))
      .withColumn("fidx", featureIndex(col("token"), model.dim))
    tok.join(wTab, Seq("fidx"), "left")
      .groupBy(col(idCol))
      .agg((lit(model.bias) + coalesce(sum(col("w")), lit(0.0))).as("_z"))
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + exp(-col("_z")))).as("score"))
  }
}
