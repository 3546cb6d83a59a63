package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * dimensionality-reduction / whitening step in front of ANN and
  * clustering (project 64-dim vectors to the 8 directions that carry
  * the variance; distances get cheaper and less noisy).
  *
  * Scale shape: the fit is ONE `treeAggregate` pass accumulating the
  * d-vector of sums and the dense d×d Gram matrix per partition
  * (d² doubles ≈ 32 KB for d = 64 — partials are model-sized, never
  * row-count-sized; depth-2 combine, the [[Classifier.train]] family),
  * then a DRIVER-side cyclic Jacobi eigendecomposition of the d×d
  * covariance (microseconds at embedding dims). Projection is pure
  * column arithmetic: one codegen'd `zip_with`/`aggregate` dot per
  * output component against a literal component vector — no UDF, no
  * shuffle, streams off the scan.
  *
  * Eigenvector SIGN and near-degenerate ordering are solver-specific,
  * so there is no cross-engine oracle; the spec pins the invariants
  * instead (orthonormality, descending explained variance matching the
  * projected data's variance, exact reconstruction at k = d).
  */
object Pca {

  /** `components`: k rows of length d (orthonormal, descending
    * eigenvalue); `mean`: length-d column means; `explained`: the k
    * eigenvalues (population variance along each component).
    */
  final case class PcaModel(components: Array[Array[Double]],
                            mean: Array[Double],
                            explained: Array[Double]) {
    def dim: Int = mean.length
    def k: Int = components.length
  }

  /** Fit on `embs(vecCol: array<float|double>)`. `k` top components. */
  def fit(embs: DataFrame, k: Int, vecCol: String = "embedding"): PcaModel = {
    val spark = embs.sparkSession
    import spark.implicits._
    // null vectors are dropped up front (a left join can introduce
    // them); they would otherwise NPE mid-aggregation
    val rows = embs.filter(col(vecCol).isNotNull)
      .select(transform(col(vecCol), _.cast("double")))
      .as[Seq[Double]].rdd
    // shift by an arbitrary sample vector before accumulating: the
    // textbook G/n − m·mᵀ cancels catastrophically when the data mean
    // is large relative to its spread; shifting makes both terms
    // spread-sized (covariance is shift-invariant)
    // take(1), not first(): an empty input gets a named error, not
    // Spark's opaque empty-collection exception mid-fit
    val sample = rows.take(1)
    require(sample.nonEmpty,
      s"fit: '$vecCol' has no non-null vectors — nothing to fit")
    val shift = sample.head.toArray
    val d = shift.length
    require(k >= 1 && k <= d, s"fit: need 1 <= k <= d=$d, got $k")
    // one pass: per-partition (n, sums, upper-triangular Gram) partials,
    // combined on the driver IN PARTITION ORDER — a tree combine's
    // completion-order-dependent double addition would make refits
    // differ in the last ulps (each partial is d²/2 doubles ≈ 16 KB:
    // model-sized; at extreme partition counts coalesce first)
    val partials = rows.mapPartitionsWithIndex { case (pid, it) =>
      val s = new Array[Double](d)
      val g = new Array[Double](d * (d + 1) / 2)
      var c = 0L
      it.foreach { v =>
        require(v.length == d, s"ragged vector: ${v.length} != $d")
        var i = 0
        var t = 0
        while (i < d) {
          val vi = v(i) - shift(i)
          s(i) += vi
          var j = i
          while (j < d) { g(t) += vi * (v(j) - shift(j)); j += 1; t += 1 }
          i += 1
        }
        c += 1
      }
      Iterator.single((pid, c, s, g))
    }.collect().sortBy(_._1)
    val sums = new Array[Double](d)
    val gram = new Array[Double](d * (d + 1) / 2)
    var n = 0L
    partials.foreach { case (_, c, s, g) =>
      n += c
      var i = 0
      while (i < d) { sums(i) += s(i); i += 1 }
      i = 0
      while (i < gram.length) { gram(i) += g(i); i += 1 }
    }
    require(n > 1, s"fit: need > 1 rows, got $n")
    // sums/gram are SHIFTED moments; the true mean adds the shift back,
    // covariance is shift-invariant: C = G'/n − m'·m'ᵀ
    val meanS = sums.map(_ / n)
    val mean = meanS.indices.map(i => meanS(i) + shift(i)).toArray
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    for (i <- 0 until d; j <- i until d) {
      val c = gram(t) / n - meanS(i) * meanS(j)
      cov(i)(j) = c; cov(j)(i) = c
      t += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    // descending eigenvalue order; deterministic sign (largest-|coord|
    // entry positive) so refits reproduce exactly
    val order = values.indices.sortBy(i => (-values(i), i)).take(k)
    val comps = order.map { i =>
      val v = vectors.map(_(i))
      val m = v.indices.maxBy(j => (math.abs(v(j)), -j))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(comps, mean, order.map(values).toArray)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvector matrix with vectors in COLUMNS). O(d³) per sweep,
    * converges in a handful of sweeps at embedding dims.
    */
  private[pipeline] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    // RELATIVE convergence: an absolute cutoff would declare a
    // small-magnitude covariance (entries ~1e-8 and below) converged
    // before a single rotation ran, returning identity "eigenvectors"
    val fro = a.map(_.map(x => x * x).sum).sum
    val tol = math.max(java.lang.Double.MIN_NORMAL, fro * 1e-26)
    var off = offDiag(a)
    while (off > tol && sweep < 64) {
      for (p <- 0 until d - 1; q <- p + 1 until d if a(p)(q) != 0.0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val tSign = if (theta >= 0) 1.0 else -1.0
        val tt = tSign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(tt * tt + 1.0)
        val s = tt * c
        var i = 0
        while (i < d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
          i += 1
        }
        i = 0
        while (i < d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
          i += 1
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** [[project]] with per-component 1/√eigenvalue scaling — whitened
    * coordinates have identity covariance, the normalization that makes
    * Euclidean distance meaningful across components of very different
    * variance (standard prep before clustering / ANN). Components with
    * (near-)zero variance are left unscaled rather than divided by ~0.
    */
  def whiten(embs: DataFrame, model: PcaModel,
             vecCol: String = "embedding"): DataFrame = {
    val eps = 1e-12 * math.max(model.explained.headOption.getOrElse(1.0), 1.0)
    model.explained.zipWithIndex.foldLeft(project(embs, model, vecCol)) {
      case (df, (ev, i)) =>
        if (ev > eps)
          df.withColumn(s"pc_$i", col(s"pc_$i") / math.sqrt(ev))
        else df
    }
  }

  /** Project onto the model's components: adds `pc_0..pc_{k-1}` columns
    * (pure codegen'd folds against literal component vectors).
    */
  def project(embs: DataFrame, model: PcaModel,
              vecCol: String = "embedding"): DataFrame = {
    val reserved = "_c" +: model.components.indices.map(i => s"pc_$i")
    val clash = embs.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"project: input columns ${clash.mkString(", ")} collide with " +
        "the projection's output/staging names — rename them first")
    val centered = zip_with(
      transform(col(vecCol), _.cast("double")),
      typedLit(model.mean.toSeq), (x, m) => x - m)
    model.components.zipWithIndex.foldLeft(
      embs.withColumn("_c", centered)) { case (df, (comp, i)) =>
      df.withColumn(s"pc_$i", aggregate(
        zip_with(col("_c"), typedLit(comp.toSeq), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x))
    }.drop("_c")
  }
}
