package graft.pipeline

/** Seeded Lloyd's k-means over a driver-side sample — the coarse-quantizer
  * fit for [[Similarity.ivfIndex]]. At 100 TB the corpus never fits a
  * k-means pass, but a bounded representative sample does; centroid
  * quality converges with sample size long before it converges with
  * corpus size (the standard IVF recipe). Deterministic for a given
  * (points, k, seed); the O(n·k·dim) assignment step fans out over a
  * parallel IntStream, the O(n·dim) mean update stays sequential.
  */
object KMeansLocal {

  def fit(points: Array[Array[Double]], k: Int, maxIter: Int,
          seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means fit: no points")
    require(k > 0, "k-means fit: k must be positive")
    val dim = points(0).length
    val rng = new scala.util.Random(seed)
    val centers = rng.shuffle(points.indices.toVector).take(k)
      .map(points(_).clone).toArray
    val assign = new Array[Int](points.length)
    var iter = 0
    while (iter < maxIter) {
      java.util.stream.IntStream.range(0, points.length).parallel()
        .forEach { pi =>
          val p = points(pi)
          var best = 0
          var bestD = Double.MaxValue
          var ci = 0
          while (ci < centers.length) {
            val c = centers(ci)
            var d = 0.0
            var j = 0
            while (j < dim) { val t = p(j) - c(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = ci }
            ci += 1
          }
          assign(pi) = best
        }
      val sums = Array.fill(centers.length)(new Array[Double](dim))
      val counts = new Array[Long](centers.length)
      var pi = 0
      while (pi < points.length) {
        val c = assign(pi)
        val p = points(pi)
        val s = sums(c)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        counts(c) += 1
        pi += 1
      }
      var ci = 0
      while (ci < centers.length) {
        if (counts(ci) > 0) {
          val s = sums(ci)
          var j = 0
          while (j < dim) { centers(ci)(j) = s(j) / counts(ci); j += 1 }
        } // empty cluster: keep the previous center
        ci += 1
      }
      iter += 1
    }
    centers
  }
}
