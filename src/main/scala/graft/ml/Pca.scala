package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Second-moment accumulator for [[Pca]]: row count, per-dimension sum, and
  * the upper triangle of Σ xxᵀ packed row-major — product-encodable primitive
  * arrays, so the Tungsten aggregation buffer stays unboxed. For dim=64 the
  * buffer is 1 + 64 + 2080 doubles ≈ 17 KB per task. */
final case class MomentsBuf(n: Long, sum: Array[Double], gram: Array[Double])

/** Distributed PCA over an `array<float>` embedding column — the whitening /
  * dimensionality-reduction step an embedding pipeline runs before ANN
  * indexing or dedup (e.g. to decorrelate features ahead of product
  * quantization, SURVEY.md §7.4).
  *
  * Shape at 100 TB: one partial+final typed aggregation reduces the corpus
  * to a single O(dim²) moment buffer (map-side combine means each task emits
  * one ~17 KB row; the shuffle carries #tasks such rows, independent of
  * corpus size). The eigen-solve runs on the driver over the 64×64
  * covariance — the model IS the reduction result, same contract as
  * [[KMeans]] — and projection is a broadcast-literal dot product, a single
  * narrow map pass.
  *
  * Determinism: the covariance inherits float-sum partition-order variance
  * like any distributed mean; the power iteration itself is a fixed
  * iteration count from a fixed start vector, and components are
  * sign-canonicalized (largest-|coordinate| positive), so on a given
  * covariance the output is reproducible bit-for-bit.
  */
object Pca {

  final case class Model(mean: Array[Double], components: Seq[Array[Double]],
      eigenvalues: Seq[Double])

  private class MomentsAgg(dim: Int)
      extends Aggregator[Seq[Float], MomentsBuf, MomentsBuf] {
    private val triLen = dim * (dim + 1) / 2

    override def zero: MomentsBuf =
      MomentsBuf(0L, new Array[Double](dim), new Array[Double](triLen))

    override def reduce(b: MomentsBuf, x: Seq[Float]): MomentsBuf = {
      // explicit null check: without it a null embedding row surfaces as an
      // opaque NPE deep in an executor stack instead of a usable message
      require(x != null, "null embedding row reached Pca — filter nulls first")
      require(x.length == dim, s"expected dim=$dim, got ${x.length}")
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) { v(i) = x(i).toDouble; i += 1 }
      var k = 0
      i = 0
      while (i < dim) {
        b.sum(i) += v(i)
        var j = i
        while (j < dim) { b.gram(k) += v(i) * v(j); k += 1; j += 1 }
        i += 1
      }
      MomentsBuf(b.n + 1, b.sum, b.gram)
    }

    override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf = {
      var i = 0
      while (i < dim) { a.sum(i) += b.sum(i); i += 1 }
      i = 0
      while (i < triLen) { a.gram(i) += b.gram(i); i += 1 }
      MomentsBuf(a.n + b.n, a.sum, a.gram)
    }

    override def finish(b: MomentsBuf): MomentsBuf = b
    override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
    override def outputEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
  }

  /** One distributed pass: corpus → (n, Σx, upper-tri Σxxᵀ). */
  def moments(vecs: DataFrame, vecCol: String, dim: Int): MomentsBuf = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.select(col(vecCol).cast("array<float>"))
      .as[Seq[Float]]
      .select(new MomentsAgg(dim).toColumn)
      .head()
  }

  /** Fit the top-k principal components by power iteration with deflation
    * on the driver-side covariance (dim is small by construction; the
    * distributed work is all in [[moments]]). */
  def fit(vecs: DataFrame, vecCol: String, dim: Int, k: Int,
      iters: Int = 200): Model = {
    val m = moments(vecs, vecCol, dim)
    require(m.n > 0, "PCA on an empty corpus")
    val n = m.n.toDouble
    val mean = m.sum.map(_ / n)
    // unpack upper triangle -> full covariance
    val cov = Array.ofDim[Double](dim, dim)
    var idx = 0
    for (i <- 0 until dim; j <- i until dim) {
      val c = m.gram(idx) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c; idx += 1
    }
    // zero-variance corpus (all vectors identical): power iteration would
    // normalize a zero vector into NaN components — fail fast with the cause
    var frob = 0.0
    for (i <- 0 until dim; j <- 0 until dim) frob += cov(i)(j) * cov(i)(j)
    require(math.sqrt(frob) > 1e-12,
      "PCA on a zero-variance corpus (covariance ~0): no principal directions")
    val comps = Seq.newBuilder[Array[Double]]
    val eigs = Seq.newBuilder[Double]
    for (_ <- 0 until k) {
      // fixed, never-orthogonal-by-construction start (strictly positive,
      // mildly sloped so symmetric eigenvectors can't cancel it exactly)
      var v = Array.tabulate(dim)(i => 1.0 + i * 1e-3)
      normalize(v)
      for (_ <- 0 until iters) { v = matVec(cov, v); normalize(v) }
      val lambda = dot(v, matVec(cov, v))
      // sign canon: largest-|coordinate| positive
      val pivot = v.indices.maxBy(i => math.abs(v(i)))
      if (v(pivot) < 0) { var i = 0; while (i < dim) { v(i) = -v(i); i += 1 } }
      comps += v; eigs += lambda
      // deflate: C -= lambda v v^T
      for (i <- 0 until dim; j <- 0 until dim) cov(i)(j) -= lambda * v(i) * v(j)
    }
    Model(mean, comps.result(), eigs.result())
  }

  /** Projection onto component `c` of a centered vector, as a Column over
    * the raw (uncentered) embedding: dot(x, v) − dot(mean, v) — the mean
    * correction folds to one literal, so the per-row work is a single
    * left-to-right double dot product (bit-matching VectorOps.dot). */
  def projection(model: Model, c: Int, vecCol: Column): Column = {
    val v = model.components(c)
    val meanDot = dot(model.mean, v)
    graft.functions.VectorOps.dot(vecCol, array(v.map(lit(_)): _*)) - lit(meanDot)
  }

  private def normalize(v: Array[Double]): Unit = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val inv = 1.0 / math.sqrt(s)
    i = 0
    while (i < v.length) { v(i) *= inv; i += 1 }
  }

  private def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val out = new Array[Double](v.length)
    var i = 0
    while (i < v.length) {
      var s = 0.0; var j = 0
      while (j < v.length) { s += m(i)(j) * v(j); j += 1 }
      out(i) = s; i += 1
    }
    out
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
}
