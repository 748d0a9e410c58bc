package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins [[Pca]] against a corpus with a KNOWN anisotropy: points =
  * a·u + b·w + ε with var(a)=9, var(b)=1, u ⊥ w — so the top component must
  * recover u (up to sign), eigenvalues must land near (9, 1), and the
  * projection column must agree with a driver-side dot product. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dim = 8
  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
  }

  // deterministic orthonormal pair
  private val u = unit(Array.tabulate(dim)(i => if (i % 2 == 0) 1.0 else 0.5))
  private val w: Array[Double] = {
    val raw = Array.tabulate(dim)(i => if (i % 3 == 0) -0.4 else 1.0)
    val proj = raw.zip(u).map { case (r, ui) => r * ui }.sum
    unit(raw.zip(u).map { case (r, ui) => r - proj * ui })
  }

  private lazy val corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val rows = (0 until 400).map { id =>
      val a = 3.0 * rnd.nextGaussian()
      val b = 1.0 * rnd.nextGaussian()
      val v = Array.tabulate(dim)(i =>
        (a * u(i) + b * w(i) + 0.01 * rnd.nextGaussian()).toFloat)
      (id.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
  }

  private lazy val model = Pca.fit(corpus, "embedding", dim, k = 2)

  test("top component recovers the dominant direction") {
    val cos = model.components(0).zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.99, s"cos(pc1, u) = $cos")
  }

  test("eigenvalues match the planted variances and are ordered") {
    val Seq(l1, l2) = model.eigenvalues
    assert(l1 > l2 && l2 > 0, s"($l1, $l2)")
    assert(math.abs(l1 - 9.0) < 1.5, s"lambda1 = $l1")
    assert(math.abs(l2 - 1.0) < 0.5, s"lambda2 = $l2")
  }

  test("components are orthonormal") {
    val n1 = model.components(0).map(x => x * x).sum
    val d12 = model.components(0).zip(model.components(1))
      .map { case (a, b) => a * b }.sum
    assert(math.abs(n1 - 1.0) < 1e-9)
    assert(math.abs(d12) < 1e-6, s"pc1 . pc2 = $d12")
  }

  test("projection column matches a driver-side centered dot product") {
    import org.apache.spark.sql.functions._
    val got = corpus.orderBy("vec_id").limit(5)
      .select(col("vec_id"), Pca.projection(model, 0, col("embedding")).as("p"),
        col("embedding"))
      .collect()
    got.foreach { r =>
      val emb = r.getSeq[Float](2)
      val want = emb.zip(model.components(0)).zip(model.mean)
        .map { case ((x, v), m) => (x.toDouble - m) * v }.sum
      assert(math.abs(r.getDouble(1) - want) < 1e-6,
        s"vec ${r.getLong(0)}: got ${r.getDouble(1)}, want $want")
    }
  }
}
