package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The native CosineSimilarity expression must be bit-identical to the
  * higher-order-function baseline (same double accumulation order), in both
  * interpreted and whole-stage-codegen paths. */
class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def randVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Float])] = {
    val rnd = new java.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  test("native cosine == higher-order-function cosine, bit-exact") {
    val df = randVecs(50, 64, 1).toDF("id", "a")
      .crossJoin(randVecs(3, 64, 2).toDF("id2", "b"))
    val got = df.select(
      VectorFunctions.cosineFast($"a", $"b").as("fast"),
      VectorOps.cosine($"a", $"b").as("base"))
      .as[(Double, Double)].collect()
    got.foreach { case (fast, base) =>
      assert(java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(base))
    }
  }

  test("native cosine survives codegen (filter + projection pipeline)") {
    val df = randVecs(100, 16, 3).toDF("id", "a")
    val n = df.crossJoin(randVecs(1, 16, 4).toDF("id2", "b"))
      .filter(VectorFunctions.cosineFast($"a", $"b") > -1.5)
      .count()
    assert(n == 100)
  }

  test("known value: cosine of identical vectors is 1.0") {
    val v = Seq(1.0f, 2.0f, 3.0f)
    val got = Seq((v, v)).toDF("a", "b")
      .select(VectorFunctions.cosineFast($"a", $"b")).as[Double].collect().head
    assert(math.abs(got - 1.0) < 1e-15)
  }
}
