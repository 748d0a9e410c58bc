package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** PageRank correctness against a driver-side reference iteration on the
  * same graph — same damping, same dangling-mass teleport, same iteration
  * count, so values must agree to float-summation noise.
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 1→2, 1→3, 2→3, 3→1, 4→3; node 5 dangling via 3→5
  private val edgeList =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (3L, 5L))

  private def reference(iters: Int, d: Double): Map[Long, Double] = {
    val nodes = edgeList.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val out = edgeList.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val base = (1 - d) / n + d * dangling / n
      val in = edgeList.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / out(s) }.sum).toMap
      rank = nodes.map(v => v -> (base + d * in.getOrElse(v, 0.0))).toMap
    }
    rank
  }

  test("ranks match the reference power iteration (dangling mass teleports)") {
    val got = PageRank.run(edgeList.toDF("src", "dst"), iters = 10)
      .as[(Long, Double)].collect().toMap
    val want = reference(10, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, r) =>
      assert(math.abs(r - want(id)) < 1e-9, s"node $id: $r vs ${want(id)}")
    }
    val total = got.values.sum
    assert(math.abs(total - 1.0) < 1e-9, s"ranks must sum to 1, got $total")
    // structural sanity: 3 has every inbound edge, 4 has none
    assert(got(3L) == got.values.max)
    assert(got(4L) == got.values.min)
  }

  test("no-dangling fast path matches the reference on a symmetric graph") {
    // symmetrize: every node then has an out-edge, dangling mass is zero
    val sym = edgeList ++ edgeList.map { case (a, b) => (b, a) }
    val got = PageRank.run(sym.distinct.toDF("src", "dst"), iters = 9,
        assumeNoDangling = true)
      .as[(Long, Double)].collect().toMap
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val out = sym.distinct.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    (1 to 9).foreach { _ =>
      val in = sym.distinct.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / out(s) }.sum).toMap
      rank = nodes.map(v =>
        v -> ((1 - 0.85) / n + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    assert(got.keySet == rank.keySet)
    got.foreach { case (id, r) =>
      assert(math.abs(r - rank(id)) < 1e-9, s"node $id: $r vs ${rank(id)}")
    }
  }
}
