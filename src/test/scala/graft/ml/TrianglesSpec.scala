package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Triangle counting against a driver-side brute-force enumeration on the
  * same edge sets, including the skew case the degree-ordered orientation
  * exists for (a star hub inside a clique).
  */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Long = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if es((a, b)) && es((a, c)) && es((b, c))
    } yield 1).size.toLong
  }

  private def run(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val row = Triangles.count(edges.toDF("u", "v")).head()
    (row.getLong(0), row.getLong(1), row.getLong(2))
  }

  test("K4 has 4 triangles, C5 has none") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(run(k4) == ((4L, 6L, 4L)))
    val c5 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))
    assert(run(c5) == ((5L, 5L, 0L)))
  }

  test("matches brute force on a hub-heavy graph (orientation handles skew)") {
    // star hub 0 connected to 1..12, plus a clique on 1..5 and a chain —
    // the hub's 12 edges must not fan out of the hub (it is (deg,id)-max)
    val star = (1L to 12L).map(i => (0L, i))
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val chain = (6L until 12L).map(i => (i, i + 1))
    val edges = star ++ clique ++ chain
    val (n, m, tri) = run(edges)
    assert(n == 13 && m == edges.size)
    assert(tri == brute(edges))
    assert(tri > 0)
  }

  test("deterministic under input permutation and partitioning") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L),
      (5L, 6L), (4L, 5L), (1L, 4L))
    val a = run(edges)
    val b = run(scala.util.Random.shuffle(edges))
    assert(a == b)
    assert(a._3 == brute(edges))
  }
}
