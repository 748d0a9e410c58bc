package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("column morton2 matches the reference bit-interleave exactly") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq((0, 0), (1, 0), (0, 1), (Int.MaxValue, Int.MaxValue)) ++
      Seq.fill(200)((rnd.nextInt(Int.MaxValue), rnd.nextInt(Int.MaxValue)))
    val got = pairs.toDF("a", "b")
      .select($"a", $"b", ZOrder.morton2($"a", $"b").as("z"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == ZOrder.morton2Ref(a, b), s"($a,$b)")
    }
  }

  test("z-order clustering bounds BOTH dimensions per chunk, single-column sort does not") {
    // 64x64 grid, chunked into 16 files' worth of rows: under z-order every
    // chunk must span ≤ a fraction of each dimension's range; under a sort
    // by a alone, b's span per chunk stays ~full-range.
    val grid = for { a <- 0 until 64; b <- 0 until 64 } yield (a, b)
    def chunkSpans(sorted: Seq[(Int, Int)]): Seq[(Int, Int)] =
      sorted.grouped(256).map { c =>
        (c.map(_._1).max - c.map(_._1).min, c.map(_._2).max - c.map(_._2).min)
      }.toSeq
    val zSorted = grid.sortBy { case (a, b) => ZOrder.morton2Ref(a, b) }
    val aSorted = grid.sortBy(_._1)
    val zWorst = chunkSpans(zSorted).map { case (x, y) => math.max(x, y) }.max
    val aWorstB = chunkSpans(aSorted).map(_._2).max
    assert(zWorst <= 16, s"each z chunk must stay in a 16x16 box, worst $zWorst")
    assert(aWorstB >= 63, "single-column sort leaves the other dimension unclustered")
  }
}
