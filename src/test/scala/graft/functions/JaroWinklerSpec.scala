package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{JaroWinklerAlgo, JaroWinklerFn}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins graftx.JaroWinkler to the DuckDB `jaro_winkler_similarity`
  * semantics the q191 oracle compares against — every boundary value below
  * was taken verbatim from a DuckDB probe, so a drift in either the kernel
  * or DuckDB's definition fails here before it fails the gate. */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sim(a: String, b: String): Double =
    JaroWinklerAlgo.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook pairs match DuckDB jaro_winkler_similarity") {
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),    // one transposition
      ("dixon", "dicksonx", 0.8133333333333332),   // prefix boost l=2
      ("jellyfish", "smellyfish", 0.8962962962962964), // no common prefix
      ("dwayne", "duane", 0.8400000000000001),
      ("aaaa", "aaaab", 0.96),                     // boost capped at l=4
      ("filler", "filter", 0.9222222222222223),    // l=3, not 4
      ("crate", "trace", 0.7333333333333334))      // l=0 → boost is a no-op
    cases.foreach { case (a, b, want) =>
      assert(math.abs(sim(a, b) - want) < 1e-12, s"$a/$b")
    }
  }

  test("boost threshold: no prefix bonus at jaro <= 0.7") {
    // jaro("abcdef","abczzz") = 2/3 < 0.7: with an unconditional boost this
    // would read 0.7667 — DuckDB (and Winkler 1990) leave it at the raw jaro.
    assert(math.abs(sim("abcdef", "abczzz") - 2.0 / 3) < 1e-12)
  }

  test("degenerate shapes: empty → 0, window floor at 0") {
    assert(sim("", "") == 0.0)       // DuckDB scores empty-vs-empty 0, not 1
    assert(sim("a", "") == 0.0)
    assert(sim("ab", "ba") == 0.0)   // window max(2,2)/2-1 = 0: no cross match
    assert(sim("a", "a") == 1.0)
    assert(sim("abc", "xyz") == 0.0)
  }

  test("non-BMP strings iterate by code point, not UTF-16 code unit") {
    // "𝕏a" vs "𝕏b": 2 code points each (𝕏 is a surrogate PAIR in UTF-16).
    // Codepoint semantics: window max(2,2)/2-1 = 0, one positional match,
    // jaro = (1/2 + 1/2 + 1)/3 = 2/3, below the 0.7 boost threshold.
    // charAt iteration would see length-3 strings with TWO matches (both
    // surrogate halves) and a prefix bonus → 0.822… — the round-8 ADVICE
    // divergence from DuckDB's codepoint-based scoring.
    assert(math.abs(sim("𝕏a", "𝕏b") - 2.0 / 3) < 1e-12)
    // identical emoji strings are exactly 1
    assert(sim("😀", "😀") == 1.0)
    // 2-codepoint swap: window 0 → no cross-position match, same as "ab"/"ba"
    assert(sim("😀a", "a😀") == 0.0)
  }

  test("codegen path agrees bit-exactly with interpreted eval") {
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("spark", "shark"), ("table", "tables"), ("a", "agg"), ("ab", "ba"))
    val df = pairs.toDF("a", "b")
    val got = df.select(JaroWinklerFn.jaroWinkler($"a", $"b")).as[Double].collect()
    val want = pairs.map { case (a, b) => sim(a, b) }
    got.zip(want).foreach { case (g, w) =>
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(w))
    }
    // and through a filter, to force the codegen predicate path
    val n = df.filter(JaroWinklerFn.jaroWinkler($"a", $"b") > 0.9).count()
    assert(n == pairs.count { case (a, b) => sim(a, b) > 0.9 })
  }

  test("null inputs yield null") {
    val df = Seq((Some("abc"), None: Option[String])).toDF("a", "b")
    val got = df.select(JaroWinklerFn.jaroWinkler($"a", $"b")).collect()
    assert(got.head.isNullAt(0))
  }
}
