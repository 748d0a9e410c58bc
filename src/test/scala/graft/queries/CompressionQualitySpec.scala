package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the DEFLATE quality-signal kernel: losslessness, the LZ77
  * dup-discount invariant the q336 gate hashes, and the property that
  * makes the signal USEFUL — repetitive text compresses measurably better
  * than varied prose. */
class CompressionQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(text: String): CompressionStats =
    CompressionQuality.stats(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head

  test("round trip is bit-exact and sizes are sane") {
    val st = one("The quick brown fox jumps over the lazy dog. 0123456789")
    assert(st.round_trip_ok && st.dup_discount_ok)
    assert(st.n_raw == 55 && st.n_deflate > 0)
  }

  test("repetitive text compresses far better than varied prose") {
    val rep = one("spam " * 100)          // 500 bytes of one token
    val prose = one(
      (0 until 100).map(i => s"w${i * 37 % 91}x${i * 53 % 87}").mkString(" "))
    assert(rep.n_raw == 500)
    assert(rep.n_deflate * 10 < rep.n_raw,
      s"500B of repeated token must compress >10x, got ${rep.n_deflate}")
    assert(prose.n_deflate * 3 > prose.n_raw,
      s"varied prose must NOT compress well, got ${prose.n_deflate}/${prose.n_raw}")
  }

  test("dup-discount: the doubled text's second copy is nearly free") {
    val st = one("a perfectly ordinary sentence with no repetition at all")
    assert(st.n_deflate_dup < st.n_deflate + 24,
      s"second copy must code as back-references: $st")
  }

  test("empty and tiny documents satisfy both invariants") {
    for (t <- Seq("", "x", "ab")) {
      val st = one(t)
      assert(st.round_trip_ok && st.dup_discount_ok, s"'$t' -> $st")
    }
  }

  test("truncated streams fail loudly instead of spinning") {
    val defl = new java.util.zip.Deflater()
    val infl = new java.util.zip.Inflater()
    val comp = CompressionQuality.deflate(defl,
      ("z" * 300).getBytes("UTF-8"))
    intercept[java.util.zip.DataFormatException] {
      CompressionQuality.inflate(infl, comp.take(4), 300)
    }
  }
}
