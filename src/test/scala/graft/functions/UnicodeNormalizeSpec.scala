package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{UnicodeNormalize, UnicodeNormalizeAlgo, UnicodeNormalizeFn}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins graftx.UnicodeNormalize to UAX #15 as DuckDB's `nfc_normalize`
  * implements it (the q335 oracle): composition, canonical reordering by
  * combining class, NFC-vs-NFKC compatibility boundaries, and the
  * ASCII/identity fast path. */
class UnicodeNormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def nfc(s: String): String =
    UnicodeNormalizeAlgo.normalize(UTF8String.fromString(s), 0).toString
  private def nfkc(s: String): String =
    UnicodeNormalizeAlgo.normalize(UTF8String.fromString(s), 2).toString

  test("NFC composes decomposed sequences to precomposed codepoints") {
    assert(nfc("e\u0301") == "\u00E9")          // e + acute
    assert(nfc("A\u030A") == "\u00C5")          // A + ring above
    assert(nfc("o\u0302\u0301") == "\u1ED1")    // o + circumflex + acute
    assert(nfc("e\u0301").length == 1)
  }

  test("NFC canonically reorders combining marks by combining class") {
    // acute (ccc=230) written BEFORE dot-below (ccc=220): NFC must sort
    // dot-below first, then compose - both orders normalize identically
    assert(nfc("e\u0301\u0323") == nfc("e\u0323\u0301"))
    assert(nfc("e\u0301\u0323") != "e\u0301\u0323")
  }

  test("NFC leaves compatibility characters alone; NFKC folds them") {
    assert(nfc("\uFB01") == "\uFB01")  // fi ligature survives NFC
    assert(nfkc("\uFB01") == "fi")     // and folds under NFKC
    assert(nfkc("\u2460") == "1")      // circled one
  }

  test("already-normalized input returns the SAME UTF8String (fast path)") {
    val s = UTF8String.fromString("plain ascii, no marks")
    assert(UnicodeNormalizeAlgo.normalize(s, 0) eq s)
    val composed = UTF8String.fromString("caf\u00E9")
    assert(UnicodeNormalizeAlgo.normalize(composed, 0) eq composed)
  }

  test("invalid form is rejected at construction, loudly") {
    val e = intercept[IllegalArgumentException] {
      UnicodeNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFX")
    }
    assert(e.getMessage.contains("NFX"))
  }

  test("DataFrame path: codegen'd column normalizes and keeps nulls null") {
    // spark.range blocks the ConvertToLocalRelation fold, so the
    // projection actually runs through generated code
    val df = spark.range(3)
      .select(col("id"),
        when(col("id") === 0, lit("e\u0301"))
          .when(col("id") === 1, lit("abc")).as("s"))
      .select(col("id"), UnicodeNormalizeFn.unicodeNormalize(col("s")).as("n"))
    val got = df.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(0L -> Some("\u00E9"), 1L -> Some("abc"), 2L -> None))
    // the expression must not fall back to interpreted projection: the
    // "*(n)" prefix marks the Project as inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
