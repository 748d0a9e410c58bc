package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel for [[UnicodeNormalize]], static-forwardable so generated
  * code calls it directly and the expression stays inside whole-stage
  * codegen. Semantics are UAX #15 via `java.text.Normalizer` — the same
  * algorithm DuckDB's `nfc_normalize` implements (composition to canonical
  * precomposed forms, canonical reordering of combining marks by combining
  * class; compatibility folding only under the K forms), which is what
  * makes the oracle comparison exact.
  */
object UnicodeNormalizeAlgo {
  // indexed by the literal the expression bakes into generated code
  private val Forms: Array[java.text.Normalizer.Form] = Array(
    java.text.Normalizer.Form.NFC, java.text.Normalizer.Form.NFD,
    java.text.Normalizer.Form.NFKC, java.text.Normalizer.Form.NFKD)

  val FormNames: Seq[String] = Seq("NFC", "NFD", "NFKC", "NFKD")

  def normalize(s: UTF8String, formIdx: Int): UTF8String = {
    val str = s.toString
    val form = Forms(formIdx)
    // isNormalized is a cheap scan that returns immediately for ASCII —
    // the overwhelmingly common case in a text corpus — so the already-
    // normalized fast path allocates nothing new.
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

/** Native Catalyst expression: Unicode normalization (NFC/NFD/NFKC/NFKD).
  *
  * Spark ships no normalization function, but text canonicalization is the
  * FIRST step of every dedup/fingerprint pipeline: the same visible string
  * arrives from the web both precomposed (é = U+00E9) and decomposed
  * (e + U+0301), and without NFC the exact-hash, MinHash, and n-gram layers
  * all see them as different documents. The form is a compile-time literal
  * baked into the generated call, so the row path is a single static
  * invocation inside WholeStageCodegen.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {

  private val formIdx = UnicodeNormalizeAlgo.FormNames.indexOf(form)
  require(formIdx >= 0,
    s"unicode_normalize form must be one of ${UnicodeNormalizeAlgo.FormNames}, got '$form'")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(s: Any): Any =
    UnicodeNormalizeAlgo.normalize(s.asInstanceOf[UTF8String], formIdx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graftx.UnicodeNormalizeAlgo.normalize($s, $formIdx)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalizeFn {
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(c), form))
}
