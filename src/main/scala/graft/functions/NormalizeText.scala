package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization of a string column — the corpus-
  * canonicalization step Spark SQL has no built-in for: "é" arrives both
  * composed (U+00E9) and decomposed (e + U+0301) in any web crawl, and
  * every downstream hash (exact dedup keys, shingles, split coins) sees
  * them as different documents unless normalization runs first.
  *
  * Forms: NFC (canonical composition — the storage/dedup default) and
  * NFKC (adds compatibility folding: ligatures, full-width forms — the
  * aggressive text-matching variant). Implemented as a Catalyst
  * `UnaryExpression` with `doGenCode` delegating to
  * `java.text.Normalizer` (JDK-built-in, no dependency): the call stays
  * inside whole-stage codegen, no UDF, null-safe for free. Cost note:
  * `isNormalized` is checked first — for ASCII-dominated corpora the
  * fast path never allocates.
  */
case class NormalizeText(child: Expression, form: String) extends UnaryExpression {

  override def prettyName: String = "normalize_text"
  override def dataType: DataType = StringType

  private val normalizerForm: Normalizer.Form = form.toUpperCase match {
    case "NFC" => Normalizer.Form.NFC
    case "NFD" => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(s"unknown normalization form: $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeText.normalize(input.asInstanceOf[UTF8String].toString, normalizerForm.name()))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formName = normalizerForm.name()
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.NormalizeText.normalize($c.toString(), "$formName"));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  /** Static entry shared by interpreted and generated code paths. */
  def normalize(s: String, form: String): String = {
    val f = Normalizer.Form.valueOf(form)
    if (Normalizer.isNormalized(s, f)) s else Normalizer.normalize(s, f)
  }
}
