package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for corpus keys: NFC-normalize (so
  * composed and decomposed encodings of the same glyph collide), optionally
  * strip diacritics (NFD → drop combining marks — the standard
  * `strip_accents` semantics, byte-compatible with DuckDB/ICU for Latin
  * diacritics), optionally lowercase (Locale.ROOT — no Turkish-İ
  * surprises). The step ORDER is NFC → strip → lower, matching
  * `lower(strip_accents(nfc_normalize(x)))` in ICU-based engines.
  *
  * Fingerprint/dedup keys computed over raw web text MUST go through this
  * first: "café" arrives in both composed (U+00E9) and decomposed
  * (e + U+0301) forms in real crawls, and a byte-level md5 treats them as
  * different documents. One codegen call per row (the codegen body invokes
  * the same JVM kernel eval uses — string work this shape can't be
  * open-coded profitably). */
case class NormalizeText(child: Expression,
    stripAccents: Boolean = true, toLower: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(value: Any): Any =
    UTF8String.fromString(NormalizeText.process(
      value.asInstanceOf[UTF8String].toString, stripAccents, toLower))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.NormalizeText.process($c.toString(),
         |    $stripAccents, $toLower));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_normalize_text"
}

object NormalizeText {
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  /** The shared kernel (called from both interpreted eval and codegen). */
  def process(s: String, stripAccents: Boolean, toLower: Boolean): String = {
    import java.text.Normalizer
    var out = Normalizer.normalize(s, Normalizer.Form.NFC)
    if (stripAccents) {
      val decomposed = Normalizer.normalize(out, Normalizer.Form.NFD)
      out = Marks.matcher(decomposed).replaceAll("")
    }
    if (toLower) out = out.toLowerCase(java.util.Locale.ROOT)
    out
  }
}
