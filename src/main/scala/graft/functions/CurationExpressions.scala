package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass kernels for the per-document curation rules.
  *
  * Why these exist: the declarative formulations build on higher-order
  * array lambdas (`filter`/`transform`/`aggregate`), which evaluate
  * INTERPRETED — outside whole-stage codegen and outside subexpression
  * elimination — so a rule set reading ten signals re-walks its whole
  * expression tree ten times per row (measured 10× on the composed
  * curation gate). Each kernel here is ONE JVM pass per row, invoked from
  * codegen, and every string primitive goes through the same `UTF8String`
  * operations the built-in expressions use (trim = 0x20 only, lower =
  * the UTF8String ASCII fast path + locale fallback, length = codepoint
  * count), so outputs are BIT-IDENTICAL to the lambda formulations —
  * parity is spec-asserted over the real corpus and the gates' DuckDB
  * oracles hold unchanged. */
object CurationKernels {
  private val Ws = java.util.regex.Pattern.compile("\\s+")
  private val Nl = java.util.regex.Pattern.compile("\n")

  private def trimS(s: String): String =
    UTF8String.fromString(s).trim().toString
  private def lowerS(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString
  private def numChars(s: String): Int = UTF8String.fromString(s).numChars()
  /** `split(col, regex)` semantics: limit −1 (trailing empties kept). */
  private def splitWs(s: String): Array[String] = Ws.split(s, -1)

  /** [[graft.llm.Curation.c4Clean]]'s per-row face: (cleaned text,
    * n_lines, n_kept, doc_bad). */
  def c4(text: String, minWordsPerLine: Int, terminalPunct: Seq[String],
      badLineWords: Seq[String], dropDocPhrases: Seq[String])
      : (String, Int, Int, Boolean) = {
    val lines = Nl.split(text, -1)
    val kept = lines.filter { l =>
      val t = trimS(l)
      val endsOk = terminalPunct.exists(t.endsWith)
      val wordsOk = t.nonEmpty && splitWs(t).length >= minWordsPerLine
      val lt = lowerS(t)
      endsOk && wordsOk && !badLineWords.exists(lt.contains)
    }
    val lower = lowerS(text)
    val docBad = dropDocPhrases.exists(lower.contains)
    (kept.mkString("\n"), lines.length, kept.length, docBad)
  }

  /** [[graft.llm.TextAnalysis.gopherSignals]]'s per-row face, same field
    * order and the same arithmetic shapes (int/int and (int/3.0+int)/int
    * divisions). */
  def gopher(text: String, stopWords: Seq[String])
      : (Long, Double, Double, Double, Double, Double, Double, Long) = {
    val t = trimS(text)
    val words = splitWs(lowerS(t))
    val n = if (t.isEmpty) 0 else words.length
    val lines = Nl.split(t, -1)
    val nl = lines.length
    var hashes = 0
    var dots = 0   // codepoints in '...' runs, counted as the replace diff
    var hellip = 0
    // replace-diff semantics: regexp_replace(t, "\\.\\.\\.", "") removes
    // non-overlapping '...' triples left to right
    var i = 0
    while (i < t.length) {
      if (t.charAt(i) == '#') hashes += 1
      if (t.charAt(i) == '…') hellip += 1
      if (t.charAt(i) == '.' && i + 2 < t.length &&
        t.charAt(i + 1) == '.' && t.charAt(i + 2) == '.') { dots += 3; i += 2 }
      i += 1
    }
    val ellipses = dots / 3.0 + hellip
    var bullet = 0
    var ellLine = 0
    lines.foreach { l =>
      val tl = trimS(l)
      if (tl.startsWith("•") || tl.startsWith("- ")) bullet += 1
      if (tl.endsWith("...") || tl.endsWith("…")) ellLine += 1
    }
    // word lengths over the UN-lowered tokens (lowercasing can change
    // codepoint counts for exotic caps; the declarative formulation sums
    // lengths of split(trim(text)) before any lower)
    var sumLen = 0
    splitWs(t).foreach { w => sumLen += numChars(w) }
    var alpha = 0
    words.foreach { w =>
      if (w.exists(c => c >= 'a' && c <= 'z')) alpha += 1
    }
    val stopHits = words.toSet.count(stopWords.contains).toLong
    val nD = n.toDouble
    val mwl = if (words.length == 0) 0.0 else sumLen.toDouble / words.length
    (n.toLong, mwl,
      if (n == 0) 0.0 else hashes.toDouble / nD,
      if (n == 0) 0.0 else ellipses / nD,
      bullet.toDouble / nl,
      ellLine.toDouble / nl,
      if (n == 0) 0.0 else alpha.toDouble / nD,
      stopHits)
  }
}

/** Fused C4 line cleaning: struct(text, n_lines, n_kept, doc_bad) in one
  * kernel call per row (codegen-invoked). Parameters ride in the
  * expression (tiny literals). */
case class C4CleanExpr(child: Expression, minWordsPerLine: Int,
    terminalPunct: Seq[String], badLineWords: Seq[String],
    dropDocPhrases: Seq[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("doc_bad", BooleanType, nullable = false)))

  private lazy val lowerBad = badLineWords.map(_.toLowerCase)
  private lazy val lowerPhrases = dropDocPhrases.map(_.toLowerCase)

  def kernel(s: UTF8String): InternalRow = {
    val (txt, nLines, nKept, bad) = CurationKernels.c4(
      s.toString, minWordsPerLine, terminalPunct, lowerBad, lowerPhrases)
    InternalRow(UTF8String.fromString(txt), nLines, nKept, bad)
  }

  override def nullSafeEval(value: Any): Any =
    kernel(value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("c4expr", this, classOf[C4CleanExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_c4_clean"
}

/** Fused Gopher signals: the [[graft.llm.TextAnalysis.gopherSignals]]
  * struct in one kernel call per row. */
case class GopherSignalsExpr(child: Expression, stopWords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("hash_ratio", DoubleType, nullable = false),
    StructField("ellipsis_ratio", DoubleType, nullable = false),
    StructField("bullet_line_frac", DoubleType, nullable = false),
    StructField("ellipsis_line_frac", DoubleType, nullable = false),
    StructField("alpha_word_frac", DoubleType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))

  def kernel(s: UTF8String): InternalRow = {
    val g = CurationKernels.gopher(s.toString, stopWords)
    InternalRow(g._1, g._2, g._3, g._4, g._5, g._6, g._7, g._8)
  }

  override def nullSafeEval(value: Any): Any =
    kernel(value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherexpr", this,
      classOf[GopherSignalsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_gopher_signals"
}
