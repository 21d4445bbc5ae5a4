package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[WordShingles]]: one pass over the word array,
  * space-joined n-grams via `UTF8String.concatWs` (byte-level concat, no
  * JVM String round-trip), optional first-occurrence dedup. */
object WordShinglesKernel {
  private val space = UTF8String.fromString(" ")

  def compute(words: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = words.numElements()
    def word(i: Int): UTF8String = {
      val w = words.getUTF8String(i)
      if (w == null) UTF8String.EMPTY_UTF8 else w
    }
    val out =
      if (m < n) {
        // reference rule: short docs yield ONE shingle joining all words
        val all = new Array[UTF8String](m)
        var i = 0
        while (i < m) { all(i) = word(i); i += 1 }
        Array[AnyRef](UTF8String.concatWs(space, all: _*))
      } else {
        val grams = new Array[AnyRef](m - n + 1)
        var i = 0
        while (i <= m - n) {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = word(i + j); j += 1 }
          grams(i) = UTF8String.concatWs(space, parts: _*)
          i += 1
        }
        grams
      }
    if (!distinct) new GenericArrayData(out)
    else {
      val seen = new java.util.LinkedHashSet[AnyRef](out.length * 2)
      out.foreach(seen.add)
      new GenericArrayData(seen.toArray)
    }
  }
}

/** Fused word-shingle construction — [[graft.llm.Dedup.shingles]] (plus
  * the optional `array_distinct`) as ONE native pass over the token array.
  *
  * The built-in formulation evaluates an interpreted
  * `transform(sequence(...), i => concat_ws(" ", slice(words, i+1, n)))`
  * per row — measured as the DOMINANT cost of the whole MinHash near-dup
  * pipeline at sf0.1 (7.3s of a ~10s run; banding, estimation and verify
  * are each sub-second). Semantics are identical (spec-asserted): short
  * docs (< n words) yield the single all-words join, dedup preserves
  * first-occurrence order like `array_distinct`. Tokenization stays in
  * built-ins (`split(lower(trim(text)), "\\s+")`), so cross-engine
  * lower/trim/split semantics are untouched. */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, s"shingle n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WordShinglesKernel.compute(v.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordShinglesKernel.compute($a, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_word_shingles"
}
