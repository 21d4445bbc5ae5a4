package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared eval/codegen kernel for [[GramStats]]: one hash-count pass over
  * the gram array. Multiplicities are exact integers, so the outputs are
  * bit-identical to the explode→groupBy formulation's counts. */
object GramStatsKernel {
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Int](
      math.max(8, n * 2))
    var i = 0
    var total = 0L
    while (i < n) {
      if (!arr.isNullAt(i)) {
        total += 1
        counts.merge(arr.getUTF8String(i), 1, (a, b) => a + b)
      }
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new GenericInternalRow(Array[Any](top, total, dup))
  }
}

/** Fused per-row n-gram multiset statistics — the repetition-signal
  * primitive ([[graft.llm.TextAnalysis.repetitionSignals]]) without the
  * two full gram-stream shuffles the explode→groupBy formulation pays.
  * Given a document's gram array, returns
  * `struct(top_count, total, dup_total)`:
  *  - `top_count` — the highest multiplicity (max count over distinct grams)
  *  - `total`     — total gram occurrences (array length)
  *  - `dup_total` — occurrences belonging to grams appearing more than once
  * All integer counts, so downstream ratios divide identically to the
  * aggregate path. A per-row hash map bounds memory at the document's
  * distinct-gram count — the same bound the groupBy state pays, but
  * map-side and transient. */
case class GramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("top_count", LongType, nullable = false),
    StructField("total", LongType, nullable = false),
    StructField("dup_total", LongType, nullable = false)))

  override def nullSafeEval(v: Any): Any =
    GramStatsKernel.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GramStatsKernel.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)

  override def prettyName: String = "graft_gram_stats"
}
