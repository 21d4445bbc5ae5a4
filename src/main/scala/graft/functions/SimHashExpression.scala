package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared eval/codegen kernel for [[SimHash64]] — one MD5 instance per row
  * (reset between tokens), one pass over the token array accumulating all
  * 64 bit votes. */
object SimHash64Kernel {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          // bit b lives in 1-indexed hex char 16 - b/4, nibble bit b%4 —
          // the exact layout of the md5NibbleBit column formulation
          val c = 16 - b / 4
          val byt = digest((c - 1) / 2) & 0xFF
          val v = if ((c - 1) % 2 == 0) (byt >> 4) & 0xF else byt & 0xF
          votes(b) += (if (((v >> (b % 4)) & 1) == 1) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }
}

/** Fused 64-bit SimHash over a token array as one native expression.
  *
  * The aggregate formulations ([[graft.llm.Dedup.simHash]] /
  * [[graft.llm.Dedup.simHashes]]) either walk the md5-hex array 64 times
  * through interpreted higher-order aggregates or explode tokens into a
  * 64-column vote shuffle; this expression computes every bit's vote in
  * one pass over the tokens, map-side. BIT-IDENTICAL (spec-asserted):
  * same md5, same nibble/bit layout, same ±1 votes, same sign rule.
  * The TOKENIZER stays the caller's `split(lower(trim(text)), "\\s+")`
  * built-ins, so cross-engine tokenization semantics are untouched. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    SimHash64Kernel.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64Kernel.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}
