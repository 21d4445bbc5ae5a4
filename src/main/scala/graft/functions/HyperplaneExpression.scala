package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused random-hyperplane LSH signature as one native Catalyst expression.
  *
  * The built-in formulation ([[graft.llm.Similarity.hyperplaneSignature]])
  * builds `planes` separate `aggregate` expressions, each re-walking the
  * vector (plus a `zip_with` materializing an index-struct array): for a
  * 62-plane refined signature over a 128-dim vector that is 62 interpreted
  * array walks per row. This expression is ONE codegen'd loop over the
  * vector accumulating all plane projections simultaneously — the same (b)
  * tier of the custom-operator ladder as [[CosineSimilarity]].
  *
  * BIT-IDENTICAL to the built-in formulation (and to the DuckDB oracle's
  * replication): per plane p the projection is the left-to-right double sum
  * over i of `x_i · (((i·2654435761 + p·40503 + 12345) mod 1000003)
  * / 1000003 − 0.5)`, bit p set iff the projection is strictly positive.
  * Interleaving planes inside the i-loop does not change any per-plane
  * addition order. Null/empty vectors yield signature 0 (never null),
  * matching the when/otherwise fold of the built-in formulation.
  */
case class HyperplaneSignature(child: Expression, planes: Int)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a float/double array, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else {
      val x = v.asInstanceOf[ArrayData]
      val isF = elemIsFloat
      val n = x.numElements()
      val projs = new Array[Double](planes)
      var i = 0
      while (i < n) {
        val xv = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
        val base = i.toLong * 2654435761L + 12345L
        var p = 0
        while (p < planes) {
          val m = (base + p.toLong * 40503L) % 1000003L
          projs(p) += xv * (m.toDouble / 1000003.0 - 0.5)
          p += 1
        }
        i += 1
      }
      var sig = 0L
      var p = 0
      while (p < planes) { if (projs(p) > 0) sig |= 1L << p; p += 1 }
      sig
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val projs = ctx.freshName("projs")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val p = ctx.freshName("p")
    val p2 = ctx.freshName("p2")
    val xv = ctx.freshName("xv")
    val base = ctx.freshName("base")
    val m = ctx.freshName("m")
    val codeBlock =
      code"""
        ${c.code}
        long ${ev.value} = 0L;
        if (!${c.isNull}) {
          double[] $projs = new double[$planes];
          int $n = ${c.value}.numElements();
          for (int $i = 0; $i < $n; $i++) {
            double $xv = (double) ${c.value}.$get($i);
            long $base = (long) $i * 2654435761L + 12345L;
            for (int $p = 0; $p < $planes; $p++) {
              long $m = ($base + (long) $p * 40503L) % 1000003L;
              $projs[$p] += $xv * ((double) $m / 1000003.0 - 0.5);
            }
          }
          for (int $p2 = 0; $p2 < $planes; $p2++) {
            if ($projs[$p2] > 0) ${ev.value} |= 1L << $p2;
          }
        }
      """
    ev.copy(code = codeBlock, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)

  override def prettyName: String = "graft_hyperplane_sig"
}
