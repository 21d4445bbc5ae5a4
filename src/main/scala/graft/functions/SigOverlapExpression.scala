package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused MinHash-estimator overlap: the share of equal positions between
  * two long-array signatures ([[graft.llm.Dedup.estimatedJaccard]]).
  *
  * The built-in formulation materializes a `zip_with` comparison array and
  * folds it through an interpreted `aggregate` — per CANDIDATE PAIR, which
  * is the one place the near-dup pipeline is quadratic-ish. This is one
  * codegen loop. BIT-IDENTICAL for the real case (equal-length non-null
  * signatures): equal count over the common prefix, divided by the FIRST
  * signature's length — `count / size(sigA)` exactly as the built-in
  * divides. Spec-asserted. */
case class SigOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint>, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // Returns null for an empty left signature (0/size(0) divides to null in
  // the built-in) even when both children are non-nullable; without this
  // override nullSafeCodeGen's non-nullable branch would emit an
  // `isNull = true` assignment to an undeclared variable.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() == 0) return null // built-in: 0/size(0) divides to null
    val n = math.min(x.numElements(), y.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / x.numElements()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val eq = ctx.freshName("eq")
      s"""
         |if ($a.numElements() == 0) { ${ev.isNull} = true; } else {
         |  int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |  int $eq = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |        $a.getLong($i) == $b.getLong($i)) $eq++;
         |  }
         |  ${ev.value} = (double) $eq / $a.numElements();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigOverlap =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sig_overlap"
}
