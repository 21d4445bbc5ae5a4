package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] carried inside the
  * expression ([[graft.llm.Dedup.buildFingerprintBloom]] builds it with
  * `putString`, so the probe is `mightContainString` — build and probe are
  * the same library, same hash, by construction).
  *
  * This is the map-side prefilter of the bloom cross-corpus dedup: the
  * filter bytes ship once per task via the serialized expression (the same
  * way a broadcast literal would), deserialize once per task thanks to the
  * transient lazy, and each row costs two xxhash-style probes — no join, no
  * shuffle, no UDF. No false negatives ever; false positives are bounded by
  * the filter's fpp and removed by the exact verify join downstream. */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(filterBytes)

  override def nullSafeEval(value: Any): Any =
    bloom.mightContainString(value.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bloomRef.mightContainString($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_contains"
}
