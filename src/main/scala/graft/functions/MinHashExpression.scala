package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused K-element MinHash signature as one native Catalyst expression.
  *
  * The built-in formulation ([[graft.llm.Dedup.minHashSignatures]]) is an
  * explode → groupBy with K min-aggregates: a full shuffle of the exploded
  * shingle table just to compute a per-row value. This expression computes
  * the signature map-side in one pass over the shingle array — no explode,
  * no aggregation shuffle, no signatures join.
  *
  * BIT-IDENTICAL to `min(xxhash64(s, lit(k)))`: Spark's `xxhash64(c1, c2)`
  * folds children through XXH64 starting from seed 42, so for a string
  * shingle `s` and int literal `k` the hash is
  * `XXH64.hashInt(k, XXH64.hashUnsafeBytes(bytes(s), 42))`. The string is
  * hashed ONCE per shingle; the K per-position values are single hashInt
  * mixes of that — cheaper than even one pass of the aggregate path.
  * A spec asserts equality against the aggregate formulation.
  *
  * Null/empty arrays yield null (the aggregate path drops such docs via
  * its inner join; callers filter `size(sh) > 0` to match). A null ELEMENT
  * is hashed the way `xxhash64(s, lit(k))` hashes it: null children leave
  * the fold at the seed, so the per-position hash is `hashInt(k, 42)` —
  * bit-identical to the aggregate path even for arrays containing nulls
  * (unreachable from our shingle producers, which emit containsNull=false,
  * but the expression is SQL-registered and callable on any array).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"k must be positive, got $k")

  // Returns null for empty arrays even when the child is non-nullable;
  // without this override nullSafeCodeGen would take the non-nullable
  // branch and the generated `isNull = true` would not compile.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // null element → fold stays at the seed, matching xxhash64's
      // null-child behavior (hashInt(p, 42)), not a skip
      val h0 =
        if (arr.isNullAt(i)) 42L
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes, 42L)
        }
      var p = 0
      while (p < k) {
        val h = XXH64.hashInt(p, h0)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val mins = ctx.freshName("mins")
      val s = ctx.freshName("s")
      val h0 = ctx.freshName("h0")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h0;
         |    if ($a.isNullAt($i)) {
         |      $h0 = 42L;
         |    } else {
         |      org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |      $h0 = $xxh.hashUnsafeBytes($s.getBaseObject(),
         |        $s.getBaseOffset(), $s.numBytes(), 42L);
         |    }
         |    for (int $p = 0; $p < $k; $p++) {
         |      long $h = $xxh.hashInt($p, $h0);
         |      if ($h < $mins[$p]) $mins[$p] = $h;
         |    }
         |  }
         |  ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}
