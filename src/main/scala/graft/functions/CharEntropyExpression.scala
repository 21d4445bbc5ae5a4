package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document character-distribution signals — the
  * compressibility/junk detector of the curation canon (reference quality
  * heuristics: `lours`-adjacent pipelines gate on symbol ratios only;
  * character entropy is the standard extension for binary-junk and
  * repeated-character spam, cf. the Gopher/RedPajama quality-signal
  * families):
  *
  *   - `n_chars`     — total Unicode codepoints;
  *   - `n_distinct`  — distinct codepoints;
  *   - `entropy`     — Shannon entropy of the codepoint distribution in
  *                     BITS: `−Σ_c (k_c/n)·log₂(k_c/n)`. Near 0 for
  *                     single-character spam ("aaaa…"), ≈4–4.5 for
  *                     natural English, ≳6 for base64/binary junk;
  *   - `max_char_ratio` — frequency share of the most common codepoint
  *                     (whitespace-flood / padding detector).
  *
  * One codegen-invoked JVM pass per row (the [[C4CleanExpr]] tier): no
  * explode, no shuffle — at 100 TB the alternative (explode to one row
  * per character and re-group) multiplies the corpus row count by the
  * mean document length.
  *
  * Cross-engine determinism: counts are exact integers; the entropy sum
  * runs over codepoints in ASCENDING codepoint order, which is byte order
  * of valid UTF-8 — the same order a binary-collation `ORDER BY` gives
  * the DuckDB oracle's ordered aggregate — and each term is evaluated as
  * `(k/n)·ln(k/n)/ln 2` with the identical operation sequence, so the
  * double is reproduced bit-for-bit before the gate's 6-decimal round.
  * Empty input yields (0, 0, 0.0, 0.0); null input yields null. */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("entropy", DoubleType, nullable = false),
    StructField("max_char_ratio", DoubleType, nullable = false)))

  def kernel(s: UTF8String): InternalRow = {
    val str = s.toString
    // codepoint histogram; sorted map so the entropy accumulation order is
    // codepoint-ascending (the determinism contract above)
    val counts = new java.util.TreeMap[Integer, Long]()
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1L else prev + 1L)
      n += 1L
      i += Character.charCount(cp)
    }
    if (n == 0L) return InternalRow(0L, 0, 0.0, 0.0)
    val nD = n.toDouble
    var entropy = 0.0
    var maxK = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k > maxK) maxK = k
      val p = k / nD
      entropy -= p * (math.log(p) / math.log(2.0))
    }
    InternalRow(n, counts.size(), entropy, maxK / nD)
  }

  override def nullSafeEval(value: Any): Any =
    kernel(value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("entexpr", this, classOf[CharEntropyExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_char_entropy"
}
