package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing selection (Schleimer/Wilkerson/Aiken 2003) — the
  * one-pass kernel behind [[graft.llm.Dedup.winnowingFingerprints]].
  *
  * Bit-identical to the expression-tree formulation it replaces
  * (`transform(sequence(...), i => md5(array_join(slice(toks, i+1, k))))`
  * + per-window `array_min` over a `slice` + the reverse/array_position
  * rightmost-tie rule + `array_distinct`), which evaluated as INTERPRETED
  * higher-order functions: every token was re-hashed k times through
  * fresh slice/join allocations and every window re-scanned w hashes —
  * the dominant cost of the winnowing scale probe. Here each gram is
  * md5-hashed ONCE (same bytes: the window's tokens joined by a single
  * space, nulls skipped exactly like `array_join`), window minima come
  * from a monotonic deque (amortized O(1) per window; ties pop, so the
  * RIGHTMOST minimum survives — the paper's rule and the old
  * reverse/array_position convention), and consecutive duplicate
  * selections collapse exactly like `array_distinct` did (selected
  * positions are non-decreasing across windows, so first-occurrence
  * dedup ≡ last-pos check).
  *
  * The md5 hex STRINGS are load-bearing (window minima are their
  * lexicographic order, and the DuckDB oracle replays them), which is
  * why this stays md5 rather than the cheaper [[RollingHash]] — the
  * fusion removes the interpreter and allocation overhead, not the
  * hash.
  *
  * Null array / fewer than `k` tokens → null (callers filter first).
  * Output: array<struct<pos: long, fp: string>> in selection order. */
object WinnowingKernel {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".getBytes("US-ASCII")

  /** All selected (pos, fp) pairs of `tokens` winnowed at gram length `k`
    * and window `w`, or null when fewer than `k` tokens exist. Static and
    * JVM-typed so generated code calls it directly. */
  def select(arr: ArrayData, k: Int, w: Int): ArrayData = {
    val len = arr.numElements()
    val m = len - k + 1
    if (m <= 0) return null
    // token bytes, copied once (null tokens stay null and are skipped in
    // gram assembly, mirroring array_join's null handling)
    val tb = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) tb(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    // md5 hex of every gram — each token hashed once per gram it belongs
    // to via digest updates; no join-string allocation
    val md = md5Local.get()
    val fps = new Array[UTF8String](m)
    i = 0
    while (i < m) {
      md.reset()
      var first = true
      var t = i
      while (t < i + k) {
        if (tb(t) != null) {
          if (!first) md.update(' '.toByte)
          md.update(tb(t))
          first = false
        }
        t += 1
      }
      val dig = md.digest()
      val hex = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HEX((dig(b) >> 4) & 0xf)
        hex(2 * b + 1) = HEX(dig(b) & 0xf)
        b += 1
      }
      fps(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    // monotonic deque sliding minimum; >= pops make the rightmost of
    // equal minima win (the paper's tie rule)
    val nWin = math.max(m - w, 0) + 1
    val deque = new Array[Int](m)
    var (head, tail) = (0, 0) // [head, tail)
    val outPos = new Array[Long](nWin)
    val outFp = new Array[UTF8String](nWin)
    var nOut = 0
    var lastPos = -1
    var j = 0
    var win = 0
    while (win < nWin) {
      val rEnd = math.min(win + w - 1, m - 1)
      while (j <= rEnd) {
        while (tail > head && fps(deque(tail - 1)).compareTo(fps(j)) >= 0)
          tail -= 1
        deque(tail) = j
        tail += 1
        j += 1
      }
      while (deque(head) < win) head += 1
      val sel = deque(head)
      if (sel != lastPos) { // array_distinct ≡ last-pos (positions monotone)
        outPos(nOut) = sel.toLong
        outFp(nOut) = fps(sel)
        nOut += 1
        lastPos = sel
      }
      win += 1
    }
    val rows = new Array[Any](nOut)
    i = 0
    while (i < nOut) {
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(outPos(i), outFp(i))
      i += 1
    }
    new GenericArrayData(rows)
  }
}

/** `graft_winnowing_fps(tokens, k, w)` → array<struct<pos, fp>>: the
  * winnowing selection of [[WinnowingKernel.select]] as a native
  * expression (codegen calls the static kernel — one virtual call per
  * row, no interpreted HOF re-evaluation). */
case class WinnowingFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, s"gram length must be >= 1, got $k")
  require(w >= 1, s"window must be >= 1, got $w")

  // rows with fewer than k tokens yield null even under a non-null child
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", StringType, nullable = false))), containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WinnowingKernel.select(v.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kern = WinnowingKernel.getClass.getName + ".MODULE$"
    val ad = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val sel = ctx.freshName("sel")
      s"""
         |$ad $sel = $kern.select($a, $k, $w);
         |if ($sel == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $sel; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowingFps =
    copy(child = newChild)

  override def prettyName: String = "graft_winnowing_fps"
}
