package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Rabin–Karp rolling fingerprints of every `n`-word window in one pass —
  * the fused kernel behind [[graft.llm.Dedup.dupSpanStats]].
  *
  * The reference formulation fingerprints each window independently
  * (`md5(array_join(slice(words, i, n)))`): every token is re-hashed `n`
  * times, so the pass costs n × the token stream. This expression hashes
  * each WORD once (XXH64, seed 42 — the `xxhash64` kernel) and combines
  * word hashes into window fingerprints with a polynomial rolling hash
  * over the Mersenne prime p = 2⁶¹ − 1: window j+1 derives from window j
  * in O(1), so the whole row costs one pass regardless of `n`.
  *
  *   fp_j = Σ_{t=0}^{n-1} wh_{j+t} · B^{n-1-t}  (mod p),   B = 1e9+7
  *
  * Modular products use the 2⁶⁴ ≡ 8 (mod p) reduction on the 128-bit
  * product halves (`Math.multiplyHigh`) — branch-light, no BigInteger.
  *
  * Fingerprints are 61-bit, INTERNAL (never an output column), and the
  * operator only asks "does this fingerprint occur more than once":
  * random collisions appear at the birthday bound √p ≈ 1.5·10⁹ distinct
  * windows, and each collision can only nudge a coverage STATISTIC by one
  * window — the standard exact-substring-dedup tradeoff (Lee et al. 2022
  * ship 64-bit Rabin–Karp for the same reason). Anything needing
  * collision-free identity (exact dedup keys) stays on 128-bit md5.
  *
  * Null array / fewer than `n` words → null (callers filter `len >= n`).
  * Null ELEMENTS hash like `xxhash64`'s null child: the fold stays at the
  * seed, wh = 42 reduced mod p.
  */
object RollingHash {
  /** 2⁶¹ − 1 (Mersenne: 2⁶⁴ ≡ 8 mod p makes reduction shift-and-add). */
  final val P: Long = (1L << 61) - 1
  /** Polynomial base, coprime with and far from any power of 2. */
  final val B: Long = 1000000007L

  /** (a · b) mod P for a, b ∈ [0, P). 128-bit product via multiplyHigh,
    * reduced with 2⁶⁴ ≡ 8 and 2⁶¹ ≡ 1 (mod P). */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)     // < 2^58 for a, b < 2^61
    val lo = a * b                       // low 64 bits (unsigned)
    // X = hi·2^64 + lo ≡ hi·8 + (lo & P) + (lo >>> 61)  (mod P)
    var x = (hi << 3) + (lo & P) + (lo >>> 61)
    x = (x & P) + (x >>> 61)
    if (x >= P) x - P else x
  }

  /** Unsigned 64-bit value reduced mod P. */
  def reduce64(h: Long): Long = {
    var x = (h & P) + (h >>> 61)
    if (x >= P) x - P else x
  }

  /** All `len − n + 1` window fingerprints of `words`, or null when the
    * array has fewer than `n` elements. One pass: per-word XXH64, then an
    * O(1) roll per window. Static and JVM-typed so generated code calls
    * it directly (stays inside whole-stage codegen). */
  def windowFps(arr: ArrayData, n: Int): Array[Long] = {
    val len = arr.numElements()
    if (len < n) return null
    val wh = new Array[Long](len)
    var i = 0
    while (i < len) {
      wh(i) =
        if (arr.isNullAt(i)) reduce64(42L)
        else {
          val s = arr.getUTF8String(i)
          reduce64(XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes, 42L))
        }
      i += 1
    }
    // B^(n-1) mod P for the roll-off term
    var bTop = 1L
    var t = 0
    while (t < n - 1) { bTop = mulmod(bTop, B); t += 1 }
    val out = new Array[Long](len - n + 1)
    // first window: plain Horner fold
    var fp = 0L
    t = 0
    while (t < n) { fp = (mulmod(fp, B) + wh(t)) % P; t += 1 }
    out(0) = fp
    var j = 1
    while (j <= len - n) {
      // drop wh(j-1)·B^(n-1), shift, add wh(j+n-1)
      var x = fp - mulmod(wh(j - 1), bTop)
      if (x < 0) x += P
      fp = (mulmod(x, B) + wh(j + n - 1)) % P
      out(j) = fp
      j += 1
    }
    out
  }
}

/** `graft_rolling_window_fps(words, n)` → array<long>: the Rabin–Karp
  * window fingerprints of [[RollingHash.windowFps]] as a native
  * expression (codegen calls the static kernel — one virtual call per
  * row, no interpreted HOF re-evaluation). */
case class RollingWindowFps(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 2, s"window length must be >= 2, got $n")

  // rows with fewer than n words yield null even under a non-nullable child
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val fps = RollingHash.windowFps(v.asInstanceOf[ArrayData], n)
    if (fps == null) null else new GenericArrayData(fps)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Java-side reference to the Scala object: class RollingHash$, field MODULE$
    val rh = RollingHash.getClass.getName + ".MODULE$"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val fps = ctx.freshName("fps")
      s"""
         |long[] $fps = $rh.windowFps($a, $n);
         |if ($fps == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new $gad($fps); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RollingWindowFps =
    copy(child = newChild)

  override def prettyName: String = "graft_rolling_window_fps"
}
