package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the lakehouse layout trick for
  * multi-dimensional pruning: interleave the bits of two key columns and
  * lay the data out in z-value order, so parquet row-group/file min-max
  * stats become selective on BOTH dimensions at once (a plain sort is
  * selective on its leading column only). This is what engines run under
  * "OPTIMIZE ... ZORDER BY": at 100 TB it turns full scans with two-sided
  * predicates into reads of a few files.
  *
  * The key is a pure integer expression (shifts/masks, whole-stage
  * codegen, exactly reproducible in any engine with bit ops); the layout
  * step is `repartitionByRange(zkey) + sortWithinPartitions(zkey)` — one
  * range exchange, the same cost as any global sort, paid once at write
  * time and amortized over every pruned read after.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two NON-NEGATIVE integer
    * columns: result bit 2i is bit i of `a`, bit 2i+1 is bit i of `b`.
    * Values are masked to `bits` first (callers bucket or clamp wider
    * domains — interleaving cares about locality, not magnitude).
    * `bits` ≤ 31 keeps the result in a positive long. */
  def zOrderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val am = a.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val bm = b.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Write `df` clustered by the z-order of (`colA`, `colB`) into
    * `partitions` range partitions of parquet — each output file covers a
    * compact z-range, i.e. a small rectangle in (A, B) space, so min/max
    * stats prune on both columns. */
  def zOrderWrite(df: DataFrame, path: String, colA: String, colB: String,
      bits: Int = 16, partitions: Int = 0): Unit = {
    val keyed = df.withColumn("__z", zOrderKey(col(colA), col(colB), bits))
    val ranged =
      if (partitions > 0) keyed.repartitionByRange(partitions, col("__z"))
      else keyed.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions(col("__z")).drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
