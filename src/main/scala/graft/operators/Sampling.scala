package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators.
  *
  * Two strategies with opposite scale/verifiability trade-offs:
  *  - [[hashSample]] is the 100 TB path: a pure map-side filter on
  *    `xxhash64(id, seed)` — no shuffle, no window, partition-invariant,
  *    stable under re-runs and repartitioning. Fractions are approximate
  *    (binomial concentration: ±0.01% at a billion rows).
  *  - [[systematicSample]] takes EXACTLY every k-th row per stratum in a
  *    total order — exact per-stratum counts, reproducible in any engine,
  *    but costs one shuffle on the strata key and serializes each stratum
  *    through a window. Use for small/medium strata (class-balanced eval
  *    sets); at corpus scale prefer [[hashSample]] per stratum.
  */
object Sampling {

  /** Keep a row iff `xxhash64(id, seed) mod 1e6 < fraction · 1e6`.
    * Deterministic in the id alone — adding/removing OTHER rows never flips
    * a row's membership (the property that makes incremental re-runs and
    * train/test splits stable as the corpus grows). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    df.filter(pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L))
      < (fraction * 1e6).toLong)
  }

  /** Every k-th row (1st, k+1th, …) of each stratum, ordered by `orderCol`
    * — classic systematic sampling, exact and engine-portable. */
  def systematicSample(df: DataFrame, strataCols: Seq[String], k: Int,
      orderCol: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(strataCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter((col("__rn") - 1) % k === 0)
      .drop("__rn")
  }

  /** Per-stratum sample-size report: stratum, total rows, sampled rows. */
  def sampleReport(df: DataFrame, sampled: DataFrame,
      strataCols: Seq[String]): DataFrame = {
    val tot = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_total"))
    val smp = sampled.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_sampled"))
    tot.join(smp, strataCols, "left")
      .na.fill(0L, Seq("n_sampled"))
  }
}
