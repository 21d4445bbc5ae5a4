package graft

import graft.operators.{Grouper, GrouperStats}
import graft.operators.Grouper._
import org.apache.spark.sql.functions._

/** Pandas-golden parity for the continuous-grouper label policies
  * (reference cut_group, lours/utils/grouper.py:106-187 — the grouper has
  * no literal doctests, so the goldens below were computed by running
  * pandas 2.x `cut`/`qcut`/groupby on the same 12-value series and baking
  * the printed outputs in as constants).
  *
  * What is locked: bin MEMBERSHIP for cut / qcut / log-cut (pandas codes),
  * interval mid labels, and the mean / median stat-label policies
  * (grouper.py:181-186). One documented convention difference: pandas
  * `cut` widens the FIRST interval's left edge by 0.1% of the range so the
  * minimum is included ("(0.991, 3.25]" for data starting at 1.0); this
  * engine instead keeps the exact min edge and makes bin 0 lo-inclusive —
  * identical membership for every value, but bin 0's printed lo / mid
  * differ from pandas by that 0.1% fudge. Asserted accordingly: membership
  * everywhere, mids exactly for bins 1.., bin 0's mid against the exact
  * (lo+hi)/2.
  */
class GrouperPandasParitySpec extends SparkFunSuite {
  import spark.implicits._

  // the pandas input: pd.Series([1, 2, 3, 4.5, 5, 7.5, 8, 9, 10, 2.5, 6, 4])
  private val values = Seq(1.0, 2.0, 3.0, 4.5, 5.0, 7.5, 8.0, 9.0, 10.0, 2.5, 6.0, 4.0)
  private def df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    .toDF("id", "v")

  private def codes(g: ContinuousGroup): Seq[Int] = {
    val edges = Grouper.binEdges(df, g)
    df.select(col("id"), Grouper.binIndex(col("v"), edges).as("c"))
      .orderBy("id").as[(Long, Int)].collect().map(_._2).toSeq
  }

  test("cut(4): membership matches pandas codes") {
    // pd.cut(vals, 4).cat.codes
    assert(codes(ContinuousGroup("v", 4)) ===
      Seq(0, 0, 0, 1, 1, 2, 3, 3, 3, 0, 2, 1))
  }

  test("cut(4): mid labels match pandas interval mids (bins 1..), bin 0 = exact (lo+hi)/2") {
    val edges = Grouper.binEdges(df, ContinuousGroup("v", 4))
    val mids = edges.sliding(2).map(a => (a(0) + a(1)) / 2).toSeq
    // pandas: [2.1205, 4.375, 6.625, 8.875] — bin 0 differs only by the
    // 0.1% left-edge fudge (2.1205 vs exact 2.125)
    assert(mids(1) === 4.375 && mids(2) === 6.625 && mids(3) === 8.875)
    assert(mids(0) === 2.125)
    val labeled = df.select(
      Grouper.binLabel(Grouper.binIndex(col("v"), edges), edges, MidLabel).as("m"))
      .distinct().as[Double].collect().sorted.toSeq
    assert(labeled === Seq(2.125, 4.375, 6.625, 8.875))
  }

  test("qcut(4): quartile edges and membership match pandas qcut") {
    // pd.qcut(vals, 4): ['(0.999, 2.875]', '(2.875, 4.75]', '(4.75, 7.625]',
    // '(7.625, 10.0]'] — exact linear-interpolation percentiles, which
    // Spark's `percentile` reproduces bit-for-bit
    val edges = Grouper.binEdges(df, ContinuousGroup("v", 4, qcut = true))
    assert(edges.toSeq === Seq(1.0, 2.875, 4.75, 7.625, 10.0))
    assert(codes(ContinuousGroup("v", 4, qcut = true)) ===
      Seq(0, 0, 1, 1, 2, 2, 3, 3, 3, 0, 2, 1))
  }

  test("log cut(3): membership matches pandas cut on log-space values") {
    // pd.cut(np.log(vals), 3).cat.codes — log-space equal width == the
    // engine's log10 linspace edges (base cancels in the linspace)
    assert(codes(ContinuousGroup("v", 3, log = true)) ===
      Seq(0, 0, 1, 1, 2, 2, 2, 2, 2, 1, 2, 1))
  }

  test("mean / median stat labels match pandas groupby(cut) mean / median") {
    val edges = Grouper.binEdges(df, ContinuousGroup("v", 4))
    val binned = df.withColumn("bin", Grouper.binIndex(col("v"), edges))
    val means = GrouperStats.withStatLabel(binned, "v", "bin")
      .select("bin", "bin_label").distinct()
      .orderBy("bin").as[(Int, Double)].collect().map(_._2).toSeq
    // vals.groupby(pd.cut(vals, 4), observed=False).mean()
    assert(means === Seq(2.125, 4.5, 6.75, 9.0))
    val medians = GrouperStats.withStatLabel(binned, "v", "bin", useMedian = true)
      .select("bin", "bin_label").distinct()
      .orderBy("bin").as[(Int, Double)].collect().map(_._2).toSeq
    // vals.groupby(pd.cut(vals, 4), observed=False).median()
    assert(medians === Seq(2.25, 4.5, 6.75, 9.0))
  }
}
