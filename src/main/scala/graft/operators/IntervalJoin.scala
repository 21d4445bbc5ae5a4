package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed event-time interval join (the Flink interval-join shape): for
  * each left row, all right rows with the same key whose timestamp falls in
  * `[left.ts + lowerUs, left.ts + upperUs)` (microsecond precision — the
  * native resolution of Spark timestamps, so the range predicate is exact).
  *
  * Spark has no native range join; the naive formulation
  * `l.key = r.key AND r.ts BETWEEN …` executes the range predicate as a
  * post-filter on the key join — fine for many small keys, catastrophic for
  * a hot key (one task re-scans that key's full history per row). This
  * implementation buckets time into `span = upperUs − lowerUs` windows: the
  * left side EXPLODES to the (at most 2) buckets its window overlaps, the
  * right side maps to its single bucket, and the join is a plain equality
  * hash join on `(key, bucket)` followed by the exact range filter. Each
  * left row meets only ~one window's worth of right rows regardless of key
  * skew, and no right row can match the same left row from two buckets
  * (its bucket is unique), so no dedup pass is needed.
  */
object IntervalJoin {

  /** Exact floor division for (possibly negative) long expressions:
    * `(x − pmod(x, d)) / d` — every intermediate is an exact integer
    * (magnitudes ≤ a μs epoch ≈ 1.7e15 ≪ 2^53), so no double-rounding can
    * misplace a value sitting on a bucket boundary. */
  private def floorDiv(x: Column, d: Long): Column =
    ((x - pmod(x, lit(d))) / d).cast("long")

  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      lowerUs: Long, upperUs: Long, tsCol: String = "ts"): DataFrame = {
    require(upperUs > lowerUs, s"empty interval [$lowerUs, $upperUs)")
    val span = upperUs - lowerUs
    val lus = unix_micros(col(tsCol))
    // window start bucket and end bucket (end is exclusive → subtract 1μs)
    val b0 = floorDiv(lus + lowerUs, span)
    val b1 = floorDiv(lus + upperUs - 1, span)
    val l = left
      .withColumn("__lus", lus)
      .withColumn("__bk", explode(array_distinct(array(b0, b1))))
    val rCols = right.columns.filterNot(keys.contains)
      .map(c => col(c).as(s"r_$c"))
    val r = right
      .select(keys.map(col) ++ rCols: _*)
      .withColumn("__rus", unix_micros(col(s"r_$tsCol")))
      .withColumn("__bk", floorDiv(col("__rus"), span))
    l.join(r, keys :+ "__bk")
      .filter(col("__rus") >= col("__lus") + lowerUs &&
        col("__rus") < col("__lus") + upperUs)
      .drop("__bk", "__lus", "__rus")
  }

  /** Per-left-row aggregate over the interval: count and value-sum of the
    * same-key right rows in `[ts + lowerUs, ts + upperUs)`. Left rows with
    * an empty window are kept with zero counts (left-outer semantics). */
  def intervalCount(left: DataFrame, right: DataFrame, keys: Seq[String],
      lowerUs: Long, upperUs: Long, leftIdCol: String,
      valueCol: String, tsCol: String = "ts"): DataFrame = {
    val matched = intervalJoin(left, right, keys, lowerUs, upperUs, tsCol)
      .groupBy(col(leftIdCol))
      .agg(count(lit(1)).as("n_in_range"),
        sum(col(s"r_$valueCol")).as("sum_in_range"))
    left.select(col(leftIdCol))
      .join(matched, Seq(leftIdCol), "left")
      .na.fill(0L, Seq("n_in_range"))
      .na.fill(0.0, Seq("sum_in_range"))
  }
}
