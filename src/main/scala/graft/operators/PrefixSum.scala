package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed per-group running sum — the shared prefix-sum stage of
  * [[graft.llm.Corpus.packSequences]] and
  * [[graft.llm.Sampling.tokenBudgetMixture]] (and the same machinery
  * [[graft.llm.Corpus.vocabCoverage]] inlines for its global rank).
  *
  * A bare `sum(v).over(Window.partitionBy(group).orderBy(order))` funnels
  * each group's ENTIRE row stream into one sort task — correct, but fatal
  * when the group key is unbounded (one crawl source can own 80% of a
  * 100-TB corpus). This helper makes the cumsum distributed and EXACT:
  *
  *  1. range-partition + locally sort on (group, order…) — groups become
  *     contiguous runs, and only each partition's FIRST and LAST group can
  *     continue across a partition boundary;
  *  2. aggregate those ≤ 2P edge groups' per-partition value sums to the
  *     driver (P = shuffle partitions — bounded by the cluster, never the
  *     data), chain exclusive offsets per group in partition order;
  *  3. broadcast the ≤ P−1 non-zero offsets back onto a PARTITION-LOCAL
  *     window: running sum = group offset + local prefix.
  *
  * Exactness is boundary-invariant: offsets derive from the partitions'
  * actual contents, so the sampled range boundaries affect load balance
  * only, never values. Contracts: `groupCol` non-null; `orderCols` a
  * TOTAL order within each group (the same requirement the window
  * formulation has for a deterministic cumsum); `value` integral (sums
  * are exact longs). The range-partitioned frame is persisted (`storage`)
  * because the offset pass and the result plan must read ONE consistent
  * partition assignment; the cache is caller-owned — clear the catalog
  * after materializing, as gates do. */
object PrefixSum {

  /** `df` plus `sumCol` = the INCLUSIVE running sum of `value` within
    * `groupCol`, ordered by `orderCols`. Output columns = df's columns
    * (original order) :+ sumCol. */
  def groupedRunningSum(df: DataFrame, groupCol: String,
      orderCols: Seq[String], value: Column, sumCol: String,
      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(orderCols.nonEmpty, "orderCols required")
    val spark = df.sparkSession
    val sortCols: Seq[Column] = col(groupCol) +: orderCols.map(c => col(s"`$c`"))
    val parts = df
      .withColumn("__ps_v", value.cast("long"))
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__ps_pid", spark_partition_id())
      .persist(storage)
    // per-(partition, group) sums, restricted to each partition's edge
    // groups — the only groups range partitioning can split
    val gsums = parts.groupBy(col("__ps_pid"), col(groupCol))
      .agg(sum(col("__ps_v")).as("__ps_sum"))
    val edges = gsums.groupBy(col("__ps_pid"))
      .agg(min(col(groupCol)).as("__ps_g1"), max(col(groupCol)).as("__ps_g2"))
    val boundary = gsums.join(broadcast(edges), Seq("__ps_pid"))
      .filter(col(groupCol) === col("__ps_g1") || col(groupCol) === col("__ps_g2"))
      .select(col("__ps_pid"), col(groupCol), col("__ps_sum"))
      .collect() // ≤ 2P rows — the splitter's documented driver-sized pattern
      .sortBy(_.getInt(0))
    val acc = scala.collection.mutable.HashMap.empty[Any, Long]
    val offRows = boundary.flatMap { r =>
      val g = r.get(1)
      val v = if (r.isNullAt(2)) 0L else r.getLong(2)
      val off = acc.getOrElse(g, 0L)
      acc(g) = off + v
      if (off > 0L) Some(org.apache.spark.sql.Row(r.getInt(0), g, off)) else None
    }
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__ps_pid",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      gsums.schema(groupCol),
      org.apache.spark.sql.types.StructField("__ps_off",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val offsets = spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)
    val w = Window.partitionBy(col("__ps_pid"), col(groupCol))
      .orderBy(orderCols.map(c => col(s"`$c`")): _*)
    parts.join(broadcast(offsets), Seq("__ps_pid", groupCol), "left")
      .withColumn(sumCol,
        coalesce(col("__ps_off"), lit(0L)) + sum(col("__ps_v")).over(w))
      .select(df.columns.map(c => col(s"`$c`")).toSeq :+ col(s"`$sumCol`"): _*)
  }
}
