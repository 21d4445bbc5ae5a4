package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed per-group running sums — the shared prefix-sum stage of
  * [[graft.llm.Corpus.packSequences]], [[graft.llm.Corpus.vocabCoverage]]
  * and [[graft.llm.Sampling.tokenBudgetMixture]].
  *
  * A bare `sum(v).over(Window.partitionBy(group).orderBy(order))` funnels
  * each group's ENTIRE row stream into one sort task — correct, but fatal
  * when the group key is unbounded (one crawl source can own 80% of a
  * 100-TB corpus), and a window with NO partition key funnels the whole
  * frame. This helper makes the cumsum distributed and EXACT:
  *
  *  1. range-partition + locally sort on (group, order…) — groups become
  *     contiguous runs, and only each partition's FIRST and LAST group can
  *     continue across a partition boundary;
  *  2. aggregate those ≤ 2P edge groups' per-partition value sums to the
  *     driver (P = shuffle partitions — bounded by the cluster, never the
  *     data), chain exclusive offsets per group in partition order;
  *  3. broadcast the ≤ P−1 non-zero offset rows back onto a
  *     PARTITION-LOCAL window: running sum = group offset + local prefix.
  *
  * Exactness is boundary-invariant: offsets derive from the partitions'
  * actual contents, so the sampled range boundaries affect load balance
  * only, never values. Contracts: the group expression non-null;
  * `orderCols` a TOTAL order within each group (the same requirement the
  * window formulation has for a deterministic cumsum); values integral
  * (sums are exact longs; NEGATIVE values are fine — offsets are emitted
  * whenever non-zero, either sign).
  *
  * CACHE LIFECYCLE (round 11): the range-partitioned frame is persisted
  * only WITHIN this call — the offset pass and the result job must read
  * ONE consistent partition assignment (range sampling re-draws per
  * execution, so an unpersisted recompute could silently shift rows
  * across pids and desynchronize the collected offsets). The call then
  * EAGERLY materializes the result as a local checkpoint and unpersists
  * the intermediate before returning, so repeated calls in a long-lived
  * session no longer accumulate catalog-pinned cache blocks: the only
  * storage left behind is the checkpoint itself, which Spark's
  * ContextCleaner releases once the returned frame becomes unreachable
  * (no manual unpersist, no `spark.catalog.clearCache()` needed — spec:
  * CacheLifecycleSpec). Consequences of the checkpoint contract: the
  * result is computed at call time (this function already ran a job for
  * the offsets), re-use across actions is free, and lineage is cut — the
  * blocks live on executors, the standard local-checkpoint caveat. */
object PrefixSum {

  /** The executed physical plan of the most recent result materialization,
    * for plan-lock specs: the checkpoint cuts lineage, so the partition-
    * local window shape is no longer visible in downstream plans — specs
    * assert on this capture instead. Not part of the library contract. */
  @volatile private[graft] var lastInternalPlan: String = ""

  /** `df` plus one INCLUSIVE running sum per `(value, sumCol)` pair,
    * within `group` (pass `lit(0)` or any constant for a global prefix
    * sum), ordered by `orderCols` (arbitrary Column order — `desc` is
    * fine). Output columns = df's columns (original order) ++ sumCols. */
  def runningSums(df: DataFrame, group: Column, orderCols: Seq[Column],
      values: Seq[(Column, String)],
      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(orderCols.nonEmpty, "orderCols required")
    require(values.nonEmpty, "at least one (value, sumCol) pair required")
    val spark = df.sparkSession
    val nv = values.size
    val vCols = values.indices.map(i => s"__ps_v$i")
    val oCols = values.indices.map(i => s"__ps_o$i")
    val sortCols: Seq[Column] = col("__ps_g") +: orderCols
    val parts = values.zipWithIndex
      .foldLeft(df.withColumn("__ps_g", group)) { case (d, ((v, _), i)) =>
        d.withColumn(vCols(i), v.cast("long"))
      }
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__ps_pid", spark_partition_id())
      .persist(storage)
    try {
      // per-(partition, group) sums, restricted to each partition's edge
      // groups — the only groups range partitioning can split
      val gsums = parts.groupBy(col("__ps_pid"), col("__ps_g"))
        .agg(sum(col(vCols.head)).as("__ps_s0"),
          vCols.tail.zipWithIndex.map { case (c, i) =>
            sum(col(c)).as(s"__ps_s${i + 1}")
          }: _*)
      val edges = gsums.groupBy(col("__ps_pid"))
        .agg(min(col("__ps_g")).as("__ps_g1"), max(col("__ps_g")).as("__ps_g2"))
      val boundary = gsums.join(broadcast(edges), Seq("__ps_pid"))
        .filter(col("__ps_g") === col("__ps_g1") || col("__ps_g") === col("__ps_g2"))
        .select(col("__ps_pid") +: col("__ps_g") +:
          values.indices.map(i => col(s"__ps_s$i")): _*)
        .collect() // ≤ 2P rows — the splitter's documented driver-sized pattern
        .sortBy(_.getInt(0))
      val acc = scala.collection.mutable.HashMap.empty[Any, Array[Long]]
      val offRows = boundary.flatMap { r =>
        val g = r.get(1)
        val offs = acc.getOrElseUpdate(g, Array.fill(nv)(0L))
        val row = offs.clone()
        values.indices.foreach { i =>
          offs(i) += (if (r.isNullAt(2 + i)) 0L else r.getLong(2 + i))
        }
        // any NON-ZERO offset must ride — a negative cumulative offset
        // (legal: values may be negative) is just as load-bearing as a
        // positive one; only all-zero rows may fold into the coalesce(0)
        if (row.exists(_ != 0L))
          Some(org.apache.spark.sql.Row(Seq(r.getInt(0), g) ++ row: _*))
        else None
      }
      val offSchema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__ps_pid",
          org.apache.spark.sql.types.IntegerType, nullable = false) +:
        parts.schema("__ps_g").copy(name = "__ps_g") +:
        oCols.map(c => org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.LongType, nullable = false)))
      val offsets = spark.createDataFrame(
        java.util.Arrays.asList(offRows: _*), offSchema)
      val w = Window.partitionBy(col("__ps_pid"), col("__ps_g"))
        .orderBy(orderCols: _*)
      val summed = values.zipWithIndex.foldLeft(
        parts.join(broadcast(offsets), Seq("__ps_pid", "__ps_g"), "left")) {
        case (d, ((_, sumCol), i)) =>
          d.withColumn(sumCol,
            coalesce(col(oCols(i)), lit(0L)) + sum(col(vCols(i))).over(w))
      }
      val result = summed.select(df.columns.map(c => col(s"`$c`")).toSeq ++
        values.map { case (_, sumCol) => col(s"`$sumCol`") }: _*)
      // materialize-then-unpersist: the checkpoint pins the values computed
      // under THIS partition assignment (so later actions can never replay
      // the range sampling), after which the intermediate cache can go —
      // the finally below releases it even if the checkpoint job fails
      val out = result.localCheckpoint(true, storage)
      lastInternalPlan = result.queryExecution.executedPlan.toString
      out
    } finally parts.unpersist(blocking = false)
  }

  /** Single-sum convenience over [[runningSums]]: `df` plus `sumCol` = the
    * INCLUSIVE running sum of `value` within `groupCol`, ordered by
    * `orderCols` (ascending). Output columns = df's columns :+ sumCol. */
  def groupedRunningSum(df: DataFrame, groupCol: String,
      orderCols: Seq[String], value: Column, sumCol: String,
      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    runningSums(df, col(s"`$groupCol`"), orderCols.map(c => col(s"`$c`")),
      Seq(value -> sumCol), storage)
}
