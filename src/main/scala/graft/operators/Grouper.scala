package graft.operators

import graft.model.GraftDataset
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-spec resolution + histogram binning — reference grouper
  * (lours/utils/grouper.py:13-361; cut_group kernel :106-187).
  *
  * A group is either a plain (categorical) column or a `ContinuousGroup`:
  * a numeric column binned into `bins` buckets — equal-width (`cut`),
  * quantile (`qcut`), optionally in log space — with a label policy.
  * Bin edges are computed once (either arithmetic on min/max or
  * `approxQuantile`) and the assignment itself is a branch-free floor/
  * binary-search expression — no UDF, no shuffle beyond the stats pass.
  */
object Grouper {

  sealed trait LabelType
  case object IntervalLabel extends LabelType // "(lo, hi]"
  case object MidLabel extends LabelType      // (lo+hi)/2
  case object BinIndexLabel extends LabelType // 0..bins-1

  /** Group specification ADT (grouper.py:13-104). `root` marks a column
    * living on the images table, resolved via broadcast FK join. */
  sealed trait GroupSpec { def name: String }
  case class CategoricalGroup(name: String, root: Boolean = false) extends GroupSpec
  case class ContinuousGroup(name: String, bins: Int, qcut: Boolean = false,
      log: Boolean = false, labelType: LabelType = IntervalLabel,
      root: Boolean = false) extends GroupSpec

  /** Compute bin edges for a continuous group (cut_group,
    * grouper.py:106-187). Equal-width from (min,max) — optionally in log
    * space — or quantile edges (exact percentiles, one agg job). */
  def binEdges(df: DataFrame, g: ContinuousGroup): Array[Double] = {
    if (g.qcut) {
      // EXACT percentiles (pandas qcut semantics) — percentile_approx at
      // any accuracy can deviate on high-cardinality data and change bin
      // edges / IntervalLabel strings vs the reference
      val probs = (0 to g.bins).map(_.toDouble / g.bins)
      val row = df.select(
        percentile(col(g.name).cast("double"),
          array(probs.map(lit): _*)).as("q"))
        .collect()(0)
      row.getSeq[Double](0).toArray.distinct
    } else {
      val row = df.agg(min(col(g.name).cast("double")), max(col(g.name).cast("double"))).collect()(0)
      val (lo, hi) = (row.getDouble(0), row.getDouble(1))
      // pin the last edge to the exact max: the arithmetic form can land
      // one ulp BELOW hi, silently null-binning the maximum value
      if (g.log) {
        require(lo > 0, s"log binning needs positive values, min=$lo")
        val (l0, l1) = (math.log10(lo), math.log10(hi))
        val e = (0 to g.bins).map(i => math.pow(10, l0 + (l1 - l0) * i / g.bins)).toArray
        e(g.bins) = hi
        e
      } else {
        val e = (0 to g.bins).map(i => lo + (hi - lo) * i / g.bins).toArray
        e(g.bins) = hi
        e
      }
    }
  }

  /** Bin-index column for explicit edges: rightmost-inclusive like pandas
    * `cut` (values == lo of the first edge fall in bin 0; value > last edge
    * or < first edge → null). Branch-free `when` chain — codegen'd, and
    * cheap because `bins` is small by construction. */
  def binIndex(c: Column, edges: Array[Double]): Column = {
    // degenerate case: qcut on (near-)constant data collapses to one edge —
    // everything equal to it is bin 0
    if (edges.length < 2)
      return when(c.cast("double") === edges(0), 0).otherwise(lit(null).cast("int"))
    val n = edges.length - 1
    // (lo, hi] semantics except the first bin which includes its lo edge
    val first = when(c >= edges(0) && c <= edges(1), 0)
    (1 until n).foldLeft(first) { (acc, i) =>
      acc.when(c > edges(i) && c <= edges(i + 1), i)
    }.otherwise(lit(null).cast("int"))
  }

  /** Label column for a bin index per the group's label policy
    * (grouper.py:145-187). */
  def binLabel(idx: Column, edges: Array[Double], labelType: LabelType): Column =
    labelType match {
      case BinIndexLabel => idx
      case MidLabel =>
        val mids = edges.sliding(2).map(a => (a(0) + a(1)) / 2).toArray
        element_at(array(mids.map(lit).toSeq: _*), idx + 1)
      case IntervalLabel =>
        val labels = edges.sliding(2).map(a => s"(${a(0)}, ${a(1)}]").toArray
        element_at(array(labels.map(lit).toSeq: _*), idx + 1)
    }

  /** Resolve group specs against a dataset's annotations table, joining
    * root (image-level) columns through the FK with a broadcast join
    * (group_relational_data, grouper.py:188-361). Returns the annotations
    * frame extended with one `__group_<name>` column per spec.
    *
    * `sharedEdges` supplies pre-computed bin edges per continuous group —
    * REQUIRED when the same specs must label several tables compatibly
    * (e.g. groundtruth and predictions in an evaluator): edges computed
    * independently per table would yield disjoint bin labels. */
  def resolveGroups(ds: GraftDataset, specs: Seq[GroupSpec],
      sharedEdges: Map[String, Array[Double]] = Map.empty): DataFrame = {
    val rootCols = specs.filter(isRoot(specs, _)).map(_.name).distinct
    val base =
      if (rootCols.isEmpty) ds.annotations
      else {
        val im = GraftDataset.broadcastIfSmall(ds.images.select(
          (Seq(col("id").as("__gimg_id")) ++ rootCols.map(c => col(s"`$c`").as(s"__root_$c"))): _*))
        ds.annotations.join(im, col("image_id") === col("__gimg_id"), "left")
          .drop("__gimg_id")
      }
    specs.foldLeft(base) { (df, g) =>
      val src = if (isRoot(specs, g) ) col(s"`__root_${g.name}`") else col(s"`${g.name}`")
      g match {
        case CategoricalGroup(n, _) => df.withColumn(s"__group_$n", src)
        case cg @ ContinuousGroup(n, _, _, _, labelType, _) =>
          val edges = sharedEdges.getOrElse(n,
            binEdges(df.select(src.as(n)), cg.copy(root = false)))
          val idx = binIndex(src.cast("double"), edges)
          df.withColumn(s"__group_$n", binLabel(idx, edges, labelType))
      }
    }
  }

  private def isRoot(specs: Seq[GroupSpec], g: GroupSpec): Boolean = g match {
    case CategoricalGroup(_, r) => r
    case ContinuousGroup(_, _, _, _, _, r) => r
  }

  /** N-dimensional dense histogram: groupBy(keys).count() densified to the
    * full cross product with 0-fill (df_to_hist,
    * split/balanced_groups.py:286-317). Only used where the result is
    * driver-sized (splitter cost inputs). */
  def histogram(df: DataFrame, keys: Seq[String]): DataFrame = {
    // rename the counts-side keys: both join inputs derive from `df`, and
    // same-lineage `full(k) <=> counts(k)` conditions trip Spark's
    // "trivially true equals predicate" disambiguation (it resolves
    // correctly today but is one refactor from a silent cross join)
    // "__hist_count" rather than "count": a caller-supplied key column
    // named "count" would otherwise make the post-join reference ambiguous
    val counts = df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("__hist_count"))
      .select(keys.map(k => col(s"`$k`").as(s"__c_$k")) :+ col("__hist_count"): _*)
    val full = keys.map(k => df.select(col(s"`$k`")).distinct())
      .reduce((a, b) => a.crossJoin(b))
    // null-SAFE join keys: a plain equality join would never match the
    // null group (e.g. unassigned split) and silently zero its count
    val cond = keys.map(k => col(s"`$k`") <=> col(s"`__c_$k`")).reduce(_ && _)
    full.join(counts, cond, "left")
      .select((keys.map(k => col(s"`$k`")) :+
        coalesce(col("__hist_count"), lit(0L)).as("count")): _*)
  }
}

/** Statistical bin labels — the reference's mean/median label policies
  * (cut_group label_type, grouper.py:181-186): per-bin mean or exact-median
  * of the binned column, joined back onto the bin index. One grouped agg +
  * a broadcast join (bin count is tiny). */
object GrouperStats {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  def withStatLabel(df: DataFrame, valueCol: String, binCol: String,
      useMedian: Boolean = false, labelName: String = "bin_label"): DataFrame = {
    val agg =
      if (useMedian) percentile(col(s"`$valueCol`").cast("double"), lit(0.5))
      else avg(col(s"`$valueCol`").cast("double"))
    val labels = df.groupBy(col(s"`$binCol`").as("__bin"))
      .agg(agg.as(labelName))
    df.join(broadcast(labels), df(s"`$binCol`") === col("__bin"), "left")
      .drop("__bin")
  }
}
