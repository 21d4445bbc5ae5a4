package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One assembled evaluation result row entering the PR computation:
  * a groundtruth row (with the confidence of its matching prediction, or 0)
  * or an unmatched-prediction (FP) row. */
case class ResultRow(key: String, groundtruth: Boolean, iou: Double, confidence: Double)

/** One PR-curve point. */
case class PrPoint(key: String, precision: Double, recall: Double,
    confidence_threshold: Double, f1_score: Double)

/** PR-curve / AP computation — faithful re-implementation of the reference
  * kernel (lours/evaluation/detection/util.py:189-321): confidence-desc
  * sweep, distinct-confidence compression, endpoint padding, reverse
  * running-max precision, collinear-point dropping, optional 101-recall-bin
  * ffill reindex (pycocotools-compatible), right-Riemann AP.
  *
  * Shape: per evaluation group (category × user groups × model), the curve
  * is computed in a typed `flatMapGroups` kernel — one shuffle on the group
  * key. Groups are category-level: result sets are evaluation-sized (≪
  * training data), so per-group vectors fit comfortably; the operator
  * parallelizes across groups.
  */
object PrCurve {

  /** The kernel (util.py:189-299). `reindexBins` = recall bins (e.g. 101
    * points 0..1) or None for exact curve points. */
  private[eval] def prPoints(key: String, rows0: Iterator[ResultRow], minIou: Double,
      reindexBins: Option[Array[Double]]): Iterator[PrPoint] = {
    val rows = rows0.toArray.sortBy(r => -r.confidence)
    if (rows.isEmpty) return Iterator.empty
    val nTargets = rows.count(_.groundtruth)

    // distinct-confidence compression: keep last index of each distinct value
    val n = rows.length
    val keep = Array.tabulate(n)(i => i == n - 1 || rows(i + 1).confidence != rows(i).confidence)
    var tp = 0
    val tpAt = new Array[Int](n)
    for (i <- 0 until n) {
      if (rows(i).groundtruth && rows(i).iou > minIou) tp += 1
      tpAt(i) = tp
    }
    val idxs = (0 until n).filter(keep)
    val rawPrecision = idxs.map(i => tpAt(i).toDouble / (i + 1)).toArray
    val rawRecall = idxs.map(i =>
      if (nTargets > 0) tpAt(i).toDouble / nTargets else Double.NaN).toArray
    val rawConf = idxs.map(rows(_).confidence).toArray

    // endpoint padding (util.py:244-260)
    val precision = Array(1.0, rawPrecision.headOption.getOrElse(0.0)) ++
      rawPrecision ++ Array(0.0, 0.0)
    val recall = Array(0.0, 0.0) ++ rawRecall ++
      Array(rawRecall.lastOption.getOrElse(Double.NaN), 1.0)
    val conf = Array(1.0, 1.0) ++ rawConf ++ Array(0.0, 0.0)

    // precision made monotone non-increasing: reverse running max
    for (i <- precision.length - 2 to 0 by -1)
      precision(i) = math.max(precision(i), precision(i + 1))

    def f1(p: Double, r: Double): Double = 2 * p * r / (p + r + 1e-5)
    // fillna(0) for the no-target NaN recall case
    var pts = precision.indices.map { i =>
      val r = if (recall(i).isNaN) 0.0 else recall(i)
      PrPoint(key, precision(i), r, conf(i), f1(precision(i), r))
    }.toVector

    // drop collinear points: constant precision, then constant recall
    def dropConstant(v: Vector[PrPoint], f: PrPoint => Double): Vector[PrPoint] =
      v.zipWithIndex.filterNot { case (p, i) =>
        i > 0 && i < v.length - 1 &&
          f(v(i - 1)) == f(p) && f(p) == f(v(i + 1))
      }.map(_._1)
    pts = dropConstant(pts, _.precision)
    pts = dropConstant(pts, _.recall)

    reindexBins match {
      case None => pts.iterator
      case Some(bins) =>
        // set_index(recall), drop duplicated recall keep last, ffill-reindex
        val dedup = pts.zipWithIndex
          .filterNot { case (p, i) => pts.indexWhere(_.recall == p.recall, i + 1) >= 0 }
          .map(_._1)
        bins.iterator.map { b =>
          // last point with recall <= b (ffill on ascending recall index)
          val prev = dedup.reverseIterator.find(_.recall <= b)
          prev match {
            case Some(p) => PrPoint(key, p.precision, b, p.confidence_threshold, p.f1_score)
            case None => PrPoint(key, 0.0, b, 0.0, 0.0)
          }
        }
    }
  }

  /** 101 recall bins 0.00..1.00 (pycocotools / reference default). */
  val defaultBins: Array[Double] = (0 to 100).map(_ / 100.0).toArray

  /** Compute PR curves per group. `results` must carry `groundtruth`
    * (boolean), `iou`, `confidence` plus the group columns. The group key is
    * string-concatenated for the typed kernel and re-joined to the original
    * group columns afterwards (distinct group table is small). */
  def compute(results: DataFrame, groupCols: Seq[String], minIou: Double = 0.0,
      reindexBins: Option[Array[Double]] = Some(defaultBins)): DataFrame = {
    val spark = results.sparkSession
    import spark.implicits._
    val sep = "\u0001" // non-printable separator so distinct tuples never collapse
    // coalesce each value: concat_ws SKIPS nulls, which would collapse
    // (null, "a") and ("a", null) into the same key
    val keyCol = concat_ws(sep, groupCols.map(c =>
      coalesce(col(s"`$c`").cast("string"), lit("\u0000null"))): _*)
    val keyed = results.select(
      keyCol.as("key"),
      col("groundtruth").cast("boolean").as("groundtruth"),
      col("iou").cast("double").as("iou"),
      col("confidence").cast("double").as("confidence")).as[ResultRow]
    val curves = keyed.groupByKey(_.key)
      .flatMapGroups((k, it) => prPoints(k, it, minIou, reindexBins))
      .toDF()
    val groupTable = results.select(
      (groupCols.map(c => col(s"`$c`")) :+ keyCol.as("key")): _*).distinct()
    curves.join(broadcast(groupTable), Seq("key"))
      .drop("key")
      .withColumn("iou_threshold", lit(minIou))
  }

  /** Right-Riemann AP per group over a PR-curve frame
    * (compute_average_precision, util.py:302-321): sort by recall, sum
    * precision · Δrecall. Window implementation — ties contribute 0. */
  def averagePrecision(prCurve: DataFrame, groupCols: Seq[String]): DataFrame = {
    // pandas stable-sorts by recall keeping curve order among ties, where
    // precision is non-increasing — so the first row of a recall-tie group
    // (the one whose Δrecall is nonzero) is the highest-precision one.
    val w = Window.partitionBy(groupCols.map(c => col(s"`$c`")): _*)
      .orderBy(col("recall"), desc("precision"))
    val withDiff = prCurve.withColumn("__dr",
      col("recall") - coalesce(lag(col("recall"), 1).over(w), col("recall")))
    withDiff.groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(sum(col("precision") * col("__dr")).as("AP"))
  }
}
