package graft

import graft.streaming.EventStream
import graft.operators.Grouper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class ReviewFixes2Spec extends SparkFunSuite {
  import spark.implicits._

  test("streaming sessionize keeps sessions open across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[EventStream.Event]
    val sessions = EventStream.sessionizeStream(
      source.toDS().withWatermark("ts", "0 seconds").as[EventStream.Event],
      gapMs = 30 * 60 * 1000L)
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_stream").start()
    try {
      def ev(id: Long, t: String, u: Long) =
        EventStream.Event(id, java.sql.Timestamp.valueOf(t), u, "e", 1.0)
      // batch 1: two events 5 min apart — session must stay OPEN
      source.addData(ev(0, "2024-01-01 00:00:00", 1), ev(1, "2024-01-01 00:05:00", 1))
      q.processAllAvailable()
      assert(spark.table("sess_stream").count() == 0, "session closed too early")
      // batch 2: a third event within the gap extends the same session
      source.addData(ev(2, "2024-01-01 00:20:00", 1))
      q.processAllAvailable()
      assert(spark.table("sess_stream").count() == 0)
      // batch 3: far-future event advances the watermark past the deadline →
      // the first session closes with ALL THREE events (not split per batch)
      source.addData(ev(3, "2024-01-01 03:00:00", 1))
      q.processAllAvailable()
      source.addData(ev(4, "2024-01-01 06:00:00", 1))
      q.processAllAvailable()
      val closed = spark.table("sess_stream").collect()
      assert(closed.nonEmpty, "no session closed after watermark advance")
      val first = closed.minBy(_.getAs[java.sql.Timestamp]("session_start").getTime)
      assert(first.getAs[Int]("n_events") == 3,
        s"session split across batches: ${closed.mkString(";")}")
    } finally q.stop()
  }

  test("histogram preserves null-group counts (null-safe join)") {
    val df = Seq((null.asInstanceOf[String], 1), ("a", 1), ("a", 2))
      .toDF("g", "v")
    val h = Grouper.histogram(df, Seq("g")).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(h(None) == 1L, "null group count lost")
    assert(h(Some("a")) == 2L)
  }

  test("grouped PR with a continuous group bins gt and FP rows compatibly") {
    val images = Seq((0L, 1000, 1000, "a.jpg")).toDF("id", "width", "height", "relative_path")
    // gt heights span 10..100; pred (FP) heights span 300..400 — with
    // per-table binning these would get disjoint labels
    val gt = Seq(
      (0L, 0L, 0, 0.0, 0.0, 10.0, 10.0),
      (1L, 0L, 0, 200.0, 200.0, 10.0, 100.0)
    ).toDF("id", "image_id", "category_id", "box_x_min", "box_y_min", "box_width", "box_height")
    val preds = Seq(
      (10L, 0L, 0, 0.0, 0.0, 10.0, 10.0, 0.9),    // TP on gt0
      (11L, 0L, 0, 500.0, 500.0, 10.0, 400.0, 0.8) // FP, tall box
    ).toDF("id", "image_id", "category_id", "box_x_min", "box_y_min", "box_width", "box_height", "confidence")
    val ev = new graft.eval.DetectionEvaluator(images, gt, Map("m" -> preds), Map(0 -> "x"))
    val (pr, _) = ev.precisionRecallGrouped("m",
      Seq(Grouper.ContinuousGroup("box_height", 2, labelType = Grouper.BinIndexLabel)),
      minIou = 0.5)
    // combined range 10..400, 2 bins → split at 205: gt0+pred10 bin 0,
    // gt1 bin 0, FP(400) bin 1 — FP lands in a REAL bin of the shared scale
    val bins = pr.select("box_height").distinct().collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).sorted
    assert(bins.toSeq == Seq(0, 1), s"bins were $bins")
  }

  test("splitter balances when a split starts with a missing bin (inf KL handling)") {
    // categories 0/1; pre-assign one atom of pure category 0 to 'valid' so
    // valid's hist lacks category 1 → KL inf; greedy must still fill it
    val images = spark.range(100).select(col("id"),
      lit(10).as("width"), lit(10).as("height"),
      concat(lit("i"), col("id")).as("relative_path"),
      when(col("id") === 0, "valid").otherwise(lit(null).cast("string")).as("split"))
    val ann = spark.range(400).select(col("id"),
      (col("id") % 100).as("image_id"),
      (col("id") % 2).cast("int").as("category_id"),
      lit(1.0).as("box_x_min"), lit(1.0).as("box_y_min"),
      lit(2.0).as("box_width"), lit(2.0).as("box_height"))
    val ds = graft.model.GraftDataset.create(images, ann, Map(0 -> "a", 1 -> "b"))
    val out = graft.split.Splitter.split(ds, seed = 5, Seq("train", "valid"), Seq(0.5, 0.5),
      keepBalanced = Seq(Grouper.CategoricalGroup("category_id")))
    val counts = out.annotations.groupBy("split", "category_id").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // valid must end up containing BOTH categories
    assert(counts.getOrElse(("valid", 1), 0L) > 0L, s"valid never got category 1: $counts")
  }

  test("bench reports -1 for failing queries (not a fast success)") {
    // direct check of the sentinel logic shape: a throwing thunk yields -1
    val t0 = System.nanoTime()
    val ok = try { throw new RuntimeException("boom"); } catch { case _: Throwable => false }
    val v = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    assert(v == -1.0)
  }
}
