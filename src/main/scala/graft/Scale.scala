package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-growth measurement main: runs the heavy LIBRARY pipelines on the
  * FULL tables of two scale-factor directories in one session and prints a
  * JSON line with per-probe wall times, growth ratios, and a plan audit.
  *
  * Purpose: convert "designed for scale" into a measured number. For 10x
  * data a well-partitioned pipeline should grow near-linearly (the target
  * gate is growth <= ~15x for 10x rows — sort/shuffle adds a log factor and
  * the LSH/CC pipelines may add a round); a superlinear blowup (broadcast
  * flipping to nested-loop, candidate pairs exploding, a driver collect
  * growing with the data) shows up immediately as a far larger ratio.
  *
  * The probes call the library API directly on the full tables — NOT the
  * correctness gates, several of which bound their corpus by design (q89
  * caps at 500 vectors to demo the quadratic mega-bucket failure mode) and
  * so cannot exhibit growth.
  *
  * Plan audit: after execution, each probe's AQE final plan must not
  * contain BroadcastNestedLoopJoin or CartesianProduct — except probes that
  * declare the known-benign single-row moments broadcast (whitening's
  * standardize cross-joins one global stats row; a 1-row BNLJ broadcast is
  * the optimal plan at any scale).
  *
  * Usage: runMain graft.Scale [dirSmall dirLarge [probe ...]]
  * Defaults: /root/testdata/sf0.1 /root/repo/scaledata/sf1, all probes.
  */
object Scale {

  /** (name, allowSingleRowBnlj, query) */
  private def probes: Seq[(String, Boolean, (SparkSession, String) => DataFrame)] = Seq(
    // classic Catalyst baseline: pricing agg + orders join on the fact table
    ("tpch_agg_join", false, (s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("l_returnflag"), col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          avg(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("avg_rev"),
          count(lit(1)).as("n"))
    }),
    // MinHash+LSH near-dup pairs over ALL documents
    ("minhash_neardup_pairs", false, (s, d) =>
      graft.llm.Dedup.minHashNearDups(Tables.documents(s, d), threshold = 0.7)),
    // + transitive clustering (contraction CC / driver union-find fast path)
    ("neardup_clusters", false, (s, d) =>
      graft.llm.Dedup.nearDupClusters(Tables.documents(s, d), threshold = 0.7)),
    // SimHash near-dups over all documents
    ("simhash_neardups", false, (s, d) =>
      graft.llm.Dedup.simHashNearDups(Tables.documents(s, d))),
    // exact dedup keep-best over all documents
    ("exact_dedup_keepbest", false, (s, d) =>
      graft.llm.Dedup.exactDedupKeepBest(
        Tables.documents(s, d), pmod(col("doc_id"), lit(97)))),
    // embedding near-dup with whitening over ALL embeddings (single-row
    // moments broadcast -> benign 1-row BNLJ)
    ("embedding_neardup_whiten", true, (s, d) =>
      graft.llm.Dedup.embeddingNearDups(Tables.embeddings(s, d),
        threshold = 0.95, whiten = true)),
    // LSH ANN top-k: 100 broadcast queries against the full corpus
    ("ann_lsh_topk", false, (s, d) => {
      val corpus = Tables.embeddings(s, d)
      val queries = corpus.filter(pmod(col("vec_id"), lit(211)) === 0)
      graft.llm.Similarity.lshTopK(corpus, queries, k = 10)
    }),
    // PR/AP over the FULL annotations view with an id-derived prediction set
    ("pr_ap_full", false, (s, d) => {
      val ann = Tables.annotationsView(s, d)
      val preds = ann.select(
        (col("id") + lit(1000000000L)).as("id"), col("image_id"),
        col("category_id"), col("box_x_min"), col("box_y_min"),
        col("box_width"), col("box_height"),
        (pmod(col("id"), lit(1000)).cast("double") / 1000.0).as("confidence"))
        .filter(pmod(col("id"), lit(3)) =!= 0)
      val ev = new graft.eval.DetectionEvaluator(
        Tables.imagesView(s, d), ann, Map("m" -> preds), Tables.viewLabelMap)
      val (_, ap) = ev.precisionRecall("m", minIou = 0.5)
      ap
    }),
    // bucketized interval join: events x events within a +-5 min window
    ("interval_join_events", false, (s, d) => {
      val ev = Tables.events(s, d)
      val probesDf = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      graft.operators.IntervalJoin.intervalJoin(
        probesDf, ev.select(col("user_id"), col("ts").as("ts2"),
          col("ts"), col("value")),
        keys = Seq("user_id"), lowerUs = -300000000L, upperUs = 300000000L)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    }),
    // native session-window sessionization over all events
    ("sessionize_native", false, (s, d) =>
      graft.streaming.EventStream.sessionizeNative(Tables.events(s, d))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"))),
    // token-budget mixture over all documents (20 sources)
    ("token_mixture", false, (s, d) => {
      val docs = Tables.documents(s, d)
      val budgets = (0 until 20).map(i => s"src$i" -> 30000L).toMap
      graft.llm.Sampling.tokenBudgetMixture(docs, col("n_chars"), budgets)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
    }),
    // IVF ANN: seeded KMeans index + distributed probe (the centroid
    // cross-join is the intentional tiny-table BNLJ)
    ("ann_ivf_topk", true, (s, d) => {
      val corpus = Tables.embeddings(s, d)
      val idx = graft.llm.Ivf.build(corpus)
      val queries = corpus.filter(pmod(col("vec_id"), lit(211)) === 0)
      graft.llm.Ivf.topK(idx, queries, k = 10, nprobe = 2)
    }),
    // GPT-3-style decontamination via the SHUFFLE-join fallback (the path
    // for eval suites too big to broadcast) — self-contamination setup:
    // ~1% of the corpus re-planted as the test set, their train twins and
    // any shingle-overlapping docs must drop
    ("decontaminate_shuffle", false, (s, d) => {
      val docs = Tables.documents(s, d)
      val test = docs.filter(pmod(col("doc_id"), lit(101)) === 0)
        .select((col("doc_id") + 9000000L).as("doc_id"), col("text"))
      graft.llm.Corpus.decontaminate(docs, test, broadcastTest = false)
        .agg(count(lit(1)).as("n_clean"))
    }),
    // sequence packing: per-source running token stream → fixed blocks
    ("sequence_packing", false, (s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", col("n_chars"))
      graft.llm.Corpus.packSequences(docs, blockTokens = 4096)
        .groupBy(col("source"))
        .agg(countDistinct(col("pack_id")).as("n_packs"))
    }),
    // REAL Structured Streaming throughput: readStream over the events
    // parquet → watermarked daily window agg → memory sink (AvailableNow),
    // the q88 shape driven at both scale factors
    ("stream_window_agg", false, (s, d) => {
      val qn = s"scale_stream_${streamRuns.incrementAndGet()}"
      val q = graft.streaming.EventStream.runToMemory(s, d, qn)
      q.awaitTermination()
      s.table(qn)
    }))

  private val streamRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.length >= 2) Seq(args(0), args(1))
      else Seq("/root/testdata/sf0.1", "/root/repo/scaledata/sf1")
    val selected =
      if (args.length > 2) probes.filter(p => args.drop(2).contains(p._1))
      else probes
    require(selected.nonEmpty, "no probes selected")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup at the smallest SF: JIT + codegen, untimed
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) selected.foreach { case (_, _, q) =>
      try q(spark, warmDir).count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }

    case class Cell(sec: Double, rows: Long, planViolations: Seq[String])
    val grid: Map[(String, String), Cell] = (for {
      dir <- dirs
      (name, allowBnlj, q) <- selected
    } yield {
      spark.catalog.clearCache()
      // the timer covers the BUILDER too: some probes do eager work there
      // (IVF's KMeans fit, the streaming probe's AvailableNow run)
      val t0 = System.nanoTime()
      val (df, rows) = try {
        val d0 = q(spark, dir)
        (Some(d0), d0.count())
      } catch {
        case e: Throwable =>
          System.err.println(s"[scale] FAILED probe=$name dir=$dir: $e")
          (None, -1L)
      }
      val sec = if (rows >= 0) (System.nanoTime() - t0) / 1e9 else -1.0
      val plan = df.map { d =>
        try d.queryExecution.executedPlan.toString catch {
          case _: Throwable => ""
        }
      }.getOrElse("")
      val banned =
        (if (allowBnlj) Seq.empty else Seq("BroadcastNestedLoopJoin")) :+
          "CartesianProduct"
      (name, dir) -> Cell(sec, rows, banned.filter(plan.contains))
    }).toMap

    def fmt(d: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    val (small, large) = (dirs.head, dirs.last)
    val entries = selected.map { case (n, _, _) =>
      val a = grid((n, small)); val b = grid((n, large))
      val ratio = if (a.sec > 0 && b.sec > 0) b.sec / a.sec else -1.0
      val viol = (a.planViolations ++ b.planViolations).distinct
      s""""$n":{"small_sec":${fmt(a.sec)},"large_sec":${fmt(b.sec)},""" +
        s""""small_rows":${a.rows},"large_rows":${b.rows},"growth":${fmt(ratio)},""" +
        s""""plan_violations":[${viol.map("\"" + _ + "\"").mkString(",")}]}"""
    }
    val totalSmall = selected.map(p => grid((p._1, small)).sec).filter(_ > 0).sum
    val totalLarge = selected.map(p => grid((p._1, large)).sec).filter(_ > 0).sum
    val anyViol = grid.values.exists(_.planViolations.nonEmpty)
    println(s"""{"metric":"scale_growth","small_dir":"$small","large_dir":"$large",""" +
      s""""total_small_sec":${fmt(totalSmall)},"total_large_sec":${fmt(totalLarge)},""" +
      s""""total_growth":${fmt(if (totalSmall > 0) totalLarge / totalSmall else -1.0)},""" +
      s""""plan_clean":${!anyViol},"probes":{${entries.mkString(",")}}}""")
    spark.stop()
  }
}
