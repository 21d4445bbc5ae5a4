package graft

import graft.llm.{Corpus, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantics of the corpus-profiling family: character-entropy signals,
  * temperature allocation, exact feature quantiles, and nearest-centroid
  * labeling. Gate oracles (q142–q145) lock the cross-engine arithmetic;
  * these lock the behaviors the operators promise. */
class ProfilerSpec extends SparkFunSuite {
  import spark.implicits._

  test("charSignals: entropy ranks spam < prose < uniform junk") {
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaaaaaa"),                       // 1 symbol
      (2L, "the quick brown fox jumps over the lazy dog"),    // prose
      (3L, "abcdefghijklmnopqrstuvwxyz0123456789+/==")        // base64-ish
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextAnalysis.charSignals(col("text")).as("cs"))
      .select(col("doc_id"), col("cs.*"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getDouble(3), r.getDouble(4))).toMap
    val (n1, d1, e1, m1) = out(1L)
    assert(n1 == 24 && d1 == 1 && e1 == 0.0 && m1 == 1.0)
    val (_, _, e2, m2) = out(2L)
    val (_, _, e3, _) = out(3L)
    assert(e1 < e2 && e2 < e3, s"entropy order violated: $e1 / $e2 / $e3")
    assert(m2 < 0.25) // spaces dominate prose but not pathologically
  }

  test("charSignals kernel matches a naive reference incl. astral chars") {
    // astral plane (surrogate pairs in UTF-16) must count as ONE codepoint
    val texts = Seq("", "  ", "héllo wörld", "漢字かな交じり文",
      "𝄞𝄞 g-clef twice", "a\nb\tc  d")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.charSignals(col("text")).as("cs"))
      .select(col("doc_id"), col("cs.*")).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getDouble(3), r.getDouble(4))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val cps = t.codePoints().toArray
      val n = cps.length.toLong
      val counts = cps.groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      val exp =
        if (n == 0) (0L, 0, 0.0, 0.0)
        else {
          var e = 0.0
          counts.foreach { case (_, k) =>
            val p = k / n.toDouble
            e -= p * (math.log(p) / math.log(2.0))
          }
          (n, counts.size, e, counts.map(_._2).max / n.toDouble)
        }
      assert(got(i.toLong) === exp, s"mismatch for <$t>")
    }
  }

  test("temperatureAllocation: shares normalize; overshoot is visible") {
    val perLang = Seq(("tiny", 100L), ("big", 1000000L))
      .toDF("lang", "n_tokens")
    val out = Sampling.temperatureAllocation(perLang, 1000000L, alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // sqrt flattening: tiny gets 10/1010 of the budget = ~9900 tokens
    // = 99 EPOCHS of its own 100 tokens — the overshoot UniMax caps
    assert(math.abs(out.values.map(_._1).sum - 1.0) < 1e-9)
    assert(out("tiny")._3 > 50.0, s"expected visible overshoot: ${out("tiny")}")
    assert(out("big")._3 < 1.0)
    // alpha = 1 degenerates to proportional: equal epochs everywhere
    val prop = Sampling.temperatureAllocation(perLang, 1000000L, alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(math.abs(prop("tiny") - prop("big")) < 1e-6)
  }

  test("featureQuantiles: exact path matches sorted-array interpolation") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 10.0)
    val df = vals.map(Tuple1(_)).toDF("x")
    val out = Corpus.featureQuantiles(df, Seq(("x", col("x"))),
        Seq(0.0, 0.25, 0.5, 0.6, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // index = p·(n−1), linear interpolation over the sorted values
    assert(out(0.0) == 1.0 && out(0.5) == 3.0 && out(1.0) == 10.0)
    assert(out(0.25) == 2.0)       // index 1.0 — exact hit
    assert(out(0.6) == 3.4)        // index 2.4 — 3 + 0.4·(4−3)
    // approx path: same monotone shape, no exactness contract
    val approx = Corpus.featureQuantiles(df, Seq(("x", col("x"))),
        Seq(0.0, 0.5, 1.0), exact = false)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(approx(0.0) <= approx(0.5) && approx(0.5) <= approx(1.0))
  }

  test("nearestCentroid: recovers planted clusters; pure-map plan") {
    // two well-separated clusters around orthogonal axes
    val rows = (0 until 40).map { i =>
      val label = i % 2
      val base = if (label == 0) Array(1f, 0f, 0.1f) else Array(0f, 1f, -0.1f)
      val v = base.zipWithIndex.map { case (x, j) =>
        x + 0.01f * ((i * 7 + j) % 5) }
      (i.toLong, label, v.toSeq)
    }.toDF("vec_id", "label", "embedding")
    val seeds = rows.filter(col("vec_id") < 10)
    val out = Similarity.nearestCentroid(rows, seeds)
    val got = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0 until 40).foreach { i =>
      assert(got(i.toLong) == i % 2, s"vector $i mislabeled")
    }
    // determinism: a second run labels identically
    assert(Similarity.nearestCentroid(rows, seeds).collect().map(
      r => r.getLong(0) -> r.getInt(1)).toMap === got)
    // scale shape: no exchange anywhere — labeling is a map over the scan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"nearestCentroid must be shuffle-free, got:\n$plan")
  }

  test("nearestCentroid: scores are invariant to the seed frame's row order") {
    // ROW ORDER of the seed frame must not matter: the centroid sum is
    // accumulated seed-id-ascending by an internal per-label sort, so a
    // shuffled/reversed/repartitioned seed frame yields bit-identical
    // float64 centroids — exact cosine equality, not just same labels.
    // (Float summation is order-sensitive; without the internal sort this
    // test fails on the last-ulp cosines.)
    val rows = (0 until 60).map { i =>
      val label = i % 3
      val base = label match {
        case 0 => Array(1f, 0.2f, 0f)
        case 1 => Array(0f, 1f, 0.3f)
        case _ => Array(0.3f, 0f, 1f)
      }
      val v = base.zipWithIndex.map { case (x, j) =>
        x + 0.013f * ((i * 11 + j * 3) % 7) }
      (i.toLong, label, v.toSeq)
    }.toDF("vec_id", "label", "embedding")
    val seeds = rows.filter(col("vec_id") < 21)
    def run(seedFrame: org.apache.spark.sql.DataFrame) =
      Similarity.nearestCentroid(rows, seedFrame, roundTo = 15)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val baseline = run(seeds)
    val reversed = run(seeds.orderBy(col("vec_id").desc))
    val shuffled = run(seeds
      .orderBy(md5(concat(col("vec_id").cast("string"), lit("perm"))))
      .repartition(7))
    assert(reversed === baseline,
      "reversed seed order changed nearestCentroid output")
    assert(shuffled === baseline,
      "shuffled+repartitioned seed frame changed nearestCentroid output")
  }
}
