package graft

import graft.llm.Corpus
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkFunSuite {
  import spark.implicits._

  test("tfIdf matches the smoothed-idf closed form on a known corpus") {
    val docs = Seq(
      (1L, "a a b"),
      (2L, "a c"),
      (3L, "c c c")
    ).toDF("doc_id", "text")
    val scores = Corpus.tfIdf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // N=3; df(a)=2, df(b)=1, df(c)=2
    def idf(df: Int) = math.log(4.0 / (df + 1)) + 1.0
    assert(scores((1L, "a"))._1 == 2L)
    assert(math.abs(scores((1L, "a"))._2 - 2 * idf(2)) < 1e-12)
    assert(math.abs(scores((1L, "b"))._2 - 1 * idf(1)) < 1e-12)
    assert(math.abs(scores((3L, "c"))._2 - 3 * idf(2)) < 1e-12)
  }

  test("tfIdfTopTerms ranks by rounded score with term tiebreak") {
    val docs = Seq((1L, "x x y z")).toDF("doc_id", "text")
    // df is 1 for every term so idf is constant: ranks are tf desc, term asc
    val top = Corpus.tfIdfTopTerms(docs, k = 2).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Int]("rank")))
    assert(top.toSeq.sortBy(_._2) == Seq(("x", 1), ("y", 2)))
  }

  test("packSequences assigns docs to the pack where they start") {
    val docs = Seq(
      ("s", 1L, 100L), ("s", 2L, 100L), ("s", 3L, 100L), // starts 0,100,200
      ("t", 4L, 300L) // its own shard
    ).toDF("source", "doc_id", "n_tokens")
    val packed = Corpus.packSequences(docs, blockTokens = 256)
      .select("doc_id", "pack_id", "stream_start").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(packed(1L) == ((0L, 0L)))
    assert(packed(2L) == ((0L, 100L)))
    assert(packed(3L) == ((0L, 200L))) // starts at 200 < 256 → pack 0
    assert(packed(4L) == ((0L, 0L)))
    val stats = Corpus.packStats(docs, blockTokens = 256)
      .filter(col("source") === "s").collect()
    assert(stats.length == 1 && stats.head.getAs[Long]("n_tokens") == 300L)
    assert(math.abs(stats.head.getAs[Double]("fill") - 300.0 / 256) < 1e-12)
  }

  test("packSequences: distributed prefix sum ≡ the single-window formulation") {
    // EQUIVALENCE LOCK for the round-10 rewrite: the range-partition +
    // boundary-offset machinery must produce bit-identical (stream_start,
    // pack_id) to the per-group Window cumsum it replaced — asserted on a
    // mega-group corpus (one source owns 85% of 3000 docs, so it SPANS
    // partitions and the driver-chained offsets are load-bearing, not
    // zero) arriving in scrambled partition order.
    val docs = spark.range(0, 3000).select(
        col("id").as("doc_id"),
        when(pmod(col("id"), lit(20)) < 17, lit("mega"))
          .otherwise(concat(lit("s"), pmod(col("id"), lit(3)).cast("string")))
          .as("source"),
        (pmod(col("id") * 37 + 11, lit(97)) + 1).as("n_tokens"))
      .repartition(13, pmod(col("doc_id"), lit(7))) // scrambled placement
    val got = Corpus.packSequences(docs, blockTokens = 256)
      .select("doc_id", "source", "n_tokens", "stream_start", "pack_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    val want = docs.withColumn("stream_end", sum(col("n_tokens")).over(w))
      .withColumn("stream_start", col("stream_end") - col("n_tokens"))
      .withColumn("pack_id", floor(col("stream_start") / 256))
      .select("doc_id", "source", "n_tokens", "stream_start", "pack_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == want)
    // sanity: the mega group actually spanned several packs (offsets used)
    assert(got.filter(_._2 == "mega").map(_._5).distinct.size > 5)
    spark.catalog.clearCache()
  }

  test("packSequences: empty input and a single giant group") {
    val empty = Seq.empty[(String, Long, Long)]
      .toDF("source", "doc_id", "n_tokens")
    assert(Corpus.packSequences(empty, blockTokens = 64).count() == 0)
    // ONE group only: every partition's min=max group, the offset chain
    // walks the full partition sequence
    val one = spark.range(0, 500).select(col("id").as("doc_id"),
      lit("only").as("source"), lit(10L).as("n_tokens"))
    val packed = Corpus.packSequences(one, blockTokens = 100)
      .select("doc_id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 500L).foreach { i =>
      assert(packed(i) == i * 10 / 100, s"doc $i pack ${packed(i)}")
    }
    spark.catalog.clearCache()
  }

  test("contaminationPairs counts shared distinct shingles and test share") {
    val train = Seq((10L, "a b c d e")).toDF("doc_id", "text") // shingles: abc bcd cde
    val test = Seq((1L, "a b c d x")).toDF("doc_id", "text")   // abc bcd cdx
    val rows = Corpus.contaminationPairs(train, test).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_shared") == 2L) // abc, bcd
    assert(math.abs(r.getAs[Double]("test_share") - 2.0 / 3) < 1e-12)
    // decontaminate drops the train doc at minShare <= 2/3, keeps above
    assert(Corpus.decontaminate(train, test, minShare = 0.5).count() == 0)
    assert(Corpus.decontaminate(train, test, minShare = 0.7).count() == 1)
  }

  test("topNgramsApprox equals the exact top-k when support is below the top-k floor") {
    val docs = (0L until 300L).map { i =>
      // skewed vocabulary: a few heavy bigrams + a long unique tail
      val head = if (i % 3 == 0) "alpha beta" else if (i % 3 == 1) "gamma delta" else "epsilon zeta"
      (i, s"$head unique${i}a unique${i}b unique${i}c")
    }.toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // k = 3: the equality guarantee requires the k-th count to sit above
    // the support floor (count > support·N). k = 5 would reach into the
    // count-1 tail BELOW the floor, where excluded tie-mates may
    // legitimately differ — that's the documented precondition, not a bug
    val exact = key(Corpus.topNgrams(docs, n = 2, k = 3))
    val approx = key(Corpus.topNgramsApprox(docs, n = 2, k = 3, support = 0.01))
    assert(exact == approx)
    assert(exact.map(_._1).toSet == Set("alpha beta", "gamma delta", "epsilon zeta"))
  }

  test("broadcastTest=false produces identical pairs through a shuffle join") {
    val train = (0L until 40L).map(i => (i, s"w$i w${i + 1} w${i + 2} w${i + 3} tail"))
      .toDF("doc_id", "text")
    val test = (0L until 10L).map(i => (i + 1000L, s"w${i * 4} w${i * 4 + 1} w${i * 4 + 2} x"))
      .toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("train_id"), r.getAs[Long]("test_id"),
        r.getAs[Long]("n_shared"), r.getAs[Double]("test_share"))
    val bcast = Corpus.contaminationPairs(train, test).collect().map(key).sortBy(t => (t._1, t._2))
    val shuf = Corpus.contaminationPairs(train, test, broadcastTest = false)
      .collect().map(key).sortBy(t => (t._1, t._2))
    assert(bcast.nonEmpty && bcast.toSeq == shuf.toSeq)
    assert(Corpus.decontaminate(train, test, minShare = 0.3, broadcastTest = false)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq ==
      Corpus.decontaminate(train, test, minShare = 0.3)
        .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq)
  }

  test("broadcastTest=false plan: shingle join is a shuffle join, not a forced broadcast") {
    val train = (0L until 40L).map(i => (i, s"w$i w${i + 1} w${i + 2} w${i + 3} tail"))
      .toDF("doc_id", "text")
    val test = (0L until 10L).map(i => (i + 1000L, s"w${i * 4} w${i * 4 + 1} w${i * 4 + 2} x"))
      .toDF("doc_id", "text")
    // Disable both AQE's runtime demotion-to-broadcast and the static
    // autoBroadcast threshold so the assert sees the STRATEGY the flag
    // picked, not what AQE would rewrite tiny test frames into.
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val thr = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Corpus.contaminationPairs(train, test, broadcastTest = false)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"broadcastTest=false still forces a broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"no shuffle join in fallback plan:\n$plan")
      val bplan = Corpus.contaminationPairs(train, test)
        .queryExecution.executedPlan.toString
      assert(bplan.contains("BroadcastHashJoin"),
        s"default no longer broadcasts the test side:\n$bplan")
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    }
  }
}

class CrossEntropySpec extends SparkFunSuite {
  import spark.implicits._

  test("crossEntropy matches hand-computed Laplace unigram likelihoods") {
    // reference: "a a b" → counts {a:2, b:1}, T=3, V=2 → denom 6
    // p(a)=(2+1)/6=.5  p(b)=(1+1)/6=1/3  p(OOV)=1/6
    val ref = Seq((1L, "a a b")).toDF("doc_id", "text")
    val refc = Corpus.unigramCounts(ref)
    assert(refc.as[(String, Long)].collect().toMap == Map("a" -> 2L, "b" -> 1L))
    val docs = Seq(
      (10L, "a b"),        // -(ln .5 + ln 1/3)/2
      (11L, "A  a"),       // case/space-normalized: -(2 ln .5)/2
      (12L, "zzz"),        // pure OOV: -ln 1/6
      (13L, " "),          // zero tokens → absent
      (14L, "a zzz")       // mixed: -(ln .5 + ln 1/6)/2
    ).toDF("doc_id", "text")
    val got = Corpus.crossEntropy(docs, refc)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("cross_entropy")))).toMap
    def ce(ps: Double*): Double = -ps.map(math.log).sum / ps.size
    assert(got.keySet == Set(10L, 11L, 12L, 14L))
    assert(got(10L)._1 == 2 && math.abs(got(10L)._2 - ce(0.5, 1.0 / 3)) < 1e-12)
    assert(math.abs(got(11L)._2 - ce(0.5, 0.5)) < 1e-12)
    assert(math.abs(got(12L)._2 - ce(1.0 / 6)) < 1e-12)
    assert(math.abs(got(14L)._2 - ce(0.5, 1.0 / 6)) < 1e-12)
    // the filtering direction the operator exists for: in-vocabulary text
    // scores LOWER (more fluent) than OOV garbage
    assert(got(11L)._2 < got(10L)._2 && got(10L)._2 < got(12L)._2)
  }

  test("naiveBayesLogOdds matches the hand-computed closed form") {
    // pos model: "a a b" → {a:2, b:1}, Tp=3, Vp=2, denom 6
    //   p_pos(a)=3/6  p_pos(b)=2/6  p_pos(OOV)=1/6
    // neg model: "c c"  → {c:2},    Tn=2, Vn=1, denom 4
    //   p_neg(c)=3/4   p_neg(OOV)=1/4
    // priors: 2 pos docs vs 1 neg doc → ln 2
    val pos = Seq((1L, "a a"), (2L, "b")).toDF("doc_id", "text")
    val neg = Seq((3L, "c c")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "a b"),   // ln2 + ln(.5/.25) + ln((1/3)/.25)  — pos-looking
      (11L, "c"),     // ln2 + ln((1/6)/(3/4))             — neg-looking
      (12L, "zzz"),   // ln2 + ln((1/6)/(1/4))             — OOV both sides
      (13L, " ")      // zero tokens → absent
    ).toDF("doc_id", "text")
    val got = Corpus.naiveBayesLogOdds(docs,
        Corpus.unigramCounts(pos), Corpus.unigramCounts(neg),
        nPosDocs = 2, nNegDocs = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("log_odds"),
          r.getAs[Int]("pred_pos")))).toMap
    val ln2 = math.log(2.0)
    def lr(p: Double, q: Double) = math.log(p) - math.log(q)
    assert(got.keySet == Set(10L, 11L, 12L))
    assert(got(10L)._1 == 2 &&
      math.abs(got(10L)._2 - (ln2 + lr(3.0 / 6, 1.0 / 4) + lr(2.0 / 6, 1.0 / 4))) < 1e-12)
    assert(math.abs(got(11L)._2 - (ln2 + lr(1.0 / 6, 3.0 / 4))) < 1e-12)
    assert(math.abs(got(12L)._2 - (ln2 + lr(1.0 / 6, 1.0 / 4))) < 1e-12)
    // decisions: pos text classifies pos, neg text neg
    assert(got(10L)._3 == 1 && got(11L)._3 == 0)
  }
}

class ChunkDocumentsSpec extends SparkFunSuite {
  import spark.implicits._

  test("chunkDocuments: exact boundaries, overlap, short docs, empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than a window
      (3L, ""),                                       // empty → no chunks
      (4L, "   ")                                     // whitespace → no chunks
    ).toDF("doc_id", "text")
    val got = Corpus.chunkDocuments(docs, chunkTokens = 4, overlapTokens = 2)
      .orderBy("doc_id", "chunk_index")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_index"),
        r.getAs[String]("chunk_text"), r.getAs[Int]("n_tokens")))
    // stride 2: 10 tokens → 1 + ceil((10-4)/2) = 4 chunks; last is full
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0, "w1 w2 w3 w4", 4),
      (1L, 1, "w3 w4 w5 w6", 4),
      (1L, 2, "w5 w6 w7 w8", 4),
      (1L, 3, "w7 w8 w9 w10", 4)))
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b c", 3)))
    assert(!got.exists(g => g._1 == 3L || g._1 == 4L))
    // a trailing partial chunk
    val tail = Corpus.chunkDocuments(Seq((9L, "a b c d e")).toDF("doc_id", "text"),
      chunkTokens = 4, overlapTokens = 2)
      .orderBy("chunk_index").collect()
      .map(r => (r.getAs[String]("chunk_text"), r.getAs[Int]("n_tokens")))
    assert(tail.toSeq == Seq(("a b c d", 4), ("c d e", 3)))
    // no overlap: clean partition of the stream
    val plain = Corpus.chunkDocuments(docs.filter(col("doc_id") === 1L),
      chunkTokens = 4).orderBy("chunk_index").collect()
      .map(_.getAs[String]("chunk_text"))
    assert(plain.toSeq == Seq("w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10"))
  }

  test("chunkDocuments is a pure map — no exchange in the plan") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Corpus.chunkDocuments(docs, 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking introduced a shuffle:\n$plan")
  }
}
