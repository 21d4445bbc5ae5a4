package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions._

class DupSpanSpec extends SparkFunSuite {
  import spark.implicits._

  test("dupSpanStats covers exactly the duplicated windows' token ranges") {
    // docs 0/1 share tokens 0..4 ("a b c d e") → with n=3, windows at
    // positions 0,1,2 are shared → tokens 0..4 covered in both; doc 0's
    // tail "x y z" and doc 1's tail "p q r" stay uncovered.
    val docs = Seq(
      (0L, "a b c d e x y z"),
      (1L, "a b c d e p q r"),
      (2L, "totally unrelated words here") // 4 tokens, has windows, none dup
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(docs, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("covered_tokens"),
          r.getAs[Double]("coverage")))).toMap
    assert(out(0L) == ((8L, 5L, 5.0 / 8)))
    assert(out(1L) == ((8L, 5L, 5.0 / 8)))
    assert(out(2L) == ((4L, 0L, 0.0)))
  }

  test("a window repeated INSIDE one document counts as duplicated") {
    val docs = Seq((0L, "u v w x u v w y")).toDF("doc_id", "text")
    // n=3: "u v w" at 0 and 4 → covered 0,1,2 and 4,5,6 → 6 of 8
    val r = Dedup.dupSpanStats(docs, n = 3).collect().head
    assert(r.getAs[Long]("covered_tokens") == 6L)
  }

  test("documents shorter than n have zero windows and zero coverage") {
    val docs = Seq((0L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    val rows = Dedup.dupSpanStats(docs, n = 3).collect()
    assert(rows.forall(_.getAs[Long]("covered_tokens") == 0L))
    assert(rows.forall(_.getAs[Double]("coverage") == 0.0))
  }

  test("removeDupSpanDocs drops docs at or above the coverage threshold") {
    val docs = Seq(
      (0L, "a b c d e f"),        // full dup of 1 → coverage 1.0
      (1L, "a b c d e f"),
      (2L, "a b c q r s")         // shares only window "a b c" → 3/6 = 0.5
    ).toDF("doc_id", "text")
    val kept = Dedup.removeDupSpanDocs(docs, n = 3, maxCoverage = 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
    val keptAll = Dedup.removeDupSpanDocs(docs, n = 3, maxCoverage = 0.4)
    assert(keptAll.count() == 0)
  }

  test("cutDuplicatedSpans excises the shared span and keeps the rest") {
    // docs 0/1 share "a b c d e" (n=3 → tokens 0..4 covered in both);
    // each keeps only its unique tail, original case preserved
    val docs = Seq(
      (0L, "a b c d e X y z"),
      (1L, "a b c d e P q r"),
      (2L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val out = Dedup.cutDuplicatedSpans(docs, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out == Map(0L -> "X y z", 1L -> "P q r",
      2L -> "totally unrelated words here"))
  }

  test("cutDuplicatedSpans: untouched docs keep text byte-identical") {
    val weird = "  Solo\t\tdoc   with ODD   spacing "
    val docs = Seq((0L, weird), (1L, "another unshared document entirely"))
      .toDF("doc_id", "text")
    val out = Dedup.cutDuplicatedSpans(docs, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out(0L) == weird) // no duplicated window → no normalization
  }

  test("cutDuplicatedSpans: full copies empty out; dropEmptied keeps or drops") {
    val docs = Seq(
      (0L, "c1 c2 c3 c4"),
      (1L, "c1 c2 c3 c4"),
      (2L, "some other standalone words")
    ).toDF("doc_id", "text")
    val dropped = Dedup.cutDuplicatedSpans(docs, n = 3)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(dropped == Set(2L))
    val kept = Dedup.cutDuplicatedSpans(docs, n = 3, dropEmptied = false)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    assert(kept(0L) == "" && kept(1L) == "" && kept.size == 3)
  }

  test("cutDuplicatedSpans passes non-text columns through") {
    val docs = Seq(
      (0L, "k1 k2 k3 tail0", "web"),
      (1L, "k1 k2 k3 tail1", "wiki")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.cutDuplicatedSpans(docs, n = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("source"))).toSet
    assert(out == Set((0L, "tail0", "web"), (1L, "tail1", "wiki")))
  }

  test("winnowing: rightmost-min tie rule and the short-doc single window") {
    // 8 identical tokens, k=4 → 5 identical grams; w=5 → ONE window whose
    // rightmost minimum is gram position 4
    val docs = Seq((0L, "a a a a a a a a")).toDF("doc_id", "text")
    val got = Dedup.winnowingFingerprints(docs, k = 4, w = 5).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("fp")))
    assert(got.length == 1 && got.head._1 == 4L)
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    val shared = "the very same ten token span appears in both documents"
    val docs = Seq(
      (1L, s"alpha beta gamma delta $shared epsilon"),
      (2L, s"one two three $shared four five six")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(docs, k = 4, w = 5).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("fp")).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty) // localized-overlap detection works
    // positions are valid gram indices and selection is sparse
    val rows = Dedup.winnowingFingerprints(docs, k = 4, w = 5).collect()
    assert(rows.forall(r => r.getAs[Long]("pos") >= 0))
  }

  test("winnowing: docs shorter than k are absent; k-token doc has one gram") {
    val docs = Seq((0L, "a b c"), (1L, "a b c d")).toDF("doc_id", "text")
    val got = Dedup.winnowingFingerprints(docs, k = 4, w = 5).collect()
    assert(got.forall(_.getAs[Long]("doc_id") == 1L) && got.length == 1)
    assert(got.head.getAs[Long]("pos") == 0L)
  }

  test("winnowingOverlap finds the planted excerpt and caps boilerplate fps") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, s"unique one two three $shared tail1"),
      (2L, s"different prefix words here $shared tail2"),
      (3L, "nothing in common with anybody else at all right here")
    ).toDF("doc_id", "text")
    val probe = Seq((10L, shared)).toDF("doc_id", "text")
    val got = Dedup.winnowingOverlap(probe, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n_shared"))).toSet
    assert(got.map(t => (t._1, t._2)) == Set((10L, 1L), (10L, 2L)))
    assert(got.forall(_._3 >= 1))
    // df cap: with maxFpDf = 1 the shared-by-both fingerprints are
    // boilerplate and matching goes quiet
    val capped = Dedup.winnowingOverlap(probe, corpus, maxFpDf = 1)
    assert(capped.count() == 0)
  }

  test("fused rolling-hash path matches the md5 reference formulation") {
    // varied shapes: shared prefixes, internal repeats, sub-n docs, empty
    // and null text, punctuation — coverage stats must be identical
    val docs = (Seq(
      (0L, "a b c d e x y z"), (1L, "a b c d e p q r"),
      (2L, "u v w x u v w y"), (3L, "short one"), (4L, ""),
      (5L, null.asInstanceOf[String]),
      (6L, "The, quick; brown fox! The, quick; brown cow")) ++
      (10L until 60L).map(i => (i, s"filler text block ${i % 7} common tail of words")))
      .toDF("doc_id", "text").repartition(5)
    for (n <- Seq(2, 3, 10)) {
      val fusedOut = Dedup.dupSpanStats(docs, n = n)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val refOut = Dedup.dupSpanStatsReference(docs, n = n)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(fusedOut == refOut, s"fused/reference divergence at n=$n")
    }
  }

  test("rolling window fingerprints: same window text → same fp, position-independent") {
    import graft.functions.RollingHash
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def fps(words: Seq[String], n: Int): Seq[Long] =
      RollingHash.windowFps(new GenericArrayData(
        words.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray), n).toSeq
    val a = fps(Seq("a", "b", "c", "d", "e"), 3)
    val b = fps(Seq("x", "a", "b", "c", "d", "e"), 3)
    assert(a.length == 3 && b.length == 4)
    assert(b.drop(1) == a)                  // rolled fps equal direct fps
    assert(a.toSet.size == 3)               // distinct windows → distinct fps
    // fewer than n words → null (callers filter len >= n)
    assert(RollingHash.windowFps(new GenericArrayData(
      Array(org.apache.spark.unsafe.types.UTF8String.fromString("solo"))), 2) == null)
    // the roll must equal the direct Horner evaluation at every position,
    // not just drift consistently: recompute window 2 from scratch
    val direct = fps(Seq("c", "d", "e"), 3)
    assert(a(2) == direct.head)
  }
}
