package graft

import graft.llm.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkFunSuite {
  import spark.implicits._

  // ---------------------------------------------------------- c4Clean

  private def page(id: Long, text: String) = Seq((id, text)).toDF("doc_id", "text")

  test("c4Clean keeps only punctuated lines with enough words") {
    val text = Seq(
      "this line has five words.",      // kept
      "this line has no punctuation",   // dropped: no terminal punct
      "short line.",                    // dropped: < 5 words
      "does this line survive with a question mark?", // kept
      "an exclamation mark also counts as terminal!",  // kept
      "\"a quoted line with five words\""              // kept (ends in ")
    ).mkString("\n")
    val out = Curation.c4Clean(page(0L, text)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_lines") == 6)
    assert(r.getAs[Long]("n_kept") == 4)
    val kept = r.getAs[String]("text").split("\n")
    assert(kept.length == 4)
    assert(!kept.exists(_.contains("no punctuation")))
    assert(!kept.exists(_ == "short line."))
  }

  test("c4Clean drops lines containing javascript, case-insensitively") {
    val text = Seq(
      "please enable JavaScript to view this site.",
      "a perfectly ordinary line of text here.",
      "another perfectly ordinary line of text.",
      "and one more ordinary line to clear the floor."
    ).mkString("\n")
    val out = Curation.c4Clean(page(0L, text)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_kept") == 3)
    assert(!out.head.getAs[String]("text").toLowerCase.contains("javascript"))
  }

  test("c4Clean drops whole documents on lorem ipsum, braces, or line floor") {
    val good = "one good line with five words.\n" * 4
    assert(Curation.c4Clean(page(0L, good + "Lorem Ipsum dolor sit amet.")).count() == 0)
    assert(Curation.c4Clean(page(1L, good + "function f() { return 1; }.")).count() == 0)
    // only 2 kept lines < minKeptLines=3 → dropped
    val thin = "a good line with five words.\nanother good line right here.\nno punct"
    assert(Curation.c4Clean(page(2L, thin)).count() == 0)
    // exactly 3 kept → survives
    val ok = "a good line with five words.\n" * 3 + "no punct"
    assert(Curation.c4Clean(page(3L, ok)).count() == 1)
  }

  test("c4Clean parameters are honored and other columns ride along") {
    val df = Seq((7L, "x", "tiny line here.\nsecond tiny line."))
      .toDF("doc_id", "extra", "text")
    val out = Curation.c4Clean(df, minWordsPerLine = 3, minKeptLines = 2).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("extra") == "x")
    assert(out.head.getAs[Long]("n_kept") == 2)
  }

  // ----------------------------------------------------- normalizeUrl

  private def norm(u: String): String =
    Seq(Tuple1(u)).toDF("u").select(Curation.normalizeUrl(col("u")).as("n"))
      .collect().head.getString(0)

  test("normalizeUrl canonicalizes case, www, ports, fragments, utm params") {
    assert(norm("HTTPS://WWW.Example.COM:443/Path/a?x=1#frag")
      == "https://example.com/Path/a?x=1")
    assert(norm("http://example.com:80/") == "http://example.com/")
    assert(norm("http://example.com") == "http://example.com/")
    assert(norm("https://sub.example.com:8443/a") == "https://sub.example.com:8443/a")
    // :80 is only a default for http, not https
    assert(norm("https://example.com:80/a") == "https://example.com:80/a")
    assert(norm("http://e.com/p?utm_source=x&id=2&UTM_medium=y&q=z")
      == "http://e.com/p?id=2&q=z")
    assert(norm("http://e.com/p?utm_source=x") == "http://e.com/p")
    // path is preserved case-sensitively; query order preserved
    assert(norm("http://e.com/A/B?b=2&a=1") == "http://e.com/A/B?b=2&a=1")
  }

  test("normalizeUrl passes through non-URLs and nulls") {
    assert(norm("not a url at all") == "not a url at all")
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("u")
      .select(Curation.normalizeUrl(col("u")).as("n")).collect().head
    assert(r.isNullAt(0))
  }

  test("urlDomain strips www and default ports") {
    val d = Seq(Tuple1("HTTPS://WWW.Foo.ORG:443/x?y#z")).toDF("u")
      .select(Curation.urlDomain(col("u")).as("d")).collect().head.getString(0)
    assert(d == "foo.org")
  }

  // ----------------------------------------------------- gopherRules

  test("gopherSignals counts bullets, ellipses, symbols, alpha and stops") {
    val text = Seq(
      "• a bullet line of text",
      "- another bullet style here",
      "a normal line that trails off...",
      "numbers 123 456 here",
      "the and of have # tokens"
    ).mkString("\n")
    val r = Seq((0L, text)).toDF("doc_id", "text")
      .select(graft.llm.TextAnalysis.gopherSignals(col("text")).as("s"))
      .select("s.*").collect().head
    assert(r.getAs[Long]("n_words") == 27) // bullet markers are words too
    assert(r.getAs[Double]("bullet_line_frac") == 2.0 / 5)
    assert(r.getAs[Double]("ellipsis_line_frac") == 1.0 / 5)
    assert(r.getAs[Double]("hash_ratio") == 1.0 / 27)
    assert(r.getAs[Double]("ellipsis_ratio") == 1.0 / 27)
    // non-alpha words: '•', '-', 123, 456, '#'
    assert(r.getAs[Double]("alpha_word_frac") == 22.0 / 27)
    assert(r.getAs[Long]("stop_hits") == 5) // the, and, of, have, that
  }

  test("gopherRules fires each threshold") {
    def reasons(t: String, minWords: Int = 1): Seq[String] =
      Seq((0L, t)).toDF("doc_id", "text")
        .select(graft.llm.TextAnalysis.gopherRules(col("text"),
          minWords = minWords, minStopHits = 0).getField("reasons").as("r"))
        .collect().head.getSeq[String](0).toSeq
    assert(reasons("short text", minWords = 50).contains("too_few_words"))
    assert(reasons("a b c d e f g h i j").contains("words_too_short"))
    assert(reasons("extraordinarily sesquipedalian circumlocutions notwithstanding")
      .contains("words_too_long"))
    assert(reasons("only # ## hash ### marks").contains("hash_heavy"))
    assert(reasons("• one\n• two\n• three").contains("bullet_lines"))
    assert(reasons("drifting off...\nmore drift...\nsolid line here")
      .contains("ellipsis_lines"))
    assert(reasons("1234 5678 9999 0000 word").contains("non_alpha"))
    // a clean doc keeps
    val ok = "the quick brown fox jumps over that lazy dog with style " * 5
    val keep = Seq((0L, ok.trim)).toDF("doc_id", "text")
      .select(graft.llm.TextAnalysis.gopherRules(col("text")).getField("keep"))
      .collect().head.getBoolean(0)
    assert(keep)
  }

  // --------------------------------------- fused-kernel parity (vs lambda)

  test("fused C4 kernel is bit-identical to the lambda formulation") {
    // the real corpus + fabricated structure + edge strings
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), regexp_replace(col("text"),
        "((\\S+ ){9}\\S+) ", "$1.\n").as("text"))
    val edges = Seq(
      (9000001L, ""), (9000002L, "   "), (9000003L, "\n\n\n"),
      (9000004L, "ends with dot but few.\nlots of words make this line survive."),
      (9000005L, "JavaScript MiXeD CaSe line with many words here.\nok line with five words."),
      (9000006L, "trailing newline line with five words.\n"),
      (9000007L, "Ünïcödé wörds with five tokens here.")
    ).toDF("doc_id", "text")
    val docs = base.unionByName(edges)
    val a = collectSorted(graft.llm.Curation.c4Clean(docs, minKeptLines = 1))
    val b = collectSorted(graft.llm.Curation.c4CleanLambda(docs, minKeptLines = 1))
    assert(a == b)
  }

  test("fused Gopher kernel is bit-identical to the lambda formulation") {
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), regexp_replace(col("text"),
        "((\\S+ ){9}\\S+) ", "$1\n").as("text"))
    val edges = Seq(
      (9000001L, ""), (9000002L, "• bullet\n- dash bullet\nplain"),
      (9000003L, "dots...everywhere....and….more…"),
      (9000004L, "# ## ### #s and 123 456"),
      (9000005L, "the be to of and that have with all stops")
    ).toDF("doc_id", "text")
    val docs = base.unionByName(edges)
    def run(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      collectSorted(docs.select(col("doc_id"), f(col("text")).as("s"))
        .select(col("doc_id"), col("s.*")))
    assert(run(graft.llm.TextAnalysis.gopherSignals)
      == run(graft.llm.TextAnalysis.gopherSignalsLambda))
  }

  test("topVocabulary + oovRate: coverage arithmetic and tiebreaks") {
    val ref = Seq((0L, "a a a b b c")).toDF("doc_id", "text")
    // counts: a=3, b=2, c=1 -> top-2 = {a, b}
    val vocab = graft.llm.Corpus.topVocabulary(ref, n = 2)
    assert(vocab.collect().map(_.getString(0)).toSet == Set("a", "b"))
    val probe = Seq((1L, "a b z z"), (2L, "z q"), (3L, "A  B")).toDF("doc_id", "text")
    val out = graft.llm.Corpus.oovRate(probe, vocab).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_oov"), r.getAs[Double]("oov_rate")))).toMap
    assert(out(1L) == ((2L, 0.5)))
    assert(out(2L) == ((2L, 1.0)))
    assert(out(3L) == ((0L, 0.0))) // case-folded, whitespace-collapsed
  }

  // ------------------------------------------------ training-prep ops

  test("hardNegatives returns only different-label rows, hardest first") {
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(0.99f, 0.1f), 0),   // same label — must never appear
      (2L, Seq(0.9f, 0.4f), 1),    // hard negative (close)
      (3L, Seq(0.0f, 1.0f), 1),    // easy negative (orthogonal)
      (4L, Seq(0.7f, 0.7f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.llm.Similarity.hardNegatives(
      corpus, corpus.filter(col("vec_id") === 0), k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 4L))
    assert(out.forall(_.getAs[Int]("neighbor_label") != 0))
  }

  test("balanceLabels hits the target exactly, up and down") {
    val df = (0L until 30L).map(i => (i, if (i < 24) "big" else "small"))
      .toDF("vec_id", "label")
    val out = graft.llm.Sampling.balanceLabels(df, "label",
      targetPerLabel = 12, idCol = "vec_id")
    val byLabel = out.groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel == Map("big" -> 12L, "small" -> 12L))
    // downsampled label: distinct rows, no copies
    assert(out.filter(col("label") === "big")
      .select("vec_id").distinct().count() == 12)
    assert(out.filter(col("label") === "big" && col("copy_idx") > 0).count() == 0)
    // upsampled label: all 6 originals present, each 2 copies
    val small = out.filter(col("label") === "small")
    assert(small.select("vec_id").distinct().count() == 6)
    assert(small.groupBy("vec_id").count().collect().forall(_.getLong(1) == 2))
    // deterministic
    val again = graft.llm.Sampling.balanceLabels(df, "label", 12, idCol = "vec_id")
    assert(collectSorted(again) == collectSorted(out))
  }

  test("balanceLabels: two-phase rank ≡ the full-window formulation") {
    // EQUIVALENCE LOCK for the round-10 rewrite: routing the per-label md5
    // rank through topKPerQuery must reproduce the old full-window output
    // exactly — asserted on a skewed frame (one label owns 90% of rows, so
    // the map-side prune actually discards most of it) with both over- and
    // under-represented labels.
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 2000).select(col("id").as("vec_id"),
      when(pmod(col("id"), lit(10)) < 9, lit("dominant"))
        .otherwise(concat(lit("L"), pmod(col("id"), lit(4)).cast("string")))
        .as("label"))
    val target = 120L
    val got = collectSorted(
      graft.llm.Sampling.balanceLabels(df, "label", target, idCol = "vec_id"))
    val w = Window.partitionBy(col("label"))
      .orderBy(md5(concat(col("vec_id").cast("string"), lit(":"))), col("vec_id"))
    val counts = df.groupBy(col("label")).agg(count(lit(1)).as("__n"))
    val want = collectSorted(df.join(broadcast(counts), Seq("label"))
      .withColumn("__rk", row_number().over(w).cast("long") - 1)
      .withColumn("__copies", expr(s"$target div __n") +
        when(col("__rk") < lit(target) % col("__n"), 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__n", "__rk", "__copies"))
    assert(got == want)
  }

  test("tokenBudgetMixture: distributed prefix sum ≡ the window formulation") {
    // same lock as packSequences/balanceLabels, for the round-10 rewrite of
    // the EXACT mixture: one source owns 90% of rows, budgets cut mid-
    // stream, and the kept set must equal the old per-source-window rule
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 3000).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(10)) < 9, lit("mega"))
        .otherwise(concat(lit("m"), pmod(col("id"), lit(3)).cast("string")))
        .as("source"),
      (pmod(col("id") * 13 + 5, lit(50)) + 1).as("n_tokens"))
    val budgets = Map("mega" -> 9000L, "m0" -> 700L, "m1" -> 400L, "m2" -> 100L)
    val got = collectSorted(graft.llm.Sampling.tokenBudgetMixture(
      df, col("n_tokens"), budgets, salt = "mx"))
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col("source") === k, lit(v)).otherwise(acc)
    }
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__u"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = collectSorted(df
      .withColumn("__u", graft.llm.Sampling.hashUniform(col("doc_id"), "mx"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .filter(col("__cum") - col("n_tokens") < budget)
      .drop("__u", "__cum"))
    assert(got == want)
    spark.catalog.clearCache()
  }

  // ------------------------------------------- epoch shuffle & bigram CE

  test("epochShuffle: dense ranks, balanced shards, epoch changes the order") {
    val docs = (0L until 64L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val e1 = graft.llm.Sampling.epochShuffle(docs, numShards = 8, epoch = 1)
    val ranks = e1.select("epoch_rank").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (0L until 64L))
    val shardSizes = e1.groupBy("shard").count().collect().map(_.getLong(1))
    assert(shardSizes.forall(_ == 8))
    val order1 = e1.orderBy("epoch_rank").collect().map(_.getLong(0)).toSeq
    val order2 = graft.llm.Sampling.epochShuffle(docs, 8, epoch = 2)
      .orderBy("epoch_rank").collect().map(_.getLong(0)).toSeq
    assert(order1 != order2)         // fresh order per epoch
    assert(order1.toSet == order2.toSet)
    // deterministic: same epoch → same order
    val again = graft.llm.Sampling.epochShuffle(docs, 8, epoch = 1)
      .orderBy("epoch_rank").collect().map(_.getLong(0)).toSeq
    assert(again == order1)
  }

  test("crossEntropyBigram: in-domain order beats shuffled order") {
    val ref = Seq.tabulate(20)(i => (i.toLong, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val uni = graft.llm.Corpus.unigramCounts(ref)
    val bi = graft.llm.Corpus.bigramCounts(ref)
    val probe = Seq(
      (100L, "the quick brown fox jumps"), // model order
      (101L, "fox the jumps quick brown")  // same words, broken bigrams
    ).toDF("doc_id", "text")
    val ce = graft.llm.Corpus.crossEntropyBigram(probe, uni, bi)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("cross_entropy")).toMap
    assert(ce(100L) < ce(101L))
    // unigram-only scoring (λ irrelevant for first token) sees them equal
    val ceUni = graft.llm.Corpus.crossEntropy(probe, uni)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("cross_entropy")).toMap
    assert(math.abs(ceUni(100L) - ceUni(101L)) < 1e-12)
  }

  test("bigramCounts survives empty and single-token docs") {
    // sequence(2, size) counts DOWN to [2, 1] when size = 1 — unguarded,
    // single-token docs crash with an invalid element_at index
    val ref = Seq(
      (1L, "solo"), (2L, ""), (3L, "   "), (4L, null.asInstanceOf[String]),
      (5L, "a b a b")).toDF("doc_id", "text")
    val bi = graft.llm.Corpus.bigramCounts(ref)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi == Map(("a", "b") -> 2L, ("b", "a") -> 1L))
  }

  // ------------------------------------------------ scripts & data card

  test("scriptShares counts per-script chars; dominantScript breaks ties in order") {
    val sh = Seq(Tuple1("abc привет 你好 مرحبا γεια"))
      .toDF("t").select(graft.llm.TextAnalysis.scriptShares(col("t")).as("s"))
      .select("s.*").collect().head
    assert(sh.getAs[Long]("n_latin") == 3)
    assert(sh.getAs[Long]("n_cyrillic") == 6)
    assert(sh.getAs[Long]("n_cjk") == 2)
    assert(sh.getAs[Long]("n_arabic") == 5)
    assert(sh.getAs[Long]("n_greek") == 4)
    def dom(t: String): String = Seq(Tuple1(t)).toDF("t")
      .select(graft.llm.TextAnalysis.dominantScript(col("t"))).collect().head.getString(0)
    assert(dom("hello мир") == "latin")       // 5 latin > 3 cyrillic
    assert(dom("hi мирно") == "cyrillic")
    assert(dom("ab яж") == "latin")           // 2-2 tie → earlier entry
  }

  test("dataCard: volumes, dup mass, and shares per stratum") {
    val docs = Seq(
      (0L, "a b c", "en", "s1"),
      (1L, "a  B c", "en", "s1"),   // dup of 0 modulo case/ws
      (2L, "x y", "fr", "s2")
    ).toDF("doc_id", "text", "lang", "source")
    val card = graft.llm.Corpus.dataCard(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) -> r).toMap
    val s1 = card(("s1", "en"))
    assert(s1.getAs[Long]("n_docs") == 2 && s1.getAs[Long]("n_distinct") == 1
      && s1.getAs[Long]("dup_docs") == 1 && s1.getAs[Long]("n_tokens") == 6)
    assert(s1.getAs[Double]("doc_share") == 2.0 / 3)
    assert(card(("s2", "fr")).getAs[Long]("dup_docs") == 0)
  }

  // ----------------------------------------------------- normalizeText

  test("normalizeText folds decomposed forms, strips accents, lowercases") {
    import graft.functions.GraftFunctions.normalizeText
    def run(s0: String, strip: Boolean = true, lower: Boolean = true): String =
      Seq(Tuple1(s0)).toDF("t")
        .select(normalizeText(spark, col("t"), strip, lower)).collect().head.getString(0)
    assert(run("Café") == "cafe")              // precomposed é
    assert(run("Café") == "cafe")             // decomposed e + ´
    assert(run("naïve Señor") == "naive senor")
    assert(run("Über", strip = false) == "über") // ü survives, lowered
    assert(run("Café", lower = false) == "Cafe")      // case survives
    // NFC alone (both off) still folds decomposed → composed
    assert(run("Café", strip = false, lower = false) == "Café")
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(normalizeText(spark, col("t"))).collect().head
    assert(r.isNullAt(0))
    // registered SQL surface
    Seq(Tuple1("RÉSUMÉ")).toDF("t").createOrReplaceTempView("norm_t")
    assert(spark.sql("SELECT graft_normalize_text(t, true, true) FROM norm_t")
      .collect().head.getString(0) == "resume")
  }

  // ----------------------------------------------------- perDomainCap

  test("groupHoldout: groups are atomic, deterministic, shares roughly honored") {
    val docs = (0L until 3000L).map(i => (i, s"dom${i % 150}"))
      .toDF("doc_id", "grp").repartition(7)
    val out = graft.llm.Sampling.groupHoldout(docs, col("grp"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), salt = "s1")
    // atomicity: every group maps to exactly one split
    val perGroup = out.groupBy("grp")
      .agg(countDistinct(col("split")).as("k")).agg(max("k")).head().getLong(0)
    assert(perGroup == 1L)
    // determinism: same salt → same assignment; different salt → different
    val again = graft.llm.Sampling.groupHoldout(docs, col("grp"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), salt = "s1")
    assert(out.orderBy("doc_id").collect().toSeq
      == again.orderBy("doc_id").collect().toSeq)
    val other = graft.llm.Sampling.groupHoldout(docs, col("grp"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), salt = "s2")
    assert(out.orderBy("doc_id").collect().toSeq
      != other.orderBy("doc_id").collect().toSeq)
    // shares: 150 groups at 80/10/10 → train should dominate clearly
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "valid", "test")))
    assert(counts("train") > counts.getOrElse("valid", 0L))
    assert(counts("train") > counts.getOrElse("test", 0L))
    // stability under growth: adding rows of KNOWN groups can't move them
    val grown = docs.unionByName(
      Seq((9001L, "dom3"), (9002L, "dom7")).toDF("doc_id", "grp"))
    val g = graft.llm.Sampling.groupHoldout(grown, col("grp"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), salt = "s1")
    val before = out.filter(col("grp").isin("dom3", "dom7"))
      .select("grp", "split").distinct().collect().map(r => (r.getString(0), r.getString(1))).toSet
    val after = g.filter(col("grp").isin("dom3", "dom7"))
      .select("grp", "split").distinct().collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(before == after)
    intercept[IllegalArgumentException] {
      graft.llm.Sampling.groupHoldout(docs, col("grp"), Seq("a" -> 0.5))
    }
  }

  test("stripHtml: scripts/styles/comments drop, blocks break lines, entities decode") {
    def strip(s: String): String = Seq(Tuple1(s)).toDF("h")
      .select(graft.llm.Curation.stripHtml(col("h"))).collect().head.getString(0)
    assert(strip("<p>Hello <b>world</b></p>") == "Hello world")
    // script/style CONTENT vanishes, even with attributes and '<' inside
    assert(strip("<script type=\"a\">var x = 1 < 2;</script>keep") == "keep")
    assert(strip("a<style>.x{}</style>b") == "a b")
    assert(strip("a<!-- hidden <b>bold</b> -->b") == "a b")
    // block tags become line breaks; inline tags become spaces
    assert(strip("<div>one</div><div>two</div>") == "one\ntwo")
    assert(strip("one<br/>two") == "one\ntwo")
    assert(strip("a<span>b</span>c") == "a b c")
    // entity decode, &amp; last so double-escapes stay literal
    assert(strip("&lt;tag&gt; &quot;q&#39;s&quot; &amp; more") ==
      "<tag> \"q's\" & more")
    assert(strip("&amp;lt; stays literal") == "&lt; stays literal")
    assert(strip("a&nbsp;b") == "a b")
    // whitespace collapse + trim of spaces AND newlines
    assert(strip("<p>  padded   text </p> ") == "padded text")
    assert(strip("<p></p><p>x</p><p></p>") == "x")
    // extractHtmlText drops emptied docs when asked
    val docs = Seq((1L, "<p>real</p>"), (2L, "<script>only()</script>"))
      .toDF("doc_id", "text")
    val kept = graft.llm.Curation.extractHtmlText(docs)
    assert(kept.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "real")))
    assert(graft.llm.Curation.extractHtmlText(docs, dropEmpty = false).count() == 2)
  }

  test("perDomainCap keeps top-priority docs per domain, ties by id") {
    val docs = Seq(
      (0L, "http://a.com/0", 10),
      (1L, "http://a.com/1", 30),
      (2L, "https://WWW.A.com/2", 30), // same domain as a.com, ties with 1 → id wins
      (3L, "http://a.com/3", 5),
      (4L, "http://b.com/4", 1)
    ).toDF("doc_id", "url", "prio")
    val kept = Curation.perDomainCap(docs, "url", maxPerDomain = 2,
      priority = col("prio"))
      .select("doc_id", "domain").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept == Map(1L -> "a.com", 2L -> "a.com", 4L -> "b.com"))
  }

  // ---------------------------------------------------------- blocklist

  test("blocklistTag matches case-insensitively on distinct tokens") {
    val docs = Seq(
      (1L, "Bad BAD bad day"),   // repeated hit counts once
      (2L, "all clear here"),
      (3L, "worse and bad and worse"), // two hits, sorted join
      (4L, null: String))
      .toDF("doc_id", "text")
    val got = graft.llm.Curation.blocklistTag(docs, Seq("WORSE", "bad"))
      .select("doc_id", "n_blocked", "blocked_terms").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got == Map(
      1L -> ((1L, "bad")), 2L -> ((0L, "")),
      3L -> ((2L, "bad,worse")), 4L -> ((0L, ""))))
  }

  test("perplexityBandFilter keeps exactly the docs inside the quantile band") {
    val docs = (0L until 40L)
      .map(i => (i, (0 to i.toInt % 7).map(j => s"w${i % 11}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val ref = docs.filter($"doc_id" % 2 === 0)
    val refc = graft.llm.Corpus.unigramCounts(ref)
    // brute force: score everything, interpolate thresholds the p*(n-1) way
    val scores = graft.llm.Corpus.crossEntropy(docs, refc)
      .select($"doc_id", round($"cross_entropy", 6).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val sorted = scores.map(_._2).sorted
    def q(p: Double): Double = {
      val idx = p * (sorted.length - 1)
      val (i, f) = (idx.toInt, idx - idx.toInt)
      if (i + 1 < sorted.length) sorted(i) + f * (sorted(i + 1) - sorted(i))
      else sorted(i)
    }
    val (lo, hi) = (q(0.25), q(0.75))
    val expected = scores.filter { case (_, s) => s >= lo && s <= hi }
      .map(_._1).toSet
    val got = graft.llm.Curation.perplexityBandFilter(docs, refc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected && got.nonEmpty && got.size < scores.length)
  }

  test("stripMarkdown: fences drop, links/images/emphasis unwrap, markers strip") {
    val md = "# Title\n\n> a **bold** _em_ quote\n\n" +
      "Read [docs](http://x/y) or ![pic alt](http://i.png) and `code`.\n\n" +
      "```\nhidden *code*\n```\n\n- one\n- two\n\n---\n\nplain tail"
    val docs = Seq((1L, md), (2L, "```\nonly code\n```")).toDF("doc_id", "text")
    val got = graft.llm.Curation.extractMarkdownText(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(got == Map(1L ->
      ("Title\na bold em quote\nRead docs or pic alt and code.\n" +
        "one\ntwo\nplain tail")))   // doc 2 extracted empty → dropped
    val kept = graft.llm.Curation.extractMarkdownText(docs, dropEmpty = false)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    assert(kept(2L) == "")
  }

  test("corpusDiversity: closed-form mean over a full sample; dup-heavy reads high") {
    // rate 1.0 keeps everything -> closed form over 3 docs
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c d")).toDF("doc_id", "text")
    val r = graft.llm.Corpus.corpusDiversity(docs, rate = 1.0).head
    // pairs: (1,2)=1.0, (1,3)=0, (2,3)=0 -> mean 1/3
    assert(r.getAs[Long]("n_docs_sampled") == 3L
      && r.getAs[Long]("n_pairs") == 3L)
    assert(math.abs(r.getAs[Double]("mean_jaccard") - 0.333333) < 1e-9)
    // determinism of the sampled variant: two runs agree exactly
    val big = (0L until 200L).map(i => (i, s"w${i % 9} w${i % 13} w${i % 4}"))
      .toDF("doc_id", "text")
    val a = graft.llm.Corpus.corpusDiversity(big, 0.3).head
    val b = graft.llm.Corpus.corpusDiversity(big, 0.3).head
    assert(a == b && a.getAs[Long]("n_pairs") > 0)
  }

  test("detectFormat labels html/markdown/plain; extractTextAuto routes each") {
    val html = "<html><body><p>hello world</p><div>x</div></body></html>"
    val md = "# H\n\n- item\n\nbody text"
    val plain = "just some plain prose with a - dash and a < sign"
    val docs = Seq((1L, html), (2L, md), (3L, plain)).toDF("doc_id", "text")
    val got = graft.llm.Curation.extractTextAuto(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("format"), r.getAs[String]("text")))).toMap
    assert(got(1L)._1 == "html" && got(2L)._1 == "markdown"
      && got(3L)._1 == "plain")
    // routed output equals the dedicated extractor's output
    val viaHtml = docs.filter($"doc_id" === 1L)
      .select(graft.llm.Curation.stripHtml($"text")).head.getString(0)
    val viaMd = docs.filter($"doc_id" === 2L)
      .select(graft.llm.Curation.stripMarkdown($"text")).head.getString(0)
    assert(got(1L)._2 == viaHtml && got(2L)._2 == viaMd
      && got(3L)._2 == plain)
  }

  test("domainBlocklistFilter drops exact and subdomain matches, keeps the rest") {
    val docs = Seq(
      (1L, "https://bad.com/x"),
      (2L, "https://cdn.deep.bad.com/y"), // subdomain, two levels down
      (3L, "https://notbad.com/z"),       // suffix STRING but not a subdomain
      (4L, "https://good.org/a"),
      (5L, null.asInstanceOf[String]),    // no host → fail-safe keep
      (6L, "https://localhost/b")         // single-label host
    ).toDF("doc_id", "url")
    val blocked = Seq("bad.com").toDF("domain")
    val kept = graft.llm.Curation.domainBlocklistFilter(docs, blocked, "url")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(3L, 4L, 5L, 6L))
    // exact single-label block works through the size-1 branch
    val kept2 = graft.llm.Curation.domainBlocklistFilter(docs,
        Seq("localhost").toDF("domain"), "url")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!kept2.contains(6L) && kept2.contains(1L))
  }

  test("annotateGroupQuantile buckets within each group's own thresholds") {
    // group a: values 1..8 → p·(n−1) thresholds 2.75 / 4.5 / 6.25
    // group b: single value 10 → all thresholds 10 → bucket 3 (ties up)
    val df = ((1 to 8).map(i => (i.toLong, "a", i: java.lang.Integer))
      :+ ((100L, "b", 10: java.lang.Integer))
      :+ ((101L, "b", null.asInstanceOf[java.lang.Integer])))
      .toDF("id", "grp", "v")
    val got = graft.llm.Corpus.annotateGroupQuantile(df, "v", "grp")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("q_bucket")).map(_.toLong)).toMap
    val expected = Map(1L -> Some(0L), 2L -> Some(0L), 3L -> Some(1L),
      4L -> Some(1L), 5L -> Some(2L), 6L -> Some(2L), 7L -> Some(3L),
      8L -> Some(3L), 100L -> Some(3L), 101L -> None)
    assert(got == expected)
    // approx path: same buckets on this tiny input (sketch is exact here)
    val approx = graft.llm.Corpus.annotateGroupQuantile(df, "v", "grp",
      exact = false)
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("q_bucket")).map(_.toLong)).toMap
    assert(approx(100L) == Some(3L) && approx(101L).isEmpty)
  }

  test("readability matches hand-computed Flesch-Kincaid values") {
    val docs = Seq(
      (1L, "The quick brown fox. It jumps!"), // 6 words, 2 sents, 6 syls
      (2L, "tsk tsk."),                       // vowel-less words → 1 syl each
      (3L, "no punctuation here"),            // 0 sentence runs → floor 1
      (4L, "1234 !!")                         // zero letter-words → absent
    ).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.readability(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_sentences"),
          r.getAs[Long]("n_syllables"), r.getAs[Double]("fk_grade"),
          r.getAs[Double]("reading_ease")))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    val (w1, s1, y1, fk1, re1) = got(1L)
    assert((w1, s1, y1) == ((6L, 2L, 6L)))
    assert(math.abs(fk1 - (0.39 * 3 + 11.8 * 1 - 15.59)) < 1e-12)
    assert(math.abs(re1 - (206.835 - 1.015 * 3 - 84.6 * 1)) < 1e-12)
    assert(got(2L)._1 == 2L && got(2L)._2 == 1L && got(2L)._3 == 2L)
    assert(got(3L)._2 == 1L) // sentence floor
  }

  test("blocklistFilter drops hit docs and restores the schema") {
    val docs = Seq((1L, "bad things"), (2L, "good things"))
      .toDF("doc_id", "text")
    val kept = graft.llm.Curation.blocklistFilter(docs, Seq("bad"))
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
