package graft.queries

import graft.Tables
import graft.llm.{Curation, Dsir, Sampling, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness gates for the deterministic curation operators: hash
  * sampling, token-budget mixture (exact + rate-based), and n-gram
  * repetition signals. Everything here is md5/integer arithmetic, so every
  * gate has a full DuckDB oracle replicating the decisions bit-for-bit —
  * ratios are emitted as raw doubles (IEEE division of identical integer
  * operands is bit-identical cross-engine, the q72 test_share precedent). */
object CurationQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // host-graph PageRank (3 power iterations, d=0.85): edges fabricated
    // from doc ids — 6 site→site edges (the site3 self-loop drops) plus 7
    // site→mirror edges; 'mirror' has no outlinks, so the dangling-mass
    // redistribution is exercised. Oracle unrolls the identical three
    // iterations; ranks compare rounded to 6.
    "q179_host_pagerank" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val site = (e: org.apache.spark.sql.Column) =>
        concat(lit("site"), e.cast("string"))
      val e1 = docs.select(site(col("doc_id") % 7).as("src"),
        site((col("doc_id") * 3 + 1) % 7).as("dst"))
      val e2 = docs.filter(col("doc_id") % 3 === 0)
        .select(site(col("doc_id") % 7).as("src"), lit("mirror").as("dst"))
      Curation.hostPageRank(e1.unionByName(e2), iters = 3)
        .select(col("node"), round(col("rank"), 6).as("rank"))
    }),

    // weighted exact-k (Efraimidis–Spirakis) at k=50, weight = token
    // count: longer docs win more slots; selection is the round-12 e
    // total order both engines replay from md5 nibbles
    "q189_weighted_sample" -> ((s, d) => {
      graft.llm.Sampling.sampleWeightedK(Tables.documents(s, d),
        col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")),
        k = 50, salt = "wk")
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // structural template fingerprint: two CMS-style wrappers chosen by
    // the source name's last digit parity — text contributes no tags, so
    // fingerprints cluster exactly by template
    "q190_template_fp" -> ((s, d) => {
      val odd = substring(col("source"), -1, 1).isin("1", "3", "5", "7", "9")
      val html = concat(
        lit("<html><head><title>t</title></head><body><div class=\"a\"><p>"),
        col("text"), lit("</p>"),
        when(odd, lit("<aside><ul><li>x</li></ul></aside>"))
          .otherwise(lit("")),
        lit("</div></body></html>"))
      Curation.htmlTemplateFingerprint(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          html.as("text")))
        .select(col("doc_id"), col("template_fp"),
          col("n_tags").cast("long").as("n_tags"))
    }),

    // anchor-text harvest over the q174 fabrication (the anchors carry
    // doc-derived text: "first", "rel", "m"): link + visible text pairs,
    // zipped from two group extractions of the same pattern.
    "q184_anchor_texts" -> ((s, d) => {
      val html = concat(
        lit("<div><a href=\"https://site"),
        (col("doc_id") % 7).cast("string"),
        lit(".example.com/p/"), col("doc_id").cast("string"),
        lit("\">doc "), col("doc_id").cast("string"),
        lit(" page</a> text <A class=\"x\" HREF=\"/relative/"),
        col("doc_id").cast("string"), lit("\"> rel link </A>"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" <a href=\"http://mirror.example.org/d?id="),
            col("doc_id").cast("string"), lit("\">mirror</a>")))
          .otherwise(lit("")),
        lit("</div>"))
      Curation.extractAnchorTexts(
        Tables.documents(s, d).select(col("doc_id"), html.as("text")))
    }),

    // mojibake repair: a fabricated prefix exercises 12 table entries
    // (curly quote/ellipsis/dash family, accented letters, Â-prefixed
    // symbols, the stray 'Ã ' ≡ à); the repair chain is plain literal
    // replaces, so the oracle replays it verbatim over the same input.
    "q180_fix_mojibake" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val fab = concat(
        lit("CafÃ© donâ€™t â€œquoteâ€¦ â€” naÃ±a straÃŸe 10Â° Â«okÂ» " +
          "Ã¼ber Ã  la "),
        col("text"))
      docs.select(col("doc_id"), Curation.fixMojibake(fab).as("text"))
    }),

    // outbound-link extraction: each doc wrapped in fabricated HTML with
    // an absolute link (rotating host), a RELATIVE link (host must come
    // back ''), mixed-case <A HREF>, and an extra mirror link on every
    // third doc. Same RE2-compatible regexes on both sides.
    "q174_link_extract" -> ((s, d) => {
      val html = concat(
        lit("<div><a href=\"https://site"),
        (col("doc_id") % 7).cast("string"),
        lit(".example.com/p/"), col("doc_id").cast("string"),
        lit("\">first</a> text <A class=\"x\" HREF=\"/relative/"),
        col("doc_id").cast("string"), lit("\">rel</A>"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" <a href=\"http://mirror.example.org/d?id="),
            col("doc_id").cast("string"), lit("\">m</a>")))
          .otherwise(lit("")),
        lit("</div>"))
      Curation.extractLinks(
        Tables.documents(s, d).select(col("doc_id"), html.as("text")))
    }),

    // deterministic Bernoulli sample at 10% — emits the kept ids WITH the
    // md5-derived uniform (an exact binary fraction k/16^7), so the oracle
    // checks both membership and the uniform itself byte-for-byte
    "q92_hash_sample" -> ((s, d) => {
      Sampling.hashSample(Tables.documents(s, d), col("doc_id"), 0.1,
        salt = "mix")
        .select(col("doc_id"),
          Sampling.hashUniform(col("doc_id"), "mix").as("u"))
    }),

    // leakage-safe group-holdout split: ~50 synthetic groups per source;
    // the (group, split) aggregation proves atomicity (every group shows
    // exactly one split) and the assignment is the md5-uniform both
    // engines replicate digit-for-digit
    "q139_group_holdout" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("grp",
        concat(col("source"), lit("#"), (col("doc_id") % 50).cast("string")))
      Sampling.groupHoldout(docs, col("grp"),
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), salt = "hold")
        .groupBy(col("grp"), col("split")).agg(count(lit(1)).as("n"))
    }),

    // DSIR importance resampling: target = the en slice, raw = the whole
    // corpus, 512 hash buckets over uni+bigrams, Gumbel top-100. Bucket
    // ids are md5-nibble integers and scores are 6-decimal-rounded with
    // doc-id tiebreaks, so the oracle replays model fit, per-doc weights,
    // noise, and the final selection exactly.
    "q140_dsir_resample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dsir.resample(docs, docs.filter(col("lang") === "en"),
          k = 100, buckets = 512, salt = "dsir")
        .select(col("doc_id"), col("n_grams"), col("log_weight"),
          col("score"))
    }),

    // UniMax budget allocation: 2-epoch cap, 40k-token budget over the 5
    // language totals — sized so SOME languages are fully capped and the
    // rest sit at the shared water level (both branches of the closed
    // form exercised); the oracle recomputes the waterfilling with window
    // functions over identical exact-double operands.
    "q141_unimax" -> ((s, d) => {
      val perLang = Tables.documents(s, d)
        .select(col("lang"),
          size(filter(split(lower(trim(col("text"))), "\\s+"),
            w => length(w) > 0)).cast("long").as("n"))
        .groupBy(col("lang")).agg(sum(col("n")).as("n_tokens"))
      Sampling.uniMaxAllocation(perLang, totalBudget = 40000L,
        maxEpochs = 2.0)
    }),

    // CCNet perplexity banding: q113's scoring chain (en-slice unigram
    // model, all docs scored, round 6), thresholds = the 0.25/0.75
    // quantile_cont of the rounded scores, keep the middle band.
    "q154_ccnet_band" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val refc = graft.llm.Corpus.unigramCounts(
        docs.filter(col("lang") === "en"))
      Curation.perplexityBandFilter(docs, refc)
        .select(col("doc_id"), col("n_tokens"), col("score"))
    }),

    // Naive-Bayes log-odds classifier: pos = the en slice, neg = the
    // rest, every doc scored (language is the natural strong signal in
    // the synthetic corpus, standing in for quality-vs-crawl). Closed
    // form — both engines replay the identical smoothing arithmetic.
    "q156_nb_classifier" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pos = docs.filter(col("lang") === "en")
      val neg = docs.filter(col("lang") =!= "en")
      graft.llm.Corpus.naiveBayesLogOdds(docs,
          graft.llm.Corpus.unigramCounts(pos),
          graft.llm.Corpus.unigramCounts(neg),
          pos.count(), neg.count())
        .select(col("doc_id"), col("n_tokens"),
          round(col("log_odds"), 6).as("log_odds"),
          col("pred_pos").cast("long").as("pred_pos"))
    }),

    // UT1-style domain blocklist: hosts are src{N}.example.com (every 5th
    // doc behind a cdn. subdomain); blocking src3/src7 must drop BOTH the
    // plain and cdn. variants (subdomain semantics), keep everything else
    "q162_domain_blocklist" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).withColumn("url",
        concat(lit("https://"),
          when(col("doc_id") % 5 === 0, lit("cdn.")).otherwise(lit("")),
          col("source"), lit(".example.com/page/"),
          col("doc_id").cast("string")))
      val blocked = Seq("src3.example.com", "src7.example.com")
        .toDF("domain")
      Curation.domainBlocklistFilter(docs, blocked, "url")
        .select(col("doc_id"), col("source"))
    }),

    // composed model-quality curation pipeline (the q123 composition-bug
    // pattern for the round-9 scoring family): NB-classify every doc
    // against the en/non-en models and keep the positives, then
    // perplexity-band the SURVIVORS (thresholds computed over the
    // filtered distribution — stage order is the semantics under test).
    // One oracle statement replays the whole chain.
    "q161_quality_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pos = docs.filter(col("lang") === "en")
      val neg = docs.filter(col("lang") =!= "en")
      val enCounts = graft.llm.Corpus.unigramCounts(pos)
      val classified = graft.llm.Corpus.naiveBayesLogOdds(docs, enCounts,
          graft.llm.Corpus.unigramCounts(neg), pos.count(), neg.count())
        .filter(col("pred_pos") === 1)
        .select(col("doc_id"))
      val survivors = docs.join(classified, Seq("doc_id"))
      Curation.perplexityBandFilter(survivors, enCounts)
        .select(col("doc_id"), col("n_tokens"), col("score"))
    }),

    // per-group quantile annotation: each doc's n_chars bucketed against
    // its OWN language's 0.25/0.5/0.75 thresholds (round-6, the shared
    // engine lock) — per-source normalization without a per-group window
    "q159_group_quantile" -> ((s, d) => {
      graft.llm.Corpus.annotateGroupQuantile(
          Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
          valueCol = "n_chars", groupCol = "lang")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("q_bucket"))
    }),

    // Flesch-Kincaid readability: letters-only words, vowel-group
    // syllables (min 1/word), [.!?]+ sentence runs (min 1/doc) — counting
    // rules shared verbatim with the oracle; both scores round-6.
    "q158_readability" -> ((s, d) => {
      TextAnalysis.readability(Tables.documents(s, d))
        .select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_syllables"),
          round(col("fk_grade"), 6).as("fk_grade"),
          round(col("reading_ease"), 6).as("reading_ease"))
    }),

    // C4 bad-words tagging: word-level blocklist hits over distinct
    // lowercased tokens, matched terms sorted and comma-joined. The list
    // mixes a rare corpus word ('dup', ~5% of docs) with two common ones,
    // so hit counts span 0..3.
    "q153_blocklist" -> ((s, d) => {
      Curation.blocklistTag(Tables.documents(s, d),
          Seq("hash", "batch", "dup"))
        .select(col("doc_id"), col("n_blocked"), col("blocked_terms"))
    }),

    // EXACT-k deterministic sampling, both shapes in one gate: a global
    // 100-doc sample (TakeOrdered over the hash-uniform order) and a
    // 20-per-lang quota (two-phase per-group top-k), tagged by mode. The
    // oracle replays the md5-nibble uniform and both ORDER BY ... LIMIT
    // selections; ties in the uniform break on doc_id in both engines.
    "q149_exact_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val global = Sampling.sampleExactK(docs, col("doc_id"), k = 100,
          salt = "xk9")
        .select(lit("global").as("mode"), col("doc_id"), col("lang"))
      val perLang = Sampling.sampleExactKPerGroup(docs, "lang",
          col("doc_id"), k = 20, salt = "xk9")
        .select(lit("per_lang").as("mode"), col("doc_id"), col("lang"))
      global.unionByName(perLang)
    }),

    // temperature-sampling allocation (the pre-UniMax baseline) over the
    // same language totals and budget as q141 — α = 0.5 so the power is
    // sqrt (IEEE-exact in every engine); the normalizer accumulates in
    // ascending-lang order, replayed by the oracle's ordered aggregate.
    // The uncapped-epochs overshoot UniMax fixes is visible per row.
    "q143_temperature_mixture" -> ((s, d) => {
      val perLang = Tables.documents(s, d)
        .select(col("lang"),
          size(filter(split(lower(trim(col("text"))), "\\s+"),
            w => length(w) > 0)).cast("long").as("n"))
        .groupBy(col("lang")).agg(sum(col("n")).as("n_tokens"))
      Sampling.temperatureAllocation(perLang, totalBudget = 40000L,
        alpha = 0.5)
    }),

    // character-distribution signals via the fused entropy kernel: one
    // codegen pass per row, no explode. The oracle rebuilds the codepoint
    // histogram by exploding characters and replays the entropy sum in
    // codepoint order (binary collation = UTF-8 byte order = codepoint
    // order), so the doubles match bit-for-bit before the round.
    "q142_char_entropy" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .filter(col("text").isNotNull && length(col("text")) > 0)
      docs.select(col("doc_id"),
          TextAnalysis.charSignals(col("text")).as("cs"))
        .select(col("doc_id"), col("cs.n_chars").as("n_cp"),
          col("cs.n_distinct").as("n_distinct"),
          round(col("cs.entropy"), 6).as("entropy"),
          round(col("cs.max_char_ratio"), 6).as("max_char_ratio"))
    }),

    // corpus feature-distribution profile: EXACT percentiles (Spark's
    // percentile aggregate ≡ DuckDB quantile_cont: index p·(n−1), linear
    // interpolation) of three integer-valued per-doc features.
    "q144_feature_profile" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.llm.Corpus.featureQuantiles(docs, Seq(
          ("n_tokens", TextAnalysis.tokenCount(col("text")).cast("double")),
          ("n_chars", length(col("text")).cast("double")),
          ("n_lines", size(split(col("text"), "\n")).cast("double"))),
        Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
    }),

    // token-budget mixture, BOTH variants over the same budgets: the exact
    // per-source window cumsum ('exact') and the scale-path rate filter
    // ('rate'), each summarized per source. Budgeted sources src0..src4;
    // everything else must be dropped by both.
    "q93_token_mixture" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("n_tokens",
        size(split(lower(trim(col("text"))), "\\s+")).cast("long"))
      val budgets = Map("src0" -> 3000L, "src1" -> 2000L,
        "src2" -> 1500L, "src3" -> 1000L, "src4" -> 500L)
      def summarize(df: DataFrame, mode: String) =
        df.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
          .withColumn("mode", lit(mode))
      summarize(Sampling.tokenBudgetMixture(docs, col("n_tokens"), budgets,
        salt = "mix"), "exact")
        .unionByName(summarize(Sampling.mixtureByRate(docs, col("n_tokens"),
          budgets, salt = "mix"), "rate"))
    }),

    // rate-based mixture under FORCED SKEW: one synthetic source owns 90%
    // of all documents (the shape where the exact window variant would
    // serialize into a single task — the reason mixtureByRate exists).
    // Decisions are still exact md5 arithmetic, so the oracle replicates
    // membership bit-for-bit; the expected-value fill tolerance and the
    // window-free plan are asserted in ScalaTest (LlmSpec/PlanSpec).
    "q98_mixture_skew" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("source",
          when(col("doc_id") % 10 === 0,
            concat(lit("small"), expr("(doc_id div 10) % 5")))
            .otherwise(lit("big")))
        .withColumn("n_tokens",
          size(split(lower(trim(col("text"))), "\\s+")).cast("long"))
      val budgets = Map("big" -> 100000L, "small0" -> 300L, "small1" -> 600L,
        "small2" -> 900L, "small3" -> 1200L, "small4" -> 1500L)
      Sampling.mixtureByRate(docs, col("n_tokens"), budgets, salt = "skew")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
    }),

    // Gopher-style n-gram repetition signals per document (top-bigram
    // share, duplicated-trigram share) — multiset statistics the
    // distinct/total repetitionRatio can't see
    "q94_repetition" -> ((s, d) => {
      TextAnalysis.repetitionSignals(Tables.documents(s, d))
        .select(col("doc_id"), col("top_bigram_n"),
          col("top_bigram_frac"), col("dup_trigram_frac"))
    }),

    // END-TO-END curation pipeline COMPOSED from the individually-gated
    // operators — token floor → keep-best exact dedup (20 planted copies)
    // → deterministic 50% sample → token-budget mixture → sequence packing
    // — because per-operator gates can't catch composition bugs (a column
    // one stage drops that the next needs, window keys fighting a reused
    // uniform, id collisions across stages). Every stage is md5/integer
    // arithmetic, so ONE DuckDB oracle replicates the whole chain.
    "q107_pipeline_e2e" -> ((s, d) => {
      val docs = LlmQueries.docsWithDups(s, d)
        .withColumn("n_tokens",
          size(split(lower(trim(col("text"))), "\\s+")).cast("long"))
        .filter(col("n_tokens") >= 20)
      val kept = graft.llm.Dedup.exactDedupKeepBest(docs,
        pmod(col("doc_id"), lit(7)))
      val sampled = Sampling.hashSample(kept, col("doc_id"), 0.5, salt = "e2es")
      val budgets = Map("src0" -> 300L, "src1" -> 200L,
        "src2" -> 150L, "src3" -> 100L, "src4" -> 50L)
      val mixed = Sampling.tokenBudgetMixture(sampled, col("n_tokens"),
        budgets, salt = "e2em")
      val packed = graft.llm.Corpus.packSequences(mixed, blockTokens = 128,
        orderCol = "doc_id", tokensCol = "n_tokens")
      packed.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          countDistinct(col("pack_id")).as("n_packs"),
          max(col("pack_id")).cast("long").as("max_pack"))
    }),

    // C4 line-level cleaning (Raffel et al. §2.2) over a fabricated web
    // page corpus: q110's 10-word line structure, then terminal '.' on 3/4
    // of the (doc,line) diagonals, a planted " javascript" token on every
    // 13th diagonal, and doc-level "lorem ipsum" / '{' plants on the
    // %23/%29 residue classes. Every rule fires on real rows (punct-less
    // lines, short tail lines, js lines, both doc-level phrases, and the
    // <3-kept-lines doc floor), and the whole fabrication + filter chain
    // is deterministic string algebra → full oracle.
    "q115_c4_clean" -> ((s, d) => {
      Curation.c4Clean(c4ified(s, d))
        .select(col("doc_id"), col("n_lines"), col("n_kept"), col("text"))
    }),

    // HTML → text extraction: every document wrapped in a deterministic
    // HTML shell exercising all five chain stages (script/style/comment
    // content drop, block tags → newlines, inline tag strip, the named
    // entities incl. the &amp;-last rule, whitespace collapse). The same
    // regexp chain IS the oracle (RE2-compatible patterns on both sides).
    "q136_html_extract" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val html = concat(
        lit("<html><head><script type=\"text/javascript\">var x = 1 < 2;" +
          "</script><style>.m{color:red}</style></head><body>" +
          "<!-- nav bar --><div class=\"main\"><h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1><p>"), col("text"),
        lit("</p><ul><li>&amp;amp; stays</li><li>&lt;tag&gt; " +
          "&quot;q&#39;s&quot;&nbsp;end</li></ul></div></body></html>"))
      Curation.extractHtmlText(docs.withColumn("text", html))
        .select(col("doc_id"), col("text"))
    }),

    // markdown -> text: every rule exercised in one fabricated wrapper
    // (heading, blockquote with bold, link + image + inline code, fenced
    // code block that must DROP, bullets, a *** rule) around each doc
    "q164_markdown_extract" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val md = concat(
        lit("# Doc "), col("doc_id").cast("string"),
        lit("\n\n> quoted **intro** line\n\n" +
          "See [the docs](https://ex.com/a?b=1) and " +
          "![alt text](https://img/x.png) plus `inline code` here.\n\n" +
          "```\ncode block line 1\nline 2 with *stars*\n```\n\n" +
          "- item one\n- item two\n\n***\n\n"),
        col("text"))
      Curation.extractMarkdownText(docs.withColumn("text", md))
        .select(col("doc_id"), col("text"))
    }),

    // leakage-hardened holdout: group-holdout split, then DECONTAMINATE
    // the train side against the held-out test docs (planted cross-group
    // exact copies guarantee real contamination to remove). Stage order
    // is the semantics: the test set must exist before train is swept.
    "q168_decontam_holdout" -> ((s, d) => {
      val base = Tables.documents(s, d).withColumn("grp",
        concat(col("source"), lit("#"), (col("doc_id") % 50).cast("string")))
      val planted = Tables.documents(s, d).orderBy("doc_id").limit(15)
        .withColumn("grp", concat(lit("plant#"), col("doc_id").cast("string")))
        .withColumn("doc_id", col("doc_id") + 5000000L)
      val docs = base.unionByName(planted)
      val split = Sampling.groupHoldout(docs, col("grp"),
        Seq("train" -> 0.9, "test" -> 0.1), salt = "dh")
      val train = split.filter(col("split") === "train")
      val test = split.filter(col("split") === "test")
      graft.llm.Corpus.decontaminate(train, test, minShare = 0.2)
        .select(col("doc_id"), col("grp"))
    }),

    // corpus diversity index: mean pairwise token-set Jaccard over the
    // deterministic 10% hash sample — sample membership, every pair, and
    // the mean all replay exactly (round-6 mean)
    "q169_corpus_diversity" -> ((s, d) => {
      graft.llm.Corpus.corpusDiversity(Tables.documents(s, d), rate = 0.1)
    }),

    // format detection over a mixed corpus: every 3rd doc html-wrapped,
    // every 3rd+1 markdown-wrapped, the rest plain — the label (counting
    // rule + two-marker floor + html-wins-ties) replays exactly
    "q167_format_detect" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val mixed = docs.withColumn("text",
        when(col("doc_id") % 3 === 0,
          concat(lit("<html><body><p>"), col("text"),
            lit("</p><div>footer</div></body></html>")))
          .when(col("doc_id") % 3 === 1,
            concat(lit("# Title\n\n- intro item\n\n"), col("text")))
          .otherwise(col("text")))
      mixed.select(col("doc_id"),
        Curation.detectFormat(col("text")).as("format"))
    }),

    // RefinedWeb-style URL canonicalization + per-domain cap: fabricated
    // URLs exercise every normalization rule (case, www, default ports
    // :443/:80, utm_* params amid kept params, fragments, empty paths are
    // covered by the spec), one domain per source, cap 15 preferring
    // longer documents. The rank, the normalized string, and the domain
    // are all exact → full oracle.
    "q116_domain_cap" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("url",
        concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS://WWW."))
            .otherwise(lit("http://")),
          col("source"), lit(".Example.COM"),
          when(col("doc_id") % 2 === 0, lit(":443")).otherwise(lit(":80")),
          lit("/docs/"), col("doc_id").cast("string"),
          when(col("doc_id") % 3 === 0,
            concat(lit("?utm_source=feed&ref="),
              (col("doc_id") % 5).cast("string"), lit("&utm_medium=x")))
            .when(col("doc_id") % 3 === 1,
              concat(lit("?id="), col("doc_id").cast("string")))
            .otherwise(lit("")),
          when(col("doc_id") % 4 === 0, lit("#sec-2")).otherwise(lit(""))))
      Curation.perDomainCap(docs, "url", maxPerDomain = 15,
        priority = col("n_chars"))
        .select(col("doc_id"), col("domain"),
          Curation.normalizeUrl(col("url")).as("url_norm"))
    }),

    // Gopher document-quality rules (Rae et al. A1.1) over a fabricated
    // corpus that makes every rule fire somewhere: all-bullet docs (%31),
    // ellipsis-line docs (%37), hash-bomb docs (%41), numeric-word docs
    // (%43), stop-word plants on even ids (odd ids fail the ≥2-stop-word
    // containment — the corpus only carries 'the' naturally), and the
    // 50-word floor splitting the natural length range. All signals are
    // integer-count ratios → bit-exact, full oracle.
    "q120_gopher_rules" -> ((s, d) => {
      val fab = gopherFab(s, d)
      val sig = TextAnalysis.gopherSignals(col("text"))
      val v = TextAnalysis.gopherRules(col("text"))
      fab.select(col("doc_id"),
        sig.getField("n_words").as("n_words"),
        round(sig.getField("mean_word_len"), 6).as("mean_word_len"),
        sig.getField("hash_ratio").as("hash_ratio"),
        sig.getField("ellipsis_ratio").as("ellipsis_ratio"),
        sig.getField("bullet_line_frac").as("bullet_line_frac"),
        sig.getField("ellipsis_line_frac").as("ellipsis_line_frac"),
        sig.getField("alpha_word_frac").as("alpha_word_frac"),
        sig.getField("stop_hits").as("stop_hits"),
        v.getField("keep").as("keep"),
        concat_ws(",", v.getField("reasons")).as("reasons"))
    }),

    // Unicode canonicalization: accented suffixes planted per residue
    // class — including a DECOMPOSED diaeresis (i + U+0308), which md5
    // treats as a different document until NFC folds it. The oracle is
    // DuckDB's own ICU chain lower(strip_accents(nfc_normalize(…))), so
    // this gate is a genuine cross-library Unicode-semantics check, and
    // the md5 over the normalized text locks the exact output bytes.
    "q122_normalize_text" -> ((s, d) => {
      val fab = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0, lit(" Café RÉSUMÉ"))
            .when(col("doc_id") % 3 === 1, lit(" naïve señor"))
            .otherwise(lit(" voilà Über ça"))).as("text"))
      fab.select(col("doc_id"),
        graft.functions.GraftFunctions.normalizeText(s, col("text")).as("norm"))
        .withColumn("fp", md5(col("norm")))
    }),

    // exact deterministic class rebalancing: every label stratum lands on
    // EXACTLY 50 rows (labels run 44..59 at gate scale, so both over- and
    // under-sampling fire); copies + md5-rank arithmetic replicated in SQL
    "q132_balance_labels" -> ((s, d) => {
      Sampling.balanceLabels(
        Tables.embeddings(s, d).select(col("vec_id"), col("label")),
        "label", targetPerLabel = 50, salt = "bal")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("copy_idx"))
    }),

    // deterministic epoch shuffle + round-robin sharding: the md5 order,
    // the dense rank (range-sort + zipWithIndex — partition-invariant by
    // the sweep), and the mod-shard assignment are all exact
    "q129_epoch_shuffle" -> ((s, d) => {
      Sampling.epochShuffle(Tables.documents(s, d), numShards = 8, epoch = 1)
        .select(col("doc_id"), col("epoch_rank"), col("shard"))
    }),

    // END-TO-END web-curation pipeline COMPOSED from the individually
    // gated operators — C4 line cleaning (q115's fabrication) → Gopher
    // quality verdicts on the CLEANED text (thresholds tuned to the
    // post-clean corpus: 30-word floor, ≥1 stop word) → per-domain cap
    // preferring line-rich docs — because per-operator gates can't catch
    // composition bugs (a bookkeeping column one stage adds colliding
    // with the next, rules reading pre-clean text, the cap ranking on a
    // stale count). ONE DuckDB oracle replays the whole chain.
    "q123_web_curation_e2e" -> ((s, d) => {
      // materialization barrier between the stages: the cleaned text is an
      // expensive higher-order-lambda expression, and lambdas evaluate
      // INTERPRETED (no codegen subexpression elimination) — without the
      // barrier every downstream Gopher signal re-runs the whole cleaning
      // chain per row (~10× amplification, measured 5.8 s → ~1 s).
      // localCheckpoint severs the lineage the optimizer would otherwise
      // inline through (a plain repartition doesn't: filters push through
      // exchanges and re-fuse).
      val cleaned = Curation.c4Clean(c4ified(s, d)).localCheckpoint()
      val quality = cleaned.filter(TextAnalysis.gopherRules(col("text"),
        minWords = 30, minStopHits = 1).getField("keep"))
      val withUrl = quality.withColumn("url",
        concat(lit("https://www."), col("source"),
          lit(".example.com/docs/"), col("doc_id").cast("string")))
      Curation.perDomainCap(withUrl, "url", maxPerDomain = 10,
        priority = col("n_kept"))
        .select(col("doc_id"), col("domain"), col("n_lines"), col("n_kept"))
    })
  )

  /** Fabricated Gopher input (shared gate/oracle arithmetic): 10-word line
    * structure, bullet prefixes on the %5 diagonals (all lines for %31
    * docs), ellipsis suffixes on even lines of %37 docs, then doc-level
    * hash-bomb / numeric-word / stop-word plant lines. */
  private def gopherFab(s: SparkSession, d: String): DataFrame = {
    val prep = Tables.documents(s, d).select(col("doc_id"),
      regexp_replace(col("text"), "((\\S+ ){9}\\S+) ", "$1\n").as("text"))
    prep.withColumn("text",
        array_join(
          transform(split(col("text"), "\n"), (l, i) =>
            concat(
              when(col("doc_id") % 31 === 0 || (col("doc_id") + i) % 5 === 0,
                lit("• ")).otherwise(lit("")),
              l,
              when(col("doc_id") % 37 === 0 && i % 2 === 0, lit("..."))
                .otherwise(lit("")))),
          "\n"))
      .withColumn("text",
        when(col("doc_id") % 41 === 0,
          concat(col("text"), lit("\n# # # # # # # # # # # #")))
          .otherwise(col("text")))
      .withColumn("text",
        when(col("doc_id") % 43 === 0,
          concat(col("text"),
            lit("\n0 1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9"
              + " 0 1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9")))
          .otherwise(col("text")))
      .withColumn("text",
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit("\nwe prefer to think of and that")))
          .otherwise(col("text")))
  }

  /** Fabricated C4 input (shared by gate and oracle): q110's 10-word line
    * regexp, then per-line deterministic plants via an index-aware
    * transform — the same arithmetic the oracle replays with
    * list_transform over range(). */
  private def c4ified(s: SparkSession, d: String): DataFrame = {
    // spread the single-row-group documents scan: the fabrication's regexp
    // + index transform and the downstream line/signal lambdas otherwise
    // serialize onto ONE task (test-data layout artifact; q130's note)
    val docs = Tables.documents(s, d)
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val prep = docs.select(col("doc_id"), col("source"),
      regexp_replace(col("text"), "((\\S+ ){9}\\S+) ", "$1\n").as("text"))
    prep.withColumn("text",
        array_join(
          transform(split(col("text"), "\n"), (l, i) =>
            concat(l,
              when((col("doc_id") * 7 + i) % 13 === 0, lit(" javascript"))
                .otherwise(lit("")),
              when((col("doc_id") + i) % 4 =!= 0, lit(".")).otherwise(lit("")))),
          "\n"))
      .withColumn("text",
        when(col("doc_id") % 23 === 0,
          concat(col("text"), lit("\nthis page uses lorem ipsum filler text.")))
          .otherwise(col("text")))
      .withColumn("text",
        when(col("doc_id") % 29 === 0,
          concat(col("text"), lit("\nwindow.onload = function() { init(); }.")))
          .otherwise(col("text")))
  }

  /** DuckDB replication of [[Sampling.hashUniform]] over a precomputed
    * md5-hex column: Σ nibble_i · 16^(6-i) / 16^7 (strpos is 1-based;
    * nibble value = index in the hex alphabet − 1). */
  private[queries] def hashUniformSql(hexCol: String): String = {
    val nib = (0 until 7).map { i =>
      s"(strpos('0123456789abcdef', substring($hexCol, ${i + 1}, 1)) - 1)" +
        s" * ${1L << (4 * (6 - i))}"
    }.mkString(" + ")
    s"(($nib) / 268435456.0)"
  }

  private val budgetCase =
    """CASE source WHEN 'src0' THEN 3000 WHEN 'src1' THEN 2000
      |     WHEN 'src2' THEN 1500 WHEN 'src3' THEN 1000
      |     WHEN 'src4' THEN 500 ELSE 0 END""".stripMargin

  val oracles: Map[String, String] = Map(
    "q184_anchor_texts" ->
      """WITH fab AS (SELECT doc_id,
        |  '<div><a href="https://site' || CAST(doc_id % 7 AS VARCHAR)
        |  || '.example.com/p/' || CAST(doc_id AS VARCHAR)
        |  || '">doc ' || CAST(doc_id AS VARCHAR)
        |  || ' page</a> text <A class="x" HREF="/relative/'
        |  || CAST(doc_id AS VARCHAR) || '"> rel link </A>'
        |  || CASE WHEN doc_id % 3 = 0
        |       THEN ' <a href="http://mirror.example.org/d?id='
        |            || CAST(doc_id AS VARCHAR) || '">mirror</a>'
        |       ELSE '' END
        |  || '</div>' AS html FROM documents),
        |l AS (SELECT doc_id,
        |        regexp_extract_all(html,
        |          '(?i)<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 1) AS links,
        |        regexp_extract_all(html,
        |          '(?i)<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 2) AS anchors
        |      FROM fab),
        |g AS (SELECT doc_id, links, anchors,
        |        unnest(range(0, len(links))) AS i FROM l)
        |SELECT doc_id, links[i+1] AS link, trim(anchors[i+1]) AS anchor,
        |       regexp_extract(links[i+1],
        |         '(?i)^https?://([^/?#]+)', 1) AS link_host
        |FROM g""".stripMargin,

    "q180_fix_mojibake" -> {
      val fabbed = "'CafÃ© donâ€™t â€œquoteâ€¦ â€” naÃ±a straÃŸe 10Â° " +
        "Â«okÂ» Ã¼ber Ã  la ' || text"
      val chain = Curation.mojibakeTable.foldLeft(s"($fabbed)") {
        case (acc, (bad, good)) => s"replace($acc, '$bad', '$good')"
      }
      s"SELECT doc_id, $chain AS text FROM documents"
    },

    "q179_host_pagerank" ->
      """WITH e0 AS (
        |  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS src,
        |         'site' || CAST((doc_id*3+1) % 7 AS VARCHAR) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS src,
        |         'mirror' AS dst
        |  FROM documents WHERE doc_id % 3 = 0),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |nodes AS (SELECT DISTINCT node FROM
        |            (SELECT src AS node FROM e0 UNION SELECT dst FROM e0)),
        |od AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY 1),
        |base AS (SELECT n.node, coalesce(od.outdeg, 0) AS outdeg
        |         FROM nodes n LEFT JOIN od USING (node)),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base),
        |r0 AS (SELECT node, outdeg, 1.0/nn.n AS rank FROM base CROSS JOIN nn),
        |d1 AS (SELECT sum(CASE WHEN outdeg = 0 THEN rank ELSE 0 END) AS dm FROM r0),
        |c1 AS (SELECT e.dst AS node, sum(r.rank / r.outdeg) AS inr
        |       FROM e JOIN r0 r ON r.node = e.src GROUP BY 1),
        |r1 AS (SELECT b.node, b.outdeg,
        |         (1 - 0.85)/nn.n + 0.85*(coalesce(c1.inr, 0) + d1.dm/nn.n) AS rank
        |       FROM base b LEFT JOIN c1 USING (node) CROSS JOIN nn CROSS JOIN d1),
        |d2 AS (SELECT sum(CASE WHEN outdeg = 0 THEN rank ELSE 0 END) AS dm FROM r1),
        |c2 AS (SELECT e.dst AS node, sum(r.rank / r.outdeg) AS inr
        |       FROM e JOIN r1 r ON r.node = e.src GROUP BY 1),
        |r2 AS (SELECT b.node, b.outdeg,
        |         (1 - 0.85)/nn.n + 0.85*(coalesce(c2.inr, 0) + d2.dm/nn.n) AS rank
        |       FROM base b LEFT JOIN c2 USING (node) CROSS JOIN nn CROSS JOIN d2),
        |d3 AS (SELECT sum(CASE WHEN outdeg = 0 THEN rank ELSE 0 END) AS dm FROM r2),
        |c3 AS (SELECT e.dst AS node, sum(r.rank / r.outdeg) AS inr
        |       FROM e JOIN r2 r ON r.node = e.src GROUP BY 1),
        |r3 AS (SELECT b.node, b.outdeg,
        |         (1 - 0.85)/nn.n + 0.85*(coalesce(c3.inr, 0) + d3.dm/nn.n) AS rank
        |       FROM base b LEFT JOIN c3 USING (node) CROSS JOIN nn CROSS JOIN d3)
        |SELECT node, round(rank, 6) AS rank FROM r3""".stripMargin,

    "q174_link_extract" ->
      """WITH fab AS (SELECT doc_id,
        |  '<div><a href="https://site' || CAST(doc_id % 7 AS VARCHAR)
        |  || '.example.com/p/' || CAST(doc_id AS VARCHAR)
        |  || '">first</a> text <A class="x" HREF="/relative/'
        |  || CAST(doc_id AS VARCHAR) || '">rel</A>'
        |  || CASE WHEN doc_id % 3 = 0
        |       THEN ' <a href="http://mirror.example.org/d?id='
        |            || CAST(doc_id AS VARCHAR) || '">m</a>'
        |       ELSE '' END
        |  || '</div>' AS html FROM documents),
        |l AS (SELECT doc_id,
        |        unnest(regexp_extract_all(html,
        |          '(?i)<a\s[^>]*href="([^"]*)"', 1)) AS link
        |      FROM fab)
        |SELECT doc_id, link,
        |       regexp_extract(link, '(?i)^https?://([^/?#]+)', 1) AS link_host
        |FROM l""".stripMargin,

    "q189_weighted_sample" -> {
      val nibsum = (0 until 7).map { i =>
        s"(strpos('0123456789abcdef', substring(hx, ${i + 1}, 1)) - 1)" +
          s" * ${1L << (4 * (6 - i))}"
      }.mkString(" + ")
      s"""WITH h AS (SELECT doc_id, lang, source,
         |             len(string_split_regex(lower(trim(text)), '\\s+')) AS wt,
         |             md5(concat(CAST(doc_id AS VARCHAR), ':wk')) AS hx
         |           FROM documents),
         |e AS (SELECT doc_id, lang, source,
         |        round(-ln((($nibsum) + 0.5) / 268435456.0) / wt, 12) AS e
         |      FROM h WHERE wt > 0)
         |SELECT doc_id, lang, source FROM e ORDER BY e, doc_id LIMIT 50""".stripMargin
    },

    "q190_template_fp" ->
      """WITH fab AS (SELECT doc_id,
        |  '<html><head><title>t</title></head><body><div class="a"><p>'
        |  || text || '</p>'
        |  || CASE WHEN right(source, 1) IN ('1','3','5','7','9')
        |       THEN '<aside><ul><li>x</li></ul></aside>' ELSE '' END
        |  || '</div></body></html>' AS html
        |  FROM documents),
        |t AS (SELECT doc_id,
        |        regexp_extract_all(lower(html), '<\s*([a-z][a-z0-9]*)', 1) AS tags
        |      FROM fab)
        |SELECT doc_id, md5(array_to_string(tags, ' ')) AS template_fp,
        |       CAST(len(tags) AS BIGINT) AS n_tags
        |FROM t""".stripMargin,

    "q92_hash_sample" ->
      s"""WITH h AS (SELECT doc_id,
         |             md5(concat(CAST(doc_id AS VARCHAR), ':mix')) AS hx
         |           FROM documents),
         |u AS (SELECT doc_id, ${hashUniformSql("hx")} AS u FROM h)
         |SELECT doc_id, u FROM u WHERE u < 0.1""".stripMargin,

    "q140_dsir_resample" -> {
      // 28-bit md5-nibble hash of a gram, mod 512 — Dsir.gramBucket
      val nibsum = (0 until 7).map { i =>
        s"(strpos('0123456789abcdef', substring(hx, ${i + 1}, 1)) - 1)" +
          s" * ${1L << (4 * (6 - i))}"
      }.mkString(" + ")
      s"""WITH ws AS (SELECT doc_id, lang,
         |              string_split_regex(lower(trim(text)), '\\s+') AS w
         |            FROM documents),
         |uni AS (SELECT doc_id, lang, w[i] AS gram
         |        FROM ws, unnest(range(1, len(w) + 1)) AS u(i)
         |        WHERE length(w[i]) > 0),
         |bi AS (SELECT doc_id, lang, w[i-1] || ' ' || w[i] AS gram
         |       FROM ws, unnest(range(2, len(w) + 1)) AS u(i)
         |       WHERE length(w[i]) > 0 AND length(w[i-1]) > 0),
         |grams AS (SELECT doc_id, lang, md5(gram) AS hx FROM uni
         |          UNION ALL SELECT doc_id, lang, md5(gram) FROM bi),
         |gb AS (SELECT doc_id, lang, ($nibsum) % 512 AS bucket FROM grams),
         |qm AS (SELECT bucket, count(*) AS cq FROM gb GROUP BY 1),
         |tm AS (SELECT bucket, count(*) AS ct FROM gb
         |       WHERE lang = 'en' GROUP BY 1),
         |tt AS (SELECT sum(ct) AS t FROM tm),
         |tq AS (SELECT sum(cq) AS t FROM qm),
         |db AS (SELECT doc_id, bucket, count(*) AS dc FROM gb GROUP BY 1, 2),
         |lw AS (SELECT doc_id, CAST(sum(dc) AS BIGINT) AS n_grams,
         |         round(sum(dc * (ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE)
         |                            / (tt.t + 512))
         |                       - ln(CAST(coalesce(cq, 0) + 1 AS DOUBLE)
         |                            / (tq.t + 512)))), 6) AS log_weight
         |       FROM db LEFT JOIN tm USING (bucket)
         |       LEFT JOIN qm USING (bucket)
         |       CROSS JOIN tt CROSS JOIN tq GROUP BY doc_id),
         |nz AS (SELECT doc_id, n_grams, log_weight,
         |              md5(concat(CAST(doc_id AS VARCHAR), ':dsir'))
         |                AS hx
         |       FROM lw),
         |sc AS (SELECT doc_id, n_grams, log_weight,
         |         round(log_weight
         |               + (-ln(-ln((($nibsum) + 0.5) / 268435456.0))),
         |           6) AS score
         |       FROM nz)
         |SELECT doc_id, n_grams, log_weight, score
         |FROM sc ORDER BY score DESC, doc_id LIMIT 100""".stripMargin
    },

    "q141_unimax" ->
      """WITH n AS (
        |  SELECT lang,
        |         CAST(sum(len(list_filter(
        |           string_split_regex(lower(trim(text)), '\s+'),
        |           w -> length(w) > 0))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang),
        |c AS (SELECT lang, n_tokens, 2.0 * n_tokens AS cap,
        |        row_number() OVER (ORDER BY 2.0 * n_tokens, lang) AS rn,
        |        count(*) OVER () AS nl,
        |        coalesce(sum(2.0 * n_tokens)
        |          OVER (ORDER BY 2.0 * n_tokens, lang
        |                ROWS BETWEEN UNBOUNDED PRECEDING
        |                AND 1 PRECEDING), 0) AS cumbefore
        |      FROM n),
        |f AS (SELECT *,
        |        CASE WHEN cap <= (40000 - cumbefore) / (nl - rn + 1)
        |             THEN 1 ELSE 0 END AS fits
        |      FROM c),
        |agg AS (SELECT sum(CASE WHEN fits = 1 THEN 1 ELSE 0 END) AS k,
        |               sum(CASE WHEN fits = 1 THEN cap ELSE 0 END)
        |                 AS capsum,
        |               count(*) AS nl2
        |        FROM f)
        |SELECT lang, n_tokens, cap,
        |       round(CASE WHEN fits = 1 THEN cap
        |                  ELSE (40000 - capsum) / (nl2 - k) END, 6)
        |         AS alloc_tokens,
        |       round((CASE WHEN fits = 1 THEN cap
        |                   ELSE (40000 - capsum) / (nl2 - k) END)
        |             / n_tokens, 6) AS epochs
        |FROM f CROSS JOIN agg""".stripMargin,

    "q154_ccnet_band" ->
      """WITH refw AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents WHERE lang = 'en'),
        |refc AS (SELECT word, count(*) AS c FROM refw
        |         WHERE length(word) > 0 GROUP BY word),
        |tot AS (SELECT sum(c) AS t, count(*) AS v FROM refc),
        |dw AS (
        |  SELECT doc_id, word, count(*) AS dc FROM (
        |    SELECT doc_id,
        |           unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |    FROM documents)
        |  WHERE length(word) > 0 GROUP BY doc_id, word),
        |ce AS (SELECT doc_id, CAST(sum(dc) AS BIGINT) AS n_tokens,
        |         round(-sum(dc * ln(CAST(coalesce(c + 1, 1) AS DOUBLE)
        |                            / (t + v + 1))) / sum(dc), 6) AS score
        |       FROM dw LEFT JOIN refc USING (word) CROSS JOIN tot
        |       GROUP BY doc_id),
        |th AS (SELECT quantile_cont(score, 0.25) AS lo,
        |              quantile_cont(score, 0.75) AS hi FROM ce)
        |SELECT doc_id, n_tokens, score
        |FROM ce CROSS JOIN th
        |WHERE score >= lo AND score <= hi""".stripMargin,

    "q162_domain_blocklist" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |         'https://'
        |         || (CASE WHEN doc_id % 5 = 0 THEN 'cdn.' ELSE '' END)
        |         || source || '.example.com/page/'
        |         || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |h AS (SELECT doc_id, source,
        |        regexp_replace(regexp_replace(
        |          lower(regexp_extract(regexp_replace(url, '#.*$', ''),
        |            '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)),
        |          '^www\.', ''), ':443$', '') AS host
        |      FROM u),
        |bl(domain) AS (VALUES ('src3.example.com'), ('src7.example.com'))
        |SELECT doc_id, source FROM h
        |WHERE NOT EXISTS (SELECT 1 FROM bl
        |                  WHERE h.host = bl.domain
        |                     OR h.host LIKE '%.' || bl.domain)""".stripMargin,

    "q161_quality_pipeline" ->
      """WITH posw AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents WHERE lang = 'en'),
        |posc AS (SELECT word, count(*) AS cp FROM posw
        |         WHERE length(word) > 0 GROUP BY word),
        |negw AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents WHERE lang <> 'en'),
        |negc AS (SELECT word, count(*) AS cn FROM negw
        |         WHERE length(word) > 0 GROUP BY word),
        |m AS (SELECT (SELECT sum(cp) FROM posc) AS tp,
        |             (SELECT count(*) FROM posc) AS vp,
        |             (SELECT sum(cn) FROM negc) AS tn,
        |             (SELECT count(*) FROM negc) AS vn,
        |             ln(CAST((SELECT count(*) FROM documents
        |                      WHERE lang = 'en') AS DOUBLE))
        |           - ln(CAST((SELECT count(*) FROM documents
        |                      WHERE lang <> 'en') AS DOUBLE)) AS pr),
        |dw AS (
        |  SELECT doc_id, word, count(*) AS dc FROM (
        |    SELECT doc_id,
        |           unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |    FROM documents)
        |  WHERE length(word) > 0 GROUP BY doc_id, word),
        |nb AS (SELECT doc_id,
        |         any_value(pr)
        |           + sum(dc * (ln(CAST(coalesce(cp + 1, 1) AS DOUBLE)
        |                          / (tp + vp + 1))
        |                     - ln(CAST(coalesce(cn + 1, 1) AS DOUBLE)
        |                          / (tn + vn + 1)))) AS lo
        |       FROM dw LEFT JOIN posc USING (word)
        |                LEFT JOIN negc USING (word) CROSS JOIN m
        |       GROUP BY doc_id),
        |kept AS (SELECT doc_id FROM nb WHERE lo > 0),
        |tot AS (SELECT sum(cp) AS t, count(*) AS v FROM posc),
        |ce AS (SELECT doc_id, CAST(sum(dc) AS BIGINT) AS n_tokens,
        |         round(-sum(dc * ln(CAST(coalesce(cp + 1, 1) AS DOUBLE)
        |                            / (t + v + 1))) / sum(dc), 6) AS score
        |       FROM dw JOIN kept USING (doc_id)
        |               LEFT JOIN posc USING (word) CROSS JOIN tot
        |       GROUP BY doc_id),
        |th AS (SELECT quantile_cont(score, 0.25) AS lo,
        |              quantile_cont(score, 0.75) AS hi FROM ce)
        |SELECT doc_id, n_tokens, score
        |FROM ce CROSS JOIN th
        |WHERE score >= lo AND score <= hi""".stripMargin,

    "q159_group_quantile" ->
      """WITH th AS (
        |  SELECT lang,
        |    round(quantile_cont(CAST(n_chars AS DOUBLE), 0.25), 6) AS t1,
        |    round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS t2,
        |    round(quantile_cont(CAST(n_chars AS DOUBLE), 0.75), 6) AS t3
        |  FROM documents GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |       CAST(CASE WHEN t1 <= d.n_chars THEN 1 ELSE 0 END
        |          + CASE WHEN t2 <= d.n_chars THEN 1 ELSE 0 END
        |          + CASE WHEN t3 <= d.n_chars THEN 1 ELSE 0 END AS BIGINT)
        |         AS q_bucket
        |FROM documents d JOIN th USING (lang)""".stripMargin,

    "q158_readability" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         regexp_extract_all(lower(text), '[a-z]+') AS ws,
        |         greatest(1, len(regexp_extract_all(text, '[.!?]+')))
        |           AS n_sent
        |  FROM documents),
        |f AS (SELECT doc_id,
        |        CAST(len(ws) AS BIGINT) AS n_words,
        |        CAST(n_sent AS BIGINT) AS n_sentences,
        |        CAST(list_sum(list_transform(ws, x ->
        |          greatest(1, len(regexp_extract_all(x, '[aeiouy]+')))))
        |          AS BIGINT) AS n_syllables
        |      FROM w WHERE len(ws) > 0)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |       round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
        |             + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
        |             - 15.59, 6) AS fk_grade,
        |       round(206.835
        |             - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
        |             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
        |         AS reading_ease
        |FROM f""".stripMargin,

    "q156_nb_classifier" ->
      """WITH posw AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents WHERE lang = 'en'),
        |posc AS (SELECT word, count(*) AS cp FROM posw
        |         WHERE length(word) > 0 GROUP BY word),
        |negw AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents WHERE lang <> 'en'),
        |negc AS (SELECT word, count(*) AS cn FROM negw
        |         WHERE length(word) > 0 GROUP BY word),
        |m AS (SELECT (SELECT sum(cp) FROM posc) AS tp,
        |             (SELECT count(*) FROM posc) AS vp,
        |             (SELECT sum(cn) FROM negc) AS tn,
        |             (SELECT count(*) FROM negc) AS vn,
        |             ln(CAST((SELECT count(*) FROM documents
        |                      WHERE lang = 'en') AS DOUBLE))
        |           - ln(CAST((SELECT count(*) FROM documents
        |                      WHERE lang <> 'en') AS DOUBLE)) AS pr),
        |dw AS (
        |  SELECT doc_id, word, count(*) AS dc FROM (
        |    SELECT doc_id,
        |           unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |    FROM documents)
        |  WHERE length(word) > 0 GROUP BY doc_id, word),
        |sc AS (SELECT doc_id, CAST(sum(dc) AS BIGINT) AS n_tokens,
        |         any_value(pr)
        |           + sum(dc * (ln(CAST(coalesce(cp + 1, 1) AS DOUBLE)
        |                          / (tp + vp + 1))
        |                     - ln(CAST(coalesce(cn + 1, 1) AS DOUBLE)
        |                          / (tn + vn + 1)))) AS lo
        |       FROM dw LEFT JOIN posc USING (word)
        |                LEFT JOIN negc USING (word) CROSS JOIN m
        |       GROUP BY doc_id)
        |SELECT doc_id, n_tokens, round(lo, 6) AS log_odds,
        |       CAST(CASE WHEN lo > 0 THEN 1 ELSE 0 END AS BIGINT) AS pred_pos
        |FROM sc""".stripMargin,

    "q153_blocklist" ->
      """WITH t AS (SELECT doc_id,
        |             list_sort(list_intersect(
        |               list_distinct(list_filter(
        |                 string_split_regex(lower(trim(text)), '\s+'),
        |                 w -> length(w) > 0)),
        |               ['batch', 'dup', 'hash'])) AS m
        |           FROM documents)
        |SELECT doc_id, CAST(len(m) AS BIGINT) AS n_blocked,
        |       coalesce(array_to_string(m, ','), '') AS blocked_terms
        |FROM t""".stripMargin,

    "q149_exact_sample" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |             md5(concat(CAST(doc_id AS VARCHAR), ':xk9')) AS hx
         |           FROM documents),
         |u AS (SELECT doc_id, lang, ${hashUniformSql("hx")} AS u FROM h),
         |g AS (SELECT doc_id, lang FROM u ORDER BY u, doc_id LIMIT 100),
         |p AS (SELECT doc_id, lang,
         |        row_number() OVER (PARTITION BY lang ORDER BY u, doc_id)
         |          AS rn
         |      FROM u)
         |SELECT 'global' AS mode, doc_id, lang FROM g
         |UNION ALL
         |SELECT 'per_lang', doc_id, lang FROM p WHERE rn <= 20""".stripMargin,

    "q143_temperature_mixture" ->
      """WITH n AS (
        |  SELECT lang,
        |         CAST(sum(len(list_filter(
        |           string_split_regex(lower(trim(text)), '\s+'),
        |           w -> length(w) > 0))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang),
        |z AS (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY lang)
        |        AS z FROM n)
        |SELECT lang, n_tokens,
        |       round(sqrt(CAST(n_tokens AS DOUBLE)) / z.z, 6) AS share,
        |       round(40000 * (sqrt(CAST(n_tokens AS DOUBLE)) / z.z), 6)
        |         AS alloc_tokens,
        |       round(40000 * (sqrt(CAST(n_tokens AS DOUBLE)) / z.z)
        |             / n_tokens, 6) AS epochs
        |FROM n CROSS JOIN z""".stripMargin,

    "q142_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
        |            FROM documents
        |            WHERE text IS NOT NULL AND length(text) > 0),
        |cc AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS k
        |       FROM ch GROUP BY 1, 2),
        |n AS (SELECT doc_id, sum(k) AS n FROM cc GROUP BY 1)
        |SELECT cc.doc_id,
        |       CAST(n.n AS BIGINT) AS n_cp,
        |       CAST(count(*) AS INT) AS n_distinct,
        |       round(-sum((k / n.n) * (ln(k / n.n) / ln(2)) ORDER BY c), 6)
        |         AS entropy,
        |       round(max(k) / n.n, 6) AS max_char_ratio
        |FROM cc JOIN n USING (doc_id)
        |GROUP BY cc.doc_id, n.n""".stripMargin,

    "q144_feature_profile" -> {
      val psList = "[0.1, 0.25, 0.5, 0.75, 0.9, 0.99]"
      s"""WITH f AS (SELECT
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END
         |      AS DOUBLE) AS n_tokens,
         |    CAST(length(text) AS DOUBLE) AS n_chars,
         |    CAST(len(string_split(text, chr(10))) AS DOUBLE) AS n_lines
         |  FROM documents),
         |q AS (SELECT quantile_cont(n_tokens, $psList) AS qt,
         |             quantile_cont(n_chars, $psList) AS qc,
         |             quantile_cont(n_lines, $psList) AS ql
         |      FROM f),
         |x AS (SELECT unnest(generate_series(1, 6)) AS i)
         |SELECT 'n_tokens' AS feature, ($psList)[i] AS p,
         |       round(qt[i], 6) AS value FROM q, x
         |UNION ALL
         |SELECT 'n_chars', ($psList)[i], round(qc[i], 6) FROM q, x
         |UNION ALL
         |SELECT 'n_lines', ($psList)[i], round(ql[i], 6) FROM q, x""".stripMargin
    },

    "q139_group_holdout" ->
      s"""WITH g AS (SELECT source || '#' || CAST(doc_id % 50 AS VARCHAR)
         |             AS grp
         |           FROM documents),
         |h AS (SELECT grp, md5(concat(grp, ':hold')) AS hx FROM g),
         |u AS (SELECT grp, ${hashUniformSql("hx")} AS u FROM h)
         |SELECT grp,
         |       CASE WHEN u < 0.8 THEN 'train'
         |            WHEN u < 0.9 THEN 'valid'
         |            ELSE 'test' END AS split,
         |       count(*) AS n
         |FROM u GROUP BY 1, 2""".stripMargin,

    "q93_token_mixture" ->
      s"""WITH d AS (SELECT doc_id, source,
         |             CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
         |                  AS BIGINT) AS n_tokens,
         |             md5(concat(CAST(doc_id AS VARCHAR), ':mix')) AS hx
         |           FROM documents),
         |u AS (SELECT doc_id, source, n_tokens,
         |             ${hashUniformSql("hx")} AS u,
         |             $budgetCase AS budget
         |      FROM d),
         |x AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source
         |                                    ORDER BY u, doc_id
         |                                    ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM u),
         |ex AS (SELECT source, count(*) AS n_docs,
         |              CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |              'exact' AS mode
         |       FROM x WHERE cum - n_tokens < budget GROUP BY source),
         |tot AS (SELECT source, sum(n_tokens) AS tot FROM d GROUP BY source),
         |rt AS (SELECT source, count(*) AS n_docs,
         |             CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |             'rate' AS mode
         |       FROM (SELECT u.*, least(1.0, CAST(u.budget AS DOUBLE) / t.tot) AS r
         |             FROM u JOIN tot t USING (source))
         |       WHERE u < r GROUP BY source)
         |SELECT * FROM ex UNION ALL SELECT * FROM rt""".stripMargin,

    "q98_mixture_skew" ->
      s"""WITH d AS (SELECT doc_id,
         |             CASE WHEN doc_id % 10 = 0
         |                  THEN concat('small', CAST((doc_id // 10) % 5 AS VARCHAR))
         |                  ELSE 'big' END AS source,
         |             CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
         |                  AS BIGINT) AS n_tokens,
         |             md5(concat(CAST(doc_id AS VARCHAR), ':skew')) AS hx
         |           FROM documents),
         |u AS (SELECT doc_id, source, n_tokens, ${hashUniformSql("hx")} AS u,
         |             CASE source WHEN 'big' THEN 100000
         |                  WHEN 'small0' THEN 300 WHEN 'small1' THEN 600
         |                  WHEN 'small2' THEN 900 WHEN 'small3' THEN 1200
         |                  WHEN 'small4' THEN 1500 ELSE 0 END AS budget
         |      FROM d),
         |tot AS (SELECT source, sum(n_tokens) AS tot FROM u GROUP BY source)
         |SELECT source, count(*) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |FROM (SELECT u.*, least(1.0, CAST(u.budget AS DOUBLE) / t.tot) AS r
         |      FROM u JOIN tot t USING (source))
         |WHERE u < r GROUP BY source""".stripMargin,

    "q94_repetition" ->
      """WITH t AS (SELECT doc_id,
        |             string_split_regex(lower(trim(text)), '\s+') AS t
        |           FROM documents),
        |g2 AS (SELECT doc_id, unnest(
        |         CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
        |              ELSE list_transform(range(1, len(t)),
        |                                  i -> array_to_string(t[i:i+1], ' '))
        |         END) AS g FROM t),
        |g3 AS (SELECT doc_id, unnest(
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_transform(range(1, len(t) - 1),
        |                                  i -> array_to_string(t[i:i+2], ' '))
        |         END) AS g FROM t),
        |c2 AS (SELECT doc_id, g, count(*) AS n FROM g2 GROUP BY 1, 2),
        |c3 AS (SELECT doc_id, g, count(*) AS n FROM g3 GROUP BY 1, 2),
        |b AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS top_bigram_n,
        |             sum(n) AS n_bi FROM c2 GROUP BY 1),
        |tr AS (SELECT doc_id,
        |             sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS n_dup,
        |             sum(n) AS n_tri FROM c3 GROUP BY 1)
        |SELECT b.doc_id, top_bigram_n,
        |       CAST(top_bigram_n AS DOUBLE) / n_bi AS top_bigram_frac,
        |       CAST(n_dup AS DOUBLE) / n_tri AS dup_trigram_frac
        |FROM b JOIN tr USING (doc_id)""".stripMargin,

    // the whole composed chain in one statement: token floor → keep-best
    // (q96's window) → 50% hash sample (q92's uniform, salt e2es) →
    // budget mixture (q93's cumsum rule, salt e2em) → packing (q71's
    // block arithmetic) → per-source summary
    "q107_pipeline_e2e" ->
      s"""WITH alldocs AS (
         |  SELECT doc_id, source, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, source, text FROM
         |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
         |f AS (SELECT doc_id, source, text,
         |        CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
         |             AS BIGINT) AS n_tokens
         |      FROM alldocs
         |      WHERE len(string_split_regex(lower(trim(text)), '\\s+')) >= 20),
         |k AS (SELECT *, row_number() OVER (
         |        PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |        ORDER BY doc_id % 7 DESC, doc_id) AS rk
         |      FROM f),
         |smp AS (SELECT doc_id, source, n_tokens,
         |          ${hashUniformSql("md5(concat(CAST(doc_id AS VARCHAR), ':e2es'))")} AS us
         |        FROM k WHERE rk = 1),
         |m AS (SELECT doc_id, source, n_tokens,
         |        ${hashUniformSql("md5(concat(CAST(doc_id AS VARCHAR), ':e2em'))")} AS um,
         |        CASE source WHEN 'src0' THEN 300 WHEN 'src1' THEN 200
         |             WHEN 'src2' THEN 150 WHEN 'src3' THEN 100
         |             WHEN 'src4' THEN 50 ELSE 0 END AS budget
         |      FROM smp WHERE us < 0.5),
         |x AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source
         |                                    ORDER BY um, doc_id
         |                                    ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM m),
         |mixed AS (SELECT doc_id, source, n_tokens FROM x
         |          WHERE cum - n_tokens < budget),
         |p AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source
         |                                    ORDER BY doc_id
         |                                    ROWS UNBOUNDED PRECEDING) AS pcum
         |      FROM mixed),
         |packed AS (SELECT *, CAST(floor((pcum - n_tokens) / 128.0) AS BIGINT)
         |                       AS pack_id FROM p)
         |SELECT source, count(*) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |       count(DISTINCT pack_id) AS n_packs,
         |       CAST(max(pack_id) AS BIGINT) AS max_pack
         |FROM packed GROUP BY source""".stripMargin,

    // fabrication (line structure + plants) replayed with list_transform
    // over range(); then C4's exact line rules in list_filter and the two
    // doc-level phrase checks
    "q169_corpus_diversity" ->
      s"""WITH hx AS (SELECT doc_id, text,
         |              md5(concat(CAST(doc_id AS VARCHAR), ':div')) AS hx
         |            FROM documents),
         |samp AS (SELECT doc_id, text FROM hx
         |         WHERE ${hashUniformSql("hx")} < 0.1),
         |s AS (SELECT doc_id,
         |        list_distinct(list_filter(
         |          string_split_regex(lower(trim(text)), '\\s+'),
         |          w -> length(w) > 0)) AS t
         |      FROM samp),
         |s2 AS (SELECT doc_id, t FROM s WHERE len(t) > 0),
         |p AS (SELECT CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
         |             / len(list_distinct(list_concat(a.t, b.t))) AS j
         |      FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id)
         |SELECT (SELECT count(*) FROM s2) AS n_docs_sampled,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       round(avg(j), 6) AS mean_jaccard
         |FROM p""".stripMargin,

    "q168_decontam_holdout" ->
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |         source || '#' || CAST(doc_id % 50 AS VARCHAR) AS grp
         |  FROM documents),
         |plant AS (
         |  SELECT doc_id + 5000000 AS doc_id, text,
         |         'plant#' || CAST(doc_id AS VARCHAR) AS grp
         |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 15)),
         |docs AS (SELECT * FROM base UNION ALL SELECT * FROM plant),
         |h AS (SELECT *, md5(concat(grp, ':dh')) AS hx FROM docs),
         |u AS (SELECT doc_id, text, grp, ${hashUniformSql("hx")} AS u FROM h),
         |sp AS (SELECT doc_id, text, grp,
         |         CASE WHEN u < 0.9 THEN 'train' ELSE 'test' END AS split
         |       FROM u),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         |         ELSE list_transform(range(1, len(t) - 1),
         |                             i -> array_to_string(t[i:i+2], ' '))
         |    END)) AS s
         |  FROM (SELECT doc_id,
         |          string_split_regex(lower(trim(text)), '\\s+') AS t
         |        FROM sp)),
         |test AS (SELECT sh.* FROM sh JOIN sp USING (doc_id)
         |         WHERE sp.split = 'test'),
         |train AS (SELECT sh.* FROM sh JOIN sp USING (doc_id)
         |          WHERE sp.split = 'train'),
         |tsize AS (SELECT doc_id AS test_id, count(*) AS n_test
         |          FROM test GROUP BY 1),
         |bad AS (
         |  SELECT DISTINCT tr.doc_id
         |  FROM train tr JOIN test te ON tr.s = te.s
         |  JOIN tsize ON tsize.test_id = te.doc_id
         |  GROUP BY tr.doc_id, te.doc_id, n_test
         |  HAVING CAST(count(*) AS DOUBLE) / n_test >= 0.2)
         |SELECT doc_id, grp FROM sp
         |WHERE split = 'train'
         |  AND doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin,

    "q167_format_detect" ->
      """WITH mixed AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |           THEN '<html><body><p>' || text ||
        |                '</p><div>footer</div></body></html>'
        |         WHEN doc_id % 3 = 1
        |           THEN '# Title' || chr(10) || chr(10) || '- intro item'
        |                || chr(10) || chr(10) || text
        |         ELSE text END AS text
        |  FROM documents),
        |c AS (SELECT doc_id,
        |        len(regexp_extract_all(text,
        |            '(?i)</?[a-z][a-z0-9]*(\s[^>]*)?>')) AS tags,
        |        len(regexp_extract_all(text,
        |            '(?m)(^#{1,6}[ \t])|(```)|(^[ \t]*[-*+][ \t])|(\[[^\]]*\]\(([^)]*)\))'))
        |          AS md
        |      FROM mixed)
        |SELECT doc_id,
        |       CASE WHEN tags >= 2 AND tags >= md THEN 'html'
        |            WHEN md >= 2 THEN 'markdown'
        |            ELSE 'plain' END AS format
        |FROM c""".stripMargin,

    "q164_markdown_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '# Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) ||
        |    '> quoted **intro** line' || chr(10) || chr(10) ||
        |    'See [the docs](https://ex.com/a?b=1) and ' ||
        |    '![alt text](https://img/x.png) plus `inline code` here.' ||
        |    chr(10) || chr(10) ||
        |    '```' || chr(10) || 'code block line 1' || chr(10) ||
        |    'line 2 with *stars*' || chr(10) || '```' || chr(10) || chr(10) ||
        |    '- item one' || chr(10) || '- item two' || chr(10) || chr(10) ||
        |    '***' || chr(10) || chr(10) || text AS t
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(t, '(?s)```.*?```', ' ', 'g') AS t FROM h),
        |s2 AS (SELECT doc_id,
        |         regexp_replace(t, '!\[([^\]]*)\]\(([^)]*)\)', '\1', 'g') AS t
        |       FROM s1),
        |s3 AS (SELECT doc_id,
        |         regexp_replace(t, '\[([^\]]*)\]\(([^)]*)\)', '\1', 'g') AS t
        |       FROM s2),
        |s4 AS (SELECT doc_id, regexp_replace(t, '`([^`]*)`', '\1', 'g') AS t FROM s3),
        |s5 AS (SELECT doc_id, regexp_replace(t, '(?m)^#{1,6}[ \t]*', '', 'g') AS t FROM s4),
        |s6 AS (SELECT doc_id, regexp_replace(t, '(?m)^>[ \t]?', '', 'g') AS t FROM s5),
        |s7 AS (SELECT doc_id,
        |         regexp_replace(t, '(?m)^[ \t]*(-{3,}|\*{3,})[ \t]*$', '', 'g') AS t
        |       FROM s6),
        |s8 AS (SELECT doc_id,
        |         regexp_replace(t, '(?m)^[ \t]*[-*+][ \t]+', '', 'g') AS t
        |       FROM s7),
        |s9 AS (SELECT doc_id, regexp_replace(t, '\*\*([^*]*)\*\*', '\1', 'g') AS t FROM s8),
        |s10 AS (SELECT doc_id, regexp_replace(t, '__([^_]*)__', '\1', 'g') AS t FROM s9),
        |s11 AS (SELECT doc_id, regexp_replace(t, '\*([^*]*)\*', '\1', 'g') AS t FROM s10),
        |s12 AS (SELECT doc_id, regexp_replace(t, '_([^_]*)_', '\1', 'g') AS t FROM s11),
        |s13 AS (SELECT doc_id,
        |          regexp_replace(t, '[ \t\x0B\f\r]+', ' ', 'g') AS t FROM s12),
        |s14 AS (SELECT doc_id,
        |          regexp_replace(t, ' ?\n ?', chr(10), 'g') AS t FROM s13),
        |s15 AS (SELECT doc_id,
        |          trim(regexp_replace(t, '\n+', chr(10), 'g'),
        |               ' ' || chr(10)) AS text
        |        FROM s14)
        |SELECT doc_id, text FROM s15 WHERE length(text) > 0""".stripMargin,

    "q136_html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><script type="text/javascript">var x = 1 < 2;' ||
        |    '</script><style>.m{color:red}</style></head><body>' ||
        |    '<!-- nav bar --><div class="main"><h1>Doc ' ||
        |    CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
        |    '</p><ul><li>&amp;amp; stays</li><li>&lt;tag&gt; ' ||
        |    '&quot;q&#39;s&quot;&nbsp;end</li></ul></div></body></html>'
        |      AS t
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |         regexp_replace(t, '(?is)<script\b[^>]*>.*?</script>', ' ', 'g') AS t
        |       FROM h),
        |s2 AS (SELECT doc_id,
        |         regexp_replace(t, '(?is)<style\b[^>]*>.*?</style>', ' ', 'g') AS t
        |       FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t
        |       FROM s2),
        |s4 AS (SELECT doc_id,
        |         regexp_replace(t,
        |           '(?i)</?(?:p|div|br|li|ul|ol|tr|table|h[1-6]|section|article)\b[^>]*/?>',
        |           chr(10), 'g') AS t
        |       FROM s3),
        |s5 AS (SELECT doc_id, regexp_replace(t, '(?s)<[^>]*>', ' ', 'g') AS t
        |       FROM s4),
        |e AS (SELECT doc_id,
        |        replace(replace(replace(replace(
        |          regexp_replace(replace(t, '&nbsp;', ' '),
        |            '&#39;|&apos;', chr(39), 'g'),
        |          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |          '&amp;', '&') AS t
        |      FROM s5),
        |w1 AS (SELECT doc_id,
        |         regexp_replace(t, '[ ' || chr(9) || chr(11) || chr(12) ||
        |           chr(13) || ']+', ' ', 'g') AS t
        |       FROM e),
        |w2 AS (SELECT doc_id,
        |         regexp_replace(t, ' ?' || chr(10) || ' ?', chr(10), 'g') AS t
        |       FROM w1)
        |SELECT doc_id,
        |       trim(regexp_replace(t, chr(10) || '+', chr(10), 'g'),
        |            ' ' || chr(10)) AS text
        |FROM w2""".stripMargin,

    "q115_c4_clean" ->
      """WITH prep AS (
        |  SELECT doc_id,
        |         regexp_replace(text, '((\S+ ){9}\S+) ', '\1' || chr(10), 'g') AS text
        |  FROM documents),
        |fab1 AS (
        |  SELECT doc_id,
        |    array_to_string(
        |      list_transform(range(0, len(string_split(text, chr(10)))),
        |        i -> string_split(text, chr(10))[i+1]
        |             || CASE WHEN (doc_id*7 + i) % 13 = 0
        |                     THEN ' javascript' ELSE '' END
        |             || CASE WHEN (doc_id + i) % 4 <> 0
        |                     THEN '.' ELSE '' END),
        |      chr(10)) AS text
        |  FROM prep),
        |fab AS (
        |  SELECT doc_id,
        |    text
        |      || CASE WHEN doc_id % 23 = 0
        |              THEN chr(10) || 'this page uses lorem ipsum filler text.'
        |              ELSE '' END
        |      || CASE WHEN doc_id % 29 = 0
        |              THEN chr(10) || 'window.onload = function() { init(); }.'
        |              ELSE '' END AS text
        |  FROM fab1),
        |f AS (
        |  SELECT doc_id,
        |    string_split(text, chr(10)) AS lines,
        |    list_filter(string_split(text, chr(10)),
        |      l -> (ends_with(trim(l), '.') OR ends_with(trim(l), '!')
        |            OR ends_with(trim(l), '?') OR ends_with(trim(l), '"'))
        |           AND trim(l) <> ''
        |           AND len(string_split_regex(trim(l), '\s+')) >= 5
        |           AND NOT contains(lower(trim(l)), 'javascript')) AS kept,
        |    (contains(lower(text), 'lorem ipsum')
        |     OR contains(lower(text), '{')) AS bad
        |  FROM fab)
        |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
        |       CAST(len(kept) AS BIGINT) AS n_kept,
        |       array_to_string(kept, chr(10)) AS text
        |FROM f WHERE NOT bad AND len(kept) >= 3""".stripMargin,

    // URL fabrication + the full normalization chain (fragment, scheme/
    // host case, www, default ports, utm_* params) + per-domain rank
    "q116_domain_cap" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END)
        |    || source || '.Example.COM'
        |    || (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)
        |    || '/docs/' || CAST(doc_id AS VARCHAR)
        |    || (CASE WHEN doc_id % 3 = 0
        |             THEN '?utm_source=feed&ref=' || CAST(doc_id % 5 AS VARCHAR)
        |                  || '&utm_medium=x'
        |             WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id AS VARCHAR)
        |             ELSE '' END)
        |    || (CASE WHEN doc_id % 4 = 0 THEN '#sec-2' ELSE '' END) AS url
        |  FROM documents),
        |nf AS (SELECT doc_id, n_chars, regexp_replace(url, '#.*$', '') AS nofrag
        |       FROM u),
        |parts AS (SELECT doc_id, n_chars,
        |    lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |      AS scheme,
        |    lower(regexp_extract(nofrag,
        |          '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)) AS hostport,
        |    regexp_extract(nofrag,
        |          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$', 1) AS pathq
        |  FROM nf),
        |h AS (SELECT *,
        |    CASE WHEN scheme = 'http'
        |           THEN regexp_replace(regexp_replace(hostport, '^www\.', ''),
        |                               ':80$', '')
        |         WHEN scheme = 'https'
        |           THEN regexp_replace(regexp_replace(hostport, '^www\.', ''),
        |                               ':443$', '')
        |         ELSE regexp_replace(hostport, '^www\.', '') END AS host
        |  FROM parts),
        |pq AS (SELECT *, regexp_extract(pathq, '^([^?]*)', 1) AS path,
        |              regexp_extract(pathq, '\?(.*)$', 1) AS query FROM h),
        |par AS (SELECT *, list_filter(string_split(query, '&'),
        |              p -> p <> '' AND NOT starts_with(lower(p), 'utm_'))
        |            AS params FROM pq),
        |norm AS (SELECT doc_id, n_chars, host AS domain,
        |    scheme || '://' || host
        |    || (CASE WHEN path = '' THEN '/' ELSE path END)
        |    || (CASE WHEN len(params) > 0
        |             THEN '?' || array_to_string(params, '&') ELSE '' END)
        |      AS url_norm
        |  FROM par),
        |r AS (SELECT *, row_number() OVER (PARTITION BY domain
        |                                   ORDER BY n_chars DESC, doc_id ASC)
        |               AS rn FROM norm)
        |SELECT doc_id, domain, url_norm FROM r WHERE rn <= 15""".stripMargin,

    // fabrication + every Gopher signal as integer-count arithmetic, then
    // the rule list in fixed order (raw unrounded comparisons — the ratios
    // are int/int, bit-identical in both engines)
    "q120_gopher_rules" ->
      """WITH prep AS (
        |  SELECT doc_id,
        |         regexp_replace(text, '((\S+ ){9}\S+) ', '\1' || chr(10), 'g') AS text
        |  FROM documents),
        |fab1 AS (
        |  SELECT doc_id,
        |    array_to_string(
        |      list_transform(range(0, len(string_split(text, chr(10)))),
        |        i -> (CASE WHEN doc_id % 31 = 0 OR (doc_id + i) % 5 = 0
        |                   THEN '• ' ELSE '' END)
        |             || string_split(text, chr(10))[i+1]
        |             || (CASE WHEN doc_id % 37 = 0 AND i % 2 = 0
        |                      THEN '...' ELSE '' END)),
        |      chr(10)) AS text
        |  FROM prep),
        |fab AS (
        |  SELECT doc_id,
        |    text
        |    || CASE WHEN doc_id % 41 = 0
        |            THEN chr(10) || '# # # # # # # # # # # #' ELSE '' END
        |    || CASE WHEN doc_id % 43 = 0
        |            THEN chr(10) || '0 1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9'
        |            ELSE '' END
        |    || CASE WHEN doc_id % 2 = 0
        |            THEN chr(10) || 'we prefer to think of and that' ELSE '' END
        |      AS text
        |  FROM fab1),
        |sig AS (
        |  SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS ws,
        |    string_split(trim(text), chr(10)) AS lines,
        |    trim(text) AS t
        |  FROM fab),
        |c AS (
        |  SELECT doc_id,
        |    CASE WHEN t = '' THEN 0 ELSE len(ws) END AS n,
        |    list_aggregate(list_transform(ws, w -> length(w)), 'sum') AS sumlen,
        |    length(t) - length(regexp_replace(t, '#', '', 'g')) AS hashes,
        |    (length(t) - length(regexp_replace(t, '\.\.\.', '', 'g'))) / 3
        |      + (length(t) - length(regexp_replace(t, '…', '', 'g'))) AS ellipses,
        |    len(list_filter(lines,
        |        l -> starts_with(trim(l), '•') OR starts_with(trim(l), '- '))) AS bl,
        |    len(list_filter(lines,
        |        l -> ends_with(trim(l), '...') OR ends_with(trim(l), '…'))) AS el,
        |    len(lines) AS nl,
        |    len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS aw,
        |    len(list_intersect(list_distinct(ws),
        |        ['the','be','to','of','and','that','have','with'])) AS sh
        |  FROM sig),
        |m AS (
        |  SELECT doc_id, n, sh, bl, el, nl,
        |    CASE WHEN n = 0 THEN 0.0 ELSE CAST(sumlen AS DOUBLE) / n END AS mwl,
        |    CASE WHEN n = 0 THEN 0.0 ELSE CAST(hashes AS DOUBLE) / n END AS hr,
        |    CASE WHEN n = 0 THEN 0.0 ELSE CAST(ellipses AS DOUBLE) / n END AS er,
        |    CAST(bl AS DOUBLE) / nl AS blf,
        |    CAST(el AS DOUBLE) / nl AS elf,
        |    CASE WHEN n = 0 THEN 0.0 ELSE CAST(aw AS DOUBLE) / n END AS awf
        |  FROM c)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_words,
        |  round(mwl, 6) AS mean_word_len,
        |  hr AS hash_ratio, er AS ellipsis_ratio,
        |  blf AS bullet_line_frac, elf AS ellipsis_line_frac,
        |  awf AS alpha_word_frac, CAST(sh AS BIGINT) AS stop_hits,
        |  (n >= 50 AND n <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
        |   AND hr <= 0.1 AND er <= 0.1 AND blf <= 0.9 AND elf <= 0.3
        |   AND awf >= 0.8 AND sh >= 2) AS keep,
        |  -- array_to_string of an EMPTY list is NULL in DuckDB; Spark's
        |  -- concat_ws gives '' — coalesce aligns them
        |  coalesce(array_to_string(list_filter([
        |    CASE WHEN n < 50 THEN 'too_few_words' END,
        |    CASE WHEN n > 100000 THEN 'too_many_words' END,
        |    CASE WHEN mwl < 3.0 THEN 'words_too_short' END,
        |    CASE WHEN mwl > 10.0 THEN 'words_too_long' END,
        |    CASE WHEN hr > 0.1 THEN 'hash_heavy' END,
        |    CASE WHEN er > 0.1 THEN 'ellipsis_heavy' END,
        |    CASE WHEN blf > 0.9 THEN 'bullet_lines' END,
        |    CASE WHEN elf > 0.3 THEN 'ellipsis_lines' END,
        |    CASE WHEN awf < 0.8 THEN 'non_alpha' END,
        |    CASE WHEN sh < 2 THEN 'no_stop_words' END],
        |    x -> x IS NOT NULL), ','), '') AS reasons
        |FROM m""".stripMargin,

    // DuckDB's ICU chain vs the engine's Normalizer kernel; chr(776) is
    // the combining diaeresis (the decomposed plant)
    "q122_normalize_text" ->
      """WITH fab AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' Café RÉSUMÉ'
        |         WHEN doc_id % 3 = 1 THEN ' nai' || chr(776) || 've señor'
        |         ELSE ' voilà Über ça' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  lower(strip_accents(nfc_normalize(text))) AS norm,
        |  md5(lower(strip_accents(nfc_normalize(text)))) AS fp
        |FROM fab""".stripMargin,

    "q132_balance_labels" ->
      """WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
        |r AS (SELECT e.vec_id, e.label, c.n,
        |        row_number() OVER (
        |          PARTITION BY e.label
        |          ORDER BY md5(CAST(e.vec_id AS VARCHAR) || ':bal'),
        |                   e.vec_id) - 1 AS rk
        |      FROM embeddings e JOIN c USING (label)),
        |k AS (SELECT vec_id, label,
        |        (50 // n) + (CASE WHEN rk < 50 % n THEN 1 ELSE 0 END) AS copies
        |      FROM r)
        |SELECT vec_id, CAST(label AS BIGINT) AS label,
        |       unnest(range(0, copies)) AS copy_idx
        |FROM k WHERE copies > 0""".stripMargin,

    "q129_epoch_shuffle" ->
      """SELECT doc_id,
        |  row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':epoch1'), doc_id) - 1
        |    AS epoch_rank,
        |  (row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':epoch1'), doc_id) - 1) % 8
        |    AS shard
        |FROM documents""".stripMargin,

    // q115's fabrication+clean (with source carried through), q120's
    // signal arithmetic on the CLEANED text, q116's rank — one statement
    "q123_web_curation_e2e" ->
      """WITH prep AS (
        |  SELECT doc_id, source,
        |         regexp_replace(text, '((\S+ ){9}\S+) ', '\1' || chr(10), 'g') AS text
        |  FROM documents),
        |fab1 AS (
        |  SELECT doc_id, source,
        |    array_to_string(
        |      list_transform(range(0, len(string_split(text, chr(10)))),
        |        i -> string_split(text, chr(10))[i+1]
        |             || CASE WHEN (doc_id*7 + i) % 13 = 0
        |                     THEN ' javascript' ELSE '' END
        |             || CASE WHEN (doc_id + i) % 4 <> 0
        |                     THEN '.' ELSE '' END),
        |      chr(10)) AS text
        |  FROM prep),
        |fab AS (
        |  SELECT doc_id, source,
        |    text
        |      || CASE WHEN doc_id % 23 = 0
        |              THEN chr(10) || 'this page uses lorem ipsum filler text.'
        |              ELSE '' END
        |      || CASE WHEN doc_id % 29 = 0
        |              THEN chr(10) || 'window.onload = function() { init(); }.'
        |              ELSE '' END AS text
        |  FROM fab1),
        |cl AS (
        |  SELECT doc_id, source,
        |    len(string_split(text, chr(10))) AS n_lines,
        |    list_filter(string_split(text, chr(10)),
        |      l -> (ends_with(trim(l), '.') OR ends_with(trim(l), '!')
        |            OR ends_with(trim(l), '?') OR ends_with(trim(l), '"'))
        |           AND trim(l) <> ''
        |           AND len(string_split_regex(trim(l), '\s+')) >= 5
        |           AND NOT contains(lower(trim(l)), 'javascript')) AS kept,
        |    (contains(lower(text), 'lorem ipsum')
        |     OR contains(lower(text), '{')) AS bad
        |  FROM fab),
        |cleaned AS (
        |  SELECT doc_id, source, CAST(n_lines AS BIGINT) AS n_lines,
        |         CAST(len(kept) AS BIGINT) AS n_kept,
        |         array_to_string(kept, chr(10)) AS text
        |  FROM cl WHERE NOT bad AND len(kept) >= 3),
        |sig AS (
        |  SELECT doc_id, source, n_lines, n_kept,
        |    string_split_regex(lower(trim(text)), '\s+') AS ws,
        |    string_split(trim(text), chr(10)) AS lines,
        |    trim(text) AS t
        |  FROM cleaned),
        |c AS (
        |  SELECT doc_id, source, n_lines, n_kept,
        |    CASE WHEN t = '' THEN 0 ELSE len(ws) END AS n,
        |    list_aggregate(list_transform(ws, w -> length(w)), 'sum') AS sumlen,
        |    length(t) - length(regexp_replace(t, '#', '', 'g')) AS hashes,
        |    (length(t) - length(regexp_replace(t, '\.\.\.', '', 'g'))) / 3
        |      + (length(t) - length(regexp_replace(t, '…', '', 'g'))) AS ellipses,
        |    len(list_filter(lines,
        |        l -> starts_with(trim(l), '•') OR starts_with(trim(l), '- '))) AS bl,
        |    len(list_filter(lines,
        |        l -> ends_with(trim(l), '...') OR ends_with(trim(l), '…'))) AS el,
        |    len(lines) AS nl,
        |    len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS aw,
        |    len(list_intersect(list_distinct(ws),
        |        ['the','be','to','of','and','that','have','with'])) AS sh
        |  FROM sig),
        |quality AS (
        |  SELECT doc_id, source, n_lines, n_kept FROM c
        |  WHERE n >= 30 AND n <= 100000
        |    AND (CASE WHEN n = 0 THEN 0.0 ELSE CAST(sumlen AS DOUBLE)/n END) >= 3.0
        |    AND (CASE WHEN n = 0 THEN 0.0 ELSE CAST(sumlen AS DOUBLE)/n END) <= 10.0
        |    AND (CASE WHEN n = 0 THEN 0.0 ELSE CAST(hashes AS DOUBLE)/n END) <= 0.1
        |    AND (CASE WHEN n = 0 THEN 0.0 ELSE CAST(ellipses AS DOUBLE)/n END) <= 0.1
        |    AND CAST(bl AS DOUBLE)/nl <= 0.9
        |    AND CAST(el AS DOUBLE)/nl <= 0.3
        |    AND (CASE WHEN n = 0 THEN 0.0 ELSE CAST(aw AS DOUBLE)/n END) >= 0.8
        |    AND sh >= 1),
        |r AS (
        |  SELECT doc_id, source || '.example.com' AS domain, n_lines, n_kept,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_kept DESC, doc_id ASC) AS rn
        |  FROM quality)
        |SELECT doc_id, domain, n_lines, n_kept FROM r WHERE rn <= 10""".stripMargin
  )
}
