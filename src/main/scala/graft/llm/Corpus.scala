package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-level operators for training-data pipelines: test-set
  * decontamination, TF-IDF term scoring, and sequence packing.
  *
  * Scale design (100 TB corpus):
  *  - decontamination broadcasts the TEST side by default (test/eval sets
  *    are small by construction); the train corpus is never shuffled — one
  *    map-side hash join over the scan plus a partial-agg groupBy on the
  *    matching doc ids. `broadcastTest = false` swaps in a shuffle join for
  *    eval suites too large to broadcast safely.
  *  - TF-IDF shuffles on (doc, term) then on term; both aggregations are
  *    partial (map-side combine). The document-frequency table joins back on
  *    `term` — a shuffle join keyed by term, which AQE converts to a
  *    broadcast when the vocabulary is small.
  *  - packing runs the same distributed prefix sum as [[Corpus.vocabCoverage]]
  *    (range partition on (group, order), P-bounded boundary offsets through
  *    the driver, partition-local windows) — no group, however dominant, ever
  *    funnels its stream through one sort task.
  */
object Corpus {

  /** N-gram-overlap contamination report: for every (train, test) document
    * pair sharing at least one distinct word `n`-shingle, the number of
    * shared shingles and the share of the TEST document's shingles covered.
    * This is the GPT-3-style decontamination primitive (13-gram overlap in
    * the paper; `n` is a parameter here).
    *
    * With `broadcastTest = true` (default, right when test/eval sets are
    * small) the test side is aggregated to (shingle → test doc ids) and
    * broadcast; train docs stream through a map-side join, so the big side
    * never shuffles on shingle strings. For a LARGE eval suite the exploded
    * shingle table is a multi-GB broadcast that would OOM executors — pass
    * `broadcastTest = false` to fall back to a plain shuffle join on the
    * shingle key (both sides exchange once; AQE may still pick broadcast if
    * the test side turns out small at runtime). Semantics are identical.
    */
  def contaminationPairs(train: DataFrame, test: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 3, broadcastTest: Boolean = true): DataFrame = {
    def shingled(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as),
        explode(graft.functions.GraftFunctions.wordShingles(df.sparkSession,
          split(lower(trim(col(textCol))), "\\s+"), shingleN, distinct = true))
          .as("s"))
    // size-guarded: the test side is small by contract (eval slices are),
    // but it GROWS with the corpus — past the guard's ceiling the hint is
    // dropped and the shingle join degrades to a shuffle instead of
    // throwing at the BroadcastExchange limit
    def hint(df: DataFrame): DataFrame =
      if (broadcastTest) graft.model.GraftDataset.broadcastIfSmall(df) else df
    val testSh = shingled(test, "test_id")
    val testSizes = testSh.groupBy("test_id")
      .agg(count(lit(1)).as("n_test_shingles"))
    shingled(train, "train_id")
      .join(hint(testSh), Seq("s"))
      .groupBy(col("train_id"), col("test_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(hint(testSizes), Seq("test_id"))
      .select(col("train_id"), col("test_id"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_test_shingles")).as("test_share"))
  }

  /** Drop train documents contaminated by the test set: any train doc whose
    * shared-shingle share of SOME test doc reaches `minShare`. Anti-join on
    * the (small) contaminated-id set — the train corpus is filtered in one
    * pass, no shuffle of the train side. */
  def decontaminate(train: DataFrame, test: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 3, minShare: Double = 0.2,
      broadcastTest: Boolean = true): DataFrame = {
    val bad = contaminationPairs(train, test, idCol, textCol, shingleN, broadcastTest)
      .filter(col("test_share") >= minShare)
      .select(col("train_id").as(idCol)).distinct()
    // estimator: `bad` is join-derived, and the default stats visitor
    // estimates a join as the PRODUCT of its inputs — the train-id
    // projection is the honest upper bound (bad ⊆ train ids; an
    // over-estimate only costs the hint, never correctness)
    train.join(graft.model.GraftDataset.broadcastIfSmall(bad,
      estimator = train.select(col(idCol))), Seq(idCol), "left_anti")
  }

  /** TF-IDF sparse-cosine retrieval — the vector-space-model face of the
    * lexical trio ([[bm25TopK]] = probabilistic, this = VSM, dense cosine
    * = [[Similarity.bruteForceTopK]]): score(q, d) = Σ_t w_qt·w_dt /
    * (‖q‖·‖d‖) with the [[tfIdf]] smoothed weights on BOTH sides (query
    * idf comes from the CORPUS df table; query terms absent from the
    * corpus get df = 0 — they match nothing but still count toward ‖q‖,
    * the textbook convention). Query term FREQUENCY matters here (unlike
    * BM25's de-duplicated terms). Ranks on the round-6 score, doc-id
    * tiebreak.
    *
    * Same 100-TB plan as [[bm25TopK]]: one postings shuffle, broadcast
    * query side, broadcast one-row stats, document norms as one extra
    * partial agg over the weights frame, two-phase final top-k. */
  def tfIdfCosineTopK(docs: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", queryTextCol: String = "query")
      : DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val toks = docs.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = toks.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val idf = (log((col("n_docs") + 1).cast("double") /
      (coalesce(col("df"), lit(0L)) + 1)) + 1.0)
    val wd = tf.join(dft, Seq("term")).crossJoin(broadcast(stats))
      .select(col(idCol), col("term"), (col("tf") * idf).as("wd"))
    val nd = wd.groupBy(col(idCol))
      .agg(sqrt(sum(col("wd") * col("wd"))).as("nd"))
    val qtf = queries.select(col(queryIdCol),
        explode(split(lower(trim(col(queryTextCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(queryIdCol), col("term")).agg(count(lit(1)).as("tf"))
    val wq = qtf.join(dft, Seq("term"), "left").crossJoin(broadcast(stats))
      .select(col(queryIdCol), col("term"), (col("tf") * idf).as("wq"))
    val nq = wq.groupBy(col(queryIdCol))
      .agg(sqrt(sum(col("wq") * col("wq"))).as("nq"))
    // estimators: wq/nq are join-derived (product-of-inputs default
    // stats); qtf bounds both — |wq| = |qtf| rows, |nq| ≤ |qtf| rows —
    // so the guard tracks the QUERY volume, dropping the hints exactly
    // when the query set itself outgrows broadcast
    val scored = wd
      .join(graft.model.GraftDataset.broadcastIfSmall(wq, estimator = qtf),
        Seq("term"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("wq") * col("wd")).as("__dot"))
      .join(nd, Seq(idCol))
      .join(graft.model.GraftDataset.broadcastIfSmall(nq, estimator = qtf),
        Seq(queryIdCol))
      .select(col(queryIdCol), col(idCol),
        round(col("__dot") / (col("nq") * col("nd")), 6).as("score"))
    graft.operators.TopK.topKPerQuery(scored, queryIdCol,
      Seq(desc("score"), col(idCol)), k)
  }

  /** Per-(doc, term) TF-IDF over whitespace tokens:
    * `score = tf · (ln((N + 1) / (df + 1)) + 1)` (smoothed idf, sklearn
    * convention). N is carried as a broadcast one-row frame — no driver
    * action, the whole computation stays one lazy plan. */
  def tfIdf(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val terms = docs.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"), col("tf"),
        (col("tf") * (log((col("n_docs") + 1).cast("double") / (col("df") + 1))
          + 1.0)).as("score"))
  }

  /** Top-`k` TF-IDF terms per document. Ranks on the score ROUNDED to 6
    * decimals with a term tiebreak — cross-engine `ln` can differ in the
    * last ulp, which must not flip ranks of near-tied terms. */
  def tfIdfTopTerms(docs: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val scored = tfIdf(docs, idCol, textCol)
      .withColumn("score", round(col("score"), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(desc("score"), col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Okapi BM25 retrieval: top-`k` corpus documents per query, scored
    * `Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))` with
    * the Lucene non-negative idf `ln(1 + (N−df+0.5)/(df+0.5))`. Query
    * terms are de-duplicated (bag-of-words retrieval — repeating a term in
    * the query must not multiply its contribution). Ranks on the score
    * ROUNDED to 6 decimals with a doc-id tiebreak (the [[tfIdfTopTerms]]
    * cross-engine convention).
    *
    * Plan at 100 TB: the corpus becomes a (term, doc, tf) postings frame —
    * one explode + partial-agg groupBy, the same shuffle [[tfIdf]] pays;
    * document frequency and length tables derive from it without touching
    * the scan again. The query side (distinct query terms) is BROADCAST —
    * query sets are small by construction — so the postings semi-reduce to
    * query-matching rows map-side before any further join. Corpus stats
    * (N, total length) ride as a broadcast one-row frame; the final rank
    * is the two-phase [[graft.operators.TopK.topKPerQuery]], so even a
    * stop-word query whose candidate set is the whole corpus never funnels
    * it through one sort task. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", queryTextCol: String = "query"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val toks = docs.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_len"))
    val qterms = queries.select(col(queryIdCol),
        explode(array_distinct(split(lower(trim(col(queryTextCol))), "\\s+")))
          .as("term"))
      .filter(length(col("term")) > 0)
    val contrib = tf
      .join(graft.model.GraftDataset.broadcastIfSmall(qterms), Seq("term"))
      .join(dft, Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("tot_len").cast("double") / col("n_docs"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
    val scored = contrib.groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(col("contrib")), 6).as("score"))
    // two-phase rank: a stop-word-bearing query's candidate set is
    // corpus-scale — it must not land in one sort task
    graft.operators.TopK.topKPerQuery(scored, queryIdCol,
      Seq(desc("score"), col(idCol)), k)
  }

  /** Corpus data card: the per-(source, language) release manifest every
    * curated dataset ships — document/token/char volume, exact-duplicate
    * mass (distinct 128-bit fingerprints vs rows), and each stratum's
    * share of the corpus. One partial-agg groupBy + a broadcast one-row
    * total — no window, no second scan. Shares are int/int divisions —
    * bit-identical cross-engine. */
  def dataCard(docs: DataFrame, textCol: String = "text",
      strataCols: Seq[String] = Seq("source", "lang")): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val per = docs.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        countDistinct(fp).as("n_distinct"))
      .withColumn("dup_docs", col("n_docs") - col("n_distinct"))
    val tot = docs.agg(count(lit(1)).as("__total"))
    per.crossJoin(broadcast(tot))
      .withColumn("doc_share", col("n_docs").cast("double") / col("__total"))
      .drop("__total")
  }

  /** Corpus feature-distribution profile — exact quantiles of per-document
    * numeric features (token counts, char counts, quality scores …), the
    * data-card companion every release audit wants ("what does the length
    * distribution look like before/after filtering?"). Emits one row per
    * (feature, p): `(feature, p, value[round 6])`.
    *
    * `exact = true` (the gate path) uses Spark's `percentile` aggregate —
    * partial aggregation merges per-partition value→count maps, so memory
    * is bounded by DISTINCT values, fine for the integer-ish features this
    * is meant for (lengths, counts, 6-decimal scores). For genuinely
    * continuous features at 100-TB scale set `exact = false`:
    * `percentile_approx` (t-digest-style sketch, constant memory, one
    * pass) — approximate, so not DuckDB-replayable; its semantics are
    * spec-locked instead. Interpolation convention of the exact path is
    * `index = p·(n−1)` + linear interpolation — identical to DuckDB/
    * Postgres `quantile_cont`, so values replay bit-for-bit on integer
    * features. */
  def featureQuantiles(df: DataFrame, features: Seq[(String, Column)],
      ps: Seq[Double], exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    require(features.nonEmpty, "featureQuantiles: no features given")
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"percentiles must be in [0, 1]: ${ps.mkString(",")}")
    val base = df.select(features.map { case (n, c) =>
      c.cast("double").as(n) }: _*)
    val aggs = features.map { case (n, _) =>
      if (exact) percentile(col(n), typedLit(ps)).as(n)
      else percentile_approx(col(n), typedLit(ps), lit(accuracy)).as(n)
    }
    val row = base.agg(aggs.head, aggs.tail: _*)
    val entries = for {
      (n, _) <- features
      (p, i) <- ps.zipWithIndex
    } yield struct(lit(n).as("feature"), lit(p).as("p"),
      round(element_at(col(n), i + 1), 6).as("value"))
    row.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** Per-GROUP quantile annotation — normalize a per-document score
    * WITHIN its stratum (source, language, domain …): every row gets
    * `q_bucket` = how many of its group's `ps`-quantile thresholds its
    * value reaches (0 … ps.length). The cross-source curation primitive —
    * "keep each source's top quartile" compares documents against their
    * OWN source's distribution, where a global cut would just rank
    * sources against each other. Null values get a null bucket.
    *
    * Plan: one groupBy(group) percentile aggregate (rows = #groups — tiny)
    * broadcast back, bucket assignment as a map-side array count. No
    * per-group window, no sort of the corpus — the two shapes this
    * operator exists to avoid. [[featureQuantiles]]' exact/approx contract
    * applies: exact `percentile` buffers per-group distinct-value maps
    * (integer-ish features), `exact = false` is the continuous/100-TB
    * path. Thresholds are ROUNDED to 6 before comparison (the q154
    * convention): bucket edges depend on round-6 values both engines
    * agree on, never on the last ulp of interpolation arithmetic. */
  def annotateGroupQuantile(df: DataFrame, valueCol: String,
      groupCol: String, ps: Seq[Double] = Seq(0.25, 0.5, 0.75),
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"percentiles must be in [0, 1]: ${ps.mkString(",")}")
    val v = col(valueCol).cast("double")
    val agg =
      if (exact) percentile(v, typedLit(ps))
      else percentile_approx(v, typedLit(ps), lit(accuracy))
    val th = df.groupBy(col(groupCol))
      .agg(transform(agg, t => round(t, 6)).as("__gq"))
    df.join(broadcast(th), Seq(groupCol))
      .withColumn("q_bucket",
        when(v.isNull, lit(null))
          .otherwise(size(filter(col("__gq"), t => t <= v)).cast("long")))
      .drop("__gq")
  }

  /** Corpus DIVERSITY index — mean pairwise token-set Jaccard over a
    * DETERMINISTIC hash sample (one row: `n_docs_sampled, n_pairs,
    * mean_jaccard`): a templated/boilerplate-heavy corpus reads high, a
    * diverse one near zero — the corpus-health dial next to [[zipfFit]]
    * and the data card, and the before/after lens for a dedup pass.
    *
    * Estimator economics: diversity is a PAIRWISE property, so the
    * estimator's cost is quadratic in the SAMPLE by construction —
    * `rate` is the knob and must be sized so the sample is
    * hundreds-to-thousands of docs (K² pairs of cheap set ops), never a
    * corpus fraction at 100 TB (a 0.1% sample of 10⁹ docs is 10⁶ docs =
    * 10¹² pairs — wrong knob setting, not an operator limit; the require
    * below cannot see the corpus size, so sizing is the caller's
    * contract). [[Sampling.hashSample]] keeps the sample deterministic —
    * the index is reproducible and comparable across runs and engines;
    * the sample join is ids-ordered (`id_a < id_b`), each pair counted
    * once. */
  def corpusDiversity(docs: DataFrame, rate: Double, salt: String = "div",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(rate > 0 && rate <= 1, s"rate must be in (0, 1]: $rate")
    val sets = Sampling.hashSample(docs, col(idCol), rate, salt)
      .select(col(idCol).cast("long").as("id"),
        array_distinct(filter(split(lower(trim(col(textCol))), "\\s+"),
          w => length(w) > 0)).as("t"))
      .filter(size(col("t")) > 0)
    val nDocs = sets.agg(count(lit(1)).as("n_docs_sampled"))
    val pairs = sets.as("a").join(sets.as("b"), col("a.id") < col("b.id"))
      .select(graft.llm.Dedup.jaccard(col("a.t"), col("b.t")).as("__j"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        round(avg(col("__j")), 6).as("mean_jaccard"))
      .crossJoin(broadcast(nDocs))
      .select(col("n_docs_sampled"), col("n_pairs"), col("mean_jaccard"))
  }

  /** Unigram counts of a REFERENCE corpus — the model table consumed by
    * [[crossEntropy]] (one row per distinct lowercased whitespace token).
    * One explode + one partial-agg groupBy; persist the result when scoring
    * many batches against the same reference (caller-owned, same contract
    * as the dedup bases). */
  def unigramCounts(ref: DataFrame, textCol: String = "text"): DataFrame =
    ref.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("c"))

  /** Per-document cross-entropy against a unigram reference model — the
    * CCNet-style perplexity quality filter, with a unigram proxy standing
    * in for the KenLM 5-gram (the filtering recipe is identical: score
    * every document by mean negative log-likelihood per token under a
    * reference corpus, keep the low/middle of the distribution). Laplace
    * smoothing over the reference vocabulary: p(w) = (c+1)/(T+V+1), OOV =
    * 1/(T+V+1). Emits (id, n_tokens, cross_entropy); documents with zero
    * tokens have no likelihood and are absent.
    *
    * Plan: per-(doc, word) counts FIRST (partial agg — a document's "the"s
    * collapse map-side, so the model join sees one row per doc·word, not
    * per token), left join to the model on word, (T, V) carried as a
    * broadcast one-row frame ([[tfIdf]]'s convention — no driver action),
    * one final groupBy doc. At 100 TB the model join is a plain shuffle
    * join (a unigram vocab can exceed broadcast range); common-word skew is
    * already collapsed by the pre-aggregation. */
  def crossEntropy(docs: DataFrame, refCounts: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tot = refCounts.agg(sum(col("c")).as("t"), count(lit(1)).as("v"))
    val dw = docs.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("__dc"))
    dw.join(refCounts, Seq("word"), "left")
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(sum(col("__dc")).as("n_tokens"),
        (-sum(col("__dc") *
          log(coalesce(col("c") + 1, lit(1L)).cast("double")
            / (col("t") + col("v") + 1)))
          / sum(col("__dc"))).as("cross_entropy"))
  }

  /** Per-document Naive-Bayes LOG-ODDS between two reference corpora —
    * the closed-form stand-in for the fastText/logistic quality
    * classifiers of the GPT-3/CCNet pipelines ("does this page look like
    * the high-quality corpus or like random crawl?"): no training loop,
    * fully deterministic, same decision form (a linear score over token
    * counts). Each side is a Laplace-smoothed unigram model in
    * [[crossEntropy]]'s exact convention — p_c(w) = (c+1)/(T_c+V_c+1),
    * OOV = 1/(T_c+V_c+1), each model smoothed over its OWN vocabulary —
    * plus a doc-count prior. Emits
    * `(idCol, n_tokens, log_odds, pred_pos)` where
    * `log_odds = ln(N_pos/N_neg) + Σ_w dc·(ln p_pos(w) − ln p_neg(w))`
    * and `pred_pos = 1 ⟺ log_odds > 0`; zero-token docs are absent
    * (no likelihood), as in [[crossEntropy]].
    *
    * Plan: ONE per-(doc, word) pre-agg (common-word skew collapses
    * map-side), one left join per model on the word, the four totals and
    * the prior carried as a single broadcast one-row frame, one final
    * per-doc regroup — the [[crossEntropy]] shape paid once, not once per
    * class. At 100 TB the model joins are plain shuffle joins (vocab can
    * exceed broadcast range); pass pre-built [[unigramCounts]] frames and
    * persist them when scoring many batches. */
  def naiveBayesLogOdds(docs: DataFrame, posCounts: DataFrame,
      negCounts: DataFrame, nPosDocs: Long, nNegDocs: Long,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(nPosDocs > 0 && nNegDocs > 0,
      s"both classes need documents: pos=$nPosDocs neg=$nNegDocs")
    val consts = posCounts.agg(sum(col("c")).as("tp"), count(lit(1)).as("vp"))
      .crossJoin(negCounts.agg(sum(col("c")).as("tn"), count(lit(1)).as("vn")))
      .withColumn("prior",
        log(lit(nPosDocs.toDouble)) - log(lit(nNegDocs.toDouble)))
    val dw = docs.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("__dc"))
    dw.join(posCounts.withColumnRenamed("c", "__cp"), Seq("word"), "left")
      .join(negCounts.withColumnRenamed("c", "__cn"), Seq("word"), "left")
      .crossJoin(broadcast(consts))
      .groupBy(col(idCol))
      .agg(sum(col("__dc")).as("n_tokens"),
        (first(col("prior")) +
          sum(col("__dc") *
            (log(coalesce(col("__cp") + 1, lit(1L)).cast("double")
              / (col("tp") + col("vp") + 1))
              - log(coalesce(col("__cn") + 1, lit(1L)).cast("double")
                / (col("tn") + col("vn") + 1))))).as("log_odds"))
      .withColumn("pred_pos",
        when(col("log_odds") > 0, 1).otherwise(0))
  }

  /** The reference corpus' top-`n` vocabulary by total count (ties → the
    * word itself — deterministic) — the table [[oovRate]] scores
    * against. */
  def topVocabulary(ref: DataFrame, n: Int,
      textCol: String = "text"): DataFrame =
    unigramCounts(ref, textCol)
      .orderBy(desc("c"), col("word")).limit(n).select(col("word"))

  /** Per-document OOV (out-of-vocabulary) rate against `vocab` — the
    * tokenizer/vocab-coverage signal (a doc whose tokens are mostly
    * unknown to the model's vocabulary trains badly and usually indicates
    * wrong language or binary junk). One explode + a vocabulary join
    * (broadcast for real vocab sizes) + a per-doc regroup; rates are
    * int/int divisions — bit-exact cross-engine. */
  def oovRate(docs: DataFrame, vocab: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .join(vocab.select(col("word"), lit(1).as("__iv")), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))

  /** Per-document n-gram NOVELTY against a reference corpus — the
    * memorization / overlap-analysis signal (share of a document's
    * distinct word n-grams absent from the reference): ≈1 for genuinely
    * new text, ≈0 for text copied from the reference — the standard lens
    * for "how much of this (generated / newly crawled) corpus is already
    * in the training set", the continuous companion to the
    * [[contaminationPairs]] hit test. Emits
    * `(idCol, n_grams, n_novel, novelty_rate)`; rates are int/int —
    * engine-exact. Gram construction is [[graft.llm.Dedup.shingles]]'
    * convention (docs shorter than n contribute their whole text as one
    * gram), shared with the dedup/contamination family.
    *
    * Plan: both sides explode to distinct grams (map-side, fused shingle
    * kernel), one left join on the gram, one per-doc regroup. At corpus
    * scale set `broadcastRef = true` when the reference gram set fits the
    * broadcast budget; otherwise it is a plain shuffle join whose hot
    * keys are ALREADY collapsed (both sides are per-doc DISTINCT gram
    * sets, and the ref side is globally distinct — a boilerplate gram is
    * ONE ref row). A bloom-prefiltered variant (build on ref grams, probe
    * map-side — [[graft.llm.Dedup.buildFingerprintBloom]]'s shape) is the
    * documented upgrade when even the gram join must not shuffle; its
    * false positives only DEFLATE novelty by the fpp, which the exact
    * join avoids. */
  def ngramNovelty(docs: DataFrame, ref: DataFrame, n: Int = 3,
      textCol: String = "text", idCol: String = "doc_id",
      broadcastRef: Boolean = false): DataFrame = {
    def grams(df: DataFrame, cols: Seq[Column]): DataFrame =
      df.select(cols :+ explode(
        graft.functions.GraftFunctions.wordShingles(df.sparkSession,
          split(lower(trim(col(textCol))), "\\s+"), n, distinct = true))
        .as("__gram"): _*)
    val refGrams = grams(ref, Seq.empty).distinct()
      .withColumn("__hit", lit(1))
    val hinted = if (broadcastRef) broadcast(refGrams) else refGrams
    grams(docs, Seq(col(idCol)))
      .join(hinted, Seq("__gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_rate", col("n_novel").cast("double") / col("n_grams"))
  }

  /** Word-bigram counts of a REFERENCE corpus — the model table for
    * [[crossEntropyBigram]] (one row per distinct adjacent lowercased
    * word pair). Same shuffle shape as [[unigramCounts]]. */
  def bigramCounts(ref: DataFrame, textCol: String = "text"): DataFrame = {
    val ws = split(lower(trim(col(textCol))), "\\s+")
    // docs with < 2 tokens have no bigrams and MUST be filtered before the
    // sequence: sequence(2, 1) counts DOWN ([2, 1]), so an unguarded
    // transform would evaluate element_at(ws, 0) (invalid index) /
    // element_at(ws, 2) (out of bounds under ANSI) on single-token docs
    ref.select(ws.as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(explode(transform(sequence(lit(2), size(col("__ws"))), i =>
        struct(element_at(col("__ws"), i - 1).as("prev"),
          element_at(col("__ws"), i).as("word")))).as("bg"))
      .select(col("bg.prev").as("prev"), col("bg.word").as("word"))
      .filter(length(col("word")) > 0 && length(col("prev")) > 0)
      .groupBy("prev", "word").agg(count(lit(1)).as("c"))
  }

  /** Interpolated-bigram cross-entropy — [[crossEntropy]] with a stronger
    * model (the CCNet recipe one order up):
    * `p(w_i) = λ·(c(w_{i-1},w_i)+1)/(c(w_{i-1})+V+1)
    *         + (1−λ)·(c(w_i)+1)/(T+V+1)`,
    * the document's first token scoring by the unigram term alone. Use an
    * EXACTLY-representable λ (0.75, 0.5 …) so `1−λ` is the same double in
    * any engine. Positions (not distinct words) are the scoring unit, so
    * repeated bigrams weigh naturally; the model joins are word-keyed
    * (broadcast for small models via AQE), the corpus shuffles once on the
    * position explode's doc regroup. */
  def crossEntropyBigram(docs: DataFrame, uniCounts: DataFrame,
      biCounts: DataFrame, lambda: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tot = uniCounts.agg(sum(col("c")).as("t"), count(lit(1)).as("v"))
    val ws = split(lower(trim(col(textCol))), "\\s+")
    val pos = docs.select(col(idCol),
        explode(transform(sequence(lit(1), size(ws)), i =>
          struct(element_at(ws, i).as("word"),
            when(i > 1, element_at(ws, i - 1)).as("prev")))).as("p"))
      .select(col(idCol), col("p.word").as("word"), col("p.prev").as("prev"))
      .filter(length(col("word")) > 0)
    pos
      .join(uniCounts.select(col("word"), col("c").as("__cu")), Seq("word"), "left")
      .join(uniCounts.select(col("word").as("prev"), col("c").as("__cp")),
        Seq("prev"), "left")
      .join(biCounts.select(col("prev"), col("word"), col("c").as("__cb")),
        Seq("prev", "word"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("__pu", coalesce(col("__cu") + 1, lit(1L)).cast("double")
        / (col("t") + col("v") + 1))
      .withColumn("__pb", coalesce(col("__cb") + 1, lit(1L)).cast("double")
        / (coalesce(col("__cp"), lit(0L)) + col("v") + 1))
      .withColumn("__p", when(col("prev").isNull, col("__pu"))
        .otherwise(lit(lambda) * col("__pb") + lit(1 - lambda) * col("__pu")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (-sum(log(col("__p"))) / count(lit(1))).as("cross_entropy"))
  }

  /** Corpus-wide top-`k` word `n`-grams by total occurrence count (ties
    * broken by the n-gram itself), with per-gram document frequency.
    * One explode + one partial-agg groupBy — the classic vocabulary-stats
    * pass; the top-k is a tiny `orderBy().limit()` over the aggregated
    * gram table, not the corpus. */
  def topNgrams(docs: DataFrame, n: Int = 2, k: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        explode(graft.functions.GraftFunctions.wordShingles(docs.sparkSession,
          split(lower(trim(col(textCol))), "\\s+"), n, distinct = false))
          .as("ngram"))
      .filter(length(col("ngram")) > 0)
      .groupBy("ngram")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"))
      .orderBy(desc("n_occurrences"), col("ngram"))
      .limit(k)

  /** Heavy-hitter top-`k` n-grams — the 100-TB path for [[topNgrams]]:
    * at corpus scale the exact version's aggregation state IS the
    * vocabulary (billions of distinct grams); this replaces it with
    *  1. a single-pass `stat.freqItems` sweep (Karp/lossy counting,
    *     bounded ~1/`support` candidates, no full-vocab shuffle), then
    *  2. EXACT counts for the candidate set only (map-side `InSet` filter
    *     → tiny aggregation state), top-k over those.
    * The result EQUALS the exact top-k whenever every true top-k gram has
    * frequency above `support` (freqItems returns a superset of those) —
    * choose `support` ≤ (expected top-k share); the q103 gate asserts
    * equality against the exact oracle at gate scale. Candidate list
    * rides to the driver once: ≤ 1/support strings. */
  def topNgramsApprox(docs: DataFrame, n: Int = 2, k: Int = 20,
      support: Double = 0.001, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val grams = docs
      .select(col(idCol),
        explode(graft.functions.GraftFunctions.wordShingles(docs.sparkSession,
          split(lower(trim(col(textCol))), "\\s+"), n, distinct = false))
          .as("ngram"))
      .filter(length(col("ngram")) > 0)
    val candidates = grams.stat.freqItems(Seq("ngram"), support)
      .collect()(0).getSeq[String](0)
    grams.filter(col("ngram").isInCollection(candidates))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"))
      .orderBy(desc("n_occurrences"), col("ngram"))
      .limit(k)
  }

  /** Zipf rank–frequency fit over the corpus' top-`topN` vocabulary — the
    * corpus-health diagnostic (natural language tracks slope ≈ −1 on
    * log rank vs log frequency; templated/synthetic/spammy corpora bend
    * the curve): OLS over `(x, y) = (ln rank, ln count)` for the topN
    * words, emitting one row
    * `(n_points, slope, intercept, r2)` (each rounded 6).
    *
    * Plan: the vocab aggregate is the [[unigramCounts]] shuffle; the
    * top-N cut is `orderBy().limit()` (`TakeOrderedAndProject` — the
    * corpus-scale vocabulary is never globally sorted); everything after
    * operates on ONE row holding ≤ topN points — ranks come from the
    * sorted point array's own indices (no window anywhere), and the
    * bounded tail is the splitter's driver-sized-by-contract pattern
    * (default 1000 points).
    *
    * Determinism: the regression sums are LEFT-TO-RIGHT folds in rank
    * order over an `array_sort`ed point list — one fixed accumulation
    * order that a DuckDB `sum(… ORDER BY rank)` replays exactly; `ln` on
    * the same doubles; the OLS closed form is written with one
    * parenthesization. */
  def zipfFit(docs: DataFrame, topN: Int = 1000,
      textCol: String = "text"): DataFrame = {
    require(topN >= 2, s"zipfFit needs at least 2 points: $topN")
    val top = unigramCounts(docs, textCol)
      .orderBy(desc("c"), col("word")).limit(topN)
    // rank = 1 + index in the (count desc, word) order — read off the
    // sorted array itself
    val pts = top
      .agg(array_sort(collect_list(
        struct((-col("c")).as("nc"), col("word"), col("c")))).as("s"))
      .select(transform(col("s"), (e, i) => struct(
        log((i + 1).cast("double")).as("x"),
        log(e.getField("c").cast("double")).as("y"))).as("p"))
    def fsum(f: Column => Column): Column =
      aggregate(col("p"), lit(0.0), (acc, e) => acc + f(e))
    val n = size(col("p")).cast("double")
    val (sx, sy) = (fsum(_.getField("x")), fsum(_.getField("y")))
    val sxy = fsum(e => e.getField("x") * e.getField("y"))
    val sxx = fsum(e => e.getField("x") * e.getField("x"))
    val syy = fsum(e => e.getField("y") * e.getField("y"))
    pts.select(size(col("p")).cast("long").as("n_points"),
        n.as("__n"), sx.as("__sx"), sy.as("__sy"),
        sxy.as("__sxy"), sxx.as("__sxx"), syy.as("__syy"))
      .select(col("n_points"),
        round((col("__n") * col("__sxy") - col("__sx") * col("__sy"))
          / (col("__n") * col("__sxx") - col("__sx") * col("__sx")), 6)
          .as("slope"),
        round((col("__sy") - (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
          / (col("__n") * col("__sxx") - col("__sx") * col("__sx")) * col("__sx"))
          / col("__n"), 6).as("intercept"),
        round(((col("__n") * col("__sxy") - col("__sx") * col("__sy"))
          * (col("__n") * col("__sxy") - col("__sx") * col("__sy")))
          / ((col("__n") * col("__sxx") - col("__sx") * col("__sx"))
            * (col("__n") * col("__syy") - col("__sy") * col("__sy"))), 6)
          .as("r2"))
  }

  /** Inter-source exact-duplicate overlap matrix — the data-card adjacency
    * a release audit wants ("is dump-2 mostly a re-crawl of dump-1?"):
    * for every source pair, the number of distinct normalized-text
    * fingerprints ([[TextAnalysis.fingerprint]]) present in BOTH sources.
    * The diagonal `(s, s)` is each source's distinct-fingerprint count.
    * Emits `(src_a, src_b, n_shared)` with src_a ≤ src_b.
    *
    * Plan: one distinct over `(fp, source)` (map-side partial agg
    * collapses within-source copies), then a fingerprint self-join whose
    * per-key fan-out is bounded by the NUMBER OF SOURCES (each fp
    * appears at most once per source after the distinct — a boilerplate
    * text shared by every source costs S² rows for that fp, not
    * copies²), then an S²-sized groupBy. Null texts are dropped (no
    * fingerprint). */
  def sourceOverlapMatrix(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val fps = docs.filter(col(textCol).isNotNull)
      .select(graft.llm.TextAnalysis.fingerprint(col(textCol)).as("fp"),
        col(sourceCol).as("src"))
      .distinct()
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.src") <= col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** PMI collocation extraction — the top-`k` adjacent word pairs by
    * pointwise mutual information, the classic lexical-association pass
    * (Church & Hanks 1990) a corpus audit runs to find multi-word
    * expressions, boilerplate phrases, and tokenizer-merge candidates:
    * `PMI(a,b) = log2( p(a,b) / (p(a)·p(b)) )` with `p(a,b)` over bigram
    * positions and `p(·)` over unigram positions. `minCount` floors the
    * pair count first (rare-pair PMI is pure noise — the standard fix).
    * Emits `(w1, w2, n_pair, pmi[round 6])`, the top `k` by PMI.
    *
    * Plan shape (100-TB): both model tables come from one-explode
    * partial-agg groupBys ([[unigramCounts]]/[[bigramCounts]] — vocab-sized
    * results, corpus shuffles on the gram key once each); the totals ride
    * as a broadcast one-row frame (no driver action); the unigram
    * attachment joins are vocab×vocab-sized, never corpus-sized; the final
    * top-k is `orderBy().limit()` over the minCount-floored pair table —
    * `TakeOrderedAndProject`, k rows to the driver. The model tables are
    * persisted for their double use (totals + scoring); caches are
    * caller-owned.
    *
    * Determinism contract: ORDER uses the ratio `c_ab / (c_a·c_b)` — one
    * integer-operand IEEE division, monotone in PMI (the N terms are
    * constant), bit-identical in any engine — with `(w1, w2)` tiebreaks;
    * `log2` touches only the DISPLAYED value, rounded to 6. */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5, topK: Int = 50,
      textCol: String = "text",
      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val uni = unigramCounts(docs, textCol).persist(storage)
    val biAll = bigramCounts(docs, textCol).persist(storage)
    val tot = uni.agg(sum(col("c")).as("__nu"))
      .crossJoin(biAll.agg(sum(col("c")).as("__nb")))
    biAll.filter(col("c") >= minCount)
      .join(uni.select(col("word").as("prev"), col("c").as("__ca")), Seq("prev"))
      .join(uni.select(col("word"), col("c").as("__cb")), Seq("word"))
      .crossJoin(broadcast(tot))
      .select(col("prev").as("w1"), col("word").as("w2"),
        col("c").as("n_pair"),
        (col("c").cast("double") / (col("__ca") * col("__cb"))).as("__r"),
        round(log2((col("c").cast("double") * col("__nu") / col("__ca"))
          * (col("__nu").cast("double") / col("__cb")) / col("__nb")), 6)
          .as("pmi"))
      .orderBy(desc("__r"), col("w1"), col("w2"))
      .limit(topK)
      .drop("__r")
  }

  /** Concat-and-chunk sequence packing: within each `groupCol` shard, lay
    * documents end to end in `orderCol` order and cut the stream into
    * `blockTokens`-sized context windows. Each document is assigned to the
    * pack where it STARTS (`pack_id`), with its token offset inside the
    * stream — the standard "pack then split" LLM pretraining layout. All
    * arithmetic is integer, so results are engine-exact.
    *
    * The per-group running token sum is the DISTRIBUTED prefix sum of
    * [[graft.operators.PrefixSum.groupedRunningSum]], not a
    * `Window.partitionBy(group)` cumsum: one crawl source can own 80% of a
    * real corpus, and a per-group window would funnel that source's entire
    * doc stream through ONE sort task (range partition + P-bounded
    * boundary offsets instead — see the helper's doc; exact, boundary-
    * invariant, spec-locked equal to the window formulation).
    *
    * Contracts (the helper's): `groupCol` non-null, `orderCol` unique
    * within a group. Cache lifecycle (round 11): the helper materializes
    * its result and releases its intermediate cache before returning —
    * repeated calls leave no catalog-pinned blocks (CacheLifecycleSpec);
    * `storage` sizes the transient intermediate and the result
    * checkpoint. */
  def packSequences(docs: DataFrame, blockTokens: Long,
      groupCol: String = "source", orderCol: String = "doc_id",
      tokensCol: String = "n_tokens",
      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    graft.operators.PrefixSum.groupedRunningSum(docs, groupCol,
        Seq(orderCol), col(s"`$tokensCol`"), "stream_end", storage)
      .withColumn("stream_start", col("stream_end") - col(s"`$tokensCol`"))
      .withColumn("pack_id", floor(col("stream_start") / blockTokens))
      .select(docs.columns.map(col).toSeq
        :+ col("stream_start") :+ col("pack_id"): _*)

  /** Per-pack summary of [[packSequences]]: document count, token count and
    * fill ratio per (group, pack). */
  def packStats(docs: DataFrame, blockTokens: Long,
      groupCol: String = "source", orderCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame =
    packSequences(docs, blockTokens, groupCol, orderCol, tokensCol)
      .groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("n_tokens"))
      .withColumn("fill", col("n_tokens").cast("double") / blockTokens)

  /** Sliding-window document chunking: cut each document's whitespace
    * token stream into `chunkTokens`-sized pieces advancing by
    * `chunkTokens − overlapTokens` (the long-document context-window prep
    * that [[packSequences]]'s concat-and-chunk does NOT cover — here every
    * chunk stays within one document, and consecutive chunks share
    * `overlapTokens` tokens so no span is ever split without context).
    * Emits (id, chunk_index, chunk_text, n_tokens); the final chunk may be
    * short, a document shorter than one window yields exactly one chunk,
    * and zero-token documents yield none.
    *
    * Pure per-row expressions (sequence → slice → posexplode): a single
    * map over the scan, no shuffle, no window function — at 100 TB this
    * runs embarrassingly parallel with column pruning intact. Integer
    * arithmetic only, so the chunk boundaries are engine-exact. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int,
      overlapTokens: Int = 0, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlapTokens
    docs
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__w"))
      .withColumn("__n",
        when(length(concat_ws("", col("__w"))) === 0, 0)
          .otherwise(size(col("__w"))))
      .filter(col("__n") > 0)
      // extra chunks past the first: ceil((n − chunk) / stride) as
      // floor((n − chunk + stride − 1) / stride) — floor division, the
      // same semantics as DuckDB's `//`; negative numerators floor below
      // zero and the greatest() clamps them, so short docs get one chunk
      .withColumn("__k", lit(1) + greatest(lit(0),
        floor((col("__n") - chunkTokens + stride - 1) / lit(stride))
          .cast("int")))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("__k") - 1),
          i => array_join(slice(col("__w"), i * stride + 1, lit(chunkTokens)), " ")))
          .as(Seq("chunk_index", "chunk_text")))
      .withColumn("n_tokens", size(split(col("chunk_text"), "\\s+")))
  }

  /** Frequency-ordered vocabulary with cumulative token coverage — the
    * vocab/tokenizer-construction primitive ("the smallest word list
    * covering X% of the token stream"): every term with its count, global
    * frequency rank (count desc, term asc — a total order), cumulative
    * share of all tokens, and `selected` = the prefix of that order whose
    * PRECEDING cumulative mass is still below `coverage` (so the first
    * term crossing the line is included and the vocabulary actually
    * reaches the target).
    *
    * The running totals are the shared DISTRIBUTED prefix sum
    * ([[graft.operators.PrefixSum.runningSums]] — global group, two
    * summed quantities: 1 for the rank, cnt for the cumulative share),
    * not one global window: a bare `Window.orderBy` would funnel the
    * whole vocabulary (10⁸ terms at web scale) through ONE sort task.
    * Exactness is boundary-invariant (see the helper's doc), and the
    * helper's round-11 cache lifecycle applies: no catalog-pinned blocks
    * survive the call — repeated invocations in a long session no longer
    * accumulate cache (CacheLifecycleSpec).
    *
    * Returns (term, cnt, rank, cum_share [round 6], selected). */
  def vocabCoverage(docs: DataFrame, coverage: Double = 0.9,
      textCol: String = "text",
      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(coverage > 0 && coverage <= 1, s"coverage in (0,1]: $coverage")
    val counts = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("double").as("__tot"))
    graft.operators.PrefixSum.runningSums(counts, lit(0),
        Seq(col("cnt").desc, col("term").asc),
        Seq(lit(1L) -> "rank", col("cnt") -> "__cum"), storage)
      .crossJoin(broadcast(total))
      .select(col("term"), col("cnt"), col("rank"),
        round(col("__cum") / col("__tot"), 6).as("cum_share"),
        (((col("__cum") - col("cnt")).cast("double"))
          < col("__tot") * coverage).as("selected"))
  }

  /** Rare-token masking ("UNK-ification") — the classic LM vocabulary
    * truncation: every whitespace token whose CORPUS-WIDE count is below
    * `minCount` is replaced by `unk`, document text reassembled in
    * original token order. (The tail of a web-scale vocabulary is most of
    * it, so the rare set can never broadcast — the plan must carry counts
    * TO the tokens.)
    *
    * Plan: posexplode to (id, pos, term) — one shuffle to count terms
    * (partial agg), one shuffle join back on term (AQE broadcasts it only
    * if the vocab turns out small), then re-assembly per doc via
    * array_sort(collect_list(struct(pos, term))) — the [[graft.llm.Dedup]]
    * paragraph-dedup reassembly shape, window-free. Docs with no tokens
    * pass through unchanged. Returns the input columns with `textCol`
    * rewritten. */
  def unkifyRareTokens(docs: DataFrame, minCount: Long, unk: String = "<unk>",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(minCount >= 1, s"minCount must be ≥ 1: $minCount")
    val toks = docs.select(col(idCol),
        posexplode(split(lower(trim(col(textCol))), "\\s+"))
          .as(Seq("__pos", "__term")))
      .filter(length(col("__term")) > 0)
    val counts = toks.groupBy("__term").agg(count(lit(1)).as("__cnt"))
    val rebuilt = toks.join(counts, Seq("__term"))
      .select(col(idCol), col("__pos"),
        when(col("__cnt") < minCount, lit(unk)).otherwise(col("__term"))
          .as("__out"))
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__out")))),
        e => e.getField("__out")), " ").as("__new_text"))
    docs.join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("__new_text"), col(textCol)))
      .drop("__new_text")
  }

  /** Snapshot diff between two corpus versions — the dataset-versioning
    * primitive (what changed between crawl N and crawl N+1): every id is
    * classified `added` (new only), `removed` (old only), `changed`
    * (both, content hash differs) or `unchanged`.
    *
    * Content identity is a 128-bit md5 over `contentCols` joined with a
    * U+0001 separator; NULL encodes as U+0000 and a real value gets a
    * U+0002 prefix, so NULL, '' and cross-column aliasing stay distinct.
    * Hashes are computed MAP-SIDE on each snapshot before the join — so
    * the full-outer join on `idCol` moves (id, 32-char hash) pairs, never
    * the document bodies. At 100 TB both snapshots are big: the join
    * shuffles each side once on the id; snapshots written bucketed by id
    * make it exchange-free. Returns (idCol, status). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String = "doc_id",
      contentCols: Seq[String] = Seq("text")): DataFrame = {
    require(contentCols.nonEmpty, "contentCols required")
    def fp(df: DataFrame, hc: String) = df.select(col(idCol),
      md5(concat_ws("\u0001", contentCols.map(c =>
        when(col(c).isNull, lit("\u0000")).otherwise(
          concat(lit("\u0002"), col(c).cast("string")))): _*)).as(hc))
    fp(oldSnap, "__h_old").join(fp(newSnap, "__h_new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") =!= col("__h_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Per-(group, ingest-batch) drift profile — the corpus-monitoring pass
    * that catches a source going bad mid-crawl: for each `groupCol` ×
    * `batchCol` cell, the document count and mean of `metric`, plus the
    * z-score of the batch mean against the group's OVERALL batch-mean
    * distribution (σ = population stddev across the group's batches;
    * groups with one batch or zero spread get z = 0 rather than a
    * division blow-up).
    *
    * Two partial aggregations (docs → batch cells → group moments) and one
    * broadcast-sized join back (|groups| rows) — the corpus shuffles once,
    * on the (group, batch) key, with map-side combine. Returns
    * (groupCol, batchCol, n_docs, batch_mean, z). */
  def batchDrift(docs: DataFrame, groupCol: String, batchCol: String,
      metric: Column): DataFrame = {
    val cells = docs
      .groupBy(col(groupCol), col(batchCol))
      .agg(count(lit(1)).as("n_docs"),
        avg(metric.cast("double")).as("batch_mean"))
    val groups = cells.groupBy(col(groupCol))
      .agg(avg(col("batch_mean")).as("__mu"),
        stddev_pop(col("batch_mean")).as("__sigma"))
    cells.join(broadcast(groups), Seq(groupCol))
      .select(col(groupCol), col(batchCol), col("n_docs"),
        col("batch_mean"),
        when(col("__sigma").isNull || col("__sigma") === 0, lit(0.0))
          .otherwise((col("batch_mean") - col("__mu")) / col("__sigma"))
          .as("z"))
  }
}
