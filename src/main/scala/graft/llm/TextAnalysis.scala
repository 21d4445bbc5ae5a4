package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, n-gram language ID, fingerprinting.
  *
  * All operators are pure column expressions (whole-stage codegen, no UDFs,
  * no shuffles) — at 100 TB they run as a single map over the scan with
  * full predicate/column pushdown preserved.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count estimate: words + punctuation marks + digit runs
    * counted as separate tokens (a cheap, deterministic proxy for a real
    * tokenizer's token count). */
  def subwordCountEstimate(text: Column): Column =
    size(split(trim(text), "\\s+")) +
      length(regexp_replace(text, "[^\\p{Punct}]", "")) +
      size(filter(split(text, "[^0-9]+"), x => length(x) > 0))

  /** Character-class ratios. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") / length(text))

  def digitRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text))

  def upperRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^A-Z]", "")).cast("double") / length(text))

  /** Mean word length over whitespace tokens. */
  def meanWordLength(text: Column): Column = {
    val words = split(trim(text), "\\s+")
    when(size(words) === 0, 0.0)
      .otherwise(aggregate(words, lit(0), (acc, w) => acc + length(w)).cast("double")
        / size(words))
  }

  /** English stopword share of tokens — the classic quality signal. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "are")

  def stopwordRatio(text: Column): Column = {
    val words = split(lower(trim(text)), "\\s+")
    when(size(words) === 0, 0.0)
      .otherwise(size(filter(words, w => w.isInCollection(stopwords))).cast("double")
        / size(words))
  }

  /** Composite quality score in [0,1]: length band + stopword presence −
    * punctuation/digit noise. Deterministic and monotone in each signal;
    * thresholds follow common web-corpus filtering heuristics. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val lengthScore = when(nTok >= 20 && nTok <= 10000, 1.0)
      .when(nTok >= 5, 0.5).otherwise(0.0)
    val swScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val noise = least(punctRatio(text) * 3.0 + digitRatio(text) * 2.0, lit(1.0))
    greatest(lit(0.0), least(lit(1.0),
      lengthScore * 0.4 + swScore * 0.4 + (lit(1.0) - noise) * 0.2))
  }

  /** Word-level repetition share: 1 − distinct/total over lowercased
    * whitespace tokens (the Gopher-style duplicate-content signal). */
  def repetitionRatio(text: Column): Column = {
    val words = split(lower(trim(text)), "\\s+")
    when(size(words) === 0, 0.0)
      .otherwise(lit(1.0) -
        size(array_distinct(words)).cast("double") / size(words))
  }

  /** Rule-based keep/drop verdict with machine-readable reasons — the
    * standard pretraining-filter shape (Gopher/C4-style document rules).
    * Returns `struct(keep boolean, reasons array<string>)`; reasons are in
    * fixed rule order so downstream aggregation is deterministic. All
    * signals are exact integer ratios, so verdicts are reproducible
    * bit-for-bit in any engine. */
  def qualityRules(text: Column,
      minTokens: Int = 10, maxTokens: Int = 100000,
      minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 12.0,
      minStopwordRatio: Double = 0.0, maxRepetitionRatio: Double = 1.0): Column = {
    val reasons = array_compact(array(
      when(tokenCount(text) < minTokens, "too_short"),
      when(tokenCount(text) > maxTokens, "too_long"),
      when(meanWordLength(text) < minMeanWordLen, "words_too_short"),
      when(meanWordLength(text) > maxMeanWordLen, "words_too_long"),
      when(stopwordRatio(text) < minStopwordRatio, "low_stopword"),
      when(repetitionRatio(text) > maxRepetitionRatio, "repetitive")))
    struct((size(reasons) === 0).as("keep"), reasons.as("reasons"))
  }

  /** The Gopher stop-word containment set (Rae et al. 2021, A1.1: a page
    * must contain at least two of these to survive). */
  val gopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality signals (Rae et al. 2021, A1.1) over
    * line-structured text (`\n`-separated; pair with the same line minting
    * the paragraph operators use when the source has no line breaks):
    *
    *   - `n_words`, `mean_word_len` — length gates;
    *   - `hash_ratio` / `ellipsis_ratio` — '#' and '…'/'...' occurrences
    *     per word (the symbol-to-word rule);
    *   - `bullet_line_frac` / `ellipsis_line_frac` — share of lines
    *     starting with a bullet ('•' or "- ") / ending in an ellipsis;
    *   - `alpha_word_frac` — share of words containing ≥1 a–z letter;
    *   - `stop_hits` — distinct [[gopherStopWords]] present.
    *
    * Every signal is a ratio of integer counts over one tokenization
    * (lowercased whitespace words), so the struct reproduces bit-for-bit
    * cross-engine. One codegen map, no explode, no shuffle. */
  def gopherSignals(text: Column): Column =
    graft.functions.GraftFunctions.gopherSignalsStruct(
      org.apache.spark.sql.SparkSession.active, text, gopherStopWords)

  /** The declarative (array-lambda) formulation of [[gopherSignals]] —
    * parity reference for the fused kernel (interpreted lambdas re-run per
    * downstream field reference; the fused struct codegens and CSEs). */
  private[graft] def gopherSignalsLambda(text: Column): Column = {
    val t = trim(text)
    val words = split(lower(t), "\\s+")
    val n = when(t === "", 0).otherwise(size(words))
    val lines = split(t, "\n")
    val nLines = size(lines)
    val hashes = length(t) - length(regexp_replace(t, "#", ""))
    val ellipses =
      ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3) +
        (length(t) - length(regexp_replace(t, "…", "")))
    val bulletLines = size(filter(lines,
      l => trim(l).startsWith("•") || trim(l).startsWith("- ")))
    val ellipsisLines = size(filter(lines,
      l => trim(l).endsWith("...") || trim(l).endsWith("…")))
    val alphaWords = size(filter(words, w => w.rlike("[a-z]")))
    val stopHits = size(array_intersect(array_distinct(words),
      array(gopherStopWords.map(lit): _*)))
    val nD = n.cast("double")
    struct(
      n.cast("long").as("n_words"),
      meanWordLength(text).as("mean_word_len"),
      when(n === 0, 0.0).otherwise(hashes.cast("double") / nD).as("hash_ratio"),
      when(n === 0, 0.0).otherwise(ellipses.cast("double") / nD).as("ellipsis_ratio"),
      (bulletLines.cast("double") / nLines).as("bullet_line_frac"),
      (ellipsisLines.cast("double") / nLines).as("ellipsis_line_frac"),
      when(n === 0, 0.0).otherwise(alphaWords.cast("double") / nD).as("alpha_word_frac"),
      stopHits.cast("long").as("stop_hits"))
  }

  /** The Gopher keep/drop verdict over [[gopherSignals]] with the paper's
    * published thresholds as defaults: word count in [50, 100k], mean word
    * length in [3, 10], hash/ellipsis symbol ratios ≤ 0.1, ≤90% bullet
    * lines, ≤30% ellipsis lines, ≥80% alphabetic words, ≥2 stop words.
    * Returns `struct(keep, reasons)` in fixed rule order — the
    * [[qualityRules]] contract. */
  def gopherRules(text: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3, minAlphaWordFrac: Double = 0.8,
      minStopHits: Int = 2): Column = {
    val s = gopherSignals(text)
    val reasons = array_compact(array(
      when(s.getField("n_words") < minWords, "too_few_words"),
      when(s.getField("n_words") > maxWords, "too_many_words"),
      when(s.getField("mean_word_len") < minMeanWordLen, "words_too_short"),
      when(s.getField("mean_word_len") > maxMeanWordLen, "words_too_long"),
      when(s.getField("hash_ratio") > maxSymbolRatio, "hash_heavy"),
      when(s.getField("ellipsis_ratio") > maxSymbolRatio, "ellipsis_heavy"),
      when(s.getField("bullet_line_frac") > maxBulletLineFrac, "bullet_lines"),
      when(s.getField("ellipsis_line_frac") > maxEllipsisLineFrac, "ellipsis_lines"),
      when(s.getField("alpha_word_frac") < minAlphaWordFrac, "non_alpha"),
      when(s.getField("stop_hits") < minStopHits, "no_stop_words")))
    struct((size(reasons) === 0).as("keep"), reasons.as("reasons"))
  }

  /** Apply [[qualityRules]] and keep only passing documents. */
  def qualityFilter(docs: DataFrame, textCol: String = "text",
      minTokens: Int = 10, maxTokens: Int = 100000,
      minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 12.0,
      minStopwordRatio: Double = 0.0, maxRepetitionRatio: Double = 1.0): DataFrame =
    docs.filter(qualityRules(col(textCol), minTokens, maxTokens,
      minMeanWordLen, maxMeanWordLen, minStopwordRatio, maxRepetitionRatio)
      .getField("keep"))

  /** Tiny per-language function-word vocabularies for the n-gram/stopword
    * language-ID heuristic. */
  val langVocab: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "for", "it"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "des", "est", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "un", "una", "es", "que"))

  /** Per-language hit count, argmax (ties → lexicographically first lang,
    * deterministic), "und" (undetermined) when nothing matches. */
  def langId(text: Column): Column = {
    val words = split(lower(trim(text)), "\\s+")
    val scores = langVocab.toSeq.sortBy(_._1).map { case (lang, vocab) =>
      lang -> size(filter(words, w => w.isInCollection(vocab)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, "und")) { case (acc, (lang, s)) =>
      acc.when(s === best, lang)
    }.otherwise("und")
  }

  /** Gopher-style N-GRAM repetition signals — the per-document multiset
    * statistics [[repetitionRatio]]'s distinct/total collapse can't see
    * (a doc alternating two sentences has low word-level repetition but a
    * dominant repeated n-gram):
    *
    *  - `top_bigram_n` / `top_bigram_frac`: occurrences of the most
    *    frequent word 2-gram and its share of all 2-gram positions
    *  - `dup_trigram_frac`: share of 3-gram POSITIONS covered by 3-grams
    *    occurring more than once
    *
    * Shape: explode grams → (id, gram) count with map-side combine → per-id
    * aggregate. Two shuffles keyed on (id, gram) — distributed and
    * skew-free (gram multiplicity within one doc is bounded by doc length).
    * All outputs are ratios of integer counts → bit-reproducible in any
    * engine (q94's DuckDB oracle recomputes them exactly). */
  def repetitionSignals(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // fused per-row gram counting (graft_gram_stats): the old formulation
    // exploded the bigram AND trigram streams into two full groupBy
    // shuffles — at 100 TB that shuffles ~2x the token volume to compute
    // three integers per document. Counts are identical (spec-asserted),
    // so the integer-ratio outputs divide bit-for-bit the same. Null
    // texts are dropped, matching the explode path's no-rows-no-group.
    val spark = docs.sparkSession
    val bi = graft.functions.GraftFunctions.gramStats(spark,
      graft.functions.GraftFunctions.wordShingles(spark,
        split(lower(trim(col(textCol))), "\\s+"), 2, distinct = false))
    val tri = graft.functions.GraftFunctions.gramStats(spark,
      graft.functions.GraftFunctions.wordShingles(spark,
        split(lower(trim(col(textCol))), "\\s+"), 3, distinct = false))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), bi.as("__bi"), tri.as("__tri"))
      .select(col(idCol),
        col("__bi.top_count").as("top_bigram_n"),
        (col("__bi.top_count").cast("double") / col("__bi.total"))
          .as("top_bigram_frac"),
        (col("__tri.dup_total").cast("double") / col("__tri.total"))
          .as("dup_trigram_frac"))
  }

  /** Unicode script ranges for [[scriptShares]] — BMP blocks, so both
    * UTF-16 (JVM) and codepoint (ICU) length semantics agree. Order is the
    * dominance tiebreak preference. */
  val scriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z",
    "cyrillic" -> "Ѐ-ӿ",
    "cjk" -> "一-鿿",
    "arabic" -> "؀-ۿ",
    "greek" -> "Ͱ-Ͽ")

  /** Per-script character counts + shares (of all characters) — the
    * wrong-script / mixed-script curation signal for multilingual corpora
    * (a "French" doc that is 40% CJK is a mislabel or an injection).
    * Struct fields: `n_<script>` counts, `<script>_share` ratios, plus
    * `n_chars`. Pure regexp arithmetic, one codegen map. */
  def scriptShares(text: Column): Column = {
    val n = length(text)
    val counts = scriptRanges.map { case (name, range) =>
      name -> (n - length(regexp_replace(text, s"[$range]", "")))
    }
    struct(
      (counts.map { case (name, c) => c.cast("long").as(s"n_$name") } ++
        counts.map { case (name, c) =>
          when(n === 0, 0.0).otherwise(c.cast("double") / n)
            .as(s"${name}_share")
        } :+ n.cast("long").as("n_chars")): _*)
  }

  /** The dominant script by character count; ties break toward the
    * earlier [[scriptRanges]] entry (an explicit total order — the
    * struct-max trick with a negated index). */
  def dominantScript(text: Column): Column = {
    val n = length(text)
    val cands = array(scriptRanges.zipWithIndex.map { case ((_, range), i) =>
      struct((n - length(regexp_replace(text, s"[$range]", ""))).as("c"),
        lit(-i).as("ni"))
    }: _*)
    val best = array_max(cands)
    element_at(typedLit(scriptRanges.map(_._1)), -best.getField("ni") + 1)
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * stable across engines (md5 is bit-identical everywhere), suitable as an
    * exact-dedup key at any corpus size (128-bit: no birthday collisions at
    * trillions of docs, unlike xxhash64). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Character-distribution signals — struct(n_chars, n_distinct,
    * entropy, max_char_ratio); the binary-junk / repeated-character-spam
    * detector. Shannon entropy over Unicode codepoints in BITS: ≈0 for
    * "aaaa…", ≈4–4.5 for natural English prose, ≳6 for base64/compressed
    * junk; `max_char_ratio` catches whitespace floods and padding. One
    * fused codegen pass per row ([[graft.functions.CharEntropyExpr]]) —
    * no explode, no shuffle, 100-TB shape identical to the Gopher kernel.
    * Typical gates: `entropy between 2.0 and 6.0`,
    * `max_char_ratio < 0.25`. */
  def charSignals(text: Column): Column =
    graft.functions.GraftFunctions.charEntropy(
      org.apache.spark.sql.SparkSession.active, text)

  /** Full per-document stats projection. */
  /** Flesch–Kincaid readability signals (Kincaid et al. 1975 — the
    * classic prose-complexity lens used to slice curated corpora into
    * difficulty bands and to flag degenerate text whose "sentences" never
    * end). Deterministic counting rules shared verbatim by the oracle:
    * words = maximal `[a-z]+` runs of the lowercased text (letters only —
    * numbers/punctuation carry no syllables); syllables(word) = max(1,
    * number of maximal `[aeiouy]+` vowel groups); sentences = max(1,
    * number of maximal `[.!?]+` runs). Emits
    * `(idCol, n_words, n_sentences, n_syllables, fk_grade, reading_ease)`;
    * documents with zero letter-words are absent (no prose to grade).
    *
    * `fk_grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59`;
    * `reading_ease = 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words)`. All counting is per-row map-side regexp
    * work (one pass, no shuffle beyond whatever the caller does with the
    * result); the syllable fold is a fixed-size interpreted HOF per row —
    * document-bounded, never a join key. */
  def readability(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val words = regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0))
    val nSent = greatest(lit(1L),
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))).cast("long"))
    docs.select(col(idCol), words.as("__rd_w"), nSent.as("n_sentences"))
      .filter(size(col("__rd_w")) > 0)
      .select(col(idCol),
        size(col("__rd_w")).cast("long").as("n_words"),
        col("n_sentences"),
        aggregate(col("__rd_w"), lit(0L), (acc, w) => acc +
          greatest(lit(1),
            size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0)))))
          .as("n_syllables"))
      .withColumn("fk_grade",
        lit(0.39) * (col("n_words").cast("double") / col("n_sentences"))
          + lit(11.8) * (col("n_syllables").cast("double") / col("n_words"))
          - lit(15.59))
      .withColumn("reading_ease",
        lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")))
  }

  /** Sentence segmentation — the unit every sentence-level pipeline stage
    * (sentence dedup, parallel-corpus alignment, per-sentence quality)
    * starts from: split on terminal punctuation runs, keeping the
    * punctuation with its sentence. The splitter is `regexp_extract_all`
    * with `[^.!?]+[.!?]*` — maximal punctuation-free runs plus their
    * trailing terminators — deliberately chosen over a lookbehind split
    * (RE2, and therefore any external oracle, has no lookbehind).
    * Segments are trimmed; empty ones drop; `sent_idx` is the 0-based
    * position within the document. A pure map + posexplode — no shuffle,
    * embarrassingly parallel at any corpus size.
    *
    * Returns (idCol, sent_idx, sentence). Abbreviation periods split
    * ("Dr. Smith" → two segments) — the standard regex-segmenter
    * trade-off; a model-based segmenter is out of engine scope. */
  def segmentSentences(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol),
        filter(transform(regexp_extract_all(col(textCol),
            lit("[^.!?]+[.!?]*"), lit(0)), s => trim(s)),
          s => length(s) > 0).as("__sents"))
      .select(col(idCol),
        posexplode(col("__sents")).as(Seq("sent_idx", "sentence")))

  def documentStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("*"),
      tokenCount(t).as("n_tokens"),
      meanWordLength(t).as("mean_word_len"),
      punctRatio(t).as("punct_ratio"),
      digitRatio(t).as("digit_ratio"),
      stopwordRatio(t).as("stopword_ratio"),
      qualityScore(t).as("quality"),
      langId(t).as("lang_pred"),
      fingerprint(t).as("fingerprint"))
  }
}
