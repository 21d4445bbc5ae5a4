package graft.queries

import graft.Tables
import graft.llm.{Corpus, Curation, Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The FULL-LENGTH corpus-build pipeline, composed end-to-end from the
  * individually gated operators and verified by ONE DuckDB oracle
  * statement — the round-10 composition-depth gate. Per-operator gates
  * (and the 3-stage compositions q123/q161/q107) cannot catch the bugs
  * that only appear at length: stage fencing, lineage growth, a
  * bookkeeping column from stage 3 colliding at stage 9, rules reading a
  * stale column, cache pressure across ten materializations.
  *
  * The chain (each stage's solo gate in parentheses):
  *   format-wrap + copy plant → extract/route (q136/q164/q167) → linify +
  *   line plants (q115's fabrication) → C4 clean (q115) → Gopher quality
  *   (q120/q123) → MinHash near-dup clusters + keep-min-id (q29/q62) →
  *   corpus-frequency paragraph dedup (q110) → duplicated-span excision
  *   (q157) → SemDeDup over the embedding column (q112) → eval-set
  *   decontamination (q72/q168) → group holdout split (q139/q168) →
  *   token-budget mixture (q93) → sequence packing (q71) → epoch shuffle
  *   + sharding (q129).
  *
  * Composition-order notes (the insight the gate encodes):
  *   - DOC-level near-dedup runs BEFORE paragraph dedup: whole-document
  *     copies would otherwise double every paragraph's corpus frequency
  *     and `removeRepeatedParagraphs` (RefinedWeb semantics: ALL copies
  *     of a repeated paragraph vanish) would empty both the copy and the
  *     original.
  *   - every fabrication plant keys on `doc_id % 2000000` (the content
  *     identity) rather than the row id, so a planted copy transforms
  *     IDENTICALLY to its base and stays an exact near-dup through
  *     extract/clean — plants keyed on row ids would quietly destroy the
  *     dedup fuel.
  *   - the span plant is injected MID-LINE (prepended to line 1) so its
  *     carrier lines stay globally unique: a full-line plant would be
  *     consumed by paragraph dedup before span excision ever saw it.
  *   - all final columns are integers/strings — no float reaches the
  *     hash compare; every float threshold inside (jaccard 0.8, cosine
  *     0.95, share 0.2) sits in a corpus-verified gap.
  *
  * Scale: the same chain runs as the `corpus_build_e2e` probe in
  * [[graft.Scale]] at sf0.1→sf1 under the straggler gate.
  */
object PipelineQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  // ---- shared fabrication constants (rendered into the oracle SQL) ------
  private val boilerLine =
    "subscribe to our newsletter for free updates every single day."
  private val spanSeg =
    "standard legal notice all rights reserved by site owner globally"
  /** Per-source token budgets for the mixture stage (all 20 sources get a
    * budget, varied so the cumsum cut actually bites differently per
    * source). */
  private[graft] val e2eBudgets: Seq[(String, Long)] =
    (0 until 20).map(i => s"src$i" -> (600L + 200L * (i % 4)))

  /** The whole chain as a library composition — shared by the q192 gate
    * and the Scale probe. Returns one row per surviving document:
    * (doc_id, source, format, n_tokens, stream_start, pack_id,
    * epoch_rank, shard). */
  def corpusBuildChain(s: SparkSession, d: String): DataFrame = {
    // stage labels (guide §1.5): the chain's eager points (checkpoints,
    // occupancy probes, CC iterations) surface as dozens of anonymous jobs
    // in the UI/profiler — label them so per-stage cost is attributable
    def mark(stage: String): Unit =
      s.sparkContext.setJobDescription(s"q192 $stage")
    val shuffleP = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val docs = Tables.documents(s, d).select("doc_id", "source", "text")
      .repartition(shuffleP) // single-row-group scan artifact (q130's note)
    // stage 0: format wrap (q167's mixed-corpus shape) + 16 exact copies
    mark("s0 format-wrap")
    val wrapped = docs.withColumn("text",
      when(col("doc_id") % 3 === 0,
        concat(lit("<html><body><p>"), col("text"),
          lit("</p><div>footer</div></body></html>")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("# Title\n\n- intro item\n\n"), col("text")))
        .otherwise(col("text")))
    val copies = wrapped.orderBy("doc_id").limit(16)
      .withColumn("doc_id", col("doc_id") + 2000000L)
    val corpus0 = wrapped.unionByName(copies)
    // stage 1: detect + route through the format's extractor
    mark("s1 extract-route")
    val extracted = Curation.extractTextAuto(corpus0)
    // stage 2: linify + the q115 line plants + span/boiler plants, all
    // keyed on the CONTENT identity (doc_id % 2000000) so copies
    // transform identically to their base
    val fk = pmod(col("doc_id"), lit(2000000L))
    val linified = extracted.withColumn("text",
      regexp_replace(col("text"), "((\\S+ ){9}\\S+) ", "$1\n"))
    // the q115 line plants AND the span plant in ONE split→transform→join
    // pass (they were two: each split the text, transformed every line and
    // re-joined — a full extra pass over every document's lines for a
    // prepend on line 1, guide §1.2 "don't compute things twice"). The
    // fusion is exact: fab1 preserved line count, so spanPlanted's line-1
    // prepend composes as a prefix on the same (l, i) — string-identical
    // to the two-pass result, and the DuckDB oracle (two CTEs) agrees.
    val fab1 = linified.withColumn("text",
      array_join(transform(split(col("text"), "\n"), (l, i) =>
        concat(
          when(fk % 9 === 0 && i === 1, lit(spanSeg + " ")).otherwise(lit("")),
          l,
          when((fk * 7 + i) % 13 === 0, lit(" javascript")).otherwise(lit("")),
          when((fk + i) % 4 =!= 0, lit(".")).otherwise(lit("")))), "\n"))
    val planted = fab1.withColumn("text",
      when(fk % 7 === 0, concat(lit(boilerLine + "\n"), col("text")))
        .otherwise(col("text")))
    // stage 3: C4 line cleaning — checkpoint fences the interpreted
    // higher-order lambdas from re-running per downstream signal (the
    // q123 lesson)
    mark("s3 c4-clean checkpoint")
    val cleaned = Curation.c4Clean(planted).localCheckpoint()
    // stage 4: Gopher quality (q123's post-clean thresholds). Fenced like
    // cleaned: the rules' token-stat struct is evaluated over every doc by
    // EVERY consumer of `quality` otherwise — the minhash base
    // materialization, the CC id frame, and the keep-representatives join
    // each re-ran the filter over the cleaned checkpoint (profiled: the
    // s5/s7 segments carry it 3x, guide §1.2 "don't compute things twice")
    val quality = cleaned.filter(TextAnalysis.gopherRules(col("text"),
      minWords = 30, minStopHits = 1).getField("keep")).localCheckpoint()
    // stage 5: doc-level near-dedup FIRST (see composition-order note).
    // Threshold 0.8, not 0.7: the oracle verifies pairs EXHAUSTIVELY while
    // the engine uses 8x4 banding, so the threshold must sit inside an
    // empty region of the corpus' pair-jaccard spectrum where banding
    // recall is exact. This corpus' near-dup pairs sit at exactly 0.7
    // (generator twins, shifted there by the line plants) and at 1.0 (the
    // planted copies); at j = 0.7 banding recall is only 0.889, so a 0.7
    // threshold makes the gate a coin flip - 0.8 lands in the (0.7, 1.0)
    // gap, where every pair above it has recall 1.
    mark("s5 minhash-neardup")
    val clusters = Dedup.nearDupClusters(quality, threshold = 0.8)
    val afterMinhash = Dedup.keepClusterRepresentatives(quality, clusters)
    // stage 6: corpus-frequency paragraph (line) dedup
    val afterPara = Dedup.removeRepeatedParagraphs(afterMinhash)
    // stage 7: duplicated 10-token span excision
    mark("s7 span-excision checkpoint")
    val afterSpan = Dedup.cutDuplicatedSpans(afterPara, n = 10)
      .localCheckpoint()
    // stage 8: SemDeDup over the embedding column (vec_id = doc_id);
    // fabricated near-dup plant: docs with id % 97 == 5 carry the
    // embedding of id − 5. Docs without an embedding ride through.
    val embs = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val lookup = embs.select(col("vec_id").as("__src_id"),
      col("embedding").as("__src_emb"))
    val embFab = embs.select(col("vec_id"),
        when(pmod(col("vec_id"), lit(97)) === 5, col("vec_id") - 5)
          .otherwise(col("vec_id")).as("__key"))
      .join(lookup, col("__key") === col("__src_id"))
      .select(col("vec_id"), col("__src_emb").as("embedding"))
    // consumed TWICE (semanticDedup and the kept-anti-join) — persist so
    // the embFab self-join + afterSpan restriction runs once per action
    val corpusVec = afterSpan.select(col("doc_id").as("vec_id"))
      .join(embFab, Seq("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    mark("s8 semantic-dedup")
    val keptVec = Dedup.semanticDedup(corpusVec,
      LlmQueries.semCentroids(s, d), threshold = 0.95, maxBucketSize = 1024)
    val semDropped = corpusVec.select("vec_id")
      .join(keptVec.select("vec_id"), Seq("vec_id"), "left_anti")
      .select(col("vec_id").as("doc_id"))
    val afterSem = afterSpan.join(semDropped, Seq("doc_id"), "left_anti")
    // stage 9: decontaminate against an EXTERNAL eval set drawn from the
    // same crawl (raw %101 docs re-minted) — the guaranteed-leak shape
    val test = Tables.documents(s, d).filter(col("doc_id") % 101 === 0)
      .select((col("doc_id") + 9000000L).as("doc_id"), col("text"))
    mark("s9-13 decontam..shard (final action)")
    val afterDecon = Corpus.decontaminate(afterSem, test, minShare = 0.2)
    // stage 10: leakage-safe group holdout, keep the train side
    val withGrp = afterDecon.withColumn("grp",
      concat(col("source"), lit("#"), (col("doc_id") % 50).cast("string")))
    val train = Sampling.groupHoldout(withGrp, col("grp"),
        Seq("train" -> 0.9, "test" -> 0.1), salt = "e2eh")
      .filter(col("split") === "train").drop("split", "grp")
    // stage 11: token-budget mixture (q93's cumsum rule, salt e2x)
    val withTok = train.withColumn("n_tokens",
      size(split(lower(trim(col("text"))), "\\s+")).cast("long"))
    val mixed = Sampling.tokenBudgetMixture(withTok, col("n_tokens"),
      e2eBudgets.toMap, salt = "e2x")
    // stage 12: sequence packing; stage 13: epoch shuffle + shards
    val packed = Corpus.packSequences(mixed, blockTokens = 512)
    Sampling.epochShuffle(packed, numShards = 8, epoch = 1)
      .select(col("doc_id"), col("source"), col("format"), col("n_tokens"),
        col("stream_start"), col("pack_id"), col("epoch_rank"), col("shard"))
  }

  val defs: Map[String, Q] = Map(
    "q192_corpus_build_e2e" -> ((s, d) => corpusBuildChain(s, d))
  )

  // ---- the one-statement oracle ------------------------------------------

  private val budgetCase = e2eBudgets
    .map { case (src, b) => s"WHEN '$src' THEN $b" }
    .mkString("CASE source ", " ", " ELSE 0 END")

  private val hu = CurationQueries.hashUniformSql _

  val oracles: Map[String, String] = Map(
    "q192_corpus_build_e2e" ->
      s"""WITH RECURSIVE
         |-- stage 0: format wrap + 16 exact copies (content key = id % 2000000)
         |wrapped AS MATERIALIZED (
         |  SELECT doc_id, source,
         |    CASE WHEN doc_id % 3 = 0
         |           THEN '<html><body><p>' || text ||
         |                '</p><div>footer</div></body></html>'
         |         WHEN doc_id % 3 = 1
         |           THEN '# Title' || chr(10) || chr(10) || '- intro item'
         |                || chr(10) || chr(10) || text
         |         ELSE text END AS text
         |  FROM documents),
         |corpus0 AS MATERIALIZED (
         |  SELECT doc_id, source, text FROM wrapped
         |  UNION ALL
         |  SELECT doc_id + 2000000 AS doc_id, source, text FROM
         |    (SELECT * FROM wrapped ORDER BY doc_id LIMIT 16)),
         |-- stage 1: detect + route
         |det AS MATERIALIZED (
         |  SELECT doc_id, source, text,
         |    len(regexp_extract_all(text,
         |        '(?i)</?[a-z][a-z0-9]*(\\s[^>]*)?>')) AS tags,
         |    len(regexp_extract_all(text,
         |        '(?m)(^#{1,6}[ \\t])|(```)|(^[ \\t]*[-*+][ \\t])|(\\[[^\\]]*\\]\\(([^)]*)\\))'))
         |      AS md
         |  FROM corpus0),
         |fmt AS MATERIALIZED (
         |  SELECT doc_id, source, text,
         |    CASE WHEN tags >= 2 AND tags >= md THEN 'html'
         |         WHEN md >= 2 THEN 'markdown'
         |         ELSE 'plain' END AS format
         |  FROM det),
         |hx1 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(text, '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g') AS t
         |        FROM fmt WHERE format = 'html'),
         |hx2 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t, '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g') AS t
         |        FROM hx1),
         |hx3 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM hx2),
         |hx4 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t,
         |            '(?i)</?(?:p|div|br|li|ul|ol|tr|table|h[1-6]|section|article)\\b[^>]*/?>',
         |            chr(10), 'g') AS t
         |        FROM hx3),
         |hx5 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t, '(?s)<[^>]*>', ' ', 'g') AS t FROM hx4),
         |hx6 AS MATERIALIZED (SELECT doc_id, source, format,
         |          replace(replace(replace(replace(
         |            regexp_replace(replace(t, '&nbsp;', ' '),
         |              '&#39;|&apos;', chr(39), 'g'),
         |            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |            '&amp;', '&') AS t
         |        FROM hx5),
         |hx7 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t, '[ ' || chr(9) || chr(11) || chr(12) ||
         |            chr(13) || ']+', ' ', 'g') AS t
         |        FROM hx6),
         |hx8 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t, ' ?' || chr(10) || ' ?', chr(10), 'g') AS t
         |        FROM hx7),
         |htmlx AS MATERIALIZED (SELECT doc_id, source, format,
         |            trim(regexp_replace(t, chr(10) || '+', chr(10), 'g'),
         |                 ' ' || chr(10)) AS text
         |          FROM hx8),
         |mx1 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(text, '(?s)```.*?```', ' ', 'g') AS t
         |        FROM fmt WHERE format = 'markdown'),
         |mx2 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t, '!\\[([^\\]]*)\\]\\(([^)]*)\\)', '\\1', 'g') AS t
         |        FROM mx1),
         |mx3 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t, '\\[([^\\]]*)\\]\\(([^)]*)\\)', '\\1', 'g') AS t
         |        FROM mx2),
         |mx4 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t, '`([^`]*)`', '\\1', 'g') AS t FROM mx3),
         |mx5 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t, '(?m)^#{1,6}[ \\t]*', '', 'g') AS t FROM mx4),
         |mx6 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t, '(?m)^>[ \\t]?', '', 'g') AS t FROM mx5),
         |mx7 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t, '(?m)^[ \\t]*(-{3,}|\\*{3,})[ \\t]*$$', '', 'g') AS t
         |        FROM mx6),
         |mx8 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t, '(?m)^[ \\t]*[-*+][ \\t]+', '', 'g') AS t
         |        FROM mx7),
         |mx9 AS MATERIALIZED (SELECT doc_id, source, format,
         |          regexp_replace(t, '\\*\\*([^*]*)\\*\\*', '\\1', 'g') AS t FROM mx8),
         |mx10 AS MATERIALIZED (SELECT doc_id, source, format,
         |           regexp_replace(t, '__([^_]*)__', '\\1', 'g') AS t FROM mx9),
         |mx11 AS MATERIALIZED (SELECT doc_id, source, format,
         |           regexp_replace(t, '\\*([^*]*)\\*', '\\1', 'g') AS t FROM mx10),
         |mx12 AS MATERIALIZED (SELECT doc_id, source, format,
         |           regexp_replace(t, '_([^_]*)_', '\\1', 'g') AS t FROM mx11),
         |mx13 AS MATERIALIZED (SELECT doc_id, source, format,
         |           regexp_replace(t, '[ \\t\\x0B\\f\\r]+', ' ', 'g') AS t FROM mx12),
         |mx14 AS MATERIALIZED (SELECT doc_id, source, format,
         |           regexp_replace(t, ' ?\\n ?', chr(10), 'g') AS t FROM mx13),
         |mdx AS MATERIALIZED (SELECT doc_id, source, format,
         |          trim(regexp_replace(t, '\\n+', chr(10), 'g'),
         |               ' ' || chr(10)) AS text
         |        FROM mx14),
         |extracted AS MATERIALIZED (
         |  SELECT doc_id, source, format, text FROM htmlx WHERE length(text) > 0
         |  UNION ALL
         |  SELECT doc_id, source, format, text FROM mdx WHERE length(text) > 0
         |  UNION ALL
         |  SELECT doc_id, source, format, text FROM fmt
         |  WHERE format = 'plain' AND length(text) > 0),
         |-- stage 2: linify + q115 plants + span/boiler plants (content key)
         |prep AS MATERIALIZED (
         |  SELECT doc_id, source, format, doc_id % 2000000 AS fk,
         |         regexp_replace(text, '((\\S+ ){9}\\S+) ', '\\1' || chr(10), 'g') AS text
         |  FROM extracted),
         |fab1 AS MATERIALIZED (
         |  SELECT doc_id, source, format, fk,
         |    array_to_string(
         |      list_transform(range(0, len(string_split(text, chr(10)))),
         |        i -> string_split(text, chr(10))[i+1]
         |             || CASE WHEN (fk*7 + i) % 13 = 0
         |                     THEN ' javascript' ELSE '' END
         |             || CASE WHEN (fk + i) % 4 <> 0
         |                     THEN '.' ELSE '' END),
         |      chr(10)) AS text
         |  FROM prep),
         |spanp AS MATERIALIZED (
         |  SELECT doc_id, source, format, fk,
         |    array_to_string(
         |      list_transform(range(0, len(string_split(text, chr(10)))),
         |        i -> CASE WHEN fk % 9 = 0 AND i = 1
         |                  THEN '$spanSeg ' || string_split(text, chr(10))[i+1]
         |                  ELSE string_split(text, chr(10))[i+1] END),
         |      chr(10)) AS text
         |  FROM fab1),
         |planted AS MATERIALIZED (
         |  SELECT doc_id, source, format,
         |    CASE WHEN fk % 7 = 0 THEN '$boilerLine' || chr(10) || text
         |         ELSE text END AS text
         |  FROM spanp),
         |-- stage 3: C4 clean
         |cl AS (
         |  SELECT doc_id, source, format,
         |    len(string_split(text, chr(10))) AS n_lines,
         |    list_filter(string_split(text, chr(10)),
         |      l -> (ends_with(trim(l), '.') OR ends_with(trim(l), '!')
         |            OR ends_with(trim(l), '?') OR ends_with(trim(l), '"'))
         |           AND trim(l) <> ''
         |           AND len(string_split_regex(trim(l), '\\s+')) >= 5
         |           AND NOT contains(lower(trim(l)), 'javascript')) AS kept,
         |    (contains(lower(text), 'lorem ipsum')
         |     OR contains(lower(text), '{')) AS bad
         |  FROM planted),
         |cleaned AS MATERIALIZED (
         |  SELECT doc_id, source, format,
         |         array_to_string(kept, chr(10)) AS text
         |  FROM cl WHERE NOT bad AND len(kept) >= 3),
         |-- stage 4: Gopher quality on the cleaned text (q123 thresholds)
         |sig AS MATERIALIZED (
         |  SELECT doc_id, source, format, text,
         |    string_split_regex(lower(trim(text)), '\\s+') AS ws,
         |    string_split(trim(text), chr(10)) AS lines,
         |    trim(text) AS t
         |  FROM cleaned),
         |sigc AS MATERIALIZED (
         |  SELECT doc_id, source, format, text,
         |    CASE WHEN t = '' THEN 0 ELSE len(ws) END AS n,
         |    list_aggregate(list_transform(ws, w -> length(w)), 'sum') AS sumlen,
         |    length(t) - length(regexp_replace(t, '#', '', 'g')) AS hashes,
         |    (length(t) - length(regexp_replace(t, '\\.\\.\\.', '', 'g'))) / 3
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
         |quality AS MATERIALIZED (
         |  SELECT doc_id, source, format, text FROM sigc
         |  WHERE n >= 30 AND n <= 100000
         |    AND (CASE WHEN n = 0 THEN 0.0 ELSE CAST(sumlen AS DOUBLE)/n END) >= 3.0
         |    AND (CASE WHEN n = 0 THEN 0.0 ELSE CAST(sumlen AS DOUBLE)/n END) <= 10.0
         |    AND (CASE WHEN n = 0 THEN 0.0 ELSE CAST(hashes AS DOUBLE)/n END) <= 0.1
         |    AND (CASE WHEN n = 0 THEN 0.0 ELSE CAST(ellipses AS DOUBLE)/n END) <= 0.1
         |    AND CAST(bl AS DOUBLE)/nl <= 0.9
         |    AND CAST(el AS DOUBLE)/nl <= 0.3
         |    AND (CASE WHEN n = 0 THEN 0.0 ELSE CAST(aw AS DOUBLE)/n END) >= 0.8
         |    AND sh >= 1),
         |-- stage 5: MinHash near-dup clusters (all-pairs exact ≥ 0.7 + CC),
         |-- keep the min-id representative
         |mh AS MATERIALIZED (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
         |      ELSE list_transform(range(1, len(w) - 1),
         |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS sss
         |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
         |        FROM quality)),
         |mhp AS MATERIALIZED (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM mh a JOIN mh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sss, b.sss)) AS DOUBLE)
         |          / len(list_distinct(list_concat(a.sss, b.sss))) >= 0.8),
         |mhbi AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM mhp
         |         UNION ALL SELECT id_b, id_a FROM mhp),
         |mhreach(a, b) AS (
         |  SELECT doc_id, doc_id FROM quality
         |  UNION
         |  SELECT r.a, e.b FROM mhreach r JOIN mhbi e ON r.b = e.a),
         |mhclu AS MATERIALIZED (SELECT a AS doc_id, min(b) AS cluster_id
         |          FROM mhreach GROUP BY a),
         |aftermh AS MATERIALIZED (
         |  SELECT q.* FROM quality q JOIN mhclu c USING (doc_id)
         |  WHERE c.doc_id = c.cluster_id),
         |-- stage 6: corpus-frequency paragraph dedup (normalized lines)
         |para AS MATERIALIZED (
         |  SELECT doc_id,
         |         unnest(string_split(text, chr(10))) AS p,
         |         generate_subscripts(string_split(text, chr(10)), 1) AS i
         |  FROM aftermh),
         |pcnt AS MATERIALIZED (
         |  SELECT regexp_replace(lower(trim(p)), '\\s+', ' ', 'g') AS k,
         |         count(*) AS c
         |  FROM para GROUP BY 1),
         |afterpara AS MATERIALIZED (
         |  SELECT m.doc_id, m.source, m.format, r.text
         |  FROM (SELECT doc_id, string_agg(p, chr(10) ORDER BY i) AS text
         |        FROM para JOIN pcnt
         |          ON regexp_replace(lower(trim(p)), '\\s+', ' ', 'g') = k
         |        WHERE c <= 1 GROUP BY doc_id) r
         |  JOIN aftermh m USING (doc_id)),
         |-- stage 7: duplicated 10-token span excision
         |spt AS MATERIALIZED (SELECT doc_id, source, format, text,
         |          string_split_regex(trim(text), '\\s+') AS wo,
         |          string_split_regex(lower(trim(text)), '\\s+') AS wsl
         |        FROM afterpara),
         |sptl AS MATERIALIZED (SELECT doc_id, source, format, text, wo, wsl,
         |           CASE WHEN array_to_string(wsl, '') = '' THEN 0
         |                ELSE len(wsl) END AS n
         |         FROM spt),
         |spg AS MATERIALIZED (SELECT doc_id, wsl,
         |          unnest(range(0, greatest(n - 10 + 1, 0))) AS i
         |        FROM sptl),
         |spfp AS MATERIALIZED (SELECT doc_id, i,
         |           md5(array_to_string(wsl[(i+1):(i+10)], ' ')) AS h
         |         FROM spg),
         |spc AS MATERIALIZED (SELECT h, count(*) AS cnt FROM spfp GROUP BY 1),
         |spcov AS MATERIALIZED (SELECT DISTINCT doc_id, p FROM (
         |            SELECT f.doc_id, unnest(range(f.i, f.i + 10)) AS p
         |            FROM spfp f JOIN spc USING (h) WHERE cnt > 1)),
         |spcd AS MATERIALIZED (SELECT DISTINCT doc_id FROM spcov),
         |sptok AS MATERIALIZED (SELECT doc_id, i, wo[i+1] AS tok FROM
         |            (SELECT doc_id, wo, unnest(range(0, n)) AS i FROM sptl
         |             WHERE doc_id IN (SELECT doc_id FROM spcd))),
         |sprec AS MATERIALIZED (SELECT k.doc_id, string_agg(k.tok, ' ' ORDER BY k.i) AS text
         |          FROM (SELECT t2.doc_id, t2.i, t2.tok
         |                FROM sptok t2 LEFT JOIN spcov cp
         |                  ON t2.doc_id = cp.doc_id AND t2.i = cp.p
         |                WHERE cp.p IS NULL) k
         |          GROUP BY k.doc_id),
         |afterspan AS MATERIALIZED (
         |  SELECT tl.doc_id, tl.source, tl.format,
         |         CASE WHEN cd.doc_id IS NULL THEN tl.text
         |              ELSE coalesce(rc.text, '') END AS text
         |  FROM sptl tl LEFT JOIN spcd cd USING (doc_id)
         |               LEFT JOIN sprec rc USING (doc_id)),
         |afterspank AS MATERIALIZED (
         |  SELECT doc_id, source, format, text FROM afterspan
         |  WHERE trim(text) <> ''),
         |-- stage 8: SemDeDup (fabricated embedding: id%97=5 -> id-5's vector)
         |embbase AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |            FROM embeddings),
         |embfab AS MATERIALIZED (
         |  SELECT e.vec_id, s.v
         |  FROM (SELECT vec_id,
         |          CASE WHEN vec_id % 97 = 5 THEN vec_id - 5 ELSE vec_id END AS k
         |        FROM embbase) e
         |  JOIN embbase s ON s.vec_id = e.k),
         |cvec AS MATERIALIZED (
         |  SELECT a.doc_id AS vec_id, e.v
         |  FROM afterspank a JOIN embfab e ON e.vec_id = a.doc_id),
         |cents AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
         |          FROM (SELECT * FROM embbase ORDER BY vec_id LIMIT 4)),
         |assign AS MATERIALIZED (
         |  SELECT vec_id, cid, sim FROM (
         |    SELECT a.vec_id, c.cid, list_cosine_similarity(a.v, c.cv) AS sim,
         |           row_number() OVER (PARTITION BY a.vec_id
         |                              ORDER BY list_cosine_similarity(a.v, c.cv) DESC,
         |                                       c.cid) AS rn
         |    FROM cvec a CROSS JOIN cents c) WHERE rn = 1),
         |svp AS MATERIALIZED (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM cvec a JOIN cvec b ON a.vec_id < b.vec_id
         |  JOIN assign aa ON aa.vec_id = a.vec_id
         |  JOIN assign ab ON ab.vec_id = b.vec_id
         |  WHERE aa.cid = ab.cid AND list_cosine_similarity(a.v, b.v) >= 0.95),
         |sbidir AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM svp
         |           UNION ALL SELECT id_b, id_a FROM svp),
         |sreach(a, b) AS (
         |  SELECT vec_id, vec_id FROM cvec
         |  UNION
         |  SELECT r.a, e.b FROM sreach r JOIN sbidir e ON r.b = e.a),
         |sclu AS MATERIALIZED (SELECT a AS vec_id, min(b) AS cluster_id
         |         FROM sreach GROUP BY a),
         |semkeep AS MATERIALIZED (
         |  SELECT vec_id FROM (
         |    SELECT c.vec_id,
         |           row_number() OVER (PARTITION BY c.cluster_id
         |                              ORDER BY s.sim ASC, c.vec_id ASC) AS rn
         |    FROM sclu c JOIN assign s ON s.vec_id = c.vec_id) WHERE rn = 1),
         |semdropped AS MATERIALIZED (
         |  SELECT vec_id AS doc_id FROM cvec
         |  WHERE vec_id NOT IN (SELECT vec_id FROM semkeep)),
         |aftersem AS MATERIALIZED (
         |  SELECT * FROM afterspank
         |  WHERE doc_id NOT IN (SELECT doc_id FROM semdropped)),
         |-- stage 9: decontaminate against the external raw eval set
         |trsh AS MATERIALIZED (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         |         ELSE list_transform(range(1, len(t) - 1),
         |                             i -> array_to_string(t[i:i+2], ' '))
         |    END)) AS sgl
         |  FROM (SELECT doc_id,
         |          string_split_regex(lower(trim(text)), '\\s+') AS t
         |        FROM aftersem)),
         |tesh AS MATERIALIZED (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         |         ELSE list_transform(range(1, len(t) - 1),
         |                             i -> array_to_string(t[i:i+2], ' '))
         |    END)) AS sgl
         |  FROM (SELECT doc_id + 9000000 AS doc_id,
         |          string_split_regex(lower(trim(text)), '\\s+') AS t
         |        FROM documents WHERE doc_id % 101 = 0)),
         |tsz AS MATERIALIZED (SELECT doc_id AS test_id, count(*) AS n_test FROM tesh GROUP BY 1),
         |contam AS MATERIALIZED (
         |  SELECT DISTINCT train_id FROM (
         |    SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
         |           count(*) AS n_shared
         |    FROM trsh tr JOIN tesh te ON tr.sgl = te.sgl GROUP BY 1, 2) p
         |  JOIN tsz USING (test_id)
         |  WHERE CAST(n_shared AS DOUBLE) / n_test >= 0.2),
         |afterdecon AS MATERIALIZED (
         |  SELECT * FROM aftersem
         |  WHERE doc_id NOT IN (SELECT train_id FROM contam)),
         |-- stage 10: group holdout, keep train
         |hold AS MATERIALIZED (
         |  SELECT *, md5(source || '#' || CAST(doc_id % 50 AS VARCHAR)
         |                || ':e2eh') AS ghx
         |  FROM afterdecon),
         |train AS MATERIALIZED (
         |  SELECT doc_id, source, format, text FROM hold
         |  WHERE ${hu("ghx")} < 0.9),
         |-- stage 11: token-budget mixture (salt e2x)
         |mixd AS MATERIALIZED (
         |  SELECT doc_id, source, format,
         |         CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
         |              AS BIGINT) AS n_tokens,
         |         md5(CAST(doc_id AS VARCHAR) || ':e2x') AS mhx
         |  FROM train),
         |mixu AS MATERIALIZED (SELECT *, ${hu("mhx")} AS u, $budgetCase AS budget FROM mixd),
         |mixx AS MATERIALIZED (SELECT *, sum(n_tokens) OVER (PARTITION BY source
         |                                       ORDER BY u, doc_id
         |                                       ROWS UNBOUNDED PRECEDING) AS cum
         |         FROM mixu),
         |mixed AS MATERIALIZED (SELECT doc_id, source, format, n_tokens FROM mixx
         |          WHERE cum - n_tokens < budget),
         |-- stage 12: packing (512-token blocks)
         |packed AS MATERIALIZED (
         |  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
         |              AS stream_end
         |  FROM mixed)
         |-- stage 13: epoch shuffle + shards
         |SELECT doc_id, source, format, n_tokens,
         |  CAST(stream_end - n_tokens AS BIGINT) AS stream_start,
         |  CAST((stream_end - n_tokens) // 512 AS BIGINT) AS pack_id,
         |  row_number() OVER (
         |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':epoch1'), doc_id) - 1
         |    AS epoch_rank,
         |  (row_number() OVER (
         |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':epoch1'), doc_id) - 1) % 8
         |    AS shard
         |FROM packed""".stripMargin
  )
}
