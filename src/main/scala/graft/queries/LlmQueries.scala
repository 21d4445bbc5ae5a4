package graft.queries

import graft.Tables
import graft.llm.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate queries for the training-data-pipeline operators:
  * dedup family, similarity search, text analysis, event-time windows.
  * xxhash64-based signatures (MinHash/SimHash/LSH) are not reproducible in
  * DuckDB → one-row aggregate outputs with rows-only checks, semantics
  * locked in LlmSpec; everything md5/arithmetic-based gets a full oracle.
  */
object LlmQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  /** documents ∪ copies of the 20 lowest-id docs (ids +1,000,000) — a
    * deterministic corpus that GUARANTEES near-duplicates exist at any sf. */
  private def docsWithDups(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val copies = docs.orderBy("doc_id").limit(20)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    docs.unionByName(copies)
  }

  val defs: Map[String, Q] = Map(
    // exact dedup by 128-bit content fingerprint (md5 → full oracle)
    "q28_dedup_exact" -> ((s, d) => {
      Dedup.exactGroups(docsWithDups(s, d))
        .select(col("fingerprint"), col("keep_id"), col("n_dups"))
    }),

    // MinHash+LSH near-dup (xxhash64 → rows-only; LlmSpec locks semantics)
    "q29_minhash_neardup" -> ((s, d) => {
      Dedup.minHashNearDups(docsWithDups(s, d), threshold = 0.7)
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("jaccard")), 4).as("jaccard_sum"))
    }),

    // SimHash near-dup (rows-only)
    "q30_simhash_neardup" -> ((s, d) => {
      Dedup.simHashNearDups(docsWithDups(s, d), maxDist = 3)
        .agg(count(lit(1)).as("n_pairs"), sum(col("hamming")).as("hamming_sum"))
    }),

    // n-gram (word-set) Jaccard of consecutive doc pairs — full oracle
    "q31_ngram_jaccard" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val a = docs.select(col("doc_id").as("id_a"), col("text").as("text_a"))
      val b = docs.select((col("doc_id") - 1).as("id_a"), col("text").as("text_b"))
      a.join(b, Seq("id_a"))
        .select(col("id_a"),
          round(Dedup.jaccard(
            array_distinct(split(lower(trim(col("text_a"))), "\\s+")),
            array_distinct(split(lower(trim(col("text_b"))), "\\s+"))), 6).as("jaccard"))
    }),

    // brute-force cosine top-10 for 5 query vectors — full oracle.
    // Rank on the ROUNDED cosine (4dp) + id tiebreak in both engines:
    // cross-engine double summation differs in the last ~1e-6, which would
    // otherwise flip ranks of near-tied neighbors.
    "q32_cosine_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val queries = embs.filter(col("vec_id") < 5)
      val scored = Similarity.bruteForceTopK(embs, queries, k = Int.MaxValue)
        .withColumn("cosine", round(col("cosine"), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("neighbor_id"), col("cosine"),
          col("rank").cast("long").as("rank"))
    }),

    // LSH-bucketed ANN (xxhash64 planes → rows-only)
    "q33_lsh_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val queries = embs.filter(col("vec_id") < 5)
      Similarity.lshTopK(embs, queries, k = 10, planes = 6)
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_found"), round(max(col("cosine")), 4).as("best"))
    }),

    // per-language text statistics — full oracle
    "q34_text_stats" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      docs.select(col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.meanWordLength(col("text")).as("mwl"),
        TextAnalysis.stopwordRatio(col("text")).as("swr"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("n_tokens"), 4).as("avg_tokens"),
          round(avg("mwl"), 4).as("avg_word_len"),
          round(avg("swr"), 4).as("avg_stopword_ratio"))
    }),

    // language-ID heuristic vs actual label — full oracle
    "q35_langid" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy("lang", "lang_pred").count()
    }),

    // document fingerprinting — full oracle (md5 bit-identical everywhere)
    "q36_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    }),

    // event-time tumbling daily window — full oracle
    "q37_events_daily" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    }),

    // per-user event profile — full oracle
    "q38_events_user" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          round(sum(col("value")), 2).as("total_value"),
          date_format(max(col("ts")), "yyyy-MM-dd").as("last_day"))
    })
  )

  private val sw = TextAnalysis.stopwords.map(s => s"'$s'").mkString(", ")
  private def vocabList(lang: String) =
    TextAnalysis.langVocab(lang).map(s => s"'$s'").mkString(", ")

  val oracles: Map[String, String] = Map(
    "q28_dedup_exact" ->
      """WITH alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20))
        |SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        |       min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM alldocs GROUP BY 1""".stripMargin,

    "q31_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS ws
        |           FROM documents)
        |SELECT a.doc_id AS id_a,
        |       round(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
        |             / len(list_distinct(list_concat(a.ws, b.ws))), 6) AS jaccard
        |FROM w a JOIN w b ON b.doc_id = a.doc_id + 1""".stripMargin,

    "q32_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id,
        |                  CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |         list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, round(cos, 4) AS cosine,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY round(cos, 4) DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, rank
        |FROM ranked WHERE rank <= 10""".stripMargin,

    "q34_text_stats" ->
      s"""WITH t AS (
         |  SELECT lang,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         |    CASE WHEN len(string_split_regex(trim(text), '\\s+')) = 0 THEN 0.0
         |         ELSE CAST(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
         |                                           x -> length(x))) AS DOUBLE)
         |              / len(string_split_regex(trim(text), '\\s+')) END AS mwl,
         |    CASE WHEN len(string_split_regex(lower(trim(text)), '\\s+')) = 0 THEN 0.0
         |         ELSE CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                                   x -> list_contains([$sw], x))) AS DOUBLE)
         |              / len(string_split_regex(lower(trim(text)), '\\s+')) END AS swr
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |       round(avg(n_tokens), 4) AS avg_tokens,
         |       round(avg(mwl), 4) AS avg_word_len,
         |       round(avg(swr), 4) AS avg_stopword_ratio
         |FROM t GROUP BY lang""".stripMargin,

    "q35_langid" ->
      s"""WITH scores AS (
         |  SELECT lang,
         |    len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |        x -> list_contains([${vocabList("de")}], x))) AS s_de,
         |    len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |        x -> list_contains([${vocabList("en")}], x))) AS s_en,
         |    len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |        x -> list_contains([${vocabList("es")}], x))) AS s_es,
         |    len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |        x -> list_contains([${vocabList("fr")}], x))) AS s_fr
         |  FROM documents),
         |pred AS (
         |  SELECT lang,
         |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
         |         WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
         |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
         |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
         |         ELSE 'fr' END AS lang_pred
         |  FROM scores)
         |SELECT lang, lang_pred, count(*) AS count FROM pred GROUP BY 1, 2""".stripMargin,

    "q36_fingerprint" ->
      """SELECT doc_id,
        |       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents""".stripMargin,

    "q37_events_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |       count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q38_events_user" ->
      """SELECT user_id, count(*) AS n_events,
        |       count(DISTINCT event_type) AS n_types,
        |       round(sum(value), 2) AS total_value,
        |       strftime(max(ts), '%Y-%m-%d') AS last_day
        |FROM events GROUP BY user_id""".stripMargin
  )
}
