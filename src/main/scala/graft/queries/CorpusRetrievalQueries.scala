package graft.queries

import graft.Tables
import graft.llm.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness gates for corpus retrieval and span-level dedup: BM25
  * top-k search, duplicated-span coverage, and bloom-prefiltered
  * cross-corpus dedup. All arithmetic is integer counts + doubles rounded
  * to 6 (the q70/q113 cross-engine convention), so every gate carries a
  * full DuckDB oracle. */
object CorpusRetrievalQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // BM25 top-10 per query; queries = the first 6 words of every 100th
    // document (5 queries at gate scale), so each query is guaranteed
    // in-vocabulary and its own source doc competes near the top. Ranks on
    // the 6-decimal-rounded score, doc-id tiebreak — exactly what the
    // oracle replays.
    "q117_bm25_topk" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val queries = docs.filter(col("doc_id") % 100 === 7)
        .select(col("doc_id").as("query_id"),
          array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 6), " ")
            .as("query"))
      Corpus.bm25TopK(docs, queries, k = 10)
        .select(col("query_id"), col("doc_id"), col("score"),
          col("rank").cast("long").as("rank"))
    })
  )

  val oracles: Map[String, String] = Map(
    // the full BM25 chain: postings → df/dl/stats → query-term join →
    // per-(query,doc) sum rounded to 6 → partitioned rank
    "q117_bm25_topk" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |t AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS tot_len FROM dl),
        |q AS (SELECT doc_id AS query_id,
        |        unnest(list_distinct(
        |          (string_split_regex(lower(trim(text)), '\s+'))[1:6])) AS term
        |      FROM documents WHERE doc_id % 100 = 7),
        |qq AS (SELECT query_id, term FROM q WHERE length(term) > 0),
        |c AS (SELECT qq.query_id, tf.doc_id,
        |        ln(1 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
        |          * tf.tf * 2.2
        |          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
        |               / (CAST(s.tot_len AS DOUBLE) / s.n_docs))) AS contrib
        |      FROM tf JOIN qq USING (term) JOIN dft USING (term)
        |      JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s),
        |sc AS (SELECT query_id, doc_id, round(sum(contrib), 6) AS score
        |       FROM c GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |                                   ORDER BY score DESC, doc_id) AS rank
        |      FROM sc)
        |SELECT query_id, doc_id, score, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10""".stripMargin
  )
}
