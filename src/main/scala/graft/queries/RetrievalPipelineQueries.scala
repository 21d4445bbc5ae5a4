package graft.queries

import graft.Tables
import graft.llm.{Corpus, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q197: the retrieval-side composition gate — the one pipeline family
  * previously gated only in pieces (q117 BM25, q191 TF-IDF, q178 RRF,
  * q72 decontam, q131 hard negatives). One chain, one DuckDB oracle:
  *
  *   1. corpus split: eval slice (doc_id % 50 = 0) vs train, PLUS 20
  *      planted exact copies of eval docs inside train (ids offset by
  *      [[Plants.IdFloor]], natural-id collision guarded) — the
  *      contamination the decontam stage exists to catch;
  *   2. GPT-3-style n-gram decontamination of train against eval
  *      (word-3-shingle share ≥ 0.5 → dropped). Load-bearing by
  *      construction: the plants change BM25's df/avgdl corpus statistics
  *      if they survive, so deleting this stage breaks the gate hash;
  *   3. lexical retrieval: BM25 top-20 per query over the CLEAN corpus
  *      (queries = first 6 words of every doc_id % 100 = 7 doc);
  *   4. dense retrieval: exact-cosine top-20 over the clean corpus'
  *      embeddings (round-4 rank convention);
  *   5. hybrid fusion: RRF(60), top-10 per query;
  *   6. hard-negative mining OFF THE FUSED SHORTLIST (the DPR-style
  *      training-data step): fused candidates whose label differs from
  *      the query's get flagged and ranked by round-4 cosine.
  *
  * All arithmetic is the pieces' own cross-engine conventions (round-6
  * BM25/RRF, round-4 cosine, integer shingle ratios), so the whole chain
  * carries a full rows+schema+hash oracle. Reference anchors: the corpus
  * tooling the reference ships stops at per-operator pieces; the chain
  * shape follows q192/q193/q195's composition pattern. */
object RetrievalPipelineQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  /** The q197 chain as a callable (the q192/q193/q195 pattern — the scale
    * harness runs it as the `retrieval_e2e` probe).
    *
    * Cache contract (caller-owned release, as in
    * [[graft.llm.Dedup.crossCorpusNearDupsFromStore]]): the returned frame
    * lazily persists two interior frames (`clean`, `withMeta`) the first
    * time it is materialized — they are NOT unpersisted here, because the
    * returned plan still references them. A long-lived session invoking
    * this chain repeatedly must release them between invocations
    * (`spark.catalog.clearCache()` or unpersist of the frames it no longer
    * holds), exactly as the bench's between-query reset does — otherwise
    * executor storage accumulates per call. */
  def retrievalChain(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    // natural ids must sit below the shared planted-id floor (q195's rule):
    // a natural doc_id inside the offset space would be indistinguishable
    // from a plant — duplicate train ids, a wrong plants-die reading — and
    // the DuckDB oracle mirrors the collision, so the gate would stay
    // green while corrupt. Fail loudly instead (Plants.IdFloor is shared
    // with the q195 intake chain's guard).
    Plants.requireNaturalIdsBelowFloor(docs, "doc_id", "retrieval_e2e")
    val evalDocs = docs.filter(col("doc_id") % 50 === 0)
    // 20 planted exact eval copies inside train: contamination that MUST
    // die at stage 2 (exact copy → shingle share 1.0 ≥ 0.5)
    val plants = evalDocs.orderBy("doc_id").limit(20)
      .withColumn("doc_id", col("doc_id") + Plants.IdFloor)
    val train = docs.filter(col("doc_id") % 50 =!= 0).unionByName(plants)
    // clean is consumed TWICE (the BM25 retrieval AND the dense side's
    // clean-id semi-join) — persist so the decontamination's shingle
    // explode + anti-join runs once per action, not per consumer (lazy
    // persist, so the chain stays a single-plan query; the bench's
    // between-query reset reclaims it)
    val clean = Corpus.decontaminate(train, evalDocs, minShare = 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val queries = docs.filter(col("doc_id") % 100 === 7)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 6), " ")
          .as("query"))
    val bm = Corpus.bm25TopK(clean, queries, k = 20)
      .select(col("query_id"), col("doc_id"), col("rank"))

    val embs = Tables.embeddings(s, d)
    // the dense corpus is restricted to CLEAN ids too — the un-hinted
    // semi join lets the planner broadcast the id set while it is small
    // and degrade to a shuffle join when it is not
    val cleanEmbs = embs.join(clean.select(col("doc_id").as("vec_id")),
      Seq("vec_id"), "left_semi")
    val qv = embs.filter(col("vec_id") % 100 === 7)
    val vec = Similarity.bruteForceTopK(cleanEmbs, qv, k = 20, roundTo = 4)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))

    val fused = Similarity.rrfFuse(Seq(bm, vec), k = 10)

    // stage 6: label + embedding joins, hard-negative flag, per-query
    // cosine rank of the hard negatives. The window is partitioned by
    // query over ≤ 10·|queries| rows — bounded by the fused shortlist,
    // never the corpus. The query-side lookups are RESTRICTED to query
    // rows first (join key is query_id, so only vec_id % 100 = 7 rows can
    // ever match — result-identical by construction) and their hints
    // routed through the size-guarded broadcastIfSmall: a forced hint on
    // a corpus-sized projection is honored unconditionally and throws at
    // the 8 GB / 512M-row BroadcastExchange limit, the exact failure the
    // FK-dimension sites were cured of in round 12. The doc-side lookups
    // stay un-hinted — the planner shuffles them on doc_id and AQE may
    // still broadcast the shortlist side from runtime stats.
    val lab = embs.select(col("vec_id"), col("label").cast("long").as("label"))
    val qRows = embs.filter(col("vec_id") % 100 === 7)
    val withMeta = fused
      .join(graft.model.GraftDataset.broadcastIfSmall(
        qRows.select(col("vec_id").as("query_id"),
          col("label").cast("long").as("query_label"))),
        Seq("query_id"), "left")
      .join(lab.select(col("vec_id").as("doc_id"),
        col("label").as("neighbor_label")), Seq("doc_id"), "left")
      // withMeta is consumed TWICE (the hard-negative branch and the
      // final left join) — without the persist each consumer re-runs the
      // WHOLE retrieval (decontam → BM25 → dense brute force → RRF);
      // lazy persist keeps the plan-lock test's single-query shape
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val isHn = col("query_label").isNotNull && col("neighbor_label").isNotNull &&
      col("query_label") =!= col("neighbor_label")
    val hn = withMeta.filter(isHn)
      .join(graft.model.GraftDataset.broadcastIfSmall(
        qRows.select(col("vec_id").as("query_id"),
          col("embedding").as("__qv"))), Seq("query_id"))
      .join(embs.select(col("vec_id").as("doc_id"),
        col("embedding").as("__dv")), Seq("doc_id"))
      .select(col("query_id"), col("doc_id"),
        round(graft.functions.GraftFunctions.cosine(s, col("__qv"), col("__dv")), 4)
          .as("__cos"))
      .withColumn("hn_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("__cos"), col("doc_id"))))
    withMeta.join(hn, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("doc_id"), col("rrf_score"),
        col("rank").cast("long").as("rank"),
        coalesce(col("neighbor_label"), lit(-1L)).as("neighbor_label"),
        coalesce(isHn, lit(false)).as("hard_negative"),
        coalesce(col("__cos"), lit(0.0)).as("cosine"),
        coalesce(col("hn_rank").cast("long"), lit(0L)).as("hn_rank"))
  }

  val defs: Map[String, Q] = Map(
    "q197_retrieval_e2e" -> ((s, d) => retrievalChain(s, d))
  )

  val oracles: Map[String, String] = Map(
    // the whole chain in ONE statement: plant construction, shingle-share
    // decontamination (q72's kernel), BM25 over the CLEAN corpus (q117's
    // kernel — note df/avgdl/n_docs all come from clean), clean-restricted
    // dense cosine (q178's kernel), RRF(60) fusion, label joins and the
    // hard-negative cosine ranking
    "q197_retrieval_e2e" ->
      """WITH evaldocs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
        |plants AS (
        |  SELECT doc_id + 2000000 AS doc_id, text FROM
        |    (SELECT * FROM evaldocs ORDER BY doc_id LIMIT 20)),
        |train AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
        |  UNION ALL SELECT doc_id, text FROM plants),
        |shtr AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                             i -> array_to_string(t[i:i+2], ' '))
        |    END)) AS s
        |  FROM (SELECT doc_id,
        |          string_split_regex(lower(trim(text)), '\s+') AS t
        |        FROM train)),
        |shte AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                             i -> array_to_string(t[i:i+2], ' '))
        |    END)) AS s
        |  FROM (SELECT doc_id,
        |          string_split_regex(lower(trim(text)), '\s+') AS t
        |        FROM evaldocs)),
        |tsz AS (SELECT doc_id AS test_id, count(*) AS n_test
        |        FROM shte GROUP BY 1),
        |cpair AS (SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
        |                 count(*) AS n_shared
        |          FROM shtr tr JOIN shte te ON tr.s = te.s GROUP BY 1, 2),
        |dropids AS (SELECT DISTINCT train_id AS doc_id
        |            FROM cpair JOIN tsz USING (test_id)
        |            WHERE CAST(n_shared AS DOUBLE) / n_test >= 0.5),
        |clean AS (SELECT t.doc_id, t.text FROM train t
        |          LEFT JOIN dropids dr ON dr.doc_id = t.doc_id
        |          WHERE dr.doc_id IS NULL),
        |toks AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM clean),
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
        |bm AS (SELECT query_id, doc_id, rnk FROM (
        |         SELECT query_id, doc_id,
        |           row_number() OVER (PARTITION BY query_id
        |                              ORDER BY score DESC, doc_id) AS rnk
        |         FROM sc) WHERE rnk <= 20),
        |cleanemb AS (SELECT e.vec_id, e.embedding, e.label
        |             FROM embeddings e JOIN clean cl ON cl.doc_id = e.vec_id),
        |eq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id % 100 = 7),
        |es AS (SELECT eq.query_id, e.vec_id AS doc_id,
        |         round(list_cosine_similarity(eq.qv,
        |           CAST(e.embedding AS DOUBLE[])), 4) AS cosine
        |       FROM cleanemb e CROSS JOIN eq
        |       WHERE e.vec_id <> eq.query_id),
        |vec AS (SELECT query_id, doc_id, rnk FROM (
        |          SELECT query_id, doc_id,
        |            row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cosine DESC, doc_id) AS rnk
        |          FROM es) WHERE rnk <= 20),
        |u AS (SELECT query_id, doc_id, 1.0/(60 + rnk) AS c FROM bm
        |      UNION ALL
        |      SELECT query_id, doc_id, 1.0/(60 + rnk) AS c FROM vec),
        |f AS (SELECT query_id, doc_id, round(sum(c), 6) AS rrf_score
        |      FROM u GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, rrf_score,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY rrf_score DESC, doc_id) AS rank
        |      FROM f),
        |fused AS (SELECT query_id, doc_id, rrf_score, rank
        |          FROM r WHERE rank <= 10),
        |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
        |        FROM embeddings),
        |j AS (SELECT fu.*, ql.label AS query_label, nl.label AS neighbor_label
        |      FROM fused fu
        |      LEFT JOIN lab ql ON ql.vec_id = fu.query_id
        |      LEFT JOIN lab nl ON nl.vec_id = fu.doc_id),
        |hn AS (SELECT j.query_id, j.doc_id,
        |         round(list_cosine_similarity(
        |           CAST(qe.embedding AS DOUBLE[]),
        |           CAST(de.embedding AS DOUBLE[])), 4) AS cos
        |       FROM j
        |       JOIN embeddings qe ON qe.vec_id = j.query_id
        |       JOIN embeddings de ON de.vec_id = j.doc_id
        |       WHERE j.query_label IS NOT NULL
        |         AND j.neighbor_label IS NOT NULL
        |         AND j.query_label <> j.neighbor_label),
        |hnr AS (SELECT query_id, doc_id, cos,
        |          row_number() OVER (PARTITION BY query_id
        |                             ORDER BY cos DESC, doc_id) AS hn_rank
        |        FROM hn)
        |SELECT j.query_id, j.doc_id, j.rrf_score,
        |       CAST(j.rank AS BIGINT) AS rank,
        |       coalesce(j.neighbor_label, -1) AS neighbor_label,
        |       (j.query_label IS NOT NULL AND j.neighbor_label IS NOT NULL
        |          AND j.query_label <> j.neighbor_label) AS hard_negative,
        |       coalesce(hnr.cos, 0.0) AS cosine,
        |       CAST(coalesce(hnr.hn_rank, 0) AS BIGINT) AS hn_rank
        |FROM j LEFT JOIN hnr ON hnr.query_id = j.query_id
        |                    AND hnr.doc_id = j.doc_id""".stripMargin
  )
}
