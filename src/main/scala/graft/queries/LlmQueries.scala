package graft.queries

import graft.Tables
import graft.llm.{Dedup, Ivf, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate queries for the training-data-pipeline operators:
  * dedup family, similarity search, text analysis, event-time windows.
  * EVERY gate here (and across the engine — see COVERAGE.md /
  * graft.Counts) carries a FULL DuckDB oracle: rows + schema + value
  * hash; none is a weaker rows-only check. The xxhash64-based signature
  * families (MinHash/SimHash/LSH) are gated on hash-INDEPENDENT outputs:
  * the banded candidates are verified against exact Jaccard before
  * emission, so the gate result is the deterministic verified pair/cluster
  * set, oracled by exhaustive all-pairs SQL (plus the planted-duplicate
  * corpus construction below, which pins banding recall — see the
  * data-regeneration caveat on [[docsWithDups]]). */
object LlmQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  /** documents ∪ copies of the 20 lowest-id docs (ids +1,000,000) — a
    * deterministic corpus that GUARANTEES near-duplicates exist at any sf.
    *
    * DATA-REGENERATION CAVEAT (q29): the Spark side is probabilistic (8×4
    * banding + a signature-estimate prefilter) while the DuckDB oracle is
    * exact all-pairs Jaccard. The gate is deterministic only because the
    * CURRENT corpus has no pairs in the banding-miss-prone band — every
    * ≥0.7 pair sits at j ≥ 0.9 where per-pair recall is ≈0.9998. A spec
    * (DedupSpec "q29 corpus…") asserts that property against the sf0.01
    * testdata; if the documents table is ever regenerated, that spec
    * failing means q29's oracle can flake and the corpus (or threshold)
    * must be adjusted. */
  private[graft] def docsWithDups(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val copies = docs.orderBy("doc_id").limit(20)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    docs.unionByName(copies)
  }

  /** The paragraph-dedup gate corpus: documents given LINE structure (a
    * newline after every 10th word — the identical regexp_replace runs in
    * the DuckDB oracle), plus 20 planted full copies each carrying one
    * extra UNIQUE sentinel paragraph. The copies make every copied
    * paragraph corpus-duplicated (so originals AND copies lose them —
    * the RefinedWeb all-copies contract is exercised), while the sentinel
    * paragraph survives — locking partial removal + in-order reassembly,
    * not just whole-doc drops. */
  private def paragraphized(s: SparkSession, d: String): DataFrame = {
    val prep = Tables.documents(s, d).select(col("doc_id"),
      regexp_replace(col("text"), "((\\S+ ){9}\\S+) ", "$1\n").as("text"))
    val planted = prep.orderBy("doc_id").limit(20)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text",
        concat(col("text"), lit("\nsentinel unique paragraph "), col("doc_id")))
    prep.unionByName(planted)
  }

  /** q112's centroid set: the 4 lowest-id embeddings as doubles — tiny,
    * deterministic, and reproducible in the oracle via ORDER BY/LIMIT. */
  private[graft] def semCentroids(s: SparkSession, d: String): Seq[Array[Double]] =
    Tables.embeddings(s, d).orderBy("vec_id").limit(4)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray).toSeq

  val defs: Map[String, Q] = Map(
    // corpus snapshot diff: old = drop doc_id%11=3, new = drop doc_id%13=5
    // with every doc_id%7=2 text revised — so all four statuses occur.
    // Text is non-null here, so the oracle compares texts directly (the
    // operator's md5 must classify identically or the hash differs).
    "q173_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val oldSnap = docs.filter(col("doc_id") % 11 =!= 3)
      val newSnap = docs.filter(col("doc_id") % 13 =!= 5)
        .withColumn("text",
          when(col("doc_id") % 7 === 2, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      graft.llm.Corpus.snapshotDiff(oldSnap, newSnap)
    }),

    // length-bucketed batching profile at boundaries 16/24/32 tokens —
    // pure integer aggregates (waste = n·max − Σlen needs no window)
    "q188_length_buckets" -> ((s, d) =>
      graft.llm.Sampling.lengthBucketProfile(Tables.documents(s, d),
        boundaries = Seq(16, 24, 32),
        tokens = size(split(lower(trim(col("text"))), "\\s+")))),

    // rare-token masking at minCount=2 over docs with planted singleton
    // tokens (every 5th doc gets a unique 'uniqtokN') — exactly those
    // become <unk>; text reassembles in token order, lowercased/
    // space-normalized (the LM-prep convention).
    "q185_unkify" -> ((s, d) => {
      val fab = Tables.documents(s, d).withColumn("text",
        concat(col("text"),
          when(col("doc_id") % 5 === 0,
            concat(lit(" uniqtok"), col("doc_id").cast("string")))
            .otherwise(lit(""))))
      graft.llm.Corpus.unkifyRareTokens(fab, minCount = 2)
        .select(col("doc_id"), col("text"))
    }),

    // vocabulary coverage via the DISTRIBUTED prefix sum (range-partition
    // offsets + partition-local windows — no global single-task window):
    // values are boundary-invariant, so the oracle is the plain SQL
    // running total over the same (cnt desc, term) total order.
    "q183_vocab_coverage" -> ((s, d) =>
      graft.llm.Corpus.vocabCoverage(Tables.documents(s, d), coverage = 0.9)
        .select(col("term"), col("cnt"), col("rank"),
          col("cum_share"), col("selected"))),

    // sentence segmentation over punctuation-fabricated docs: a 3-sentence
    // prefix (incl. a doubled terminator) plus the doc text closed with a
    // period — 4 segments per doc, indices 0-based, punctuation kept.
    "q181_sentence_segment" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("text",
        concat(lit("First sentence. Second one! Is this third?? "),
          col("text"), lit(".")))
      graft.llm.TextAnalysis.segmentSentences(docs)
        .select(col("doc_id"), col("sent_idx").cast("long").as("sent_idx"),
          col("sentence"))
    }),

    // MinHash LSH (b,r) planner over 128 perms at threshold 0.8 — pure
    // closed-form S-curve masses on a 19-point grid; both engines compute
    // the identical grid, round to 6, and agree on the argmin flag.
    "q176_lsh_plan" -> ((s, d) =>
      graft.llm.Dedup.lshParameterPlan(s, nPerms = 128, threshold = 0.8,
        gridPoints = 19)),

    // per-(source, ingest-batch) drift: batches of 50 consecutive doc_ids,
    // metric = whitespace token count (integer → batch means are exact
    // rationals), z-score vs the source's own batch-mean distribution.
    "q177_source_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("batch", floor(col("doc_id") / 50).cast("long"))
      graft.llm.Corpus.batchDrift(docs, "source", "batch",
          size(split(lower(trim(col("text"))), "\\s+")))
        .select(col("source"), col("batch"), col("n_docs"),
          round(col("batch_mean"), 6).as("batch_mean"),
          round(col("z"), 6).as("z"))
    }),

    // exact dedup by 128-bit content fingerprint (md5 → full oracle)
    "q28_dedup_exact" -> ((s, d) => {
      Dedup.exactGroups(docsWithDups(s, d))
        .select(col("fingerprint"), col("keep_id"), col("n_dups"))
    }),

    // priority-aware exact dedup: keep the PREFERRED copy per content
    // group (planted preference doc_id % 7 — the +1,000,000 copies differ
    // from their originals mod 7, so the winner is a real decision, not a
    // tie) — full oracle via the same window ranking in SQL
    "q96_keep_best" -> ((s, d) => {
      Dedup.exactDedupKeepBest(docsWithDups(s, d), pmod(col("doc_id"), lit(7)))
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(7)).cast("long").as("pref"))
    }),

    // MinHash+LSH near-dup: the VERIFIED pairs with their exact shingle
    // Jaccard — full DuckDB oracle (all-pairs exact Jaccard at gate scale;
    // the corpus' ≥0.7 pairs all sit at j ≥ 0.9 where 8×4 banding recall
    // is 1-(1-j⁴)⁸ ≈ 0.9998 per pair, verified exhaustively on this data)
    "q29_minhash_neardup" -> ((s, d) => {
      Dedup.minHashNearDups(docsWithDups(s, d), threshold = 0.7)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // SimHash near-dup pairs — full DuckDB oracle: the md5-nibble word hash
    // is bit-identical in both engines, so the oracle recomputes the whole
    // 64-bit simhash + all-pairs hamming exhaustively (banding is
    // pigeonhole-exact for maxDist ≤ 3 while every band bucket is under
    // the occupancy cap — true at gate scale, so pair sets must agree)
    "q30_simhash_neardup" -> ((s, d) => {
      Dedup.simHashNearDups(docsWithDups(s, d), maxDist = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
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

    // LSH-bucketed ANN — full DuckDB oracle: hyperplane coefficients are
    // pure integer arithmetic (see Similarity.hyperplaneSignature), so the
    // oracle recomputes signature → bucket join → exact cosine → top-k.
    // Rank on the ROUNDED cosine + id tiebreak (same discipline as q32).
    "q33_lsh_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val queries = embs.filter(col("vec_id") < 5)
      val scored = Similarity.lshTopK(embs, queries, k = Int.MaxValue, planes = 6)
        .withColumn("cosine", round(col("cosine"), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("query_id"), col("neighbor_id"), col("cosine"),
          col("rk").cast("long").as("rank"))
    }),

    // embedding near-dup via hyperplane-LSH banding — FULL oracle: the
    // hyperplane coefficients are exact integer arithmetic (reproducible
    // in DuckDB), so the oracle replicates the 16-plane/4-band candidate
    // generation bit-for-bit and then the exact-cosine verify. Corpus =
    // FULL embeddings table ∪ exact copies of the 20 lowest vec_ids
    // (+1,000,000): the copies are the guaranteed pairs (cosine 1), and
    // all natural pairs sit ≤ ~0.60 — far from the 0.95 threshold, so
    // cross-engine float noise cannot flip a boundary pair.
    // The former 1000-vector corpus cap is GONE: the operator's skew guard
    // (occupancy accounting + bucket-local refinement + bounded drop, all
    // integer arithmetic) now bounds candidate volume on the clustered
    // corpus, and the oracle replicates the guard's decisions exactly.
    // cap 256 on this corpus exercises BOTH guard paths (14 oversized
    // buckets refine; none drop — measured, see Dedup scaladoc)
    "q59_embedding_neardup" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val copies = embs.orderBy("vec_id").limit(20)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      Dedup.embeddingNearDups(embs.unionByName(copies),
        threshold = 0.95, planes = 16, bands = 4,
        maxBucketSize = 256, refinePlanes = 12)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
    }),

    // whitening composed with the LSH near-dup — FULL oracle. Corpus =
    // embeddings + 3.0 per dimension (a mean-offset corpus: the canonical
    // failure mode of ORIGIN-hyperplane LSH — every projection is dominated
    // by ⟨μ, h⟩, so all 520 vectors collapse into one bucket per band →
    // ~497k candidate pairs) ∪ exact copies of the 20 lowest vec_ids
    // (+1,000,000). whiten=true centers the corpus before signing →
    // buckets re-spread (~108k candidates, 4.6× fewer; max occupancy
    // 500 → 172 measured at sf0.01), while the planted exact-dup pairs are
    // found IDENTICALLY in both modes (identical vectors standardize
    // identically → same signature, any mode). Emits one summary row:
    // planted-pair recall per mode, their symmetric difference (must be 0),
    // and the banding candidate volume per mode from embeddingBucketStats.
    // All five values are integer counts — exactly reproducible in DuckDB
    // (signature coefficients are integer LCG arithmetic; the only float
    // step, μ/σ, sits ~13 decimal orders from any sign boundary).
    "q89_whiten_neardup" -> ((s, d) => {
      // vec_id < 500 caps the corpus at every sf (the plain mode's mega
      // bucket makes candidate volume quadratic in corpus size BY DESIGN —
      // that's the failure being demonstrated; unbounded it would dominate
      // the whole bench at larger sf)
      val offset = Tables.embeddings(s, d).filter(col("vec_id") < 500)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double") + 3.0).as("embedding"))
      val copies = offset.orderBy("vec_id").limit(20)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      val corpus = offset.unionByName(copies)
      def planted(whiten: Boolean) =
        Dedup.embeddingNearDups(corpus, threshold = 0.95, planes = 16,
          bands = 4, maxBucketSize = 4096, refinePlanes = 12, whiten = whiten)
          .filter(col("id_b") === col("id_a") + 1000000L)
          .select(col("id_a"), col("id_b"))
      val plain = planted(whiten = false)
      val wh = planted(whiten = true)
      val diff = plain.exceptAll(wh).unionAll(wh.exceptAll(plain))
      def cand(whiten: Boolean) =
        Dedup.embeddingBucketStats(corpus, planes = 16, bands = 4,
          maxBucketSize = 4096, refinePlanes = 12, whiten = whiten)
          .filter(col("sub").isNull)   // level-1 buckets only
          .agg(coalesce(sum(floor(col("n") * (col("n") - 1) / 2)), lit(0L))
            .cast("long").as("c"))
      plain.agg(count(lit(1)).as("n_pairs_plain"))
        .crossJoin(wh.agg(count(lit(1)).as("n_pairs_whiten")))
        .crossJoin(diff.agg(count(lit(1)).as("n_pair_diff")))
        .crossJoin(cand(whiten = false).select(col("c").as("cand_plain")))
        .crossJoin(cand(whiten = true).select(col("c").as("cand_whiten")))
    }),

    // IVF ANN probing ALL centroids — FULL oracle: with nprobe = K the
    // candidate set is the whole corpus, so the result must equal exact
    // brute-force top-k. This pins the index plumbing (assignment loses no
    // rows, probe join neither drops nor duplicates candidates, ranking is
    // total); bucketed-recall behavior at nprobe < K is spec-locked
    "q60_ivf_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val queries = embs.filter(col("vec_id") < 5)
      val idx = Ivf.build(embs, nCentroids = 16, seed = 42)
      val scored = Ivf.topK(idx, queries, k = Int.MaxValue, nprobe = 16)
        .withColumn("cosine", round(col("cosine"), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("query_id"), col("neighbor_id"), col("cosine"),
          col("rk").cast("long").as("rank"))
    }),

    // IVF at nprobe=1 — the APPROXIMATE path q60 never exercises, with an
    // analytically-certain recall bound: the corpus is 8 planted one-hot
    // clusters (spike 1000 at dim 2·(vec_id%8), ±8 integer jitter) built
    // from the embeddings table's vec_ids, so intra-cluster cosine ≈ 0.9999
    // and inter ≈ ±0.02 — every query's true top-10 lives entirely in its
    // own cluster, seeded KMeans (K=8) recovers the planted partition, and
    // probing ONE centroid is provably lossless. Oracle = exact brute-force
    // top-10, which nprobe=1 must therefore equal. Ranking is re-ranked on
    // the ROUNDED cosine with neighbor_id tiebreak (q60's cross-engine
    // stability pattern); vectors are integer-constructed → bit-identical
    // doubles in both engines.
    "q90_ivf_nprobe1" -> ((s, d) => {
      val corpus = Tables.embeddings(s, d).select(col("vec_id"),
        transform(sequence(lit(0), lit(15)), dd =>
          when(dd === (col("vec_id") % 8) * 2, 1000.0).otherwise(0.0)
            + ((col("vec_id") * 7 + dd * 13) % 17 - 8).cast("double"))
          .as("embedding"))
      val queries = corpus.filter(col("vec_id") < 8)
      val idx = Ivf.build(corpus, nCentroids = 8, seed = 42)
      val scored = Ivf.topK(idx, queries, k = Int.MaxValue, nprobe = 1)
        .withColumn("cosine", round(col("cosine"), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("query_id"), col("neighbor_id"), col("cosine"),
          col("rk").cast("long").as("rank"))
    }),

    // multimodal feature-extraction plumbing — FULL oracle: payloads are
    // the documents' UTF-8 bytes (pure ASCII corpus, verified), and the
    // stub kernel's per-stride double accumulation + one final float32
    // quantization are both exactly reproducible in SQL. Verifies the
    // mapPartitions kernel end-to-end: payload bytes in, per-row feature
    // vector out, no rows dropped
    "q61_multimodal_features" -> ((s, d) => {
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
      val feats = graft.llm.Multimodal.extractFeatures(media).toDF()
      val fCols = (0 until 8).map(j =>
        round(element_at(col("feature"), j + 1).cast("double"), 4).as(s"f$j"))
      feats.select((Seq(col("media_id"),
        col("n_bytes").cast("long").as("n_bytes")) ++ fCols): _*)
    }),

    // near-dup CLUSTERS (connected components over the verified pair
    // graph) — full oracle via recursive transitive closure. Transitivity
    // makes this STRICTER than q29's pair check: A~B~C must collapse into
    // one cluster even where A~C was never directly emitted. Same corpus
    // caveat as q29 (see docsWithDups); clustering is additionally robust
    // to a missed pair that is bridged by another path
    "q62_neardup_clusters" -> ((s, d) => {
      Dedup.nearDupClusters(docsWithDups(s, d), threshold = 0.7)
    }),

    // keep-BEST per near-dup cluster (q96's preference semantics lifted to
    // transitive clusters): pref = doc_id % 97 varies inside every planted
    // the minhash occupancy guard exercised IN the oracle-checked path:
    // 300 planted copies of a sentinel text (unique words → jaccard 0
    // against every real doc, so candidate spill from shared buckets is
    // verification-rejected and the output is hash-independent) overflow
    // every band bucket (300 > cap 256); identical signatures defeat the
    // adaptive re-key, so the cluster degrades to its star set — exactly
    // the 299 (min-id, member) pairs at jaccard 1 — while the natural
    // corpus + the q29 planted copies keep their exhaustive pair set.
    // ASSUMPTION (both engines): no real doc's 64-bit band hash collides
    // into the sentinel's bucket — a collision would place a smaller
    // doc_id in the over-cap bucket and shift the star representative off
    // 3000000, failing the hash compare. Probability ≈ corpus·bands·2⁻⁶⁴
    // (negligible), but if this gate ever breaks after a corpus change,
    // check for exactly this before suspecting the guard.
    "q106_minhash_guard" -> ((s, d) => {
      val sentinel = s.range(300).select(
        (col("id") + 3000000L).as("doc_id"),
        lit("mega boilerplate sentinel xyzzy quux corge grault garply waldo")
          .as("text"))
      val corpus = docsWithDups(s, d).select("doc_id", "text")
        .unionByName(sentinel)
      Dedup.minHashNearDups(corpus, threshold = 0.7)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // incremental dedup: the NEW batch (doc_id % 3 = 0, plus 20 planted
    // exact copies of the corpus head) matched against the REFERENCE
    // corpus (doc_id % 3 <> 0) — no self-join on either side. Full oracle:
    // exhaustive cross-side exact Jaccard at gate scale (same recall
    // argument as q29 — every ≥0.7 pair in this corpus sits at j ≥ 0.9,
    // where 8×4 banding recall is ≈ 0.9998, and the planted copies match
    // at j = 1 which banding can never miss)
    "q108_cross_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = docs.orderBy("doc_id").limit(20)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val newSide = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .unionByName(planted)
      val refSide = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      Dedup.crossCorpusNearDups(newSide, refSide, threshold = 0.7)
        .select(col("new_id"), col("ref_id"),
          round(col("jaccard"), 6).as("jaccard"))
    }),

    // the q108 computation routed through the PERSISTED serving store:
    // write the ref index (partition-pruned postings + payload layouts),
    // probe the same new batch against the directory. Same oracle SQL as
    // q108 — the store roundtrip must be invisible in the answers (the
    // q138 write→read gate pattern applied to dedup).
    "q146_minhash_store" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = docs.orderBy("doc_id").limit(20)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val newSide = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .unionByName(planted)
      val refSide = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val dir = java.nio.file.Files.createTempDirectory("graft_mh_store")
        .toString
      // nParts sized to the gate corpus (the q182 rule: 64 hash dirs for a
      // ~3K-doc reference is pure file-system overhead with no pruning
      // benefit; layout params don't change results — the sidecar pins
      // write/probe agreement). Production sizing note: OPTIMIZATION_r14.md.
      Dedup.writeMinHashStore(refSide, dir, nParts = 8)
      Dedup.crossCorpusNearDupsFromStore(newSide, dir, threshold = 0.7,
          nParts = 8)
        .select(col("new_id"), col("ref_id"),
          round(col("jaccard"), 6).as("jaccard"))
    }),

    // the q146 store built INCREMENTALLY (write even ref ids, append odd
    // ones) and probed with the same batch — identical-answers contract
    // again: the split write must be invisible, so the oracle is q146's
    // SQL verbatim.
    "q160_minhash_store_append" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = docs.orderBy("doc_id").limit(20)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val newSide = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .unionByName(planted)
      val refSide = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val dir = java.nio.file.Files.createTempDirectory("graft_mh_store_a")
        .toString
      // gate-corpus nParts sizing, as in q146 (identical answers either way)
      Dedup.writeMinHashStore(refSide.filter(col("doc_id") % 2 === 0), dir,
        nParts = 8)
      Dedup.appendMinHashStore(refSide.filter(col("doc_id") % 2 =!= 0), dir,
        nParts = 8)
      Dedup.crossCorpusNearDupsFromStore(newSide, dir, threshold = 0.7,
          nParts = 8)
        .select(col("new_id"), col("ref_id"),
          round(col("jaccard"), 6).as("jaccard"))
    }),

    // EXACT set-similarity self-join (prefix filtering) at a high
    // threshold (0.9 — where the length+prefix filters bite), over the
    // corpus plus 20 planted one-token-appended copies (token-set
    // J = n/(n+1) ≈ 0.97, above threshold by construction). The oracle is
    // the brute-force definition: every pair, exact token-set Jaccard —
    // prefix filtering must reproduce it verbatim or it dropped a pair.
    "q147_setsim_join" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = docs.orderBy("doc_id").limit(20)
        .withColumn("doc_id", col("doc_id") + 2000000L)
        .withColumn("text", concat(col("text"), lit(" qqplanttoken")))
      Dedup.setSimilarityJoin(docs.unionByName(planted), threshold = 0.9)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 6).as("jaccard"))
    }),

    // EXACT asymmetric containment join (excerpt/quote detection): the
    // probe batch is 20 planted 12-word excerpts whose token sets are
    // subsets of their source docs (containment exactly 1.0, invisible to
    // Jaccard at J ≈ len(excerpt)/len(doc)) plus a 1-in-25 suspect slice;
    // the corpus is all documents. Oracle = the brute-force definition
    // over every probe×corpus pair — the prefix+size filters must
    // reproduce it verbatim or they dropped a pair.
    "q155_containment_join" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val excerpts = docs.orderBy("doc_id").limit(20)
        .withColumn("doc_id", col("doc_id") + 3000000L)
        .withColumn("text",
          array_join(slice(split(trim(col("text")), "\\s+"), 1, 12), " "))
      val probe = docs.filter(col("doc_id") % 25 === 0).unionByName(excerpts)
      Dedup.containmentJoin(probe, docs, threshold = 0.9)
        .select(col("id_a"), col("id_b"),
          round(col("containment"), 6).as("containment"))
    }),

    // paragraph-level exact dedup (RefinedWeb "exact line dedup"): docs are
    // given line structure (newline every 10 words — the same regexp runs
    // in the oracle), 20 full copies + a unique sentinel paragraph are
    // planted, and every paragraph occurring >1× corpus-wide is removed
    // from ALL its documents; fully-emptied docs (the copied ones) drop.
    // Full oracle: md5-fingerprint equality ≡ normalized-string equality,
    // so DuckDB groups on the normalized paragraph directly.
    "q110_paragraph_dedup" -> ((s, d) => {
      val corpus = paragraphized(s, d)
      Dedup.removeRepeatedParagraphs(corpus)
        .select(col("doc_id"), col("text"))
    }),

    // Gopher duplicate-line quality signals over the same corpus — exact
    // integer ratios, rounded identically on both sides
    "q111_dup_line_stats" -> ((s, d) => {
      Dedup.dupLineStats(paragraphized(s, d))
        .select(col("doc_id"), col("n_lines"), col("dup_lines"),
          col("n_chars"), col("dup_chars"),
          round(col("dup_line_frac"), 6).as("dup_line_frac"),
          round(col("dup_char_frac"), 6).as("dup_char_frac"))
    }),

    // SemDeDup: nearest-centroid cells (centroids = the 4 lowest-id
    // embeddings, identically selectable in SQL), within-cell cosine
    // pairs at ≥0.95, CC, keep the least-prototypical member (lowest
    // centroid sim, tie → min id). cap 1024 > any cell at oracle scales,
    // so the guard stays inactive here (its active face is spec-locked in
    // SemDedupSpec); threshold/argmax margins are data-robust — the
    // corpus' only ≥0.95 pairs are the planted identical copies, and a
    // margin tripwire spec asserts the assignment argmax is not close
    "q112_semantic_dedup" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val copies = embs.orderBy("vec_id").limit(20)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      val corpus = embs.unionByName(copies).select("vec_id", "embedding")
      val cents = semCentroids(s, d)
      val kept = Dedup.semanticDedup(corpus, cents,
        threshold = 0.95, maxBucketSize = 1024)
      Dedup.assignCentroids(kept, cents)
        .select(col("vec_id"),
          col("centroid_id").cast("long").as("centroid_id"),
          round(col("centroid_sim"), 6).as("centroid_sim"))
    }),

    // cluster, so the arg-max is exercised beyond the min-id tiebreak;
    // oracle = q62's recursive closure + a per-cluster rank
    "q104_keep_best_cluster" -> ((s, d) => {
      val docs = docsWithDups(s, d)
      val clusters = Dedup.nearDupClusters(docs, threshold = 0.7)
      val withPref = docs.withColumn("pref", pmod(col("doc_id"), lit(97)))
      Dedup.keepBestPerCluster(withPref, clusters, col("pref"))
        .select(col("doc_id"), col("pref"))
    }),

    // clusterPairs over the EMBEDDING pair graph — the generalized CC face
    // composed with q59's exact pipeline (same corpus, planes, guard), so
    // the oracle reuses the shared pair CTE + a recursive closure. The 20
    // planted copies must cluster with their originals; everything else
    // self-clusters (natural cosines sit far below 0.95).
    "q95_embedding_clusters" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val copies = embs.orderBy("vec_id").limit(20)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      val corpus = embs.unionByName(copies)
      val pairs = Dedup.embeddingNearDups(corpus,
        threshold = 0.95, planes = 16, bands = 4,
        maxBucketSize = 256, refinePlanes = 12)
      Dedup.clusterPairs(corpus.select(col("vec_id")), pairs, idCol = "vec_id")
    }),

    // Gopher/C4-style rule filter — full oracle: every signal is an exact
    // integer ratio (token counts, distinct/total), so keep/drop verdicts
    // and machine-readable reasons reproduce bit-for-bit in SQL.
    // Thresholds chosen to actually split the synthetic corpus
    // (n_tok 10..99 median 56; swr median 0.06; rep median 0.54)
    "q63_quality_rules" -> ((s, d) => {
      val v = TextAnalysis.qualityRules(col("text"), minTokens = 25,
        minStopwordRatio = 0.02, maxRepetitionRatio = 0.65)
      Tables.documents(s, d).select(col("doc_id"),
        v.getField("keep").as("keep"),
        concat_ws(",", v.getField("reasons")).as("reasons"))
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

    // sliding-window chunking: 32-token windows, 8-token overlap (stride
    // 24) — integer boundaries, so chunk texts are engine-exact strings
    "q114_chunk_documents" -> ((s, d) => {
      graft.llm.Corpus.chunkDocuments(Tables.documents(s, d),
        chunkTokens = 32, overlapTokens = 8)
        .select(col("doc_id"),
          col("chunk_index").cast("long").as("chunk_index"),
          col("chunk_text"),
          col("n_tokens").cast("long").as("n_tokens"))
    }),

    // CCNet-style unigram cross-entropy quality score: model = the English
    // slice, scored = ALL docs (cross-lingual scoring spreads the
    // distribution). Full oracle: Laplace arithmetic over exact integer
    // counts + natural log, identical in both engines; per-doc mean
    // rounded to 6
    "q113_cross_entropy" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val refc = graft.llm.Corpus.unigramCounts(
        docs.filter(col("lang") === "en"))
      graft.llm.Corpus.crossEntropy(docs, refc)
        .select(col("doc_id"), col("n_tokens"),
          round(col("cross_entropy"), 6).as("cross_entropy"))
    }),

    // TF-IDF top-3 terms per document (Corpus.tfIdfTopTerms) — full oracle:
    // the operator ranks on the score ROUNDED to 6 decimals (term tiebreak),
    // which both engines agree on because every distinct (tf, df) pair is
    // separated by ≥ idf-gap ≈ 1/(df+1) ≫ 1e-6 at gate corpus sizes
    "q70_tfidf_topterms" -> ((s, d) => {
      graft.llm.Corpus.tfIdfTopTerms(Tables.documents(s, d), k = 3)
        .select(col("doc_id"), col("term"), col("tf"),
          round(col("score"), 4).as("score"),
          col("rank").cast("long").as("rank"))
    }),

    // concat-and-chunk sequence packing per source shard — all-integer
    // arithmetic (window cumsum + floor-div), fill is dyadic (n/256): exact
    "q71_pack_stats" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("n_tokens",
        size(split(lower(trim(col("text"))), "\\s+")).cast("long"))
      graft.llm.Corpus.packStats(docs, blockTokens = 256)
        .select(col("source"), col("pack_id"), col("n_docs"),
          col("n_tokens"), col("fill"))
    }),

    // GPT-3-style decontamination: word-3-shingle overlap pairs between the
    // train corpus and a held-out test slice. test_share is a ratio of the
    // SAME integers in both engines → bit-identical doubles, no rounding
    "q72_decontam_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.llm.Corpus.contaminationPairs(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0))
        .select(col("train_id"), col("test_id"), col("n_shared"), col("test_share"))
    }),

    // per-dimension embedding standardization — the whitening hook SCALE.md
    // prescribes against LSH bucket skew; one moments pass broadcast back,
    // transform rewrite, no second corpus shuffle. `+ 0.0` after round
    // normalizes IEEE negative zero: DuckDB's double round keeps the sign
    // bit (-0.0) while Spark's BigDecimal round emits +0.0 — numerically
    // equal but different bytes under the driver's hash compare
    "q83_standardize" -> ((s, d) => {
      val std = graft.llm.Similarity.standardizeEmbeddings(Tables.embeddings(s, d))
      std.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "z")))
        .select(col("vec_id"), col("dim"), (round(col("z"), 4) + lit(0.0)).as("z"))
    }),

    // multimodal frame-sampling + resize plumbing: documents as fake video
    // payloads (ASCII text bytes), sampleFrames' even slicing and
    // resizeMeta's struct rewrite both replicated in SQL. char==byte on
    // this corpus, so DuckDB's substring mirrors the binary slice exactly
    "q82_frame_sampling" -> ((s, d) => {
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        lit("video").as("media_type"),
        struct(lit(640).as("width"), lit(480).as("height"),
          (col("n_chars") * 40L).as("duration_ms"),
          lit("mp4").as("format")).as("meta"))
      val frames = graft.llm.Multimodal.sampleFrames(media, n = 4)
        .select(col("media_id"), col("frame_idx"),
          length(col("frame_payload")).cast("long").as("frame_len"),
          md5(col("frame_payload")).as("frame_hash"))
      val resized = graft.llm.Multimodal.resizeMeta(media, 320, 240)
        .select(col("media_id"), col("meta.width").as("r_width"),
          col("meta.format").as("r_format"))
      frames.join(resized, Seq("media_id"))
    }),

    // PII scrub: emails/IPv4s/phones injected deterministically into every
    // doc, then redacted + counted through the staged Scrub pipeline. The
    // oracle replays the identical RE2-safe regexes in DuckDB — a genuine
    // cross-engine regex-semantics check, not just arithmetic
    "q80_pii_scrub" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@ex.com from 10.0."),
          pmod(col("doc_id"), lit(256)), lit(".7 call +1 (555) 010-1234"))
          .as("text"))
      val counts = graft.llm.Scrub.piiCounts(docs)
      val red = graft.llm.Scrub.scrub(docs)
        .select(col("doc_id"), length(col("text")).as("red_len"))
      counts.join(red, Seq("doc_id"))
        .select(col("doc_id"),
          col("n_emails").cast("long").as("n_emails"),
          col("n_ips").cast("long").as("n_ips"),
          col("n_phones").cast("long").as("n_phones"),
          col("red_len").cast("long").as("red_len"))
    }),

    // corpus-wide top-20 word bigrams with doc frequency — the vocabulary
    // stats pass; tie-broken on the gram so both engines agree exactly
    "q81_top_ngrams" -> ((s, d) => {
      graft.llm.Corpus.topNgrams(Tables.documents(s, d), n = 2, k = 20)
    }),

    // heavy-hitter (freqItems candidates + exact candidate counts) top-k
    // MUST equal the exact top-k — same oracle as q81. support 1e-4 keeps
    // every top-20 bigram comfortably above the freqItems floor while the
    // candidate set stays driver-tiny
    "q103_top_ngrams_approx" -> ((s, d) => {
      graft.llm.Corpus.topNgramsApprox(Tables.documents(s, d), n = 2, k = 20,
        support = 1e-4)
    }),

    // the filtering face of q72: drop train docs whose shared-shingle share
    // of any test doc reaches 0.2 (anti-join on the broadcast bad-id set)
    "q73_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.llm.Corpus.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), minShare = 0.2)
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
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
    }),

    // REAL image decode (javax.imageio inside the distributed kernel).
    // Fixture: per subset image (split P, id%100==0), (id/100)%5 plants a
    // payload — solid-RGB PNG / grayscale PNG / RGB JPEG / corrupt bytes /
    // null. The tiny subset is encoded on the DRIVER (same rationale as
    // q68: executor-side fixture writes only work in local mode), the
    // DECODE is the distributed operator under test. PNG is lossless, so
    // decoded dims + band count + exact per-band means reproduce
    // arithmetically in SQL; JPEG rows oracle dims/channels only (lossy
    // means masked to null); corrupt/null rows oracle the ok flag + magic
    // sniff
    "q97_image_decode" -> ((s, d) => {
      import java.awt.image.BufferedImage
      val ids = graft.operators.Locators.filterImages(
        graft.operators.Locators.getSplit(Tables.datasetView(s, d), Some("P")),
        col("id") % 100 === 0).images
        .select(col("id")).collect().map(_.getLong(0)).sorted
      def enc(img: BufferedImage, fmt: String): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, bos)
        bos.toByteArray
      }
      def rgbImage(w: Int, h: Int, r: Int, g: Int, b: Int): BufferedImage = {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val rgb = (r << 16) | (g << 8) | b
        var y = 0
        while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
        img
      }
      def grayImage(w: Int, h: Int, v: Int): BufferedImage = {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) { var x = 0; while (x < w) { raster.setSample(x, y, 0, v); x += 1 }; y += 1 }
        img
      }
      val rows: Seq[(Long, Array[Byte])] = ids.toSeq.map { id =>
        val w = (4 + id % 13).toInt; val h = (4 + (id / 13) % 11).toInt
        val payload: Array[Byte] = (id / 100) % 5 match {
          case 0 => enc(rgbImage(w, h, (id % 256).toInt, ((id / 3) % 256).toInt,
            ((id / 7) % 256).toInt), "png")
          case 1 => enc(grayImage(w, h, (id % 256).toInt), "png")
          case 2 => enc(rgbImage(w, h, (id % 256).toInt, ((id / 3) % 256).toInt,
            ((id / 7) % 256).toInt), "jpg")
          case 3 => s"corrupt_payload_$id".getBytes("US-ASCII")
          case _ => null
        }
        (id, payload)
      }
      import s.implicits._
      val media = rows.toDF("media_id", "payload")
      graft.llm.Multimodal.decodeImages(media).toDF()
        .select(col("media_id"), col("format"), col("decode_ok"),
          col("width"), col("height"), col("channels"),
          when(col("format") === "png" && col("decode_ok"),
            element_at(col("mean_channel"), 1)).as("m0"),
          when(col("format") === "png" && col("decode_ok") && col("channels") === 3,
            element_at(col("mean_channel"), 2)).as("m1"),
          when(col("format") === "png" && col("decode_ok") && col("channels") === 3,
            element_at(col("mean_channel"), 3)).as("m2"))
    }),

    // REAL image resize (nearest-neighbor kernel, PNG re-encode): solid
    // RGB sources — any correct resampling preserves per-channel means
    // EXACTLY, so the oracle is pure id arithmetic; one corrupt payload
    // exercises the fail-closed row. The resampling arithmetic itself and
    // the PNG roundtrip are locked on gradient rasters in Round9Spec.
    "q186_image_resize" -> ((s, d) => {
      import java.awt.image.BufferedImage
      val ids = graft.operators.Locators.filterImages(
        graft.operators.Locators.getSplit(Tables.datasetView(s, d), Some("P")),
        col("id") % 100 === 0).images
        .select(col("id")).collect().map(_.getLong(0)).sorted
      def enc(img: BufferedImage): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      val rows: Seq[(Long, Array[Byte])] = ids.toSeq.map { id =>
        if (id % 500 == 300) (id, s"not_an_image_$id".getBytes("US-ASCII"))
        else {
          val w = (4 + id % 13).toInt; val h = (4 + (id / 13) % 11).toInt
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val rgb = (((id * 11) % 256).toInt << 16) |
            (((id * 29) % 256).toInt << 8) | ((id * 53) % 256).toInt
          var y = 0
          while (y < h) {
            var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1
          }
          (id, enc(img))
        }
      }
      import s.implicits._
      val media = rows.toDF("media_id", "payload")
      graft.llm.Multimodal.resizeImages(media, width = 16, height = 16).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("resize_ok"), round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
    }),

    // REAL audio decode (javax.sound.sampled header parse, distributed).
    // Same fixture pattern as q97: per subset image id, (id/100)%4 plants
    // a PCM WAV (varying rate/channels/frames), a corrupt payload, or
    // null. Every reported field is integer arithmetic over the planted
    // parameters, so the oracle reproduces it exactly.
    "q100_audio_decode" -> ((s, d) => {
      val ids = graft.operators.Locators.filterImages(
        graft.operators.Locators.getSplit(Tables.datasetView(s, d), Some("P")),
        col("id") % 100 === 0).images
        .select(col("id")).collect().map(_.getLong(0)).sorted
      def wav(sampleRate: Int, channels: Int, frames: Int): Array[Byte] = {
        val blockAlign = channels * 2 // 16-bit PCM
        val dataLen = frames * blockAlign
        val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(channels.toShort)
          .putInt(sampleRate).putInt(sampleRate * blockAlign)
          .putShort(blockAlign.toShort).putShort(16)
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        bb.array() // PCM payload stays zeroed silence
      }
      val rows: Seq[(Long, Array[Byte])] = ids.toSeq.map { id =>
        val sr = (8000 + (id % 4) * 4000).toInt
        val ch = (1 + id % 2).toInt
        val fr = (100 + id % 50).toInt
        val payload: Array[Byte] = (id / 100) % 4 match {
          case 0 | 1 => wav(sr, ch, fr)
          case 2 => s"RIFFnot really a wave file $id".getBytes("US-ASCII")
          case _ => null
        }
        (id, payload)
      }
      import s.implicits._
      graft.llm.Multimodal.decodeAudio(rows.toDF("media_id", "payload")).toDF()
        .select(col("media_id"), col("format"), col("decode_ok"),
          col("sample_rate"), col("channels"), col("bits"),
          col("n_frames"), col("duration_ms"))
    }),

    // REAL video-frame sampling (animated GIF through ImageIO's multi-image
    // reader — the one multi-frame container the JDK can decode). Fixture:
    // per subset image id, (id/100)%4 plants an animated GIF with
    // 3 + id%4 frames (each frame solid palette index (id*7 + i*13)%256
    // over an identity grayscale palette, so decoded means ARE the planted
    // values), a corrupt payload, or null. Kernel samples 3 evenly spaced
    // frames (k*total/3); GIF is lossless so every emitted number is
    // integer arithmetic the oracle reproduces exactly
    "q105_video_frames" -> ((s, d) => {
      import java.awt.image.{BufferedImage, IndexColorModel}
      val ids = graft.operators.Locators.filterImages(
        graft.operators.Locators.getSplit(Tables.datasetView(s, d), Some("P")),
        col("id") % 100 === 0).images
        .select(col("id")).collect().map(_.getLong(0)).sorted
      val gray = Array.tabulate(256)(_.toByte)
      val icm = new IndexColorModel(8, 256, gray, gray, gray)
      def frame(w: Int, h: Int, v: Int): BufferedImage = {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
        val r = img.getRaster
        var y = 0
        while (y < h) { var x = 0; while (x < w) { r.setSample(x, y, 0, v); x += 1 }; y += 1 }
        img
      }
      def animatedGif(w: Int, h: Int, values: Seq[Int]): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        wr.setOutput(ios)
        wr.prepareWriteSequence(null)
        values.foreach { v =>
          wr.writeToSequence(new javax.imageio.IIOImage(frame(w, h, v), null, null), null)
        }
        wr.endWriteSequence(); wr.dispose(); ios.close()
        bos.toByteArray
      }
      val rows: Seq[(Long, Array[Byte])] = ids.toSeq.map { id =>
        // h >= 5: the JDK GIF writer corrupts the last row of height-4
        // images (full w=4..16 × h=4..14 scan, round 7); h=5.. is clean
        val w = (4 + id % 9).toInt; val h = (5 + (id / 9) % 7).toInt
        val total = (3 + id % 4).toInt
        val payload: Array[Byte] = (id / 100) % 4 match {
          case 0 | 1 => animatedGif(w, h,
            (0 until total).map(i => ((id * 7 + i * 13) % 256).toInt))
          case 2 => s"not_a_video_$id".getBytes("US-ASCII")
          case _ => null
        }
        (id, payload)
      }
      import s.implicits._
      graft.llm.Multimodal.decodeFrames(rows.toDF("media_id", "payload"), n = 3).toDF()
        .select(col("media_id"), col("format"), col("frame_idx"),
          col("n_frames"), col("decode_ok"), col("width"), col("height"),
          col("channels"),
          when(col("decode_ok"), element_at(col("mean_channel"), 1)).as("m0"))
    })
  )

  private val sw = TextAnalysis.stopwords.map(s => s"'$s'").mkString(", ")
  private def vocabList(lang: String) =
    TextAnalysis.langVocab(lang).map(s => s"'$s'").mkString(", ")

  /** DuckDB replication of the md5-nibble SimHash (Dedup.simHashes): 16
    * nibble columns from the first 16 hex chars of md5(token), 64 vote sums,
    * signature assembled as two positive 32-bit halves (hi = bits 32..63,
    * lo = bits 0..31) so no BIGINT sign edge cases arise; hamming is the
    * sum of the two halves' xor popcounts. */
  private val simhashNibSql = (1 to 16).map(c =>
    s"strpos('0123456789abcdef', substr(h, $c, 1)) - 1 AS n$c").mkString(", ")
  private val simhashVoteSql = (0 until 64).map { b =>
    val c = 16 - b / 4; val div = 1 << (b % 4)
    s"sum(CASE WHEN (n$c // $div) % 2 = 1 THEN 1 ELSE -1 END) AS v$b"
  }.mkString(", ")
  private def simhashHalfSql(lo: Int): String = (lo until lo + 32).map { b =>
    s"(CASE WHEN v$b > 0 THEN ${1L << (b - lo)} ELSE 0 END)"
  }.mkString(" + ")

  /** DuckDB replication of Similarity.hyperplaneSignature for `planes`
    * planes over a DOUBLE[] column named v (1-indexed in DuckDB, so the
    * coefficient uses i-1 to match Spark's 0-based element index). */
  private def hyperplaneSigSql(planes: Int): String = (0 until planes).map { p =>
    val add = p * 40503L + 12345L
    s"(CASE WHEN list_sum(list_transform(range(1, len(v) + 1), " +
      s"i -> v[i] * ((((i - 1) * 2654435761 + $add) % 1000003) / 1000003.0 - 0.5))) > 0 " +
      s"THEN ${1L << p} ELSE 0 END)"
  }.mkString(" + ")

  /** Shared oracle body for q59/q95: corpus ∪ 20 exact copies, 28-bit
    * hyperplane signatures, the guard's exact integer decisions (cap 256,
    * ADAPTIVE refine width — smallest bit count with n ≤ cap·2^bits, up to
    * 12 bits — star repair), verified cosines in CTE `j`. Starts
    * `WITH RECURSIVE` so q95 can append its transitive-closure CTE;
    * DuckDB accepts the keyword with no recursive member (q59). */
  private def embPairCte: String =
    s"""WITH RECURSIVE base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |              FROM embeddings),
       |allv AS (SELECT * FROM base
       |         UNION ALL
       |         SELECT vec_id + 1000000 AS vec_id, v FROM
       |           (SELECT * FROM base ORDER BY vec_id LIMIT 20)),
       |sigs AS (SELECT vec_id, v, ${hyperplaneSigSql(28)} AS sig FROM allv),
       |banded AS (
       |  SELECT vec_id, b, (sig >> (b * 4)) & 15 AS bucket,
       |         ((sig >> 16) & 4095) + 1 AS sub
       |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS b)),
       |occ AS (SELECT b, bucket, count(*) AS n FROM banded GROUP BY 1, 2),
       |tagged AS (
       |  SELECT t.vec_id, t.b, t.bucket, t.sub, o.n
       |  FROM banded t JOIN occ o ON t.b = o.b AND t.bucket = o.bucket),
       |direct AS (SELECT vec_id, b, bucket, 0 AS sub FROM tagged WHERE n <= 256),
       |refined AS (
       |  SELECT vec_id, b, bucket,
       |         ((sub - 1) & (CASE ${(1 until 12).map(i =>
                  s"WHEN n <= ${256L * (1L << i)} THEN ${(1L << i) - 1}")
                  .mkString(" ")} ELSE 4095 END)) + 1 AS sub
       |  FROM tagged WHERE n > 256),
       |occ2 AS (SELECT b, bucket, sub, count(*) AS n2
       |         FROM refined GROUP BY 1, 2, 3),
       |kept AS (
       |  SELECT r.vec_id, r.b, r.bucket, r.sub
       |  FROM refined r JOIN occ2 o
       |    ON r.b = o.b AND r.bucket = o.bucket AND r.sub = o.sub
       |  WHERE o.n2 <= 256),
       |keyed AS (SELECT * FROM direct UNION ALL SELECT * FROM kept),
       |dropped AS (
       |  SELECT r.vec_id, r.b, r.bucket, r.sub
       |  FROM refined r JOIN occ2 o
       |    ON r.b = o.b AND r.bucket = o.bucket AND r.sub = o.sub
       |  WHERE o.n2 > 256),
       |rep AS (SELECT b, bucket, sub, min(vec_id) AS rep_id
       |        FROM dropped GROUP BY 1, 2, 3),
       |star AS (
       |  SELECT rep.rep_id AS id_a, d.vec_id AS id_b
       |  FROM dropped d JOIN rep
       |    ON d.b = rep.b AND d.bucket = rep.bucket AND d.sub = rep.sub
       |  WHERE d.vec_id <> rep.rep_id),
       |pairs AS (
       |  SELECT DISTINCT id_a, id_b FROM (
       |    SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |    FROM keyed a JOIN keyed b
       |      ON a.b = b.b AND a.bucket = b.bucket AND a.sub = b.sub
       |         AND a.vec_id < b.vec_id
       |    UNION ALL SELECT id_a, id_b FROM star)),
       |j AS (
       |  SELECT p.id_a, p.id_b, list_cosine_similarity(x.v, y.v) AS cosine
       |  FROM pairs p JOIN allv x ON p.id_a = x.vec_id
       |               JOIN allv y ON p.id_b = y.vec_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q173_snapshot_diff" ->
      """WITH oldsnap AS (SELECT doc_id, text FROM documents
        |                 WHERE doc_id % 11 <> 3),
        |newsnap AS (SELECT doc_id,
        |              CASE WHEN doc_id % 7 = 2 THEN text || ' v2'
        |                   ELSE text END AS text
        |            FROM documents WHERE doc_id % 13 <> 5)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |       CASE WHEN o.doc_id IS NULL THEN 'added'
        |            WHEN n.doc_id IS NULL THEN 'removed'
        |            WHEN o.text <> n.text THEN 'changed'
        |            ELSE 'unchanged' END AS status
        |FROM oldsnap o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id""".stripMargin,

    "q188_length_buckets" ->
      """WITH t AS (SELECT CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n
        |           FROM documents),
        |b AS (SELECT n,
        |        CAST(CASE WHEN n <= 16 THEN 0 WHEN n <= 24 THEN 1
        |                  WHEN n <= 32 THEN 2 ELSE 3 END AS BIGINT) AS bucket,
        |        CAST(CASE WHEN n <= 16 THEN 16 WHEN n <= 24 THEN 24
        |                  WHEN n <= 32 THEN 32 ELSE -1 END AS BIGINT) AS bound
        |      FROM t),
        |g AS (SELECT bucket, bound, count(*) AS n_docs, max(n) AS max_tokens,
        |             sum(n) AS sum_tokens
        |      FROM b GROUP BY 1, 2)
        |SELECT bucket, bound, n_docs, max_tokens,
        |       CAST(sum_tokens AS BIGINT) AS sum_tokens,
        |       CAST(n_docs * max_tokens - sum_tokens AS BIGINT) AS waste,
        |       CASE WHEN n_docs * max_tokens = 0 THEN 0.0
        |            ELSE round(CAST(n_docs * max_tokens - sum_tokens AS DOUBLE)
        |                       / (n_docs * max_tokens), 6) END AS waste_share
        |FROM g""".stripMargin,

    "q185_unkify" ->
      """WITH fab AS (SELECT doc_id,
        |    text || CASE WHEN doc_id % 5 = 0
        |                 THEN ' uniqtok' || CAST(doc_id AS VARCHAR)
        |                 ELSE '' END AS text
        |  FROM documents),
        |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |      FROM fab),
        |g AS (SELECT doc_id, w, unnest(range(0, len(w))) AS pos FROM t),
        |tok AS (SELECT doc_id, pos, w[pos+1] AS term FROM g
        |        WHERE length(w[pos+1]) > 0),
        |c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
        |o AS (SELECT doc_id, pos,
        |        CASE WHEN cnt < 2 THEN '<unk>' ELSE term END AS tout
        |      FROM tok JOIN c USING (term)),
        |r AS (SELECT doc_id,
        |        array_to_string(list(tout ORDER BY pos), ' ') AS t2
        |      FROM o GROUP BY 1)
        |SELECT f.doc_id, coalesce(r.t2, f.text) AS text
        |FROM fab f LEFT JOIN r USING (doc_id)""".stripMargin,

    "q183_vocab_coverage" ->
      """WITH t AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |           FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM t
        |      WHERE length(term) > 0 GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM c),
        |w AS (SELECT term, cnt,
        |        row_number() OVER (ORDER BY cnt DESC, term) AS rank,
        |        sum(cnt) OVER (ORDER BY cnt DESC, term) AS cum
        |      FROM c)
        |SELECT term, cnt, CAST(rank AS BIGINT) AS rank,
        |       round(cum / tot.tot, 6) AS cum_share,
        |       CAST(cum - cnt AS DOUBLE) < tot.tot * 0.9 AS selected
        |FROM w CROSS JOIN tot""".stripMargin,

    "q181_sentence_segment" ->
      """WITH fab AS (SELECT doc_id,
        |    'First sentence. Second one! Is this third?? ' || text || '.' AS text
        |  FROM documents),
        |seg AS (SELECT doc_id,
        |          list_filter(list_transform(
        |            regexp_extract_all(text, '[^.!?]+[.!?]*'),
        |            s -> trim(s)), s -> length(s) > 0) AS sents
        |        FROM fab),
        |g AS (SELECT doc_id, sents, unnest(range(0, len(sents))) AS i FROM seg)
        |SELECT doc_id, CAST(i AS BIGINT) AS sent_idx, sents[i+1] AS sentence
        |FROM g""".stripMargin,

    "q176_lsh_plan" ->
      """WITH rr AS (SELECT unnest(range(1, 129)) AS r),
        |cfg AS (SELECT CAST(128 // r AS BIGINT) AS b, CAST(r AS BIGINT) AS r
        |        FROM rr WHERE 128 % r = 0),
        |g AS (SELECT unnest(range(1, 20)) AS i),
        |p AS (SELECT cfg.b, cfg.r, i/20.0 AS s,
        |        1 - power(1 - power(i/20.0, cfg.r), cfg.b) AS ps
        |      FROM cfg CROSS JOIN g),
        |m AS (SELECT b, r,
        |        round(sum(CASE WHEN s < 0.8 THEN ps ELSE 0 END)/20.0, 6) AS fp_mass,
        |        round(sum(CASE WHEN s >= 0.8 THEN 1 - ps ELSE 0 END)/20.0, 6) AS fn_mass
        |      FROM p GROUP BY 1, 2),
        |t AS (SELECT *, round(fp_mass + fn_mass, 6) AS total FROM m)
        |SELECT b, r, fp_mass, fn_mass, total,
        |       total = (SELECT min(total) FROM t) AS chosen
        |FROM t""".stripMargin,

    "q177_source_drift" ->
      """WITH t AS (SELECT source, doc_id // 50 AS batch,
        |             len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens
        |           FROM documents),
        |cells AS (SELECT source, batch, count(*) AS n_docs, avg(n_tokens) AS bm
        |          FROM t GROUP BY 1, 2),
        |grp AS (SELECT source, avg(bm) AS mu, stddev_pop(bm) AS sigma
        |        FROM cells GROUP BY 1)
        |SELECT c.source, CAST(c.batch AS BIGINT) AS batch, c.n_docs,
        |       round(c.bm, 6) AS batch_mean,
        |       round(CASE WHEN g.sigma IS NULL OR g.sigma = 0 THEN 0.0
        |                  ELSE (c.bm - g.mu) / g.sigma END, 6) AS z
        |FROM cells c JOIN grp g USING (source)""".stripMargin,

    "q96_keep_best" ->
      """WITH alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |r AS (
        |  SELECT doc_id, doc_id % 7 AS pref,
        |         row_number() OVER (
        |           PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |           ORDER BY doc_id % 7 DESC, doc_id) AS rk
        |  FROM alldocs)
        |SELECT doc_id, CAST(pref AS BIGINT) AS pref FROM r WHERE rk = 1""".stripMargin,

    "q29_minhash_neardup" ->
      """WITH alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM alldocs)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |           / len(list_distinct(list_concat(a.s, b.s))) AS j
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.7""".stripMargin,

    // exhaustive cross-side Jaccard: new batch (doc_id % 3 = 0 + planted
    // copies) × reference corpus (doc_id % 3 <> 0); same shingle kernel
    // as q29
    "q108_cross_dedup" ->
      """WITH newdocs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |refdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        |shn AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM newdocs)),
        |shr AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM refdocs)),
        |pairs AS (
        |  SELECT n.doc_id AS new_id, r.doc_id AS ref_id,
        |         CAST(len(list_intersect(n.s, r.s)) AS DOUBLE)
        |           / len(list_distinct(list_concat(n.s, r.s))) AS j
        |  FROM shn n CROSS JOIN shr r)
        |SELECT new_id, ref_id, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.7""".stripMargin,

    // the brute-force definition — every pair, exact token-set Jaccard;
    // planted copies differ by exactly one appended token
    "q147_setsim_join" ->
      """WITH alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text || ' qqplanttoken' FROM
        |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |s AS (SELECT doc_id,
        |        list_distinct(list_filter(
        |          string_split_regex(lower(trim(text)), '\s+'),
        |          w -> length(w) > 0)) AS t
        |      FROM alldocs),
        |s2 AS (SELECT doc_id, t FROM s WHERE len(t) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |           / len(list_distinct(list_concat(a.t, b.t))) AS j
        |  FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, round(j, 6) AS jaccard
        |FROM pairs WHERE j >= 0.9""".stripMargin,

    // brute-force containment over every probe×corpus pair; planted
    // excerpts are the first 12 whitespace tokens of the 20 lowest-id docs
    "q155_containment_join" ->
      """WITH probedocs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id,
        |         array_to_string(list_slice(
        |           string_split_regex(trim(text), '\s+'), 1, 12), ' ') AS text
        |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |tok AS (SELECT doc_id,
        |          list_distinct(list_filter(
        |            string_split_regex(lower(trim(text)), '\s+'),
        |            w -> length(w) > 0)) AS t
        |        FROM probedocs),
        |p2 AS (SELECT doc_id, t FROM tok WHERE len(t) > 0),
        |ctok AS (SELECT doc_id,
        |           list_distinct(list_filter(
        |             string_split_regex(lower(trim(text)), '\s+'),
        |             w -> length(w) > 0)) AS t
        |         FROM documents),
        |c2 AS (SELECT doc_id, t FROM ctok WHERE len(t) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.t, b.t)) AS DOUBLE) / len(a.t) AS c
        |  FROM p2 a JOIN c2 b ON a.doc_id <> b.doc_id)
        |SELECT id_a, id_b, round(c, 6) AS containment
        |FROM pairs WHERE c >= 0.9""".stripMargin,

    // identical answers contract: the store roundtrip replays q108's SQL
    "q146_minhash_store" ->
      """WITH newdocs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |refdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        |shn AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM newdocs)),
        |shr AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM refdocs)),
        |pairs AS (
        |  SELECT n.doc_id AS new_id, r.doc_id AS ref_id,
        |         CAST(len(list_intersect(n.s, r.s)) AS DOUBLE)
        |           / len(list_distinct(list_concat(n.s, r.s))) AS j
        |  FROM shn n CROSS JOIN shr r)
        |SELECT new_id, ref_id, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.7""".stripMargin,

    // identical-answers contract once more: the incremental (write +
    // append) store must answer exactly like the one-shot store, so the
    // oracle is q146's statement verbatim
    "q160_minhash_store_append" ->
      """WITH newdocs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |refdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        |shn AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM newdocs)),
        |shr AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM refdocs)),
        |pairs AS (
        |  SELECT n.doc_id AS new_id, r.doc_id AS ref_id,
        |         CAST(len(list_intersect(n.s, r.s)) AS DOUBLE)
        |           / len(list_distinct(list_concat(n.s, r.s))) AS j
        |  FROM shn n CROSS JOIN shr r)
        |SELECT new_id, ref_id, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.7""".stripMargin,

    // stride 24 = 32 − 8; nchunks = 1 + ceil((n − 32)/24) via floor
    // division (// floors negatives, greatest clamps); chunk i = tokens
    // [i·24+1 .. i·24+32] 1-based inclusive
    "q114_chunk_documents" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, ws,
        |         CASE WHEN array_to_string(ws, '') = '' THEN 0
        |              ELSE len(ws) END AS n
        |  FROM w),
        |k AS (
        |  SELECT doc_id, ws, n,
        |         1 + greatest(0, (n - 32 + 24 - 1) // 24) AS nchunks
        |  FROM t WHERE n > 0),
        |c AS (SELECT doc_id, ws, n, unnest(range(0, nchunks)) AS i FROM k)
        |SELECT doc_id, i AS chunk_index,
        |       array_to_string(ws[(i*24+1):(i*24+32)], ' ') AS chunk_text,
        |       CAST(least(32, n - i*24) AS BIGINT) AS n_tokens
        |FROM c""".stripMargin,

    // Laplace unigram model from the en slice; OOV = 1/(T+V+1); per-doc
    // mean negative log-likelihood per token
    "q113_cross_entropy" ->
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
        |  WHERE length(word) > 0 GROUP BY doc_id, word)
        |SELECT doc_id, CAST(sum(dc) AS BIGINT) AS n_tokens,
        |       round(-sum(dc * ln(CAST(coalesce(c + 1, 1) AS DOUBLE)
        |                          / (t + v + 1))) / sum(dc), 6)
        |         AS cross_entropy
        |FROM dw LEFT JOIN refc USING (word) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,

    // SemDeDup: exhaustive within-cell pairs (cap inactive by gate
    // construction) + recursive closure + lowest-sim/min-id keep rank
    "q112_semantic_dedup" ->
      """WITH RECURSIVE base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |              FROM embeddings),
        |allv AS (SELECT vec_id, v FROM base
        |         UNION ALL
        |         SELECT vec_id + 1000000 AS vec_id, v FROM
        |           (SELECT * FROM base ORDER BY vec_id LIMIT 20)),
        |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
        |          FROM (SELECT * FROM base ORDER BY vec_id LIMIT 4)),
        |assign AS (
        |  SELECT vec_id, cid, sim FROM (
        |    SELECT a.vec_id, c.cid, list_cosine_similarity(a.v, c.cv) AS sim,
        |           row_number() OVER (PARTITION BY a.vec_id
        |                              ORDER BY list_cosine_similarity(a.v, c.cv) DESC,
        |                                       c.cid) AS rn
        |    FROM allv a CROSS JOIN cents c) WHERE rn = 1),
        |vp AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM allv a JOIN allv b ON a.vec_id < b.vec_id
        |  JOIN assign aa ON aa.vec_id = a.vec_id
        |  JOIN assign ab ON ab.vec_id = b.vec_id
        |  WHERE aa.cid = ab.cid AND list_cosine_similarity(a.v, b.v) >= 0.95),
        |bidir AS (SELECT id_a AS a, id_b AS b FROM vp
        |          UNION ALL SELECT id_b, id_a FROM vp),
        |reach(a, b) AS (
        |  SELECT vec_id, vec_id FROM allv
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN bidir e ON r.b = e.a),
        |clusters AS (SELECT a AS vec_id, min(b) AS cluster_id
        |             FROM reach GROUP BY a),
        |keep AS (
        |  SELECT vec_id FROM (
        |    SELECT c.vec_id,
        |           row_number() OVER (PARTITION BY c.cluster_id
        |                              ORDER BY s.sim ASC, c.vec_id ASC) AS rn
        |    FROM clusters c JOIN assign s ON s.vec_id = c.vec_id) WHERE rn = 1)
        |SELECT k.vec_id, CAST(s.cid AS BIGINT) AS centroid_id,
        |       round(s.sim, 6) AS centroid_sim
        |FROM keep k JOIN assign s ON s.vec_id = k.vec_id""".stripMargin,

    // paragraph dedup: group on the NORMALIZED paragraph string (the md5
    // fingerprint's equality relation), drop every paragraph with corpus
    // count > 1, reassemble in position order; docs with no survivors
    // vanish via the inner-join + GROUP BY
    "q110_paragraph_dedup" ->
      """WITH prep AS (
        |  SELECT doc_id,
        |         regexp_replace(text, '((\S+ ){9}\S+) ', '\1' || chr(10), 'g') AS text
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, text FROM prep
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         text || chr(10) || 'sentinel unique paragraph ' || (doc_id + 1000000) AS text
        |  FROM (SELECT * FROM prep ORDER BY doc_id LIMIT 20)),
        |para AS (
        |  SELECT doc_id,
        |         unnest(string_split(text, chr(10))) AS p,
        |         generate_subscripts(string_split(text, chr(10)), 1) AS i
        |  FROM corpus),
        |cnt AS (
        |  SELECT regexp_replace(lower(trim(p)), '\s+', ' ', 'g') AS k, count(*) AS c
        |  FROM para GROUP BY 1)
        |SELECT doc_id, string_agg(p, chr(10) ORDER BY i) AS text
        |FROM para JOIN cnt ON regexp_replace(lower(trim(p)), '\s+', ' ', 'g') = k
        |WHERE c <= 1
        |GROUP BY doc_id""".stripMargin,

    // Gopher dup-line signals: same paragraph/count CTEs, exact integer
    // ratios rounded to 6 on both sides
    "q111_dup_line_stats" ->
      """WITH prep AS (
        |  SELECT doc_id,
        |         regexp_replace(text, '((\S+ ){9}\S+) ', '\1' || chr(10), 'g') AS text
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, text FROM prep
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         text || chr(10) || 'sentinel unique paragraph ' || (doc_id + 1000000) AS text
        |  FROM (SELECT * FROM prep ORDER BY doc_id LIMIT 20)),
        |para AS (
        |  SELECT doc_id,
        |         unnest(string_split(text, chr(10))) AS p,
        |         generate_subscripts(string_split(text, chr(10)), 1) AS i
        |  FROM corpus),
        |cnt AS (
        |  SELECT regexp_replace(lower(trim(p)), '\s+', ' ', 'g') AS k, count(*) AS c
        |  FROM para GROUP BY 1),
        |joined AS (
        |  SELECT doc_id, p, c
        |  FROM para JOIN cnt ON regexp_replace(lower(trim(p)), '\s+', ' ', 'g') = k)
        |SELECT doc_id,
        |  count(*) AS n_lines,
        |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_lines,
        |  CAST(sum(len(p)) AS BIGINT) AS n_chars,
        |  CAST(sum(CASE WHEN c > 1 THEN len(p) ELSE 0 END) AS BIGINT) AS dup_chars,
        |  round(CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
        |    AS dup_line_frac,
        |  CASE WHEN sum(len(p)) = 0 THEN 0.0
        |       ELSE round(CAST(sum(CASE WHEN c > 1 THEN len(p) ELSE 0 END) AS DOUBLE)
        |                  / sum(len(p)), 6) END AS dup_char_frac
        |FROM joined
        |GROUP BY doc_id""".stripMargin,

    // q29's exhaustive pair set over the natural corpus + planted copies,
    // UNION the sentinel mega-cluster's star set (min id 3000000 is the
    // representative; member↔member pairs are NOT emitted — the guard's
    // documented star contract for buckets the re-key cannot split)
    "q106_minhash_guard" ->
      """WITH alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM alldocs)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |           / len(list_distinct(list_concat(a.s, b.s))) AS j
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.7
        |UNION ALL
        |SELECT 3000000 AS id_a, 3000000 + i AS id_b, 1.0 AS jaccard
        |FROM (SELECT unnest(range(1, 300)) AS i)""".stripMargin,

    "q30_simhash_neardup" ->
      s"""WITH alldocs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text FROM
         |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
         |words AS (
         |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
         |  FROM alldocs),
         |nibs AS (SELECT doc_id, $simhashNibSql
         |         FROM (SELECT doc_id, md5(t) AS h FROM words)),
         |votes AS (SELECT doc_id, $simhashVoteSql FROM nibs GROUP BY doc_id),
         |sigs AS (SELECT doc_id, ${simhashHalfSql(32)} AS hi,
         |                        ${simhashHalfSql(0)} AS lo FROM votes)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT)
         |         AS hamming
         |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3""".stripMargin,

    "q33_lsh_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sigs AS (SELECT vec_id, v, ${hyperplaneSigSql(6)} AS sig FROM e),
         |q AS (SELECT vec_id AS query_id, v AS qv, sig FROM sigs WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.query_id, s.vec_id AS neighbor_id,
         |         round(list_cosine_similarity(q.qv, s.v), 4) AS cosine
         |  FROM sigs s JOIN q ON s.sig = q.sig AND s.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 10""".stripMargin,

    // replicates the skew guard exactly: level-1 occupancy per (band,
    // bucket); ≤256 join on sub=0; oversized buckets re-key on the ADAPTIVE
    // number of extra signature bits (smallest width with n ≤ 256·2^bits);
    // refined buckets still >256 degrade to star pairs
    "q59_embedding_neardup" ->
      s"""$embPairCte
         |SELECT id_a, id_b, round(cosine, 6) AS cosine
         |FROM j WHERE cosine >= 0.95""".stripMargin,

    // connected components over the q59-verified pair graph (clusterPairs
    // over embedding pairs): transitive closure via a recursive CTE, every
    // corpus id self-seeds so singletons self-cluster
    "q95_embedding_clusters" ->
      s"""$embPairCte,
         |vp AS (SELECT id_a, id_b FROM j WHERE cosine >= 0.95),
         |bidir AS (SELECT id_a AS a, id_b AS b FROM vp
         |          UNION ALL SELECT id_b, id_a FROM vp),
         |reach(a, b) AS (
         |  SELECT vec_id, vec_id FROM allv
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN bidir e ON r.b = e.a)
         |SELECT a AS vec_id, CAST(min(b) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY a""".stripMargin,

    // replicates BOTH signature modes end-to-end: raw and whitened (μ/σ →
    // z) 16-plane signatures, per-(band,bucket) occupancy → candidate
    // volume, planted-pair candidate join + cosine verify, symmetric
    // difference of the two planted-pair sets
    "q89_whiten_neardup" ->
      s"""WITH e AS (SELECT vec_id,
         |             list_transform(CAST(embedding AS DOUBLE[]), x -> x + 3.0) AS v
         |           FROM embeddings WHERE vec_id < 500),
         |allv AS (SELECT * FROM e UNION ALL
         |         SELECT vec_id + 1000000 AS vec_id, v FROM
         |           (SELECT * FROM e ORDER BY vec_id LIMIT 20)),
         |rsig AS (SELECT vec_id, v, ${hyperplaneSigSql(16)} AS sig FROM allv),
         |dm AS (SELECT vec_id, unnest(v) AS x,
         |              generate_subscripts(v, 1) AS dim FROM allv),
         |st AS (SELECT dim, avg(x) AS mu,
         |              CASE WHEN stddev_pop(x) IS NULL OR stddev_pop(x) = 0
         |                   THEN 1 ELSE stddev_pop(x) END AS sigma
         |       FROM dm GROUP BY 1),
         |zt AS (SELECT vec_id, list((x - mu) / sigma ORDER BY dim) AS v
         |       FROM dm JOIN st USING (dim) GROUP BY vec_id),
         |wsig AS (SELECT vec_id, ${hyperplaneSigSql(16)} AS sig FROM zt),
         |braw AS (SELECT vec_id, b, (sig >> (b * 4)) & 15 AS bucket
         |         FROM rsig CROSS JOIN (SELECT unnest(range(0, 4)) AS b)),
         |bwh AS (SELECT vec_id, b, (sig >> (b * 4)) & 15 AS bucket
         |        FROM wsig CROSS JOIN (SELECT unnest(range(0, 4)) AS b)),
         |craw AS (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) AS c FROM
         |         (SELECT count(*) AS n FROM braw GROUP BY b, bucket)),
         |cwh AS (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) AS c FROM
         |        (SELECT count(*) AS n FROM bwh GROUP BY b, bucket)),
         |praw AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
         |         FROM braw a JOIN braw b2 ON a.b = b2.b AND a.bucket = b2.bucket
         |           AND b2.vec_id = a.vec_id + 1000000),
         |vraw AS (SELECT p.id_a, p.id_b FROM praw p
         |         JOIN allv x ON p.id_a = x.vec_id
         |         JOIN allv y ON p.id_b = y.vec_id
         |         WHERE list_cosine_similarity(x.v, y.v) >= 0.95),
         |pwh AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
         |        FROM bwh a JOIN bwh b2 ON a.b = b2.b AND a.bucket = b2.bucket
         |          AND b2.vec_id = a.vec_id + 1000000),
         |vwh AS (SELECT p.id_a, p.id_b FROM pwh p
         |        JOIN allv x ON p.id_a = x.vec_id
         |        JOIN allv y ON p.id_b = y.vec_id
         |        WHERE list_cosine_similarity(x.v, y.v) >= 0.95),
         |dif AS (SELECT count(*) AS n FROM
         |        (SELECT * FROM (SELECT * FROM vraw EXCEPT SELECT * FROM vwh)
         |         UNION ALL
         |         SELECT * FROM (SELECT * FROM vwh EXCEPT SELECT * FROM vraw)))
         |SELECT (SELECT count(*) FROM vraw) AS n_pairs_plain,
         |       (SELECT count(*) FROM vwh) AS n_pairs_whiten,
         |       (SELECT n FROM dif) AS n_pair_diff,
         |       (SELECT c FROM craw) AS cand_plain,
         |       (SELECT c FROM cwh) AS cand_whiten""".stripMargin,

    // exact brute-force top-10 (the nprobe=K IVF result must equal this)
    "q60_ivf_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |         round(list_cosine_similarity(q.qv, e.v), 4) AS cosine
        |  FROM e JOIN q ON e.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 10""".stripMargin,

    // exact brute-force top-10 over the planted-cluster corpus — nprobe=1
    // must equal it (one-hot clusters make single-centroid probing lossless)
    "q90_ivf_nprobe1" ->
      """WITH c AS (SELECT vec_id, list_transform(range(0, 16), d ->
        |             (CASE WHEN d = (vec_id % 8) * 2 THEN 1000.0 ELSE 0.0 END)
        |             + CAST((vec_id * 7 + d * 13) % 17 - 8 AS DOUBLE)) AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |         round(list_cosine_similarity(q.qv, c.v), 4) AS cosine
        |  FROM c JOIN q ON c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 10""".stripMargin,

    // stride-j feature: (Σ_{i ≡ j mod 8} byte_i/255) / n_bytes · 8, summed
    // ascending in DOUBLE then quantized through float32 — the exact
    // arithmetic of the Scala stub kernel (ascii == byte: ASCII corpus)
    "q61_multimodal_features" -> {
      // nullif(n, 0) + outer coalesce: an empty text must yield 0.0
      // features exactly like the Scala kernel's empty-payload branch,
      // not a division-by-zero
      val fCols = (0 until 8).map { j =>
        s"round(CAST(CAST(coalesce(coalesce(list_sum(list_transform(range(${j + 1}, n + 1, 8), " +
          s"i -> ascii(substring(text, i, 1)) / 255.0)), 0) / nullif(n, 0) * 8, 0) AS REAL) AS DOUBLE), 4) AS f$j"
      }.mkString(",\n       ")
      s"""WITH f AS (SELECT doc_id AS media_id, text,
         |                  octet_length(encode(text)) AS n FROM documents)
         |SELECT media_id, CAST(n AS BIGINT) AS n_bytes,
         |       $fCols
         |FROM f""".stripMargin
    },

    // recursive closure over the exact all-pairs near-dup graph:
    // cluster_id = min doc id transitively reachable
    "q62_neardup_clusters" ->
      """WITH RECURSIVE alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM alldocs)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |          / len(list_distinct(list_concat(a.s, b.s))) >= 0.7),
        |bidir AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT doc_id, doc_id FROM alldocs
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN bidir e ON r.b = e.a)
        |SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY a""".stripMargin,

    // q62's recursive closure + per-cluster arg-max on (pref desc, id asc)
    "q104_keep_best_cluster" ->
      """WITH RECURSIVE alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM alldocs)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |          / len(list_distinct(list_concat(a.s, b.s))) >= 0.7),
        |bidir AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT doc_id, doc_id FROM alldocs
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN bidir e ON r.b = e.a),
        |cl AS (SELECT a AS doc_id, min(b) AS cluster_id
        |       FROM reach GROUP BY a),
        |ranked AS (
        |  SELECT doc_id, doc_id % 97 AS pref,
        |         row_number() OVER (PARTITION BY cluster_id
        |                            ORDER BY doc_id % 97 DESC, doc_id) AS rk
        |  FROM cl)
        |SELECT doc_id, CAST(pref AS BIGINT) AS pref
        |FROM ranked WHERE rk = 1""".stripMargin,

    "q63_quality_rules" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok,
         |    CASE WHEN len(string_split_regex(trim(text), '\\s+')) = 0 THEN 0.0
         |         ELSE CAST(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
         |                                           x -> length(x))) AS DOUBLE)
         |              / len(string_split_regex(trim(text), '\\s+')) END AS mwl,
         |    CASE WHEN len(string_split_regex(lower(trim(text)), '\\s+')) = 0 THEN 0.0
         |         ELSE CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                                   x -> list_contains([$sw], x))) AS DOUBLE)
         |              / len(string_split_regex(lower(trim(text)), '\\s+')) END AS swr,
         |    CASE WHEN len(string_split_regex(lower(trim(text)), '\\s+')) = 0 THEN 0.0
         |         ELSE 1.0 - CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS DOUBLE)
         |              / len(string_split_regex(lower(trim(text)), '\\s+')) END AS rep
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, list_filter([
         |    CASE WHEN n_tok < 25 THEN 'too_short' END,
         |    CASE WHEN n_tok > 100000 THEN 'too_long' END,
         |    CASE WHEN mwl < 2.0 THEN 'words_too_short' END,
         |    CASE WHEN mwl > 12.0 THEN 'words_too_long' END,
         |    CASE WHEN swr < 0.02 THEN 'low_stopword' END,
         |    CASE WHEN rep > 0.65 THEN 'repetitive' END], x -> x IS NOT NULL) AS reasons
         |  FROM t)
         |SELECT doc_id, len(reasons) = 0 AS keep,
         |       coalesce(array_to_string(reasons, ','), '') AS reasons
         |FROM r""".stripMargin,

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

    "q70_tfidf_topterms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |       WHERE len(term) > 0 GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |         round(tf.tf * (ln((n_docs + 1.0) / (df + 1)) + 1.0), 6) AS s6
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tf, s6,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY s6 DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
        |       round(s6, 4) AS score, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 3""".stripMargin,

    "q71_pack_stats" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
        |           AS n_tokens
        |  FROM documents),
        |st AS (SELECT source, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
        |           AS stream_end
        |       FROM toks)
        |SELECT source, CAST((stream_end - n_tokens) // 256 AS BIGINT) AS pack_id,
        |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |       CAST(sum(n_tokens) AS DOUBLE) / 256 AS fill
        |FROM st GROUP BY 1, 2""".stripMargin,

    "q72_decontam_pairs" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                             i -> array_to_string(t[i:i+2], ' '))
        |    END)) AS s
        |  FROM (SELECT doc_id,
        |          string_split_regex(lower(trim(text)), '\s+') AS t
        |        FROM documents)),
        |test AS (SELECT * FROM sh WHERE doc_id % 50 = 0),
        |train AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
        |tsize AS (SELECT doc_id AS test_id, count(*) AS n_test FROM test GROUP BY 1),
        |pairs AS (SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
        |                 count(*) AS n_shared
        |          FROM train tr JOIN test te ON tr.s = te.s GROUP BY 1, 2)
        |SELECT train_id, test_id, CAST(n_shared AS BIGINT) AS n_shared,
        |       CAST(n_shared AS DOUBLE) / n_test AS test_share
        |FROM pairs JOIN tsize USING (test_id)""".stripMargin,

    "q83_standardize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |d AS (SELECT vec_id, unnest(v) AS x,
        |             generate_subscripts(v, 1) - 1 AS dim FROM e),
        |st AS (SELECT dim, avg(x) AS mu, stddev_pop(x) AS sigma
        |       FROM d GROUP BY 1)
        |SELECT d.vec_id, CAST(d.dim AS INT) AS dim,
        |       round((d.x - st.mu) /
        |             CASE WHEN st.sigma IS NULL OR st.sigma = 0 THEN 1
        |                  ELSE st.sigma END, 4) + 0.0 AS z
        |FROM d JOIN st USING (dim)""".stripMargin,

    "q82_frame_sampling" ->
      """WITH fl AS (
        |  SELECT doc_id AS media_id, text,
        |         greatest(length(text) // 4, 1) AS flen
        |  FROM documents),
        |frames AS (
        |  SELECT media_id, unnest(range(0, 4)) AS frame_idx, text, flen
        |  FROM fl)
        |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        |       CAST(length(substring(text, CAST(frame_idx * flen + 1 AS INT), flen))
        |            AS BIGINT) AS frame_len,
        |       md5(substring(text, CAST(frame_idx * flen + 1 AS INT), flen))
        |         AS frame_hash,
        |       320 AS r_width, 'mp4+resized' AS r_format
        |FROM frames""".stripMargin,

    "q80_pii_scrub" ->
      """WITH t AS (
        |  SELECT doc_id, text || ' contact u' || doc_id || '@ex.com from 10.0.' ||
        |         (doc_id % 256) || '.7 call +1 (555) 010-1234' AS text
        |  FROM documents),
        |s1 AS (SELECT doc_id, text,
        |         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |                        '[EMAIL]', 'g') AS t1 FROM t),
        |s2 AS (SELECT doc_id, text, t1,
        |         regexp_replace(t1, '\b(\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g') AS t2
        |       FROM s1)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t1, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(t2, '\+?\d[\d\s().-]{7,}\d')) AS BIGINT) AS n_phones,
        |  CAST(length(regexp_replace(t2, '\+?\d[\d\s().-]{7,}\d', '[PHONE]', 'g'))
        |       AS BIGINT) AS red_len
        |FROM s2""".stripMargin,

    "q81_top_ngrams" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, unnest(
        |        CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |             ELSE list_transform(range(1, len(w)),
        |                                 i -> array_to_string(w[i:i+1], ' '))
        |        END) AS ngram
        |      FROM t)
        |SELECT ngram, count(*) AS n_occurrences,
        |       count(DISTINCT doc_id) AS n_docs
        |FROM g WHERE length(ngram) > 0
        |GROUP BY 1 ORDER BY n_occurrences DESC, ngram LIMIT 20""".stripMargin,

    // the heavy-hitter path must reproduce the exact top-k verbatim
    "q103_top_ngrams_approx" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, unnest(
        |        CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |             ELSE list_transform(range(1, len(w)),
        |                                 i -> array_to_string(w[i:i+1], ' '))
        |        END) AS ngram
        |      FROM t)
        |SELECT ngram, count(*) AS n_occurrences,
        |       count(DISTINCT doc_id) AS n_docs
        |FROM g WHERE length(ngram) > 0
        |GROUP BY 1 ORDER BY n_occurrences DESC, ngram LIMIT 20""".stripMargin,

    "q73_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                             i -> array_to_string(t[i:i+2], ' '))
        |    END)) AS s
        |  FROM (SELECT doc_id,
        |          string_split_regex(lower(trim(text)), '\s+') AS t
        |        FROM documents)),
        |test AS (SELECT * FROM sh WHERE doc_id % 50 = 0),
        |train AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
        |tsize AS (SELECT doc_id AS test_id, count(*) AS n_test FROM test GROUP BY 1),
        |bad AS (
        |  SELECT DISTINCT tr.doc_id
        |  FROM train tr JOIN test te ON tr.s = te.s
        |  JOIN tsize ON tsize.test_id = te.doc_id
        |  GROUP BY tr.doc_id, te.doc_id, n_test
        |  HAVING CAST(count(*) AS DOUBLE) / n_test >= 0.2)
        |SELECT count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM documents
        |WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin,

    "q37_events_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |       count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q38_events_user" ->
      """SELECT user_id, count(*) AS n_events,
        |       count(DISTINCT event_type) AS n_types,
        |       round(sum(value), 2) AS total_value,
        |       strftime(max(ts), '%Y-%m-%d') AS last_day
        |FROM events GROUP BY user_id""".stripMargin,

    // the planted-fixture arithmetic: k=(id/100)%5 selects the payload
    // branch, PNG rows reproduce exact solid-color means, JPEG rows
    // dims/channels only, corrupt/null rows ok=false with zeroed dims
    "q186_image_resize" ->
      s"""${Tables.viewCte},
         |sub AS (SELECT id FROM images WHERE split = 'P' AND id % 100 = 0)
         |SELECT id AS media_id,
         |  CAST(CASE WHEN id % 500 = 300 THEN 0 ELSE 16 END AS INT) AS width,
         |  CAST(CASE WHEN id % 500 = 300 THEN 0 ELSE 16 END AS INT) AS height,
         |  id % 500 <> 300 AS resize_ok,
         |  CAST(CASE WHEN id % 500 = 300 THEN 0
         |            ELSE (id * 11) % 256 END AS DOUBLE) AS mean_r,
         |  CAST(CASE WHEN id % 500 = 300 THEN 0
         |            ELSE (id * 29) % 256 END AS DOUBLE) AS mean_g,
         |  CAST(CASE WHEN id % 500 = 300 THEN 0
         |            ELSE (id * 53) % 256 END AS DOUBLE) AS mean_b
         |FROM sub""".stripMargin,

    "q97_image_decode" ->
      s"""${Tables.viewCte},
         |sub AS (SELECT id, (id // 100) % 5 AS k,
         |               CAST(4 + id % 13 AS INT) AS w,
         |               CAST(4 + (id // 13) % 11 AS INT) AS h
         |        FROM images WHERE split = 'P' AND id % 100 = 0)
         |SELECT id AS media_id,
         |  CASE WHEN k <= 1 THEN 'png' WHEN k = 2 THEN 'jpeg'
         |       ELSE 'unknown' END AS format,
         |  k <= 2 AS decode_ok,
         |  CAST(CASE WHEN k <= 2 THEN w ELSE 0 END AS INT) AS width,
         |  CAST(CASE WHEN k <= 2 THEN h ELSE 0 END AS INT) AS height,
         |  CAST(CASE WHEN k = 1 THEN 1 WHEN k <= 2 THEN 3 ELSE 0 END AS INT)
         |    AS channels,
         |  CASE WHEN k <= 1 THEN CAST(id % 256 AS DOUBLE) END AS m0,
         |  CASE WHEN k = 0 THEN CAST((id // 3) % 256 AS DOUBLE) END AS m1,
         |  CASE WHEN k = 0 THEN CAST((id // 7) % 256 AS DOUBLE) END AS m2
         |FROM sub""".stripMargin,

    // planted WAV parameters are pure arithmetic over the id, duration is
    // integer frames*1000 div rate — bit-exact in both engines
    "q100_audio_decode" ->
      s"""${Tables.viewCte},
         |sub AS (SELECT id, (id // 100) % 4 AS k,
         |               CAST(8000 + (id % 4) * 4000 AS INT) AS sr,
         |               CAST(1 + id % 2 AS INT) AS ch,
         |               CAST(100 + id % 50 AS BIGINT) AS fr
         |        FROM images WHERE split = 'P' AND id % 100 = 0)
         |SELECT id AS media_id,
         |  CASE WHEN k <= 1 THEN 'wav' ELSE 'unknown' END AS format,
         |  k <= 1 AS decode_ok,
         |  CAST(CASE WHEN k <= 1 THEN sr ELSE 0 END AS INT) AS sample_rate,
         |  CAST(CASE WHEN k <= 1 THEN ch ELSE 0 END AS INT) AS channels,
         |  CAST(CASE WHEN k <= 1 THEN 16 ELSE 0 END AS INT) AS bits,
         |  CAST(CASE WHEN k <= 1 THEN fr ELSE 0 END AS BIGINT) AS n_frames,
         |  CAST(CASE WHEN k <= 1 THEN fr * 1000 // sr ELSE 0 END AS BIGINT)
         |    AS duration_ms
         |FROM sub""".stripMargin,

    // planted animated-GIF arithmetic: b=(id/100)%4 selects gif/corrupt/
    // null, valid payloads carry 3+id%4 frames and the kernel samples 3 at
    // evenly spaced indices k*total//3; frame i is solid palette index
    // (id*7 + i*13)%256 over an identity grayscale palette, so the decoded
    // 1-band mean is exactly that index. Corrupt/null rows: one fail-closed
    // row with zeroed dims
    "q105_video_frames" ->
      s"""${Tables.viewCte},
         |sub AS (SELECT id, (id // 100) % 4 AS b,
         |               CAST(3 + id % 4 AS INT) AS total,
         |               CAST(4 + id % 9 AS INT) AS w,
         |               CAST(5 + (id // 9) % 7 AS INT) AS h
         |        FROM images WHERE split = 'P' AND id % 100 = 0),
         |fr AS (SELECT *,
         |         unnest(CASE WHEN b <= 1 THEN [0, 1, 2] ELSE [0] END) AS k
         |       FROM sub)
         |SELECT id AS media_id,
         |  CASE WHEN b <= 1 THEN 'gif' ELSE 'unknown' END AS format,
         |  CAST(CASE WHEN b <= 1 THEN k * total // 3 ELSE 0 END AS INT)
         |    AS frame_idx,
         |  CAST(CASE WHEN b <= 1 THEN total ELSE 0 END AS INT) AS n_frames,
         |  b <= 1 AS decode_ok,
         |  CAST(CASE WHEN b <= 1 THEN w ELSE 0 END AS INT) AS width,
         |  CAST(CASE WHEN b <= 1 THEN h ELSE 0 END AS INT) AS height,
         |  CAST(CASE WHEN b <= 1 THEN 1 ELSE 0 END AS INT) AS channels,
         |  CASE WHEN b <= 1
         |       THEN CAST((id * 7 + (k * total // 3) * 13) % 256 AS DOUBLE)
         |  END AS m0
         |FROM fr""".stripMargin
  )
}
