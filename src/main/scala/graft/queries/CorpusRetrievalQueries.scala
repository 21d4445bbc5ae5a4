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
    }),

    // duplicated-span coverage (Lee et al. exact-substring signal at
    // 10-gram granularity): a 10-token boilerplate sentence is appended to
    // every 10th doc (partial coverage) and 20 docs are fully copied
    // (total coverage); everything else has coverage 0 — all three regimes
    // in one gate, all md5/integer arithmetic → full oracle.
    "q118_dup_spans" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val fab = docs.withColumn("text",
        when(col("doc_id") % 10 === 0,
          concat(col("text"),
            lit(" legal notice all rights reserved by the site owner today")))
          .otherwise(col("text")))
      val planted = fab.orderBy("doc_id").limit(20)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val corpus = fab.unionByName(planted)
      graft.llm.Dedup.dupSpanStats(corpus, n = 10)
        .select(col("doc_id"), col("n_tokens"), col("covered_tokens"),
          round(col("coverage"), 6).as("coverage"))
    }),

    // winnowing (MOSS) fingerprints at k=4, w=5: per-window rightmost
    // lexicographic-min md5 selection — values, ties, and positions all
    // replayed by the oracle over the same string hashes
    "q163_winnowing" -> ((s, d) => {
      graft.llm.Dedup.winnowingFingerprints(
          Tables.documents(s, d), k = 4, w = 5)
        .select(col("doc_id"), col("pos"), col("fp"))
    }),

    // MOSS match step: 20 planted 15-token excerpts (>= w+k-1 = 8 shared
    // tokens -> guaranteed >= 1 shared fingerprint) probed against the
    // corpus, boilerplate fingerprints df-capped at 256
    "q166_winnowing_overlap" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val probe = docs.orderBy("doc_id").limit(20)
        .withColumn("doc_id", col("doc_id") + 4000000L)
        .withColumn("text",
          array_join(slice(split(trim(col("text")), "\\s+"), 1, 15), " "))
      graft.llm.Dedup.winnowingOverlap(probe, docs, k = 4, w = 5)
        .select(col("id_a"), col("id_b"), col("n_shared"))
    }),

    // span CUT (Lee et al.'s actual remedy) over q118's fabricated corpus:
    // the boilerplate sentence is excised from the every-10th docs (their
    // prose survives), the 20 full copy pairs empty out and drop, and
    // every untouched doc must come back byte-identical.
    "q157_cut_dup_spans" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val fab = docs.withColumn("text",
        when(col("doc_id") % 10 === 0,
          concat(col("text"),
            lit(" legal notice all rights reserved by the site owner today")))
          .otherwise(col("text")))
      val planted = fab.orderBy("doc_id").limit(20)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val corpus = fab.unionByName(planted)
      graft.llm.Dedup.cutDuplicatedSpans(corpus, n = 10)
        .select(col("doc_id"), col("text"))
    }),

    // bloom-prefiltered EXACT cross-corpus dedup: the batch (every 3rd doc
    // + 20 planted copies of ref docs) minus everything whose normalized
    // fingerprint exists in the ref corpus. The bloom only prunes — the
    // verify join restores exactness — so the oracle is a plain anti-join
    // on the same md5 fingerprint.
    "q119_bloom_cross_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val ref = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id"), col("text"))
      val batch = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("text"))
        .unionByName(ref.orderBy("doc_id").limit(20)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      val bloom = graft.llm.Dedup.buildFingerprintBloom(ref,
        expectedItems = 1000, fpp = 0.01)
      graft.llm.Dedup.bloomCrossDedup(batch, ref, bloom)
        .select(col("doc_id"))
    }),

    // product-quantization ADC top-10: codebooks = per-subspace slices of
    // the 4 lowest-id embeddings (identically selectable in SQL — the q112
    // centroid recipe), m=4 × dsub=16 over the 64-dim corpus. Encode
    // argmin margins are tripwired in PqSpec; ranking follows the
    // 6-decimal-round + vec-id-tiebreak convention.
    // SQ8 scalar quantization: per-dim (min, max) trained on the corpus,
    // floor-quantized int8 codes, asymmetric midpoint-dequant L2 top-k.
    // Floor (not round) makes the codes bit-replicable in DuckDB; the
    // distance ranks on the round-6 + id-tiebreak convention.
    "q137_sq8_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d).select("vec_id", "embedding")
      val stats = graft.llm.Pq.sqStats(embs)
      val enc = graft.llm.Pq.sqEncode(embs, stats)
      val queries = embs.filter(col("vec_id") % 100 === 7)
        .select(col("vec_id").as("query_id"), col("embedding"))
      graft.llm.Pq.sqTopK(enc, queries, stats, k = 10)
        .select(col("query_id"), col("vec_id"), col("sq_dist"),
          col("rank").cast("long").as("rank"))
    }),

    // two-stage retrieval: ADC top-50 shortlist over the compressed codes,
    // EXACT cosine re-rank of the shortlist to top-10 (the production ANN
    // serving shape). Shortlist membership ranks on round-6 adist +
    // vec_id; the re-rank on round-4 cosine + vec_id (the q32 convention)
    // — both total orders the oracle replays.
    "q172_adc_rerank" -> ((s, d) => {
      val embs = Tables.embeddings(s, d).select("vec_id", "embedding")
      val codebooks = pqCodebooks(s, d)
      val enc = graft.llm.Pq.encode(embs, codebooks)
      val queries = embs.filter(col("vec_id") % 100 === 7)
        .select(col("vec_id").as("query_id"), col("embedding"))
      graft.llm.Pq.adcRerankTopK(enc, queries, embs, codebooks,
        shortlist = 50, k = 10)
        .select(col("query_id"), col("vec_id"), col("cosine"),
          col("rank").cast("long").as("rank"))
    }),

    // semantic decontamination: holdout = vec_ids < 20 (the "eval set"),
    // train = the rest; per train vector the max round-6 cosine against
    // any holdout vector + the contamination flag. Max over ROUNDED
    // values, so cross-engine ulp drift can't flip the max.
    "q175_semantic_decontam" -> ((s, d) => {
      val embs = Tables.embeddings(s, d).select("vec_id", "embedding")
      val holdout = embs.filter(col("vec_id") < 20)
      val train = embs.filter(col("vec_id") >= 20)
      graft.llm.Similarity.semanticContamination(train, holdout,
        threshold = 0.35)
    }),

    // TF-IDF sparse-cosine retrieval (the VSM face next to q117's BM25):
    // same first-6-words queries, term FREQUENCY kept (unlike BM25's
    // distinct terms), norms on both sides, round-6 + doc-id rank.
    "q191_tfidf_cosine_topk" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val queries = docs.filter(col("doc_id") % 100 === 7)
        .select(col("doc_id").as("query_id"),
          array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 6), " ")
            .as("query"))
      Corpus.tfIdfCosineTopK(docs, queries, k = 10)
        .select(col("query_id"), col("doc_id"), col("score"),
          col("rank").cast("long").as("rank"))
    }),

    // hybrid retrieval: BM25 top-20 (lexical) ⊕ exact-cosine top-20
    // (dense, embeddings keyed by the same ids) fused with RRF(60),
    // top-10 per query. Both source rankings use their gates' own
    // engine-stable rank conventions (round-6 BM25 + doc id; round-4
    // cosine + id), so the fused ranks are cross-engine exact.
    "q178_hybrid_rrf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val queries = docs.filter(col("doc_id") % 100 === 7)
        .select(col("doc_id").as("query_id"),
          array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 6), " ")
            .as("query"))
      val bm = Corpus.bm25TopK(docs, queries, k = 20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val embs = Tables.embeddings(s, d).select("vec_id", "embedding")
      val qv = embs.filter(col("vec_id") % 100 === 7)
      // round-4 BEFORE the rank (the RRF cosine convention) — the roundTo
      // knob makes the two-phase prune work at k=20 instead of ranking
      // the full cross product only to re-round and re-rank it
      val vec = graft.llm.Similarity
        .bruteForceTopK(embs, qv, k = 20, roundTo = 4)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      graft.llm.Similarity.rrfFuse(Seq(bm, vec), k = 10)
        .select(col("query_id"), col("doc_id"), col("rrf_score"),
          col("rank").cast("long").as("rank"))
    }),

    "q121_pq_adc_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d).select("vec_id", "embedding")
      val codebooks = pqCodebooks(s, d)
      val enc = graft.llm.Pq.encode(embs, codebooks)
      val queries = embs.filter(col("vec_id") % 100 === 7)
        .select(col("vec_id").as("query_id"), col("embedding"))
      graft.llm.Pq.adcTopK(enc, queries, codebooks, k = 10)
        .select(col("query_id"), col("vec_id"), col("adist"),
          col("rank").cast("long").as("rank"))
    }),

    // IVFADC with nprobe = ALL cells ≡ the plain ADC scan (the q60
    // nprobe=K trick): the composed cell-assign → probe → lookup-sum
    // pipeline must reproduce q121's oracle EXACTLY — any bug in the cell
    // join, the probe ranking, or the table plumbing breaks the hash. The
    // recall-vs-nprobe face is spec-locked in PqSpec.
    "q124_ivfadc_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d).select("vec_id", "embedding")
      val codebooks = pqCodebooks(s, d)
      val cells = pqCells(s, d)
      val enc = graft.llm.Pq.assignCells(
        graft.llm.Pq.encode(embs, codebooks), cells)
      val queries = embs.filter(col("vec_id") % 100 === 7)
        .select(col("vec_id").as("query_id"), col("embedding"))
      graft.llm.Pq.ivfAdcTopK(enc, queries, codebooks, cells,
        nprobe = cells.size, k = 10)
        .select(col("query_id"), col("vec_id"), col("adist"),
          col("rank").cast("long").as("rank"))
    }),

    // the stored-index face: encode + assign → parquet PARTITIONED BY
    // cell_id → partition-pruned probe read. nprobe = all cells ≡ the
    // plain ADC scan, so the write→read→probe pipeline must reproduce
    // q121's oracle EXACTLY; the pruning itself (only probed directories
    // scanned) is plan-locked in PqSpec.
    "q138_ivfadc_store" -> ((s, d) => {
      val embs = Tables.embeddings(s, d).select("vec_id", "embedding")
      val codebooks = pqCodebooks(s, d)
      val cells = pqCells(s, d)
      val enc = graft.llm.Pq.assignCells(
        graft.llm.Pq.encode(embs, codebooks), cells)
      val dir = java.nio.file.Files.createTempDirectory("graft_ivf_store")
        .toString
      graft.llm.Pq.writeCellPartitioned(enc, dir, codebooks, cells)
      val queries = embs.filter(col("vec_id") % 100 === 7)
        .select(col("vec_id").as("query_id"), col("embedding"))
      graft.llm.Pq.ivfAdcTopKFromStore(s, dir, queries, codebooks, cells,
        nprobe = cells.size, k = 10)
        .select(col("query_id"), col("vec_id"), col("adist"),
          col("rank").cast("long").as("rank"))
    }),

    // IVF-pruned SQ8 (the scale path for q137's brute-force scan) with
    // nprobe = ALL cells ≡ the plain SQ8 scan (the q124 nprobe=K trick):
    // the cell-assign → probe-rank → in-cell dequant-distance pipeline
    // must reproduce q137's oracle EXACTLY — any bug in the cell join,
    // the probe ranking, or the stats plumbing breaks the hash. The
    // pruning itself (scored pairs bounded by nprobe/ncells) is
    // spec-locked in PqSpec and measured by the sq8_ivf_topk scale probe.
    "q194_ivfsq_topk" -> ((s, d) => {
      val embs = Tables.embeddings(s, d).select("vec_id", "embedding")
      val stats = graft.llm.Pq.sqStats(embs)
      val cells = pqCells(s, d)
      val enc = graft.llm.Pq.assignCells(
        graft.llm.Pq.sqEncode(embs, stats), cells)
      val queries = embs.filter(col("vec_id") % 100 === 7)
        .select(col("vec_id").as("query_id"), col("embedding"))
      graft.llm.Pq.ivfSqTopK(enc, queries, stats, cells,
        nprobe = cells.size, k = 10)
        .select(col("query_id"), col("vec_id"), col("sq_dist"),
          col("rank").cast("long").as("rank"))
    }),

    // the SQ8 stored-index face (q138's pattern for the SQ family):
    // encode + assign → parquet PARTITIONED BY cell_id → partition-pruned
    // probe read. nprobe = all cells ≡ the plain SQ8 scan, so the
    // write→read→probe pipeline must reproduce q137's oracle EXACTLY;
    // the pruning itself (only probed directories scanned) is plan-locked
    // in PqSpec.
    "q196_ivfsq_store" -> ((s, d) => {
      val embs = Tables.embeddings(s, d).select("vec_id", "embedding")
      // materialized literal stats: the sidecar digests cost one head()
      // each on write and probe — with the lazy frame that would re-run
      // the O(n·dim) stats scan twice ON TOP of the two the write and
      // probe plans already embed; the literal pins it to one scan total
      val stats = graft.llm.Pq.sqStatsMaterialized(s, graft.llm.Pq.sqStats(embs))
      val cells = pqCells(s, d)
      val enc = graft.llm.Pq.assignCells(
        graft.llm.Pq.sqEncode(embs, stats), cells)
      val dir = java.nio.file.Files.createTempDirectory("graft_sqivf_store")
        .toString
      graft.llm.Pq.writeSqCellPartitioned(enc, dir, stats, cells)
      val queries = embs.filter(col("vec_id") % 100 === 7)
        .select(col("vec_id").as("query_id"), col("embedding"))
      graft.llm.Pq.ivfSqTopKFromStore(s, dir, queries, stats, cells,
        nprobe = cells.size, k = 10)
        .select(col("query_id"), col("vec_id"), col("sq_dist"),
          col("rank").cast("long").as("rank"))
    }),

    // script-mix signals: Cyrillic/CJK/Arabic/Greek snippets appended per
    // residue class, every 97th doc REPLACED by a Cyrillic page (so
    // dominance flips somewhere); counts are regexp-range arithmetic over
    // BMP blocks — identical in Java regex and RE2 → full oracle
    "q127_script_mix" -> ((s, d) => {
      val fab = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 97 === 0,
          lit("много русских слов здесь очень много слов подряд"))
          .otherwise(concat(col("text"),
            when(col("doc_id") % 5 === 1, lit(" привет мир как дела"))
              .when(col("doc_id") % 5 === 2, lit(" 你好世界再见"))
              .when(col("doc_id") % 5 === 3, lit(" مرحبا بالعالم"))
              .when(col("doc_id") % 5 === 4, lit(" γειά σου κόσμε"))
              .otherwise(lit("")))).as("text"))
      val sh = graft.llm.TextAnalysis.scriptShares(col("text"))
      fab.select(col("doc_id"),
        sh.getField("n_latin").as("n_latin"),
        sh.getField("n_cyrillic").as("n_cyrillic"),
        sh.getField("n_cjk").as("n_cjk"),
        sh.getField("n_arabic").as("n_arabic"),
        sh.getField("n_greek").as("n_greek"),
        sh.getField("n_chars").as("n_chars"),
        sh.getField("cyrillic_share").as("cyrillic_share"),
        graft.llm.TextAnalysis.dominantScript(col("text")).as("dominant"))
    }),

    // perceptual-hash image dedup over REAL decoded PNGs: 60 driver-encoded
    // 9×8 grayscale fixtures with pixel(x,y) = ((key·31 + y·9 + x)·37 +
    // key) % 256, key = id % 20 — three ids per key share pixels, so their
    // dHashes collide at hamming 0. The 9×8 size makes the sampling grid
    // the identity and PNG is lossless, so the ORACLE computes the same 64
    // comparison bits straight from the pixel formula — the decode, the
    // hash kernel, and the banding pipeline all have to agree with pure
    // arithmetic for the pair set to match.
    "q133_image_phash_dedup" -> ((s, d) => {
      import s.implicits._
      def grayPng(key: Long): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(9, 8,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val r = img.getRaster
        for (y <- 0 until 8; x <- 0 until 9)
          r.setSample(x, y, 0, (((key * 31 + y * 9 + x) * 37 + key) % 256).toInt)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      val media = (0L until 60L).map(id => (id, grayPng(id % 20)))
        .toDF("media_id", "payload")
      graft.llm.Multimodal.imageNearDups(media, maxHamming = 0)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming"))
    }),

    // audio-envelope dedup over REAL PCM decode: 45 driver-encoded WAVs
    // (650 samples, 16-bit mono), sample(i) = ((key·7 + i·13) % 401) − 200
    // with key = id % 15 — three ids per key share samples → envelope
    // hashes collide at hamming 0. PCM is lossless and the window energies
    // are exact integer sums, so the oracle recomputes the 64 comparison
    // bits from the sample formula.
    "q134_audio_dedup" -> ((s, d) => {
      import s.implicits._
      def wav(key: Long): Array[Byte] = {
        val n = 650
        val pcm = new Array[Byte](n * 2)
        for (i <- 0 until n) {
          val v = (((key * 7 + i * 13) % 401) - 200).toInt
          pcm(2 * i) = (v & 0xFF).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
      val media = (0L until 45L).map(id => (id, wav(id % 15)))
        .toDF("media_id", "payload")
      graft.llm.Multimodal.audioNearDups(media, maxHamming = 0)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming"))
    }),

    // hard-negative mining: 5 anchors, top-10 most-similar DIFFERENT-label
    // vectors each; q32's rank-on-rounded-cosine convention. The roundTo
    // knob ranks rounded scores INSIDE the two-phase top-k, so the gate
    // asks for its 10 directly instead of ranking the full anchors ×
    // corpus product only to re-round and re-rank it (round-11 cleanup,
    // same as q178's)
    "q131_hard_negatives" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val anchors = embs.filter(col("vec_id") < 5)
      graft.llm.Similarity
        .hardNegatives(embs, anchors, k = 10, roundTo = 4)
        .select(col("anchor_id"), col("neighbor_id"),
          col("neighbor_label").cast("long").as("neighbor_label"),
          col("cosine"), col("rank").cast("long").as("rank"))
    }),

    // Zipf rank-frequency OLS over the top-200 vocabulary: ranks from the
    // (count desc, word) order, regression sums as LEFT-TO-RIGHT folds in
    // rank order (the oracle replays them as ordered aggregates), one
    // fixed parenthesization of the closed form in both engines.
    "q151_zipf_fit" -> ((s, d) =>
      Corpus.zipfFit(Tables.documents(s, d), topN = 200)),

    // inter-source exact-dup overlap matrix: distinct (fingerprint,
    // source) pairs self-joined on the fingerprint; the diagonal is each
    // source's distinct-fingerprint count.
    "q152_source_overlap" -> ((s, d) =>
      Corpus.sourceOverlapMatrix(Tables.documents(s, d))),

    // n-gram novelty: every 3rd document scored against the rest of the
    // corpus as reference. Dup-heavy docs score ≈0, unique docs ≈1 — the
    // corpus' natural similarity spread exercises both ends. Trigram
    // construction is the q108 shingle convention (docs < 3 tokens
    // contribute their whole text); rates are int/int.
    "q150_ngram_novelty" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val scored = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      val ref = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      Corpus.ngramNovelty(scored, ref, n = 3)
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          round(col("novelty_rate"), 6).as("novelty_rate"))
    }),

    // PMI collocations: top-40 adjacent pairs by pointwise mutual
    // information, pair count ≥ 5. Rank order is the integer-exact ratio
    // c_ab/(c_a·c_b) (monotone in PMI, one IEEE division) with (w1, w2)
    // tiebreaks; log2 appears only in the displayed value, rounded 6 with
    // identical parenthesization in both engines.
    "q148_pmi_collocations" -> ((s, d) => {
      Corpus.pmiCollocations(Tables.documents(s, d), minCount = 5, topK = 40)
    }),

    // nearest-class-centroid labeling: centroids fit on every 5th vector
    // (the labeled seed set), driver-computed in ascending-id order,
    // broadcast as literals; the whole corpus is labeled by a pure map
    // (fused cosine per centroid). q32's round-4 cosine convention;
    // centroid ties break toward the smallest label in both engines.
    "q145_centroid_label" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val seeds = embs.filter(col("vec_id") % 5 === 0)
      graft.llm.Similarity.nearestCentroid(embs, seeds, roundTo = 4)
        .select(col("vec_id"), col("label_pred"), col("cosine"))
    }),

    // interpolated-bigram cross-entropy (q113's model one order up):
    // model = the en slice's unigram + bigram tables, λ=0.75 (exactly
    // representable, so 1−λ is the same double everywhere), scored = all
    // docs per POSITION. Laplace arithmetic over exact counts → full
    // oracle at round-6.
    "q130_bigram_entropy" -> ((s, d) => {
      // the documents parquet ships as ONE row group, so the five scans'
      // position/gram explodes would each serialize onto a single task (a
      // test-data layout artifact, same note as the Scale harness);
      // spreading the scan is 4× here and result-invariant (swept)
      val docs = Tables.documents(s, d).repartition(
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      val en = docs.filter(col("lang") === "en")
      val uni = graft.llm.Corpus.unigramCounts(en)
      val bi = graft.llm.Corpus.bigramCounts(en)
      graft.llm.Corpus.crossEntropyBigram(docs, uni, bi, lambda = 0.75)
        .select(col("doc_id"), col("n_tokens"),
          round(col("cross_entropy"), 6).as("cross_entropy"))
    }),

    // OOV rate against the en slice's top-20 vocabulary (ties on count
    // break by the word — deterministically selectable in SQL); rates are
    // exact integer ratios
    "q135_oov_rate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val vocab = graft.llm.Corpus.topVocabulary(
        docs.filter(col("lang") === "en"), n = 20)
      graft.llm.Corpus.oovRate(docs, vocab)
        .select(col("doc_id"), col("n_tokens"), col("n_oov"), col("oov_rate"))
    }),

    // corpus data card over the dup-planted corpus (q107's 20 copies):
    // volumes, exact-dup mass, and corpus shares per (source, lang) —
    // every aggregate an exact integer, the share an int/int double
    "q126_data_card" -> ((s, d) => {
      graft.llm.Corpus.dataCard(LlmQueries.docsWithDups(s, d))
        .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
          col("n_chars"), col("n_distinct"), col("dup_docs"), col("doc_share"))
    })
  )

  /** q124's coarse cells: the 4 lowest-id embeddings at full dimension. */
  private[graft] def pqCells(s: SparkSession, d: String): Seq[Array[Double]] =
    Tables.embeddings(s, d).orderBy("vec_id").limit(4)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray).toSeq

  /** q121's codebooks: subspace j of centroid c = dims [16j, 16j+16) of
    * the c-th lowest-id embedding — tiny, deterministic, SQL-replicable. */
  private[graft] def pqCodebooks(s: SparkSession, d: String): Seq[Seq[Array[Double]]] = {
    val cents = Tables.embeddings(s, d).orderBy("vec_id").limit(4)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    (0 until 4).map(j => cents.map(c => c.slice(j * 16, (j + 1) * 16)).toSeq)
  }

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
        |FROM r WHERE rank <= 10""".stripMargin,

    // windows via range(), gram keys via md5 of the joined slice, covered
    // positions = distinct union of [i, i+10) over duplicated windows
    "q118_dup_spans" ->
      """WITH fab AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0
        |      THEN text || ' legal notice all rights reserved by the site owner today'
        |      ELSE text END AS text
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, text FROM fab
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM fab ORDER BY doc_id LIMIT 20)),
        |t AS (SELECT doc_id,
        |        string_split_regex(lower(trim(text)), '\s+') AS ws
        |      FROM corpus),
        |tl AS (SELECT doc_id, ws,
        |         CASE WHEN array_to_string(ws, '') = '' THEN 0
        |              ELSE len(ws) END AS n
        |       FROM t),
        |g AS (SELECT doc_id, ws,
        |        unnest(range(0, greatest(n - 10 + 1, 0))) AS i
        |      FROM tl),
        |fpw AS (SELECT doc_id, i,
        |          md5(array_to_string(ws[(i+1):(i+10)], ' ')) AS h
        |        FROM g),
        |c AS (SELECT h, count(*) AS cnt FROM fpw GROUP BY 1),
        |cov AS (SELECT doc_id, count(DISTINCT p) AS covered FROM (
        |          SELECT f.doc_id, unnest(range(f.i, f.i + 10)) AS p
        |          FROM fpw f JOIN c USING (h) WHERE cnt > 1)
        |        GROUP BY 1)
        |SELECT tl.doc_id, CAST(n AS BIGINT) AS n_tokens,
        |       CAST(coalesce(covered, 0) AS BIGINT) AS covered_tokens,
        |       round(CASE WHEN n > 0
        |                  THEN CAST(coalesce(covered, 0) AS DOUBLE) / n
        |                  ELSE 0 END, 6) AS coverage
        |FROM tl LEFT JOIN cov USING (doc_id)""".stripMargin,

    "q166_winnowing_overlap" ->
      """WITH probedocs AS (
        |  SELECT doc_id + 4000000 AS doc_id,
        |         array_to_string(list_slice(
        |           string_split_regex(trim(text), '\s+'), 1, 15), ' ') AS text
        |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |pt AS (SELECT doc_id,
        |         string_split_regex(lower(trim(text)), '\s+') AS ws
        |       FROM probedocs),
        |ptl AS (SELECT doc_id, ws,
        |          CASE WHEN array_to_string(ws, '') = '' THEN 0
        |               ELSE len(ws) END AS n FROM pt),
        |pg AS (SELECT doc_id,
        |         list_transform(range(0, n - 4 + 1),
        |           i -> md5(array_to_string(ws[(i+1):(i+4)], ' '))) AS hs,
        |         n - 4 + 1 AS m
        |       FROM ptl WHERE n >= 4),
        |psel AS (SELECT doc_id,
        |           list_transform(range(0, greatest(m - 5, 0) + 1),
        |             i -> list_min(hs[(i+1):(i+5)])) AS s FROM pg),
        |pfp AS (SELECT DISTINCT doc_id, unnest(s) AS fp FROM psel),
        |ct AS (SELECT doc_id,
        |         string_split_regex(lower(trim(text)), '\s+') AS ws
        |       FROM documents),
        |ctl AS (SELECT doc_id, ws,
        |          CASE WHEN array_to_string(ws, '') = '' THEN 0
        |               ELSE len(ws) END AS n FROM ct),
        |cg AS (SELECT doc_id,
        |         list_transform(range(0, n - 4 + 1),
        |           i -> md5(array_to_string(ws[(i+1):(i+4)], ' '))) AS hs,
        |         n - 4 + 1 AS m
        |       FROM ctl WHERE n >= 4),
        |csel AS (SELECT doc_id,
        |           list_transform(range(0, greatest(m - 5, 0) + 1),
        |             i -> list_min(hs[(i+1):(i+5)])) AS s FROM cg),
        |cfp AS (SELECT DISTINCT doc_id, unnest(s) AS fp FROM csel),
        |cdf AS (SELECT fp, count(*) AS dfq FROM cfp GROUP BY fp),
        |ckept AS (SELECT cfp.doc_id, cfp.fp FROM cfp
        |          JOIN cdf USING (fp) WHERE dfq <= 256)
        |SELECT p.doc_id AS id_a, c.doc_id AS id_b, count(*) AS n_shared
        |FROM pfp p JOIN ckept c USING (fp)
        |WHERE p.doc_id <> c.doc_id
        |GROUP BY 1, 2""".stripMargin,

    "q163_winnowing" ->
      """WITH t AS (SELECT doc_id,
        |             string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |tl AS (SELECT doc_id, ws,
        |         CASE WHEN array_to_string(ws, '') = '' THEN 0
        |              ELSE len(ws) END AS n
        |       FROM t),
        |g AS (SELECT doc_id,
        |        list_transform(range(0, n - 4 + 1),
        |          i -> md5(array_to_string(ws[(i+1):(i+4)], ' '))) AS hs,
        |        n - 4 + 1 AS m
        |      FROM tl WHERE n >= 4),
        |sel AS (SELECT doc_id,
        |          list_transform(
        |            range(0, greatest(m - 5, 0) + 1),
        |            i -> struct_pack(
        |              pos := i + len(hs[(i+1):(i+5)])
        |                     - list_position(list_reverse(hs[(i+1):(i+5)]),
        |                                     list_min(hs[(i+1):(i+5)])),
        |              fp := list_min(hs[(i+1):(i+5)]))) AS s
        |        FROM g),
        |u AS (SELECT doc_id, unnest(s) AS e FROM sel)
        |SELECT DISTINCT doc_id, CAST(e.pos AS BIGINT) AS pos, e.fp AS fp
        |FROM u""".stripMargin,

    // q118's window accounting, then the cut: original-case tokens at
    // uncovered positions rejoined with single spaces; untouched docs keep
    // their exact original text; emptied docs drop
    "q157_cut_dup_spans" ->
      """WITH fab AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0
        |      THEN text || ' legal notice all rights reserved by the site owner today'
        |      ELSE text END AS text
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, text FROM fab
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM fab ORDER BY doc_id LIMIT 20)),
        |t AS (SELECT doc_id, text,
        |        string_split_regex(trim(text), '\s+') AS wo,
        |        string_split_regex(lower(trim(text)), '\s+') AS ws
        |      FROM corpus),
        |tl AS (SELECT doc_id, text, wo, ws,
        |         CASE WHEN array_to_string(ws, '') = '' THEN 0
        |              ELSE len(ws) END AS n
        |       FROM t),
        |g AS (SELECT doc_id, ws,
        |        unnest(range(0, greatest(n - 10 + 1, 0))) AS i
        |      FROM tl),
        |fpw AS (SELECT doc_id, i,
        |          md5(array_to_string(ws[(i+1):(i+10)], ' ')) AS h
        |        FROM g),
        |c AS (SELECT h, count(*) AS cnt FROM fpw GROUP BY 1),
        |covp AS (SELECT DISTINCT doc_id, p FROM (
        |           SELECT f.doc_id, unnest(range(f.i, f.i + 10)) AS p
        |           FROM fpw f JOIN c USING (h) WHERE cnt > 1)),
        |covd AS (SELECT DISTINCT doc_id FROM covp),
        |toku AS (SELECT doc_id, i, wo[i+1] AS tok FROM
        |           (SELECT doc_id, wo, unnest(range(0, n)) AS i FROM tl
        |            WHERE doc_id IN (SELECT doc_id FROM covd))),
        |recon AS (SELECT k.doc_id, string_agg(k.tok, ' ' ORDER BY k.i) AS text
        |          FROM (SELECT t2.doc_id, t2.i, t2.tok
        |                FROM toku t2 LEFT JOIN covp cp
        |                  ON t2.doc_id = cp.doc_id AND t2.i = cp.p
        |                WHERE cp.p IS NULL) k
        |          GROUP BY k.doc_id),
        |outp AS (
        |  SELECT tl.doc_id,
        |         CASE WHEN covd.doc_id IS NULL THEN tl.text
        |              ELSE coalesce(recon.text, '') END AS text
        |  FROM tl LEFT JOIN covd USING (doc_id)
        |          LEFT JOIN recon USING (doc_id))
        |SELECT doc_id, text FROM outp WHERE trim(text) <> ''""".stripMargin,

    // the bloom path is exact by construction, so the oracle is the plain
    // fingerprint anti-join
    "q119_bloom_cross_dedup" ->
      """WITH ref AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM ref ORDER BY doc_id LIMIT 20)),
        |rf AS (SELECT DISTINCT
        |         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
        |       FROM ref)
        |SELECT b.doc_id FROM batch b
        |LEFT JOIN rf
        |  ON rf.h = md5(regexp_replace(lower(trim(b.text)), '\s+', ' ', 'g'))
        |WHERE rf.h IS NULL""".stripMargin,

    // PQ encode (argmin per (vec, subspace) with the explicit (dist, c)
    // tiebreak) + ADC (per-subspace lookup distances list-summed in fixed
    // j order to mirror the engine's left-assoc sum), ranked on the
    // rounded distance
    "q137_sq8_topk" -> sq8TopKSql,

    // nprobe = all cells ≡ the plain SQ8 scan, so q194/q196 share q137's
    // oracle (q196 additionally roundtrips through the cell store)
    "q194_ivfsq_topk" -> sq8TopKSql,
    "q196_ivfsq_store" -> sq8TopKSql,

    "q121_pq_adc_topk" -> pqAdcSql,

    "q172_adc_rerank" -> pqRerankSql,

    "q191_tfidf_cosine_topk" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |t AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(DISTINCT doc_id) AS n_docs FROM t),
        |wd AS (SELECT doc_id, term,
        |         tf * (ln((s.n_docs + 1.0) / (df + 1)) + 1) AS wd
        |       FROM tf JOIN dft USING (term) CROSS JOIN stats s),
        |nd AS (SELECT doc_id, sqrt(sum(wd*wd)) AS nd FROM wd GROUP BY 1),
        |qraw AS (SELECT doc_id AS query_id,
        |           unnest((string_split_regex(lower(trim(text)), '\s+'))[1:6]) AS term
        |         FROM documents WHERE doc_id % 100 = 7),
        |qtf AS (SELECT query_id, term, count(*) AS tf FROM qraw
        |        WHERE length(term) > 0 GROUP BY 1, 2),
        |wq AS (SELECT query_id, term,
        |         tf * (ln((s.n_docs + 1.0) / (coalesce(df, 0) + 1)) + 1) AS wq
        |       FROM qtf LEFT JOIN dft USING (term) CROSS JOIN stats s),
        |nq AS (SELECT query_id, sqrt(sum(wq*wq)) AS nq FROM wq GROUP BY 1),
        |c AS (SELECT wq.query_id, wd.doc_id, sum(wq.wq * wd.wd) AS dot
        |      FROM wq JOIN wd USING (term) GROUP BY 1, 2),
        |sc AS (SELECT c.query_id, c.doc_id,
        |         round(c.dot / (nq.nq * nd.nd), 6) AS score
        |       FROM c JOIN nd USING (doc_id) JOIN nq USING (query_id)),
        |r AS (SELECT query_id, doc_id, score,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY score DESC, doc_id) AS rank
        |      FROM sc)
        |SELECT query_id, doc_id, score, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10""".stripMargin,

    // q117's BM25 chain at k=20 ⊕ q32's cosine chain at k=20 → RRF(60)
    "q178_hybrid_rrf" ->
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
        |bm AS (SELECT query_id, doc_id, rnk FROM (
        |         SELECT query_id, doc_id,
        |           row_number() OVER (PARTITION BY query_id
        |                              ORDER BY score DESC, doc_id) AS rnk
        |         FROM sc) WHERE rnk <= 20),
        |eq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id % 100 = 7),
        |es AS (SELECT eq.query_id, e.vec_id AS doc_id,
        |         round(list_cosine_similarity(eq.qv,
        |           CAST(e.embedding AS DOUBLE[])), 4) AS cosine
        |       FROM embeddings e CROSS JOIN eq
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
        |      FROM f)
        |SELECT query_id, doc_id, rrf_score, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10""".stripMargin,

    "q175_semantic_decontam" ->
      """WITH h AS (SELECT CAST(embedding AS DOUBLE[]) AS hv
        |           FROM embeddings WHERE vec_id < 20),
        |t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS tv
        |      FROM embeddings WHERE vec_id >= 20),
        |c AS (SELECT t.vec_id,
        |        round(list_cosine_similarity(t.tv, h.hv), 6) AS cos
        |      FROM t CROSS JOIN h)
        |SELECT vec_id, max(cos) AS max_holdout_cosine,
        |       max(cos) >= 0.35 AS contaminated
        |FROM c GROUP BY vec_id""".stripMargin,

    // stored-index face ≡ plain ADC at nprobe = all (same trick as q124)
    "q138_ivfadc_store" -> pqAdcSql,

    // nprobe = all cells makes IVFADC ≡ ADC, so the oracle is IDENTICAL
    "q124_ivfadc_topk" -> pqAdcSql,

    // window energies as integer sums over the sample formula; bit w
    // compares window w+1 vs w
    "q134_audio_dedup" ->
      """WITH ids AS (SELECT unnest(range(0, 45)) AS id),
        |k AS (SELECT id, id % 15 AS key FROM ids),
        |en AS (
        |  SELECT id, tw.w AS w,
        |    sum(abs(((key*7 + (tw.w*10 + tj.j)*13) % 401) - 200)) AS e
        |  FROM k, unnest(range(0, 65)) AS tw(w), unnest(range(0, 10)) AS tj(j)
        |  GROUP BY id, tw.w),
        |bits AS (
        |  SELECT a.id,
        |    array_to_string(list(CASE WHEN b.e > a.e THEN '1' ELSE '0' END
        |                         ORDER BY a.w), '') AS h
        |  FROM en a JOIN en b ON b.id = a.id AND b.w = a.w + 1
        |  WHERE a.w < 64 GROUP BY a.id)
        |SELECT x.id AS id_a, y.id AS id_b, CAST(0 AS BIGINT) AS hamming
        |FROM bits x JOIN bits y ON x.id < y.id AND x.h = y.h""".stripMargin,

    // bit b: y = b//8, x = b%8; compare p(x+1,y) > p(x,y) from the planted
    // pixel formula — no image anywhere in the oracle
    "q133_image_phash_dedup" ->
      """WITH ids AS (SELECT unnest(range(0, 60)) AS id),
        |k AS (SELECT id, id % 20 AS key FROM ids),
        |bits AS (
        |  SELECT id,
        |    array_to_string(list_transform(range(0, 64), b ->
        |      CASE WHEN ((key*31 + (b // 8)*9 + ((b % 8) + 1))*37 + key) % 256
        |              > ((key*31 + (b // 8)*9 + (b % 8))*37 + key) % 256
        |           THEN '1' ELSE '0' END), '') AS h
        |  FROM k)
        |SELECT a.id AS id_a, b.id AS id_b, CAST(0 AS BIGINT) AS hamming
        |FROM bits a JOIN bits b ON a.id < b.id AND a.h = b.h""".stripMargin,

    "q131_hard_negatives" ->
      """WITH a AS (SELECT vec_id AS anchor_id, label AS al,
        |                  CAST(embedding AS DOUBLE[]) AS av
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT a.anchor_id, e.vec_id AS neighbor_id, e.label AS nl,
        |         list_cosine_similarity(a.av, CAST(e.embedding AS DOUBLE[]))
        |           AS cos
        |  FROM embeddings e CROSS JOIN a WHERE e.label <> a.al),
        |r AS (SELECT anchor_id, neighbor_id,
        |             CAST(nl AS BIGINT) AS neighbor_label,
        |             round(cos, 4) AS cosine,
        |             row_number() OVER (PARTITION BY anchor_id
        |                                ORDER BY round(cos, 4) DESC,
        |                                         neighbor_id) AS rank
        |      FROM scored)
        |SELECT anchor_id, neighbor_id, neighbor_label, cosine,
        |       CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10""".stripMargin,

    "q151_zipf_fit" ->
      """WITH uni AS (SELECT a AS word, CAST(count(*) AS BIGINT) AS c
        |             FROM (SELECT unnest(
        |                     string_split_regex(lower(trim(text)), '\s+')) AS a
        |                   FROM documents) t
        |             WHERE length(a) > 0 GROUP BY 1),
        |top AS (SELECT word, c FROM uni ORDER BY c DESC, word LIMIT 200),
        |rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, word) AS rank
        |       FROM top),
        |p AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
        |             CAST(count(*) AS DOUBLE) AS n,
        |             sum(ln(CAST(rank AS DOUBLE)) ORDER BY rank) AS sx,
        |             sum(ln(CAST(c AS DOUBLE)) ORDER BY rank) AS sy,
        |             sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(c AS DOUBLE))
        |                 ORDER BY rank) AS sxy,
        |             sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))
        |                 ORDER BY rank) AS sxx,
        |             sum(ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE))
        |                 ORDER BY rank) AS syy
        |      FROM rk)
        |SELECT n_points,
        |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
        |             / n, 6) AS intercept,
        |       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM p""".stripMargin,

    "q152_source_overlap" ->
      """WITH fps AS (SELECT DISTINCT
        |               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |                 AS fp,
        |               source AS src
        |             FROM documents WHERE text IS NOT NULL)
        |SELECT a.src AS src_a, b.src AS src_b,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM fps a JOIN fps b ON a.fp = b.fp AND a.src <= b.src
        |GROUP BY 1, 2""".stripMargin,

    "q150_ngram_novelty" ->
      """WITH sc AS (SELECT doc_id,
        |              string_split_regex(lower(trim(text)), '\s+') AS w
        |            FROM documents WHERE doc_id % 3 = 0),
        |rf AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS w
        |       FROM documents WHERE doc_id % 3 <> 0),
        |dg AS (SELECT doc_id, unnest(list_distinct(
        |         CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(range(1, len(w) - 1),
        |              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END))
        |         AS gram
        |       FROM sc),
        |rg AS (SELECT DISTINCT gram FROM
        |        (SELECT unnest(list_distinct(
        |           CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |           ELSE list_transform(range(1, len(w) - 1),
        |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END))
        |           AS gram
        |         FROM rf) t)
        |SELECT dg.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(count(*) FILTER (rg.gram IS NULL) AS BIGINT) AS n_novel,
        |       round(CAST(count(*) FILTER (rg.gram IS NULL) AS DOUBLE)
        |             / count(*), 6) AS novelty_rate
        |FROM dg LEFT JOIN rg ON dg.gram = rg.gram
        |GROUP BY dg.doc_id""".stripMargin,

    "q148_pmi_collocations" ->
      """WITH w AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |uni AS (SELECT a AS word, CAST(count(*) AS BIGINT) AS c
        |        FROM (SELECT unnest(ws) AS a FROM w) t
        |        WHERE length(a) > 0 GROUP BY 1),
        |bi AS (SELECT ws[i-1] AS prev, ws[i] AS word,
        |         CAST(count(*) AS BIGINT) AS c
        |       FROM (SELECT ws FROM w WHERE len(ws) >= 2) x,
        |            unnest(range(2, len(ws) + 1)) AS r(i)
        |       WHERE length(ws[i-1]) > 0 AND length(ws[i]) > 0
        |       GROUP BY 1, 2),
        |tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS nu,
        |               (SELECT CAST(sum(c) AS BIGINT) FROM bi) AS nb),
        |sc AS (SELECT bi.prev AS w1, bi.word AS w2, bi.c AS n_pair,
        |         CAST(bi.c AS DOUBLE) / (ua.c * ub.c) AS r,
        |         round(log2((CAST(bi.c AS DOUBLE) * tot.nu / ua.c)
        |               * (CAST(tot.nu AS DOUBLE) / ub.c) / tot.nb), 6) AS pmi
        |       FROM bi
        |       JOIN uni ua ON ua.word = bi.prev
        |       JOIN uni ub ON ub.word = bi.word
        |       CROSS JOIN tot
        |       WHERE bi.c >= 5)
        |SELECT w1, w2, n_pair, pmi
        |FROM sc ORDER BY r DESC, w1, w2 LIMIT 40""".stripMargin,

    "q145_centroid_label" ->
      """WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id % 5 = 0),
        |d AS (SELECT label, vec_id, i, v[i] AS x
        |      FROM s, unnest(range(1, len(v) + 1)) AS u(i)),
        |m AS (SELECT label, i, sum(x ORDER BY vec_id) / count(*) AS m
        |      FROM d GROUP BY label, i),
        |cent AS (SELECT label, list(m ORDER BY i) AS cv FROM m GROUP BY label),
        |sc AS (SELECT e.vec_id, cent.label,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      cent.cv), 4) AS cos
        |       FROM embeddings e CROSS JOIN cent),
        |r AS (SELECT vec_id, label, cos,
        |        row_number() OVER (PARTITION BY vec_id
        |                           ORDER BY cos DESC, label) AS rn
        |      FROM sc)
        |SELECT vec_id, label AS label_pred, cos AS cosine
        |FROM r WHERE rn = 1""".stripMargin,

    // unigram CTEs as q113, plus the bigram table; positions via range();
    // first token scores unigram-only (prev IS NULL)
    "q130_bigram_entropy" ->
      """WITH refw AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents WHERE lang = 'en'),
        |refc AS (SELECT word, count(*) AS c FROM refw
        |         WHERE length(word) > 0 GROUP BY word),
        |refbsrc AS (
        |  SELECT string_split_regex(lower(trim(text)), '\s+') AS ws
        |  FROM documents WHERE lang = 'en'),
        |refb AS (
        |  SELECT ws[i-1] AS prev, ws[i] AS word, count(*) AS c
        |  FROM (SELECT ws, unnest(range(2, len(ws) + 1)) AS i FROM refbsrc)
        |  WHERE length(ws[i]) > 0 AND length(ws[i-1]) > 0
        |  GROUP BY 1, 2),
        |tot AS (SELECT sum(c) AS t, count(*) AS v FROM refc),
        |pos AS (
        |  SELECT doc_id, ws[i] AS word,
        |         CASE WHEN i > 1 THEN ws[i-1] END AS prev
        |  FROM (SELECT doc_id,
        |               string_split_regex(lower(trim(text)), '\s+') AS ws
        |        FROM documents),
        |       unnest(range(1, len(ws) + 1)) AS u(i)
        |  ),
        |flt AS (SELECT * FROM pos WHERE length(word) > 0),
        |p AS (
        |  SELECT f.doc_id,
        |    CASE WHEN f.prev IS NULL
        |      THEN CAST(coalesce(u.c + 1, 1) AS DOUBLE) / (t.t + t.v + 1)
        |      ELSE 0.75 * (CAST(coalesce(b.c + 1, 1) AS DOUBLE)
        |                   / (coalesce(pu.c, 0) + t.v + 1))
        |           + (1 - 0.75) * (CAST(coalesce(u.c + 1, 1) AS DOUBLE)
        |                           / (t.t + t.v + 1)) END AS prob
        |  FROM flt f
        |  LEFT JOIN refc u ON u.word = f.word
        |  LEFT JOIN refc pu ON pu.word = f.prev
        |  LEFT JOIN refb b ON b.prev = f.prev AND b.word = f.word
        |  CROSS JOIN tot t)
        |SELECT doc_id, count(*) AS n_tokens,
        |       round(-sum(ln(prob)) / count(*), 6) AS cross_entropy
        |FROM p GROUP BY doc_id""".stripMargin,

    "q127_script_mix" ->
      """WITH fab AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 97 = 0
        |         THEN 'много русских слов здесь очень много слов подряд'
        |         ELSE text ||
        |           CASE WHEN doc_id % 5 = 1 THEN ' привет мир как дела'
        |                WHEN doc_id % 5 = 2 THEN ' 你好世界再见'
        |                WHEN doc_id % 5 = 3 THEN ' مرحبا بالعالم'
        |                WHEN doc_id % 5 = 4 THEN ' γειά σου κόσμε'
        |                ELSE '' END END AS text
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, length(text) AS n,
        |    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS lat,
        |    length(text) - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')) AS cyr,
        |    length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS cjk,
        |    length(text) - length(regexp_replace(text, '[؀-ۿ]', '', 'g')) AS ara,
        |    length(text) - length(regexp_replace(text, '[Ͱ-Ͽ]', '', 'g')) AS gre
        |  FROM fab)
        |SELECT doc_id,
        |  CAST(lat AS BIGINT) AS n_latin, CAST(cyr AS BIGINT) AS n_cyrillic,
        |  CAST(cjk AS BIGINT) AS n_cjk, CAST(ara AS BIGINT) AS n_arabic,
        |  CAST(gre AS BIGINT) AS n_greek, CAST(n AS BIGINT) AS n_chars,
        |  CASE WHEN n = 0 THEN 0.0 ELSE CAST(cyr AS DOUBLE) / n END
        |    AS cyrillic_share,
        |  CASE WHEN lat >= cyr AND lat >= cjk AND lat >= ara AND lat >= gre
        |         THEN 'latin'
        |       WHEN cyr >= cjk AND cyr >= ara AND cyr >= gre THEN 'cyrillic'
        |       WHEN cjk >= ara AND cjk >= gre THEN 'cjk'
        |       WHEN ara >= gre THEN 'arabic'
        |       ELSE 'greek' END AS dominant
        |FROM c""".stripMargin,

    "q135_oov_rate" ->
      """WITH refw AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents WHERE lang = 'en'),
        |vocab AS (
        |  SELECT word FROM (SELECT word, count(*) AS c FROM refw
        |                    WHERE length(word) > 0 GROUP BY word)
        |  ORDER BY c DESC, word LIMIT 20),
        |tok AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents),
        |t AS (SELECT doc_id, word FROM tok WHERE length(word) > 0)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |       CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_oov,
        |       CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*) AS oov_rate
        |FROM t LEFT JOIN vocab v USING (word)
        |GROUP BY t.doc_id""".stripMargin,

    "q126_data_card" ->
      """WITH alldocs AS (
        |  SELECT doc_id, text, lang, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text, lang, source FROM
        |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |tot AS (SELECT count(*) AS total FROM alldocs)
        |SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN trim(text) = '' THEN 0
        |           ELSE len(string_split_regex(trim(text), '\s+')) END)
        |       AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
        |    AS n_distinct,
        |  count(*) - count(DISTINCT
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS dup_docs,
        |  CAST(count(*) AS DOUBLE) / any_value(total) AS doc_share
        |FROM alldocs CROSS JOIN tot
        |GROUP BY source, lang""".stripMargin
  )

  /** q172's oracle: the [[pqAdcSql]] pipeline widened to a top-50
    * shortlist, then exact-cosine re-ranked to top-10 (round-4 + vec_id,
    * the q32 convention). */
  private lazy val pqRerankSql: String =
    """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |              FROM embeddings),
      |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v AS cv
      |          FROM (SELECT * FROM base ORDER BY vec_id LIMIT 4)),
      |subs AS (SELECT unnest(range(0, 4)) AS j),
      |enc0 AS (
      |  SELECT b.vec_id, s.j, c.c,
      |    list_sum(list_transform(range(1, 17),
      |      i -> (b.v[s.j*16 + i] - c.cv[s.j*16 + i])
      |           * (b.v[s.j*16 + i] - c.cv[s.j*16 + i]))) AS dist
      |  FROM base b CROSS JOIN subs s CROSS JOIN cents c),
      |enc AS (
      |  SELECT vec_id, j, c AS code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, j
      |                                 ORDER BY dist, c) AS rn
      |    FROM enc0) WHERE rn = 1),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM base
      |      WHERE vec_id % 100 = 7),
      |dq AS (
      |  SELECT q.query_id, e.vec_id, e.j,
      |    list_sum(list_transform(range(1, 17),
      |      i -> (q.qv[e.j*16 + i] - c.cv[e.j*16 + i])
      |           * (q.qv[e.j*16 + i] - c.cv[e.j*16 + i]))) AS dj
      |  FROM q CROSS JOIN enc e JOIN cents c ON c.c = e.code),
      |d AS (SELECT query_id, vec_id,
      |        list_sum(list(dj ORDER BY j)) AS adist
      |      FROM dq GROUP BY 1, 2),
      |sl AS (SELECT query_id, vec_id FROM (
      |         SELECT query_id, vec_id,
      |           row_number() OVER (PARTITION BY query_id
      |                              ORDER BY round(adist, 6), vec_id) AS rn
      |         FROM d) WHERE rn <= 50),
      |ex AS (SELECT sl.query_id, sl.vec_id,
      |         round(list_cosine_similarity(q.qv, b.v), 4) AS cosine
      |       FROM sl JOIN base b ON b.vec_id = sl.vec_id
      |       JOIN q ON q.query_id = sl.query_id),
      |r AS (SELECT query_id, vec_id, cosine,
      |        row_number() OVER (PARTITION BY query_id
      |                           ORDER BY cosine DESC, vec_id) AS rank
      |      FROM ex)
      |SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 10""".stripMargin

  /** q137's oracle (SQ8 encode + midpoint-dequant asymmetric L2 top-10);
    * q194 shares it verbatim — IVF at nprobe = all cells IS the plain
    * scan, so the oracle needs no cell arithmetic at all. */
  private lazy val sq8TopKSql: String =
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |d AS (SELECT vec_id, unnest(v) AS x,
        |             generate_subscripts(v, 1) - 1 AS dim FROM e),
        |st AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM d GROUP BY 1),
        |c AS (SELECT d.vec_id, d.dim,
        |        CASE WHEN st.mx - st.mn <= 0 THEN 0
        |             ELSE greatest(0, least(255,
        |               CAST(floor((d.x - st.mn) / (st.mx - st.mn) * 256)
        |                    AS INT))) END AS code,
        |        st.mn, st.mx
        |      FROM d JOIN st USING (dim)),
        |q AS (SELECT vec_id AS query_id, dim, x AS qx
        |      FROM d WHERE vec_id % 100 = 7),
        |dist AS (SELECT q.query_id, c.vec_id,
        |           sum((q.qx - (c.mn + (c.code + 0.5) / 256.0 *
        |                (c.mx - c.mn))) *
        |               (q.qx - (c.mn + (c.code + 0.5) / 256.0 *
        |                (c.mx - c.mn)))) AS dd
        |         FROM c JOIN q USING (dim)
        |         GROUP BY 1, 2),
        |ranked AS (SELECT query_id, vec_id, round(dd, 6) AS sq_dist,
        |             row_number() OVER (PARTITION BY query_id
        |               ORDER BY round(dd, 6), vec_id) AS rank
        |           FROM dist)
        |SELECT query_id, vec_id, sq_dist, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 10""".stripMargin

  private lazy val pqAdcSql: String =
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |              FROM embeddings),
        |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v AS cv
        |          FROM (SELECT * FROM base ORDER BY vec_id LIMIT 4)),
        |subs AS (SELECT unnest(range(0, 4)) AS j),
        |enc0 AS (
        |  SELECT b.vec_id, s.j, c.c,
        |    list_sum(list_transform(range(1, 17),
        |      i -> (b.v[s.j*16 + i] - c.cv[s.j*16 + i])
        |           * (b.v[s.j*16 + i] - c.cv[s.j*16 + i]))) AS dist
        |  FROM base b CROSS JOIN subs s CROSS JOIN cents c),
        |enc AS (
        |  SELECT vec_id, j, c AS code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, j
        |                                 ORDER BY dist, c) AS rn
        |    FROM enc0) WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM base
        |      WHERE vec_id % 100 = 7),
        |dq AS (
        |  SELECT q.query_id, e.vec_id, e.j,
        |    list_sum(list_transform(range(1, 17),
        |      i -> (q.qv[e.j*16 + i] - c.cv[e.j*16 + i])
        |           * (q.qv[e.j*16 + i] - c.cv[e.j*16 + i]))) AS dj
        |  FROM q CROSS JOIN enc e JOIN cents c ON c.c = e.code),
        |d AS (SELECT query_id, vec_id,
        |        list_sum(list(dj ORDER BY j)) AS adist
        |      FROM dq GROUP BY 1, 2),
        |r AS (SELECT query_id, vec_id, round(adist, 6) AS adist,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY round(adist, 6), vec_id) AS rank
        |      FROM d)
        |SELECT query_id, vec_id, adist, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10""".stripMargin
}
