package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`ArrayType(FloatType)`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *    the corpus, cosine per pair, two-phase top-k
  *    ([[graft.operators.TopK.topKPerQuery]]). Scales linearly in corpus
  *    size × queries; the corpus is never shuffled and no single task
  *    ever sorts a query's full candidate set.
  *  - [[lshTopK]]: approximate scale path — random-hyperplane signatures
  *    bucket the corpus; queries only score their own bucket's rows.
  *    Bucket count 2^planes; the cross join disappears into an equality
  *    join on the bucket key.
  *
  * Cosine is a zip_with + aggregate expression — codegen'd, no UDF.
  */
object Similarity {

  /** Cosine similarity of two float/double arrays (0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    when(na === 0 || nb === 0, 0.0).otherwise(dot / (sqrt(na) * sqrt(nb)))
  }

  /** Dot product (for pre-normalized embeddings — one pass instead of
    * three). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Per-dimension standardization (x − μ_d)/σ_d — the "whiten the
    * embeddings first" hook SCALE.md prescribes against correlated-corpus
    * LSH bucket skew (diagonal whitening: it equalizes per-dimension
    * variance, which is what origin-hyperplane bucketing is sensitive to).
    *
    * One distributed pass computes the per-dimension moments (posexplode →
    * partial-agg groupBy over at most `dim` keys), which come back as one
    * broadcast row of aligned arrays; the rewrite is a higher-order
    * `transform` — no driver action, no second shuffle of the corpus.
    * σ_d = 0 dimensions divide by 1 (centered, not blown up). Output
    * replaces `vecCol` with the standardized DOUBLE array. */
  def standardizeEmbeddings(embs: DataFrame, vecCol: String = "embedding")
      : DataFrame = {
    val stats = embs
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(avg(col("x").cast("double")).as("mu"),
        stddev_pop(col("x").cast("double")).as("sigma"))
      .agg(
        transform(sort_array(collect_list(struct(col("dim"), col("mu")))),
          s => s.getField("mu")).as("__mus"),
        transform(sort_array(collect_list(struct(col("dim"), col("sigma")))),
          s => s.getField("sigma")).as("__sigmas"))
    // two-arg transform (value, index): no sequence scaffolding, and an
    // EMPTY embedding array maps to an empty array instead of tripping
    // element_at(..., 0) on the [0, -1] descending-sequence artifact
    embs.crossJoin(broadcast(stats))
      .withColumn(vecCol,
        transform(col(vecCol), (x, i) => {
          val mu = element_at(col("__mus"), i + 1)
          val sg = element_at(col("__sigmas"), i + 1)
          (x.cast("double") - mu) / when(sg.isNull || sg === 0, 1.0).otherwise(sg)
        }))
      .drop("__mus", "__sigmas")
  }

  /** `planes`-bit random-hyperplane signature: bit p = sign of ⟨v, h_p⟩,
    * with pseudo-random plane components from pure integer arithmetic
    * (Knuth multiplicative LCG mod the prime 1000003) — no RNG state,
    * partitioning-invariant, identical across runs and cluster sizes, and
    * reproducible in any engine (the DuckDB correctness oracle recomputes
    * the same signatures from the same formula).
    *
    * This is the REFERENCE formulation (built-ins only, `planes` separate
    * aggregate walks); the production pipelines use the bit-identical
    * fused native expression [[graft.functions.GraftFunctions.hyperplaneSig]]
    * — one codegen loop over the vector for all planes. A spec asserts
    * both produce identical signatures. */
  def hyperplaneSignature(v: Column, planes: Int = 16): Column = {
    val withIdx = zip_with(v, sequence(lit(0), size(v) - 1),
      (x, i) => struct(x.cast("double").as("x"), i.as("i")))
    val bits = (0 until planes).map { p =>
      val proj = aggregate(withIdx, lit(0.0), (acc, e) => {
        // pseudo-uniform in [-0.5, 0.5): ((i·2654435761 + p·40503 + 12345)
        // mod 1000003) / 1000003 − 0.5 — exact integer ops in any engine
        val m = pmod(e.getField("i").cast("long") * lit(2654435761L)
          + lit(p * 40503L + 12345L), lit(1000003L))
        val coef = m.cast("double") / 1000003.0 - 0.5
        acc + e.getField("x") * coef
      })
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact top-k nearest neighbors by cosine for each query vector.
    * `queries` must be small enough to broadcast (the usual case: a probe
    * set). Returns (query_id, neighbor_id, cosine, rank).
    *
    * `roundTo ≥ 0` rounds the cosine to that many decimals BEFORE the
    * internal two-phase rank (and in the returned column) — the knob for
    * callers that consume a rounded-score rank convention (e.g. RRF
    * fusion at round-4): they get their k directly instead of ranking the
    * full cross product themselves just to re-round. Default −1 ranks the
    * raw fused-kernel cosine (itself engine-exact). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      vecCol: String = "embedding", idCol: String = "vec_id",
      roundTo: Int = -1): DataFrame = {
    // size-guarded hint: under the documented queries ≪ corpus contract
    // this broadcasts as before; a corpus-sized query set degrades to a
    // shuffled plan instead of throwing at the BroadcastExchange limit
    val q = graft.model.GraftDataset.broadcastIfSmall(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    // fused native expression (bit-identical to `cosine`, one codegen loop)
    val cosExpr0 = graft.functions.GraftFunctions.cosine(
      corpus.sparkSession, col("qv"), col("cv"))
    val cosExpr = if (roundTo >= 0) round(cosExpr0, roundTo) else cosExpr0
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosExpr.as("cosine"))
    graft.operators.TopK.topKPerQuery(scored, "query_id",
      Seq(desc("cosine"), col("neighbor_id")), k)
  }

  /** Hard-negative mining for contrastive training (DPR/SimCSE-style data
    * prep): for each anchor, the top-`k` most-cosine-similar corpus
    * vectors whose label DIFFERS from the anchor's — the negatives that
    * actually teach the margin, versus random negatives that are trivially
    * separable. Brute-force face over a BROADCAST anchor set (the
    * [[bruteForceTopK]] contract); at corpus scale pre-restrict candidates
    * with [[lshTopK]] buckets or [[Ivf]] cells and re-rank here.
    *
    * `roundTo ≥ 0` rounds the cosine BEFORE the internal two-phase rank
    * (same knob as [[bruteForceTopK]]): callers on a rounded-score rank
    * convention get their k directly instead of ranking the full
    * anchors × corpus product only to re-round and re-rank it. */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
      labelCol: String = "label", vecCol: String = "embedding",
      idCol: String = "vec_id", roundTo: Int = -1): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val a = graft.model.GraftDataset.broadcastIfSmall(
      anchors.select(col(idCol).as("anchor_id"),
        col(labelCol).as("anchor_label"), col(vecCol).as("av")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neighbor_label"), col(vecCol).as("cv"))
    val cos0 = graft.functions.GraftFunctions.cosine(
      corpus.sparkSession, col("av"), col("cv"))
    val cos = if (roundTo >= 0) round(cos0, roundTo) else cos0
    val scored = c.crossJoin(a)
      .filter(col("neighbor_label") =!= col("anchor_label"))
      .select(col("anchor_id"), col("neighbor_id"), col("neighbor_label"),
        cos.as("cosine"))
    graft.operators.TopK.topKPerQuery(scored, "anchor_id",
      Seq(desc("cosine"), col("neighbor_id")), k)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of per-query rankings —
    * THE standard hybrid-search combiner (lexical BM25 ⊕ dense cosine):
    * each input frame carries (queryCol, idCol, rankCol); a candidate's
    * fused score is `Σ_sources 1/(rrfK + rank)` over the sources that
    * ranked it, and the fused list is the top-`k` by that score (rounded
    * to 6 — the cross-engine convention; IEEE `+` is commutative so a
    * two-source sum is order-free), id tiebreak.
    *
    * Plan: union the (already tiny — k·|queries| rows each) ranking
    * frames, one partial-agg groupBy on (query, id), then the two-phase
    * [[graft.operators.TopK.topKPerQuery]]. Nothing here touches the
    * corpus — fusion cost is bounded by the candidate lists, which is
    * what makes RRF the right combiner at 100 TB (each source prunes
    * corpus-scale work its own way first). */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60,
      queryCol: String = "query_id", idCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking frame required")
    require(k > 0 && rrfK >= 0, s"k ($k) must be positive, rrfK ($rrfK) ≥ 0")
    val normed = rankings.map(_.select(col(queryCol), col(idCol),
      (lit(1.0) / (lit(rrfK) + col(rankCol).cast("double"))).as("__rrf")))
    val fused = normed.reduce(_ unionByName _)
      .groupBy(col(queryCol), col(idCol))
      .agg(round(sum(col("__rrf")), 6).as("rrf_score"))
    graft.operators.TopK.topKPerQuery(fused, queryCol,
      Seq(desc("rrf_score"), col(idCol).asc), k)
  }

  /** Semantic decontamination flags — the embedding-space counterpart of
    * the n-gram [[graft.llm.Corpus.decontaminate]]: an eval item a train
    * document PARAPHRASES shares no 13-gram, but its embedding sits next
    * door. For every train vector, the max cosine against ANY holdout
    * vector (rounded to `roundTo` — the cross-engine convention) and a
    * `contaminated` flag at `threshold`.
    *
    * Holdout/eval sets are small by construction, so the holdout side is
    * BROADCAST and the train corpus streams through one fused-cosine map +
    * a partial-agg max per train id — the corpus never shuffles (the max
    * groupBy re-uses the scan partitioning on the already-unique train id,
    * combining map-side to one row per id). At |holdout| in the millions,
    * pre-restrict candidates with [[lshTopK]] buckets or [[Ivf]] cells and
    * max over the survivors instead. Returns (idCol, max_holdout_cosine,
    * contaminated). */
  def semanticContamination(train: DataFrame, holdout: DataFrame,
      threshold: Double, vecCol: String = "embedding",
      idCol: String = "vec_id", roundTo: Int = 6): DataFrame = {
    val h = graft.model.GraftDataset.broadcastIfSmall(
      holdout.select(col(vecCol).as("__hv")))
    val cos = graft.functions.GraftFunctions.cosine(
      train.sparkSession, col("__tv"), col("__hv"))
    train.select(col(idCol), col(vecCol).as("__tv"))
      .crossJoin(h)
      .select(col(idCol), round(cos, roundTo).as("__cos"))
      .groupBy(col(idCol))
      .agg(max(col("__cos")).as("max_holdout_cosine"))
      .withColumn("contaminated", col("max_holdout_cosine") >= threshold)
  }

  /** Nearest-class-centroid labeling (Rocchio classification — the
    * simplest embedding classifier, the shape FineWeb-Edu-style corpus
    * labeling uses for classifier inference at scale): fit per-label mean
    * vectors from a SMALL labeled `seeds` frame, then assign every corpus
    * vector the label of its most-cosine-similar centroid. Returns
    * (idCol, label_pred, cosine[round 6]).
    *
    * 100-TB shape: the seed set is labeled data — small by construction —
    * so centroids are computed on the DRIVER (the splitter's documented
    * driver-sized pattern) and ride into the plan as LITERAL arrays; the
    * corpus is scored by a pure map over the scan (fused cosine per
    * centroid, codegen) — no join, no shuffle, no window. Labels number
    * in the tens/hundreds, so the per-row work is `labels × dims`
    * multiply-adds inside whole-stage codegen.
    *
    * Determinism contract: seed vectors are accumulated per label in
    * ASCENDING seed-id order in float64 (the oracle replays the identical
    * ordered sum), the cosine is the fused left-to-right kernel, scores
    * compare ROUNDED to `roundTo` decimals (the cosine-gate convention),
    * and centroid ties break toward the SMALLEST label. */
  def nearestCentroid(corpus: DataFrame, seeds: DataFrame,
      labelCol: String = "label", vecCol: String = "embedding",
      idCol: String = "vec_id", roundTo: Int = 6): DataFrame = {
    val seedRows = seeds
      .select(col(idCol).cast("long"), col(labelCol).cast("int"),
        col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    require(seedRows.nonEmpty, "nearestCentroid: empty seed set")
    val dim = seedRows.head._3.length
    require(seedRows.forall(_._3.length == dim),
      s"nearestCentroid: mixed seed dimensions (expected $dim)")
    val centroids: Seq[(Int, Array[Double])] = seedRows
      .groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (label, rows) =>
        val acc = new Array[Double](dim)
        // INVARIANT: the accumulation order is seed-id ascending BY THIS
        // SORT, independent of the seed frame's row order or of groupBy's
        // grouping order — the per-label sort here is what makes the
        // float64 centroid sum (and thus every score) input-order
        // invariant; CurationSpec asserts it with a shuffled seed frame
        rows.sortBy(_._1).foreach { case (_, _, v) =>
          var i = 0
          while (i < dim) { acc(i) += v(i); i += 1 }
        }
        var i = 0
        while (i < dim) { acc(i) /= rows.length; i += 1 }
        (label, acc)
      }
    val spark = corpus.sparkSession
    val cv = col(vecCol)
    val scored = centroids.map { case (label, c) =>
      struct(
        round(graft.functions.GraftFunctions.cosine(spark, cv,
          typedLit(c.toSeq)), roundTo).as("c"),
        lit(-label).as("nl"))
    }
    corpus.select(col(idCol),
        array_max(array(scored: _*)).as("best"))
      .select(col(idCol), (-col("best.nl")).as("label_pred"),
        col("best.c").as("cosine"))
  }

  /** Approximate top-k: queries only score corpus rows sharing their LSH
    * bucket (equality join on the signature). Recall grows with fewer
    * planes / more probes; this is the 1000-executor-scale path where the
    * corpus is too big to cross join. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      planes: Int = 8, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val sigOf = graft.functions.GraftFunctions
      .hyperplaneSig(corpus.sparkSession, _: Column, planes)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      sigOf(col(vecCol)).as("sig"))
    val q = graft.model.GraftDataset.broadcastIfSmall(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        sigOf(col(vecCol)).as("sig")))
    val scored = c.join(q, Seq("sig"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.GraftFunctions.cosine(
          corpus.sparkSession, col("qv"), col("cv")).as("cosine"))
    graft.operators.TopK.topKPerQuery(scored, "query_id",
      Seq(desc("cosine"), col("neighbor_id")), k)
  }
}

/** IVF (inverted-file) approximate nearest neighbor — the classic
  * centroid-bucketed scale path: k-means centroids partition the corpus;
  * each query scores only the rows assigned to its `nprobe` nearest
  * centroids. Centroids come from MLlib KMeans (seeded → deterministic);
  * corpus assignment and probing are plain joins — no cross join, and the
  * corpus shuffles once (on centroid id) regardless of query count. */
object Ivf {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window

  case class IvfIndex(centroids: Array[(Int, Array[Double])], assigned: DataFrame)

  /** Build the index: fit seeded KMeans on the corpus embeddings, assign
    * every row to its centroid. `assigned` = corpus + `centroid_id`. */
  def build(corpus: DataFrame, nCentroids: Int = 16, seed: Long = 42,
      vecCol: String = "embedding", idCol: String = "vec_id"): IvfIndex = {
    val withVec = corpus.withColumn("__vec",
      org.apache.spark.ml.functions.array_to_vector(col(vecCol)))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nCentroids).setSeed(seed).setFeaturesCol("__vec")
      .setPredictionCol("centroid_id")
    val model = km.fit(withVec)
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => i -> v.toArray }
    val assigned = model.transform(withVec).drop("__vec")
    IvfIndex(centroids, assigned)
  }

  /** Probe: each query scores rows of its `nprobe` closest centroids.
    *
    * Query→centroid assignment is DISTRIBUTED: the tiny centroid table
    * (the only driver-side artifact — it comes out of the fitted KMeans
    * model) broadcasts against the query frame, each query ranks its
    * centroids in-plan, and the scoring join is an equality join on
    * centroid_id. No query row ever reaches the driver, so `queries` can
    * be a full table, not just a probe set; the corpus shuffles once (on
    * centroid_id) regardless of query count. */
  def topK(index: IvfIndex, queries: DataFrame, k: Int = 10, nprobe: Int = 4,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.centroids.toSeq.toDF("centroid_id", "cv")
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // nprobe nearest centroids per query: broadcast nested-loop against the
    // centroid table (|centroids| rows — intentionally tiny), window top-n.
    // Ties break on centroid_id, matching a stable sort over model order.
    val aw = Window.partitionBy("query_id")
      .orderBy(desc("__csim"), col("centroid_id"))
    val probes = q0.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("centroid_id"),
        graft.functions.GraftFunctions.cosine(spark, col("cv"), col("qv")).as("__csim"))
      .withColumn("__cr", row_number().over(aw))
      .filter(col("__cr") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id"))
    val scored = index.assigned
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("centroid_id"))
      .join(probes, Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.GraftFunctions.cosine(spark, col("qv"), col("cv")).as("cosine"))
    graft.operators.TopK.topKPerQuery(scored, "query_id",
      Seq(desc("cosine"), col("neighbor_id")), k)
  }
}
