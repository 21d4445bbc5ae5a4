package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): select raw-corpus documents whose hashed-n-gram distribution
  * looks like a TARGET corpus, by importance weights between two
  * bag-of-hashed-n-grams models. The published recipe: featurize every
  * document as counts over `buckets` hash buckets of its word unigrams +
  * bigrams; fit multinomial bucket models p̂ (target) and q̂ (raw) with
  * add-one smoothing; weight each raw document by
  * `log w(x) = Σ_b n_b(x) · (ln p̂_b − ln q̂_b)`; resample without
  * replacement via Gumbel top-k over the log-weights.
  *
  * Spark-first shape, 100-TB honest:
  *  - featurization is a pure map (split + explode) and the per-doc·bucket
  *    pre-aggregation collapses repeated grams map-side before any join;
  *  - a bucket MODEL is `buckets` rows no matter the corpus size — both
  *    model joins broadcast, so scoring never shuffles the corpus (the
  *    only corpus-wide exchange is the per-doc regroup);
  *  - the Gumbel noise is an md5-derived uniform of the doc id
  *    ([[Sampling.hashUniform]]'s convention, +0.5 nudged off zero), so
  *    selection is deterministic, partition-invariant, retry-stable, and
  *    bit-reproducible by the DuckDB oracle;
  *  - the final top-k is `orderBy(...).limit(k)` — Spark plans that as
  *    TakeOrderedAndProject (per-partition top-k, then a k·P-row merge on
  *    one reducer), the same two-phase shape as [[graft.operators.TopK]],
  *    already built in for the global-k case.
  *
  * Cross-engine determinism: bucket ids come from the first 7 hex nibbles
  * of md5(gram) mod `buckets` (exact integers), probabilities are ratios
  * of integer counts, and emitted scores are rounded to 6 decimals with
  * doc-id tiebreaks (the q70/q113 gate convention).
  */
object Dsir {

  /** Lowercased whitespace tokens of `textCol`. */
  private def words(textCol: Column): Column =
    filter(split(lower(trim(textCol)), "\\s+"), w => length(w) > 0)

  /** 28-bit md5 hash of a gram string, mod `buckets` — the DSIR feature
    * hash. Exact integer arithmetic in any engine. */
  def gramBucket(gram: Column, buckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 7), 16, 10).cast("long"), lit(buckets))

  /** Explode a corpus into one row per gram occurrence: unigrams plus
    * adjacent "prev word" bigrams (space-joined). Zero-gram documents
    * contribute nothing; single-token documents contribute their unigram
    * only (the bigram transform is guarded — `sequence(2, 1)` counts DOWN
    * and would index out of bounds). */
  def explodeGrams(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val ws = words(col(textCol))
    val unis = df.select(col(idCol), explode(ws).as("gram"))
    val bis = df.select(col(idCol), ws.as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(2), size(col("__ws"))), i =>
          concat_ws(" ", element_at(col("__ws"), i - 1),
            element_at(col("__ws"), i)))).as("gram"))
    unis.unionByName(bis)
  }

  /** Hashed-gram bucket counts of a whole corpus: `buckets` rows with the
    * total gram count attached — the multinomial model table. Partial
    * aggregation collapses everything map-side; the result is broadcast-
    * sized by construction. */
  def bucketModel(corpus: DataFrame, buckets: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    explodeGrams(corpus, textCol, idCol)
      .groupBy(gramBucket(col("gram"), buckets).as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Per-document DSIR importance log-weights of `raw` against a `target`
    * corpus: `log_weight = Σ_b n_b(doc) · (ln p̂_b − ln q̂_b)` with
    * add-one smoothing `p̂_b = (c_b + 1) / (T + buckets)`. Emits
    * (idCol, n_grams, log_weight[round 6]); documents with no grams have
    * no features and are absent (crossEntropy's contract). */
  def importanceWeights(raw: DataFrame, target: DataFrame, buckets: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val pT = bucketModel(target, buckets, textCol, idCol)
    val pQ = bucketModel(raw, buckets, textCol, idCol)
    val totT = pT.agg(sum(col("c")).as("tt"))
    val totQ = pQ.agg(sum(col("c")).as("tq"))
    val db = explodeGrams(raw, textCol, idCol)
      .groupBy(col(idCol), gramBucket(col("gram"), buckets).as("bucket"))
      .agg(count(lit(1)).as("__dc"))
    db.join(broadcast(pT.withColumnRenamed("c", "ct")), Seq("bucket"), "left")
      .join(broadcast(pQ.withColumnRenamed("c", "cq")), Seq("bucket"), "left")
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totQ))
      .groupBy(col(idCol))
      .agg(sum(col("__dc")).as("n_grams"),
        round(sum(col("__dc") *
          (log((coalesce(col("ct"), lit(0L)) + 1).cast("double")
              / (col("tt") + buckets))
            - log((coalesce(col("cq"), lit(0L)) + 1).cast("double")
              / (col("tq") + buckets)))), 6).as("log_weight"))
  }

  /** Deterministic Gumbel noise for a doc id: `−ln(−ln(u))` with
    * `u = (md5₂₈(id:salt) + 0.5) / 16⁷` — an exact binary fraction in
    * (0, 1), so the noise is finite and engine-portable. */
  def gumbelNoise(id: Column, salt: String = ""): Column = {
    val u = (conv(substring(md5(concat(id.cast("string"), lit(":" + salt))),
      1, 7), 16, 10).cast("double") + 0.5) / lit(268435456.0)
    -log(-log(u))
  }

  /** Gumbel top-k importance resampling: keep the `k` raw documents with
    * the largest `log_weight + Gumbel(id)` — a without-replacement sample
    * ∝ w(x) (the Gumbel-max trick), deterministic under `salt`. Returns
    * (idCol, n_grams, log_weight, score[round 6]) for the selected docs,
    * planned as TakeOrderedAndProject (distributed top-k, no per-query
    * window). */
  def resample(raw: DataFrame, target: DataFrame, k: Int, buckets: Int,
      textCol: String = "text", idCol: String = "doc_id",
      salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    importanceWeights(raw, target, buckets, textCol, idCol)
      .withColumn("score",
        round(col("log_weight") + gumbelNoise(col(idCol), salt), 6))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }
}
