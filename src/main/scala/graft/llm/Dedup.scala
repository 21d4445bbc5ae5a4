package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine — the standard near-dup ladder of a training-data
  * pipeline, each designed shuffle-minimal:
  *
  *  - exact: ONE shuffle on a 128-bit content hash (md5 — 64-bit hashes
  *    birthday-collide at billions of docs, 128-bit doesn't)
  *  - MinHash/SimHash signatures: pure per-row expressions (no UDF, no
  *    shuffle); candidate generation via band-bucket equality joins, so the
  *    only shuffles are on short band keys — never an O(N²) cross join
  *  - verification (exact Jaccard / hamming / cosine) runs only on the
  *    candidate pairs the banding emits
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup groups: one row per distinct content, with the minimum id
    * as the canonical representative and the duplicate count. */
  def exactGroups(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** The deduplicated dataset: keep the minimum-id row per content hash. */
  def exactDedup(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val keep = exactGroups(docs, textCol, idCol).select(col("keep_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  // -------------------------------------------------------------- MinHash

  /** Word `n`-shingles of a text column, as an array of strings — built with
    * transform/slice (codegen, no UDF). */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(lower(trim(text)), "\\s+")
    when(size(words) < n, array(concat_ws(" ", words)))
      .otherwise(transform(
        sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }

  /** K-element MinHash signature: sig_k = min over shingles of
    * xxhash64(shingle, k). One expression per k — all map-side. */
  def minHashSignature(text: Column, k: Int = 32, shingleN: Int = 3): Column = {
    val sh = array_distinct(shingles(text, shingleN))
    array((0 until k).map { i =>
      array_min(transform(sh, s => xxhash64(s, lit(i))))
    }: _*)
  }

  /** LSH band keys: the signature split into `bands` bands of `k/bands`
    * rows, each band hashed to one long. Docs sharing ANY band key are
    * near-dup candidates (standard MinHash-LSH banding). */
  def bandKeys(sig: Column, k: Int, bands: Int): Column = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",", slice(sig, b * r + 1, r)), lit(b)).as("bucket"))
    }: _*)
  }

  /** Exact Jaccard similarity of the two docs' distinct shingle sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(array_union(a, b))
    when(uni === 0, 0.0).otherwise(inter.cast("double") / uni)
  }

  /** MinHash-LSH near-duplicate pairs verified by exact shingle Jaccard.
    * Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.
    *
    * Plan shape: signature map → explode bands (×bands rows) → self-join on
    * (band, bucket) → distinct candidate pairs → Jaccard verify. Shuffles:
    * one on the band key, one distinct. No cross join anywhere. */
  def minHashNearDups(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 32, bands: Int = 8,
      threshold: Double = 0.7, shingleN: Int = 3): DataFrame = {
    val withSig = docs.select(
      col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleN)).as("sh"),
      minHashSignature(col(textCol), k, shingleN).as("sig"))
    val banded = withSig.select(col("id"), col("sh"),
      explode(bandKeys(col("sig"), k, bands)).as("bk"))
    val l = banded.select(col("id").as("id_a"), col("sh").as("sh_a"), col("bk"))
    val r = banded.select(col("id").as("id_b"), col("sh").as("sh_b"), col("bk"))
    val pairs = l.join(r, l("bk") === r("bk") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
    pairs.select(col("id_a"), col("id_b"),
      jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash of the token multiset: per bit, the sign of the sum of
    * ±1 votes from each token hash. 64 aggregate expressions over the token
    * array — map-side only, codegen'd, no explode, no shuffle. */
  def simHash(text: Column): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    val hashes = transform(tokens, t => xxhash64(t))
    val bits = (0 until 64).map { bit =>
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming ≤ maxDist, blocked on 4 16-bit
    * bands (pigeonhole: ≤3 flipped bits leave ≥1 band intact — exact recall
    * for maxDist ≤ 3, approximate above). */
  def simHashNearDups(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", maxDist: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL).as("bucket"))
      }: _*)).as("bk"))
    val l = banded.select(col("id").as("id_a"), col("sig").as("sig_a"), col("bk"))
    val r = banded.select(col("id").as("id_b"), col("sig").as("sig_b"), col("bk"))
    l.join(r, l("bk") === r("bk") && col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  // ------------------------------------------------- n-gram Jaccard (direct)

  /** Pairwise n-gram Jaccard for an explicit pair table — the verification
    * primitive, also usable standalone for small candidate sets. */
  def ngramJaccardPairs(pairs: DataFrame, textA: Column, textB: Column,
      n: Int = 3): Column =
    jaccard(array_distinct(shingles(textA, n)), array_distinct(shingles(textB, n)))

  // ---------------------------------------------- embedding cosine near-dup

  /** Embedding near-dup pairs: cosine ≥ threshold, blocked by
    * random-hyperplane LSH (see [[Similarity.hyperplaneSignature]]) so the
    * join key is a short bit signature, not an O(N²) cross join. */
  def embeddingNearDups(embs: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id", threshold: Double = 0.95,
      planes: Int = 16, bands: Int = 4): DataFrame = {
    val sigs = embs.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.hyperplaneSignature(col(vecCol), planes).as("sig"))
    val r0 = planes / bands
    val banded = sigs.select(col("id"), col("v"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * r0).bitwiseAND((1L << r0) - 1).as("bucket"))
      }: _*)).as("bk"))
    val l = banded.select(col("id").as("id_a"), col("v").as("v_a"), col("bk"))
    val r = banded.select(col("id").as("id_b"), col("v").as("v_b"), col("bk"))
    l.join(r, l("bk") === r("bk") && col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
