package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic sampling and mixture operators for training-data
  * curation — the "take 2% of CommonCrawl, 30% of code, cap books at 10B
  * tokens" step of assembling an LLM training mix.
  *
  * Every decision is keyed on an md5-derived uniform of the row's id:
  * partition-invariant, seed-stable (change `salt` for an independent
  * redraw), engine-portable (the DuckDB oracles recompute identical
  * decisions bit-for-bit), and pure map-side. A `rand()` sample is none
  * of those — it changes under retries, task re-execution, AQE re-plans,
  * and cluster size, which is disqualifying for reproducible 100-TB runs.
  */
object Sampling {

  /** Uniform in [0, 1) from the first 7 hex nibbles of
    * md5(key ':' salt) — 28 bits of resolution. The value is k/16^7, an
    * exact binary fraction, so cross-engine comparisons are byte-exact. */
  def hashUniform(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 7), 16, 10)
      .cast("double") / lit(268435456.0) // 16^7

  /** Deterministic Bernoulli sample: keep iff hashUniform(key) < fraction.
    * A pure filter over the scan — no shuffle, no RNG state, no driver
    * action; co-sampling two tables on the same key keeps them aligned. */
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(hashUniform(keyCol, salt) < fraction)

  /** Weighted EXACT-k sample without replacement (Efraimidis–Spirakis
    * 2006, exponential-race formulation): each row draws a deterministic
    * uniform from its key and competes with arrival time `e = −ln(u)/w`;
    * the k smallest win — inclusion odds scale with `weight` (the
    * quality-weighted / length-weighted corpus subsample), yet the draw
    * is pure content hashing: no RNG state, retry-stable, co-sampling
    * aligned across tables. Rows with null or non-positive weight are
    * excluded. `e` is rounded to 12 decimals with a key tiebreak so the
    * selection is a total order any engine reproduces: the rounding
    * absorbs cross-engine `ln` ulp drift (relative ~1e-16, so absolute
    * ≲ 1e-15 even at the e ≈ 19 extreme) while keeping weights
    * meaningful up to ~1e10 — beyond that, race keys quantize toward 0
    * and selection degrades to the key tiebreak, so rescale weights
    * (only their RATIOS matter to the race) before calling.
    *
    * WEIGHT-MAGNITUDE CONTRACT, quantified (round 11). Cross-engine
    * disagreement: a row can round into a different 1e-12 bucket on
    * another engine only when its key sits within ln-drift of a bucket
    * edge — probability ≈ e·1e-16 / 1e-12 = e·1e-4. Since e is
    * exponential with mean 1/w, the EXPECTED disagreeing fraction is
    * ≈ 1e-4/w per unit weight (~1e-4 of rows at w = 1, ~1e-10 at
    * w = 1e6; the single worst-case row, e ≈ 19, disagrees with
    * p ≈ 2e-3) — billion-row cross-engine replays should therefore
    * keep weights ≥ ~1e2, where the expected disagreements stay ≪ 1.
    * Magnitude ceiling: keys are ≤ 19.9/w, so past w ≈ 1e10 the race
    * has only ~19.9/(w·1e-12) representable key values left (ties
    * multiply), and at w ≳ 2e13 EVERY key rounds to 0.0 — selection is
    * still deterministic per engine but degrades to the pure key
    * tiebreak, ignoring weight ratios entirely (boundary-spec-locked in
    * SamplingSpec). Only RATIOS matter to the
    * race, so normalize extreme weights into ~[1e2, 1e10] before
    * calling; u (a pure key hash) and therefore the kept set at equal
    * ratios is unchanged by rescaling.
    *
    * Plan: `TakeOrderedAndProject` (per-partition k-heaps, driver merges
    * P heads) — the corpus never sorts or shuffles, same as
    * [[sampleExactK]]. */
  def sampleWeightedK(df: DataFrame, keyCol: Column, weight: Column, k: Int,
      salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // +0.5 keeps u strictly inside (0,1): u=0 would make −ln(u) infinite
    val u = (conv(substring(md5(concat(keyCol.cast("string"),
      lit(":" + salt))), 1, 7), 16, 10).cast("double") + 0.5) / 268435456.0
    val e = round(-log(u) / weight.cast("double"), 12)
    df.filter(weight.isNotNull && weight.cast("double") > 0)
      .withColumn("__e", e)
      .orderBy(col("__e"), keyCol)
      .limit(k)
      .drop("__e")
  }

  /** Leakage-safe split by GROUP (sklearn's GroupShuffleSplit shape, at
    * corpus scale): every row of a group lands in the SAME split, so
    * near-identical documents from one domain/site/session can never
    * straddle train and eval — the document-level analogue of the image
    * splitter's keep-separate contract, and the standard guard against
    * the train→test leakage that per-ROW splitting bakes into web
    * corpora. Splits are assigned by the group key's hash uniform against
    * cumulative `shares` (must sum to ~1), so the assignment is a pure
    * map over the scan: no shuffle, no group table, no driver state,
    * identical at any partition count, and stable under corpus growth
    * (new rows of a known group join its split; only genuinely new
    * groups draw fresh assignments). Adds `split`. */
  def groupHoldout(df: DataFrame, groupCol: Column,
      shares: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(shares.nonEmpty, "no shares")
    require(shares.forall(_._2 >= 0), s"negative share in $shares")
    val tot = shares.map(_._2).sum
    require(math.abs(tot - 1.0) < 1e-6, s"shares must sum to 1, got $tot")
    val u = hashUniform(groupCol, salt)
    val cum = shares.scanLeft(0.0)(_ + _._2).tail
    // last split takes the remainder so float edges can't drop a group
    val expr = shares.init.zip(cum.init).reverse.foldLeft(
      lit(shares.last._1)) { case (acc, ((name, _), hi)) =>
      when(u < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Per-stratum deterministic rates (e.g. per-source keep fractions).
    * Strata absent from `rates` fall back to `defaultRate`. Still a pure
    * filter — the rate lookup is a literal CASE chain, not a join. */
  def stratifiedSample(df: DataFrame, strata: Column,
      rates: Map[String, Double], keyCol: Column, salt: String = "",
      defaultRate: Double = 0.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(strata === k, lit(v)).otherwise(acc)
    }
    df.filter(hashUniform(keyCol, salt) < rate)
  }

  /** Deterministic EXACT-k uniform sample without replacement — the
    * corpus-scale replacement for reservoir sampling: rank every row by
    * its [[hashUniform]] key and keep the k smallest (a uniform k-subset,
    * since the hash order is a uniform permutation of distinct keys).
    * Unlike [[hashSample]] (exact RATE, binomial count) this pins the
    * COUNT exactly — eval-set carving, fixed-size audits, "give me
    * exactly 10k docs".
    *
    * Plan: `orderBy(u).limit(k)` = `TakeOrderedAndProject` — each scan
    * partition keeps a k-element heap, the driver merges P heads; the
    * corpus is never globally sorted and never shuffles. Deterministic in
    * the key (ties broken by the key itself), so retries and re-runs
    * agree, and k rows must fit on the driver by contract. */
  def sampleExactK(df: DataFrame, keyCol: Column, k: Int,
      salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    df.withColumn("__u", hashUniform(keyCol, salt))
      .orderBy(col("__u"), keyCol)
      .limit(k)
      .drop("__u")
  }

  /** EXACT-k per GROUP — a fixed quota from every stratum (per-language
    * eval slices, per-source audit samples), where
    * [[stratifiedSample]]'s rates give only expected counts. Routed
    * through the shared two-phase top-k
    * ([[graft.operators.TopK.topKPerQuery]]): each scan partition prunes
    * to ≤ k rows per group map-side, so the group shuffle carries ≤ k·P
    * rows per group — a mega-group never funnels its full membership into
    * one sort task. Output stays distributed (k rows per group, any
    * number of groups). */
  def sampleExactKPerGroup(df: DataFrame, groupCol: String, keyCol: Column,
      k: Int, salt: String = ""): DataFrame =
    graft.operators.TopK.topKPerQuery(
        df.withColumn("__u", hashUniform(keyCol, salt)), groupCol,
        Seq(col("__u"), keyCol), k, rankCol = "__rank")
      .drop("__u", "__rank")

  /** EXACT token-budget mixture: per source, take documents in
    * deterministic hash-shuffled order (u, id) until the running token
    * total reaches the source's budget. A document is kept iff the total
    * BEFORE it is under budget, so the first overshooting document is
    * included and every non-empty source with a positive budget emits at
    * least one document. Sources without a budget entry are dropped.
    *
    * Plan: the DISTRIBUTED prefix sum
    * ([[graft.operators.PrefixSum.groupedRunningSum]]) — range-partition
    * on (source, u, id), per-partition sums chained into ≤ P−1 broadcast
    * boundary offsets, partition-local window. A single source owning the
    * whole corpus spreads across all partitions (the `skew_exact_mixture`
    * and `pack_mega_source` probes); no per-source window exists anywhere
    * in this path since round 10. Prefer [[mixtureByRate]] only when even
    * one exact-bookkeeping pass is too much: it is a pure map over the
    * scan (one map-side-combined totals agg + a broadcast join — no
    * repartition pass at all) and fills the same budgets in expectation
    * rather than exactly. */
  def tokenBudgetMixture(docs: DataFrame, tokenCol: Column,
      budgets: Map[String, Long], sourceCol: String = "source",
      idCol: String = "doc_id", salt: String = "",
      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    // EXACT per-source cumsum in the deterministic (hash, id) order via
    // the distributed prefix sum (round 10) — previously a per-source
    // Window, which serialized a dominant source's whole stream into one
    // sort task; [[mixtureByRate]] remains the windowless expected-value
    // variant for when even one pass of exact bookkeeping is too much.
    // Same integer arithmetic, same kept set (spec/oracle-locked).
    graft.operators.PrefixSum.groupedRunningSum(
        docs.withColumn("__u", hashUniform(col(idCol), salt)),
        sourceCol, Seq("__u", idCol), tokenCol, "__cum", storage)
      .filter(col("__cum") - tokenCol < budget)
      .drop("__u", "__cum")
  }

  /** RATE-based mixture — the 100-TB path: one map-side-combined aggregate
    * computes each source's total tokens; keep-rate = min(1, budget/total);
    * documents filter on hashUniform < rate. No window, no per-source
    * sequential scan — the totals frame (one row per source) broadcasts.
    * Budget fill is expected-value rather than exact: the hash order makes
    * any uniform-threshold prefix an unbiased sample, with relative error
    * O(1/√n_kept) — negligible at the scales where this variant matters. */
  def mixtureByRate(docs: DataFrame, tokenCol: Column,
      budgets: Map[String, Long], sourceCol: String = "source",
      idCol: String = "doc_id", salt: String = ""): DataFrame = {
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    val totals = docs.groupBy(col(sourceCol))
      .agg(sum(tokenCol).as("__tot"))
    docs.join(broadcast(totals), Seq(sourceCol))
      .withColumn("__rate",
        least(lit(1.0), budget.cast("double") / col("__tot")))
      .filter(hashUniform(col(idCol), salt) < col("__rate"))
      .drop("__tot", "__rate")
  }

  /** Deterministic class rebalancing to EXACTLY `targetPerLabel` rows per
    * label: every row gets `target div n` copies, and the first
    * `target mod n` rows of the label's md5 order get one more — so
    * under-represented labels oversample (copy_idx marks the replicas)
    * and over-represented ones keep their md5-top `target` rows. Exact by
    * construction (Σ copies = target for every label), deterministic on
    * any partitioning.
    *
    * Plan: a broadcast per-label count join + the two-phase per-key rank
    * ([[graft.operators.TopK.topKPerQuery]]) + a sequence explode bounded
    * by the replication factor. Every SURVIVING row has rank ≤ target —
    * under-represented labels (n ≤ target) keep all n ≤ target rows,
    * over-represented ones exactly their md5-top `target` — so the rank is
    * a per-label top-`target` question: each scan partition prunes to
    * ≤ target rows per label map-side and a label owning 80% of the input
    * never funnels its membership through one sort task (the r9 verdict's
    * remaining-window note, closed the same way as `perDomainCap`). */
  def balanceLabels(df: DataFrame, labelCol: String, targetPerLabel: Long,
      idCol: String = "vec_id", salt: String = ""): DataFrame = {
    require(targetPerLabel > 0, s"targetPerLabel must be positive: $targetPerLabel")
    require(targetPerLabel <= Int.MaxValue,
      s"targetPerLabel exceeds the rank budget: $targetPerLabel")
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("__n"))
    graft.operators.TopK.topKPerQuery(
        df.join(broadcast(counts), Seq(labelCol)), labelCol,
        Seq(md5(concat(col(idCol).cast("string"), lit(":" + salt))).asc,
          col(idCol).asc),
        targetPerLabel.toInt, rankCol = "__rk1")
      .withColumn("__rk", col("__rk1").cast("long") - 1)
      .withColumn("__copies",
        expr(s"$targetPerLabel div __n") +
          when(col("__rk") < lit(targetPerLabel) % col("__n"), 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__n", "__rk1", "__rk", "__copies")
  }

  /** Deterministic epoch shuffle + round-robin sharding — training-order
    * assembly: `epoch_rank` = the row's position in the `md5(id:epoch)`
    * order (range-partitioned sort + zipWithIndex, the dense-id path — no
    * single-partition window at any scale), `shard` = rank mod
    * `numShards` (balanced by construction, |shard sizes| differ by ≤1).
    * Same (corpus, epoch) → same order on any cluster, any partitioning;
    * bump `epoch` for a fresh order. Feed shards to
    * [[graft.io.WebDataset.toWebDataset]] (or any sink) for reproducible
    * training runs. */
  /** UniMax language-budget allocation (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining"): split a total token budget across
    * languages so that no language repeats more than `maxEpochs` times,
    * and whatever a capped (low-resource) language cannot absorb is
    * shared EQUALLY among the remaining (larger) languages — the
    * published waterfilling recipe that replaces ad-hoc temperature
    * sampling.
    *
    * Closed form (bit-reproducible, no iterative float drift): sort
    * languages by cap `c_l = maxEpochs · n_l` ascending; language `l` (at
    * ascending rank i of L) is FULLY allocated its cap iff
    * `c_i ≤ (B − Σ_{j<i} c_j) / (L − i + 1)`; caps are monotone, so the
    * fully-capped set is a prefix, and every language after the prefix
    * receives the constant water level `(B − Σ_prefix c_j) / (L − k)`.
    * With `maxEpochs` exactly representable (0.5/1/2/4…) and integer
    * token counts, every comparison is over exact doubles and the single
    * final division is the only rounding site — the DuckDB oracle replays
    * it digit-for-digit.
    *
    * `perLangTokens` is the per-language aggregate (langCol, tokensCol) —
    * languages number in the hundreds at most, so the closed form runs on
    * the driver (the splitter's documented driver-sized pattern). Returns
    * (lang, n_tokens, cap, alloc_tokens, epochs[round 6]). If the budget
    * exceeds Σ caps, every language is capped and the leftover stays
    * unallocated (UniMax's contract: never exceed maxEpochs). */
  def uniMaxAllocation(perLangTokens: DataFrame, totalBudget: Long,
      maxEpochs: Double, langCol: String = "lang",
      tokensCol: String = "n_tokens"): DataFrame = {
    require(totalBudget > 0, s"budget must be positive: $totalBudget")
    require(maxEpochs > 0, s"maxEpochs must be positive: $maxEpochs")
    val spark = perLangTokens.sparkSession
    val langs = perLangTokens
      .select(col(langCol).cast("string"), col(tokensCol).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (l, n) => (maxEpochs * n, l) }
    require(langs.forall(_._2 > 0),
      s"zero-token language(s): ${langs.filter(_._2 <= 0).map(_._1).mkString(",")}")
    val caps = langs.map { case (_, n) => maxEpochs * n }
    val cumBefore = caps.scanLeft(0.0)(_ + _) // exact: integers × maxEpochs
    val L = langs.length
    // longest prefix whose caps fit under the running water level
    var k = 0
    while (k < L && caps(k) <= (totalBudget - cumBefore(k)) / (L - k)) k += 1
    val level = if (k < L) (totalBudget - cumBefore(k)) / (L - k) else 0.0
    // HALF_UP at 6 decimals — what Spark's round() and DuckDB's round()
    // both do for positive doubles (rint would tie-to-even and diverge)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = langs.zipWithIndex.map { case ((l, n), i) =>
      val alloc = if (i < k) caps(i) else level
      (l, n, caps(i), r6(alloc), r6(alloc / n))
    }
    import spark.implicits._
    rows.toSeq.toDF(langCol, tokensCol, "cap", "alloc_tokens", "epochs")
  }

  /** Temperature-based language-budget allocation — the pre-UniMax
    * baseline (multilingual BERT / XLM-R convention): sampling share
    * `q_l ∝ n_l^α` (α = 1/T; α = 1 is proportional, α → 0 uniform),
    * allocation `B·q_l`. Kept alongside [[uniMaxAllocation]] because it
    * is what most published mixtures still specify — and because its
    * failure mode (no epoch cap: a low-resource language can be assigned
    * many times its own token count) is exactly what UniMax fixes; the
    * `epochs` column makes that overshoot visible.
    *
    * Determinism contract (same as uniMax): driver-sized per-language
    * table, the normalizer Σ n^α accumulated in ASCENDING language order
    * (binary string order — DuckDB's ordered aggregate replays it), and
    * `α = 0.5` computes via `sqrt` (IEEE-exact in every engine) rather
    * than `pow`. Emits (lang, n_tokens, share[round 6],
    * alloc_tokens[round 6], epochs[round 6]). */
  def temperatureAllocation(perLangTokens: DataFrame, totalBudget: Long,
      alpha: Double = 0.5, langCol: String = "lang",
      tokensCol: String = "n_tokens"): DataFrame = {
    require(totalBudget > 0, s"budget must be positive: $totalBudget")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    val spark = perLangTokens.sparkSession
    val langs = perLangTokens
      .select(col(langCol).cast("string"), col(tokensCol).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    require(langs.forall(_._2 > 0),
      s"zero-token language(s): ${langs.filter(_._2 <= 0).map(_._1).mkString(",")}")
    def p(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble)
      else if (alpha == 1.0) n.toDouble
      else math.pow(n.toDouble, alpha)
    var z = 0.0
    langs.foreach { case (_, n) => z += p(n) } // ascending-lang order
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = langs.map { case (l, n) =>
      val share = p(n) / z
      val alloc = totalBudget * share
      (l, n, r6(share), r6(alloc), r6(alloc / n))
    }
    import spark.implicits._
    rows.toSeq.toDF(langCol, tokensCol, "share", "alloc_tokens", "epochs")
  }

  /** Length-bucketed batching profile — the padding-waste accounting
    * behind bucketed batch assembly (group similar-length sequences so a
    * batch pads to its own max, not the corpus max): assign each document
    * to the first bucket whose upper `boundary` its token count fits
    * (counts past the last boundary land in an overflow bucket), then per
    * bucket report size, observed max, token sum, and the padding waste a
    * per-bucket batcher would pay — `n·max − Σlen`, which needs only
    * aggregates (no window, no second pass). `waste_share` is waste over
    * padded volume (`n·max`).
    *
    * One when-chain map + one partial-agg groupBy over ≤ |boundaries|+1
    * keys — scan-bound at any corpus size. Returns (bucket, bound,
    * n_docs, max_tokens, sum_tokens, waste, waste_share[round 6]). */
  def lengthBucketProfile(docs: DataFrame, boundaries: Seq[Int],
      tokens: Column): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
      boundaries.distinct == boundaries, "boundaries must be sorted, distinct")
    val t = tokens.cast("long")
    val bucket = boundaries.zipWithIndex.foldRight(
        lit(boundaries.length).as("bucket")) { case ((b, i), acc) =>
      when(t <= b, lit(i)).otherwise(acc).as("bucket")
    }
    // overflow bucket's bound is -1 ("unbounded")
    val bound = boundaries.zipWithIndex.foldRight(
        lit(-1L)) { case ((b, _), acc) =>
      when(t <= b, lit(b.toLong)).otherwise(acc)
    }
    docs.select(bucket.cast("long").as("bucket"), bound.as("bound"), t.as("__t"))
      .groupBy(col("bucket"), col("bound"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("__t")).as("max_tokens"),
        sum(col("__t")).as("sum_tokens"))
      .withColumn("waste", col("n_docs") * col("max_tokens") - col("sum_tokens"))
      .withColumn("waste_share",
        when(col("n_docs") * col("max_tokens") === 0, 0.0)
          .otherwise(round(col("waste").cast("double") /
            (col("n_docs") * col("max_tokens")).cast("double"), 6)))
  }

  def epochShuffle(docs: DataFrame, numShards: Int, epoch: Long = 0,
      idCol: String = "doc_id"): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val withU = docs.withColumn("__es_u",
      md5(concat(col(idCol).cast("string"), lit(s":epoch$epoch"))))
    graft.operators.Ids.denseIds(withU, Seq("__es_u", idCol), 0L, "epoch_rank")
      .withColumn("shard", pmod(col("epoch_rank"), lit(numShards.toLong)))
      .drop("__es_u")
  }
}
