package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * splitting isn't available (e.g. a non-shuffle-join path or a stubborn
  * heavy hitter): the build side replicates `salts` times, the probe side
  * salts each row deterministically, and the join key becomes
  * (key, salt) — a single hot key spreads over `salts` tasks.
  *
  * Use for fact⋈dim joins where one FK value dominates (an image with
  * millions of annotations, a user with most of the events). Costs
  * `salts`× the build side — keep the build side the small one.
  */
object SkewJoin {

  /** Inner/left join `fact` with `dim` on `factKey === dimKey`, salted.
    * Probe-side salt is hash-derived from the whole row's key + a rotating
    * component so it is deterministic and partitioning-invariant. */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, salts: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // the salting construction is only correct fact-side-preserving:
    // 'right'/'full' would emit each unmatched dim row `salts` times, and
    // semi/anti variants are wrong as well
    require(Set("inner", "left", "leftouter")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(s"`$factKey`"), monotonically_increasing_id()), lit(salts))
        .cast("int"))
    val replicated = dim
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated,
      salted(s"`$factKey`") === replicated(s"`$dimKey`") &&
        salted("__salt") === replicated("__salt"),
      joinType)
      .drop("__salt")
  }
}
