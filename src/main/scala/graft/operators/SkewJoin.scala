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
    * Probe-side salt is `xxhash64` over `saltCols` (default: every fact
    * column), so it is a pure function of row content — deterministic,
    * partitioning-invariant, and stable across stage retries, which keeps
    * Spark's shuffle reuse intact (a `rand()`/`monotonically_increasing_id`
    * salt would re-derive differently on retry — the same reason
    * [[graft.llm.Sampling.hashUniform]] rejects `rand()`). Identical rows
    * land on the same salt — a hot key whose rows are content-identical
    * gets NO spread from the default salt; pass a high-cardinality id in
    * `saltCols` whenever the fact table carries exact duplicate rows you
    * want spread. Map-typed columns are excluded from the default salt
    * input (`xxhash64` rejects `MapType` at analysis); explicitly passing
    * a map column in `saltCols` still fails fast with Spark's own error. */
  /** The deterministic salt assignment [[saltedJoin]] applies to the fact
    * side — exposed so harness decompositions (per-(key, salt) volume
    * counters) derive the spread from the SAME expression the join uses
    * and cannot drift from it. */
  def saltExpr(saltInput: Seq[Column], salts: Int): Column =
    pmod(xxhash64(saltInput: _*), lit(salts)).cast("int")

  def saltedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, salts: Int = 8,
      joinType: String = "inner", saltCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    // the salting construction is only correct fact-side-preserving:
    // 'right'/'full' would emit each unmatched dim row `salts` times, and
    // semi/anti variants are wrong as well
    require(Set("inner", "left", "leftouter")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    // default salt input = every *hashable* fact column: xxhash64 fails
    // analysis on MapType (even nested inside struct/array), so those are
    // filtered out of the default; an explicit saltCols is passed verbatim
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val defaultSaltCols = fact.schema.fields
      .filter(f => hashable(f.dataType)).map(_.name).toSeq
    require(saltCols.nonEmpty || defaultSaltCols.nonEmpty,
      "saltedJoin: no hashable fact columns for the default salt; pass saltCols")
    val saltInput = (if (saltCols.nonEmpty) saltCols else defaultSaltCols)
      .map(c => col(s"`$c`"))
    val salted = fact.withColumn("__salt", saltExpr(saltInput, salts))
    // spread the dim BEFORE replicating: the explode multiplies each scan
    // partition `salts`-fold, and a dim read in few file splits would do
    // all of that in one or two tasks (measured: a 1.5M-row dim in one
    // split exploding 32x = a 7.5 s straggler against a 42 ms median).
    // One cheap pre-shuffle of the un-replicated dim rebalances the
    // replication work across the cluster.
    val nShuffle = dim.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val replicated = dim.repartition(nShuffle)
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated,
      salted(s"`$factKey`") === replicated(s"`$dimKey`") &&
        salted("__salt") === replicated("__salt"),
      joinType)
      .drop("__salt")
  }
}
