package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase per-query top-k must be bit-identical to the
  * single-window formulation it replaced, and its plan must carry the
  * map-side rank stage (local sort + streaming per-partition prune)
  * BEFORE the per-query window — the shape that keeps a query's full
  * candidate set out of any single sort task. */
class TopKSpec extends SparkFunSuite {
  import spark.implicits._

  private def candidates(nQueries: Int, nRows: Int) = {
    // deterministic scores with heavy ties at every value so the k
    // boundary is exercised: score = (i % 7), tiebreak on id
    (0 until nQueries).flatMap { q =>
      (0 until nRows).map(i => (q.toLong, i.toLong, (i % 7).toDouble))
    }.toDF("query_id", "neighbor_id", "score")
      .repartition(11) // many partitions → phase 1 prunes per partition
  }

  test("topKPerQuery equals the single-window top-k, ties included") {
    val scored = candidates(nQueries = 5, nRows = 200)
    val order = Seq(desc("score"), col("neighbor_id"))
    val got = graft.operators.TopK.topKPerQuery(scored, "query_id", order, 10)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val w = Window.partitionBy("query_id").orderBy(order: _*)
    val want = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("topKPerQuery: k larger than any candidate set returns everything") {
    val scored = candidates(nQueries = 3, nRows = 17)
    val out = graft.operators.TopK.topKPerQuery(scored, "query_id",
      Seq(desc("score"), col("neighbor_id")), 1000)
    assert(out.count() == 3 * 17)
    // ranks are dense 1..17 per query
    val ranks = out.filter(col("query_id") === 1)
      .select("rank").collect().map(_.getInt(0)).sorted
    assert(ranks.toSeq == (1 to 17))
  }

  test("topKPerQuery handles null query ids and ascending order") {
    val scored = Seq(
      (Some(1L), 10L, 3.0), (Some(1L), 11L, 1.0), (Some(1L), 12L, 2.0),
      (None, 20L, 5.0), (None, 21L, 4.0))
      .toDF("query_id", "neighbor_id", "score").repartition(4)
    val out = graft.operators.TopK.topKPerQuery(scored, "query_id",
        Seq(col("score").asc, col("neighbor_id")), 2)
      .collect().map(r => (Option(r.get(0)), r.getLong(1), r.getInt(3))).toSet
    assert(out == Set(
      (Some(1L), 11L, 1), (Some(1L), 12L, 2),
      (None, 21L, 1), (None, 20L, 2)))
  }

  test("plan: map-side rank stage (local sort + prune) precedes the window") {
    val scored = candidates(nQueries = 2, nRows = 50)
    val plan = graft.operators.TopK.topKPerQuery(scored, "query_id",
      Seq(desc("score"), col("neighbor_id")), 5)
      .queryExecution.executedPlan.toString
    // phase 1's partition-local sort: Sort [...], false (global = false)
    assert(plan.contains("], false, 0"), s"local sort missing from:\n$plan")
    // the streaming prune runs as a map-partitions object kernel
    assert(plan.contains("MapPartitions"), s"map-side prune missing from:\n$plan")
    // phase 2 is still the per-query window
    assert(plan.contains("Window"), s"final window missing from:\n$plan")
  }

  test("retrieval family routes through the two-phase rank") {
    // representative face: bruteForceTopK's plan must carry the map-side
    // prune — a regression to the bare window would drop MapPartitions
    val corpus = (0L until 100L)
      .map(i => (i, Array.tabulate(8)(d => (i % 13 + d).toFloat)))
      .toDF("vec_id", "embedding").repartition(7)
    val queries = corpus.limit(3)
    val df = graft.llm.Similarity.bruteForceTopK(corpus, queries, k = 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"), s"two-phase rank missing from:\n$plan")
    assert(df.count() == 12)
  }
}
