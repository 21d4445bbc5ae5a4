package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-query top-k — the shared final-rank stage of the
  * retrieval family ([[graft.llm.Similarity]], [[graft.llm.Pq]],
  * [[graft.llm.Corpus.bm25TopK]]).
  *
  * A bare `row_number().over(Window.partitionBy(query))` funnels each
  * query's ENTIRE scored candidate set into one shuffle partition and one
  * sort task — correct, but at a 10⁹-row corpus a single full-scan query
  * means 10⁹ rows through one task. This helper makes the rank two-phase
  * and EXACT:
  *
  *  1. map-side: sort each partition locally on (query, order…) — a
  *     partition-local sort, no exchange — then stream-keep the first `k`
  *     rows per query per partition (groups are contiguous after the
  *     sort, so the kernel is a counting filter with O(1) state);
  *  2. reduce-side: the classic per-query window over the ≤ k·P
  *     survivors (P = upstream partition count).
  *
  * The per-partition top-k is a superset of every query's global top-k,
  * so phase 2 returns exactly the single-window answer — same rows, same
  * ranks — provided `order` is a TOTAL order per query (every call site
  * follows the cross-engine convention: rounded score + id tiebreak).
  * The exchange between the phases carries k·P rows per query instead of
  * the full candidate set, and the final sort task per query handles
  * k·P rows instead of the corpus.
  */
object TopK {

  /** Rank `scored` per `queryCol` by `order`, keep rows with rank ≤ `k`
    * in `rankCol` (1-based, dense by construction since `order` is total).
    * Exact — bit-identical to the single-window formulation. */
  def topKPerQuery(scored: DataFrame, queryCol: String, order: Seq[Column],
      k: Int, rankCol: String = "rank"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(order.nonEmpty, "order columns required")
    // phase 1: partition-local sort (global = false → no exchange), then a
    // streaming counting filter over the now-contiguous query groups
    val localSorted = scored.sortWithinPartitions(col(queryCol) +: order: _*)
    val qIdx = localSorted.schema.fieldIndex(queryCol)
    val pruned = localSorted.mapPartitions { it =>
      var cur: Any = null
      var started = false
      var n = 0
      it.filter { r: Row =>
        val q = r.get(qIdx)
        if (!started || !java.util.Objects.equals(q, cur)) {
          started = true; cur = q; n = 0
        }
        n += 1
        n <= k
      }
    }(Encoders.row(localSorted.schema))
    // phase 2: the classic window, now over ≤ k·P survivors per query
    val w = Window.partitionBy(col(queryCol)).orderBy(order: _*)
    pruned.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}
