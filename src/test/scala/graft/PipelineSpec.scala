package graft

import org.apache.spark.sql.functions._

/** Structural + budget locks for the full corpus-build chain (q192 — the
  * DuckDB oracle verifies VALUES; this spec locks the properties a value
  * compare can't see). */
class PipelineSpec extends SparkFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("corpus-build chain: structure, plants consumed, wall budget") {
    val t0 = System.nanoTime()
    val out = graft.queries.PipelineQueries.corpusBuildChain(spark, dir)
      .collect()
    val wall = (System.nanoTime() - t0) / 1e9
    assert(out.nonEmpty, "chain produced an empty corpus")
    // WALL BUDGET: the whole 14-stage chain at sf0.001 runs in ~15 s warm;
    // the budget is the tripwire for the composition-only failure class —
    // a dropped stage fence re-running interpreted lambdas per downstream
    // signal showed up as ~10x before (the q123 lesson), which this bound
    // catches with room for a cold JVM and a loaded box.
    assert(wall < 120.0, f"chain took $wall%.1f s at sf0.001 — stage fencing regressed?")
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "duplicate doc_ids in output")
    // every planted exact copy (id >= 2000000) must fall to minhash dedup
    assert(!ids.exists(_ >= 2000000L), "a planted near-dup copy survived")
    // shards are the mod-8 partition of the dense epoch rank
    out.foreach { r =>
      assert(r.getAs[Long]("shard") == r.getAs[Long]("epoch_rank") % 8)
      assert(r.getAs[Long]("stream_start") >= 0L)
      assert(r.getAs[Long]("pack_id") == r.getAs[Long]("stream_start") / 512)
    }
    // the mixture budgets bound every source's token mass: a source's
    // total may overshoot its budget only by its last (straddling) doc
    val bySource = out.groupBy(_.getAs[String]("source"))
    val budgets = graft.queries.PipelineQueries.e2eBudgets.toMap
    bySource.foreach { case (src, rows) =>
      val total = rows.map(_.getAs[Long]("n_tokens")).sum
      val maxDoc = rows.map(_.getAs[Long]("n_tokens")).max
      assert(total - maxDoc < budgets(src),
        s"$src exceeded its token budget beyond the straddle rule")
    }
  }

}
