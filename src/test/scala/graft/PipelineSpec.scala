package graft

import org.apache.spark.sql.functions._

/** Structural + budget locks for the full corpus-build chain (q192 — the
  * DuckDB oracle verifies VALUES; this spec locks the properties a value
  * compare can't see). */
class PipelineSpec extends SparkFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("corpus-build chain: structure, plants consumed, work budget") {
    // WORK BUDGET (round 11, replacing the absolute wall tripwire): the
    // composition-only failure class — a dropped stage fence re-running
    // interpreted lambdas per downstream signal (the q123 lesson) —
    // multiplies EXECUTED TASKS, not just seconds, so count tasks via a
    // listener: load-insensitive where the old `wall < 120 s` assert
    // could fail on a saturated CI box with no regression at all. The
    // chain runs ~2.3k tasks at sf0.001 with 32 shuffle partitions; the
    // 4x headroom covers AQE plan wobble, never a fencing regression
    // (which multiplied work ~10x when it last happened).
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val out =
      try graft.queries.PipelineQueries.corpusBuildChain(spark, dir).collect()
      finally {
        Thread.sleep(500) // listener events post async — let the bus drain
        spark.sparkContext.removeSparkListener(listener)
      }
    val wall = (System.nanoTime() - t0) / 1e9
    assert(out.nonEmpty, "chain produced an empty corpus")
    assert(tasks.get() < 10000,
      s"chain executed ${tasks.get()} tasks at sf0.001 — stage fencing regressed?")
    // the absolute wall budget stays available for idle-box runs, opt-in
    if (sys.env.get("GRAFT_ENFORCE_WALL").contains("1"))
      assert(wall < 120.0, f"chain took $wall%.1f s at sf0.001")
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
