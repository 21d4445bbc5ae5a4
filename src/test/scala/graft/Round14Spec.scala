package graft

import org.apache.spark.sql.functions._

/** Round-14 regression locks: the broadcast-guard estimator shape check,
  * the last raw query-contract hints routed through the guard
  * (adcRerankTopK's shortlist, bloomCrossDedup's back-broadcasts), the
  * MinHash sidecar's meta-before-data write order, and the plant guard
  * over int-typed id columns. */
class Round14Spec extends SparkFunSuite {

  test("broadcastIfSmall: a narrower estimator is refused; equal/wider shapes pass") {
    import spark.implicits._
    val wide = Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("id", "s", "x")
    val narrow = wide.select("id")
    // the classic mistake: estimating a wide frame with its key projection
    // under-counts bytes and silently keeps a throwable hint
    val e = intercept[IllegalArgumentException] {
      graft.model.GraftDataset.broadcastIfSmall(wide, estimator = narrow)
    }
    assert(e.getMessage.contains("narrower"))
    // equal-width and wider estimators are valid upper bounds
    assert(graft.model.GraftDataset
      .broadcastIfSmall(wide, estimator = wide).count() == 2)
    assert(graft.model.GraftDataset
      .broadcastIfSmall(narrow, estimator = wide).count() == 2)
  }

  test("adcRerankTopK: shortlist hint is size-guarded — over-threshold the whole chain degrades") {
    import spark.implicits._
    val embs = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 5 + d * 11) % 23).toFloat)))
      .toDF("vec_id", "embedding")
    val cbs = (0 until 4).map(j =>
      Seq(Array.tabulate(2)(x => j * 2.0 + x), Array.tabulate(2)(x => 20.0 - j - x)))
    val enc = graft.llm.Pq.encode(embs, cbs)
    val queries = embs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def rerank() = graft.llm.Pq.adcRerankTopK(enc, queries, embs, cbs,
      shortlist = 10, k = 5)
    val expected = rerank().orderBy("query_id", "rank").collect().toSeq
    spark.conf.set("graft.broadcast.maxBytes", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val degraded = rerank()
      val plan = degraded.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"shortlist/query hint still forced over threshold:\n$plan")
      // degraded ≠ broken: same rows through the shuffle-join path
      assert(degraded.orderBy("query_id", "rank").collect().toSeq == expected)
    } finally {
      spark.conf.unset("graft.broadcast.maxBytes")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
    // at defaults the shortlist rides a broadcast hash join again
    val planDefault = rerank().queryExecution.executedPlan.toString
    assert(planDefault.contains("BroadcastHashJoin"),
      s"default-scale rerank lost its broadcast hints:\n$planDefault")
  }

  test("bloomCrossDedup: back-broadcasts are size-guarded — over-threshold degrades, result identical") {
    import spark.implicits._
    val ref = Seq((100L, "shared text body one"), (101L, "ref only text"))
      .toDF("doc_id", "text")
    val batch = Seq((1L, "shared text body one"), (2L, "fresh batch text"),
      (3L, "another fresh one")).toDF("doc_id", "text")
    val bloom = graft.llm.Dedup.buildFingerprintBloom(ref,
      expectedItems = 100, fpp = 0.01)
    def run() = graft.llm.Dedup.bloomCrossDedup(batch, ref, bloom)
    val expected = run().select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(expected == Seq(2L, 3L))
    spark.conf.set("graft.broadcast.maxBytes", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val degraded = run()
      val plan = degraded.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"bloomCrossDedup still forces a broadcast over threshold:\n$plan")
      assert(degraded.select("doc_id").orderBy("doc_id")
        .collect().map(_.getLong(0)).toSeq == expected)
    } finally {
      spark.conf.unset("graft.broadcast.maxBytes")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("minhash store: sidecar lands BEFORE the data — a crashed bootstrap never strands a sidecar-less store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r14crash").toString
    // a docs frame that throws at WRITE time (after the sidecar landed)
    val poisoned = Seq((1L, "aa bb cc dd ee")).toDF("doc_id", "text")
      .withColumn("text",
        when(expr("raise_error('boom') is null"), col("text")))
    intercept[Exception] {
      graft.llm.Dedup.appendMinHashStore(poisoned, dir, nParts = 8)
    }
    assert(new java.io.File(dir, "_meta.json").isFile,
      "crashed bootstrap stranded a store with no layout contract")
    // the stranded store still enforces its parameters...
    val more = Seq((2L, "ff gg hh ii jj")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.llm.Dedup.appendMinHashStore(more, dir, nParts = 16)
    }
    assert(e.getMessage.contains("mis-prune"))
    // ...and a matching retry completes the bootstrap normally
    graft.llm.Dedup.appendMinHashStore(more, dir, nParts = 8)
    assert(graft.llm.Dedup.crossCorpusNearDupsFromStore(
      more, dir, nParts = 8).count() >= 0)
  }

  test("plant guard: int-typed id column reports collision/empty, not a ClassCastException") {
    import spark.implicits._
    val intIds = Seq((1, "a"), (2, "b")).toDF("doc_id", "text")
    assert(graft.queries.Plants.requireNaturalIdsBelowFloor(
      intIds, "doc_id", "t") == 2L)
    val colliding = Seq((Int.MaxValue, "big")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.queries.Plants.requireNaturalIdsBelowFloor(colliding, "doc_id", "t")
    }
    assert(e.getMessage.contains("planted-id"))
  }
}
