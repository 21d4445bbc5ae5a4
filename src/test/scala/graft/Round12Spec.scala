package graft

import org.apache.spark.sql.functions._

/** Round-12 regression locks: q195's scoped cache teardown + staging-dir
  * cleanup, and the IVF recall floor at production (nprobe < ncells)
  * geometry. */
class Round12Spec extends SparkFunSuite {

  test("q195 chain: cache-flat across both batches and staging dirs removed") {
    // the chain's foreachBatch must release exactly the caches it created
    // (NOT catalog.clearCache() — a shared session's foreign caches have to
    // survive the production daily-drop template), and the src/checkpoint
    // staging dirs are single-use and must not leak per invocation.
    import spark.implicits._
    val foreign = Seq((1, "keepme")).toDF("k", "v").persist()
    foreign.count() // materialize so eviction would be observable
    val tmpBefore = new java.io.File("/tmp").listFiles().map(_.getName).toSet
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    try {
      val out = graft.queries.StreamQueries
        .streamIntakeChain(spark, "/root/testdata/sf0.001")
      assert(out.count() > 0)
      val cachedAfter = spark.sparkContext.getPersistentRDDs.keySet
      assert(cachedAfter == cachedBefore,
        s"chain leaked cache entries: ${cachedAfter -- cachedBefore}")
      assert(foreign.storageLevel.useMemory,
        "chain evicted a foreign cached frame (clearCache semantics)")
      assert(foreign.collect().map(_.getString(1)).toSeq == Seq("keepme"))
      val fresh = (new java.io.File("/tmp").listFiles().map(_.getName).toSet
        -- tmpBefore).filter(n =>
        n.startsWith("graft_intake_src") || n.startsWith("graft_intake_ck"))
      assert(fresh.isEmpty, s"chain leaked staging dirs: $fresh")
    } finally foreign.unpersist()
  }

  test("q195 chain: planted-id offsets guarded against natural-id collision") {
    // the +2M.. plant scheme (mirrored in the DuckDB oracle and the scale
    // probe's origin bucketing) must fail LOUDLY when the corpus outgrows
    // it, never silently corrupt survivor sets
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r12guard").toString
    Seq((2500000L, "colliding doc"), (1L, "tiny doc"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(dir + "/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.queries.StreamQueries.streamIntakeChain(spark, dir)
    }
    assert(e.getMessage.contains("planted-id"))
  }

  test("q197 chain: planted contamination dies at decontam and stays out of the ranking") {
    import graft.llm.Corpus
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
    val evalDocs = docs.filter(col("doc_id") % 50 === 0)
    val plants = evalDocs.orderBy("doc_id").limit(20)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val train = docs.filter(col("doc_id") % 50 =!= 0).unionByName(plants)
    val clean = Corpus.decontaminate(train, evalDocs, minShare = 0.5)
    // exact eval copies share every shingle (share 1.0 ≥ 0.5) — ALL die
    // (sf0.001's eval slice has <20 docs, so count the actual plants)
    val nPlants = plants.count()
    assert(nPlants > 0)
    assert(clean.filter(col("doc_id") >= 1000000L).count() == 0,
      "planted eval copies survived decontamination")
    assert(clean.count() <= train.count() - nPlants)
    // and the chain's output ranks only clean docs: a planted id in the
    // fused shortlist would mean a stage ran on the pre-decontam corpus
    val out = graft.queries.RetrievalPipelineQueries.retrievalChain(spark, d)
    assert(out.filter(col("doc_id") >= 1000000L).count() == 0)
    // every query emits exactly k=10 fused rows with dense ranks 1..10
    val perQ = out.groupBy("query_id").agg(
      count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .collect()
    assert(perQ.nonEmpty && perQ.forall(r =>
      r.getLong(1) == 10 && r.getLong(2) == 10 && r.getLong(3) == 1))
  }

  test("PrCurve confidenceDecimals caps per-group bins; lossless when rounding is") {
    // the 100-TB skew lever for continuous detector scores: quantizing to
    // d decimals bounds the per-group kernel/window volume at 10^d + 1
    // REGARDLESS of group size, and is exact whenever the scores already
    // carry ≤ d decimals.
    import spark.implicits._
    import graft.eval.PrCurve
    // 500 continuous-ish confidences in one group (3 decimals by
    // construction) + a positive at each end
    val rows = (0 until 500).map { i =>
      (0, i % 3 == 0, if (i % 3 == 0) 0.9 else 0.0, i / 1000.0 + 0.001)
    }
    val res = rows.toDF("category_id", "groundtruth", "iou", "confidence")
    val exact = PrCurve.compute(res, Seq("category_id"), minIou = 0.5)
    val d3 = PrCurve.compute(res, Seq("category_id"), minIou = 0.5,
      confidenceDecimals = Some(3))
    // d=3 is lossless here (up to the binary representation of the
    // synthetic 3-decimal scores) → the reindexed curves agree pointwise
    val eRows = exact.orderBy("recall")
      .select("precision", "recall", "confidence_threshold", "f1_score").collect()
    val dRows = d3.orderBy("recall")
      .select("precision", "recall", "confidence_threshold", "f1_score").collect()
    assert(eRows.length == dRows.length)
    eRows.zip(dRows).foreach { case (a, b) =>
      (0 until 4).foreach(i =>
        assert(math.abs(a.getDouble(i) - b.getDouble(i)) < 1e-9, s"$a vs $b"))
    }
    // d=1 really caps the distinct-confidence bound (≤ 11 values here)
    val d1curve = PrCurve.compute(res, Seq("category_id"), minIou = 0.5,
      reindexBins = None, confidenceDecimals = Some(1))
    val d1conf = d1curve.select("confidence_threshold").distinct().count()
    assert(d1conf <= 11 + 2, s"quantized curve carries $d1conf thresholds")
    // and the quantized AP stays close to exact on this smooth curve
    val apE = PrCurve.averagePrecision(exact, Seq("category_id"))
      .collect()(0).getAs[Double]("AP")
    val ap1 = PrCurve.averagePrecision(
      PrCurve.compute(res, Seq("category_id"), minIou = 0.5,
        confidenceDecimals = Some(1)), Seq("category_id"))
      .collect()(0).getAs[Double]("AP")
    assert(math.abs(apE - ap1) < 0.05, s"AP drifted: exact $apE vs d1 $ap1")
  }
}
