package graft.queries

import graft.Tables
import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate queries for the streaming operators run in batch mode
  * (SURVEY §7 new scope). The same code paths power the Structured
  * Streaming queries (StreamingSpec drives an actual readStream→memory
  * sink); here they run over the batch events table so DuckDB can oracle
  * them. */
object StreamQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  /** Delete `dir` recursively when the JVM exits. The intake store dir
    * must outlive its building call (the returned frame reads it lazily)
    * and is keyed per (applicationId, dataset) for concurrent-session
    * isolation — which would otherwise leak one never-deleted /tmp tree
    * per session. One hook for all registrations; re-registering the same
    * dir (bench reps reuse it) is a set no-op. */
  private val exitDeleteDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val exitHookInstalled =
    new java.util.concurrent.atomic.AtomicBoolean(false)
  private def deleteOnJvmExit(dir: String): Unit = {
    if (exitHookInstalled.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        exitDeleteDirs.forEach { p =>
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(): Unit
          }
          rm(new java.io.File(p))
        }))
    exitDeleteDirs.add(dir): Unit
  }

  val defs: Map[String, Q] = Map(
    // sliding 2h/1h window aggregate (batch mode of windowedAggregate)
    "q39_sliding_window" -> ((s, d) => {
      EventStream.windowedAggregate(Tables.events(s, d), "2 hours", Some("1 hour"),
        watermark = "0 seconds")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("window_start"),
          col("event_type"), col("n"),
          round(col("total_value"), 2).as("total_value"))
    }),

    // event-time AS-OF join (union + running-last window) vs DuckDB's
    // native ASOF LEFT JOIN — every event ≢0 (mod 5) picks up the value
    // of the user's latest ≡0 (mod 5) event at-or-before it. (user,ts)
    // is unique in the events table (verified), so no tie ambiguity
    "q64_asof_join" -> ((s, d) => {
      val events = Tables.events(s, d)
      val left = events.filter(col("event_id") % 5 =!= 0)
        .select(col("event_id"), col("ts"), col("user_id"))
      val right = events.filter(col("event_id") % 5 === 0)
        .select(col("user_id"), col("ts"), col("value").as("ref_value"))
      EventStream.asOfJoin(left, right, Seq("user_id"), Seq("ref_value"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          count(col("ref_value")).as("n_matched"),
          round(coalesce(sum(col("ref_value")), lit(0.0)), 2).as("ref_sum"))
    }),

    // a REAL Structured Streaming run inside the correctness gate:
    // readStream over the events parquet → watermarked daily window agg →
    // memory sink (AvailableNow), result table verified against the same
    // DuckDB daily aggregate as the batch face. Streaming here is not just
    // spec-tested — it is oracle-gated.
    "q88_stream_window" -> ((s, d) => {
      val q = EventStream.runToMemory(s, d, "gate_stream_daily")
      q.awaitTermination()
      s.table("gate_stream_daily")
        .select(date_format(col("window_start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("n"),
          round(col("total_value"), 2).as("total_value"))
    }),

    // streaming exact dedup (StreamDedup.dedupExact) run on its batch face:
    // the same fingerprint plumbing that dropDuplicatesWithinWatermark uses
    // in a stream, over a corpus with 20 planted duplicate docs. Output is
    // the surviving fingerprint set — the only batch-deterministic part
    // (which duplicate row survives is arbitrary; which fingerprints do is
    // not)
    "q77_stream_dedup" -> ((s, d) => {
      val base = Tables.documents(s, d)
      val dups = base.orderBy("doc_id").limit(20)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val docs = base.unionByName(dups)
        .withColumn("ts", timestamp_micros(col("doc_id") * 1000000L))
      graft.streaming.StreamDedup.dedupExact(docs, watermark = "1 hour")
        .select(col("fingerprint"))
    }),

    // the stream-static corpus matcher on its batch face (q108's sides
    // through StreamDedup.buildCorpusIndex + matchesAgainstCorpus; the
    // REAL readStream run is parity-asserted in StreamingSpec). distinct
    // collapses the per-band duplicate emissions the stateless stream
    // path leaves to the consumer. Oracle = q108's exhaustive cross-side
    // Jaccard: the two implementations must agree with the ground truth
    // AND (therefore) each other.
    // bloom-prefiltered EXACT dedup against a static corpus, batch face
    // (the REAL readStream run is parity-asserted in StreamingSpec):
    // q119's sides, a deliberately loose fpp (0.05 — verify traffic must
    // flow), and the stream-static anti-join verify. Oracle = the plain
    // fingerprint anti-join, identical to q119's.
    "q128_stream_bloom_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val ref = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val planted = ref.orderBy("doc_id").limit(20)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val incoming = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .unionByName(planted)
      val bloom = graft.llm.Dedup.buildFingerprintBloom(ref,
        expectedItems = 1000, fpp = 0.05)
      val refFps = ref.select(graft.llm.TextAnalysis.fingerprint(col("text"))
        .as("fingerprint")).distinct()
      graft.streaming.StreamDedup.bloomDedupAgainstCorpus(incoming, refFps, bloom)
        .select(col("doc_id"))
    }),

    // REAL streaming index ingest: the reference corpus arrives as two
    // file "drops" consumed by readStream (maxFilesPerTrigger=1 → one
    // foreachBatch per drop), each micro-batch appended to the MinHash
    // store; the post-stream probe must answer exactly like the one-shot
    // store over the union (q146's identical-answers contract — the
    // oracle is that SQL verbatim).
    "q182_stream_store_ingest" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = docs.orderBy("doc_id").limit(20)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val newSide = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .unionByName(planted)
      val refSide = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_ingest_src").toString
      refSide.filter(col("doc_id") % 2 === 0).coalesce(1)
        .write.mode("overwrite").parquet(srcDir)
      refSide.filter(col("doc_id") % 2 =!= 0).coalesce(1)
        .write.mode("append").parquet(srcDir)
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft_ingest_store").toString
      val ck = java.nio.file.Files
        .createTempDirectory("graft_ingest_ck").toString
      // nParts sized to the gate corpus (the _meta.json sidecar the first
      // append bootstraps enforces the match on every later append/probe);
      // 64 dirs × 2 appends of a 300-doc batch is all file-system
      // overhead, no pruning benefit
      val np = 8
      val q = s.readStream.schema(refSide.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.llm.Dedup.appendMinHashStore(batch, storeDir, nParts = np)
        }
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.llm.Dedup.crossCorpusNearDupsFromStore(newSide, storeDir,
          threshold = 0.7, nParts = np)
        .select(col("new_id"), col("ref_id"),
          round(col("jaccard"), 6).as("jaccard"))
    }),

    "q109_stream_corpus_match" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = docs.orderBy("doc_id").limit(20)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val newSide = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .unionByName(planted)
      val refSide = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val idx = graft.streaming.StreamDedup.buildCorpusIndex(refSide)
      graft.streaming.StreamDedup.matchesAgainstCorpus(newSide, idx,
        threshold = 0.7)
        .select(col("new_id"), col("ref_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .distinct()
    }),

    // a REAL streaming run of the STATEFUL sessionizer (q88's pattern for
    // the window agg): readStream over events → planted burst timeline →
    // watermarked flatMapGroupsWithState with EventTimeTimeout → memory
    // sink (Append, AvailableNow). Timeline: user = event_id % 40, bursts
    // of 4 events 5 min apart, bursts 2 h apart (gap 30 min closes every
    // burst), and event 0 is a far-future sentinel (+30 days) whose
    // watermark closes every user's TRAILING session by event-time
    // timeout in the no-data flush batch — so the closed-session set is
    // exactly "all sessions except the sentinel's own", which the DuckDB
    // lag+cumsum oracle replicates with a session_end + gap < max(ts)
    // filter. Margins are days vs minutes, so ms-vs-μs truncation and
    // strict-vs-inclusive watermark comparisons cannot flip a session.
    "q91_stream_sessionize" -> ((s, d) => {
      import s.implicits._
      // the trailing-session flush REQUIRES the post-AvailableNow no-data
      // micro-batch (default on, but a session could have it disabled —
      // without it every trailing session stays open and the gate drifts
      // from the oracle): pin it rather than assume
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
      val planted = EventStream.readEvents(s, d).select(
        col("event_id"),
        timestamp_micros(lit(1704067200000000L) +
          when(col("event_id") === 0, lit(2592000000000L))
            .otherwise(expr("((event_id div 40) div 4) * 7200000000") +
              expr("((event_id div 40) % 4) * 300000000"))).as("ts"),
        (col("event_id") % 40).as("user_id"),
        col("event_type"), col("value"))
        .withWatermark("ts", "0 seconds")
        .as[EventStream.Event]
      val q = EventStream.sessionizeStream(planted, gapMs = 30 * 60 * 1000L)
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .format("memory").queryName("gate_stream_sessions")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("gate_stream_sessions")
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events").cast("long").as("n_events"),
          round(col("total_value"), 2).as("total_value"))
    }),

    // gap-based sessionization (flatMapGroupsWithState kernel) vs the
    // SQL lag+cumsum formulation
    "q40_sessionize" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val events = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[EventStream.Event]
      EventStream.sessionize(events, gapMs = 30 * 60 * 1000L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          round(sum(col("total_value")), 2).as("total_value"))
    }),

    // NATIVE session_window sessionization (q40's shape through the
    // built-in aggregation). The oracle replicates session_window's
    // STRICT-overlap merge rule (gap < 30min, not <=) — the documented
    // semantic difference vs the flatMapGroupsWithState kernel
    "q101_session_window" -> ((s, d) => {
      EventStream.sessionizeNative(Tables.events(s, d), gap = "30 minutes")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          round(sum(col("total_value")), 2).as("total_value"))
    }),

    // bucketized interval join: per-user synthetic 90-min maintenance
    // windows every 6h (crossing the 1h chunk boundary, so the explosion
    // + exactly-once-per-pair property is exercised); oracle is DuckDB's
    // direct BETWEEN join
    "q102_interval_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val base = 1704153600000L // 2024-01-02 00:00:00 UTC
      val slots = ev.select(col("user_id")).distinct()
        .select(col("user_id"), explode(sequence(lit(0), lit(2))).as("k"))
        .select(col("user_id"), col("k"),
          timestamp_millis(lit(base) + col("k") * 21600000L).as("w_start"),
          timestamp_millis(lit(base) + col("k") * 21600000L + 5400000L).as("w_end"))
      EventStream.intervalJoin(ev, slots, Seq("user_id"),
          tsCol = "ts", startCol = "w_start", endCol = "w_end",
          chunkMs = 3600 * 1000L)
        .groupBy(col("user_id"), col("k"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
        .select(col("user_id"), col("k").cast("int").as("k"), col("n"), col("v"))
    }),

    // the FULL streaming intake pipeline (q195, round 11): the production
    // daily-drop loop composed end to end. A static reference corpus is
    // indexed ONCE (fingerprint bloom + MinHash store); document batches
    // then arrive as file drops consumed by readStream
    // (maxFilesPerTrigger=1 → one foreachBatch per drop, drop order pinned
    // via explicit file mtimes — it is load-bearing), and each batch runs
    // within-batch exact dedup → bloom-verified exact dedup against the
    // static reference → within-batch NEAR-dup CC keeping the min-id
    // representative → near-dup rejection against the STORE (reference ∪
    // EARLIER SURVIVORS) → survivor append into the store. Cross-batch
    // structure is the point: batch B carries exact copies of batch A
    // documents, rejected ONLY if A's survivors really landed in the
    // store. Output = final store membership (ref ∪ S1 ∪ S2); ONE DuckDB
    // statement re-derives the whole sequential pipeline.
    "q195_stream_intake_e2e" -> ((s, d) => streamIntakeChain(s, d)),

    // the STREAMING face of the retrieval family (q197 is batch-only):
    // eval-set decontamination of LIVE document drops against a STATIC
    // holdout, then BM25 retrieval of the holdout's queries over the
    // accumulated clean corpus. Each drop carries planted contamination
    // (full and one-word-padded copies of the eval docs at offset ids) —
    // the plants MUST die inside their own batch's decontam pass, and the
    // batches are INDEPENDENT by design (decontam is per-doc against the
    // static eval set — no cross-batch state beyond the append), which is
    // exactly what makes the live-drop shape horizontally scalable. ONE
    // DuckDB statement re-derives the whole thing over the drop union.
    "q199_stream_decontam_retrieval" -> ((s, d) => streamRetrievalChain(s, d))
  )

  /** The q195 chain as a callable (the q192/q193 pattern — the scale
    * harness runs it as the `stream_intake_e2e` probe). Returns the final
    * store membership (ref ∪ S1 ∪ S2) as one `doc_id` column. */
  def streamIntakeChain(s: SparkSession, d: String): DataFrame = {
      // stage labels (guide §1.5, the q192 discipline): the chain's eager
      // points (store writes, bloom build, per-batch dedup stages) surface
      // as ~130 anonymous jobs in the profiler — label them so per-stage
      // cost stays attributable
      def mark(stage: String): Unit =
        s.sparkContext.setJobDescription(s"q195 $stage")
      val docs = Tables.documents(s, d).select("doc_id", "text")
      // the planted-copy id offsets (+2M..+7M below, mirrored literally in
      // the DuckDB oracle and in the scale probe's origin bucketing) assume
      // every NATURAL doc_id sits below the smallest offset — a collision
      // would violate the MinHash store's unique-id contract and silently
      // change survivor sets. Fail loudly instead of corrupting when the
      // corpus outgrows the scheme (regenerate the offsets then). Shared
      // guard (Plants) — empty-table-safe, same floor as q197's plants.
      Plants.requireNaturalIdsBelowFloor(docs, "doc_id", "stream_intake")
      val ref = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val aNat = docs.filter(pmod(col("doc_id"), lit(6)) === 0)
      val refLow = ref.orderBy("doc_id").limit(10)
      val bNat = docs.filter(pmod(col("doc_id"), lit(6)) === 3)
      // drop 1: naturals + exact ref dups (die at the bloom stage) +
      // within-batch exact dups (die at the fp stage, min-id keeper) +
      // one-word-appended copies of batch-A docs (new fingerprint, so
      // they pass both exact stages and die at the WITHIN-BATCH near-dup
      // CC, collapsing to their original as the min-id representative)
      val batchA = aNat
        .unionByName(refLow.withColumn("doc_id", col("doc_id") + 2000000L))
        .unionByName(aNat.orderBy("doc_id").limit(5)
          .withColumn("doc_id", col("doc_id") + 3000000L))
        .unionByName(aNat.orderBy("doc_id").limit(8)
          .withColumn("doc_id", col("doc_id") + 6000000L)
          .withColumn("text", concat(col("text"), lit(" qqwithinpad"))))
      // drop 2: naturals + exact copies of batch-A docs (die against S1
      // in the store — the cross-batch face) + one-word-appended ref
      // copies (die only at the store's true-jaccard verify) + its own
      // within-batch near-dup plants
      val batchB = bNat
        .unionByName(aNat.orderBy("doc_id").limit(10)
          .withColumn("doc_id", col("doc_id") + 4000000L))
        .unionByName(refLow.withColumn("doc_id", col("doc_id") + 5000000L)
          .withColumn("text", concat(col("text"), lit(" qqintakepad"))))
        .unionByName(bNat.orderBy("doc_id").limit(8)
          .withColumn("doc_id", col("doc_id") + 7000000L)
          .withColumn("text", concat(col("text"), lit(" qqwithinpadb"))))
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_intake_src").toString
      def parts(): Set[java.io.File] = new java.io.File(srcDir).listFiles()
        .filter(_.getName.startsWith("part-")).toSet
      val t0 = System.currentTimeMillis()
      mark("stage drop A")
      batchA.coalesce(1).write.mode("overwrite").parquet(srcDir)
      val aFiles = parts()
      aFiles.foreach(_.setLastModified(t0 - 120000))
      mark("stage drop B")
      batchB.coalesce(1).write.mode("append").parquet(srcDir)
      (parts() -- aFiles).foreach(_.setLastModified(t0 - 60000))
      // store dir DETERMINISTIC per (session, input dir) and overwritten
      // by writeMinHashStore below: repeated invocations (bench reps, the
      // partition-invariance sweep) reuse one directory instead of leaking
      // a fresh tree per run, while the applicationId suffix keeps two
      // CONCURRENT sessions running the chain on the same dataset from
      // overwriting each other's store mid-run (the returned frame reads
      // it lazily). It must outlive this call, so it is not deleted here —
      // a JVM shutdown hook reclaims it so per-session isolation does not
      // become an unbounded /tmp leak; src/checkpoint are consumed by
      // awaitTermination and removed in the finally.
      val storeDir = "/tmp/graft_intake_store_" +
        s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9.]", "_") +
        "_" + d.replaceAll("[^A-Za-z0-9.]", "_")
      deleteOnJvmExit(storeDir)
      val ck = java.nio.file.Files
        .createTempDirectory("graft_intake_ck").toString
      val np = 8
      mark("ref store write")
      graft.llm.Dedup.writeMinHashStore(ref, storeDir, nParts = np)
      // the reference's fingerprint projection is consumed by the bloom
      // build AND by every batch's verify semi-join — compute the
      // normalize+md5 scan once and persist it for the whole stream
      // (chain-level cache: the per-batch scoped teardown below leaves it
      // alone; the stream teardown releases it, keeping the chain
      // cache-flat — nothing after awaitTermination reads it)
      val refFps = ref
        .select(graft.llm.TextAnalysis.fingerprint(col("text")).as("__bc_fp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      mark("ref bloom build")
      val bloom = graft.llm.Dedup.buildFingerprintBloom(ref,
        expectedItems = 100000, fpp = 0.01, refFps = refFps)
      val q = s.readStream.schema(batchA.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // cache teardown is SCOPED to this batch: the dedup stages below
          // persist their minhash bases internally (the handles back the
          // returned lazy frames), so snapshot the persisted-RDD ids first
          // and release only what this batch added. A whole-catalog
          // clearCache() here would evict every OTHER pipeline's cached
          // frames in a shared session — this chain is the production
          // daily-drop template, so it must leave foreign caches alone.
          val cachedBefore = s.sparkContext.getPersistentRDDs.keySet
          try {
            mark("batch exact+bloom dedup")
            val s1 = graft.llm.Dedup.exactDedup(batch)
            // s2 is re-consumed by THREE downstream stages (near-dup CC,
            // keep-representatives, and through s2b the store probe and
            // append) — without the persist each one re-runs the batch
            // scan + exact dedup + bloom anti-join lineage from scratch
            // (guide §5: cache exactly the reused frame; the scoped
            // teardown in the finally below releases it with the rest)
            val s2 = graft.llm.Dedup.bloomCrossDedup(s1, ref, bloom,
                refFps = refFps)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            // within-batch NEAR-dup pass (exact fp can't see reworded
            // copies): transitive CC over verified pairs, keep the min-id
            // representative — the drop is deduped before it ever touches
            // the store
            mark("batch within-near-dup CC")
            val s2b = graft.llm.Dedup.keepClusterRepresentatives(s2,
              graft.llm.Dedup.nearDupClusters(s2, threshold = 0.7))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            mark("batch store probe")
            val matched = graft.llm.Dedup.crossCorpusNearDupsFromStore(
              s2b, storeDir, threshold = 0.7, nParts = np)
              .select(col("new_id").as("doc_id")).distinct()
            // fence: materialize the survivors BEFORE the append so the
            // store read (matched) can never race the store write — the
            // q192 stage-fencing discipline
            mark("batch survivor fence")
            val s3 = s2b.join(matched, Seq("doc_id"), "left_anti")
              .localCheckpoint()
            mark("batch store append")
            graft.llm.Dedup.appendMinHashStore(s3, storeDir, nParts = np)
          } finally {
            s.sparkContext.getPersistentRDDs
              .filter { case (id, _) => !cachedBefore.contains(id) }
              .values.foreach(_.unpersist(blocking = false))
          }
        }
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally {
        // the stream is done: release the stream-lifetime fingerprint
        // cache (its only consumers were the batches), and the drop
        // staging area and the checkpoint are single-use — remove them
        // (the invariance sweep invokes this chain once per partition
        // setting and would otherwise leak both per run)
        refFps.unpersist(blocking = false)
        def rmTree(p: String): Unit = {
          import scala.jdk.CollectionConverters._
          val root = java.nio.file.Paths.get(p)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
        }
        rmTree(srcDir); rmTree(ck)
      }
      s.read.parquet(storeDir + "/payload")
        .select(col("id").cast("long").as("doc_id"))
  }

  /** The q199 chain as a callable (the scale harness runs it as the
    * `stream_retrieval_e2e` probe): STREAMING eval-set decontamination +
    * retrieval over the accumulated clean corpus.
    *
    * Shape: the eval holdout (doc_id % 100 = 7) is STATIC — its shingle
    * index broadcasts into every batch (the
    * [[graft.llm.Corpus.decontaminate]] size-guarded hint). Train docs
    * arrive as two file drops (even ids / odd ids), each carrying planted
    * contamination: drop 1 has FULL copies of every eval doc at
    * +[[Plants.IdFloor]], drop 2 one-word-padded copies at +3M (shingle
    * share vs their source eval doc = 1.0 — both families must die in
    * their own batch). Survivors append to the clean store; after the
    * stream, the holdout's first-6-words queries run BM25 top-10 against
    * the accumulated corpus (the q117 conventions: round-6 score, doc-id
    * tiebreak).
    *
    * Batch INDEPENDENCE is the design point: decontamination is per-doc
    * against a static index, so drops commute — at 100 TB/day the loop
    * shards horizontally with no cross-batch coordination (contrast the
    * q195 intake chain, where the store append is sequential state). The
    * clean store dir is deterministic per (applicationId, dataset), reset
    * at chain start, and reclaimed by the JVM-exit hook. */
  def streamRetrievalChain(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    Plants.requireNaturalIdsBelowFloor(docs, "doc_id", "q199 chain")
    // chain-level cache (the q195 refFps discipline): the static holdout
    // is re-derived from the documents scan by every batch's decontam
    // pass AND the final query projection — persist it once for the
    // stream; the bench's between-query reset (or the owning session)
    // reclaims it
    val evalDocs = docs.filter(col("doc_id") % 100 === 7)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val train = docs.filter(col("doc_id") % 100 =!= 7)
    val batchA = train.filter(col("doc_id") % 2 === 0)
      .unionByName(evalDocs.select(
        (col("doc_id") + Plants.IdFloor).as("doc_id"), col("text")))
    val batchB = train.filter(col("doc_id") % 2 =!= 0)
      .unionByName(evalDocs.select(
        (col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit(" qqretrpad")).as("text")))
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_retr_src").toString
    def parts(): Set[java.io.File] = new java.io.File(srcDir).listFiles()
      .filter(_.getName.startsWith("part-")).toSet
    val t0 = System.currentTimeMillis()
    batchA.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val aFiles = parts()
    aFiles.foreach(_.setLastModified(t0 - 120000))
    batchB.coalesce(1).write.mode("append").parquet(srcDir)
    (parts() -- aFiles).foreach(_.setLastModified(t0 - 60000))
    // clean-store dir: deterministic per (session, dataset) like the q195
    // intake store — reset up front so bench reps don't accumulate stale
    // survivors, reclaimed at JVM exit (the returned frame reads it
    // lazily, so it must outlive this call)
    val cleanDir = "/tmp/graft_retr_clean_" +
      s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9.]", "_") +
      "_" + d.replaceAll("[^A-Za-z0-9.]", "_")
    deleteOnJvmExit(cleanDir)
    graft.IoUtil.rmTree(cleanDir)
    val ck = java.nio.file.Files
      .createTempDirectory("graft_retr_ck").toString
    val q = s.readStream.schema(batchA.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the batch is consumed twice inside decontaminate (the shingle
        // explode that derives the contaminated-id set, then the anti-join
        // output side) — persist for the batch's scope so the micro-batch
        // source is read once (q195's scoped-persist discipline)
        val b = batch.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try graft.llm.Corpus.decontaminate(b, evalDocs, minShare = 0.2)
          .write.mode("append").parquet(cleanDir)
        finally b.unpersist(blocking = false)
        ()
      }
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      graft.IoUtil.rmTree(srcDir); graft.IoUtil.rmTree(ck)
    }
    val clean = s.read.parquet(cleanDir)
    val queries = evalDocs.select(col("doc_id").as("query_id"),
      array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 6), " ")
        .as("query"))
    graft.llm.Corpus.bm25TopK(clean, queries, k = 10)
      .select(col("query_id"), col("doc_id"), col("score"),
        col("rank").cast("long").as("rank"))
  }

  val oracles: Map[String, String] = Map(
    // the whole sequential intake pipeline re-derived in ONE statement:
    // drop construction, min-id exact dedup within each batch, exact
    // anti-join vs the static reference fingerprints (bloom is a
    // prefilter only — semantics are the plain anti-join), WITHIN-BATCH
    // near-dup connected components keeping the min-id representative
    // (recursive CTE, the q192 CC pattern), true-jaccard near-dup
    // rejection vs the store state AT THAT BATCH (ref for A; ref ∪ S1
    // for B), membership = ref ∪ S1 ∪ S2
    "q195_stream_intake_e2e" ->
      """WITH RECURSIVE
        |ref AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        |reflow AS (SELECT doc_id, text FROM ref ORDER BY doc_id LIMIT 10),
        |anat AS (SELECT doc_id, text FROM documents WHERE doc_id % 6 = 0),
        |bnat AS (SELECT doc_id, text FROM documents WHERE doc_id % 6 = 3),
        |batcha AS (
        |  SELECT doc_id, text FROM anat
        |  UNION ALL SELECT doc_id + 2000000, text FROM reflow
        |  UNION ALL SELECT doc_id + 3000000, text FROM
        |    (SELECT doc_id, text FROM anat ORDER BY doc_id LIMIT 5)
        |  UNION ALL SELECT doc_id + 6000000, text || ' qqwithinpad' FROM
        |    (SELECT doc_id, text FROM anat ORDER BY doc_id LIMIT 8)),
        |batchb AS (
        |  SELECT doc_id, text FROM bnat
        |  UNION ALL SELECT doc_id + 4000000, text FROM
        |    (SELECT doc_id, text FROM anat ORDER BY doc_id LIMIT 10)
        |  UNION ALL SELECT doc_id + 5000000, text || ' qqintakepad'
        |    FROM reflow
        |  UNION ALL SELECT doc_id + 7000000, text || ' qqwithinpadb' FROM
        |    (SELECT doc_id, text FROM bnat ORDER BY doc_id LIMIT 8)),
        |reffp AS (SELECT DISTINCT
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM ref),
        |sh_ref AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM ref)),
        |sh_a AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM batcha)),
        |sh_b AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM batchb)),
        |a1 AS (SELECT min(doc_id) AS doc_id FROM batcha
        |       GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))),
        |a2 AS (SELECT a.doc_id FROM batcha a JOIN a1 USING (doc_id)
        |       LEFT JOIN reffp f
        |         ON f.fp = md5(regexp_replace(lower(trim(a.text)), '\s+', ' ', 'g'))
        |       WHERE f.fp IS NULL),
        |sa2 AS (SELECT n.doc_id, n.s FROM sh_a n JOIN a2 USING (doc_id)),
        |apair AS (
        |  SELECT x.doc_id AS ida, y.doc_id AS idb
        |  FROM sa2 x JOIN sa2 y ON x.doc_id < y.doc_id
        |  WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |        / len(list_distinct(list_concat(x.s, y.s))) >= 0.7),
        |abi AS (SELECT ida AS a, idb AS b FROM apair
        |        UNION ALL SELECT idb, ida FROM apair),
        |areach(a, b) AS (
        |  SELECT doc_id, doc_id FROM a2
        |  UNION
        |  SELECT r.a, e.b FROM areach r JOIN abi e ON r.b = e.a),
        |aclu AS (SELECT a AS doc_id, min(b) AS cid FROM areach GROUP BY a),
        |a2b AS (SELECT doc_id FROM aclu WHERE doc_id = cid),
        |s1 AS (SELECT n.doc_id FROM sa2 n JOIN a2b USING (doc_id)
        |       WHERE NOT EXISTS (
        |         SELECT 1 FROM sh_ref r
        |         WHERE CAST(len(list_intersect(n.s, r.s)) AS DOUBLE)
        |               / len(list_distinct(list_concat(n.s, r.s))) >= 0.7)),
        |store1 AS (SELECT doc_id, s FROM sh_ref
        |           UNION ALL
        |           SELECT n.doc_id, n.s FROM sa2 n JOIN s1 USING (doc_id)),
        |b1 AS (SELECT min(doc_id) AS doc_id FROM batchb
        |       GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))),
        |b2 AS (SELECT b.doc_id FROM batchb b JOIN b1 USING (doc_id)
        |       LEFT JOIN reffp f
        |         ON f.fp = md5(regexp_replace(lower(trim(b.text)), '\s+', ' ', 'g'))
        |       WHERE f.fp IS NULL),
        |sb2 AS (SELECT n.doc_id, n.s FROM sh_b n JOIN b2 USING (doc_id)),
        |bpair AS (
        |  SELECT x.doc_id AS ida, y.doc_id AS idb
        |  FROM sb2 x JOIN sb2 y ON x.doc_id < y.doc_id
        |  WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |        / len(list_distinct(list_concat(x.s, y.s))) >= 0.7),
        |bbi AS (SELECT ida AS a, idb AS b FROM bpair
        |        UNION ALL SELECT idb, ida FROM bpair),
        |breach(a, b) AS (
        |  SELECT doc_id, doc_id FROM b2
        |  UNION
        |  SELECT r.a, e.b FROM breach r JOIN bbi e ON r.b = e.a),
        |bclu AS (SELECT a AS doc_id, min(b) AS cid FROM breach GROUP BY a),
        |b2b AS (SELECT doc_id FROM bclu WHERE doc_id = cid),
        |s2 AS (SELECT n.doc_id FROM sb2 n JOIN b2b USING (doc_id)
        |       WHERE NOT EXISTS (
        |         SELECT 1 FROM store1 r
        |         WHERE CAST(len(list_intersect(n.s, r.s)) AS DOUBLE)
        |               / len(list_distinct(list_concat(n.s, r.s))) >= 0.7))
        |SELECT doc_id FROM ref
        |UNION ALL SELECT doc_id FROM s1
        |UNION ALL SELECT doc_id FROM s2""".stripMargin,

    // the whole streaming retrieval loop in ONE statement: drop
    // construction (train halves + two plant families), per-doc n-gram
    // decontamination against the static eval set (batch-independent, so
    // the union replays the stream exactly), then the q117 BM25 kernel
    // over the accumulated clean corpus with the eval set's first-6-words
    // queries
    "q199_stream_decontam_retrieval" ->
      """WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 100 = 7),
        |train AS (SELECT doc_id, text FROM documents WHERE doc_id % 100 <> 7),
        |corpus0 AS (
        |  SELECT doc_id, text FROM train
        |  UNION ALL SELECT doc_id + 2000000, text FROM ev
        |  UNION ALL SELECT doc_id + 3000000, text || ' qqretrpad' FROM ev),
        |shc AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                             i -> array_to_string(t[i:i+2], ' '))
        |    END)) AS s
        |  FROM (SELECT doc_id,
        |          string_split_regex(lower(trim(text)), '\s+') AS t
        |        FROM corpus0)),
        |she AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                             i -> array_to_string(t[i:i+2], ' '))
        |    END)) AS s
        |  FROM (SELECT doc_id,
        |          string_split_regex(lower(trim(text)), '\s+') AS t
        |        FROM ev)),
        |tsize AS (SELECT doc_id AS test_id, count(*) AS n_test
        |          FROM she GROUP BY 1),
        |bad AS (
        |  SELECT DISTINCT c.doc_id
        |  FROM shc c JOIN she e ON c.s = e.s
        |  JOIN tsize ON tsize.test_id = e.doc_id
        |  GROUP BY c.doc_id, e.doc_id, n_test
        |  HAVING CAST(count(*) AS DOUBLE) / n_test >= 0.2),
        |clean AS (SELECT doc_id, text FROM corpus0
        |          WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
        |toks AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM clean),
        |t AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS tot_len FROM dl),
        |q AS (SELECT doc_id AS query_id,
        |        unnest(list_distinct(
        |          (string_split_regex(lower(trim(text)), '\s+'))[1:6])) AS term
        |      FROM ev),
        |qq AS (SELECT query_id, term FROM q WHERE length(term) > 0),
        |c AS (SELECT qq.query_id, tf.doc_id,
        |        ln(1 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
        |          * tf.tf * 2.2
        |          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
        |               / (CAST(s.tot_len AS DOUBLE) / s.n_docs))) AS contrib
        |      FROM tf JOIN qq USING (term) JOIN dft USING (term)
        |      JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s),
        |sc AS (SELECT query_id, doc_id, round(sum(contrib), 6) AS score
        |       FROM c GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |                                   ORDER BY score DESC, doc_id) AS rank
        |      FROM sc)
        |SELECT query_id, doc_id, score, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10""".stripMargin,

    // identical ground truth to q108 (LlmQueries) on purpose: the batch
    // crossCorpusNearDups and the stream-static index matcher are two
    // implementations of the same contract
    "q128_stream_bloom_dedup" ->
      """WITH ref AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        |incoming AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM ref ORDER BY doc_id LIMIT 20)),
        |rf AS (SELECT DISTINCT
        |         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
        |       FROM ref)
        |SELECT b.doc_id FROM incoming b
        |LEFT JOIN rf
        |  ON rf.h = md5(regexp_replace(lower(trim(b.text)), '\s+', ' ', 'g'))
        |WHERE rf.h IS NULL""".stripMargin,

    // q146's identical-answers SQL: the streamed (two-drop) store must be
    // indistinguishable from the one-shot store over the union
    "q182_stream_store_ingest" ->
      """WITH newdocs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |refdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        |shn AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM newdocs)),
        |shr AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM refdocs)),
        |pairs AS (
        |  SELECT n.doc_id AS new_id, r.doc_id AS ref_id,
        |         CAST(len(list_intersect(n.s, r.s)) AS DOUBLE)
        |           / len(list_distinct(list_concat(n.s, r.s))) AS j
        |  FROM shn n CROSS JOIN shr r)
        |SELECT new_id, ref_id, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.7""".stripMargin,

    "q109_stream_corpus_match" ->
      """WITH newdocs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM
        |    (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |refdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        |shn AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM newdocs)),
        |shr AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |        FROM refdocs)),
        |pairs AS (
        |  SELECT n.doc_id AS new_id, r.doc_id AS ref_id,
        |         CAST(len(list_intersect(n.s, r.s)) AS DOUBLE)
        |           / len(list_distinct(list_concat(n.s, r.s))) AS j
        |  FROM shn n CROSS JOIN shr r)
        |SELECT new_id, ref_id, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.7""".stripMargin,

    "q88_stream_window" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |       count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q77_stream_dedup" ->
      """SELECT DISTINCT
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents""".stripMargin,

    "q39_sliding_window" ->
      """WITH buckets AS (
        |  SELECT strftime(date_trunc('hour', ts) - INTERVAL (k) HOUR,
        |                  '%Y-%m-%d %H:%M') AS window_start,
        |         event_type, value
        |  FROM events CROSS JOIN (VALUES (0), (1)) AS offsets(k))
        |SELECT window_start, event_type, count(*) AS n,
        |       round(sum(value), 2) AS total_value
        |FROM buckets GROUP BY 1, 2""".stripMargin,

    "q64_asof_join" ->
      """WITH l AS (
        |  SELECT event_id, ts, user_id FROM events WHERE event_id % 5 <> 0),
        |r AS (
        |  SELECT user_id, ts, value AS ref_value FROM events
        |  WHERE event_id % 5 = 0)
        |SELECT l.user_id, count(*) AS n, count(r.ref_value) AS n_matched,
        |       round(coalesce(sum(r.ref_value), 0.0), 2) AS ref_sum
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |GROUP BY l.user_id""".stripMargin,

    // lag+cumsum sessions over the same planted timeline; closed = every
    // session whose gap deadline precedes the final watermark (max ts) —
    // i.e. everything except the far-future sentinel's own session
    "q91_stream_sessionize" ->
      """WITH ev AS (
        |  SELECT event_id % 40 AS user_id, event_id, value,
        |         make_timestamp(1704067200000000 +
        |           CASE WHEN event_id = 0 THEN 2592000000000
        |                ELSE ((event_id // 40) // 4) * 7200000000
        |                     + ((event_id // 40) % 4) * 300000000 END) AS ts
        |  FROM events),
        |x AS (SELECT user_id, ts, event_id, value,
        |        CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) <= 30*60*1000
        |             THEN 0 ELSE 1 END AS new_s
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, value,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM x),
        |g AS (SELECT user_id, sid, min(ts) AS session_start, max(ts) AS session_end,
        |        count(*) AS n_events, round(sum(value), 2) AS total_value
        |      FROM s GROUP BY 1, 2)
        |SELECT user_id,
        |       strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
        |       CAST(n_events AS BIGINT) AS n_events, total_value
        |FROM g
        |WHERE epoch_ms(session_end) + 30*60*1000 <
        |      (SELECT max(epoch_ms(ts)) FROM ev)""".stripMargin,

    "q40_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) <= 30*60*1000
        |         THEN 0 ELSE 1 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, count(DISTINCT sid) AS n_sessions,
        |       count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM s GROUP BY user_id""".stripMargin,

    // session_window merges on STRICT overlap: gap < 30min (an event
    // exactly 30min after its predecessor opens a new session)
    "q101_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) < 30*60*1000
        |         THEN 0 ELSE 1 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, count(DISTINCT sid) AS n_sessions,
        |       count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM s GROUP BY user_id""".stripMargin,

    "q102_interval_join" ->
      """WITH w AS (
        |  SELECT user_id, k,
        |         epoch_ms(1704153600000 + k * 21600000) AS ws,
        |         epoch_ms(1704153600000 + k * 21600000 + 5400000) AS we
        |  FROM (SELECT DISTINCT user_id FROM events)
        |  CROSS JOIN (SELECT unnest(range(0, 3)) AS k))
        |SELECT e.user_id, CAST(w.k AS INT) AS k, count(*) AS n,
        |       round(sum(e.value), 2) AS v
        |FROM events e JOIN w
        |  ON e.user_id = w.user_id AND e.ts BETWEEN w.ws AND w.we
        |GROUP BY 1, 2""".stripMargin
  )
}
