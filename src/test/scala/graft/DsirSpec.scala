package graft

import graft.llm.{Dsir, Sampling}
import org.apache.spark.sql.functions._

/** Semantic properties of DSIR importance resampling and UniMax budget
  * allocation — the gate oracles (q140/q141) lock the arithmetic; these
  * lock the BEHAVIOR the papers promise. */
class DsirSpec extends SparkFunSuite {
  import spark.implicits._

  private def corpus() = {
    // 40 "sciencey" docs (target-like), 40 junk docs, sharing no vocabulary
    val sci = (0L until 40L).map(i => (i,
      s"the experiment measured quantum decoherence rates in cavity $i " +
        "with superconducting qubits and microwave resonators"))
    val junk = (100L until 140L).map(i => (i,
      s"click here buy now $i cheap deals free shipping limited offer " +
        "subscribe win prizes instant bonus"))
    (sci ++ junk).toDF("doc_id", "text")
  }

  test("importance weights separate target-like docs from junk") {
    val raw = corpus()
    val target = raw.filter(col("doc_id") < 40) // the science half
    val w = Dsir.importanceWeights(raw, target, buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sci = (0L until 40L).map(w)
    val junk = (100L until 140L).map(w)
    // every science doc outweighs every junk doc
    assert(sci.min > junk.max,
      s"sci min ${sci.min} should exceed junk max ${junk.max}")
  }

  test("resample is deterministic, k-sized, and prefers target-like docs") {
    val raw = corpus()
    val target = raw.filter(col("doc_id") < 40)
    val sel1 = Dsir.resample(raw, target, k = 30, buckets = 256, salt = "s")
      .select("doc_id").as[Long].collect().toSet
    val sel2 = Dsir.resample(raw, target, k = 30, buckets = 256, salt = "s")
      .select("doc_id").as[Long].collect().toSet
    assert(sel1 === sel2)
    assert(sel1.size == 30)
    // the weight gap here is huge (disjoint vocab), so Gumbel noise can't
    // promote junk: the selection is exactly the 30 noisiest science docs
    assert(sel1.forall(_ < 40L))
    // a different salt redraws the noise (selection may differ in order;
    // membership still all-science)
    val sel3 = Dsir.resample(raw, target, k = 30, buckets = 256, salt = "t")
      .select("doc_id").as[Long].collect().toSet
    assert(sel3.forall(_ < 40L))
  }

  test("zero-gram documents are absent from weights") {
    val raw = corpus().unionByName(
      Seq((999L, ""), (998L, "   ")).toDF("doc_id", "text"))
    val target = raw.filter(col("doc_id") < 40)
    val ids = Dsir.importanceWeights(raw, target, buckets = 256)
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(999L) && !ids.contains(998L))
    assert(ids.size == 80)
  }

  test("uniMax: caps bind for small languages, water level for large ones") {
    val perLang = Seq(("tiny", 100L), ("small", 500L), ("big", 10000L),
      ("huge", 50000L)).toDF("lang", "n_tokens")
    // budget 30000, 2 epochs: caps are 200/1000/20000/100000; greedy:
    // 200 <= 30000/4 yes; 1000 <= 29800/3 yes; 20000 <= 28800/2? no ->
    // big and huge split 28800/2 = 14400 each
    val out = Sampling.uniMaxAllocation(perLang, 30000L, 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    assert(out("tiny") === ((200.0, 2.0)))
    assert(out("small") === ((1000.0, 2.0)))
    assert(out("big") === ((14400.0, 1.44)))
    assert(out("huge") === ((14400.0, 0.288)))
    // invariants: budget exactly consumed, nobody above the epoch cap
    assert(out.values.map(_._1).sum === 30000.0)
    assert(out.values.forall(_._2 <= 2.0))
  }

  test("uniMax: budget above total caps leaves the surplus unallocated") {
    val perLang = Seq(("a", 100L), ("b", 200L)).toDF("lang", "n_tokens")
    val out = Sampling.uniMaxAllocation(perLang, 10000L, 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("a") === 200.0 && out("b") === 400.0) // caps, not budget
  }
}
