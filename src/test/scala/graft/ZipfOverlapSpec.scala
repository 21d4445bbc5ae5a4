package graft

import graft.llm.Corpus
import org.apache.spark.sql.functions._

/** Zipf rank-frequency fit and the inter-source overlap matrix. */
class ZipfOverlapSpec extends SparkFunSuite {
  import spark.implicits._

  test("zipfFit recovers an exact two-point line") {
    // counts: a=8 (rank 1, x=0, y=ln8), b=2 (rank 2, x=ln2, y=ln2)
    // OLS through two points is the line through them:
    // slope = (ln2 - ln8)/ln2 = -2, intercept = ln8, r2 = 1
    val docs = Seq((1L, "a a a a a a a a b b")).toDF("doc_id", "text")
    val r = Corpus.zipfFit(docs, topN = 10).collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == -2.0)
    assert(r.getDouble(2) == BigDecimal(math.log(8))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(3) == 1.0)
  }

  test("zipfFit is deterministic and caps points at the vocabulary size") {
    val docs = Seq((1L, "w1 w1 w1 w2 w2 w3")).toDF("doc_id", "text")
    val a = Corpus.zipfFit(docs, topN = 200).collect()(0)
    val b = Corpus.zipfFit(docs, topN = 200).collect()(0)
    assert(a == b && a.getLong(0) == 3L)
  }

  test("sourceOverlapMatrix counts shared distinct fingerprints per pair") {
    val docs = Seq(
      ("A", "t one"), ("A", "t two"), ("A", "t two"), // dup collapses
      ("B", "t one"), ("B", "t three"),
      ("C", "t three")).toDF("source", "text")
    val got = Corpus.sourceOverlapMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("A", "A") -> 2L, ("A", "B") -> 1L, ("B", "B") -> 2L,
      ("B", "C") -> 1L, ("C", "C") -> 1L))
  }

  test("sourceOverlapMatrix normalizes whitespace and drops null texts") {
    val docs = Seq(
      ("A", "x  y"), ("B", " x y "), ("C", null: String))
      .toDF("source", "text")
    val got = Corpus.sourceOverlapMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("A", "A") -> 1L, ("A", "B") -> 1L, ("B", "B") -> 1L))
  }
}
