package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions._

class DupSpanSpec extends SparkFunSuite {
  import spark.implicits._

  test("dupSpanStats covers exactly the duplicated windows' token ranges") {
    // docs 0/1 share tokens 0..4 ("a b c d e") → with n=3, windows at
    // positions 0,1,2 are shared → tokens 0..4 covered in both; doc 0's
    // tail "x y z" and doc 1's tail "p q r" stay uncovered.
    val docs = Seq(
      (0L, "a b c d e x y z"),
      (1L, "a b c d e p q r"),
      (2L, "totally unrelated words here") // 4 tokens, has windows, none dup
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(docs, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("covered_tokens"),
          r.getAs[Double]("coverage")))).toMap
    assert(out(0L) == ((8L, 5L, 5.0 / 8)))
    assert(out(1L) == ((8L, 5L, 5.0 / 8)))
    assert(out(2L) == ((4L, 0L, 0.0)))
  }

  test("a window repeated INSIDE one document counts as duplicated") {
    val docs = Seq((0L, "u v w x u v w y")).toDF("doc_id", "text")
    // n=3: "u v w" at 0 and 4 → covered 0,1,2 and 4,5,6 → 6 of 8
    val r = Dedup.dupSpanStats(docs, n = 3).collect().head
    assert(r.getAs[Long]("covered_tokens") == 6L)
  }

  test("documents shorter than n have zero windows and zero coverage") {
    val docs = Seq((0L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    val rows = Dedup.dupSpanStats(docs, n = 3).collect()
    assert(rows.forall(_.getAs[Long]("covered_tokens") == 0L))
    assert(rows.forall(_.getAs[Double]("coverage") == 0.0))
  }

  test("removeDupSpanDocs drops docs at or above the coverage threshold") {
    val docs = Seq(
      (0L, "a b c d e f"),        // full dup of 1 → coverage 1.0
      (1L, "a b c d e f"),
      (2L, "a b c q r s")         // shares only window "a b c" → 3/6 = 0.5
    ).toDF("doc_id", "text")
    val kept = Dedup.removeDupSpanDocs(docs, n = 3, maxCoverage = 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
    val keptAll = Dedup.removeDupSpanDocs(docs, n = 3, maxCoverage = 0.4)
    assert(keptAll.count() == 0)
  }
}
