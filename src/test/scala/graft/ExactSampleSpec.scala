package graft

import graft.llm.{Corpus, Sampling}
import org.apache.spark.sql.functions._

/** Exact-k deterministic sampling and n-gram novelty. */
class ExactSampleSpec extends SparkFunSuite {
  import spark.implicits._

  private def docs100 = (0L until 100L).map(i => (i, s"lang${i % 3}"))
    .toDF("doc_id", "lang")

  test("sampleExactK returns exactly k rows and matches the hash order") {
    val df = docs100
    val got = Sampling.sampleExactK(df, col("doc_id"), k = 10, salt = "s")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = df
      .withColumn("u", Sampling.hashUniform(col("doc_id"), "s"))
      .orderBy(col("u"), col("doc_id")).limit(10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.size == 10 && got == expected)
  }

  test("sampleExactK samples are prefix-nested across k") {
    val small = Sampling.sampleExactK(docs100, col("doc_id"), 10, "s")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Sampling.sampleExactK(docs100, col("doc_id"), 25, "s")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }

  test("sampleExactKPerGroup takes min(k, group size) from every group") {
    val got = Sampling.sampleExactKPerGroup(docs100, "lang", col("doc_id"),
        k = 7, salt = "s")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("lang0" -> 7L, "lang1" -> 7L, "lang2" -> 7L))
    // a group smaller than k yields its full membership
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "lang")
    val got2 = Sampling.sampleExactKPerGroup(tiny, "lang", col("doc_id"), 5)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 == Map("a" -> 2L, "b" -> 1L))
  }

  test("sampleExactKPerGroup equals the per-group brute force") {
    val brute = docs100
      .withColumn("u", Sampling.hashUniform(col("doc_id"), "s"))
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getLong(0)))
      .groupBy(_._1).values
      .flatMap(_.sortBy(t => (t._2, t._3)).take(4).map(_._3)).toSet
    val got = Sampling.sampleExactKPerGroup(docs100, "lang", col("doc_id"),
        k = 4, salt = "s")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == brute)
  }

  test("ngramNovelty hits the closed-form rates") {
    val ref = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    // doc 1: identical -> trigrams {abc, bcd, cde} all in ref -> 0
    // doc 2: disjoint -> 1
    // doc 3: "a b c d x": {abc, bcd, cdx} -> 1/3 novel
    // doc 4: two tokens -> the whole-text gram "q r", absent -> 1
    val docs = Seq(
      (1L, "a b c d e"), (2L, "u v w x y"), (3L, "a b c d x"), (4L, "q r"))
      .toDF("doc_id", "text")
    val got = Corpus.ngramNovelty(docs, ref, n = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == ((3L, 0L, 0.0)))
    assert(got(2L) == ((3L, 3L, 1.0)))
    assert(got(3L)._1 == 3L && got(3L)._2 == 1L
      && math.abs(got(3L)._3 - 1.0 / 3) < 1e-12)
    assert(got(4L) == ((1L, 1L, 1.0)))
  }

  test("ngramNovelty broadcastRef path returns identical answers") {
    val ref = Seq((100L, "a b c d e"), (101L, "f g h i")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b c d e f"), (2L, "z z z")).toDF("doc_id", "text")
    def run(b: Boolean) = Corpus.ngramNovelty(docs, ref, 3, broadcastRef = b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(true) == run(false))
  }
}
