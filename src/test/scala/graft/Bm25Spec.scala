package graft

import graft.llm.Corpus
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkFunSuite {
  import spark.implicits._

  private def corpus() = Seq(
    (0L, "a b"),
    (1L, "a a"),
    (2L, "c"),
    (3L, "b b b c")
  ).toDF("doc_id", "text")

  test("bm25TopK matches the hand-computed Okapi formula") {
    // query 'a': N=4, df(a)=2, idf = ln(1 + 2.5/2.5) = ln 2
    // avgdl = (2+2+1+4)/4 = 2.25
    // doc0: tf=1,dl=2 → ln2·2.2/(1+1.2·(0.25+0.75·2/2.25))
    // doc1: tf=2,dl=2 → ln2·2·2.2/(2+1.2·(0.25+0.75·2/2.25))
    val q = Seq((100L, "a")).toDF("query_id", "query")
    val out = Corpus.bm25TopK(corpus(), q, k = 5).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"), r.getAs[Int]("rank")))
      .sortBy(_._3)
    assert(out.map(_._1).toSeq == Seq(1L, 0L)) // tf=2 beats tf=1
    val idf = math.log(2.0)
    val denPart = 1.2 * (0.25 + 0.75 * 2 / 2.25)
    val exp0 = idf * 1 * 2.2 / (1 + denPart)
    val exp1 = idf * 2 * 2.2 / (2 + denPart)
    assert(math.abs(out(0)._2 - exp1) < 1e-6)
    assert(math.abs(out(1)._2 - exp0) < 1e-6)
  }

  test("repeated query terms don't multiply; k caps; unknown terms score nothing") {
    val q = Seq((1L, "a a a"), (2L, "zzz"), (3L, "b c")).toDF("query_id", "query")
    val rows = Corpus.bm25TopK(corpus(), q, k = 2).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    // q1 same result as single 'a'
    assert(byQ(1L).map(_.getAs[Long]("doc_id")).toSet == Set(0L, 1L))
    // q2: no matches at all
    assert(!byQ.contains(2L))
    // q3: doc3 has b(3)+c(1), doc2 c, doc0 b — k=2 keeps the best two
    assert(byQ(3L).length == 2)
    assert(byQ(3L).minBy(_.getAs[Int]("rank")).getAs[Long]("doc_id") == 3L)
  }

  test("idf is non-negative even for terms in every document") {
    val docs = Seq((0L, "x y"), (1L, "x z")).toDF("doc_id", "text")
    val q = Seq((9L, "x")).toDF("query_id", "query")
    val scores = Corpus.bm25TopK(docs, q, k = 5).collect().map(_.getAs[Double]("score"))
    assert(scores.length == 2 && scores.forall(_ > 0))
  }
}
