package graft

import graft.llm.{Corpus, Scrub}
import org.apache.spark.sql.functions._

class ScrubSpec extends SparkFunSuite {
  import spark.implicits._

  test("redactPii replaces emails, IPs and phones; staging keeps them distinct") {
    val docs = Seq(
      (1L, "mail me at bob.smith+x@corp.example.org today"),
      (2L, "server 192.168.0.1 is down, call +1 (555) 010-1234"),
      (3L, "no pii here at all"),
      (4L, "a@b.io and 10.0.0.7 and 555-010-9999 x")
    ).toDF("doc_id", "text")

    val red = Scrub.scrub(docs).as[(Long, String)].collect().toMap
    assert(red(1L) == "mail me at [EMAIL] today")
    assert(red(2L) == "server [IP] is down, call [PHONE]")
    assert(red(3L) == "no pii here at all")
    assert(red(4L) == "[EMAIL] and [IP] and [PHONE] x")

    val counts = Scrub.piiCounts(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(counts(1L) == ((1, 0, 0)))
    // the IP is counted as an IP, not double-counted as a phone-shaped run
    assert(counts(2L) == ((0, 1, 1)))
    assert(counts(3L) == ((0, 0, 0)))
    assert(counts(4L) == ((1, 1, 1)))
  }

  test("topNgrams counts bigrams with doc frequency and deterministic ties") {
    val docs = Seq(
      (1L, "a b a b c"),
      (2L, "a b x"),
      (3L, "z")
    ).toDF("doc_id", "text")
    val top = Corpus.topNgrams(docs, n = 2, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "a b": 3 occurrences across docs 1+2; then ties broken alphabetically
    assert(top.head == (("a b", 3L, 2L)))
    assert(top.toSeq == top.toSeq.sortBy(t => (-t._2, t._1)))
    // the single-word doc contributes its whole text as one "shingle"
    val all = Corpus.topNgrams(docs, n = 2, k = 100).collect().map(_.getString(0))
    assert(all.contains("z"))
  }
}
