package graft

import graft.eval.{Matching, EvalBox}
import graft.split.Costs
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Seeded generator sampling without the scalatestplus bridge (not in the
  * offline dependency cache): draw n deterministic samples from a Gen. */
trait GenSampling {
  def forAllSampled[T](gen: Gen[T], n: Int = 200)(check: T => Unit): Unit = {
    var seed = Seed(42L)
    var drawn = 0
    while (drawn < n) {
      gen.apply(Gen.Parameters.default, seed).foreach { t => check(t); drawn += 1 }
      seed = seed.next
    }
  }
}

/** Property-based invariants over the non-relational kernels — the
  * structural guarantees that must hold for EVERY input, not just the
  * fixtures: matcher bijectivity, PR monotonicity, cost-kernel axioms. */
class MatcherPropertySpec extends AnyFunSuite with GenSampling {

  private val boxGen = for {
    x <- Gen.choose(0.0, 90.0)
    y <- Gen.choose(0.0, 90.0)
    w <- Gen.choose(1.0, 30.0)
    h <- Gen.choose(1.0, 30.0)
  } yield (x, y, w, h)

  private val scenarioGen = for {
    nGt <- Gen.choose(0, 8)
    nPred <- Gen.choose(0, 12)
    gts <- Gen.listOfN(nGt, boxGen)
    preds <- Gen.listOfN(nPred, boxGen)
    confs <- Gen.listOfN(nPred, Gen.choose(0.0, 1.0))
    minIou <- Gen.oneOf(0.0, 0.3, 0.5)
  } yield (gts, preds.zip(confs), minIou)

  test("matcher: every box appears exactly once; matches are 1:1; iou respects threshold") {
    forAllSampled(scenarioGen) { case (gts, preds, minIou) =>
      val boxes =
        gts.zipWithIndex.map { case ((x, y, w, h), i) =>
          EvalBox(i.toLong, 0L, 0, x, y, w, h, 0.0, groundtruth = true) } ++
        preds.zipWithIndex.map { case (((x, y, w, h), c), i) =>
          EvalBox(100L + i, 0L, 0, x, y, w, h, c, groundtruth = false) }
      val rows = MatchAccess.matchGroup(boxes.iterator, minIou).toSeq

      // every prediction appears exactly once
      val predIds = rows.flatMap(_.prediction_id)
      assert(predIds.sorted == preds.indices.map(100L + _).sorted)
      // every gt appears exactly once (matched or as FN row)
      val gtIds = rows.flatMap(_.groundtruth_id)
      assert(gtIds.sorted == gts.indices.map(_.toLong).sorted)
      // matches are one-to-one
      val matchedGt = rows.filter(_.prediction_id.isDefined).flatMap(_.groundtruth_id)
      assert(matchedGt.distinct.size == matchedGt.size)
      // every committed match is strictly above the threshold
      rows.filter(r => r.prediction_id.isDefined && r.groundtruth_id.isDefined)
        .foreach(r => assert(r.iou > minIou))
    }
  }
}

/** Expose the private matcher kernel to the property suite. */
object MatchAccess {
  def matchGroup(boxes: Iterator[EvalBox], minIou: Double) =
    graft.eval.Matching.testMatchGroup(boxes, minIou)
}

class CostPropertySpec extends AnyFunSuite with GenSampling {

  private val histGen = Gen.choose(2, 12).flatMap(n =>
    Gen.listOfN(n, Gen.choose(0.0, 100.0)).map(_.toArray))

  test("KL is non-negative and zero iff identical distributions") {
    forAllSampled(histGen) { h =>
      if (h.sum > 0) {
        val p = Costs.normalize(h)
        assert(Costs.klDivergence(p, p) < 1e-12)
        assert(Costs.klDivergence(p, p) >= 0.0)
      }
    }
  }

  test("EMD is symmetric, non-negative, and zero on identical histograms") {
    forAllSampled(Gen.zip(histGen, histGen)) { case (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      if (n >= 2 && a0.take(n).sum > 0 && b0.take(n).sum > 0) {
        val p = Costs.normalize(a0.take(n))
        val q = Costs.normalize(b0.take(n))
        val d1 = Costs.emd1d(p, q)
        val d2 = Costs.emd1d(q, p)
        assert(math.abs(d1 - d2) < 1e-9)
        assert(d1 >= -1e-12)
        assert(Costs.emd1d(p, p) < 1e-12)
      }
    }
  }

  test("share distance is in [0,1] and zero iff proportional") {
    forAllSampled(histGen) { h =>
      if (h.length >= 2 && h.sum > 0) {
        val p = Costs.normalize(h)
        assert(Costs.shareDistance(p, p) < 1e-12)
        val d = Costs.shareDistance(p, Costs.normalize(h.reverse))
        assert(d >= -1e-12 && d <= 1.0 + 1e-12)
      }
    }
  }
}

/** Property-level bit-identity of the fused native expressions against
  * their built-in formulations, over randomized arrays including unicode,
  * empty strings and whitespace — the fixtures in LlmSpec cover structured
  * corpora; this covers the byte-level encoding edges. All samples batch
  * into ONE DataFrame per comparison, so the property runs in a handful of
  * Spark actions. */
class FusedExpressionPropertySpec extends SparkFunSuite with GenSampling {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.functions.GraftFunctions

  private val tokGen = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const(""), Gen.const(" "), Gen.const("\ttab"),
    Gen.oneOf("héllo", "日本語テキスト", "a b c", "ß", "émoji🙂", "кириллица"))
  private val arrGen = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, tokGen))

  private def stringArrays(n: Int) = {
    val samples = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    forAllSampled(arrGen, n)(s => samples += s)
    samples.toSeq.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "sh")
  }

  test("minhash fused == aggregate path on random unicode arrays") {
    val df = stringArrays(150).filter(size(col("sh")) > 0).cache()
    val agg = graft.llm.Dedup.minHashSignatures(df, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val fused = df.select(col("id"),
      GraftFunctions.minhashSig(spark, col("sh"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    df.unpersist()
    assert(agg == fused)
  }

  test("simhash fused == vote-aggregate formulation on random unicode arrays") {
    def refSimhash(arr: org.apache.spark.sql.Column) = {
      val hexes = transform(arr, t => md5(t))
      val bits = (0 until 64).map { bit =>
        val vote = aggregate(hexes, lit(0), (acc, h) =>
          acc + when(shiftright(conv(substring(h, 16 - bit / 4, 1), 16, 10)
            .cast("int"), bit % 4).bitwiseAND(1) === 1, 1).otherwise(-1))
        when(vote > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
      }
      bits.reduce(_.bitwiseOR(_))
    }
    val df = stringArrays(100)
    val both = df.select(refSimhash(col("sh")).as("ref"),
      GraftFunctions.simhash64(spark, col("sh")).as("fused"))
    assert(both.filter(col("ref") =!= col("fused")).count() == 0)
  }

  test("gramstats fused == explode/groupBy counts on random unicode arrays") {
    val df = stringArrays(150).filter(size(col("sh")) > 0).cache()
    val agg = df.select(col("id"), explode(col("sh")).as("t"))
      .groupBy("id", "t").agg(count(lit(1)).as("n"))
      .groupBy("id").agg(max("n").as("top"), sum("n").as("total"),
        sum(when(col("n") > 1, col("n")).otherwise(0L)).as("dup"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val fused = df.select(col("id"), GraftFunctions.gramStats(spark, col("sh")).as("s"))
      .select(col("id"), col("s.top_count"), col("s.total"), col("s.dup_total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    df.unpersist()
    assert(agg == fused)
  }

  test("word-shingles fused == transform/slice/concat_ws formulation (±distinct)") {
    val df = stringArrays(150)
    for (n <- Seq(1, 2, 3, 5)) {
      val ref = df.select(col("id"),
        graft.llm.Dedup.shinglesOfWords(col("sh"), n).as("r"),
        array_distinct(graft.llm.Dedup.shinglesOfWords(col("sh"), n)).as("rd"),
        GraftFunctions.wordShingles(spark, col("sh"), n, distinct = false).as("f"),
        GraftFunctions.wordShingles(spark, col("sh"), n, distinct = true).as("fd"))
      assert(ref.filter(not(col("r") === col("f"))).count() == 0, s"plain mismatch n=$n")
      assert(ref.filter(not(col("rd") === col("fd"))).count() == 0, s"distinct mismatch n=$n")
    }
  }

  test("sig-overlap fused == estimatedJaccard on random signature pairs") {
    val sigGen = Gen.listOfN(16, Gen.choose(Long.MinValue, Long.MaxValue))
    val pairGen = Gen.zip(sigGen, sigGen).flatMap { case (a, b) =>
      // mix in near-identical pairs so the equal branch is exercised
      Gen.oneOf((a, b), (a, a), (a, a.updated(3, 7L)))
    }
    val samples = scala.collection.mutable.ArrayBuffer[(Seq[Long], Seq[Long])]()
    forAllSampled(pairGen, 150)(s => samples += s)
    val df = samples.toSeq.toDF("a", "b")
    val both = df.select(
      graft.llm.Dedup.estimatedJaccard(col("a"), col("b")).as("ref"),
      GraftFunctions.sigOverlap(spark, col("a"), col("b")).as("fused"))
    assert(both.filter(col("ref") =!= col("fused")).count() == 0)
    // empty-signature edge: built-in divides 0/0 to null; fused must match
    val empty = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
      .select(GraftFunctions.sigOverlap(spark, col("a"), col("b")))
      .collect()(0)
    assert(empty.isNullAt(0))
  }

  test("hyperplane fused == built-in formulation on random vectors") {
    val vecGen = Gen.choose(0, 16).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.choose(-5.0, 5.0), Gen.const(0.0))))
    val samples = scala.collection.mutable.ArrayBuffer[Seq[Double]]()
    forAllSampled(vecGen, 150)(s => samples += s)
    val df = samples.toSeq.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "v")
    val both = df.select(
      graft.llm.Similarity.hyperplaneSignature(col("v"), 16).as("ref"),
      GraftFunctions.hyperplaneSig(spark, col("v"), 16).as("fused"))
    assert(both.filter(col("ref") =!= col("fused")).count() == 0)
  }
}

class BinningPropertySpec extends AnyFunSuite with GenSampling {
  import graft.operators.Grouper

  test("equal-width edges are monotone, span [min,max], and end exactly at max") {
    forAllSampled(Gen.zip(Gen.listOfN(30, Gen.choose(-1000.0, 1000.0)), Gen.choose(2, 10))) {
      case (vals, bins) =>
        if (vals.nonEmpty && vals.distinct.size > 1) {
          val lo = vals.min
          val hi = vals.max
          val edges = (0 to bins).map(i => lo + (hi - lo) * i / bins).toArray
          edges(bins) = hi // the Grouper's pinning rule
          assert(edges.head == lo && edges.last == hi)
          assert(edges.sliding(2).forall(a => a(0) <= a(1)))
        }
    }
  }
}
