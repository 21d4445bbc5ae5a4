package graft

import graft.llm.Pq
import org.apache.spark.sql.functions._

class PqSpec extends SparkFunSuite {
  import spark.implicits._

  // 4-dim vectors, m=2 subspaces of 2 dims; hand-picked codebooks
  private val codebooks: Seq[Seq[Array[Double]]] = Seq(
    Seq(Array(0.0, 0.0), Array(10.0, 10.0)),
    Seq(Array(0.0, 5.0), Array(5.0, 0.0)))

  private def corpus() = Seq(
    (0L, Seq(1.0f, 1.0f, 0.0f, 4.0f)),   // codes (0, 0)
    (1L, Seq(9.0f, 9.0f, 4.0f, 1.0f)),   // codes (1, 1)
    (2L, Seq(11.0f, 12.0f, 1.0f, 5.0f))  // codes (1, 0)
  ).toDF("vec_id", "embedding")

  test("encode picks the argmin centroid per subspace") {
    val codes = Pq.encode(corpus(), codebooks)
      .select("vec_id", "pq_codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codes == Map(0L -> Seq(0, 0), 1L -> Seq(1, 1), 2L -> Seq(1, 0)))
  }

  test("encode breaks exact distance ties toward the lower centroid index") {
    val cb = Seq(Seq(Array(1.0, 0.0), Array(-1.0, 0.0)))
    val codes = Pq.encode(Seq((0L, Seq(0.0f, 9.0f))).toDF("vec_id", "embedding"), cb)
      .select("pq_codes").collect().head.getSeq[Int](0)
    assert(codes == Seq(0))
  }

  test("adcTopK ranks by reconstructed distance with id tiebreak") {
    // query = vector 0 itself: ADC distance to 0 is the quantization
    // residual; doc 1 reconstructs far away
    val q = Seq((7L, Seq(1.0f, 1.0f, 0.0f, 4.0f))).toDF("query_id", "embedding")
    val out = Pq.adcTopK(Pq.encode(corpus(), codebooks), q, codebooks, k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(0L, 2L, 1L))
    // exact ADC arithmetic for vec 0: sub0 → cent(0,0): (1,1) → 2.0;
    // sub1 → cent(0,5): (0,4) → 0+1 = 1.0 → 3.0 total
    assert(out.head.getAs[Double]("adist") == 3.0)
  }

  test("null embeddings never outrank real neighbors (corpus or query side)") {
    val corpus = Seq(
      (0L, Some(Seq(1.0f, 1.0f, 0.0f, 4.0f))),
      (1L, Some(Seq(9.0f, 9.0f, 4.0f, 1.0f))),
      (2L, None: Option[Seq[Float]])
    ).toDF("vec_id", "embedding")
    val q = Seq(
      (7L, Some(Seq(1.0f, 1.0f, 0.0f, 4.0f))),
      (8L, None: Option[Seq[Float]])
    ).toDF("query_id", "embedding")
    val out = Pq.adcTopK(Pq.encode(corpus, codebooks), q, codebooks, k = 5)
      .collect()
    assert(out.forall(_.getAs[Long]("query_id") == 7L)) // null query emits nothing
    assert(out.map(_.getAs[Long]("vec_id")).toSet == Set(0L, 1L)) // null row absent
    assert(out.minBy(_.getAs[Int]("rank")).getAs[Long]("vec_id") == 0L)
  }

  test("trainCodebooks: shapes, determinism, and better reconstruction than one centroid") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val cb = Pq.trainCodebooks(embs, m = 4, ncentroids = 4)
    assert(cb.length == 4 && cb.forall(_.length == 4) &&
      cb.forall(_.forall(_.length == 16)))
    val cb2 = Pq.trainCodebooks(embs, m = 4, ncentroids = 4)
    assert(cb.flatten.flatten == cb2.flatten.flatten) // seeded → identical
    // codes use the whole codebook, not one centroid
    val used = Pq.encode(embs, cb).select(explode(col("pq_codes"))).distinct().count()
    assert(used > 1)
  }

  test("ivfAdcTopK: nprobe=all equals the full ADC scan; nprobe=1 stays in-cell") {
    val d = "/root/testdata/sf0.001"
    val embs = Tables.embeddings(spark, d).select("vec_id", "embedding")
    val cbs = graft.queries.CorpusRetrievalQueries.pqCodebooks(spark, d)
    val cells = graft.queries.CorpusRetrievalQueries.pqCells(spark, d)
    val enc = Pq.assignCells(Pq.encode(embs, cbs), cells)
    val q = embs.filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val full = Pq.adcTopK(enc, q, cbs, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val all = Pq.ivfAdcTopK(enc, q, cbs, cells, nprobe = cells.size, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(all == full)
    // nprobe=1: every hit lives in its query's own best cell
    val one = Pq.ivfAdcTopK(enc, q, cbs, cells, nprobe = 1, k = 5)
    val cellOf = enc.select("vec_id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qCell = Pq.assignCells(q, cells, vecCol = "embedding")
      .select("query_id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    one.collect().foreach { r =>
      assert(cellOf(r.getAs[Long]("vec_id")) == qCell(r.getAs[Long]("query_id")))
    }
  }

  test("gate margin tripwire: q121 encode argmins are not ulp-close") {
    // The oracle recomputes the same argmin with its own float ops; assert
    // every (vec, subspace) best-vs-second-best gap is far above the
    // cross-engine ulp noise floor: 16-term double sums of O(100) values
    // carry ≲1e-12 absolute reorder noise, so a 1e-9 bar leaves 3 orders
    // of margin (measured corpus minimum: ~9e-7).
    val d = "/root/testdata/sf0.01"
    val embs = Tables.embeddings(spark, d).select("vec_id", "embedding")
    val cbs = graft.queries.CorpusRetrievalQueries.pqCodebooks(spark, d)
    val v = col("embedding").cast("array<double>")
    val gaps = embs.select((0 until 4).map { j =>
      val dists = cbs(j).map { cent =>
        aggregate(zip_with(slice(v, j * 16 + 1, 16), typedLit(cent.toSeq),
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
      }
      val arr = array_sort(array(dists: _*))
      (element_at(arr, 2) - element_at(arr, 1)).as(s"gap_$j")
    }: _*)
    val minGap = gaps.agg(least(
      min(col("gap_0")), min(col("gap_1")),
      min(col("gap_2")), min(col("gap_3")))).head().getDouble(0)
    assert(minGap > 1e-9, s"argmin margin too small: $minGap")
  }
}
