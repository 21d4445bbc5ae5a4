package graft

import graft.model.GraftDataset
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders + the canonical "dataset view" used by the correctness
  * gate: a deterministic mapping of the TPC-H-ish tables onto the engine's
  * two-table image/annotation model (orders → images, lineitem →
  * annotations), expressible identically in ANSI SQL so every dataset
  * operator can be validated against a DuckDB oracle over the same parquet.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  /** events.ts has shipped as either parquet TIMESTAMP(NANOS) (older
    * generator runs — Spark's vectorized reader rejects it, so it is read
    * as a nanos long) or TIMESTAMP(MICROS) without UTC adjustment (newer
    * runs — Spark reads it as TIMESTAMP_NTZ). Adapt on the stored type:
    *  - nanos long → μs timestamp via integer division (`div`, NOT `/`:
    *    2024-epoch nanos ~1.7e18 exceed double's 53-bit mantissa, so the
    *    double path truncates to off-by-1μs for ~half the rows; the data is
    *    μs-clean so `div 1000` is lossless);
    *  - TIMESTAMP_NTZ → session-tz timestamp (sessions run UTC, so the
    *    cast is a pure type change — same micros DuckDB sees). */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")

  /** Label map of the dataset view: 7 categories cat_0..cat_6. */
  val viewLabelMap: Map[Int, String] = (0 to 6).map(i => i -> s"cat_$i").toMap

  /** images view over `orders`: id = o_orderkey, deterministic pixel dims,
    * split = o_orderstatus. Mirrored 1:1 by [[imagesSql]]. */
  def imagesView(spark: SparkSession, sfDir: String): DataFrame =
    orders(spark, sfDir).select(
      col("o_orderkey").as("id"),
      (lit(640) + col("o_orderkey") % 640).cast("int").as("width"),
      (lit(480) + col("o_orderkey") % 480).cast("int").as("height"),
      concat(lit("img_"), col("o_orderkey"), lit(".jpg")).as("relative_path"),
      lit("jpg").as("type"),
      col("o_orderstatus").as("split"))

  /** annotations view over `lineitem`: FK image_id = l_orderkey, 7-way
    * category, box columns derived from numeric columns. The id encodes
    * (orderkey, linenumber ≤ 7, partkey < 1e5, suppkey < 1e4) — the
    * minimal unique row key of the synthetic lineitem (the TPC-H-ish
    * generator reuses (orderkey, linenumber) pairs, and the dims stay
    * UNSCALED under tools/gen_scale.py so the partkey/suppkey bounds hold
    * at every derived scale factor). The orderkey multiplier is 8e9, so
    * the encoding is overflow-safe to orderkey ≈ 1.1e9 (~sf2000; the
    * previous variant also folded quantity in — multiplier 8e11 — and
    * overflowed Long at the sf10 scale-harness point). No global window
    * is needed to mint ids. Mirrored by [[annotationsSql]].
    *
    * Id uniqueness: the smoke-scale (sf0.001) lineitem contains one
    * fully-duplicated (orderkey, linenumber, partkey, suppkey) tuple —
    * (1294, 4, 123, 0), quantities 43 and 19 — which used to mint ONE
    * duplicate annotation id there and fan out every id-keyed join in
    * the q15/q23/q58 pipelines by ±2 rows against their oracles (found
    * by the round-9 divergence hunt; absent at sf0.01 / sf0.1 / the
    * derived sf1). The id therefore folds in a quantity digit — a pure
    * map, no dedupe shuffle — making the key unique at EVERY shipped
    * scale factor while staying reproducible in the SQL mirror. */
  def annotationsView(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir).select(
      ((((col("l_orderkey") * 8 + col("l_linenumber")) * 100000 + col("l_partkey")) * 10000
        + col("l_suppkey")) * 10
        + col("l_quantity").cast("int") % 10).as("id"),
      col("l_orderkey").as("image_id"),
      (col("l_partkey") % 7).cast("int").as("category_id"),
      (col("l_partkey") % 1000).cast("double").as("box_x_min"),
      (col("l_suppkey") % 500).cast("double").as("box_y_min"),
      col("l_quantity").as("box_width"),
      (col("l_partkey") % 50 + 1).cast("double").as("box_height"))

  /** The full dataset view through the real model constructor — exercises
    * category_str derivation + split propagation (broadcast join). */
  def datasetView(spark: SparkSession, sfDir: String): GraftDataset =
    GraftDataset.create(
      imagesView(spark, sfDir), annotationsView(spark, sfDir),
      viewLabelMap, imagesRoot = sfDir, datasetName = Some("tpch_view"))

  // ---- SQL mirrors for the DuckDB oracle --------------------------------

  val imagesSql: String =
    """images AS (
      |  SELECT o_orderkey AS id,
      |         CAST(640 + o_orderkey % 640 AS INT) AS width,
      |         CAST(480 + o_orderkey % 480 AS INT) AS height,
      |         'img_' || o_orderkey || '.jpg' AS relative_path,
      |         'jpg' AS type,
      |         o_orderstatus AS split
      |  FROM orders)""".stripMargin

  val annotationsSql: String =
    """annotations AS (
      |  SELECT (((l_orderkey * 8 + l_linenumber) * 100000 + l_partkey) * 10000
      |          + l_suppkey) * 10 + CAST(l_quantity AS INT) % 10 AS id,
      |         l_orderkey AS image_id,
      |         CAST(l_partkey % 7 AS INT) AS category_id,
      |         'cat_' || CAST(l_partkey % 7 AS VARCHAR) AS category_str,
      |         CAST(l_partkey % 1000 AS DOUBLE) AS box_x_min,
      |         CAST(l_suppkey % 500 AS DOUBLE) AS box_y_min,
      |         l_quantity AS box_width,
      |         CAST(l_partkey % 50 + 1 AS DOUBLE) AS box_height
      |  FROM lineitem)""".stripMargin

  /** `WITH images AS (...), annotations AS (...)` prefix for oracles. */
  val viewCte: String = s"WITH $imagesSql, $annotationsSql"
}
