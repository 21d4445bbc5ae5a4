package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC corpus source/sink — the other columnar interchange format big
  * warehouses emit (Hive/Trino-era lakes ship ORC where newer ones ship
  * parquet). Spark's ORC datasource is built in (vectorized reader,
  * predicate pushdown, column pruning), so an ORC corpus behaves exactly
  * like the parquet path at 100 TB: splittable stripes, min/max stripe
  * pruning on pushed filters, and scan-bound IO.
  *
  * Counterpart of the reference's tabular IO surface (lours' to_parquet /
  * from_parquet, lours/utils/parquet_saver.py) extended to the lake
  * formats a production corpus actually arrives in. */
object OrcIO {

  /** Write `df` as an ORC dataset (one file per partition; zstd —
    * splittable at the stripe level, unlike gzip JSONL shards). */
  def toOrc(df: DataFrame, path: String, compression: String = "zstd",
      overwrite: Boolean = true): Unit = {
    val w = df.write.option("compression", compression)
    (if (overwrite) w.mode("overwrite") else w.mode("errorifexists")).orc(path)
  }

  /** Read an ORC dataset. Schema comes from the ORC footer (self-describing
    * like parquet), so no FAILFAST/inference split is needed here. */
  def fromOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}

/** CSV corpus source/sink — the lowest-common-denominator interchange
  * format. RFC 4180 discipline on both sides: fields are quoted when they
  * contain the separator, quotes, or record separators; embedded quotes
  * are doubled (`escape` = the quote char, NOT the backslash default —
  * Spark's backslash escaping is not what other CSV readers emit/expect);
  * embedded newlines force `multiLine` reads.
  *
  * Scale notes: a multiLine CSV file is NOT splittable (a record boundary
  * can't be found mid-file), so one shard = one read task — shard count at
  * write time is the read-parallelism knob, same contract as gzip JSONL
  * ([[Jsonl]]). The reader takes an EXPLICIT schema and fails closed
  * (FAILFAST) — CSV has no footer, and schema inference is a full extra
  * pass over the data. A distinct `nullValue` sentinel keeps NULL and the
  * empty string distinguishable (bare CSV conflates them) — the format's
  * one residual ambiguity: a field whose entire VALUE is the sentinel
  * `\N` reads back as NULL (a larger sentinel only moves the collision;
  * CSV has no out-of-band null). Corpora needing exact arbitrary-string
  * fidelity ship parquet/ORC/JSONL; CSV is the interop path. */
object CsvIO {

  private val NullSentinel = "\\N"

  /** Write `df` as CSV shards with RFC 4180 quoting. */
  def toCsv(df: DataFrame, path: String, overwrite: Boolean = true): Unit = {
    val w = df.write
      .option("header", "true")
      .option("escape", "\"")        // RFC 4180: "" inside quoted fields
      .option("nullValue", NullSentinel)
      .option("emptyValue", "\"\"")  // empty string stays distinguishable
    (if (overwrite) w.mode("overwrite") else w.mode("errorifexists")).csv(path)
  }

  /** Read CSV shards with an explicit schema, failing closed on malformed
    * records. `multiLine` handles quoted embedded newlines (and makes each
    * file single-task — see the object doc). */
  def fromCsv(spark: SparkSession, path: String, schema: StructType,
      multiLine: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", NullSentinel)
      // NO emptyValue here: on READ that option substitutes a replacement
      // string for empty fields — a parsed "" must simply stay ''
      .option("multiLine", multiLine.toString)
      .option("mode", "FAILFAST")
      .csv(path)
}
