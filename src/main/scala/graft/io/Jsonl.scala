package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) corpus source/sink — the de-facto
  * interchange format of the LLM-corpus world (C4, The Pile, Dolma,
  * RedPajama all ship as — typically gzipped — JSONL shards), the text
  * counterpart to the [[WebDataset]] tar sink.
  *
  * Scale notes: the sink writes one shard per partition (compression is
  * per-file codec metadata — `gzip` for interop, `zstd` where the readers
  * support it; plain-gzip shards are NOT splittable, so at read time one
  * shard = one task — shard count, set by the upstream partitioning, is
  * the read-parallelism knob, exactly like real corpus releases). The
  * reader takes an EXPLICIT schema and fails closed (`FAILFAST`) — a
  * truncated shard or schema-drifted record aborts the read instead of
  * silently nulling fields, the [[WebDataset.fromWebDataset]] contract;
  * schema inference (a full extra pass over 100 TB) is deliberately a
  * separate, opt-in entry point for exploration. */
object Jsonl {

  /** Write `df` as JSONL shards (one file per partition). */
  def toJsonl(df: DataFrame, path: String, compression: String = "none",
      overwrite: Boolean = true): Unit = {
    val w = df.write.option("compression", compression)
    (if (overwrite) w.mode("overwrite") else w.mode("errorifexists"))
      .json(path)
  }

  /** Read JSONL shards with an explicit schema, failing closed on corrupt
    * or schema-drifted records. */
  def fromJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Exploration-only variant: infer the schema (an extra full pass —
    * never the production path). */
  def fromJsonlInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mode", "FAILFAST").json(path)
}
