package graft.operators

import graft.model.GraftDataset
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BooleanType, StringType}

/** Booleanize / debooleanize — the schema-reshaping pivot family
  * (lours/dataset/dataset.py:3010-3338; kernel
  * lours/utils/column_booleanizer.py:7-256).
  *
  * `booleanize` turns a list-valued attribute column into one boolean column
  * per possible value, named `col.value` (dot-joined — always backtick-quote).
  * `debooleanize` is the inverse. Value-domain inference is the only
  * collect (distinct values of a tag vocabulary — tiny by nature); the
  * pivot itself is `array_contains` per value, fully codegen'd, no shuffle.
  */
object Booleanize {

  /** Discover a boolean family by prefix + dtype
    * (column_booleanizer.py:163-201). */
  def boolColumns(df: DataFrame, prefix: String): Seq[String] =
    df.schema.fields.collect {
      case f if f.name.startsWith(prefix + ".") && f.dataType == BooleanType => f.name
    }.toSeq

  /** Infer the value domain of an array column: explode + distinct
    * (column_booleanizer.py:56-63). Sorted for deterministic column order. */
  def inferDomain(df: DataFrame, column: String): Seq[String] =
    df.select(explode_outer(col(s"`$column`")).as("__v"))
      .filter(col("__v").isNotNull)
      .distinct().collect().map(_.getString(0)).sorted.toSeq

  /** Pivot one array column into `col.value` boolean columns, in place
    * (column_booleanizer.py:7-95). Null arrays produce all-false flags
    * (matching the reference's is-in-list semantics). */
  def booleanizeColumn(df: DataFrame, column: String,
      possibleValues: Option[Seq[String]] = None): (DataFrame, Set[String]) = {
    require(df.schema(column).dataType.isInstanceOf[ArrayType],
      s"booleanize: column '$column' is not array-typed")
    val domain = possibleValues.getOrElse(inferDomain(df, column))
    val flags = domain.map(v =>
      coalesce(array_contains(col(s"`$column`"), v), lit(false)).as(s"$column.$v"))
    // insert flags at the original column position
    val out = df.columns.toSeq.flatMap {
      case c if c == column => flags
      case c => Seq(col(s"`$c`"))
    }
    (df.select(out: _*), domain.toSet)
  }

  /** Booleanize attribute columns of a dataset, tracking the families in
    * `booleanized` (dataset.py:3010-3193). `table` ∈ images|annotations. */
  def booleanize(ds: GraftDataset, table: String, column: String,
      possibleValues: Option[Seq[String]] = None): GraftDataset = {
    val df = if (table == "images") ds.images else ds.annotations
    val (out, _) = booleanizeColumn(df, column, possibleValues)
    val fams = ds.booleanized(table) + column
    if (table == "images")
      ds.copy(images = out, booleanized = ds.booleanized.updated(table, fams))
    else
      ds.copy(annotations = out, booleanized = ds.booleanized.updated(table, fams))
  }

  /** Inverse pivot: rebuild the array column from its `col.value` flags at
    * the family's position (column_booleanizer.py:204-256). */
  def debooleanizeColumn(df: DataFrame, column: String): DataFrame = {
    val flags = boolColumns(df, column)
    require(flags.nonEmpty, s"debooleanize: no boolean family '$column.*'")
    val arr: Column = array_compact(array(flags.map { f =>
      when(col(s"`$f`"), lit(f.stripPrefix(column + "."))).otherwise(lit(null).cast(StringType))
    }: _*)).as(column)
    val firstFlag = flags.head
    val out = df.columns.toSeq.flatMap {
      case c if c == firstFlag => Seq(arr)
      case c if flags.contains(c) => Nil
      case c => Seq(col(s"`$c`"))
    }
    df.select(out: _*)
  }

  def debooleanize(ds: GraftDataset, table: String, column: String): GraftDataset = {
    val df = if (table == "images") ds.images else ds.annotations
    val out = debooleanizeColumn(df, column)
    val fams = ds.booleanized(table) - column
    if (table == "images")
      ds.copy(images = out, booleanized = ds.booleanized.updated(table, fams))
    else
      ds.copy(annotations = out, booleanized = ds.booleanized.updated(table, fams))
  }

  /** Align two tables' boolean families before a union: flags missing on one
    * side are filled `false` when that side has the family, left absent
    * otherwise (broadcast_booleanization, column_booleanizer.py:98-160). */
  def alignBoolFamilies(a: DataFrame, b: DataFrame,
      aFams: Set[String], bFams: Set[String]): (DataFrame, DataFrame) = {
    def fill(df: DataFrame, ownFams: Set[String], other: DataFrame): DataFrame = {
      val missing = other.schema.fields.collect {
        case f if f.dataType == BooleanType &&
          ownFams.exists(fam => f.name.startsWith(fam + ".")) &&
          !df.columns.contains(f.name) => f.name
      }
      missing.foldLeft(df)((d, c) => d.withColumn(c, lit(false)))
    }
    // a gains false-flags only for families a ITSELF booleanized (it knows
    // those values are absent); families a never booleanized stay absent so
    // a later unionByName null-fills them as unknown rather than asserting
    // a definite false
    val aOut = fill(a, aFams, b)
    val bOut = fill(b, bFams, a)
    (aOut, bOut)
  }
}
