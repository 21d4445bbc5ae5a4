package graft.io

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Directory-relative file stems from `input_file_name()` — shared by the
  * darknet and PascalVOC loaders.
  *
  * `input_file_name()` reports the Hadoop-qualified file URI in
  * PERCENT-ENCODED form (verified: a local `probe sp/sub a/x.txt` comes
  * back as `file:///.../probe%20sp/sub%20a/x.txt`). Matching a naively
  * driver-computed local absolute path against it silently yields empty
  * stems — and therefore an empty dataset — for any non-local filesystem
  * or any path with URI-special characters. So: qualify the dir through
  * ITS OWN Hadoop filesystem (scheme + authority then agree with what
  * input_file_name reports for files under it), match the URI-encoded
  * prefix, and url-decode the captured stem back to the literal path the
  * images table carries.
  */
private[io] object Stems {

  /** `file`'s path relative to `dir`, minus the `ext` suffix; empty string
    * when the file does not live under `dir`. */
  def relativeStem(spark: SparkSession, dir: String, file: Column,
      ext: String): Column = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def norm(s: String) = s.stripSuffix("/").replaceFirst("^file:/+", "file:/")
    val encodedDir = norm(fs.makeQualified(p).toUri.toASCIIString)
    val f = regexp_replace(file, "^file:/+", "file:/")
    val raw = regexp_extract(f,
      "^" + java.util.regex.Pattern.quote(encodedDir + "/") + "(.+)" +
        java.util.regex.Pattern.quote(ext) + "$", 1)
    // url_decode treats '+' as a space (form encoding), but in a URI path
    // '+' is a literal plus — re-encode it first so both literal '+' and
    // %XX escapes round-trip correctly
    when(raw === "", raw)
      .otherwise(url_decode(regexp_replace(raw, "\\+", "%2B")))
  }
}
