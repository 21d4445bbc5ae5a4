package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data pipelines: detect and redact emails,
  * IPv4 addresses, and phone numbers with pure column expressions
  * (codegen'd `regexp_replace` / `regexp_extract_all` — no UDFs, so the
  * whole pass stays inside whole-stage codegen and scales linearly with
  * the scan).
  *
  * The patterns use only RE2-compatible constructs (no backrefs, no
  * lookaround), so the same regexes run identically on Spark (java.util
  * .regex) and RE2-based engines — which is what makes the q80 gate
  * cross-engine checkable.
  *
  * Redaction is STAGED — emails first, then IPs, then phones — and the
  * per-type counts are defined against the same stages (an IP is counted
  * as an IP, not as a phone-shaped digit run), so counts always agree
  * with what redaction actually replaced.
  */
object Scrub {

  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern: String = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phonePattern: String = "\\+?\\d[\\d\\s().-]{7,}\\d"

  /** Text with emails → `[EMAIL]`, IPv4s → `[IP]`, phones → `[PHONE]`. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "[EMAIL]"),
        ipv4Pattern, "[IP]"),
      phonePattern, "[PHONE]")

  /** Per-document PII hit counts, staged like [[redactPii]]. */
  def piiCounts(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, emailPattern, "[EMAIL]")
    val afterIp = regexp_replace(afterEmail, ipv4Pattern, "[IP]")
    docs.select(col(idCol),
      size(regexp_extract_all(t, lit(emailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(ipv4Pattern), lit(0))).as("n_ips"),
      size(regexp_extract_all(afterIp, lit(phonePattern), lit(0))).as("n_phones"))
  }

  /** Documents with PII redacted in place. */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol, redactPii(col(textCol)))
}
