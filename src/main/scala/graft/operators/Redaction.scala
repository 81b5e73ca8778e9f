package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the masking pass a training-data pipeline runs
  * before export: emails, IPv4 addresses, and international phone
  * numbers replaced by stable placeholder tokens, with per-document
  * redaction counts kept for the curation report.
  *
  * All three patterns are deliberately restricted to syntax that Java
  * regex and RE2-family engines interpret identically (character
  * classes, bounded repetition, `\b`) so the operation is
  * cross-engine deterministic — the same property the rest of the
  * oracle surface relies on. Everything is `regexp_replace` /
  * `regexp_count` column expressions: whole-stage codegen, one scan,
  * no UDFs.
  *
  * Counting happens SEQUENTIALLY on progressively redacted text (an
  * email's host looks like neither an IP nor a phone by the time IP
  * counting runs) — so the counts partition the matches instead of
  * double-counting overlapping patterns.
  */
object Redaction {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{9,15}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  /** Masked text: emails, then IPv4s, then phones. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailToken),
        Ipv4Re, IpToken),
      PhoneRe, PhoneToken)

  /** (doc, redacted text, per-kind counts) in one codegen'd scan. */
  def redactDocs(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), EmailRe, EmailToken)
    val afterIp = regexp_replace(afterEmail, Ipv4Re, IpToken)
    df.select(
      col(idCol),
      redact(col(textCol)).as("redacted"),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(afterEmail, lit(Ipv4Re)).cast("long").as("n_ip"),
      regexp_count(afterIp, lit(PhoneRe)).cast("long").as("n_phone"))
  }
}
