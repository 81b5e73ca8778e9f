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

  /** Word-bounded CONTIGUOUS 13-16 digit runs — payment-card
    * CANDIDATES; the Luhn check below separates real card numbers
    * from order ids and tracking numbers that match the same shape.
    * Stated scope: contiguous runs ONLY — separator-formatted numbers
    * ("4111 1111 1111 1111", dash-grouped) are NOT candidates here;
    * [[redactCardsSeparated]] is the pass that catches them.
    */
  val CardCandidateRe = "\\b\\d{13,16}\\b"

  /** Separator-tolerant candidates: 13-16 digits with at most one
    * space or dash between adjacent digits — covers the common
    * printed forms (4-4-4-4 spaced, dash-grouped) AND plain
    * contiguous runs (every separator is optional), while word
    * boundaries keep longer digit runs excluded exactly as in
    * [[CardCandidateRe]]. Only syntax Java regex and RE2 agree on.
    */
  val CardSeparatedRe = "\\b\\d(?:[ -]?\\d){12,15}\\b"
  val CardToken = "<CARD>"

  /** Luhn mod-10 checksum validity of a digit string (ISO/IEC 7812):
    * from the right, every second digit doubles (minus 9 when the
    * double exceeds 9), and the total must divide by 10. Pure
    * arithmetic over the reversed digit array — a higher-order column
    * expression, no UDF, restatable in any engine with list
    * transforms, which is what lets the VALIDITY DECISION (not just
    * the regex shape) sit under the cross-engine oracle.
    */
  def luhnValid(num: Column): Column = {
    val digits = filter(split(reverse(num), ""), ch => ch =!= "")
    val folded = transform(digits, (ch, i) => {
      val d = ch.cast("int")
      when(i % 2 === 1, when(d < 5, d * 2).otherwise(d * 2 - 9))
        .otherwise(d)
    })
    aggregate(folded, lit(0), (a, x) => a + x) % 10 === 0
  }

  /** ISO 7064 mod-97 checksum (the IBAN / structured-ID validity
    * rule): move the first four characters to the end, map letters to
    * two digits (A→10 … Z→35), and the resulting big decimal number
    * must be ≡ 1 (mod 97). Big-integer arithmetic never materializes:
    * the fold carries the running remainder — (acc·10 + d) mod 97 per
    * digit, (acc·100 + code) mod 97 per letter — so the whole check is
    * a codegen'd higher-order `aggregate` over the characters: one
    * scan-local expression, no UDF, no shuffle, same shape as
    * [[luhnValid]]. Input must be pre-normalized (uppercase,
    * no spaces); characters outside [0-9A-Z] make the result false
    * via a poisoned remainder (98, unreachable by any mod-97 step).
    */
  def mod97Valid(s: Column): Column = {
    val rearranged = concat(substring(s, 5, 1000000), substring(s, 1, 4))
    val chars = filter(split(rearranged, ""), ch => ch =!= "")
    val rem = aggregate(chars, lit(0L), (acc, ch) => {
      val a = ascii(ch)
      when(acc === 98L, lit(98L))
        .when(a >= 48 && a <= 57, (acc * 10 + (a - 48)) % 97)
        .when(a >= 65 && a <= 90, (acc * 100 + (a - 55)) % 97)
        .otherwise(lit(98L))
    })
    length(s) >= 5 && rem === 1L
  }

  /** Checksum-gated card redaction: only candidates that PASS Luhn
    * are masked (a pipeline that masks every 16-digit run destroys
    * order ids and corrupts perfectly safe text — the false-positive
    * cost this operator exists to avoid). Candidates are extracted
    * once, validated arithmetically, and the valid ones replaced by a
    * literal-string fold — one codegen'd scan, no shuffle, no UDF.
    * Stated contract: replacement is literal, so a valid number that
    * also occurs as a substring of a longer digit run is masked there
    * too.
    */
  def redactCards(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val cands = array_distinct(
      regexp_extract_all(col(textCol), lit(CardCandidateRe), lit(0)))
    val valid = filter(cands, c => luhnValid(c))
    df.select(
      col(idCol),
      aggregate(valid, col(textCol),
        (acc, c) => call_function("replace", acc, c, lit(CardToken)))
        .as("redacted"),
      size(cands).cast("long").as("n_candidates"),
      size(valid).cast("long").as("n_valid"))
  }

  /** [[redactCards]] over [[CardSeparatedRe]]: candidates may carry
    * single space/dash separators; the Luhn decision runs on the
    * digits alone (separators stripped before the checksum fold) and
    * the replacement masks the EXACT matched span, separators
    * included. Same one-scan, no-UDF shape as the contiguous pass.
    */
  def redactCardsSeparated(
      df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val cands = array_distinct(
      regexp_extract_all(col(textCol), lit(CardSeparatedRe), lit(0)))
    val valid = filter(cands, c => luhnValid(translate(c, " -", "")))
    df.select(
      col(idCol),
      aggregate(valid, col(textCol),
        (acc, c) => call_function("replace", acc, c, lit(CardToken)))
        .as("redacted"),
      size(cands).cast("long").as("n_candidates"),
      size(valid).cast("long").as("n_valid"))
  }
}
