package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class RedactionSpec extends SparkSpec {

  private def redactOne(text: String): (String, Long, Long, Long) = {
    val s = spark
    import s.implicits._
    val r = Redaction.redactDocs(
      Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id")
      .collect().head
    (r.getString(1), r.getLong(2).toLong, r.getLong(3).toLong,
      r.getLong(4).toLong)
  }

  test("masks emails, IPs, and phones with stable tokens") {
    val (out, ne, ni, np) = redactOne(
      "mail alice.smith+spam@sub.example.co.uk or bob@x.io, " +
        "ssh to 192.168.0.1 then dial +442071234567 please")
    assert(out == "mail <EMAIL> or <EMAIL>, ssh to <IP> then dial <PHONE> please")
    assert((ne, ni, np) == (2L, 1L, 1L))
  }

  test("word-boundary rules: embedded almost-IPs stay, standalone IPs go") {
    // "10.0.0.1ab" matches neither pattern (host has no alpha TLD after
    // a dot; the IP's trailing \b fails against 'a') — only the
    // standalone 10.0.0.2 is redacted
    val (out, ne, ni, np) = redactOne("root@10.0.0.1ab is odd, 10.0.0.2 is an ip")
    assert(out == "root@10.0.0.1ab is odd, <IP> is an ip")
    assert((ne, ni, np) == (0L, 1L, 0L))
  }

  test("an email whose host is dotted digits is consumed as email, not IP") {
    val (out, ne, ni, np) = redactOne("ping admin@192.168.0.7.example.org now")
    assert(out == "ping <EMAIL> now")
    assert((ne, ni, np) == (1L, 0L, 0L))
  }

  test("clean text passes through untouched with zero counts") {
    val original = "just plain words with no contact information at all"
    val (out, ne, ni, np) = redactOne(original)
    assert(out == original)
    assert((ne, ni, np) == (0L, 0L, 0L))
  }

  test("phone shorter than 9 digits is left alone") {
    val (out, _, _, np) = redactOne("call +12345678 maybe")
    assert(out == "call +12345678 maybe" && np == 0L)
  }

  test("luhnValid agrees with the classic test vectors") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      ("4111111111111111", true),  // the canonical valid Visa test PAN
      ("4111111111111112", false), // one digit off
      ("79927398713", true),       // the ISO/IEC 7812 worked example
      ("79927398710", false),
      ("4242424242424242", true))
    val out = cases.map(_._1).toDF("n")
      .select(col("n"), Redaction.luhnValid(col("n")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (n, exp) =>
      assert(out(n) == exp, s"luhn($n) should be $exp")
    }
  }

  test("card redaction masks only Luhn-valid candidates") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "order 4111111111111112 then pay 4242424242424242 ok"),
      (2L, "tracking 1234567890123 only"),
      (3L, "no digits at all"))
      .toDF("doc_id", "text")
    val out = Redaction.redactCards(df, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ("order 4111111111111112 then pay <CARD> ok", 2L, 1L))
    assert(out(1) == ("tracking 1234567890123 only", 1L, 0L))
    assert(out(2) == ("no digits at all", 0L, 0L))
  }

  test("separator-tolerant pass masks spaced and dashed valid cards") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // the most common printed forms: spaced and dash-grouped, both
      // Luhn-valid — invisible to the contiguous pass by its contract
      (1L, "pay 4111 1111 1111 1111 today"),
      (2L, "card 4242-4242-4242-4242 on file"),
      // valid contiguous run still caught (separators optional)
      (3L, "pay 4242424242424242 ok"),
      // separated but Luhn-INVALID: counted as candidate, not masked
      (4L, "ref 4111 1111 1111 1112 stays"),
      // 10-digit phone-ish grouping: too few digits, not a candidate
      (5L, "call 123-456-7890 now"))
      .toDF("doc_id", "text")
    val contiguous = Redaction.redactCards(df, "text", "doc_id")
      .orderBy("doc_id").collect().map(r => r.getLong(3))
    assert(contiguous(0) == 0L && contiguous(1) == 0L,
      "contiguous pass must not see separated forms (stated contract)")
    val out = Redaction.redactCardsSeparated(df, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ("pay <CARD> today", 1L, 1L))
    assert(out(1) == ("card <CARD> on file", 1L, 1L))
    assert(out(2) == ("pay <CARD> ok", 1L, 1L))
    assert(out(3) == ("ref 4111 1111 1111 1112 stays", 1L, 0L))
    assert(out(4) == ("call 123-456-7890 now", 0L, 0L))
  }

  test("mod97Valid agrees with the published IBAN test vectors") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "DE89370400440532013000" -> true,  // Deutsche Bundesbank example
      "GB82WEST12345698765432" -> true,  // UK example with letters
      "DE89370400440532013001" -> false, // one digit off
      "GB82WEST12345698765431" -> false,
      "DE00" -> false,                   // too short (< 5 chars)
      "DE89 3704" -> false               // un-normalized input → poison
    ).toDF("iban", "expect")
    val out = df.select(col("expect"),
      Redaction.mod97Valid(col("iban")).as("got")).collect()
    out.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
  }
}
