package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** URL canonicalization: each rule in isolation, composition, and
  * idempotence (canonical form is a fixed point).
  */
class UrlNormalizeSpec extends SparkSpec {

  private def canon(url: String): String = {
    val s = spark
    import s.implicits._
    Seq(url).toDF("u")
      .select(UrlNormalize.canonicalize(col("u")))
      .collect().head.getString(0)
  }

  test("fragment is dropped, scheme and host lowercase, path case kept") {
    assert(canon("HTTPS://Example.COM/API/Path#Section-2") ==
      "https://example.com/API/Path")
  }

  test("default ports stripped, non-default ports kept") {
    assert(canon("https://example.com:443/x") == "https://example.com/x")
    assert(canon("http://example.com:80/x") == "http://example.com/x")
    assert(canon("https://example.com:8443/x") == "https://example.com:8443/x")
    assert(canon("http://example.com:8080/x") == "http://example.com:8080/x")
  }

  test("tracking params dropped, survivors sorted, empty query removed") {
    assert(canon("https://example.com/p?utm_source=x&utm_campaign=y&b=2&a=1") ==
      "https://example.com/p?a=1&b=2")
    assert(canon("https://example.com/p?fbclid=abc&gclid=def") ==
      "https://example.com/p")
    assert(canon("https://example.com/p?b=2&&a=1") ==
      "https://example.com/p?a=1&b=2")
  }

  test("canonicalization is idempotent") {
    val messy = Seq(
      "HTTPS://Example.COM:443/Path?utm_source=f&b=1&a=2#frag",
      "http://HOST.example:80/",
      "https://example.com/clean?x=1")
    messy.foreach { u =>
      val once = canon(u)
      assert(canon(once) == once, s"not a fixed point: $u -> $once")
    }
  }

  test("urls differing only in canonical-equivalent noise collapse to one key") {
    val variants = Seq(
      "https://example.com/page?a=2&b=1",
      "HTTPS://EXAMPLE.com:443/page?b=1&a=2#top",
      "https://example.com/page?utm_source=mail&a=2&b=1")
    assert(variants.map(canon).distinct.size == 1)
  }

  test("host extraction: lowercased, port and path stripped, empty on junk") {
    val s = spark
    import s.implicits._
    val got = Seq(
      "HTTPS://Sub.Example.COM:8443/a/b?q=1",
      "http://plain.org",
      "not a url").toDF("u")
      .select(UrlNormalize.host(col("u"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("sub.example.com", "plain.org", ""))
  }

  test("frontier layout: each host's queue is contiguous and ordered") {
    val s = spark
    import s.implicits._
    val urls = (1L to 60L).map { i =>
      (i, s"https://host${i % 3}.example/p/${i % 10}?utm_source=x&k=$i")
    }.toDF("id", "url")
    val frontier = UrlNormalize.frontierByHost(urls, "url", "id", 4)
    import org.apache.spark.sql.Row
    val parts = frontier.select("host", "canonical").rdd
      .glom().collect().map(_.toSeq)
    // every host appears in exactly ONE partition…
    val hostToParts = parts.zipWithIndex.flatMap { case (rows, pi) =>
      rows.map { case Row(h: String, _) => h -> pi }
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.length).toMap
    assert(hostToParts.nonEmpty)
    assert(hostToParts.values.forall(_ == 1), s"host split: $hostToParts")
    // …and each partition is sorted by (host, canonical)
    parts.foreach { rows =>
      val keys = rows.map { case Row(h: String, c: String) => (h, c) }
      assert(keys == keys.sorted, "partition not ordered")
    }
  }

  test("the expression is codegen-friendly: zero shuffles") {
    val s = spark
    import s.implicits._
    val plan = (1 to 100).map(i => s"https://h$i.com/p?b=$i&a=$i")
      .toDF("u").select(UrlNormalize.canonicalize(col("u")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle in a scalar chain:\n$plan")
  }
}
