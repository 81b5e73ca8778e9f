package graft.operators

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("flags docs by distinct shingle overlap with the benchmark set") {
    // benchmark: "a b c d e f" → 3-gram shingles {abc, bcd, cde, def}
    val bench = docs((100L, "a b c d e f"))
    val corpus = docs(
      (1L, "a b c d e f"),       // all 4 shingles shared
      (2L, "x a b c d y"),       // shares {abc, bcd} = 2
      (3L, "a b c d q r"),       // shares {abc, bcd} = 2
      (4L, "totally different words here"))
    val flagged2 = Decontamination
      .flagContaminated(corpus, bench, "text", "doc_id", 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(flagged2 == Map(1L -> 4L, 2L -> 2L, 3L -> 2L))
    val flagged3 = Decontamination
      .flagContaminated(corpus, bench, "text", "doc_id", 3, minOverlap = 3)
      .collect().map(_.getLong(0)).toSet
    assert(flagged3 == Set(1L))
  }

  test("short texts fall back to the whole-text shingle") {
    val bench = docs((100L, "a b"))
    val corpus = docs((1L, "a b"), (2L, "a c"))
    val flagged = Decontamination
      .flagContaminated(corpus, bench, "text", "doc_id", 3, minOverlap = 1)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L))
  }

  test("benchmark members flag themselves maximally on real data") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = d.filter(org.apache.spark.sql.functions.col("doc_id") % 23 === 0)
    val flagged = Decontamination
      .flagContaminated(d, bench, "text", "doc_id", 3, minOverlap = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val benchIds = bench.select("doc_id").collect().map(_.getLong(0))
    assert(benchIds.forall(flagged.contains))
  }
}
