package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("media table carries binary payload") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(m.count() == docs.count())
  }

  test("mapPartitions batch decode matches pure-column stub decode") {
    implicit val s = spark
    val media = Multimodal.mediaTable(docs)
    val cols = Multimodal.decodeStubColumns(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getInt(4)))
      .toSet
    val batches = Multimodal.decodeBatches(media)
      .collect().map(f => (f.doc_id, f.n_bytes, f.width, f.height)).toSet
    assert(cols == batches)
  }

  test("decode is partition-preserving (no shuffle in the plan)") {
    implicit val s = spark
    val plan = Multimodal.decodeBatches(Multimodal.mediaTable(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("descriptor has fixed length and deterministic values") {
    implicit val s = spark
    val d1 = Multimodal.decodeBatches(Multimodal.mediaTable(docs))
      .collect().map(f => f.doc_id -> f.descriptor.toSeq).toMap
    assert(d1.values.forall(_.size == 8))
    val d2 = Multimodal.decodeBatches(Multimodal.mediaTable(docs))
      .collect().map(f => f.doc_id -> f.descriptor.toSeq).toMap
    assert(d1 == d2)
  }
}
