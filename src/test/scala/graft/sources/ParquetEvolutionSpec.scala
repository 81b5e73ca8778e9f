package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema-evolution read contract: union schema, nulls for columns a
  * file generation never wrote.
  */
class ParquetEvolutionSpec extends SparkSpec {

  test("merged read unions schemas and nulls the v1-absent columns") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "alpha", "en", 5L), (1L, "beta", "de", 4L),
      (2L, "gamma", "fr", 5L), (3L, "delta", "es", 5L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val path = ParquetEvolution.evolvedDir(docs, tag = "spec")
    val out = ParquetEvolution.readMerged(spark, path)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    // even ids came from the two-column v1 batch -> lang/n_chars null
    assert(out(0).isNullAt(2) && out(0).isNullAt(3))
    assert(out(1).getString(2) == "de" && out(1).getLong(3) == 4L)
    assert(out(2).isNullAt(2))
    assert(out(3).getString(2) == "es")
  }
}
