package graft.ingest

import java.nio.file.Files

import graft.{Fixtures, SparkSpec}

class StudyLayoutSpec extends SparkSpec {

  test("ingest materializes _direct_base_url from first direct provenance") {
    val s = spark
    import s.implicits._
    val raw = s.createDataset(Fixtures.all).toDF().drop("_direct_base_url")
    val derived = StudyLayout.withDerived(raw)
      .select("_aggregator_identifier", "_direct_base_url")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(derived("agg_id_1") == "http://somebaseurl")
    assert(derived("agg_id_lang") == "https://www.da-ra.de/oaip")
    // nestedProvenance: second hop is direct=false → first hop wins
    assert(derived("agg_id_prov") == "http://somebaseurl")
  }

  test("written layout round-trips and stays query-identical") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-layout").toString + "/studies"
    val raw = s.createDataset(Fixtures.all).toDF().drop("_direct_base_url")
    StudyLayout.write(raw, dir, numFiles = 4)
    val back = s.read.parquet(dir)
    assert(back.count() == Fixtures.all.size)
    assert(back.schema.fieldNames.contains("_direct_base_url"))
    val metrics = graft.metrics.MetricsJob.run(back)
    assert(metrics.recordsTotal == 5)
    assert(metrics.publishersTotal == 2)
  }
}
