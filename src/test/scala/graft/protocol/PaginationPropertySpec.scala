package graft.protocol

import graft.{Fixtures, SparkSpec}
import graft.metrics.MetricsJob
import graft.query.{StudyStore, True, ResumptionToken}
import graft.schema.RecordStatus
/** Property tests (SURVEY.md §5): pagination completeness — every record
  * appears in exactly one page for any list size — plus the single-pass
  * metrics aggregate vs a reference fold. (Exhaustive over list sizes
  * 1..30 rather than sampled: the domain is small enough to sweep.)
  */
class PaginationPropertySpec extends SparkSpec {

  private lazy val corpus = (1 to 23).map(i =>
    Fixtures.minimal.copy(
      _aggregator_identifier = f"id_$i%03d",
      _direct_base_url = s"http://pub${i % 4}",
      _metadata = Fixtures.meta(
        status = if (i % 5 == 0) RecordStatus.Deleted else RecordStatus.Created)))

  private lazy val store = {
    val s = spark
    import s.implicits._
    new StudyStore(s.createDataset(corpus).toDF())
  }

  test("every record appears in exactly one page, any list size") {
    for (listSize <- 1 to 30) {
      var token: Option[ResumptionToken] = None
      var collected = Vector.empty[String]
      var pages = 0
      var done = false
      while (!done) {
        val page = store.queryPage(True, Seq("_aggregator_identifier"),
          listSize, token, "fp")
        collected ++= page.rows.map(_.getAs[String]("_aggregator_identifier"))
        pages += 1
        assert(pages <= 40, "pagination did not terminate")
        token = page.token
        done = token.isEmpty
      }
      assert(collected.size == 23)
      assert(collected.distinct.size == 23)
      assert(collected == collected.sorted) // deterministic keyset order
    }
  }

  test("single-pass metrics equals reference N+1 semantics") {
    val m = MetricsJob.run(store.studies)
    assert(m.recordsTotal == 23)
    assert(m.recordsTotalWithoutDeleted == 23 - corpus.count(
      _._metadata.status == RecordStatus.Deleted))
    assert(m.publishersTotal == 4)
    val pub0 = m.perPublisher.find(_.baseUrl == "http://pub0").get
    assert(pub0.records == corpus.count(_._direct_base_url == "http://pub0"))
    assert(pub0.recordsWithoutDeleted == corpus.count(st =>
      st._direct_base_url == "http://pub0" &&
        st._metadata.status != RecordStatus.Deleted))
  }

  test("token round-trips and rejects foreign fingerprints") {
    val t = ResumptionToken("abc", "some id with spaces", 40, 120)
    assert(ResumptionToken.decode(t.encode) == t)
    assertThrows[graft.query.OaiError](
      store.queryPage(True, Seq("_aggregator_identifier"), 5,
        Some(t.copy(filterHash = "other")), "fp"))
  }
}
