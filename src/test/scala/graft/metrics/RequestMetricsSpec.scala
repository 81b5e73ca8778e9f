package graft.metrics

import graft.{Fixtures, SparkSpec}
import graft.protocol.{OaiConfig, OaiRepository, RequestContext}
import graft.query.StudyStore
import graft.sets.LanguageSet

/** Request-metrics semantics mirrored from the reference
  * (metrics.py:224-246 log_request; tests/test_metrics.py:276-337):
  * success/failure splits at HTTP 300; durations observed only for
  * successful responses that are not in-band OAI errors; per-user-agent
  * counters.
  */
class RequestMetricsSpec extends SparkSpec {

  private def repoWith(metrics: RequestMetrics): OaiRepository = {
    val s = spark
    import s.implicits._
    new OaiRepository(
      new StudyStore(s.createDataset(Fixtures.all).toDF()),
      Seq(LanguageSet),
      OaiConfig(),
      now = () => Fixtures.ts("2022-01-01T00:00:00Z"),
      metrics = Some(metrics),
      nanoTime = {
        // deterministic clock: +5ms per call
        var t = 0L
        () => { t += 5000000L; t }
      })
  }

  test("every OAI request counts; status >= 300 counts as failed") {
    val m = new RequestMetrics
    val repo = repoWith(m)
    repo.handle(Map("verb" -> "Identify"))
    // the reference splits at exactly 300 (tests/test_metrics.py:276-287)
    for (status <- Seq(300, 301, 400, 500))
      repo.handle(Map("verb" -> "Identify"), RequestContext(httpStatus = status))
    assert(m.requestsTotal == 5)
    assert(m.requestsSucceeded == 1)
    assert(m.requestsFailed == 4)
  }

  test("durations observed only for successful non-OAI-error responses") {
    val m = new RequestMetrics
    val repo = repoWith(m)
    repo.handle(Map("verb" -> "Identify"))
    // in-band OAI error: counted as succeeded (HTTP 200) but NOT timed
    repo.handle(Map("verb" -> "NoSuchVerb"))
    // failed transport: not timed either
    repo.handle(Map("verb" -> "Identify"), RequestContext(httpStatus = 500))
    assert(m.requestsSucceeded == 2)
    assert(m.requestsFailed == 1)
    val d = m.durations
    assert(d.keySet == Set(("Identify", "")))
    val (count, sum) = d(("Identify", ""))
    assert(count == 1)
    assert(sum > 0.0)
    // verb+prefix label pair for list requests
    repo.handle(Map("verb" -> "ListIdentifiers", "metadataPrefix" -> "oai_dc"))
    assert(m.durations.keySet == Set(("Identify", ""), ("ListIdentifiers", "oai_dc")))
  }

  test("per-user-agent counters") {
    val m = new RequestMetrics
    val repo = repoWith(m)
    repo.handle(Map("verb" -> "Identify"), RequestContext(userAgent = Some("harvester-a")))
    repo.handle(Map("verb" -> "Identify"), RequestContext(userAgent = Some("harvester-a")))
    repo.handle(Map("verb" -> "Identify"), RequestContext(userAgent = Some("harvester-b")))
    repo.handle(Map("verb" -> "Identify"))
    assert(m.requestsPerUserAgent ==
      Map("harvester-a" -> 2L, "harvester-b" -> 1L, "" -> 1L))
  }

  test("prometheus exposition carries counters and summaries") {
    val m = new RequestMetrics
    val repo = repoWith(m)
    repo.handle(Map("verb" -> "Identify"), RequestContext(userAgent = Some("ua1")))
    repo.handle(Map("verb" -> "Identify"), RequestContext(httpStatus = 404))
    val text = m.prometheus
    assert(text.contains("requests_total 2"))
    assert(text.contains("requests_succeeded 1"))
    assert(text.contains("requests_failed 1"))
    assert(text.contains("""requests_per_user_agent{harvester="ua1"} 1"""))
    assert(text.contains("""requests_duration_count{verb="Identify",metadataPrefix=""} 1"""))
    // combined page: corpus gauges + request metrics through one call
    val s = spark
    import s.implicits._
    val agg = MetricsJob.run(s.createDataset(Fixtures.all).toDF())
    val page = MetricsJob.prometheus(agg, m)
    assert(page.contains("records_total 5"))
    assert(page.contains("requests_total 2"))
  }

  test("approx publisher path: one-pass totals, no per-publisher series") {
    val s = spark
    import s.implicits._
    val studies = s.createDataset(Fixtures.all).toDF()
    val exact = MetricsJob.run(studies)
    val approx = MetricsJob.run(studies, approxPublishers = true)
    // 2 publishers; HLL at 1% rsd is exact at this cardinality
    assert(exact.publishersTotal == 2)
    assert(approx.publishersTotal == exact.publishersTotal)
    assert(approx.recordsTotal == exact.recordsTotal)
    assert(approx.recordsTotalWithoutDeleted == exact.recordsTotalWithoutDeleted)
    // the 100 TB path deliberately drops the per-publisher breakdown:
    // an approximate total next to an exact series would contradict it
    assert(approx.perPublisher.isEmpty)
  }

  test("prometheus label values are escaped") {
    val m = new RequestMetrics
    m.record(Some("Identify"), None, Some("bad\"agent\nwith\\stuff"),
      200, oaiError = false, durationMillis = 1.0)
    val text = m.prometheus
    assert(text.contains("""harvester="bad\"agent\nwith\\stuff""""))
    assert(!text.contains("bad\"agent\nwith"))
  }

  test("a crashed verb still counts as a failed request") {
    val m = new RequestMetrics
    val s = spark
    import s.implicits._
    // store over a dataframe missing every expected column → dispatch
    // throws an AnalysisException, not an OaiError
    val broken = new OaiRepository(
      new StudyStore(Seq((1, "x")).toDF("a", "b")),
      Nil, OaiConfig(), metrics = Some(m))
    intercept[Throwable] {
      broken.handle(Map("verb" -> "ListMetadataFormats", "identifier" -> "someid"))
    }
    assert(m.requestsTotal == 1)
    assert(m.requestsFailed == 1)
    assert(m.durations.isEmpty)
  }
}
