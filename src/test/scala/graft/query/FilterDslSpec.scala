package graft.query

import graft.{Fixtures, SparkSpec}

/** FilterDsl semantics against fixture studies + Mongo-payload parity
  * (SURVEY.md §5: wire-protocol contract tests, tests/test_serve.py:
  * 1324-1377 are the golden specs).
  */
class FilterDslSpec extends SparkSpec {

  private lazy val studies = {
    val s = spark
    import s.implicits._
    s.createDataset(Fixtures.all).toDF()
  }

  private def ids(f: Filter): Set[String] =
    studies.filter(f.toColumn)
      .select("_aggregator_identifier")
      .collect().map(_.getString(0)).toSet

  test("Eq point lookup (Q1/Q5)") {
    assert(ids(FilterDsl.byIdentifier("agg_id_1")) == Set("agg_id_1"))
  }

  test("Ne excludes deleted, null-rejecting (Q7)") {
    assert(ids(FilterDsl.notDeleted) ==
      Set("agg_id_1", "agg_id_2", "agg_id_prov", "agg_id_lang"))
  }

  test("In membership (Q6)") {
    assert(ids(In("_aggregator_identifier", Seq("agg_id_1", "agg_id_del"))) ==
      Set("agg_id_1", "agg_id_del"))
  }

  test("Lt on timestamp (Q8)") {
    assert(ids(Lt("_metadata.updated", Fixtures.ts("2001-01-01T00:00:00Z"))) ==
      Set("agg_id_del"))
  }

  test("harvestWindow bounds from/until (Q8)") {
    val f = FilterDsl.harvestWindow(
      Fixtures.ts("2022-01-01T00:00:00Z"),
      from = Some(Fixtures.ts("2001-01-01T00:00:00Z")))
    assert(ids(f) == Set("agg_id_1", "agg_id_2", "agg_id_prov", "agg_id_lang"))
  }

  test("ElemMatch base_url+direct on same element (Q9)") {
    val f = ElemMatch("_provenance",
      ElemEq("base_url", "http://somebaseurl"), ElemEq("direct", true))
    assert(ids(f) == Set("agg_id_1", "agg_id_2", "agg_id_del", "agg_id_prov"))
    // upstream (direct=false) hop must NOT match even though base_url exists
    val upstream = ElemMatch("_provenance",
      ElemEq("base_url", "http://upstream"), ElemEq("direct", true))
    assert(ids(upstream).isEmpty)
  }

  test("ElemMatch with exists (bare source set)") {
    val f = ElemMatch("_provenance",
      ElemEq("direct", true), ElemExists("base_url", exists = true))
    assert(ids(f) == Fixtures.all.map(_._aggregator_identifier).toSet)
  }

  test("And conjunction composes (Q10)") {
    val f = And(FilterDsl.notDeleted,
      ElemMatch("_provenance", ElemEq("base_url", "https://www.da-ra.de/oaip"),
        ElemEq("direct", true)))
    assert(ids(f) == Set("agg_id_lang"))
  }

  test("Mongo payload rendering matches reference wire shapes") {
    assert(FilterDsl.byIdentifier("x").toMongo ==
      """{"_aggregator_identifier": "x"}""")
    assert(FilterDsl.notDeleted.toMongo ==
      """{"_metadata.status": {"$ne": "deleted"}}""")
    assert(Lt("_metadata.updated", Fixtures.ts("2021-06-01T12:00:00Z")).toMongo ==
      """{"_metadata.updated": {"$lt": {"$isodate": "2021-06-01T12:00:00Z"}}}""")
    assert(In("identifiers.agency", Seq("DOI", "ARK")).toMongo ==
      """{"identifiers.agency": {"$in": ["DOI", "ARK"]}}""")
    assert(
      ElemMatch("_provenance", ElemEq("base_url", "http://b"), ElemEq("direct", true)).toMongo ==
        """{"_provenance": {"$elemMatch": {"base_url": "http://b", "direct": true}}}""")
    assert(And(Eq("a", 1), Ne("b", 2)).toMongo ==
      """{"$and": [{"a": 1}, {"b": {"$ne": 2}}]}""")
  }
}
