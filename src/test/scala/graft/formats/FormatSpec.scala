package graft.formats

import graft.{Fixtures, SparkSpec}
import org.apache.spark.sql.{DataFrame, Row}

/** Per-record scalar transforms T1..T12 (SURVEY.md §2.3) against fixture
  * studies — the golden expectations come from the reference's template
  * tests (tests/test_serve.py sites cited per transform).
  */
class FormatSpec extends SparkSpec {

  private lazy val studies: DataFrame = {
    val s = spark
    import s.implicits._
    s.createDataset(Fixtures.all).toDF()
  }

  private def derived(fmt: MetadataFormat, id: String): Row =
    fmt.derive(studies.filter(s"_aggregator_identifier = '$id'")).collect().head

  test("T1/T4: distinct identifier values and languages") {
    val r = derived(OaiDcFormat, "agg_id_lang")
    assert(r.getAs[scala.collection.Seq[String]]("dc_identifiers") == Seq("ark-id"))
    assert(r.getAs[scala.collection.Seq[String]]("dc_languages") == Seq("en", "fi", "de"))
  }

  test("T3: subject coalesce description over value") {
    val r = derived(OaiDcFormat, "agg_id_2")
    assert(r.getAs[scala.collection.Seq[String]]("dc_subjects") == Seq("Keyword One", "kw2"))
  }

  test("T5: date coalesce value over distribution_date") {
    val r = derived(OaiDcFormat, "agg_id_2")
    assert(r.getAs[scala.collection.Seq[String]]("dc_dates") == Seq("2011-01-02"))
  }

  test("T6: constant type column") {
    assert(derived(OaiDcFormat, "agg_id_1").getAs[String]("dc_type") == "Dataset")
  }

  test("T9: publisher priority — english distributor wins") {
    val r = derived(OaiDcFormat, "agg_id_2")
    assert(r.getAs[String]("dc_publisher") == "Distributor EN")
  }

  test("T9: publisher priority falls through to first publisher") {
    val s = spark
    import s.implicits._
    val st = Fixtures.minimal.copy(
      publishers = Seq(graft.schema.LangAttr("Pub FI", "fi")))
    val df = s.createDataset(Seq(st)).toDF()
    val r = OaiDcFormat.derive(df).collect().head
    assert(r.getAs[String]("dc_publisher") == "Pub FI")
  }

  test("T7: preferred identifier picks first valid-agency id; null when none") {
    val r = derived(OaiDataciteFormat, "agg_id_2")
    val pref = r.getAs[Row]("preferred_identifier")
    assert(pref.getAs[String]("value") == "some_id")
    assert(pref.getAs[String]("agency") == "DOI")
    assert(derived(OaiDataciteFormat, "agg_id_1")
      .getAs[Row]("preferred_identifier") == null)
  }

  test("T7 validity filter: records without OpenAIRE id are invisible") {
    val visible = studies
      .filter(OaiDataciteFormat.validFilter.toColumn)
      .select("_aggregator_identifier").collect().map(_.getString(0)).toSet
    assert(visible == Set("agg_id_2", "agg_id_lang"))
  }

  test("T8: year truncation prefers distribution_date, 4 digits") {
    val r = derived(OaiDataciteFormat, "agg_id_2")
    assert(r.getAs[String]("datacite_year") == "2012")
  }

  test("T10: related ids filtered to controlled agencies and deduped") {
    val r = derived(OaiDataciteFormat, "agg_id_2")
    val rel = r.getAs[scala.collection.Seq[Row]]("related_identifiers")
    assert(rel.size == 1) // duplicate collapsed, Unknown rejected
    assert(rel.head.getAs[String]("identifier") == "10.1/xyz")
    assert(rel.head.getAs[String]("agency") == "DOI")
  }

  test("T11: funder extraction keeps only eu-repo grantAgreement values") {
    val r = derived(OaiDataciteFormat, "agg_id_2")
    val f = r.getAs[scala.collection.Seq[Row]]("funder_references")
    assert(f.size == 1)
    assert(f.head.getAs[String]("value") ==
      "info:eu-repo/grantAgreement/EC/FP7/12345")
    assert(f.head.getAs[String]("agency") == "EC")
  }

  test("T12: datacite subjects chain keywords then classifications") {
    val r = derived(OaiDataciteFormat, "agg_id_2")
    assert(r.getAs[scala.collection.Seq[Row]]("datacite_subjects").size == 2)
  }

  test("T13: header datestamp uses deletion time for deleted records") {
    val df = FormatColumns.withHeader(studies, Nil)
    val del = df.filter("_aggregator_identifier = 'agg_id_del'").collect().head
    assert(del.getAs[Boolean]("oai_deleted"))
    assert(del.getAs[java.sql.Timestamp]("oai_datestamp") ==
      Fixtures.ts("2000-01-01T23:00:00Z"))
    val live = df.filter("_aggregator_identifier = 'agg_id_1'").collect().head
    assert(live.getAs[java.sql.Timestamp]("oai_datestamp") ==
      Fixtures.ts("2021-06-01T12:00:00Z"))
  }
}
