package graft

import java.sql.Timestamp

import graft.schema._

/** Canonical fixture studies ported from the reference tests
  * (FIXTURES.md §1; tests/test_serve.py:46-66,218-224,249-255,287-291).
  */
object Fixtures {

  def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  val baseProvenance: Provenance = Provenance(
    harvest_date = "someharvestdate",
    altered = true,
    base_url = "http://somebaseurl",
    identifier = "someidentifier",
    datestamp = "somedatestamp",
    direct = true,
    metadata_namespace = "somenamespace")

  def meta(
      status: String = RecordStatus.Created,
      updated: String = "2021-06-01T12:00:00Z",
      deleted: String = null): RecordMeta =
    RecordMeta(status, ts("2021-01-01T00:00:00Z"), ts(updated),
      if (deleted == null) null else ts(deleted))

  /** Minimal oai_dc study (tests/test_serve.py:58-66). */
  val minimal: Study = Study(
    study_number = "some_number",
    _aggregator_identifier = "agg_id_1",
    _direct_base_url = "http://somebaseurl",
    _metadata = meta(),
    _provenance = Seq(baseProvenance))

  /** Datacite-valid study: DOI identifier (tests/test_serve.py:46-55). */
  val dataciteValid: Study = minimal.copy(
    _aggregator_identifier = "agg_id_2",
    identifiers = Seq(LangAttr("some_id", "en", agency = "DOI")),
    study_titles = Seq(
      LangAttr("some title", "en"),
      LangAttr("sama otsikko", "fi")),
    publishers = Seq(LangAttr("Publisher A", "fi")),
    distributors = Seq(LangAttr("Distributor EN", "en"), LangAttr("Jakelija", "fi")),
    publication_years = Seq(LangAttr("2011-01-02", "en", distribution_date = "2012-03-04")),
    keywords = Seq(
      LangAttr("kw1", "en", description = "Keyword One"),
      LangAttr("kw2", "en")),
    related_publications = Seq(
      LangAttr("rp", "en", identifier = "10.1/xyz", identifier_agency = "DOI"),
      LangAttr("rp2", "en", identifier = "10.1/xyz", identifier_agency = "DOI"),
      LangAttr("rp3", "en", identifier = "junk", identifier_agency = "Unknown")),
    grant_numbers = Seq(
      LangAttr("info:eu-repo/grantAgreement/EC/FP7/12345", "en", agency = "EC"),
      LangAttr("plain-grant-1", "en", agency = "Other")))

  /** Deleted study (tests/test_serve.py:287-291): header-only rendering,
    * datestamp = deletion time.
    */
  val deleted: Study = minimal.copy(
    _aggregator_identifier = "agg_id_del",
    _metadata = meta(RecordStatus.Deleted,
      updated = "2000-01-01T23:00:00Z", deleted = "2000-01-01T23:00:00Z"))

  /** Two provenance hops: nested originDescription expected, element 0
    * outermost (tests/test_serve.py:249-255).
    */
  val nestedProvenance: Study = minimal.copy(
    _aggregator_identifier = "agg_id_prov",
    _provenance = Seq(
      baseProvenance,
      Provenance("harvest2", altered = false, "http://upstream", "id2",
        "datestamp2", direct = false, "ns2")))

  /** Language-set exercise: titles in several languages. */
  val multiLang: Study = minimal.copy(
    _aggregator_identifier = "agg_id_lang",
    _direct_base_url = "https://www.da-ra.de/oaip",
    _provenance = Seq(baseProvenance.copy(base_url = "https://www.da-ra.de/oaip")),
    study_titles = Seq(
      LangAttr("title en", "en"), LangAttr("otsikko", "fi"),
      LangAttr("titel", "de")),
    identifiers = Seq(LangAttr("ark-id", "en", agency = "ARK")))

  /** Every ddi25-rendered field populated — drives the codeBook golden
    * tests (mirrors the per-field studies of tests/test_serve.py:359-540).
    * NOT in [[all]]: list/count tests assume 5 records.
    */
  val ddiRich: Study = minimal.copy(
    _aggregator_identifier = "agg_id_ddi",
    study_titles = Seq(LangAttr("some title", "en")),
    document_titles = Seq(
      LangAttr("some_doc", "en"), LangAttr("joku_doc", "fi")),
    study_uris = Seq(
      LangAttr("some_study_uri", "fi"), LangAttr("another_study_uri", "en")),
    distribution_dates = Seq(
      LangAttr("1984", "en", description = "Year 1984"),
      LangAttr("1984", "fi", description = "Vuosi 1984")),
    collection_periods = Seq(
      LangAttr("2000-01-02", "fi", event = "single"),
      LangAttr("2000-01-03", "en", event = "start", description = "January 2000"),
      LangAttr("2000-02-04", "en", event = "end", description = "February 2000")),
    data_kinds = Seq(
      LangAttr("some kind", "en"), LangAttr("joku kind", "fi")),
    data_access = Seq(LangAttr("open", "en")),
    data_access_descriptions = Seq(
      LangAttr("some conditions", "en", element_version = "elem_vers"),
      LangAttr("joku conditions", "fi")),
    research_instruments = Seq(
      LangAttr("some.resinstru", "en", system_name = "vocab",
        uri = "vocaburi", description = "some research instrument"),
      LangAttr("other.resinstru", "fi", system_name = "sanasto",
        uri = "sanastouri", description = "joku research instrument")),
    time_methods = Seq(
      LangAttr("time.meth", "en", system_name = "tmvocab", uri = "tmuri")),
    sampling_procedures = Seq(
      LangAttr("samp.proc", "en", system_name = "spvocab", uri = "spuri",
        description = "a sampling procedure")),
    collection_modes = Seq(
      LangAttr("coll.mode", "en", system_name = "cmvocab", uri = "cmuri")),
    universes = Seq(LangAttr("some universe", "en")),
    file_names = Seq(LangAttr("file1.csv", "en")),
    publication_dates = Seq(LangAttr("2012-05-01", "en")),
    copyrights = Seq(LangAttr("copyright text", "en")),
    funding_agencies = Seq(LangAttr("Funder X", "en")),
    grant_numbers = Seq(LangAttr("grant-42", "en", agency = "EC")))

  val all: Seq[Study] =
    Seq(minimal, dataciteValid, deleted, nestedProvenance, multiLang)

  val sourcesYaml: String =
    """- url: 'http://somebaseurl'
      |  source: 'FSD'
      |  setname: 'FSD metadata'
      |  description: 'FSD metadata description'
      |- url: 'https://www.da-ra.de/oaip'
      |  source: 'GESIS'
      |  setname: 'GESIS metadata'
      |""".stripMargin

  val configurableYaml: String =
    """spec: 'thematic'
      |name: 'Thematic'
      |description: 'Thematic grouping of records'
      |nodes:
      |  - spec: 'social_sciences'
      |    name: 'Social sciences'
      |    identifiers: [agg_id_1, agg_id_2]
      |  - spec: 'humanities'
      |    name: 'Humanities'
      |    identifiers: [agg_id_2, agg_id_lang, agg_id_prov]
      |""".stripMargin
}
