package graft.formats

import graft.query.{ElemIn, ElemMatch, Filter, True}
import graft.schema.Study
import graft.sets.SetFamily
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One OAI metadata format — the strategy objects the reference registers
  * via the `cdcagg.oai.metadataformats` entrypoint group (setup.py:44-48;
  * SURVEY.md §2.5 IO5). Each declares its projection (Q11: per-format
  * `fields` lists, tests/test_serve.py:1379-1471), a validity filter
  * (datacite drops records without an OpenAIRE id — metadataformats.py:
  * 733-748), and its derived columns (the T1..T16 scalar transforms,
  * SURVEY.md §2.3) — ALL as built-in Spark SQL functions, so a full-corpus
  * ListRecords sweep is one narrow codegen'd projection pass.
  */
trait MetadataFormat {
  def prefix: String
  def metadataNamespace: String
  def schemaLocation: String

  /** Per-format projection (reference `_record_fields`). */
  def recordFields: Seq[String]

  /** Format validity: applied BEFORE pagination/counting so resumption
    * tokens stay aligned (SURVEY.md §7.4 risk 2).
    */
  def validFilter: Filter = True

  /** Add this format's derived columns. */
  def derive(df: DataFrame): DataFrame
}

object FormatColumns {

  /** Header fields shared by all formats (reference `_header_fields`,
    * metadataformats.py:470-475).
    */
  val headerFields: Seq[String] =
    Seq("_aggregator_identifier", "_metadata", "_provenance")

  private def values(field: String): Column =
    transform(col(field), _.getField("value"))

  /** T1: distinct identifier values (templates/agg_oai_dc.xml:13). */
  def distinctValues(field: String): Column =
    array_distinct(values(field))

  /** T2: distinct union of two value arrays (templates/agg_oai_dc.xml:14). */
  def distinctUnion(a: String, b: String): Column =
    array_distinct(concat(values(a), values(b)))

  /** T3: per-element coalesce description→value (agg_oai_dc.xml:28-30). */
  def subjectCoalesce(field: String): Column =
    transform(col(field), k => coalesce(k.getField("description"), k.getField("value")))

  /** T4: distinct languages of a lang-value array (agg_oai_dc.xml:32). */
  def distinctLangs(field: String): Column =
    array_distinct(filter(transform(col(field), _.getField("lang")), _.isNotNull))

  /** T5: date coalesce value→distribution_date (agg_oai_dc.xml:34-36). */
  def dateCoalesce(field: String): Column =
    transform(col(field),
      p => coalesce(p.getField("value"), p.getField("distribution_date")))

  /** T8: publication year — prefer distribution_date, truncate to 4-digit
    * year (tests/test_serve.py:580-597,768-818: `2011-01-02` → `2011`).
    */
  def publicationYear(field: String = "publication_years"): Column = {
    val first = get(col(field), lit(0))
    substring(coalesce(first.getField("distribution_date"), first.getField("value")), 1, 4)
  }

  /** T9: publisher priority — english distributor, first distributor,
    * english publisher, first publisher (tests/test_serve.py:700-766).
    * `get` (0-based) returns null out-of-bounds — safe under ANSI mode,
    * unlike element_at.
    */
  def publisherPriority: Column = {
    def firstEnglish(field: String): Column =
      get(filter(col(field), e => e.getField("lang") === "en"), lit(0)).getField("value")
    def firstAny(field: String): Column =
      get(col(field), lit(0)).getField("value")
    coalesce(
      firstEnglish("distributors"), firstAny("distributors"),
      firstEnglish("publishers"), firstAny("publishers"))
  }

  /** T7: preferred OpenAIRE identifier — first identifier with a valid
    * agency (metadataformats.py:733-739); null → record dropped by the
    * validity filter.
    */
  def preferredIdentifier: Column =
    get(filter(col("identifiers"),
      i => i.getField("agency").isin(Study.OpenAireIdAgencies: _*)), lit(0))

  /** T10: related identifiers — keep (identifier, agency) pairs with
    * non-empty identifier and controlled agency, dedup
    * (tests/test_serve.py:934-993).
    */
  def relatedIdentifiers: Column =
    array_distinct(filter(
      transform(col("related_publications"),
        r => struct(
          r.getField("identifier").as("identifier"),
          r.getField("identifier_agency").as("agency"))),
      p => p.getField("identifier").isNotNull &&
        p.getField("identifier") =!= "" &&
        p.getField("agency").isin(Study.RelatedIdAgencies: _*)))

  /** T11: funder references — grant numbers matching the eu-repo
    * grantAgreement scheme (tests/test_serve.py:995-1042).
    */
  def funderReferences: Column =
    filter(col("grant_numbers"),
      g => g.getField("value").startsWith(Study.FunderRefPrefix))

  /** T13 header datestamp: deleted records use deletion time
    * (templates/agg_get_record.xml:13-18).
    */
  def headerDatestamp: Column =
    when(col("_metadata.status") === "deleted",
      coalesce(col("_metadata.deleted"), col("_metadata.updated")))
      .otherwise(col("_metadata.updated"))

  /** T15: boolean → 'true'/'false' string (templates/provenance.xml:10). */
  def boolString(c: Column): Column =
    when(c, "true").otherwise("false")

  /** Shared header columns incl. per-record set labels (S5) — the concat
    * of every family's label array, computed in one projection.
    */
  def withHeader(df: DataFrame, sets: Seq[SetFamily]): DataFrame = {
    val specs =
      if (sets.isEmpty) array().cast("array<string>")
      else concat(sets.map(_.labels): _*)
    df.withColumn("oai_identifier", col("_aggregator_identifier"))
      .withColumn("oai_datestamp", headerDatestamp)
      .withColumn("oai_deleted", col("_metadata.status") === "deleted")
      .withColumn("oai_sets", specs)
  }
}

/** oai_dc (metadataformats.py:489-541; templates/agg_oai_dc.xml). */
object OaiDcFormat extends MetadataFormat {
  import FormatColumns._
  val prefix = "oai_dc"
  val metadataNamespace = "http://www.openarchives.org/OAI/2.0/oai_dc/"
  val schemaLocation = "http://www.openarchives.org/OAI/2.0/oai_dc.xsd"

  /** 15-field projection (metadataformats.py:494-504). */
  val recordFields: Seq[String] = Seq(
    "study_number", "identifiers", "study_titles", "parallel_study_titles",
    "principal_investigators", "publishers", "distributors", "abstracts",
    "keywords", "classifications", "publication_years", "document_uris",
    "study_uris", "study_area_countries", "data_access")

  def derive(df: DataFrame): DataFrame = df
    .withColumn("dc_identifiers", distinctValues("identifiers"))
    .withColumn("dc_uris", distinctUnion("document_uris", "study_uris"))
    .withColumn("dc_subjects", subjectCoalesce("keywords"))
    .withColumn("dc_languages", distinctLangs("study_titles"))
    .withColumn("dc_dates", dateCoalesce("publication_years"))
    .withColumn("dc_publisher", publisherPriority)
    .withColumn("dc_type", lit("Dataset")) // T6 (agg_oai_dc.xml:38)
}

/** oai_ddi25 — widest projection, transforms are identity
  * (metadataformats.py:565-664).
  */
object OaiDdi25Format extends MetadataFormat {
  val prefix = "oai_ddi25"
  val metadataNamespace = "ddi:codebook:2_5"
  val schemaLocation =
    "https://ddialliance.org/Specification/DDI-Codebook/2.5/XMLSchema/codebook.xsd"

  /** 39-field projection (tests/test_serve.py:1384-1424). */
  val recordFields: Seq[String] = Seq(
    "study_number", "identifiers", "study_titles", "parallel_study_titles",
    "document_titles", "principal_investigators", "publishers", "distributors",
    "abstracts", "keywords", "classifications", "publication_years",
    "publication_dates", "distribution_dates", "document_uris", "study_uris",
    "study_area_countries", "geographic_coverages",
    "data_collection_copyrights", "copyrights", "data_access",
    "data_access_descriptions", "citation_requirements", "deposit_requirements",
    "time_methods", "sampling_procedures", "collection_modes", "analysis_units",
    "research_instruments", "instruments", "universes", "file_names",
    "data_kinds", "collection_periods", "related_publications",
    "grant_numbers", "funding_agencies")

  def derive(df: DataFrame): DataFrame = df
}

/** oai_datacite (metadataformats.py:675-788; templates/agg_oai_datacite.xml). */
object OaiDataciteFormat extends MetadataFormat {
  import FormatColumns._
  val prefix = "oai_datacite"
  val metadataNamespace = "http://schema.datacite.org/meta/kernel-4.3/"
  val schemaLocation = "http://schema.datacite.org/meta/kernel-4.3/metadata.xsd"

  /** 17-field projection (metadataformats.py:679-693). */
  val recordFields: Seq[String] = Seq(
    "study_number", "identifiers", "study_titles", "parallel_study_titles",
    "principal_investigators", "publishers", "distributors", "abstracts",
    "keywords", "classifications", "publication_years", "data_access",
    "data_access_descriptions", "related_publications", "grant_numbers",
    "funding_agencies", "study_area_countries")

  /** Records without any valid OpenAIRE id are invisible to this format —
    * applied before counting so tokens align (metadataformats.py:775-788).
    */
  override val validFilter: Filter =
    ElemMatch("identifiers", ElemIn("agency", Study.OpenAireIdAgencies))

  def derive(df: DataFrame): DataFrame = df
    .withColumn("preferred_identifier", preferredIdentifier)
    .withColumn("datacite_year", publicationYear())
    .withColumn("datacite_publisher", publisherPriority)
    .withColumn("related_identifiers", relatedIdentifiers)
    .withColumn("funder_references", funderReferences)
    .withColumn("datacite_subjects", concat(col("keywords"), col("classifications"))) // T12
}

object MetadataFormats {
  val all: Seq[MetadataFormat] =
    Seq(OaiDcFormat, OaiDdi25Format, OaiDataciteFormat)
  def byPrefix(p: String): Option[MetadataFormat] = all.find(_.prefix == p)
}
