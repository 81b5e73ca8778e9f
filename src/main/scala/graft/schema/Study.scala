package graft.schema

import java.sql.Timestamp

/** The one logical record class of the engine — the aggregator's `Study`
  * document (SURVEY.md §1; reference: cdcagg_oai/metadataformats.py:31,464
  * `study_class = Study`; field inventory asserted at
  * tests/test_serve.py:1384-1424).
  *
  * Every content field is an array of lang-value structs: each element has
  * `value` + `lang` plus a sparse set of named attributes. Rather than 35
  * distinct struct types we use one wide [[LangAttr]] struct with nullable
  * attrs — parquet stores nulls for free (RLE), nested-schema pruning trims
  * unread attrs at scan time, and one Encoder covers every field.
  */
final case class LangAttr(
    value: String,
    lang: String,
    agency: String = null,            // identifiers (tests/test_serve.py:49)
    description: String = null,       // keywords/classifications/collection_periods
    system_name: String = null,       // vocab fields (metadataformats.py:585-597)
    uri: String = null,
    organization: String = null,      // principal_investigators
    distribution_date: String = null, // publication_years (templates/agg_oai_dc.xml:34-36)
    event: String = null,             // collection_periods: single|start|end
    identifier: String = null,        // related_publications
    identifier_agency: String = null, // related_publications
    element_version: String = null)   // data_access_descriptions

/** One harvest-provenance hop (templates/provenance.xml:9-20). Element 0 is
  * the outermost originDescription when rendered.
  */
final case class Provenance(
    harvest_date: String,
    altered: Boolean,
    base_url: String,
    identifier: String,
    datestamp: String,
    direct: Boolean,
    metadata_namespace: String)

/** Record system metadata; `status` is the soft-delete flag
  * (metrics.py:42 REC_STATUS_DELETED = "deleted"); timestamps are strict
  * UTC TimestampType — the reference compares them with `$lt $isodate`
  * (tests/test_serve.py:1342), i.e. real timestamp ordering.
  */
final case class RecordMeta(
    status: String,
    created: Timestamp,
    updated: Timestamp,
    deleted: Timestamp)

object RecordStatus {
  val Created = "created"
  val Updated = "updated"
  val Deleted = "deleted"
}

final case class Study(
    study_number: String,
    _aggregator_identifier: String,
    /** Denormalized publisher key, materialized at ingest exactly as the
      * reference's 0.7.0 schema evolution did (metrics.py:179-182,
      * CHANGELOG.md:111-113): first direct provenance base_url.
      */
    _direct_base_url: String,
    _metadata: RecordMeta,
    _provenance: Seq[Provenance],
    identifiers: Seq[LangAttr] = Nil,
    study_titles: Seq[LangAttr] = Nil,
    parallel_study_titles: Seq[LangAttr] = Nil,
    document_titles: Seq[LangAttr] = Nil,
    principal_investigators: Seq[LangAttr] = Nil,
    publishers: Seq[LangAttr] = Nil,
    distributors: Seq[LangAttr] = Nil,
    abstracts: Seq[LangAttr] = Nil,
    keywords: Seq[LangAttr] = Nil,
    classifications: Seq[LangAttr] = Nil,
    publication_years: Seq[LangAttr] = Nil,
    publication_dates: Seq[LangAttr] = Nil,
    distribution_dates: Seq[LangAttr] = Nil,
    document_uris: Seq[LangAttr] = Nil,
    study_uris: Seq[LangAttr] = Nil,
    study_area_countries: Seq[LangAttr] = Nil,
    geographic_coverages: Seq[LangAttr] = Nil,
    data_collection_copyrights: Seq[LangAttr] = Nil,
    copyrights: Seq[LangAttr] = Nil,
    data_access: Seq[LangAttr] = Nil,
    data_access_descriptions: Seq[LangAttr] = Nil,
    citation_requirements: Seq[LangAttr] = Nil,
    deposit_requirements: Seq[LangAttr] = Nil,
    time_methods: Seq[LangAttr] = Nil,
    sampling_procedures: Seq[LangAttr] = Nil,
    collection_modes: Seq[LangAttr] = Nil,
    analysis_units: Seq[LangAttr] = Nil,
    research_instruments: Seq[LangAttr] = Nil,
    instruments: Seq[LangAttr] = Nil,
    universes: Seq[LangAttr] = Nil,
    file_names: Seq[LangAttr] = Nil,
    data_kinds: Seq[LangAttr] = Nil,
    collection_periods: Seq[LangAttr] = Nil,
    related_publications: Seq[LangAttr] = Nil,
    grant_numbers: Seq[LangAttr] = Nil,
    funding_agencies: Seq[LangAttr] = Nil)

object Study {

  /** Valid OpenAIRE identifier agencies — the `openaire_data` set predicate
    * and oai_datacite validity filter (metadataformats.py:26,786-788).
    */
  val OpenAireIdAgencies: Seq[String] =
    Seq("DOI", "ARK", "Handle", "PURL", "URN", "URL")

  /** Controlled relatedIdentifier agencies for datacite related
    * publications (tests/test_serve.py:934-993 — `Unknown`/empty rejected).
    */
  val RelatedIdAgencies: Seq[String] =
    Seq("DOI", "ISBN", "ISSN", "ARK", "Handle", "PURL", "URN", "URL")

  /** Grant-number values carrying an OpenAIRE funder reference
    * (tests/test_serve.py:995-1029).
    */
  val FunderRefPrefix = "info:eu-repo/grantAgreement"
}
