package graft.render

import java.sql.Timestamp
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Row

import scala.xml.{Elem, Node, NodeSeq, Null, Text, UnprefixedAttribute, Utility}

/** OAI-PMH XML serialization (SURVEY.md §2.5 IO3) — the Spark analogue of
  * the reference's Genshi templates (templates/agg_*.xml). Pure
  * row → XML functions: pages are small (≤ list_size), so rendering is a
  * driver-side map over collected rows; nothing here touches executors.
  */
object OaiXml {

  private val IsoFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
      .withZone(ZoneOffset.UTC)

  def isoDate(ts: Timestamp): String =
    if (ts == null) "" else IsoFmt.format(ts.toInstant)

  /** Record header (templates/agg_get_record.xml:13-18): deleted records
    * get status="deleted" and datestamp = deletion time (T13).
    */
  def header(
      identifier: String,
      datestamp: Timestamp,
      setSpecs: scala.collection.Seq[String],
      deleted: Boolean): Elem = {
    val base =
      <header>
        <identifier>{identifier}</identifier>
        <datestamp>{isoDate(datestamp)}</datestamp>
        {setSpecs.map(s => <setSpec>{s}</setSpec>)}
      </header>
    if (deleted) base % new UnprefixedAttribute("status", "deleted", Null)
    else base
  }

  /** Provenance rendered as recursively nested originDescription — element
    * 0 outermost (templates/provenance.xml:7-22; tests/test_serve.py:
    * 246-272). `altered` bool → 'true'/'false' string (T15).
    */
  def provenance(hops: scala.collection.Seq[Row]): NodeSeq = {
    def nest(rest: scala.collection.Seq[Row]): NodeSeq =
      if (rest.isEmpty) NodeSeq.Empty
      else {
        val h = rest.head
        <originDescription harvestDate={h.getAs[String]("harvest_date")}
                           altered={String.valueOf(h.getAs[Boolean]("altered"))}>
          <baseURL>{h.getAs[String]("base_url")}</baseURL>
          <identifier>{h.getAs[String]("identifier")}</identifier>
          <datestamp>{h.getAs[String]("datestamp")}</datestamp>
          <metadataNamespace>{h.getAs[String]("metadata_namespace")}</metadataNamespace>
          {nest(rest.tail)}
        </originDescription>
      }
    if (hops == null || hops.isEmpty) NodeSeq.Empty
    else
      <about>
        <provenance xmlns="http://www.openarchives.org/OAI/2.0/provenance"
                    xsi:schemaLocation="http://www.openarchives.org/OAI/2.0/provenance http://www.openarchives.org/OAI/2.0/provenance.xsd">
          {nest(hops)}
        </provenance>
      </about>
  }

  /** oai_dc metadata body (templates/agg_oai_dc.xml) from a derived row. */
  def oaiDcMetadata(r: Row): Elem = {
    def strs(field: String): Seq[String] =
      Option(r.getAs[scala.collection.Seq[String]](field)).map(_.toSeq).getOrElse(Nil).filter(_ != null)
    def langValues(field: String): Seq[(String, String)] =
      Option(r.getAs[scala.collection.Seq[Row]](field)).getOrElse(Nil)
        .filter(e => e != null && e.getAs[String]("value") != null)
        .map(e => (e.getAs[String]("value"), e.getAs[String]("lang"))).toSeq

    <metadata>
      <oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
                 xmlns:dc="http://purl.org/dc/elements/1.1/">
        {langValues("study_titles").map { case (v, l) =>
          <dc:title xml:lang={l}>{v}</dc:title> }}
        {strs("dc_identifiers").map(v => <dc:identifier>{v}</dc:identifier>)}
        {strs("dc_uris").map(v => <dc:identifier>{v}</dc:identifier>)}
        {langValues("principal_investigators").map { case (v, _) =>
          <dc:creator>{v}</dc:creator> }}
        {Option(r.getAs[String]("dc_publisher")).toSeq.map(v =>
          <dc:publisher>{v}</dc:publisher>)}
        {strs("dc_subjects").map(v => <dc:subject>{v}</dc:subject>)}
        {langValues("abstracts").map { case (v, l) =>
          <dc:description xml:lang={l}>{v}</dc:description> }}
        {strs("dc_languages").map(v => <dc:language>{v}</dc:language>)}
        {strs("dc_dates").map(v => <dc:date>{v}</dc:date>)}
        <dc:type>{r.getAs[String]("dc_type")}</dc:type>
      </oai_dc:dc>
    </metadata>
  }

  /** oai_ddi25 metadata body — DDI 2.5 codeBook shell
    * (templates/agg_oai_ddi25 via kuha; widest projection, transforms are
    * identity so fields render as stored).
    */
  def oaiDdiMetadata(r: Row): Elem = {
    def langValues(field: String): Seq[(String, String)] =
      Option(r.getAs[scala.collection.Seq[Row]](field)).getOrElse(Nil)
        .filter(e => e != null && e.getAs[String]("value") != null)
        .map(e => (e.getAs[String]("value"), e.getAs[String]("lang"))).toSeq
    <metadata>
      <codeBook xmlns="ddi:codebook:2_5" version="2.5">
        <stdyDscr>
          <citation>
            <titlStmt>
              {langValues("study_titles").map { case (v, l) =>
                <titl xml:lang={l}>{v}</titl> }}
              {langValues("parallel_study_titles").map { case (v, l) =>
                <parTitl xml:lang={l}>{v}</parTitl> }}
              {langValues("identifiers").map { case (v, _) =>
                <IDNo>{v}</IDNo> }}
            </titlStmt>
            <rspStmt>
              {langValues("principal_investigators").map { case (v, _) =>
                <AuthEnty>{v}</AuthEnty> }}
            </rspStmt>
            <distStmt>
              {langValues("publishers").map { case (v, l) =>
                <producer xml:lang={l}>{v}</producer> }}
              {langValues("distributors").map { case (v, l) =>
                <distrbtr xml:lang={l}>{v}</distrbtr> }}
            </distStmt>
          </citation>
          <stdyInfo>
            {langValues("abstracts").map { case (v, l) =>
              <abstract xml:lang={l}>{v}</abstract> }}
            <subject>
              {langValues("keywords").map { case (v, l) =>
                <keyword xml:lang={l}>{v}</keyword> }}
              {langValues("classifications").map { case (v, l) =>
                <topcClas xml:lang={l}>{v}</topcClas> }}
            </subject>
          </stdyInfo>
        </stdyDscr>
      </codeBook>
    </metadata>
  }

  /** oai_datacite metadata body (templates/agg_oai_datacite.xml): derived
    * preferred id (T7), 4-digit year (T8), publisher priority (T9),
    * filtered related ids (T10), funder refs (T11), keyword∪classification
    * subjects (T12). No xml:lang on creator/publisher/date/rights
    * (tests/test_serve.py:666-671,718-719,862-863,883-884).
    */
  def oaiDataciteMetadata(r: Row): Elem = {
    def langValues(field: String): Seq[(String, String)] =
      Option(r.getAs[scala.collection.Seq[Row]](field)).getOrElse(Nil)
        .filter(e => e != null && e.getAs[String]("value") != null)
        .map(e => (e.getAs[String]("value"), e.getAs[String]("lang"))).toSeq
    val pref = Option(r.getAs[Row]("preferred_identifier"))
    <metadata>
      <resource xmlns="http://datacite.org/schema/kernel-4">
        {pref.toSeq.map(p =>
          <identifier identifierType={p.getAs[String]("agency")}>{
            p.getAs[String]("value")}</identifier>)}
        <creators>
          {langValues("principal_investigators").map { case (v, _) =>
            <creator><creatorName>{v}</creatorName></creator> }}
        </creators>
        <titles>
          {langValues("study_titles").map { case (v, l) =>
            <title xml:lang={l}>{v}</title> }}
        </titles>
        {Option(r.getAs[String]("datacite_publisher")).toSeq.map(v =>
          <publisher>{v}</publisher>)}
        {Option(r.getAs[String]("datacite_year")).toSeq.map(v =>
          <publicationYear>{v}</publicationYear>)}
        <resourceType resourceTypeGeneral="Dataset">Dataset</resourceType>
        <subjects>
          {Option(r.getAs[scala.collection.Seq[Row]]("datacite_subjects")).getOrElse(Nil)
            .filter(e => e != null)
            .map(e => Option(e.getAs[String]("description"))
              .getOrElse(e.getAs[String]("value")))
            .filter(_ != null)
            .map(v => <subject>{v}</subject>)}
        </subjects>
        <relatedIdentifiers>
          {Option(r.getAs[scala.collection.Seq[Row]]("related_identifiers")).getOrElse(Nil)
            .map(p =>
              <relatedIdentifier relatedIdentifierType={p.getAs[String]("agency")}
                                 relationType="IsCitedBy">{
                p.getAs[String]("identifier")}</relatedIdentifier>)}
        </relatedIdentifiers>
        <fundingReferences>
          {Option(r.getAs[scala.collection.Seq[Row]]("funder_references")).getOrElse(Nil)
            .map(g =>
              <fundingReference>
                <funderName>{g.getAs[String]("agency")}</funderName>
                <awardNumber>{g.getAs[String]("value")}</awardNumber>
              </fundingReference>)}
        </fundingReferences>
      </resource>
    </metadata>
  }

  /** Full <record>: header only when deleted (T13). */
  def record(
      headerElem: Elem,
      metadata: Option[Elem],
      about: NodeSeq,
      deleted: Boolean): Elem =
    if (deleted) <record>{headerElem}</record>
    else <record>{headerElem}{metadata.orNull}{about}</record>

  def error(code: String, message: String): Elem =
    <error code={code}>{message}</error>

  /** Response envelope; line 2 carries the optional XSL stylesheet PI
    * (tests/test_serve.py:1503-1557).
    */
  def envelope(
      verb: Option[String],
      requestAttrs: Map[String, String],
      baseUrl: String,
      responseDate: Timestamp,
      body: NodeSeq,
      stylesheet: Option[String] = None): String = {
    val attrs = requestAttrs.foldLeft[scala.xml.MetaData](Null) {
      case (acc, (k, v)) => new UnprefixedAttribute(k, v, acc)
    }
    val allAttrs = verb
      .map(v => new UnprefixedAttribute("verb", v, attrs))
      .getOrElse(attrs)
    val request = <request>{baseUrl}</request> % allAttrs
    val root =
      <OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/"
               xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"
               xsi:schemaLocation="http://www.openarchives.org/OAI/2.0/ http://www.openarchives.org/OAI/2.0/OAI-PMH.xsd">
        <responseDate>{isoDate(responseDate)}</responseDate>
        {request}
        {body}
      </OAI-PMH>
    val pi = stylesheet
      .map(href => s"""<?xml-stylesheet type="text/xsl" href="$href"?>\n""")
      .getOrElse("")
    """<?xml version="1.0" encoding="UTF-8"?>""" + "\n" + pi +
      Utility.serialize(Utility.trim(root), minimizeTags =
        scala.xml.MinimizeMode.Always).toString
  }
}
