package graft.render

import java.sql.Timestamp
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Row

import scala.xml.{Elem, MetaData, Node, NodeSeq, Null, PrefixedAttribute, Text, TopScope, UnprefixedAttribute, Utility}

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

  /** oai_ddi25 metadata body — full DDI 2.5 codeBook over the 37-field
    * projection (reference: kuha's oai_ddi25 template as exercised by
    * tests/test_serve.py:359-540,1379-1424). Element placement follows the
    * reference's own assertions where tested:
    *  - document_titles → docDscr/citation/titlStmt/titl (:382-403)
    *  - study_uris → stdyDscr/citation/holdings@URI (:359-380)
    *  - distribution_dates → distStmt/distDate@date, text=description (:454-478)
    *  - collection_periods → sumDscr/collDate@date@event (:513-540)
    *  - data_kinds → sumDscr/dataKind (:405-426)
    *  - data_access_descriptions → useStmt/conditions@elementVersion (:428-452)
    *  - research_instruments → dataColl/resInstru with nested
    *    concept@vocab@vocabURI, own text = description (:480-511)
    * and DDI 2.5 codebook structure for the rest (time_methods /
    * sampling_procedures / collection_modes share resInstru's
    * concept-vocab shape; universes/nations/coverages in sumDscr;
    * grant_numbers/funding_agencies as prodStmt grantNo/fundAg;
    * file_names under fileDscr). `data_collection_copyrights` stays
    * projected (Q11 parity) but unrendered: the reference suite attests
    * no codeBook placement for it.
    */
  def oaiDdiMetadata(r: Row): Elem = {
    def rows(field: String): Seq[Row] =
      Option(r.getAs[scala.collection.Seq[Row]](field)).getOrElse(Nil)
        .filter(e => e != null && e.getAs[String]("value") != null).toSeq
    def langValues(field: String): Seq[(String, String)] =
      rows(field).map(e => (e.getAs[String]("value"), e.getAs[String]("lang")))
    def s(e: Row, f: String): String = e.getAs[String](f)
    def langMeta(lang: String): MetaData =
      if (lang == null) Null else new PrefixedAttribute("xml", "lang", lang, Null)
    def descText(e: Row): Seq[Node] =
      Option(s(e, "description")).map(Text(_)).toSeq
    // CESSDA vocab fields: <label xml:lang><concept vocab vocabURI>value</concept>description</label>
    def conceptElems(field: String, label: String): Seq[Elem] =
      rows(field).map { e =>
        val concept =
          <concept vocab={s(e, "system_name")} vocabURI={s(e, "uri")}>{s(e, "value")}</concept>
        Elem(null, label, langMeta(s(e, "lang")), TopScope,
          minimizeEmpty = false, (concept +: descText(e)): _*)
      }
    <metadata>
      <codeBook xmlns="ddi:codebook:2_5" version="2.5">
        <docDscr>
          <citation>
            <titlStmt>
              {langValues("document_titles").map { case (v, l) =>
                <titl xml:lang={l}>{v}</titl> }}
            </titlStmt>
            {rows("document_uris").map(e =>
              <holdings URI={s(e, "value")} xml:lang={s(e, "lang")}/>)}
          </citation>
        </docDscr>
        <stdyDscr>
          <citation>
            <titlStmt>
              {langValues("study_titles").map { case (v, l) =>
                <titl xml:lang={l}>{v}</titl> }}
              {langValues("parallel_study_titles").map { case (v, l) =>
                <parTitl xml:lang={l}>{v}</parTitl> }}
              {rows("identifiers").map(e =>
                <IDNo agency={s(e, "agency")}>{s(e, "value")}</IDNo>)}
            </titlStmt>
            <rspStmt>
              {rows("principal_investigators").map(e =>
                <AuthEnty affiliation={s(e, "organization")}>{s(e, "value")}</AuthEnty>)}
            </rspStmt>
            <prodStmt>
              {langValues("publishers").map { case (v, l) =>
                <producer xml:lang={l}>{v}</producer> }}
              {langValues("copyrights").map { case (v, l) =>
                <copyright xml:lang={l}>{v}</copyright> }}
              {rows("publication_dates").map(e =>
                <prodDate date={s(e, "value")} xml:lang={s(e, "lang")}>{descText(e)}</prodDate>)}
              {langValues("funding_agencies").map { case (v, l) =>
                <fundAg xml:lang={l}>{v}</fundAg> }}
              {rows("grant_numbers").map(e =>
                <grantNo agency={s(e, "agency")}>{s(e, "value")}</grantNo>)}
            </prodStmt>
            <distStmt>
              {langValues("distributors").map { case (v, l) =>
                <distrbtr xml:lang={l}>{v}</distrbtr> }}
              {rows("distribution_dates").map(e =>
                <distDate date={s(e, "value")} xml:lang={s(e, "lang")}>{descText(e)}</distDate>)}
            </distStmt>
            {rows("study_uris").map(e =>
              <holdings URI={s(e, "value")} xml:lang={s(e, "lang")}/>)}
          </citation>
          <stdyInfo>
            <subject>
              {rows("keywords").map(e =>
                <keyword vocab={s(e, "system_name")} vocabURI={s(e, "uri")}
                         xml:lang={s(e, "lang")}>{s(e, "value")}</keyword>)}
              {rows("classifications").map(e =>
                <topcClas vocab={s(e, "system_name")} vocabURI={s(e, "uri")}
                          xml:lang={s(e, "lang")}>{s(e, "value")}</topcClas>)}
            </subject>
            {langValues("abstracts").map { case (v, l) =>
              <abstract xml:lang={l}>{v}</abstract> }}
            <sumDscr>
              {rows("collection_periods").map(e =>
                <collDate date={s(e, "value")} event={s(e, "event")}
                          xml:lang={s(e, "lang")}>{descText(e)}</collDate>)}
              {langValues("study_area_countries").map { case (v, l) =>
                <nation xml:lang={l}>{v}</nation> }}
              {langValues("geographic_coverages").map { case (v, l) =>
                <geogCover xml:lang={l}>{v}</geogCover> }}
              {conceptElems("analysis_units", "anlyUnit")}
              {langValues("universes").map { case (v, l) =>
                <universe xml:lang={l}>{v}</universe> }}
              {langValues("data_kinds").map { case (v, l) =>
                <dataKind xml:lang={l}>{v}</dataKind> }}
            </sumDscr>
          </stdyInfo>
          <method>
            <dataColl>
              {conceptElems("time_methods", "timeMeth")}
              {conceptElems("sampling_procedures", "sampProc")}
              {conceptElems("collection_modes", "collMode")}
              {conceptElems("research_instruments", "resInstru")}
              {langValues("instruments").map { case (v, l) =>
                <instrumentDevelopment xml:lang={l}>{v}</instrumentDevelopment> }}
            </dataColl>

          </method>
          <dataAccs>
            <useStmt>
              {langValues("data_access").map { case (v, l) =>
                <restrctn xml:lang={l}>{v}</restrctn> }}
              {rows("data_access_descriptions").map(e =>
                Elem(null, "conditions",
                  (if (s(e, "element_version") == null) langMeta(s(e, "lang"))
                   else new UnprefixedAttribute(
                     "elementVersion", s(e, "element_version"), langMeta(s(e, "lang")))),
                  TopScope, minimizeEmpty = false, Text(s(e, "value"))))}
              {langValues("citation_requirements").map { case (v, l) =>
                <citReq xml:lang={l}>{v}</citReq> }}
              {langValues("deposit_requirements").map { case (v, l) =>
                <deposReq xml:lang={l}>{v}</deposReq> }}
            </useStmt>
          </dataAccs>
          <othrStdyMat>
            {langValues("related_publications").map { case (v, l) =>
              <relPubl xml:lang={l}>{v}</relPubl> }}
          </othrStdyMat>
        </stdyDscr>
        {if (rows("file_names").isEmpty) NodeSeq.Empty
         else
           <fileDscr>
             <fileTxt>
               {langValues("file_names").map { case (v, l) =>
                 <fileName xml:lang={l}>{v}</fileName> }}
             </fileTxt>
           </fileDscr>}
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
