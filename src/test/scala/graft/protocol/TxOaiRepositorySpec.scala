package graft.protocol

import org.apache.spark.sql.functions.col

import graft.{Fixtures, SparkSpec}
import graft.query.TxStudyStore
import graft.sets.{ConfigurableSet, LanguageSet, OpenAireSet, SourceSet}
import graft.sources.TxTable

import scala.xml.{Elem, XML}

/** The full OAI-PMH verb surface served off a TxTable through
  * [[graft.query.TxStudyStore]]: a harvest that spans commits serves
  * exactly its pinned snapshot, while point verbs and fresh harvests
  * see the latest version.
  */
class TxOaiRepositorySpec extends SparkSpec {

  private lazy val root: String = {
    val s = spark
    import s.implicits._
    val r = java.nio.file.Files
      .createTempDirectory("graft-txoai-").toString
    TxTable.create(s.createDataset(Fixtures.all).toDF(), r)
    r
  }

  private lazy val repo: OaiRepository =
    new OaiRepository(
      new TxStudyStore(spark, root),
      Seq(LanguageSet, OpenAireSet,
        SourceSet.fromYaml(Fixtures.sourcesYaml),
        ConfigurableSet.fromYaml(Fixtures.configurableYaml)),
      OaiConfig(listSize = 2),
      now = () => Fixtures.ts("2022-01-01T00:00:00Z"))

  private def listPage(extra: Map[String, String]): Elem =
    XML.loadString(repo.handle(
      Map("verb" -> "ListRecords", "metadataPrefix" -> "oai_dc") ++ extra))

  private def idsOf(p: Elem): Seq[String] =
    (p \ "ListRecords" \ "record" \ "header" \ "identifier").map(_.text)

  private def drainFrom(first: Elem): Seq[String] = {
    val out = Seq.newBuilder[String]
    var p = first
    var continue = true
    while (continue) {
      out ++= idsOf(p)
      val tok = (p \ "ListRecords" \ "resumptionToken").text.trim
      if (tok.isEmpty) continue = false
      else p = listPage(Map("resumptionToken" -> tok))
    }
    out.result()
  }

  test("a harvest spanning an append and a delete serves its pinned " +
    "snapshot; a fresh harvest and point verbs see the latest version") {
    val s = spark
    import s.implicits._
    val p1 = listPage(Map.empty)
    assert((p1 \ "ListRecords" \ "resumptionToken" \ "@completeListSize")
      .text == "5")
    val page1Ids = idsOf(p1)
    assert(page1Ids.size == 2)

    // mid-harvest commits: a new record and a removed one
    TxTable.append(s.createDataset(Seq(Fixtures.ddiRich)).toDF(), root)
    TxTable.deleteWhere(spark, root,
      col("_aggregator_identifier") === "agg_id_prov")

    val tok = (p1 \ "ListRecords" \ "resumptionToken").text.trim
    val harvested = page1Ids ++ drainFrom(
      listPage(Map("resumptionToken" -> tok)))
    assert(harvested.sorted ==
      Seq("agg_id_1", "agg_id_2", "agg_id_del", "agg_id_lang",
        "agg_id_prov"),
      "the in-flight harvest must serve the pinned snapshot exactly")

    val fresh = drainFrom(listPage(Map.empty))
    assert(fresh.sorted ==
      Seq("agg_id_1", "agg_id_2", "agg_id_ddi", "agg_id_del",
        "agg_id_lang"),
      "a fresh harvest must see the appended and deleted commits")

    // point verb reads the latest version
    val rec = XML.loadString(repo.getRecord("agg_id_ddi", "oai_dc"))
    assert((rec \ "GetRecord" \ "record" \ "header" \ "identifier")
      .text == "agg_id_ddi")
  }
}
