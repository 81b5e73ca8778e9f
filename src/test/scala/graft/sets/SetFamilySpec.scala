package graft.sets

import graft.{Fixtures, SparkSpec}
import org.apache.spark.sql.DataFrame

class SetFamilySpec extends SparkSpec {

  private lazy val studies: DataFrame = {
    val s = spark
    import s.implicits._
    s.createDataset(Fixtures.all).toDF()
  }

  private lazy val sourceSet = SourceSet.fromYaml(Fixtures.sourcesYaml)
  private lazy val confSet = ConfigurableSet.fromYaml(Fixtures.configurableYaml)

  private def labelsOf(fam: SetFamily, id: String): Set[String] =
    studies.filter(s"_aggregator_identifier = '$id'")
      .select(fam.labels.as("l"))
      .collect().head.getSeq[String](0).toSet

  test("S1 language: enumerate distinct title languages with generated names") {
    val infos = LanguageSet.enumerate(studies)
    assert(infos.map(_.spec) == Seq("language:de", "language:en", "language:fi"))
    assert(infos.head.name == "Language de")
  }

  test("S1 language: labels and filter") {
    assert(labelsOf(LanguageSet, "agg_id_lang") ==
      Set("language:en", "language:fi", "language:de"))
    assert(labelsOf(LanguageSet, "agg_id_1").isEmpty)
    val matched = studies
      .filter(LanguageSet.filterFor(Some("de")).toColumn)
      .select("_aggregator_identifier").collect().map(_.getString(0)).toSet
    assert(matched == Set("agg_id_lang"))
  }

  test("S2 openaire_data: membership by identifier agency") {
    assert(labelsOf(OpenAireSet, "agg_id_2") == Set("openaire_data"))
    assert(labelsOf(OpenAireSet, "agg_id_lang") == Set("openaire_data")) // ARK
    assert(labelsOf(OpenAireSet, "agg_id_1").isEmpty)
  }

  test("S3 source: YAML mapping drives labels and filters") {
    assert(labelsOf(sourceSet, "agg_id_1") == Set("source:FSD"))
    assert(labelsOf(sourceSet, "agg_id_lang") == Set("source:GESIS"))
    val fsd = studies.filter(sourceSet.filterFor(Some("FSD")).toColumn)
      .select("_aggregator_identifier").collect().map(_.getString(0)).toSet
    assert(fsd == Set("agg_id_1", "agg_id_2", "agg_id_del", "agg_id_prov"))
    // nestedProvenance's upstream hop is direct=false → no GESIS label
    assert(labelsOf(sourceSet, "agg_id_prov") == Set("source:FSD"))
  }

  test("S3 source: ListSets enumeration from config, not data") {
    val infos = sourceSet.enumerate(studies)
    assert(infos.map(_.spec) == Seq("source", "source:FSD", "source:GESIS"))
    assert(infos(1).description.contains("FSD metadata description"))
  }

  test("S4 configurable: child membership + top-level union dedup") {
    assert(confSet.allIdentifiers ==
      Seq("agg_id_1", "agg_id_2", "agg_id_lang", "agg_id_prov"))
    assert(labelsOf(confSet, "agg_id_2") ==
      Set("thematic", "thematic:social_sciences", "thematic:humanities"))
    assert(labelsOf(confSet, "agg_id_del").isEmpty)
    val hum = studies.filter(confSet.filterFor(Some("humanities")).toColumn)
      .select("_aggregator_identifier").collect().map(_.getString(0)).toSet
    assert(hum == Set("agg_id_2", "agg_id_lang", "agg_id_prov"))
  }

  test("S4 re-read-per-use mode: a YAML edit lands on the NEXT use " +
    "(the reference's metadataformats.py:213-232 behaviour), boot " +
    "still validates, and a live spec change is rejected") {
    val f = java.nio.file.Files.createTempFile("graft-confset-", ".yaml")
    java.nio.file.Files.writeString(f, Fixtures.configurableYaml)
    val set = ReloadingConfigurableSet(f.toString)
    assert(labelsOf(set, "agg_id_1") ==
      Set("thematic", "thematic:social_sciences"))
    // edit the file: move agg_id_1 OUT of social_sciences, into a new
    // child — the SAME SetFamily instance must serve the new lists
    java.nio.file.Files.writeString(f,
      """spec: 'thematic'
        |name: 'Thematic'
        |nodes:
        |  - spec: 'social_sciences'
        |    name: 'Social sciences'
        |    identifiers: [agg_id_2]
        |  - spec: 'economics'
        |    name: 'Economics'
        |    identifiers: [agg_id_1]
        |""".stripMargin)
    assert(labelsOf(set, "agg_id_1") ==
      Set("thematic", "thematic:economics"))
    assert(set.enumerate(studies).map(_.spec).toSet ==
      Set("thematic", "thematic:social_sciences", "thematic:economics"))
    val econ = studies.filter(set.filterFor(Some("economics")).toColumn)
      .select("_aggregator_identifier").collect().map(_.getString(0)).toSet
    assert(econ == Set("agg_id_1"))
    // a file that turns INVALID surfaces on the request that re-reads
    java.nio.file.Files.writeString(f, "name: 'x'\nnodes: []")
    assertThrows[SetConfigError](set.labels)
    // a live SPEC change is a dispatch-key change — rejected
    java.nio.file.Files.writeString(f,
      "spec: 'other'\nname: 'x'\nnodes:\n  - spec: a\n    name: b\n    identifiers: [i]")
    assertThrows[IllegalArgumentException](set.labels)
    // boot-time validation parity: constructing over a bad file throws
    val bad = java.nio.file.Files.createTempFile("graft-confset-bad-", ".yaml")
    java.nio.file.Files.writeString(bad, "name: 'x'\nnodes: []")
    assertThrows[SetConfigError](ReloadingConfigurableSet(bad.toString))
  }

  test("S4 validation matrix: malformed YAML raises at configure") {
    def bad(yaml: String): Unit =
      assertThrows[SetConfigError](ConfigurableSet.fromYaml(yaml))
    bad("name: 'x'\nnodes:\n  - spec: a\n    name: b\n    identifiers: [i]")  // missing spec
    bad("spec: ''\nname: 'x'\nnodes:\n  - spec: a\n    name: b\n    identifiers: [i]") // empty spec
    bad("spec: 'x'\nnodes:\n  - spec: a\n    name: b\n    identifiers: [i]")  // missing name
    bad("spec: 'x'\nname: 'y'")                                              // missing nodes
    bad("spec: 'x'\nname: 'y'\nnodes: []")                                   // empty nodes
    bad("spec: 'x'\nname: 'y'\nnodes:\n  - name: b\n    identifiers: [i]")   // node missing spec
    bad("spec: 'x'\nname: 'y'\nnodes:\n  - spec: a\n    identifiers: [i]")   // node missing name
    bad("spec: 'x'\nname: 'y'\nnodes:\n  - spec: a\n    name: b")            // missing identifiers
    bad("spec: 'x'\nname: 'y'\nnodes:\n  - spec: a\n    name: b\n    identifiers: []") // empty ids
    bad("spec: [1,2]\nname: 'y'\nnodes:\n  - spec: a\n    name: b\n    identifiers: [i]") // non-string spec
    bad("spec: 'x'\nname: 'y'\nnodes: 17")                                   // non-list nodes
    bad("spec: 'x'\nname: 'y'\nnodes:\n  - spec: a\n    name: b\n    identifiers: {k: v}") // non-list ids
    bad("spec: 'x'\n  bad indent: [")                                        // invalid syntax
  }

  private def tmpYaml(content: String): String = {
    val f = java.nio.file.Files.createTempFile("graft-ext-set", ".yaml")
    java.nio.file.Files.write(f, content.getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    f.toString
  }

  private def withPathNode(extPath: String): String =
    s"""spec: 'thematic'
       |name: 'Thematic'
       |description: 'Thematic grouping of records'
       |nodes:
       |  - spec: 'social_sciences'
       |    name: 'Social sciences'
       |    description: 'Studies in social sciences'
       |    identifiers:
       |    - id_1
       |    - id_2
       |  - path: '$extPath'
       |""".stripMargin

  test("S4 external path node: single-node external file appends one node") {
    // mirrors tests/test_metadataformats.py::test_get_config_with_path_single_node
    val ext = tmpYaml(
      "spec: 'history'\nname: 'History'\ndescription: 'Studies in history'\n" +
        "identifiers:\n- id_5\n- id_6\n")
    val set = ConfigurableSet.fromYaml(withPathNode(ext))
    assert(set.nodes.map(_.spec) == Seq("social_sciences", "history"))
    assert(set.nodes.last.identifiers == Seq("id_5", "id_6"))
    assert(set.nodes.last.description.contains("Studies in history"))
  }

  test("S4 external path node: list-of-nodes external file appends them all") {
    // mirrors tests/test_metadataformats.py::test_get_config_with_path_multiple_nodes
    val ext = tmpYaml(
      "- spec: 'history'\n  name: 'History'\n  description: 'Studies in history'\n" +
        "  identifiers:\n  - id_5\n  - id_6\n" +
        "- spec: 'literature'\n  name: 'Literature'\n  description: 'Literature Studies'\n" +
        "  identifiers:\n  - id_7\n  - id_8\n")
    val set = ConfigurableSet.fromYaml(withPathNode(ext))
    assert(set.nodes.map(_.spec) == Seq("social_sciences", "history", "literature"))
    assert(set.allIdentifiers == Seq("id_1", "id_2", "id_5", "id_6", "id_7", "id_8"))
    // membership spans inline and external children
    assert(set.filterFor(Some("literature")) ==
      graft.query.In("_aggregator_identifier", Seq("id_7", "id_8")))
  }

  test("S4 external path node: malformed external files raise at configure") {
    def badExt(content: String): Unit = {
      val ext = tmpYaml(content)
      assertThrows[SetConfigError](ConfigurableSet.fromYaml(withPathNode(ext)))
    }
    badExt("name: 'History'\nidentifiers:\n- id_5")                     // missing spec
    badExt("spec: 'history'\nidentifiers:\n- id_5")                     // missing name
    badExt("spec: 'history'\nname: 'History'")                          // missing identifiers
    badExt("spec: 'history'\nname: 'History'\nidentifiers: []")         // empty identifiers
    badExt("- spec: 'ok'\n  name: 'Ok'\n  identifiers: [i]\n- spec: 'bad'\n  name: 'Bad'") // one bad in list
    badExt("outer: {inner: value)")                                     // invalid YAML syntax
    // unreadable external path
    assertThrows[SetConfigError](
      ConfigurableSet.fromYaml(withPathNode("/no/such/ext_conf.yaml")))
    // path must be a non-empty string
    assertThrows[SetConfigError](
      ConfigurableSet.fromYaml(
        "spec: 'x'\nname: 'y'\nnodes:\n  - path: ''"))
  }

  test("source YAML: single-source filter builds elemMatch on url") {
    import graft.query.{ElemEq, ElemMatch}
    assert(sourceSet.filterFor(Some("FSD")) ==
      ElemMatch("_provenance",
        ElemEq("base_url", "http://somebaseurl"), ElemEq("direct", true)))
  }
}
