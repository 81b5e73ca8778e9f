package graft.sets

import graft.query._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One child node of the configurable set: an explicit identifier list
  * (README.md:202-313; metadataformats.py:59-295).
  */
final case class ConfigurableNode(
    spec: String,
    name: String,
    identifiers: Seq[String],
    description: Option[String] = None)

/** S4 configurable `<top>` / `<top>:<child>` set family
  * (metadataformats.py:59-295): arbitrary grouping via YAML identifier
  * lists. The top-level spec is the deduplicated union of its children
  * (metadataformats.py:287-295).
  *
  * Scale note: config-sized identifier lists compile to literal
  * `array_contains` probes (codegen, no shuffle). If a deployment's lists
  * grow beyond broadcast size, [[memberFilterDf]] gives the semi-join path
  * (`studies ⋉ set_members`) instead — same semantics, shuffle on the
  * membership key only.
  */
final case class ConfigurableSet(
    spec: String,
    name: String,
    description: Option[String],
    nodes: Seq[ConfigurableNode]) extends SetFamily {

  val prefix: String = spec
  val fields = Seq("_aggregator_identifier")

  /** Union of children, deduplicated — the top-level membership list. */
  lazy val allIdentifiers: Seq[String] = nodes.flatMap(_.identifiers).distinct

  def enumerate(df: DataFrame): Seq[SetInfo] =
    SetInfo(spec, name, description) +:
      nodes.map(n => SetInfo(s"$spec:${n.spec}", n.name, n.description))

  def labels: Column = {
    val id = col("_aggregator_identifier")
    val childLabels = nodes.map { n =>
      when(id.isin(n.identifiers: _*), lit(s"$spec:${n.spec}"))
    }
    val top = when(id.isin(allIdentifiers: _*), lit(spec))
    filter(array(top +: childLabels: _*), x => x.isNotNull)
  }

  def filterFor(value: Option[String]): Filter = value match {
    case Some(child) =>
      In("_aggregator_identifier",
        nodes.filter(_.spec == child).flatMap(_.identifiers).distinct)
    case None =>
      In("_aggregator_identifier", allIdentifiers)
  }

  /** Membership as a (spec, identifier) DataFrame for the semi-join path
    * when identifier lists exceed literal/broadcast comfort.
    */
  def memberFilterDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    nodes.flatMap(n => n.identifiers.map(i => (s"$spec:${n.spec}", i)))
      .toDF("set_spec", "identifier")
  }
}

object ConfigurableSet {

  /** Parse + validate the configurable-sets YAML. Reproduces the
    * reference's startup validation matrix
    * (tests/test_metadataformats.py:136-239): missing/empty/mistyped
    * spec, name, nodes, identifiers all raise.
    *
    * The reference re-reads this file on every use
    * (metadataformats.py:64-66,213-232) so membership may change between
    * pages; we deviate deliberately — parse once per session snapshot —
    * and note it (SURVEY.md §7.4 risk 3): a snapshot per resumption token
    * is the only consistent choice for a distributed engine.
    */
  def fromYaml(yaml: String): ConfigurableSet = {
    val root = SetYaml.parseMap(yaml, "configurable set")
    val spec = SetYaml.reqString(root, "spec", "configurable set")
    val name = SetYaml.reqString(root, "name", "configurable set")
    val nodesRaw = root.getOrElse("nodes",
      throw SetConfigError("configurable set: missing 'nodes'"))
    val nodeMaps = SetYaml.asListOfMaps(nodesRaw, "configurable set 'nodes'")
    if (nodeMaps.isEmpty) throw SetConfigError("configurable set: empty 'nodes'")
    val nodes = nodeMaps.map { m =>
      val ids = m.getOrElse("identifiers",
        throw SetConfigError("configurable set node: missing 'identifiers'"))
      ConfigurableNode(
        spec = SetYaml.reqString(m, "spec", "configurable set node"),
        name = SetYaml.reqString(m, "name", "configurable set node"),
        identifiers = SetYaml.asStringList(ids, "configurable set node 'identifiers'"),
        description = m.get("description").map(_.toString))
    }
    ConfigurableSet(spec, name, root.get("description").map(_.toString), nodes)
  }

  def fromFile(path: String): ConfigurableSet =
    fromYaml(SetYaml.read(path))
}
