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

/** The reference's RE-READ-PER-USE semantics as an opt-in wrapper
  * (metadataformats.py:64-66,213-232: the configurable YAML is loaded
  * on EVERY request, so a membership edit lands mid-list — page N+1 of
  * one harvest can see different sets than page N). Every SetFamily
  * call here re-parses the file from disk (KB-scale driver-side work),
  * reproducing that behaviour bug-for-bug for deployments that need
  * parity; the default [[ConfigurableSet]] snapshot-per-resolution
  * stays the recommended policy for a distributed engine
  * (SURVEY §7.4 risk 3 — a consistent view per resumption token).
  * Startup validation parity: construction eagerly loads once, so a
  * malformed file still fails at boot exactly like the reference's
  * syntax check; a file that turns invalid LATER surfaces as
  * [[SetConfigError]] on the request that first re-reads it (also the
  * reference's behaviour — it re-validates on every load).
  */
final case class ReloadingConfigurableSet(path: String) extends SetFamily {
  // boot-time validation (and the prefix can never change: the spec is
  // the dispatch key a repository binds at configuration time — the
  // reference keys its set registry the same way)
  private val boot = ConfigurableSet.fromFile(path)
  private def load(): ConfigurableSet = {
    val cur = ConfigurableSet.fromFile(path)
    require(cur.spec == boot.spec,
      s"configurable set '$path': spec changed from '${boot.spec}' to " +
        s"'${cur.spec}' — the setSpec prefix is the dispatch key and " +
        "cannot be edited live; restart the repository")
    cur
  }
  val prefix: String = boot.spec
  val fields: Seq[String] = boot.fields
  def enumerate(df: DataFrame): Seq[SetInfo] = load().enumerate(df)
  def labels: Column = load().labels
  def filterFor(value: Option[String]): Filter = load().filterFor(value)
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
  private def parseNode(m: Map[String, Any], what: String): ConfigurableNode = {
    val ids = m.getOrElse("identifiers",
      throw SetConfigError(s"$what: missing 'identifiers'"))
    ConfigurableNode(
      spec = SetYaml.reqString(m, "spec", what),
      name = SetYaml.reqString(m, "name", what),
      identifiers = SetYaml.asStringList(ids, s"$what 'identifiers'"),
      description = m.get("description").map(_.toString))
  }

  /** A `- path: '/abs/ext.yaml'` node resolves to one-or-many external
    * node definitions (metadataformats.py:114-127,180-190: the external
    * file may be a single mapping or a list of mappings; each is
    * validated exactly like an inline node, with errors attributed to
    * the external file).
    */
  private def resolvePathNode(path: String): Seq[ConfigurableNode] = {
    val what = s"external set file '$path'"
    val text =
      try SetYaml.read(path)
      catch {
        case e: java.io.IOException =>
          throw SetConfigError(s"$what: cannot read: ${e.getMessage}")
      }
    val maps = SetYaml.parseListOfMaps(text, what)
    if (maps.isEmpty) throw SetConfigError(s"$what: empty node list")
    maps.map(parseNode(_, what))
  }

  def fromYaml(yaml: String): ConfigurableSet = {
    val root = SetYaml.parseMap(yaml, "configurable set")
    val spec = SetYaml.reqString(root, "spec", "configurable set")
    val name = SetYaml.reqString(root, "name", "configurable set")
    val nodesRaw = root.getOrElse("nodes",
      throw SetConfigError("configurable set: missing 'nodes'"))
    val nodeMaps = SetYaml.asListOfMaps(nodesRaw, "configurable set 'nodes'")
    if (nodeMaps.isEmpty) throw SetConfigError("configurable set: empty 'nodes'")
    val nodes = nodeMaps.flatMap { m =>
      m.get("path") match {
        case Some(p: String) if p.nonEmpty => resolvePathNode(p)
        case Some(other) =>
          throw SetConfigError(
            s"configurable set node: 'path' must be a non-empty string, got $other")
        case None => Seq(parseNode(m, "configurable set node"))
      }
    }
    ConfigurableSet(spec, name, root.get("description").map(_.toString), nodes)
  }

  def fromFile(path: String): ConfigurableSet =
    fromYaml(SetYaml.read(path))
}
