package graft.sets

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Startup-time config error — syntax-validated at configure, exactly as
  * the reference fails fast on malformed set YAML
  * (tests/test_metadataformats.py:136-239).
  */
final case class SetConfigError(msg: String) extends RuntimeException(msg)

/** Thin, validating YAML access layer over snakeyaml (ships with Spark).
  * Driver-side only: YAML configs are tiny and become literal expressions /
  * broadcast structures — they never touch executors as files.
  */
object SetYaml {

  def read(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  private def load(yaml: String, what: String): Any =
    try new Yaml().load[Any](yaml)
    catch {
      case e: Exception =>
        throw SetConfigError(s"$what: invalid YAML syntax: ${e.getMessage}")
    }

  def parseMap(yaml: String, what: String): Map[String, Any] =
    load(yaml, what) match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, v) => k.toString -> v }.toMap
      case other =>
        throw SetConfigError(s"$what: expected a mapping, got $other")
    }

  def parseListOfMaps(yaml: String, what: String): Seq[Map[String, Any]] =
    asListOfMaps(load(yaml, what), what)

  def asListOfMaps(v: Any, what: String): Seq[Map[String, Any]] = v match {
    case l: java.util.List[_] =>
      l.asScala.toSeq.map {
        case m: java.util.Map[_, _] =>
          m.asScala.map { case (k, vv) => k.toString -> vv }.toMap
        case other =>
          throw SetConfigError(s"$what: expected a mapping element, got $other")
      }
    // reference accepts single-or-list nodes (metadataformats.py:213-232)
    case m: java.util.Map[_, _] =>
      Seq(m.asScala.map { case (k, vv) => k.toString -> vv }.toMap)
    case other =>
      throw SetConfigError(s"$what: expected a list, got $other")
  }

  def asStringList(v: Any, what: String): Seq[String] = v match {
    case l: java.util.List[_] =>
      val out = l.asScala.toSeq.map {
        case null  => throw SetConfigError(s"$what: null identifier")
        case s     => s.toString
      }
      if (out.isEmpty) throw SetConfigError(s"$what: empty list") else out
    case s: String => Seq(s) // single-or-list
    case other => throw SetConfigError(s"$what: expected a list, got $other")
  }

  def reqString(m: Map[String, Any], key: String, what: String): String =
    m.get(key) match {
      case Some(s: String) if s.nonEmpty => s
      case Some(null) | None => throw SetConfigError(s"$what: missing '$key'")
      case Some("")          => throw SetConfigError(s"$what: empty '$key'")
      case Some(other) =>
        throw SetConfigError(s"$what: '$key' must be a string, got $other")
    }
}
