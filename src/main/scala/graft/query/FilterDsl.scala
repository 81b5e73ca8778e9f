package graft.query

import java.sql.Timestamp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed filter AST with the exact semantics of the reference's DocStore
  * query DSL (SURVEY.md §2.1; observed wire payloads at
  * tests/test_serve.py:1324-1377: `$in`, `$ne`, `$lt`, `$gte`, `$and`,
  * `$elemMatch`, `$exists`, `$isodate`), compiled to a single Catalyst
  * `Column` so the whole conjunction lands in ONE `Filter` node that
  * Catalyst can push to the parquet scan.
  *
  * This is the engine's "QueryController": verbs build a [[Filter]], never
  * a raw Column, so the translation is unit-testable against the
  * reference's recorded payloads via [[Filter.toMongo]].
  */
sealed trait Filter {

  /** Compile to a Catalyst predicate. */
  def toColumn: Column = this match {
    case Eq(f, v)  => col(f) === lit(v)
    case Ne(f, v)  => col(f) =!= lit(v) // null-rejecting, like Mongo $ne on a present field
    case Lt(f, v)  => col(f) < lit(v)
    case Lte(f, v) => col(f) <= lit(v)
    case Gt(f, v)  => col(f) > lit(v)
    case Gte(f, v) => col(f) >= lit(v)
    case In(f, vs) => col(f).isin(vs.map(lit): _*)
    case FieldExists(f, true)  => col(f).isNotNull
    case FieldExists(f, false) => col(f).isNull
    case And(fs @ _*) => fs.map(_.toColumn).reduceLeft(_ && _)
    case ElemMatch(f, preds @ _*) =>
      exists(col(f), e => preds.map(_.toColumn(e)).reduceLeft(_ && _))
    case True => lit(true)
  }

  /** Render the Mongo-style JSON the reference sends over the wire —
    * the parity oracle for tests (tests/test_serve.py:1341-1377).
    */
  def toMongo: String = {
    def j(v: Any): String = v match {
      case s: String    => "\"" + s + "\""
      case t: Timestamp => s"""{"$$isodate": "${t.toInstant}"}"""
      case b: Boolean   => b.toString
      case n            => n.toString
    }
    this match {
      case Eq(f, v)  => s"""{"$f": ${j(v)}}"""
      case Ne(f, v)  => s"""{"$f": {"$$ne": ${j(v)}}}"""
      case Lt(f, v)  => s"""{"$f": {"$$lt": ${j(v)}}}"""
      case Lte(f, v) => s"""{"$f": {"$$lte": ${j(v)}}}"""
      case Gt(f, v)  => s"""{"$f": {"$$gt": ${j(v)}}}"""
      case Gte(f, v) => s"""{"$f": {"$$gte": ${j(v)}}}"""
      case In(f, vs) => s"""{"$f": {"$$in": [${vs.map(j).mkString(", ")}]}}"""
      case FieldExists(f, b) => s"""{"$f": {"$$exists": $b}}"""
      case And(fs @ _*) =>
        s"""{"$$and": [${fs.map(_.toMongo).mkString(", ")}]}"""
      case ElemMatch(f, ps @ _*) =>
        val inner = ps.map(_.toMongoFragment).mkString(", ")
        s"""{"$f": {"$$elemMatch": {$inner}}}"""
      case True => "{}"
    }
  }
}

final case class Eq(field: String, value: Any) extends Filter
final case class Ne(field: String, value: Any) extends Filter
final case class Lt(field: String, value: Any) extends Filter
final case class Lte(field: String, value: Any) extends Filter
final case class Gt(field: String, value: Any) extends Filter
final case class Gte(field: String, value: Any) extends Filter
final case class In(field: String, values: Seq[Any]) extends Filter
final case class FieldExists(field: String, exists: Boolean) extends Filter
final case class And(filters: Filter*) extends Filter
case object True extends Filter

/** `$elemMatch` on an array-of-struct field: ALL inner predicates must hold
  * on the SAME element (metadataformats.py:416-430). Compiles to the
  * higher-order `exists` function — runs inside whole-stage codegen, no
  * explode, no shuffle.
  */
final case class ElemMatch(field: String, preds: ElemPred*) extends Filter

/** Predicate on one field of an array element. */
sealed trait ElemPred {
  def toColumn(e: Column): Column = this match {
    case ElemEq(f, v)         => e.getField(f) === lit(v)
    case ElemIn(f, vs)        => e.getField(f).isin(vs.map(lit): _*)
    case ElemExists(f, true)  => e.getField(f).isNotNull
    case ElemExists(f, false) => e.getField(f).isNull
  }
  def toMongoFragment: String = this match {
    case ElemEq(f, v: String)  => s""""$f": "$v""""
    case ElemEq(f, v)          => s""""$f": $v"""
    case ElemIn(f, vs) =>
      s""""$f": {"$$in": [${vs.map(v => "\"" + v + "\"").mkString(", ")}]}"""
    case ElemExists(f, b)      => s""""$f": {"$$exists": $b}"""
  }
}
final case class ElemEq(field: String, value: Any) extends ElemPred
final case class ElemIn(field: String, values: Seq[String]) extends ElemPred
final case class ElemExists(field: String, exists: Boolean) extends ElemPred

object FilterDsl {
  import graft.schema.RecordStatus

  /** Not-soft-deleted (metrics.py:172-176). */
  val notDeleted: Filter = Ne("_metadata.status", RecordStatus.Deleted)

  /** GetRecord's point filter (metadataformats.py:477-478). */
  def byIdentifier(id: String): Filter = Eq("_aggregator_identifier", id)

  /** Selective-harvest datestamp window (tests/test_serve.py:1342): always
    * bounded above by "now", optionally by OAI from/until.
    */
  def harvestWindow(
      now: Timestamp,
      from: Option[Timestamp] = None,
      until: Option[Timestamp] = None): Filter = {
    val bounds = Seq(Lt("_metadata.updated", now)) ++
      from.map(Gte("_metadata.updated", _)) ++
      until.map(Lte("_metadata.updated", _))
    if (bounds.size == 1) bounds.head else And(bounds: _*)
  }
}
