package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark build function over the driver testdata
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * The driver's compare sorts columns by name before hashing values, so the
  * Spark result and the oracle SQL must agree on EVERY output column name
  * (alias both sides identically) and on value types (prefer exact types:
  * long counts, decimal-exact sums cast to double, strings).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** A group of related QueryDefs (one per SURVEY.md §2 operator). */
trait QueryGroup {
  def defs: Seq[QueryDef]
}
