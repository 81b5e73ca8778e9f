package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Oracle-checked analogues of the set-system (S1-S5) and scalar-transform
  * (T1-T16) operators from SURVEY.md §2.2/§2.3, expressed over the driver
  * testdata so the DuckDB gate covers every inventory row. The Study-shaped
  * originals (real array-of-struct fields, YAML configs, XML rendering)
  * live in graft.sets / graft.formats and are covered by ScalaTest specs;
  * these queries pin the same Spark PRIMITIVES under the hash-compare.
  */
object ParityQueries extends QueryGroup {

  /** S1: set enumeration with generated names (Language <lang>). */
  val s1Enumeration: QueryDef = QueryDef(
    "s1_language_enumeration",
    (s, dir) =>
      Tables(s, dir).documents
        .select(col("lang"))
        .distinct()
        .select(col("lang"), concat(lit("Language "), col("lang")).as("set_name"))
        .orderBy("lang"),
    Some(
      "SELECT lang, 'Language ' || lang AS set_name FROM " +
        "(SELECT DISTINCT lang FROM documents) ORDER BY lang"))

  /** S2: validity-set membership ($in on an attribute domain). */
  val s2Membership: QueryDef = QueryDef(
    "s2_validity_membership",
    (s, dir) =>
      Tables(s, dir).documents
        .filter(col("lang").isin("en", "de"))
        .select("doc_id", "lang")
        .orderBy("doc_id"),
    Some(
      "SELECT doc_id, lang FROM documents WHERE lang IN ('en', 'de') " +
        "ORDER BY doc_id"))

  /** S3: config-mapping join — a tiny broadcast dim (url → source name)
    * labels each record, exactly the sources-YAML shape.
    */
  val s3SourceMapping: QueryDef = QueryDef(
    "s3_source_mapping",
    (s, dir) => {
      import s.implicits._
      val dim = Seq(
        ("src0", "Archive Zero"), ("src1", "Archive One"),
        ("src2", "Archive Two")).toDF("src", "archive_name")
      Tables(s, dir).documents
        .join(broadcast(dim), col("source") === col("src"))
        .select(col("doc_id"), col("archive_name"))
        .orderBy("doc_id")
    },
    Some(
      "SELECT doc_id, archive_name FROM documents " +
        "JOIN (VALUES ('src0', 'Archive Zero'), ('src1', 'Archive One'), " +
        "('src2', 'Archive Two')) AS dim(src, archive_name) " +
        "ON source = src ORDER BY doc_id"))

  /** S4: explicit-identifier-list membership (configurable set). */
  val s4Configurable: QueryDef = QueryDef(
    "s4_configurable_membership",
    (s, dir) =>
      Tables(s, dir).documents
        .filter(col("doc_id").isin(1L, 3L, 5L, 8L, 13L, 21L, 34L))
        .select("doc_id")
        .orderBy("doc_id"),
    Some(
      "SELECT doc_id FROM documents WHERE doc_id IN (1, 3, 5, 8, 13, 21, 34) " +
        "ORDER BY doc_id"))

  /** S5: per-record set-label array, serialized for comparison. */
  val s5Labels: QueryDef = QueryDef(
    "s5_record_set_labels",
    (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          concat_ws(",",
            concat(lit("language:"), col("lang")),
            concat(lit("source:"), col("source"))).as("set_specs"))
        .orderBy("doc_id"),
    Some(
      "SELECT doc_id, 'language:' || lang || ',' || 'source:' || source " +
        "AS set_specs FROM documents ORDER BY doc_id"))

  /** T1/T4: distinct values of a derived array (sorted for stability). */
  val t1Distinct: QueryDef = QueryDef(
    "t1_distinct_array_values",
    (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          array_join(array_sort(array_distinct(split(col("text"), " "))), ",")
            .as("distinct_words"))
        .orderBy("doc_id"),
    Some(
      "SELECT doc_id, array_to_string(list_sort(list_distinct(" +
        "string_split(text, ' '))), ',') AS distinct_words " +
        "FROM documents ORDER BY doc_id"))

  /** T2: distinct union of two arrays. */
  val t2Union: QueryDef = QueryDef(
    "t2_distinct_union",
    (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          array_join(
            array_sort(array_distinct(
              concat(split(col("text"), " "), array(col("lang"), col("source"))))),
            ",").as("merged"))
        .orderBy("doc_id"),
    Some(
      "SELECT doc_id, array_to_string(list_sort(list_distinct(" +
        "list_concat(string_split(text, ' '), [lang, source]))), ',') AS merged " +
        "FROM documents ORDER BY doc_id"))

  /** T3/T5: coalesce chain over a sparse attribute (JSON prop fallback). */
  val t3Coalesce: QueryDef = QueryDef(
    "t3_coalesce_chain",
    (s, dir) =>
      Tables(s, dir).events
        .select(col("event_id"),
          coalesce(get_json_object(col("props"), "$.missing"), col("event_type"))
            .as("resolved"))
        .orderBy("event_id"),
    Some(
      "SELECT event_id, coalesce(json_extract_string(props, '$.missing'), " +
        "event_type) AS resolved FROM events ORDER BY event_id"))

  /** T8: year extraction by string truncation of a date. */
  val t8Year: QueryDef = QueryDef(
    "t8_year_truncation",
    (s, dir) =>
      Tables(s, dir).orders
        .select(col("o_orderkey"),
          substring(col("o_orderdate").cast("string"), 1, 4).as("order_year"))
        .orderBy("o_orderkey"),
    Some(
      "SELECT o_orderkey, substring(CAST(o_orderdate AS VARCHAR), 1, 4) " +
        "AS order_year FROM orders ORDER BY o_orderkey"))

  /** T9: priority selection — first preferred-category value, else first
    * overall (the publisher-priority coalesce shape as a grouped agg).
    */
  val t9Priority: QueryDef = QueryDef(
    "t9_priority_selection",
    (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy(col("l_orderkey"))
        .agg(coalesce(
          min(when(col("l_returnflag") === "R", col("l_partkey"))),
          min(col("l_partkey"))).as("selected_part"))
        .orderBy("l_orderkey"),
    Some(
      "SELECT l_orderkey, coalesce(min(CASE WHEN l_returnflag = 'R' " +
        "THEN l_partkey END), min(l_partkey)) AS selected_part " +
        "FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"))

  /** T10: filter + dedup of pair projections. */
  val t10FilterDedup: QueryDef = QueryDef(
    "t10_filter_dedup_pairs",
    (s, dir) =>
      Tables(s, dir).lineitem
        .filter(col("l_quantity") > 45)
        .select("l_partkey", "l_suppkey")
        .distinct()
        .orderBy("l_partkey", "l_suppkey"),
    Some(
      "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem " +
        "WHERE l_quantity > 45 ORDER BY l_partkey, l_suppkey"))

  /** T11: pattern-prefix extraction (the grantAgreement rlike shape). */
  val t11Pattern: QueryDef = QueryDef(
    "t11_pattern_match",
    (s, dir) =>
      Tables(s, dir).documents
        .filter(col("text").rlike("\\bspark\\b"))
        .select("doc_id")
        .orderBy("doc_id"),
    Some(
      """SELECT doc_id FROM documents WHERE regexp_matches(text, '\bspark\b') """ +
        "ORDER BY doc_id"))

  /** T13/T15: conditional projection + bool→string rendering. */
  val t13Conditional: QueryDef = QueryDef(
    "t13_conditional_projection",
    (s, dir) =>
      Tables(s, dir).events
        .select(col("event_id"),
          when(col("event_type") === "error", lit(null).cast("double"))
            .otherwise(col("value")).as("visible_value"),
          when(col("event_type") === "error", "true").otherwise("false")
            .as("suppressed"))
        .orderBy("event_id"),
    Some(
      "SELECT event_id, CASE WHEN event_type = 'error' THEN NULL ELSE value " +
        "END AS visible_value, CASE WHEN event_type = 'error' THEN 'true' " +
        "ELSE 'false' END AS suppressed FROM events ORDER BY event_id"))

  def defs: Seq[QueryDef] = Seq(
    s1Enumeration, s2Membership, s3SourceMapping, s4Configurable, s5Labels,
    t1Distinct, t2Union, t3Coalesce, t8Year, t9Priority, t10FilterDedup,
    t11Pattern, t13Conditional)
}
