package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-substring deduplication at token-n-gram resolution —
  * the "ExactSubstr" pass of Lee et al. 2022 (*Deduplicating Training
  * Data Makes Language Models Better*), re-expressed as three
  * declarative stages instead of a suffix array: (1) every token
  * n-gram keyed by a PORTABLE md5 of its space-joined tokens, (2) a
  * corpus-wide frequency aggregate keeps grams occurring ≥ `minDf`
  * times, (3) per-document interval merge folds overlapping hits into
  * MAXIMAL repeated spans. A 60-token verbatim quote shared by two
  * documents surfaces as ONE span per document, not 53 8-gram rows.
  *
  * Scale shape: the only corpus-scale exchange carries (gram-md5,
  * doc, idx) — fixed-width keys, map-side-combined counts; the
  * interval merge is one per-document window over HIT rows (hits ≪
  * tokens on a mostly-unique corpus). No suffix array, no global
  * sort, no driver state. md5 keys are the repo's standard portable
  * contract (the 2⁻¹²⁸ collision rate is accepted corpus-wide);
  * an xxhash64 key halves shuffle width if portability is waived.
  *
  * Canonical occurrence: the (doc, idx)-minimum occurrence of each
  * gram — [[removeRepeated]] keeps it and strips every other covered
  * token, so exactly one copy of every duplicated region survives
  * corpus-wide, deterministically.
  */
object RepeatedSpans {

  private def toks(textCol: String): Column =
    filter(split(col(textCol), "\\s+"), t => t =!= "")

  /** (doc, idx, gram) for every token n-gram; docs shorter than n
    * contribute nothing. Scan-local JVM kernel: the former
    * `transform(sequence, i -> md5(concat_ws(slice(…))))` ran its
    * lambda INTERPRETED per gram (the ngramNovelty HOF tax with an
    * md5 inside), and the codegen `arrays_zip(slice…)` alternative is
    * WORSE at n = 8 (the zip serializes all 8 token strings into a
    * struct array per gram — a measured 2.1 → 3.1 s regression). The
    * kernel digests each gram's bytes straight out of the token array
    * (one MessageDigest reused per partition, zero intermediate
    * columns); tokenization and hex output match Spark's
    * `md5(concat_ws(" ", …))` byte for byte — including supplementary
    * characters, since `\s` is BMP-only (a surrogate pair never
    * splits) and tokens hash as whole UTF-8 byte runs; verified by
    * the gates' unchanged hashes and the spec's emoji digest
    * comparison.
    */
  private[graft] def grams(
      docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // a single-file corpus reads as ONE partition and would pin the
    // whole md5 sweep to one task (the mutualNearest lesson) — spread
    // an under-partitioned input; the gram consumers aggregate/window
    // afterwards, so row order is free
    val src = docs.select(col(idCol).cast("long"), col(textCol))
    val par = spark.sparkContext.defaultParallelism
    val spread =
      if (src.rdd.getNumPartitions < par) src.repartition(par) else src
    spread
      .as[(java.lang.Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val space = Array(' '.toByte)
        it.flatMap { case (doc, text) =>
          val ws =
            if (text == null) Array.empty[String]
            else text.split("\\s+").filter(_.nonEmpty)
          if (ws.length < n) Iterator.empty
          else {
            val bytes = ws.map(
              _.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            (0 to ws.length - n).iterator.map { i =>
              md.reset()
              var j = i
              while (j < i + n) {
                if (j > i) md.update(space)
                md.update(bytes(j))
                j += 1
              }
              val dig = md.digest()
              val sb = new java.lang.StringBuilder(32)
              var b = 0
              while (b < dig.length) {
                sb.append(Character.forDigit((dig(b) >> 4) & 0xf, 16))
                sb.append(Character.forDigit(dig(b) & 0xf, 16))
                b += 1
              }
              (doc, i, sb.toString)
            }
          }
        }
      }
      .toDF("doc", "idx", "gram")
  }

  /** Maximal repeated spans per document: token intervals
    * [start, end] (0-based, inclusive) covered by n-grams that occur
    * at least `minDf` times corpus-wide, overlapping/adjacent hits
    * merged; `n_hits` counts the constituent gram occurrences.
    */
  def spans(
      docs: DataFrame, textCol: String, idCol: String,
      n: Int = 8, minDf: Long = 2L): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    require(minDf >= 2L, s"minDf < 2 would flag every gram, got $minDf")
    val g = grams(docs, textCol, idCol, n)
    val dupGrams = g.groupBy(col("gram"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= minDf)
      .select(col("gram"))
    val hits = g.join(dupGrams, Seq("gram"))
      .select(col("doc"), col("idx"), (col("idx") + n - 1).as("_end"))
    val wPrev = Window.partitionBy(col("doc")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hits
      .withColumn("_pe", max(col("_end")).over(wPrev))
      // a hit starting past prevEnd+1 leaves an uncovered token gap —
      // that's a new span; touching or overlapping hits merge
      .withColumn("_new",
        when(col("_pe").isNull || col("idx") > col("_pe") + 1, 1L)
          .otherwise(0L))
      .withColumn("_grp", sum(col("_new")).over(wRun))
      .groupBy(col("doc"), col("_grp"))
      .agg(min(col("idx")).as("start"), max(col("_end")).as("end"),
        count(lit(1)).as("n_hits"))
      .select(col("doc").as(idCol), col("start").cast("long").as("start"),
        col("end").cast("long").as("end"), col("n_hits"))
  }

  /** The corpus with every NON-CANONICAL repeated region stripped:
    * for each duplicated gram, its (doc, idx)-minimum occurrence is
    * canonical and keeps its tokens; every token covered only by
    * non-canonical occurrences is removed. Output: (id, cleaned
    * single-space text, tokens kept, tokens removed).
    */
  def removeRepeated(
      docs: DataFrame, textCol: String, idCol: String,
      n: Int = 8, minDf: Long = 2L): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    val g = grams(docs, textCol, idCol, n)
    val freq = g.groupBy(col("gram"))
      .agg(count(lit(1)).as("_df"),
        min(struct(col("doc"), col("idx"))).as("_canon"))
      .filter(col("_df") >= minDf)
    // tokens covered by a non-canonical occurrence of a repeated gram
    val removedIdx = g.join(freq, Seq("gram"))
      .filter(!(col("doc") === col("_canon.doc") &&
        col("idx") === col("_canon.idx")))
      .select(col("doc"),
        explode(sequence(col("idx"), col("idx") + n - 1)).as("tok_idx"))
      .distinct()
    val tokens = docs
      .select(col(idCol).cast("long").as("doc"), toks(textCol).as("_ws"))
      .select(col("doc"),
        posexplode(col("_ws")).as(Seq("tok_idx", "tok")))
    tokens.join(removedIdx, Seq("doc", "tok_idx"), "left_anti")
      .groupBy(col("doc"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("tok_idx"), col("tok")))),
          s => s.getField("tok"))).as("cleaned"),
        count(lit(1)).as("n_kept"))
      .join(
        tokens.groupBy(col("doc")).agg(count(lit(1)).as("_n")),
        Seq("doc"), "right")
      .select(col("doc").as(idCol),
        coalesce(col("cleaned"), lit("")).as("cleaned"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("_n") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }
}
