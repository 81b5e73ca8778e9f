package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a document corpus against a small query
  * term set — the classic lexical-retrieval ranking function (Robertson
  * et al., Okapi BM25), the batch-side scorer a training-data pipeline
  * uses for query-targeted corpus selection.
  *
  * Plan shape for 100 TB: the per-document term frequencies and length
  * are SCAN-LOCAL column expressions (no explode of the token stream,
  * no shuffle carrying tokens); the only exchange is one single-row
  * global aggregate (N, avgdl, per-term document frequencies) that
  * joins back by broadcast. Two passes over the corpus, zero wide
  * shuffles — versus the naive explode→join-on-term plan whose token
  * explode is corpus × tokens rows through a shuffle.
  *
  * IDF is the BM25+ form ln(1 + (N − df + ½)/(df + ½)) — always
  * positive, so a term in >half the corpus cannot produce negative
  * contributions.
  */
object Bm25 {

  /** (id, bm25) for every document containing ≥1 query term. */
  def score(
      docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "at least one query term required")
    require(terms.toSet.size == terms.size, s"duplicate query terms: $terms")
    val toks = split(lower(trim(col(textCol))), "\\s+")
    def tfCol(i: Int): String = s"_tf$i"
    // one row per doc: id, dl, tf per term — all scan-local
    val perDoc = docs.select(
      Seq(col(idCol), size(toks).as("_dl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).as(tfCol(i))
        }: _*)
    // single-row corpus stats: N, avgdl, df per term
    val statCols =
      Seq(count(lit(1)).as("_n"), avg(col("_dl")).as("_avgdl")) ++
        terms.indices.map(i =>
          sum(when(col(tfCol(i)) > 0, 1L).otherwise(0L)).as(s"_df$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val contribs: Seq[Column] = terms.indices.map { i =>
      val tf = col(tfCol(i)).cast("double")
      val df = col(s"_df$i").cast("double")
      val idf = log(lit(1.0) +
        (col("_n").cast("double") - df + lit(0.5)) / (df + lit(0.5)))
      when(col(tfCol(i)) > 0,
        idf * tf * lit(k1 + 1.0) /
          (tf + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("_dl").cast("double") / col("_avgdl"))))
        .otherwise(lit(0.0))
    }
    perDoc
      .filter(terms.indices.map(i => col(tfCol(i)) > 0).reduce(_ || _))
      .crossJoin(broadcast(stats))
      .select(col(idCol), contribs.reduce(_ + _).as("bm25"))
  }
}
