package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: a hashed bag-of-words LINEAR
  * classifier run as inference over the corpus — the fastText-style
  * quality model every production crawl pipeline (CCNet, GPT-3's
  * WebText-vs-crawl filter, FineWeb-Edu) applies after the rule-based
  * [[TextAnalysis.gopherRules]] pass. Features are the hashing trick
  * (Weinberger et al. 2009): token → bucket via a hash, weights live in
  * a dense `buckets`-sized array, so inference is embarrassingly
  * parallel, the model broadcasts in KBs regardless of vocabulary, and
  * no vocabulary shuffle ever happens — the scan-local shape that holds
  * at 100 TB.
  *
  * Two weight paths:
  *  - [[scoreHashedLinear]]: production inference — caller-supplied
  *    double weights (a trained model), scan-local kernel, no shuffle.
  *  - [[portableLogitMilli]]: the md5-CONTRACT twin (same discipline as
  *    [[PortableSketches]]): bucket = h28(token) mod B, integer
  *    milli-weight w_b = h28("w"+b) mod 2001 − 1000, bias likewise —
  *    every number derivable from the contract alone, the whole
  *    inference restatable in SQL, per-doc logits EXACT long sums (no
  *    float ordering anywhere).
  *
  * Reference scope: the reference engine has no model-based scoring
  * (SURVEY.md §2) — extension surface for the training-data pipeline.
  */
object QualityClassifier {

  /** Deterministic md5-derived milli-weight table: w_b in [-1000, 1000]
    * for b in [0, buckets), plus the "bias" entry — ~8 KB at the
    * default 1024 buckets, rebuilt from the contract anywhere.
    */
  def portableWeights(buckets: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(buckets)(b =>
      PortableSketches.hash28(md, "w" + b) % 2001L - 1000L)
  }

  def portableBias: Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    PortableSketches.hash28(md, "bias") % 2001L - 1000L
  }

  /** (id, n_feat, logit_milli, label): md5-contract inference over the
    * DISTINCT lowercased whitespace tokens (binary features — presence,
    * not tf, the fastText default for short docs). One scan-local
    * kernel: per doc, hash each distinct token to its bucket, sum the
    * integer milli-weights, add bias; label = logit > 0. Exact long
    * arithmetic end to end.
    */
  def portableLogitMilli(
      df: DataFrame, textCol: String, idCol: String,
      buckets: Int = 1024): DataFrame = {
    Dedup.requireLongCastableId(df, idCol)
    val spark = df.sparkSession
    import spark.implicits._
    val w = portableWeights(buckets)
    val bias = portableBias
    val b = buckets
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val tokens = text.toLowerCase.trim.split("\\s+").distinct
          var s = bias
          var i = 0
          while (i < tokens.length) {
            s += w((PortableSketches.hash28(md, tokens(i)) % b).toInt)
            i += 1
          }
          (id, tokens.length.toLong, s, s > 0L)
        }
      }
      .toDF(idCol, "n_feat", "logit_milli", "label")
  }

  /** Production inference: caller-supplied double weights (index =
    * bucket) + bias over murmur-hashed distinct tokens. Same scan-local
    * kernel shape; the model array ships once per executor via the
    * task closure (KBs — below broadcast-worthy size).
    */
  def scoreHashedLinear(
      df: DataFrame, textCol: String, idCol: String,
      weights: Array[Double], bias: Double): DataFrame = {
    Dedup.requireLongCastableId(df, idCol)
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights
    val b = weights.length
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val tokens = text.toLowerCase.trim.split("\\s+").distinct
          var s = bias
          var i = 0
          while (i < tokens.length) {
            val h = Dedup.hash64(tokens(i))
            s += w(((h % b + b) % b).toInt)
            i += 1
          }
          (id, s, 1.0 / (1.0 + math.exp(-s)))
        }
      }
      .toDF(idCol, "logit", "score")
  }
}
