package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * score every raw document by how target-like its hashed n-gram
  * feature distribution is — the log-likelihood ratio between a
  * target-corpus unigram bucket model and a raw-corpus one — then keep
  * the top slice. The production recipe for "select the 5% of the
  * crawl that looks like Wikipedia" at 100 TB.
  *
  * Portability contract (same discipline as [[PortableSketches]]):
  * features are md5 buckets — b(token) = h28(lower(token)) mod B — so
  * an oracle rebuilds the identical models; every log input is an
  * exact integer count (add-1 smoothed bucket counts, corpus totals),
  * so the 6-dp-rounded per-doc mean is engine-stable (float ordering
  * noise ~1e-14, eight orders below the rounding step — the
  * `text_unigram_logprob` precedent).
  *
  * Scale shape: the two bucket models are B-row frames (B = 1024)
  * joined BROADCAST onto the per-doc term frequencies; the only wide
  * shuffle is the (doc, bucket) tf aggregate, which map-side combines.
  * Selection is a global TakeOrdered (top-k, never a full sort).
  */
object Dsir {

  /** (bucket, cnt): token-occurrence counts per md5 bucket. Every
    * bucket in [0, B) is present (zero rows filled) so the add-1
    * smoothed model is total.
    */
  def bucketCounts(
      df: DataFrame, textCol: String, buckets: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = buckets
    val counted = df.select(col(textCol))
      .as[String]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { text =>
          text.toLowerCase.trim.split("\\s+").iterator
            .map(t => (PortableSketches.hash28(md, t) % b, 1L))
        }
      }
      .toDF("bucket", "one")
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    spark.range(0, b).select(col("id").as("bucket"))
      .join(counted, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** (id, n_tokens, avg_llr): per-document mean log-likelihood ratio
    * under the add-1 smoothed target vs raw bucket unigram models,
    * rounded to 6 dp. Positive = more target-like than raw-average.
    *
    * avg_llr = (1/n) Σ_tokens [ ln(ct_t[b]+1) − ln(T_t+B)
    *                          − ln(ct_r[b]+1) + ln(T_r+B) ]
    */
  def importanceWeights(
      raw: DataFrame, target: DataFrame, textCol: String, idCol: String,
      buckets: Int = 1024): DataFrame = {
    Dedup.requireLongCastableId(raw, idCol)
    val spark = raw.sparkSession
    import spark.implicits._
    val b = buckets
    val tCounts = bucketCounts(target, textCol, b)
      .select(col("bucket"), col("cnt").as("ct_t"))
    val rCounts = bucketCounts(raw, textCol, b)
      .select(col("bucket"), col("cnt").as("ct_r"))
    // B-row model with the per-bucket llr; totals fold in as constants
    // via 1-row broadcast glue.
    val tTot = tCounts.agg(sum(col("ct_t")).as("t_t"))
    val rTot = rCounts.agg(sum(col("ct_r")).as("t_r"))
    val model = broadcast(
      tCounts.join(rCounts, Seq("bucket"))
        .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
        .select(col("bucket"),
          (log(col("ct_t") + 1) - log(col("t_t") + b)
            - log(col("ct_r") + 1) + log(col("t_r") + b)).as("llr")))
    val tf = raw.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          text.toLowerCase.trim.split("\\s+").iterator
            .map(t => (id, PortableSketches.hash28(md, t) % b))
        }
      }
      .toDF("id", "bucket")
      .groupBy("id", "bucket").agg(count(lit(1)).as("tf"))
    tf.join(model, Seq("bucket"))
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_tokens"),
        (sum(col("tf") * col("llr")) / sum(col("tf"))).as("raw_llr"))
      .select(col("id").as(idCol), col("n_tokens"),
        Numerics.roundz(col("raw_llr"), 6).as("avg_llr"))
  }

  /** Top-k most target-like documents (avg_llr desc, id asc tiebreak) —
    * a TakeOrdered, never a global sort.
    */
  def selectTopK(weights: DataFrame, idCol: String, k: Int): DataFrame =
    weights.orderBy(col("avg_llr").desc, col(idCol)).limit(k)
}
