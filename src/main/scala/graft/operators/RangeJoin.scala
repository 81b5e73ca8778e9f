package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range join — "for each left row, the right rows within a trailing
  * window [left.ts − w, left.ts)". A naive inequality join forces Spark
  * into a broadcast-nested-loop (O(|L|·|R|)); bucketizing both sides to
  * w-second buckets turns it into an EQUI-join on the bucket id:
  *
  *  - left rows keep their bucket ⌊ts/w⌋;
  *  - right rows are replicated to buckets b and b+1 (a right event can
  *    only precede-within-w a left event in its own or the next bucket);
  *  - the exact range predicate filters inside the hash join.
  *
  * One shuffle on the bucket id, output-linear work — the standard
  * interval-join shape (same as Flink's interval join / the bucketed
  * range joins in warehouse engines).
  */
object RangeJoin {

  /** Count of right events in [left.ts − windowSeconds, left.ts) per left
    * row. Left rows with no matches are kept with count 0.
    */
  def trailingCount(
      left: DataFrame, right: DataFrame,
      leftIdCol: String, tsCol: String,
      windowSeconds: Int): DataFrame = {

    val lb = left.select(
      col(leftIdCol).as("_lid"), col(tsCol).as("_lts"),
      floor(unix_timestamp(col(tsCol)) / windowSeconds).as("_bucket"))
    val rb = right.select(col(tsCol).as("_rts"),
        floor(unix_timestamp(col(tsCol)) / windowSeconds).as("_rb"))
      .select(col("_rts"),
        explode(array(col("_rb"), col("_rb") + 1)).as("_bucket"))

    lb.join(rb,
        lb("_bucket") === rb("_bucket") &&
          col("_rts") >= col("_lts") - expr(s"INTERVAL $windowSeconds seconds") &&
          col("_rts") < col("_lts"),
        "left_outer")
      .groupBy(col("_lid").as(leftIdCol))
      .agg(count(col("_rts")).as("n_preceding"))
  }
}
