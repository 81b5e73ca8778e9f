package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-blocked spatial self-join: all point pairs within a given
  * Euclidean distance, without the O(n²) cross join — the 2-D
  * analogue of the LSH-band / ER-block pattern used everywhere else
  * in this engine.
  *
  * Blocking: with cell size = maxDist, any qualifying pair lies in
  * the same or an adjacent cell, so the build side emits each point
  * once (home cell) and the probe side emits it 9× (the 3×3
  * neighborhood); one hash join on the cell key yields candidates
  * and the exact distance predicate verifies. Each unordered pair
  * surfaces exactly once — the probe<build id filter keeps the
  * (a probes b's cell) orientation and drops the mirror — so no
  * distinct pass is needed.
  *
  * Geometry is ALL-INTEGER (coordinates and squared distances are
  * longs), so candidate generation and verification are hash-exact
  * across engines — the gate proves grid blocking ≡ brute force
  * against an all-pairs oracle.
  *
  * Scale: candidates are Σ_cell |probe∩9 cells|·|build cell| — never
  * all-pairs; work is proportional to realized density. A pathological
  * hot cell (everything at one coordinate) is the quadratic-OUTPUT
  * regime, the same declared boundary as the dhash/ER families; the
  * banding caps there port directly if a corpus needs them.
  */
object Spatial {

  /** All pairs with (x_a−x_b)² + (y_a−y_b)² ≤ maxDist², as
    * (id_a, id_b, dist2) with id_a < id_b.
    */
  def gridNeighborPairs(
      points: DataFrame, idCol: String, xCol: String, yCol: String,
      maxDist: Long): DataFrame = {
    require(maxDist > 0, s"maxDist must be positive, got $maxDist")
    val p = points.select(col(idCol).cast("long").as("_id"),
      col(xCol).cast("long").as("_x"), col(yCol).cast("long").as("_y"))
    // exact integer floor division for the cell key: (v − pmod(v, d))
    // is the largest multiple of d ≤ v, so the `div` is exact at ANY
    // coordinate magnitude — `floor(v / d)` in doubles can misplace a
    // cell boundary beyond ~2^53 and (worst case) split a qualifying
    // pair into non-adjacent cells. (Both join sides share the same
    // expression, and the final dist² predicate is exact regardless.)
    def cell(c: String): org.apache.spark.sql.Column =
      expr(s"($c - pmod($c, ${maxDist}L)) div ${maxDist}L")
    val cx = cell("_x")
    val cy = cell("_y")
    val build = p.select(col("_id").as("_idb"), col("_x").as("_xb"),
      col("_y").as("_yb"), cx.as("_cx"), cy.as("_cy"))
    val offsets = Seq(-1L, 0L, 1L)
      .flatMap(dx => Seq(-1L, 0L, 1L).map(dy => struct(lit(dx), lit(dy))))
    val probe = p
      .withColumn("_o", explode(array(offsets: _*)))
      .select(col("_id").as("_ida"), col("_x").as("_xa"),
        col("_y").as("_ya"),
        (cx + col("_o.col1")).as("_cx"), (cy + col("_o.col2")).as("_cy"))
    val d2 = (col("_xa") - col("_xb")) * (col("_xa") - col("_xb")) +
      (col("_ya") - col("_yb")) * (col("_ya") - col("_yb"))
    probe.join(build, Seq("_cx", "_cy"))
      .filter(col("_ida") < col("_idb"))
      .select(col("_ida").as("id_a"), col("_idb").as("id_b"),
        d2.as("dist2"))
      .filter(col("dist2") <= maxDist * maxDist)
  }
}
