package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA (top principal component) for embedding columns —
  * the whitening/compression step before ANN indexing or semantic
  * dedup, built the way PCA actually scales: the corpus never moves,
  * only the dim×dim Gram matrix does.
  *
  *  1. Quantize the first `dims` components to integers
  *     (round(x·quantScale) — a FIXED absolute scale, so every product
  *     and sum below is exact integer arithmetic with no
  *     partition-order float drift).
  *  2. ONE aggregate pass computes the upper-triangle Gram sums
  *     G_ij = Σ_docs q_i·q_j — dims·(dims+1)/2 longs, map-side
  *     combined, a single 1-row shuffle regardless of corpus size.
  *  3. The driver runs `iterations` of un-normalized power iteration
  *     on the dims×dims matrix (v ← G·v from the all-ones start) —
  *     O(dims²) work, deterministic double arithmetic in fixed index
  *     order, so any engine replaying the same expression tree gets
  *     bit-identical doubles.
  *  4. A scan-local projection scores every vector:
  *     pc1 = (Σ q_i·v_i) / ‖v‖, rounded to 4 dp.
  *
  * The whole pipeline is closed-form in the data — no RNG, no
  * data-dependent iteration count — which is what puts a PCA under a
  * full cross-engine oracle (the SQL twin restates the quantization,
  * the Gram sums, the unrolled iterations, and the projection).
  *
  * Scale notes: Gram sums stay exact while n_docs·quantScale²·max|x|²
  * < 2⁶³ (≈ 9e18 — at quantScale 1000 and unit-ish embeddings that is
  * ~1e12 docs); the driver step is dims²-bounded, independent of
  * corpus size. Un-normalized iterates grow ~‖G‖ᵏ, so keep
  * `iterations` small (3 captures the dominant eigenvector to far
  * below the 4-dp output rounding whenever the spectral gap is
  * non-trivial); for more iterations add per-step normalization and
  * drop to a spec-pinned gate.
  */
object Pca {

  /** (idCol, pc1): projection of each vector's first `dims` quantized
    * components onto the dominant Gram eigen-direction. See object doc
    * for the exact contract.
    */
  def powerProject(
      df: DataFrame, idCol: String, vecCol: String,
      dims: Int = 16, iterations: Int = 3,
      quantScale: Long = 1000L): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val qCols = (0 until dims).map(i =>
      round(element_at(col(vecCol), i + 1).cast("double") * quantScale, 0)
        .cast("long").as(s"q$i"))
    val q = df.select((col(idCol) +: qCols): _*)
    val gramSums = for { i <- 0 until dims; j <- i until dims }
      yield sum(col(s"q$i") * col(s"q$j")).as(s"g_${i}_$j")
    val gRow = q.agg(gramSums.head, gramSums.tail: _*).head()
    val g = Array.ofDim[Double](dims, dims)
    var idx = 0
    for { i <- 0 until dims; j <- i until dims } {
      val x = gRow.getLong(idx).toDouble
      g(i)(j) = x
      g(j)(i) = x
      idx += 1
    }
    // un-normalized power iteration, fixed index order (the SQL twin
    // replays this exact expression tree)
    var v = Array.fill(dims)(1.0)
    var k = 0
    while (k < iterations) {
      val nv = new Array[Double](dims)
      var i = 0
      while (i < dims) {
        var s = 0.0
        var j = 0
        while (j < dims) { s += g(i)(j) * v(j); j += 1 }
        nv(i) = s
        i += 1
      }
      v = nv
      k += 1
    }
    var norm2 = 0.0
    var i = 0
    while (i < dims) { norm2 += v(i) * v(i); i += 1 }
    val norm = math.sqrt(norm2)
    require(norm > 0.0,
      "degenerate Gram matrix (all-zero quantized corpus) — no principal direction")
    val dot = (0 until dims)
      .map(i => col(s"q$i").cast("double") * lit(v(i)))
      .reduce(_ + _)
    q.select(col(idCol), Numerics.roundz(dot / lit(norm), 4).as("pc1"))
  }
}
