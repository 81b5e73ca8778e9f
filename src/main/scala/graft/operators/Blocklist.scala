package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern blocklist matching — the safety/contamination filter
  * every curation pipeline runs (banned phrases, PII markers, boilerplate
  * signatures; lists run to 10⁴–10⁵ patterns). One Aho–Corasick
  * (CACM 1975) automaton pass per document: O(n + matches) per doc
  * REGARDLESS of pattern count, vs O(n · P) for the per-pattern scan a
  * `contains` chain compiles to. The automaton is built once on the
  * driver (size = Σ pattern lengths) and broadcast via the task
  * closure; the kernel is scan-local — zero shuffles, no UDF registry.
  *
  * Match contract (oracle-restatable): case-insensitive LITERAL
  * matching on `lower(text)`; per pattern, ALL occurrences count,
  * including overlapping ones (every end position reporting the
  * pattern) — in SQL, the number of positions i with
  * `substr(t, i, len(p)) = p`.
  *
  * Output: (id, n_patterns ≔ distinct patterns present,
  * n_hits ≔ total occurrences) for every document — a total
  * assignment, so downstream keeps/drops are a filter, not a join.
  */
object Blocklist {

  /** Aho–Corasick automaton over the lowercase byte-char alphabet:
    * flat arrays (goto via per-node HashMap kept small, fail links,
    * per-node matched-pattern ids), built breadth-first.
    */
  private[operators] final class Automaton(patterns: Array[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    private val gotoMaps =
      scala.collection.mutable.ArrayBuffer(new java.util.HashMap[Char, Int]())
    private val outputs =
      scala.collection.mutable.ArrayBuffer(Array.empty[Int])
    private val fails = scala.collection.mutable.ArrayBuffer(0)

    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        if (gotoMaps(s).containsKey(ch)) s = gotoMaps(s).get(ch)
        else {
          gotoMaps += new java.util.HashMap[Char, Int]()
          outputs += Array.empty[Int]
          fails += 0
          gotoMaps(s).put(ch, gotoMaps.size - 1)
          s = gotoMaps.size - 1
        }
      }
      outputs(s) = outputs(s) :+ pi
    }
    // BFS fail links; outputs accumulate along the fail chain so a hit
    // at a node reports every pattern ending there
    private val queue = scala.collection.mutable.Queue.empty[Int]
    gotoMaps(0).forEach { (_, s) => fails(s) = 0; queue.enqueue(s) }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      gotoMaps(r).forEach { (ch, s) =>
        queue.enqueue(s)
        var f = fails(r)
        while (f != 0 && !gotoMaps(f).containsKey(ch)) f = fails(f)
        fails(s) = if (gotoMaps(f).containsKey(ch) && gotoMaps(f).get(ch) != s)
          gotoMaps(f).get(ch) else 0
        if (outputs(fails(s)).nonEmpty)
          outputs(s) = outputs(s) ++ outputs(fails(s))
      }
    }
    private val gotoArr = gotoMaps.toArray
    private val failArr = fails.toArray
    private val outArr = outputs.toArray
    val numPatterns: Int = patterns.length

    /** Per-pattern occurrence counts over `text` (already lowercased
      * by the caller), one automaton pass.
      */
    def countMatches(text: String): Array[Long] = {
      val counts = new Array[Long](numPatterns)
      var s = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (s != 0 && !gotoArr(s).containsKey(ch)) s = failArr(s)
        if (gotoArr(s).containsKey(ch)) s = gotoArr(s).get(ch)
        val out = outArr(s)
        var j = 0
        while (j < out.length) { counts(out(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** (id, n_patterns, n_hits) per document; see the object doc for the
    * match contract. `patterns` are matched case-insensitively.
    */
  def flagMatches(
      docs: DataFrame, textCol: String, idCol: String,
      patterns: Seq[String]): DataFrame = {
    Dedup.requireLongCastableId(docs, idCol)
    val spark = docs.sparkSession
    import spark.implicits._
    val auto = new Automaton(patterns.map(_.toLowerCase).toArray)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val counts = auto.countMatches(text.toLowerCase)
          var hit = 0L
          var total = 0L
          var i = 0
          while (i < counts.length) {
            if (counts(i) > 0) hit += 1
            total += counts(i)
            i += 1
          }
          (id, hit, total)
        }
      }
      .toDF(idCol, "n_patterns", "n_hits")
  }
}
