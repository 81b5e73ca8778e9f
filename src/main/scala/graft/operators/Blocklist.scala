package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern blocklist matching — the safety/contamination filter
  * every curation pipeline runs (banned phrases, PII markers, boilerplate
  * signatures; lists run to 10⁴–10⁵ patterns). One Aho–Corasick
  * (CACM 1975) automaton pass per document: O(n + matches) per doc
  * REGARDLESS of pattern count, vs O(n · P) for the per-pattern scan a
  * `contains` chain compiles to. The automaton is built once on the
  * driver (size = Σ pattern lengths) and shipped via `sc.broadcast` —
  * ONE torrent-distributed copy per executor for the job's lifetime,
  * not a per-stage closure re-serialization (at 10⁵ patterns the
  * automaton is tens of MB; closure capture re-ships it with every
  * stage that reuses the frame). The kernel is scan-local — zero
  * shuffles, no UDF registry.
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

  /** Aho–Corasick automaton compacted to primitive arrays: per-node
    * SORTED char/next-state pairs (binary-searched goto), fail links,
    * per-node matched-pattern ids. The compact form is what ships in
    * the broadcast — primitive arrays serialize to roughly Σ pattern
    * lengths, an order of magnitude below the boxed per-node HashMaps
    * the BFS build uses, and the branch-free binary-search goto is the
    * cache shape the per-char hot loop wants at 10⁴⁺ patterns.
    */
  private[operators] final class Automaton(
      val numPatterns: Int,
      nodeChars: Array[Array[Char]], nodeNext: Array[Array[Int]],
      failArr: Array[Int], outArr: Array[Array[Int]]) extends Serializable {

    /** Goto edge for (s, ch): next state, or -1 when absent. */
    @inline private def step(s: Int, ch: Char): Int = {
      val cs = nodeChars(s)
      var lo = 0
      var hi = cs.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = cs(mid)
        if (c == ch) return nodeNext(s)(mid)
        else if (c < ch) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    /** Per-pattern occurrence counts over `text` (already lowercased
      * by the caller), one automaton pass.
      */
    def countMatches(text: String): Array[Long] = {
      val counts = new Array[Long](numPatterns)
      var s = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        var n = step(s, ch)
        while (s != 0 && n < 0) { s = failArr(s); n = step(s, ch) }
        if (n >= 0) s = n
        val out = outArr(s)
        var j = 0
        while (j < out.length) { counts(out(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }
  }

  private[operators] object Automaton {

    /** Breadth-first trie + fail-link build (CACM 1975), then compact
      * to the primitive-array form above.
      */
    def apply(patterns: Array[String]): Automaton = {
      require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
        "patterns must be non-empty strings")
      val gotoMaps =
        scala.collection.mutable.ArrayBuffer(new java.util.HashMap[Char, Int]())
      val outputs =
        scala.collection.mutable.ArrayBuffer(Array.empty[Int])
      val fails = scala.collection.mutable.ArrayBuffer(0)

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
      // BFS fail links; outputs accumulate along the fail chain so a
      // hit at a node reports every pattern ending there
      val queue = scala.collection.mutable.Queue.empty[Int]
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
      val n = gotoMaps.size
      val nodeChars = new Array[Array[Char]](n)
      val nodeNext = new Array[Array[Int]](n)
      var i = 0
      while (i < n) {
        val m = gotoMaps(i)
        val cs = new Array[Char](m.size)
        var j = 0
        val it = m.keySet().iterator()
        while (it.hasNext) { cs(j) = it.next(); j += 1 }
        java.util.Arrays.sort(cs)
        val nx = new Array[Int](cs.length)
        j = 0
        while (j < cs.length) { nx(j) = m.get(cs(j)); j += 1 }
        nodeChars(i) = cs
        nodeNext(i) = nx
        i += 1
      }
      new Automaton(patterns.length, nodeChars, nodeNext,
        fails.toArray, outputs.toArray)
    }
  }

  /** (n_patterns, n_hits) from one automaton pass over lowered text. */
  @inline private def summarize(a: Automaton, text: String): (Long, Long) = {
    val counts = a.countMatches(text.toLowerCase)
    var hit = 0L
    var total = 0L
    var i = 0
    while (i < counts.length) {
      if (counts(i) > 0) hit += 1
      total += counts(i)
      i += 1
    }
    (hit, total)
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
    val auto = spark.sparkContext.broadcast(
      Automaton(patterns.map(_.toLowerCase).toArray))
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val a = auto.value
        it.map { case (id, text) =>
          val (hit, total) = summarize(a, text)
          (id, hit, total)
        }
      }
      .toDF(idCol, "n_patterns", "n_hits")
  }

  /** [[flagMatches]] with the event-time column carried through the
    * kernel — the shape a streaming windowed aggregation needs
    * (recovering the timestamp afterwards would be a stream-stream
    * join). Stateless, so it runs identically on a batch frame and on
    * a stream; see [[graft.streaming.CorpusMonitor.blocklistByWindow]].
    */
  def flagMatchesWithTs(
      docs: DataFrame, textCol: String, idCol: String, tsCol: String,
      patterns: Seq[String]): DataFrame = {
    Dedup.requireLongCastableId(docs, idCol)
    val spark = docs.sparkSession
    import spark.implicits._
    val auto = spark.sparkContext.broadcast(
      Automaton(patterns.map(_.toLowerCase).toArray))
    docs.select(col(idCol).cast("long"), col(tsCol).cast("timestamp"),
        col(textCol))
      .as[(Long, java.sql.Timestamp, String)]
      .mapPartitions { it =>
        val a = auto.value
        it.map { case (id, ts, text) =>
          val (hit, total) = summarize(a, text)
          (id, ts, hit, total)
        }
      }
      .toDF(idCol, tsCol, "n_patterns", "n_hits")
  }
}
