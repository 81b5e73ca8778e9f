package graft.operators

import graft.SparkSpec

/** A-priori frequent pairs: level-1 prune, within-basket dedup, and
  * exact support accounting on hand-built baskets.
  */
class FrequentItemsetsSpec extends SparkSpec {

  private def baskets = {
    val s = spark
    import s.implicits._
    // b1: {x, y, z}; b2: {x, y}; b3: {x, y}; b4: {x, rare}
    // duplicates inside a basket must not inflate support
    Seq(("b1", "x"), ("b1", "x"), ("b1", "y"), ("b1", "z"),
      ("b2", "x"), ("b2", "y"), ("b3", "x"), ("b3", "y"),
      ("b4", "x"), ("b4", "rare"))
      .toDF("basket", "item")
  }

  test("pair supports are exact and the threshold filters") {
    val out = FrequentItemsets.frequentPairs(baskets, "basket", "item", 2L)
      .orderBy("item_a", "item_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // (x,y) support 3; (x,z)/(y,z) support 1 < 2; rare has count 1 so
    // level-1 drops it before pairing
    assert(out.toSeq == Seq(("x", "y", 3L, 4L, 3L, 4L)))
  }

  test("level-1 prune removes items that cannot reach minSupport") {
    // with minSupport 1 every pair appears, including z's and rare's
    val all = FrequentItemsets.frequentPairs(baskets, "basket", "item", 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(all == Set(("x", "y", 3L), ("x", "z", 1L), ("y", "z", 1L),
      ("rare", "x", 1L)))
  }

  test("associationRules: confidence/lift per direction, threshold in integers") {
    val out = FrequentItemsets
      .associationRules(baskets, "basket", "item", 2L)
      .orderBy("antecedent").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(5), r.getDouble(6)))
    // pair (x,y): s=3, n_x=4, n_y=3, baskets=4
    // x→y: conf 3/4, lift 3·4/(4·3)=1 ; y→x: conf 1, lift 1
    assert(out.toSeq == Seq(("x", "y", 3L, 0.75, 1.0),
      ("y", "x", 3L, 1.0, 1.0)))
    // a 80% confidence floor keeps only y→x (100·3 ≥ 80·n_ant)
    val strict = FrequentItemsets
      .associationRules(baskets, "basket", "item", 2L,
        minConfidencePct = 80L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(strict.toSeq == Seq(("y", "x")))
  }

  test("result is invariant to input partitioning") {
    val a = FrequentItemsets.frequentPairs(baskets, "basket", "item", 2L)
      .orderBy("item_a", "item_b").collect()
    val b = FrequentItemsets.frequentPairs(baskets.repartition(5),
        "basket", "item", 2L)
      .orderBy("item_a", "item_b").collect()
    assert(a.sameElements(b))
  }
}
