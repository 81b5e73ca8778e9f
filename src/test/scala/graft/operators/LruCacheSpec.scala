package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class LruCacheSpec extends AnyFunSuite {

  test("filling past capacity evicts exactly the least-recently-used entry") {
    val c = new LruCache[Int, String](32)
    (0 until 32).foreach(i => c.getOrElseUpdate(i)(i.toString))
    assert(c.size == 32)
    // touch 0 so it becomes most-recent; the LRU entry is now 1
    c.getOrElseUpdate(0)(fail("0 must be a cache hit"))
    c.getOrElseUpdate(32)("32") // the 33rd corpus
    assert(c.size == 32)
    assert(!c.contains(1)) // exactly the LRU entry went
    assert(c.contains(0) && c.contains(2) && c.contains(32))
  }

  test("computes once per key and returns the cached value on hits") {
    val c = new LruCache[String, Int](4)
    var computes = 0
    def get() = c.getOrElseUpdate("k") { computes += 1; 7 }
    assert(get() == 7 && get() == 7)
    assert(computes == 1)
  }

  test("clear empties the cache") {
    val c = new LruCache[Int, Int](4)
    c.getOrElseUpdate(1)(1)
    c.clear()
    assert(c.size == 0)
  }
}
