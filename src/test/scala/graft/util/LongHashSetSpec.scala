package graft.util

import org.scalatest.funsuite.AnyFunSuite

class LongHashSetSpec extends AnyFunSuite {

  test("add/contains/size agree with java.util.HashSet across growth, " +
    "including 0L and adversarially clustered keys") {
    val rnd = new scala.util.Random(42)
    val s = new LongHashSet(16)
    val ref = new java.util.HashSet[java.lang.Long]()
    // mixed stream: random longs, repeats, 0L, and sequential runs
    // (worst case for linear probing without the index mix)
    val keys = Seq.fill(5000)(rnd.nextLong()) ++
      Seq.fill(100)(0L) ++
      (1000L to 3000L) ++
      Seq.fill(2000)(rnd.nextLong(50)) // heavy repeats
    keys.foreach { k =>
      assert(s.add(k) == ref.add(k), s"add($k) must match the reference")
    }
    assert(s.size == ref.size)
    keys.foreach(k => assert(s.contains(k) == ref.contains(k)))
    // absent probes
    var i = 0
    while (i < 1000) {
      val k = rnd.nextLong()
      assert(s.contains(k) == ref.contains(k))
      i += 1
    }
  }
}
