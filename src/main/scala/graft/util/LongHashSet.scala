package graft.util

/** Open-addressing hash set of PRIMITIVE longs for per-row hot paths
  * (e.g. the WebDataset writer's per-task duplicate-key guard).
  *
  * `java.util.HashSet[java.lang.Long]` costs ~50-60 B per entry
  * (HashMap.Node + boxed Long + table slot); this is one `Array[Long]`
  * kept at most half full — 16 B per entry amortized (8 B/slot at load
  * factor ≤ 0.5) and zero per-entry allocation, so a 10M-row writer
  * task spends ~160 MB on bookkeeping instead of ~500 MB, with no GC
  * pressure. (At the gate's actual task sizes, single-digit MB.)
  *
  * Empty slots hold 0L; a real 0L key is tracked out-of-band
  * (`hasZero`) so no key value is unrepresentable. Linear probing on a
  * power-of-two table with a finalizer-mixed index keeps clustering
  * acceptable for hashed (already well-mixed) inputs.
  *
  * Not thread-safe — one instance per writer task.
  */
final class LongHashSet(initialCapacity: Int = 1 << 10) {
  private var mask: Int = {
    var c = 16
    while (c < initialCapacity) c <<= 1
    c - 1
  }
  private var table = new Array[Long](mask + 1)
  private var used = 0        // non-zero keys stored
  private var hasZero = false

  private def index(x: Long): Int = {
    // fmix64 finalizer (public-domain MurmurHash3 constant mix) so
    // even poorly-mixed inputs spread over the power-of-two table
    var h = x
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h.toInt & mask
  }

  /** Adds `x`; returns true iff it was not already present. */
  def add(x: Long): Boolean = {
    if (x == 0L) {
      if (hasZero) return false
      hasZero = true
      return true
    }
    var i = index(x)
    while (table(i) != 0L) {
      if (table(i) == x) return false
      i = (i + 1) & mask
    }
    table(i) = x
    used += 1
    if (used * 2 > mask) grow()
    true
  }

  def contains(x: Long): Boolean = {
    if (x == 0L) return hasZero
    var i = index(x)
    while (table(i) != 0L) {
      if (table(i) == x) return true
      i = (i + 1) & mask
    }
    false
  }

  def size: Int = used + (if (hasZero) 1 else 0)

  private def grow(): Unit = {
    val old = table
    mask = mask * 2 + 1
    table = new Array[Long](mask + 1)
    used = 0
    var j = 0
    while (j < old.length) {
      val v = old(j)
      if (v != 0L) {
        var i = index(v)
        while (table(i) != 0L) i = (i + 1) & mask
        table(i) = v
        used += 1
      }
      j += 1
    }
  }
}
