package graft.functions

/** Minimal open-addressing set of non-negative longs for per-row window
  * deduplication inside the signature kernels (optimization guide §1.2
  * "per-task work"): a character k-gram window repeats constantly in
  * natural text (" the ", "tion "), and every repeat used to pay a full
  * md5 + per-lane affine pass whose result is idempotent under the min
  * fold — deduping first makes the kernel's cost proportional to the
  * DISTINCT window count. Zero boxing, one probe loop, linear probing,
  * power-of-two capacity sized once from the known window count (never
  * rehashes). `0` is the empty-slot sentinel, so the key 0 (a window of
  * NUL bytes) is tracked in a side flag.
  *
  * Not thread-safe; one instance lives for one kernel invocation. */
private[graft] final class LongSet(maxEntries: Int) {
  private val cap = Integer.highestOneBit(math.max(4, maxEntries) * 2 - 1) * 2
  private val mask = cap - 1
  private val table = new Array[Long](cap)
  private var hasZero = false

  /** True when `k` was NOT seen before (and records it). */
  def add(k: Long): Boolean = {
    if (k == 0L) {
      if (hasZero) return false
      hasZero = true
      return true
    }
    // splitmix-style scramble: packed windows share low-byte structure
    var h = k * -7046029254386353131L // 0x9E3779B97F4A7C15 as signed
    h ^= (h >>> 32)
    var i = h.toInt & mask
    while (true) {
      val v = table(i)
      if (v == 0L) { table(i) = k; return true }
      if (v == k) return false
      i = (i + 1) & mask
    }
    false // unreachable: capacity > maxEntries
  }
}
