package graft.functions

/** Bit-exact clone of CPython's `random.Random(seed)` for 32-bit integer
  * seeds — MT19937 seeded via `init_by_array`, plus the `getrandbits` /
  * `_randbelow` / `randint` / `choice` call semantics the reference's
  * deterministic fake provider depends on
  * (`/root/reference/src/deid_pipeline/pii/utils/fake_provider.py:104-168`:
  * `rng = random.Random(int(seed))`).
  *
  * CPython seeds an int by splitting its absolute value into little-endian
  * 32-bit words and calling `init_by_array` (Modules/_randommodule.c,
  * `random_seed`). All seeds here come from
  * `int(sha256(key).hexdigest()[:8], 16)` so they fit one word.
  *
  * Not thread-safe; allocate one instance per (type, original, ctx) triple —
  * the generator sequences are short (< 20 draws).
  */
final class PyRandom(seed: Long) {
  private val N = 624
  private val mt = new Array[Int](N)
  private var mti = N

  reseed(seed)

  /** Re-run CPython's int seeding in place — lets hot paths reuse one
    * instance per thread instead of allocating the 2.5 KB state per draw
    * sequence (see [[PyRandom.threadLocal]]).
    */
  def reseed(seed: Long): Unit = {
    // init_genrand(19650218) then init_by_array([seed & 0xffffffff])
    mt(0) = 19650218
    var i = 1
    while (i < N) {
      mt(i) = 1812433253 * (mt(i - 1) ^ (mt(i - 1) >>> 30)) + i
      i += 1
    }
    val key = (seed & 0xffffffffL).toInt
    val keyLen = 1
    i = 1
    var j = 0
    var k = math.max(N, keyLen)
    while (k > 0) {
      mt(i) = (mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1664525)) + key + j
      i += 1; j += 1
      if (i >= N) { mt(0) = mt(N - 1); i = 1 }
      if (j >= keyLen) j = 0
      k -= 1
    }
    k = N - 1
    while (k > 0) {
      mt(i) = (mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1566083941)) - i
      i += 1
      if (i >= N) { mt(0) = mt(N - 1); i = 1 }
      k -= 1
    }
    mt(0) = 0x80000000
    mti = N
  }

  private def genrand(): Int = {
    if (mti >= N) {
      val M = 397
      var kk = 0
      while (kk < N - M) {
        val y = (mt(kk) & 0x80000000) | (mt(kk + 1) & 0x7fffffff)
        mt(kk) = mt(kk + M) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      while (kk < N - 1) {
        val y = (mt(kk) & 0x80000000) | (mt(kk + 1) & 0x7fffffff)
        mt(kk) = mt(kk + (M - N)) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      val y = (mt(N - 1) & 0x80000000) | (mt(0) & 0x7fffffff)
      mt(N - 1) = mt(M - 1) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
      mti = 0
    }
    var y = mt(mti)
    mti += 1
    y ^= y >>> 11
    y ^= (y << 7) & 0x9d2c5680
    y ^= (y << 15) & 0xefc60000
    y ^ (y >>> 18)
  }

  /** Python `getrandbits(k)` for 1 <= k <= 32: top k bits of one draw. */
  def getrandbits(k: Int): Long = {
    require(k >= 1 && k <= 32, s"getrandbits($k) unsupported")
    ((genrand() >>> (32 - k)).toLong & 0xffffffffL)
  }

  /** Python `Random._randbelow_with_getrandbits(n)`: rejection sampling. */
  def randbelow(n: Int): Int = {
    require(n > 0)
    val k = 32 - Integer.numberOfLeadingZeros(n) // n.bit_length()
    var r = getrandbits(k)
    while (r >= n) r = getrandbits(k)
    r.toInt
  }

  /** Python `randint(a, b)` — inclusive both ends. */
  def randint(a: Int, b: Int): Int = a + randbelow(b - a + 1)

  /** Python `choice(seq)`. */
  def choice[T](seq: IndexedSeq[T]): T = seq(randbelow(seq.length))

  /** Python `choice(str)` — one character. */
  def choice(s: String): Char = s.charAt(randbelow(s.length))

  /** Python `random()`: 53-bit double in [0, 1) — `random_random` in
    * Modules/_randommodule.c: `(a*67108864.0+b)*(1.0/9007199254740992.0)`
    * with a = next()>>5, b = next()>>6.
    */
  def random(): Double = {
    val a = (genrand() >>> 5).toLong
    val b = (genrand() >>> 6).toLong
    (a * 67108864.0 + b) * (1.0 / 9007199254740992.0)
  }

  /** Python `uniform(a, b)` = `a + (b-a) * random()`. */
  def uniform(a: Double, b: Double): Double = a + (b - a) * random()

  /** `_randbelow` for spans past Int range (e.g. `randint(10**9, 10**10)`):
    * getrandbits(k) assembled from 32-bit words exactly like CPython's
    * `getrandbits` for k > 32 (little-endian words, top word truncated).
    */
  def randbelowLong(n: Long): Long = {
    require(n > 0)
    val k = 64 - java.lang.Long.numberOfLeadingZeros(n)
    var r = getrandbitsLong(k)
    while (r >= n) r = getrandbitsLong(k)
    r
  }

  /** Python `getrandbits(k)` for 1 <= k <= 63. */
  def getrandbitsLong(k: Int): Long = {
    require(k >= 1 && k <= 63)
    if (k <= 32) getrandbits(k)
    else {
      // CPython emits ceil(k/32) words, low word first; the LAST word keeps
      // its top (k % 32) bits
      val lo = genrand().toLong & 0xffffffffL
      val hiBits = k - 32
      val hi = (genrand() >>> (32 - hiBits)).toLong & 0xffffffffL
      lo | (hi << 32)
    }
  }

  /** Python `randint(a, b)` over Long bounds. */
  def randintLong(a: Long, b: Long): Long = a + randbelowLong(b - a + 1)
}

object PyRandom {
  private val tl: ThreadLocal[PyRandom] =
    ThreadLocal.withInitial(() => new PyRandom(0L))

  /** Per-thread reusable instance, reseeded for the caller. */
  def threadLocal(seed: Long): PyRandom = {
    val r = tl.get()
    r.reseed(seed)
    r
  }
}
