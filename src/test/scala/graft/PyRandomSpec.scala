package graft

import graft.functions.{Digests, PyRandom}
import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors dumped from CPython 3.x `random.Random`:
  * {{{
  * random.Random(12345).getrandbits(32) x5
  *   -> 1789368711, 3146859322, 43676229, 3522623596, 3544234957
  * random.Random(0): 3626764237, 1654615998, 3255389356
  * random.Random(0xffffffff): 2728839433, 2661025012, 872737089
  * random.Random(1).randint(0,9) x10 -> 2,9,1,4,1,7,7,7,6,3
  * random.Random(7).choice('ABCDEFGHJKLMNPQRSTUVXYWZ') -> 'L'
  * random.Random(999): randint(100,999)=900, randint(0,9999)=1311
  * }}}
  */
class PyRandomSpec extends AnyFunSuite {

  test("getrandbits(32) matches CPython for seed 12345") {
    val r = new PyRandom(12345L)
    assert(Seq.fill(5)(r.getrandbits(32)) ==
      Seq(1789368711L, 3146859322L, 43676229L, 3522623596L, 3544234957L))
  }

  test("seed 0 and seed 0xffffffff edges") {
    val r0 = new PyRandom(0L)
    assert(Seq.fill(3)(r0.getrandbits(32)) ==
      Seq(3626764237L, 1654615998L, 3255389356L))
    val rf = new PyRandom(0xffffffffL)
    assert(Seq.fill(3)(rf.getrandbits(32)) ==
      Seq(2728839433L, 2661025012L, 872737089L))
  }

  test("randint matches CPython") {
    val r = new PyRandom(1L)
    assert(Seq.fill(10)(r.randint(0, 9)) == Seq(2, 9, 1, 4, 1, 7, 7, 7, 6, 3))
    val r999 = new PyRandom(999L)
    assert(r999.randint(100, 999) == 900)
    assert(r999.randint(0, 9999) == 1311)
  }

  test("choice matches CPython") {
    assert(new PyRandom(7L).choice("ABCDEFGHJKLMNPQRSTUVXYWZ") == 'L')
  }

  test("sha256 seed derivation matches Python int(hexdigest[:8], 16)") {
    // python: hashlib.sha256(b"PHONE:0912345678:abc").hexdigest()[:8]
    assert(Digests.sha256Hex("abc") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(Digests.seedOf("abc") == java.lang.Long.parseLong("ba7816bf", 16))
  }
}
