package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{shims => S}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact FarmHash fingerprints — the reference's `farm_hash` and
  * `simple_hash` builtins, bit-for-bit.
  *
  * `farm_hash(args...)` (udf/farm_hash.cpp → GetFarmFingerprint,
  * unversioned_value.cpp:30, combinator library/cpp/yt/farmhash/
  * farm_hash.h: chain from 0xdeadc0de through Fingerprint(Uint128),
  * xor arity) hashes each value with Google FarmHash's forever-fixed
  * fingerprint functions: `Fingerprint64` (= farmhashna::Hash64) for
  * strings, `Fingerprint(uint64)` for numerics/bools/nulls. The core
  * algorithm is reimplemented here from the public FarmHash library
  * (github.com/google/farmhash, MIT) — the reference's own vendored
  * copy is contrib/libs/farmhash; ql_query_ut.cpp FarmHash pins two
  * exact output vectors that this implementation reproduces.
  *
  * `simple_hash(args...)` (cg_routines.cpp:2009 SimpleHash) is the
  * reference's FarmHash/Murmur hybrid row hash: a running state seeded
  * with the arity, longs folded as `(state ^ Fingerprint(v)) * M`,
  * strings folded 8 little-endian bytes at a time with a
  * shift-xor tail, Murmur-style finalization per string. Doubles and
  * composites are unhashable ("Cannot hash values of type ...").
  */
object FarmHash {
  private val k0 = 0xc3a5c85c97cb3127L
  private val k1 = 0xb492b66fbe98f273L
  private val k2 = 0x9ae16a3b2f90404fL
  private val kMul = 0x9ddfea08eb382d69L

  @inline private def rot(v: Long, s: Int): Long = java.lang.Long.rotateRight(v, s)
  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)
  @inline private def fetch64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)
  @inline private def fetch32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  private def hashLen16(u: Long, v: Long, mul: Long): Long = {
    var a = (u ^ v) * mul
    a ^= (a >>> 47)
    var b = (v ^ a) * mul
    b ^= (b >>> 47)
    b * mul
  }

  private def hashLen0to16(s: Array[Byte], off: Int, len: Int): Long = {
    if (len >= 8) {
      val mul = k2 + len * 2L
      val a = fetch64(s, off) + k2
      val b = fetch64(s, off + len - 8)
      val c = rot(b, 37) * mul + a
      val d = (rot(a, 25) + b) * mul
      hashLen16(c, d, mul)
    } else if (len >= 4) {
      val mul = k2 + len * 2L
      val a = fetch32(s, off)
      hashLen16(len + (a << 3), fetch32(s, off + len - 4), mul)
    } else if (len > 0) {
      val a = s(off) & 0xffL
      val b = s(off + (len >> 1)) & 0xffL
      val c = s(off + len - 1) & 0xffL
      val y = (a + (b << 8)) & 0xffffffffL
      val z = (len + (c << 2)) & 0xffffffffL
      shiftMix(y * k2 ^ z * k0) * k2
    } else k2
  }

  private def hashLen17to32(s: Array[Byte], off: Int, len: Int): Long = {
    val mul = k2 + len * 2L
    val a = fetch64(s, off) * k1
    val b = fetch64(s, off + 8)
    val c = fetch64(s, off + len - 8) * mul
    val d = fetch64(s, off + len - 16) * k2
    hashLen16(rot(a + b, 43) + rot(c, 30) + d,
      a + rot(b + k2, 18) + c, mul)
  }

  private def hashLen33to64(s: Array[Byte], off: Int, len: Int): Long = {
    val mul = k2 + len * 2L
    val a = fetch64(s, off) * k2
    val b = fetch64(s, off + 8)
    val c = fetch64(s, off + len - 8) * mul
    val d = fetch64(s, off + len - 16) * k2
    val y = rot(a + b, 43) + rot(c, 30) + d
    val z = hashLen16(y, a + rot(b + k2, 18) + c, mul)
    val e = fetch64(s, off + 16) * mul
    val f = fetch64(s, off + 24)
    val g = (y + fetch64(s, off + len - 32)) * mul
    val h = (z + fetch64(s, off + len - 24)) * mul
    hashLen16(rot(e + f, 43) + rot(g, 30) + h,
      e + rot(f + a, 18) + g, mul)
  }

  // returns (first, second) packed: WeakHashLen32WithSeeds
  private def weak(w: Long, x: Long, y: Long, z: Long, a0: Long, b0: Long): (Long, Long) = {
    var a = a0 + w
    var b = rot(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rot(a, 44)
    (a + z, b + c)
  }

  /** farmhashna::Hash64 = the forever-fixed Fingerprint64. */
  def fingerprint64(s: Array[Byte]): Long = {
    val len = s.length
    if (len <= 16) return hashLen0to16(s, 0, len)
    if (len <= 32) return hashLen17to32(s, 0, len)
    if (len <= 64) return hashLen33to64(s, 0, len)
    val seed = 81L
    var x = seed
    var y = seed * k1 + 113L
    var z = shiftMix(y * k2 + 113L) * k2
    var vf = 0L; var vs = 0L; var wf = 0L; var ws = 0L
    x = x * k2 + fetch64(s, 0)
    var off = 0
    val endOff = ((len - 1) / 64) * 64
    val last64 = endOff + ((len - 1) & 63) - 63
    while ({
      x = rot(x + y + vf + fetch64(s, off + 8), 37) * k1
      y = rot(y + vs + fetch64(s, off + 48), 42) * k1
      x ^= ws
      y += vf + fetch64(s, off + 40)
      z = rot(z + wf, 33) * k1
      val v = weak(fetch64(s, off), fetch64(s, off + 8), fetch64(s, off + 16),
        fetch64(s, off + 24), vs * k1, x + wf)
      vf = v._1; vs = v._2
      val w = weak(fetch64(s, off + 32), fetch64(s, off + 40),
        fetch64(s, off + 48), fetch64(s, off + 56), z + ws,
        y + fetch64(s, off + 16))
      wf = w._1; ws = w._2
      val t = z; z = x; x = t
      off += 64
      off != endOff
    }) ()
    val mul = k1 + ((z & 0xff) << 1)
    val o = last64
    wf += (len - 1) & 63
    vf += wf
    wf += vf
    x = rot(x + y + vf + fetch64(s, o + 8), 37) * mul
    y = rot(y + vs + fetch64(s, o + 48), 42) * mul
    x ^= ws * 9
    y += vf * 9 + fetch64(s, o + 40)
    z = rot(z + wf, 33) * mul
    val v = weak(fetch64(s, o), fetch64(s, o + 8), fetch64(s, o + 16),
      fetch64(s, o + 24), vs * mul, x + wf)
    vf = v._1; vs = v._2
    val w = weak(fetch64(s, o + 32), fetch64(s, o + 40), fetch64(s, o + 48),
      fetch64(s, o + 56), z + ws, y + fetch64(s, o + 16))
    wf = w._1; ws = w._2
    val t = z; z = x; x = t
    hashLen16(hashLen16(vf, wf, mul) + shiftMix(y) * k0 + z,
      hashLen16(vs, ws, mul) + x, mul)
  }

  /** Fingerprint(uint64): Murmur-inspired, shifts 44/41. */
  def fpU64(x: Long): Long = {
    var b = x * kMul
    b ^= (b >>> 44)
    b *= kMul
    b ^= (b >>> 41)
    b * kMul
  }

  /** Fingerprint(Uint128(lo, hi)): the pairwise chain combinator
    * (shifts 47/44/41 — NOT Hash128to64's 47/47). */
  def mix(lo: Long, hi: Long): Long = {
    var a = (lo ^ hi) * kMul
    a ^= (a >>> 47)
    var b = (hi ^ a) * kMul
    b ^= (b >>> 44)
    b *= kMul
    b ^= (b >>> 41)
    b * kMul
  }

  def NULL_FP: Long = fpU64(0L)
  def fpUtf8(s: UTF8String): Long = fingerprint64(s.getBytes)
  def fpDouble(d: Double): Long = fpU64(java.lang.Double.doubleToRawLongBits(d))
  def fpBool(b: Boolean): Long = fpU64(if (b) 1L else 0L)

  // ---- simple_hash (cg_routines.cpp SimpleHash) ----------------------
  private val M = 0xc6a4a7935bd1e995L

  def simpleLong(data: Long, state: Long): Long = (state ^ fpU64(data)) * M
  def simpleBool(b: Boolean, state: Long): Long = simpleLong(if (b) 1L else 0L, state)
  def simpleNull(state: Long): Long = simpleLong(0L, state)

  def simpleString(u: UTF8String, state: Long): Long = {
    val bytes = u.getBytes
    val len = bytes.length
    var result = state
    var i = 0
    while (i + 8 <= len) { // exactly len/8 full little-endian words
      result = simpleLong(fetch64(bytes, i), result)
      i += 8
    }
    if ((len & 4) != 0) {
      // ui32 << k wraps in 32-bit arithmetic before widening
      result ^= (fetch32(bytes, i) << (len & 3)) & 0xffffffffL
      i += 4
    }
    if ((len & 2) != 0) {
      result ^= ((bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8)) << (len & 1)
      i += 2
    }
    if ((len & 1) != 0)
      result ^= bytes(i) & 0xffL
    result *= M
    result ^= (result >>> 47)
    result *= M
    result ^= (result >>> 47)
    result
  }

  // ——— Fingerprint32 = farmhashmk::Hash32 (farmhash_iface.cc:88 —
  // the portable forever-fixed 32-bit fingerprint; farmhashmk.cc) ———
  private val C1 = 0xcc9e2d51
  private val C2 = 0x1b873593
  @inline private def rot32(v: Int, s: Int): Int =
    Integer.rotateRight(v, s)
  @inline private def fmix32(h0: Int): Int = {
    var h = h0
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }
  @inline private def mur(a0: Int, h0: Int): Int = {
    var a = a0 * C1
    a = rot32(a, 17)
    a *= C2
    var h = h0 ^ a
    h = rot32(h, 19)
    h * 5 + 0xe6546b64
  }
  @inline private def f32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)

  private def hash32Len0to4(s: Array[Byte], len: Int): Int = {
    var b = 0
    var c = 9
    var i = 0
    while (i < len) {
      b = b * C1 + s(i) // SIGNED byte, like the reference's signed char
      c ^= b
      i += 1
    }
    fmix32(mur(b, mur(len, c)))
  }

  private def hash32Len5to12(s: Array[Byte], len: Int): Int = {
    var a = len; var b = len * 5; val c = 9; val d = b
    a += f32(s, 0)
    b += f32(s, len - 4)
    val c2 = c + f32(s, (len >> 1) & 4)
    fmix32(mur(c2, mur(b, mur(a, d))))
  }

  private def hash32Len13to24(s: Array[Byte], len: Int): Int = {
    var a = f32(s, (len >> 1) - 4)
    val b = f32(s, 4)
    val c = f32(s, len - 8)
    val d = f32(s, len >> 1)
    val e = f32(s, 0)
    val f = f32(s, len - 4)
    var h = d * C1 + len
    a = rot32(a, 12) + f
    h = mur(c, h) + a
    a = rot32(a, 3) + c
    h = mur(e, h) + a
    a = rot32(a + f, 12) + d
    h = mur(b, h) + a
    fmix32(h)
  }

  /** farmhash util::Fingerprint32 — returned as the uint32 value in a
    * Long (0..2^32-1). */
  def fingerprint32(s: Array[Byte]): Long = {
    val len = s.length
    val r: Int =
      if (len <= 4) hash32Len0to4(s, len)
      else if (len <= 12) hash32Len5to12(s, len)
      else if (len <= 24) hash32Len13to24(s, len)
      else {
        var h = len; var g = C1 * len; var f = g
        val a0 = rot32(f32(s, len - 4) * C1, 17) * C2
        val a1 = rot32(f32(s, len - 8) * C1, 17) * C2
        val a2 = rot32(f32(s, len - 16) * C1, 17) * C2
        val a3 = rot32(f32(s, len - 12) * C1, 17) * C2
        val a4 = rot32(f32(s, len - 20) * C1, 17) * C2
        h ^= a0; h = rot32(h, 19); h = h * 5 + 0xe6546b64
        h ^= a2; h = rot32(h, 19); h = h * 5 + 0xe6546b64
        g ^= a1; g = rot32(g, 19); g = g * 5 + 0xe6546b64
        g ^= a3; g = rot32(g, 19); g = g * 5 + 0xe6546b64
        f += a4; f = rot32(f, 19) + 113
        var iters = (len - 1) / 20
        var off = 0
        while (iters != 0) {
          val a = f32(s, off)
          val b = f32(s, off + 4)
          val c = f32(s, off + 8)
          val d = f32(s, off + 12)
          val e = f32(s, off + 16)
          h += a
          g += b
          f += c
          h = mur(d, h) + e
          g = mur(c, g) + a
          f = mur(b + e * C1, f) + d
          f += g
          g += f
          off += 20
          iters -= 1
        }
        g = rot32(g, 11) * C1
        g = rot32(g, 17) * C1
        f = rot32(f, 11) * C1
        f = rot32(f, 17) * C1
        h = rot32(h + g, 19)
        h = h * 5 + 0xe6546b64
        h = rot32(h, 17) * C1
        h = rot32(h + f, 19)
        h = h * 5 + 0xe6546b64
        rot32(h, 17) * C1
      }
    r.toLong & 0xffffffffL
  }
}

/** Exact CityHash64 (Google CityHash, MIT — the reference vendors it
  * as util/digest/city.cpp) plus the Arcadia hash combinators that
  * bigb_hash's fallback uses: `MultiHash("shard", uid)` =
  * `IntHash64(CityHash64(uid)) ^ CityHash64("shard")`
  * (util/digest/multi.h CombineHashes, util/digest/numeric.h
  * IntHashImpl(ui64), util/generic/string_hash.h THash<TStringBuf> =
  * CityHash64 on 64-bit). ql_query_ut.cpp BigbHash pins six fallback
  * vectors that this reproduces bit-exactly. */
object CityHash {
  private val k0 = 0xc3a5c85c97cb3127L
  private val k1 = 0xb492b66fbe98f273L
  private val k2 = 0x9ae16a3b2f90404fL
  private val k3 = 0xc949d7c7509e6557L
  private val kMul = 0x9ddfea08eb382d69L

  @inline private def rot(v: Long, s: Int): Long =
    if (s == 0) v else java.lang.Long.rotateRight(v, s)
  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)
  @inline private def fetch64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)
  @inline private def fetch32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  // Hash128to64: 47/47 shifts (unlike Fingerprint(uint128)'s 47/44/41)
  private def hashLen16(u: Long, v: Long): Long = {
    var a = (u ^ v) * kMul
    a ^= (a >>> 47)
    var b = (v ^ a) * kMul
    b ^= (b >>> 47)
    b * kMul
  }

  private def weak(w: Long, x: Long, y: Long, z: Long, a0: Long, b0: Long): (Long, Long) = {
    var a = a0 + w
    var b = rot(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rot(a, 44)
    (a + z, b + c)
  }

  def cityHash64(s: Array[Byte]): Long = {
    val len = s.length
    if (len <= 16) {
      if (len > 8) {
        val a = fetch64(s, 0)
        val b = fetch64(s, len - 8)
        // RotateByAtLeast1: len in 9..16, never 0
        hashLen16(a, java.lang.Long.rotateRight(b + len, len)) ^ b
      } else if (len >= 4) {
        val a = fetch32(s, 0)
        hashLen16(len + (a << 3), fetch32(s, len - 4))
      } else if (len > 0) {
        val a = s(0) & 0xffL
        val b = s(len >> 1) & 0xffL
        val c = s(len - 1) & 0xffL
        val y = (a + (b << 8)) & 0xffffffffL
        val z = (len + (c << 2)) & 0xffffffffL
        shiftMix(y * k2 ^ z * k3) * k2
      } else k2
    } else if (len <= 32) {
      val a = fetch64(s, 0) * k1
      val b = fetch64(s, 8)
      val c = fetch64(s, len - 8) * k2
      val d = fetch64(s, len - 16) * k0
      hashLen16(rot(a - b, 43) + rot(c, 30) + d,
        a + rot(b ^ k3, 20) - c + len)
    } else if (len <= 64) {
      var z = fetch64(s, 24)
      var a = fetch64(s, 0) + (len + fetch64(s, len - 16)) * k0
      var b = rot(a + z, 52)
      var c = rot(a, 37)
      a += fetch64(s, 8)
      c += rot(a, 7)
      a += fetch64(s, 16)
      val vf = a + z
      val vs = b + rot(a, 31) + c
      a = fetch64(s, 16) + fetch64(s, len - 32)
      z = fetch64(s, len - 8)
      b = rot(a + z, 52)
      c = rot(a, 37)
      a += fetch64(s, len - 24)
      c += rot(a, 7)
      a += fetch64(s, len - 16)
      val wf = a + z
      val ws = b + rot(a, 31) + c
      val r = shiftMix((vf + ws) * k2 + (wf + vs) * k0)
      shiftMix(r * k0 + vs) * k2
    } else {
      var x = fetch64(s, 0)
      var y = fetch64(s, len - 16) ^ k1
      var z = fetch64(s, len - 56) ^ k0
      var v = weak(fetch64(s, len - 64), fetch64(s, len - 56),
        fetch64(s, len - 48), fetch64(s, len - 40), len.toLong, y)
      var w = weak(fetch64(s, len - 32), fetch64(s, len - 24),
        fetch64(s, len - 16), fetch64(s, len - 8), len * k1, k0)
      z += shiftMix(v._2) * k1
      x = rot(z + x, 39) * k1
      y = rot(y, 33) * k1
      var remaining = (len - 1) & ~63
      var off = 0
      while ({
        x = rot(x + y + v._1 + fetch64(s, off + 16), 37) * k1
        y = rot(y + v._2 + fetch64(s, off + 48), 42) * k1
        x ^= w._2
        y ^= v._1
        z = rot(z ^ w._1, 33)
        v = weak(fetch64(s, off), fetch64(s, off + 8), fetch64(s, off + 16),
          fetch64(s, off + 24), v._2 * k1, x + w._1)
        w = weak(fetch64(s, off + 32), fetch64(s, off + 40),
          fetch64(s, off + 48), fetch64(s, off + 56), z + w._2, y)
        val t = z; z = x; x = t
        off += 64
        remaining -= 64
        remaining != 0
      }) ()
      hashLen16(hashLen16(v._1, w._1) + shiftMix(y) * k1 + z,
        hashLen16(v._2, w._2) + x)
    }
  }

  /** CityHash64WithSeed = HashLen16(CityHash64(s) - k2, seed)
    * (city.cpp:200-206; Digest::CityHash's optional-seed form). */
  def cityHash64WithSeed(s: Array[Byte], seed: Long): Long =
    hashLen16(cityHash64(s) - k2, seed)

  @inline private def weakAt(s: Array[Byte], off: Int,
      a: Long, b: Long): (Long, Long) =
    weak(fetch64(s, off), fetch64(s, off + 8), fetch64(s, off + 16),
      fetch64(s, off + 24), a, b)

  /** CityMurmur — the <128-byte 128-bit path (city.cpp:210-240). */
  private def cityMurmur(s: Array[Byte], off: Int, len: Int,
      seedLo: Long, seedHi: Long): (Long, Long) = {
    var a = seedLo
    var b = seedHi
    var c = 0L
    var d = 0L
    if (len <= 16) {
      c = b * k1 + hashLen0to16City(s, off, len)
      d = rot(a + (if (len >= 8) fetch64(s, off) else c), 32)
    } else {
      c = hashLen16(fetch64(s, off + len - 8) + k1, a)
      d = hashLen16(b + len, c + fetch64(s, off + len - 16))
      a += d
      var p = off
      var rem = len - 16
      while (rem > 0) {
        a ^= shiftMix(fetch64(s, p) * k1) * k1
        a *= k1
        b ^= a
        c ^= shiftMix(fetch64(s, p + 8) * k1) * k1
        c *= k1
        d ^= c
        p += 16
        rem -= 16
      }
    }
    a = hashLen16(a, c)
    b = hashLen16(d, b)
    (a ^ b, hashLen16(b, a))
  }

  // HashLen0to16 over an offset window (shared by CityMurmur)
  private def hashLen0to16City(s: Array[Byte], off: Int, len: Int): Long = {
    if (len > 8) {
      val a = fetch64(s, off)
      val b = fetch64(s, off + len - 8)
      hashLen16(a, java.lang.Long.rotateRight(b + len, len)) ^ b
    } else if (len >= 4) {
      val a = fetch32(s, off)
      hashLen16(len + (a << 3), fetch32(s, off + len - 4))
    } else if (len > 0) {
      val a = s(off) & 0xffL
      val b = s(off + (len >> 1)) & 0xffL
      val c = s(off + len - 1) & 0xffL
      val y = (a + (b << 8)) & 0xffffffffL
      val z = (len + (c << 2)) & 0xffffffffL
      shiftMix(y * k2 ^ z * k3) * k2
    } else k2
  }

  /** CityHash128WithSeed (city.cpp:242-293). */
  def cityHash128WithSeed(s: Array[Byte], off0: Int, len0: Int,
      seedLo: Long, seedHi: Long): (Long, Long) = {
    if (len0 < 128) return cityMurmur(s, off0, len0, seedLo, seedHi)
    var x = seedLo
    var y = seedHi
    var z = len0.toLong * k1
    var vf = rot(y ^ k1, 49) * k1 + fetch64(s, off0)
    var vs = rot(vf, 42) * k1 + fetch64(s, off0 + 8)
    var wf = rot(y + z, 35) * k1 + x
    var ws = rot(x + fetch64(s, off0 + 88), 53) * k1
    var off = off0
    var len = len0
    while (len >= 128) {
      var i = 0
      while (i < 2) {
        x = rot(x + y + vf + fetch64(s, off + 16), 37) * k1
        y = rot(y + vs + fetch64(s, off + 48), 42) * k1
        x ^= ws
        y ^= vf
        z = rot(z ^ wf, 33)
        val v = weakAt(s, off, vs * k1, x + wf)
        val w = weakAt(s, off + 32, z + ws, y)
        vf = v._1; vs = v._2; wf = w._1; ws = w._2
        val t = z; z = x; x = t
        off += 64
        i += 1
      }
      len -= 128
    }
    y += rot(wf, 37) * k0 + z
    x += rot(vf + z, 49) * k0
    var tailDone = 0
    while (tailDone < len) {
      tailDone += 32
      y = rot(y - x, 42) * k0 + vs
      wf += fetch64(s, off + len - tailDone + 16)
      x = rot(x, 49) * k0 + wf
      wf += vf
      val v = weakAt(s, off + len - tailDone, vf, vs)
      vf = v._1; vs = v._2
    }
    x = hashLen16(x, vf)
    y = hashLen16(y, wf)
    (hashLen16(x + vs, ws) + y, hashLen16(x + ws, y + vs))
  }

  /** CityHash128 (city.cpp:295-310); also farmhash's Fingerprint128
    * (farmhash_iface.cc binds it to the cc/City 128-bit path). */
  def cityHash128(s: Array[Byte]): (Long, Long) = {
    val len = s.length
    if (len >= 16)
      cityHash128WithSeed(s, 16, len - 16, fetch64(s, 0) ^ k3, fetch64(s, 8))
    else if (len >= 8)
      cityHash128WithSeed(Array.emptyByteArray, 0, 0,
        fetch64(s, 0) ^ (len.toLong * k0), fetch64(s, len - 8) ^ k1)
    else
      cityHash128WithSeed(s, 0, len, k0, k1)
  }

  /** util/digest/numeric.h IntHashImpl(ui64) — Wang's 64-bit mix. */
  def intHash64(key0: Long): Long = {
    var key = key0
    key += ~(key << 32)
    key ^= (key >>> 22)
    key += ~(key << 13)
    key ^= (key >>> 8)
    key += (key << 3)
    key ^= (key >>> 15)
    key += ~(key << 27)
    key ^= (key >>> 31)
    key
  }

  private val shardHash: Long =
    cityHash64("shard".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** bigb_hash's fallback: MultiHash(TStringBuf("shard"), uid). */
  def bigbFallback(uid: UTF8String): Long =
    intHash64(cityHash64(uid.getBytes)) ^ shardHash
}

/** `farm_hash(args...)` — uint64 raw bits out, never null. */
case class FarmHashExpr(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.map(_.dataType).find {
      case LongType | IntegerType | ShortType | ByteType | StringType |
           DoubleType | FloatType | BooleanType | NullType => false
      case _ => true
    }
    bad match {
      case Some(t) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"farm_hash: cannot hash values of type $t")
      case None => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  private def fpOf(e: Expression, v: Any): Long =
    if (v == null) FarmHash.NULL_FP
    else e.dataType match {
      case StringType => FarmHash.fpUtf8(v.asInstanceOf[UTF8String])
      case DoubleType => FarmHash.fpDouble(v.asInstanceOf[Double])
      case FloatType => FarmHash.fpDouble(v.asInstanceOf[Float].toDouble)
      case BooleanType => FarmHash.fpBool(v.asInstanceOf[Boolean])
      case LongType => FarmHash.fpU64(v.asInstanceOf[Long])
      case IntegerType => FarmHash.fpU64(v.asInstanceOf[Int].toLong)
      case ShortType => FarmHash.fpU64(v.asInstanceOf[Short].toLong)
      case ByteType => FarmHash.fpU64(v.asInstanceOf[Byte].toLong)
      case NullType => FarmHash.NULL_FP
      case t => throw new IllegalArgumentException(s"farm_hash: $t")
    }

  override def eval(input: InternalRow): Any = {
    var r = 0xdeadc0deL
    children.foreach(c => r = FarmHash.mix(r, fpOf(c, c.eval(input))))
    r ^ children.length
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val r = ctx.freshName("fh")
    val parts = children.map { c =>
      val g = c.genCode(ctx)
      val call = c.dataType match {
        case StringType => s"graft.functions.FarmHash.fpUtf8(${g.value})"
        case DoubleType => s"graft.functions.FarmHash.fpDouble(${g.value})"
        case FloatType => s"graft.functions.FarmHash.fpDouble((double) ${g.value})"
        case BooleanType => s"graft.functions.FarmHash.fpBool(${g.value})"
        case NullType => "graft.functions.FarmHash.NULL_FP()"
        case _ => s"graft.functions.FarmHash.fpU64((long) ${g.value})"
      }
      s"""
        ${g.code}
        $r = graft.functions.FarmHash.mix($r,
          ${g.isNull} ? graft.functions.FarmHash.NULL_FP() : $call);"""
    }.mkString("\n")
    ev.copy(
      code = code"""
        long $r = 3735929054L;
        $parts
        long ${ev.value} = $r ^ ${children.length}L;""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `simple_hash(args...)` — the FarmHash/Murmur row-hash hybrid. */
case class SimpleHashExpr(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.map(_.dataType).find {
      case LongType | IntegerType | ShortType | ByteType | StringType |
           BooleanType | NullType => false
      case _ => true // doubles and composites are unhashable in the reference
    }
    bad match {
      case Some(t) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"Cannot hash values of type $t")
      case None => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: InternalRow): Any = {
    var r = children.length.toLong
    children.foreach { c =>
      val v = c.eval(input)
      r =
        if (v == null) FarmHash.simpleNull(r)
        else c.dataType match {
          case StringType => FarmHash.simpleString(v.asInstanceOf[UTF8String], r)
          case BooleanType => FarmHash.simpleBool(v.asInstanceOf[Boolean], r)
          case LongType => FarmHash.simpleLong(v.asInstanceOf[Long], r)
          case IntegerType => FarmHash.simpleLong(v.asInstanceOf[Int].toLong, r)
          case ShortType => FarmHash.simpleLong(v.asInstanceOf[Short].toLong, r)
          case ByteType => FarmHash.simpleLong(v.asInstanceOf[Byte].toLong, r)
          case NullType => FarmHash.simpleNull(r)
          case t => throw new IllegalArgumentException(s"Cannot hash values of type $t")
        }
    }
    r
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val r = ctx.freshName("sh")
    val parts = children.map { c =>
      val g = c.genCode(ctx)
      val call = c.dataType match {
        case StringType => s"graft.functions.FarmHash.simpleString(${g.value}, $r)"
        case BooleanType => s"graft.functions.FarmHash.simpleBool(${g.value}, $r)"
        case NullType => s"graft.functions.FarmHash.simpleNull($r)"
        case _ => s"graft.functions.FarmHash.simpleLong((long) ${g.value}, $r)"
      }
      s"""
        ${g.code}
        $r = ${g.isNull} ? graft.functions.FarmHash.simpleNull($r) : $call;"""
    }.mkString("\n")
    ev.copy(
      code = code"""
        long $r = ${children.length}L;
        $parts
        long ${ev.value} = $r;""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object FarmHashExpr {
  def apply(cols: Column*): Column =
    S.column(new FarmHashExpr(cols.map(S.expression)))
}

/** bigb_hash's non-uid fallback, bit-exact (see [[CityHash]]). */
case class BigbFallbackExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    CityHash.bigbFallback(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CityHash.bigbFallback($c)")
  override protected def withNewChildInternal(c: Expression): BigbFallbackExpr =
    copy(child = c)
}

object BigbFallbackExpr {
  def apply(c: Column): Column = S.column(BigbFallbackExpr(S.expression(c)))
}

object SimpleHashExpr {
  def apply(cols: Column*): Column =
    S.column(new SimpleHashExpr(cols.map(S.expression)))
}
