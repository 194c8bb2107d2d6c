package graft.functions

/** XXH3 64/128-bit, unseeded, default secret — the exact variant the
  * reference binds for `Digest::XXH3` / `Digest::XXH3_128`
  * (digest_udf.cpp:395-430 over contrib/libs/xxhash, Yann Collet's
  * BSD-licensed published algorithm). Bit-exact scalar
  * reimplementation: short paths (0-16), mid (17-128), midsize
  * (129-240), and the striped long-input loop with scramble.
  */
object Xxh3 {

  private val P64_1 = 0x9E3779B185EBCA87L
  private val P64_2 = 0xC2B2AE3D27D4EB4FL
  private val P64_3 = 0x165667B19E3779F9L
  private val P64_4 = 0x85EBCA77C2B2AE63L
  private val P64_5 = 0x27D4EB2F165667C5L
  private val P32_1 = 0x9E3779B1L
  private val P32_2 = 0x85EBCA77L
  private val P32_3 = 0xC2B2AE3DL
  private val MX1 = 0x165667919E3779F9L
  private val MX2 = 0x9FB21C651E98DF25L

  /** XXH3_kSecret — the published 192-byte default secret. */
  private val Secret: Array[Byte] = Array(
    0xb8, 0xfe, 0x6c, 0x39, 0x23, 0xa4, 0x4b, 0xbe, 0x7c, 0x01, 0x81, 0x2c,
    0xf7, 0x21, 0xad, 0x1c, 0xde, 0xd4, 0x6d, 0xe9, 0x83, 0x90, 0x97, 0xdb,
    0x72, 0x40, 0xa4, 0xa4, 0xb7, 0xb3, 0x67, 0x1f, 0xcb, 0x79, 0xe6, 0x4e,
    0xcc, 0xc0, 0xe5, 0x78, 0x82, 0x5a, 0xd0, 0x7d, 0xcc, 0xff, 0x72, 0x21,
    0xb8, 0x08, 0x46, 0x74, 0xf7, 0x43, 0x24, 0x8e, 0xe0, 0x35, 0x90, 0xe6,
    0x81, 0x3a, 0x26, 0x4c, 0x3c, 0x28, 0x52, 0xbb, 0x91, 0xc3, 0x00, 0xcb,
    0x88, 0xd0, 0x65, 0x8b, 0x1b, 0x53, 0x2e, 0xa3, 0x71, 0x64, 0x48, 0x97,
    0xa2, 0x0d, 0xf9, 0x4e, 0x38, 0x19, 0xef, 0x46, 0xa9, 0xde, 0xac, 0xd8,
    0xa8, 0xfa, 0x76, 0x3f, 0xe3, 0x9c, 0x34, 0x3f, 0xf9, 0xdc, 0xbb, 0xc7,
    0xc7, 0x0b, 0x4f, 0x1d, 0x8a, 0x51, 0xe0, 0x4b, 0xcd, 0xb4, 0x59, 0x31,
    0xc8, 0x9f, 0x7e, 0xc9, 0xd9, 0x78, 0x73, 0x64, 0xea, 0xc5, 0xac, 0x83,
    0x34, 0xd3, 0xeb, 0xc3, 0xc5, 0x81, 0xa0, 0xff, 0xfa, 0x13, 0x63, 0xeb,
    0x17, 0x0d, 0xdd, 0x51, 0xb7, 0xf0, 0xda, 0x49, 0xd3, 0x16, 0x55, 0x26,
    0x29, 0xd4, 0x68, 0x9e, 0x2b, 0x16, 0xbe, 0x58, 0x7d, 0x47, 0xa1, 0xfc,
    0x8f, 0xf8, 0xb8, 0xd1, 0x7a, 0xd0, 0x31, 0xce, 0x45, 0xcb, 0x3a, 0x8f,
    0x95, 0x16, 0x04, 0x28, 0xaf, 0xd7, 0xfb, 0xca, 0xbb, 0x4b, 0x40, 0x7e
  ).map(_.toByte)

  @inline private def le64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)
  @inline private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24))
  @inline private def swap32(x: Long): Long =
    Integer.reverseBytes(x.toInt).toLong & 0xffffffffL
  @inline private def swap64(x: Long): Long = java.lang.Long.reverseBytes(x)
  @inline private def rotl32(x: Long, r: Int): Long = {
    val i = x.toInt
    (Integer.rotateLeft(i, r)).toLong & 0xffffffffL
  }
  @inline private def mulHighU(a: Long, b: Long): Long =
    java.lang.Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)
  @inline private def mul128fold64(a: Long, b: Long): Long =
    (a * b) ^ mulHighU(a, b)
  @inline private def xorShift(v: Long, s: Int): Long = v ^ (v >>> s)

  @inline private def avalanche(h0: Long): Long = {
    var h = xorShift(h0, 37)
    h *= MX1
    xorShift(h, 32)
  }
  @inline private def avalanche64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P64_2
    h ^= h >>> 29; h *= P64_3
    h ^= h >>> 32
    h
  }
  @inline private def rrmxmx(h0: Long, len: Long): Long = {
    var h = h0
    h ^= java.lang.Long.rotateLeft(h, 49) ^ java.lang.Long.rotateLeft(h, 24)
    h *= MX2
    h ^= (h >>> 35) + len
    h *= MX2
    xorShift(h, 28)
  }

  @inline private def mix16B(in: Array[Byte], iOff: Int, sOff: Int): Long =
    mul128fold64(
      le64(in, iOff) ^ le64(Secret, sOff),
      le64(in, iOff + 8) ^ le64(Secret, sOff + 8))

  // ——— 64-bit ———

  private def len0to16_64(in: Array[Byte]): Long = {
    val len = in.length
    if (len > 8) {
      val bf1 = le64(Secret, 24) ^ le64(Secret, 32)
      val bf2 = le64(Secret, 40) ^ le64(Secret, 48)
      val lo = le64(in, 0) ^ bf1
      val hi = le64(in, len - 8) ^ bf2
      avalanche(len + swap64(lo) + hi + mul128fold64(lo, hi))
    } else if (len >= 4) {
      val i1 = le32(in, 0)
      val i2 = le32(in, len - 4)
      val bf = le64(Secret, 8) ^ le64(Secret, 16)
      rrmxmx((i2 + (i1 << 32)) ^ bf, len)
    } else if (len > 0) {
      val c1 = in(0) & 0xffL
      val c2 = in(len >> 1) & 0xffL
      val c3 = in(len - 1) & 0xffL
      val comb = (c1 << 16) | (c2 << 24) | c3 | (len.toLong << 8)
      val bf = le32(Secret, 0) ^ le32(Secret, 4)
      avalanche64(comb ^ bf)
    } else avalanche64(le64(Secret, 56) ^ le64(Secret, 64))
  }

  private def len17to128_64(in: Array[Byte]): Long = {
    val len = in.length
    var acc = len * P64_1
    if (len > 32) {
      if (len > 64) {
        if (len > 96) {
          acc += mix16B(in, 48, 96)
          acc += mix16B(in, len - 64, 112)
        }
        acc += mix16B(in, 32, 64)
        acc += mix16B(in, len - 48, 80)
      }
      acc += mix16B(in, 16, 32)
      acc += mix16B(in, len - 32, 48)
    }
    acc += mix16B(in, 0, 0)
    acc += mix16B(in, len - 16, 16)
    avalanche(acc)
  }

  private val MidStart = 3 // XXH3_MIDSIZE_STARTOFFSET
  private val MidLast = 17 // XXH3_MIDSIZE_LASTOFFSET
  private val SecretMin = 136 // XXH3_SECRET_SIZE_MIN

  private def len129to240_64(in: Array[Byte]): Long = {
    val len = in.length
    var acc = len * P64_1
    var i = 0
    while (i < 8) { acc += mix16B(in, 16 * i, 16 * i); i += 1 }
    var accEnd = mix16B(in, len - 16, SecretMin - MidLast)
    acc = avalanche(acc)
    val nbRounds = len / 16
    i = 8
    while (i < nbRounds) {
      accEnd += mix16B(in, 16 * i, 16 * (i - 8) + MidStart)
      i += 1
    }
    avalanche(acc + accEnd)
  }

  // long-input accumulator machinery (shared 64/128)
  private def hashLongAcc(in: Array[Byte]): Array[Long] = {
    val acc = Array(P32_3, P64_1, P64_2, P64_3, P64_4, P32_2, P64_5, P32_1)
    val len = in.length
    val stripesPerBlock = (Secret.length - 64) / 8 // 16
    val blockLen = 64 * stripesPerBlock
    val nbBlocks = (len - 1) / blockLen

    def acc512(inOff: Int, sOff: Int): Unit = {
      var lane = 0
      while (lane < 8) {
        val dv = le64(in, inOff + lane * 8)
        val dk = dv ^ le64(Secret, sOff + lane * 8)
        acc(lane ^ 1) += dv
        acc(lane) += (dk & 0xffffffffL) * (dk >>> 32)
        lane += 1
      }
    }
    def scramble(): Unit = {
      var lane = 0
      val sOff = Secret.length - 64
      while (lane < 8) {
        var a = xorShift(acc(lane), 47)
        a ^= le64(Secret, sOff + lane * 8)
        a *= P32_1
        acc(lane) = a
        lane += 1
      }
    }
    var n = 0
    while (n < nbBlocks) {
      var s = 0
      while (s < stripesPerBlock) { acc512(n * blockLen + s * 64, s * 8); s += 1 }
      scramble()
      n += 1
    }
    val nbStripes = ((len - 1) - blockLen * nbBlocks) / 64
    var s = 0
    while (s < nbStripes) { acc512(nbBlocks * blockLen + s * 64, s * 8); s += 1 }
    // last stripe, offset secret (LASTACC_START = 7)
    acc512(len - 64, Secret.length - 64 - 7)
    acc
  }

  private def mergeAccs(acc: Array[Long], sOff: Int, start: Long): Long = {
    var r = start
    var i = 0
    while (i < 4) {
      r += mul128fold64(
        acc(2 * i) ^ le64(Secret, sOff + 16 * i),
        acc(2 * i + 1) ^ le64(Secret, sOff + 16 * i + 8))
      i += 1
    }
    avalanche(r)
  }

  /** XXH3_64bits(data) — unseeded, default secret. */
  def hash64(in: Array[Byte]): Long = {
    val len = in.length
    if (len <= 16) len0to16_64(in)
    else if (len <= 128) len17to128_64(in)
    else if (len <= 240) len129to240_64(in)
    else mergeAccs(hashLongAcc(in), 11, len * P64_1)
  }

  // ——— 128-bit ———

  private def len0to16_128(in: Array[Byte]): (Long, Long) = {
    val len = in.length
    if (len > 8) {
      val bfl = le64(Secret, 32) ^ le64(Secret, 40)
      val bfh = le64(Secret, 48) ^ le64(Secret, 56)
      val lo = le64(in, 0)
      var hi = le64(in, len - 8)
      var mLo = (lo ^ hi ^ bfl) * P64_1
      var mHi = mulHighU(lo ^ hi ^ bfl, P64_1)
      mLo += (len - 1).toLong << 54
      hi ^= bfh
      mHi += hi + (hi & 0xffffffffL) * (P32_2 - 1)
      mLo ^= swap64(mHi)
      val hLo = mLo * P64_2
      var hHi = mulHighU(mLo, P64_2)
      hHi += mHi * P64_2
      (avalanche(hLo), avalanche(hHi))
    } else if (len >= 4) {
      val iLo = le32(in, 0)
      val iHi = le32(in, len - 4)
      val i64 = iLo + (iHi << 32)
      val bf = le64(Secret, 16) ^ le64(Secret, 24)
      val keyed = i64 ^ bf
      val mul = P64_1 + (len.toLong << 2)
      var mLo = keyed * mul
      var mHi = mulHighU(keyed, mul)
      mHi += mLo << 1
      mLo ^= mHi >>> 3
      mLo = xorShift(mLo, 35)
      mLo *= MX2
      mLo = xorShift(mLo, 28)
      (mLo, avalanche(mHi))
    } else if (len > 0) {
      val c1 = in(0) & 0xffL
      val c2 = in(len >> 1) & 0xffL
      val c3 = in(len - 1) & 0xffL
      val combL = (c1 << 16) | (c2 << 24) | c3 | (len.toLong << 8)
      val combH = rotl32(swap32(combL), 13)
      val bfl = le32(Secret, 0) ^ le32(Secret, 4)
      val bfh = le32(Secret, 8) ^ le32(Secret, 12)
      (avalanche64(combL ^ bfl), avalanche64(combH ^ bfh))
    } else
      (avalanche64(le64(Secret, 64) ^ le64(Secret, 72)),
        avalanche64(le64(Secret, 80) ^ le64(Secret, 88)))
  }

  @inline private def mix32B(accLo: Long, accHi: Long, in: Array[Byte],
      i1: Int, i2: Int, sOff: Int): (Long, Long) = {
    var lo = accLo + mix16B(in, i1, sOff)
    lo ^= le64(in, i2) + le64(in, i2 + 8)
    var hi = accHi + mix16B(in, i2, sOff + 16)
    hi ^= le64(in, i1) + le64(in, i1 + 8)
    (lo, hi)
  }

  private def finalize128Mid(accLo: Long, accHi: Long, len: Int)
      : (Long, Long) = {
    val lo = avalanche(accLo + accHi)
    val hi = 0L - avalanche(
      accLo * P64_1 + accHi * P64_4 + len.toLong * P64_2)
    (lo, hi)
  }

  private def len17to128_128(in: Array[Byte]): (Long, Long) = {
    val len = in.length
    var lo = len * P64_1
    var hi = 0L
    if (len > 32) {
      if (len > 64) {
        if (len > 96) {
          val r = mix32B(lo, hi, in, 48, len - 64, 96); lo = r._1; hi = r._2
        }
        val r = mix32B(lo, hi, in, 32, len - 48, 64); lo = r._1; hi = r._2
      }
      val r = mix32B(lo, hi, in, 16, len - 32, 32); lo = r._1; hi = r._2
    }
    val r = mix32B(lo, hi, in, 0, len - 16, 0); lo = r._1; hi = r._2
    finalize128Mid(lo, hi, len)
  }

  private def len129to240_128(in: Array[Byte]): (Long, Long) = {
    val len = in.length
    var lo = len * P64_1
    var hi = 0L
    var i = 32
    while (i < 160) {
      val r = mix32B(lo, hi, in, i - 32, i - 16, i - 32)
      lo = r._1; hi = r._2
      i += 32
    }
    lo = avalanche(lo)
    hi = avalanche(hi)
    i = 160
    while (i <= len) {
      val r = mix32B(lo, hi, in, i - 32, i - 16, MidStart + i - 160)
      lo = r._1; hi = r._2
      i += 32
    }
    // last bytes: swapped inputs, negated-seed secret slot (seed = 0)
    val r = mix32B(lo, hi, in, len - 16, len - 32,
      SecretMin - MidLast - 16)
    finalize128Mid(r._1, r._2, len)
  }

  /** XXH3_128bits(data) → (low64, high64). */
  def hash128(in: Array[Byte]): (Long, Long) = {
    val len = in.length
    if (len <= 16) len0to16_128(in)
    else if (len <= 128) len17to128_128(in)
    else if (len <= 240) len129to240_128(in)
    else {
      val acc = hashLongAcc(in)
      val lo = mergeAccs(acc, 11, len * P64_1)
      val hi = mergeAccs(acc, Secret.length - 64 - 11, ~(len * P64_2))
      (lo, hi)
    }
  }
}
