package graft.functions

/** HighwayHash-64 (Google, Apache-2.0 published algorithm) — the
  * keyed hash `Digest::HighwayHash(k0,k1,k2,k3, data)` binds
  * (digest_udf.cpp:273-284 over contrib/libs/highwayhash). Bit-exact
  * port of the PORTABLE target (hh_portable.h) — all targets of the
  * reference library produce identical results by contract. Includes
  * the length-padding quirks that are part of the definition: the
  * sign-extending unordered 0..3-byte load and the read-before tail
  * load for 16..31-byte remainders.
  */
object HighwayHash {

  private val Init0 = Array(0xdbe6d5d5fe4cce2fL, 0xa4093822299f31d0L,
    0x13198a2e03707344L, 0x243f6a8885a308d3L)
  private val Init1 = Array(0x3bd39e10cb0ef593L, 0xc0acf169b5f18a8cL,
    0xbe5466cf34e90c6cL, 0x452821e638d01377L)

  @inline private def rot32(x: Long): Long = (x >>> 32) | (x << 32)
  @inline private def mask(v: Long, bytes: Int): Long =
    v & (0xffL << (bytes * 8))

  final private class State(k0: Long, k1: Long, k2: Long, k3: Long) {
    val v0 = new Array[Long](4)
    val v1 = new Array[Long](4)
    val mul0 = Init0.clone()
    val mul1 = Init1.clone()
    locally {
      val keys = Array(k0, k1, k2, k3)
      var i = 0
      while (i < 4) {
        v0(i) = Init0(i) ^ keys(i)
        v1(i) = Init1(i) ^ rot32(keys(i))
        i += 1
      }
    }

    private def zipperMergeAndAdd(z1: Long, z0: Long, a1: Int, a0: Int,
        into: Array[Long]): Unit = {
      into(a0) += ((mask(z0, 3) + mask(z1, 4)) >>> 24) +
        ((mask(z0, 5) + mask(z1, 6)) >>> 16) + mask(z0, 2) +
        (mask(z0, 1) << 32) + (mask(z1, 7) >>> 8) + (z0 << 56)
      into(a1) += ((mask(z1, 3) + mask(z0, 4)) >>> 24) + mask(z1, 2) +
        (mask(z1, 5) >>> 16) + (mask(z1, 1) << 24) + (mask(z0, 6) >>> 8) +
        (mask(z1, 0) << 48) + mask(z0, 7)
    }

    def update(p0: Long, p1: Long, p2: Long, p3: Long): Unit = {
      v1(0) += p0 + mul0(0)
      v1(1) += p1 + mul0(1)
      v1(2) += p2 + mul0(2)
      v1(3) += p3 + mul0(3)
      var lane = 0
      while (lane < 4) {
        mul0(lane) ^= (v1(lane) & 0xffffffffL) * (v0(lane) >>> 32)
        v0(lane) += mul1(lane)
        mul1(lane) ^= (v0(lane) & 0xffffffffL) * (v1(lane) >>> 32)
        lane += 1
      }
      zipperMergeAndAdd(v1(1), v1(0), 1, 0, v0)
      zipperMergeAndAdd(v1(3), v1(2), 3, 2, v0)
      zipperMergeAndAdd(v0(1), v0(0), 1, 0, v1)
      zipperMergeAndAdd(v0(3), v0(2), 3, 2, v1)
    }

    def permuteAndUpdate(): Unit =
      update(rot32(v0(2)), rot32(v0(3)), rot32(v0(0)), rot32(v0(1)))

    /** Rotate each 32-bit half of every v1 lane left by `count`. */
    def rotateV1HalvesBy(count: Int): Unit = {
      var i = 0
      while (i < 4) {
        val lo = (v1(i) & 0xffffffffL).toInt
        val hi = (v1(i) >>> 32).toInt
        val rlo = Integer.rotateLeft(lo, count).toLong & 0xffffffffL
        val rhi = Integer.rotateLeft(hi, count).toLong & 0xffffffffL
        v1(i) = (rhi << 32) | rlo
        i += 1
      }
    }
  }

  @inline private def le64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  def hash64(k0: Long, k1: Long, k2: Long, k3: Long,
      data: Array[Byte]): Long = {
    val st = new State(k0, k1, k2, k3)
    val size = data.length
    val truncated = size & ~31
    var off = 0
    while (off < truncated) {
      st.update(le64(data, off), le64(data, off + 8),
        le64(data, off + 16), le64(data, off + 24))
      off += 32
    }
    val rem = size - truncated
    if (rem != 0) {
      // length padding (part of the definition)
      val mod32pair = (rem.toLong << 32) + rem
      var i = 0
      while (i < 4) { st.v0(i) += mod32pair; i += 1 }
      st.rotateV1HalvesBy(rem)

      val packet = new Array[Byte](32)
      val mod4 = rem & 3
      val aligned = rem & ~3
      System.arraycopy(data, truncated, packet, 0, aligned)
      if ((rem & 16) != 0) {
        // read-before tail: 4 LE bytes ending at the remainder's end
        val at = truncated + aligned + mod4 - 4
        packet(28) = data(at)
        packet(29) = data(at + 1)
        packet(30) = data(at + 2)
        packet(31) = data(at + 3)
      } else {
        // unordered 0..3-byte load with SIGN-EXTENDING adds (load3.h
        // AllowUnordered: the quirk is part of the padding definition)
        var last3 = 0L
        if (mod4 > 0) {
          val base = truncated + aligned
          last3 = data(base).toLong +
            (data(base + (mod4 >> 1)).toLong << 8) +
            (data(base + mod4 - 1).toLong << 16)
        }
        var j = 0
        while (j < 8) {
          packet(16 + j) = ((last3 >>> (8 * j)) & 0xff).toByte
          j += 1
        }
      }
      st.update(le64(packet, 0), le64(packet, 8),
        le64(packet, 16), le64(packet, 24))
    }
    st.permuteAndUpdate()
    st.permuteAndUpdate()
    st.permuteAndUpdate()
    st.permuteAndUpdate()
    st.v0(0) + st.v1(0) + st.mul0(0) + st.mul1(0)
  }
}
