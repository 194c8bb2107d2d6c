package graft.functions

/** Argon2d v1.3 (RFC 9106), single-lane — exactly the configuration
  * the reference binds for `Digest::Argon2` (digest_udf.cpp:226-240:
  * Argon2d, tcost=1, mcost=32 KiB, threads=1, 32-byte tag), built on
  * the RFC 7693 BLAKE2b in DigestOps. Pinned against the reference's
  * own GenKat vector (argonish/ut/ut.cpp Argon2d).
  */
object Argon2 {

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def b2(data: Array[Byte], outLen: Int): Array[Byte] =
    DigestOps.blake2b(data, Array.emptyByteArray, outLen)

  /** H' — the variable-length hash (RFC 9106 §3.3). */
  private def hPrime(outLen: Int, input: Array[Byte]): Array[Byte] = {
    val seeded = le32(outLen) ++ input
    if (outLen <= 64) return b2(seeded, outLen)
    val out = new Array[Byte](outLen)
    var v = b2(seeded, 64)
    System.arraycopy(v, 0, out, 0, 32)
    var written = 32
    while (outLen - written > 64) {
      v = b2(v, 64)
      System.arraycopy(v, 0, out, written, 32)
      written += 32
    }
    val last = b2(v, outLen - written)
    System.arraycopy(last, 0, out, written, last.length)
    out
  }

  @inline private def fBlaMka(a: Long, b: Long): Long =
    a + b + 2L * (a & 0xffffffffL) * (b & 0xffffffffL)

  /** The blamka permutation P over 16 words at the given indices. */
  private def permute(v: Array[Long], idx: Array[Int]): Unit = {
    @inline def gb(ai: Int, bi: Int, ci: Int, di: Int): Unit = {
      var a = v(idx(ai)); var b = v(idx(bi))
      var c = v(idx(ci)); var d = v(idx(di))
      a = fBlaMka(a, b); d = java.lang.Long.rotateRight(d ^ a, 32)
      c = fBlaMka(c, d); b = java.lang.Long.rotateRight(b ^ c, 24)
      a = fBlaMka(a, b); d = java.lang.Long.rotateRight(d ^ a, 16)
      c = fBlaMka(c, d); b = java.lang.Long.rotateRight(b ^ c, 63)
      v(idx(ai)) = a; v(idx(bi)) = b; v(idx(ci)) = c; v(idx(di)) = d
    }
    gb(0, 4, 8, 12); gb(1, 5, 9, 13); gb(2, 6, 10, 14); gb(3, 7, 11, 15)
    gb(0, 5, 10, 15); gb(1, 6, 11, 12); gb(2, 7, 8, 13); gb(3, 4, 9, 14)
  }

  /** G(X, Y) — the Argon2 compression (RFC 9106 §3.5). Blocks are
    * 128-word arrays; `out` may alias neither input. */
  private def compress(x: Array[Long], y: Array[Long],
      out: Array[Long], xorInto: Boolean): Unit = {
    val r = new Array[Long](128)
    var i = 0
    while (i < 128) { r(i) = x(i) ^ y(i); i += 1 }
    val q = r.clone()
    // rowwise
    var row = 0
    while (row < 8) {
      permute(q, Array.tabulate(16)(k => row * 16 + k))
      row += 1
    }
    // columnwise over word-pairs
    var col = 0
    while (col < 8) {
      permute(q, Array.tabulate(16)(k =>
        2 * col + (k / 2) * 16 + (k % 2)))
      col += 1
    }
    i = 0
    if (xorInto) while (i < 128) { out(i) ^= q(i) ^ r(i); i += 1 }
    else while (i < 128) { out(i) = q(i) ^ r(i); i += 1 }
  }

  private def blockToBytes(b: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](1024)
    var i = 0
    while (i < 128) {
      var j = 0
      while (j < 8) {
        out(i * 8 + j) = ((b(i) >>> (8 * j)) & 0xff).toByte
        j += 1
      }
      i += 1
    }
    out
  }
  private def bytesToBlock(bs: Array[Byte]): Array[Long] = {
    val b = new Array[Long](128)
    var i = 0
    while (i < 128) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (bs(i * 8 + j) & 0xffL); j -= 1 }
      b(i) = w
      i += 1
    }
    b
  }

  /** Argon2d, lanes=1 (the UDF's fixed shape). mcost = memory in KiB
    * = number of 1 KiB blocks (≥ 8). */
  def argon2d(pwd: Array[Byte], salt: Array[Byte], outLen: Int,
      tcost: Int, mcost: Int,
      secret: Array[Byte] = Array.emptyByteArray,
      aad: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    require(mcost >= 8, "Argon2: mcost must be >= 8 KiB")
    require(tcost >= 1, "Argon2: tcost must be >= 1")
    val lanes = 1
    val laneLen = mcost / (4 * lanes) * 4 // m' with p=1
    val segLen = laneLen / 4

    // H0 (RFC 9106 §3.2), version 0x13, type 0 = Argon2d
    val h0input =
      le32(lanes) ++ le32(outLen) ++ le32(mcost) ++ le32(tcost) ++
        le32(0x13) ++ le32(0) ++
        le32(pwd.length) ++ pwd ++
        le32(salt.length) ++ salt ++
        le32(secret.length) ++ secret ++
        le32(aad.length) ++ aad
    val h0 = b2(h0input, 64)

    val mem = new Array[Array[Long]](laneLen)
    mem(0) = bytesToBlock(hPrime(1024, h0 ++ le32(0) ++ le32(0)))
    mem(1) = bytesToBlock(hPrime(1024, h0 ++ le32(1) ++ le32(0)))
    var i = 2
    while (i < laneLen) { mem(i) = new Array[Long](128); i += 1 }

    var pass = 0
    while (pass < tcost) {
      var slice = 0
      while (slice < 4) {
        var idx = if (pass == 0 && slice == 0) 2 else 0
        while (idx < segLen) {
          val cur = slice * segLen + idx
          val prev = if (cur == 0) laneLen - 1 else cur - 1
          // Argon2d: J1/J2 from the previous block's first word
          val j1 = mem(prev)(0) & 0xffffffffL
          val refAreaSize =
            if (pass == 0) slice * segLen + idx - 1
            else laneLen - segLen + idx - 1
          val x = (j1 * j1) >>> 32
          val y = (refAreaSize * x) >>> 32
          val relPos = refAreaSize - 1 - y
          val startPos =
            if (pass == 0) 0 else ((slice + 1) % 4) * segLen
          val refIndex = ((startPos + relPos) % laneLen).toInt
          compress(mem(prev), mem(refIndex), mem(cur),
            xorInto = pass > 0)
          idx += 1
        }
        slice += 1
      }
      pass += 1
    }
    hPrime(outLen, blockToBytes(mem(laneLen - 1)))
  }
}
