package graft.functions

/** The Digest:: long tail (udfs/common/digest/digest_udf.cpp) —
  * bit-exact reimplementations of the PUBLIC algorithms the reference
  * binds: FNV-1 32/64 (util/digest/fnv.h), CRC32C (Castagnoli),
  * SuperFastHash (Paul Hsieh's public algorithm), SipHash-2-4
  * (Aumasson–Bernstein, keyed by the (low, high) arguments like
  * digest_udf.cpp:264), the Jenkins-style integer mixers behind
  * NumericHash (util/digest/numeric.h IntHashImpl) and IntHash64
  * (digest_udf.cpp:383 — the murmur3 finalizer over an XOR'd key),
  * and MD5 raw/half-mix forms (library/cpp/digest/md5:
  * EndHalfMix folds digest[i]^digest[i+8]).
  */
object DigestOps {

  /** FNV-1 (multiply THEN xor — fnv.h FnvHash32/64). */
  def fnv32(data: Array[Byte], init: Long = 2166136261L): Long = {
    var h = init.toInt
    var i = 0
    while (i < data.length) { h = h * 16777619 ^ (data(i) & 0xff); i += 1 }
    h.toLong & 0xffffffffL
  }

  def fnv64(data: Array[Byte], init: Long = -3750763034362895579L): Long = {
    var h = init // 14695981039346656037 as signed
    var i = 0
    while (i < data.length) { h = h * 1099511628211L ^ (data(i) & 0xff); i += 1 }
    h
  }

  private val crc32cTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0x82f63b78 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c; n += 1
    }
    t
  }

  /** CRC32C (Castagnoli polynomial, reflected). */
  def crc32c(data: Array[Byte]): Long = {
    var crc = 0xffffffff
    var i = 0
    while (i < data.length) {
      crc = crc32cTable((crc ^ data(i)) & 0xff) ^ (crc >>> 8)
      i += 1
    }
    (~crc).toLong & 0xffffffffL
  }

  /** SuperFastHash (Paul Hsieh, public domain reference algorithm). */
  def superFastHash(data: Array[Byte]): Long = {
    val len = data.length
    if (len == 0) return 0L
    def get16(i: Int): Int =
      (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8)
    var hash = len
    var i = 0
    var rem = len & 3
    var n = len >> 2
    while (n > 0) {
      hash += get16(i)
      val tmp = (get16(i + 2) << 11) ^ hash
      hash = (hash << 16) ^ tmp
      hash += hash >>> 11
      i += 4; n -= 1
    }
    rem match {
      case 3 =>
        hash += get16(i)
        hash ^= hash << 16
        hash ^= (data(i + 2).toInt) << 18
        hash += hash >>> 11
      case 2 =>
        hash += get16(i)
        hash ^= hash << 11
        hash += hash >>> 17
      case 1 =>
        hash += data(i).toInt
        hash ^= hash << 10
        hash += hash >>> 1
      case _ =>
    }
    hash ^= hash << 3
    hash += hash >>> 5
    hash ^= hash << 4
    hash += hash >>> 17
    hash ^= hash << 25
    hash += hash >>> 6
    hash.toLong & 0xffffffffL
  }

  /** SipHash-2-4 with key words (k0, k1) — digest_udf.cpp:264 seeds
    * the util TSipHash state with (low, high). */
  def sipHash(k0: Long, k1: Long, data: Array[Byte]): Long = {
    var v0 = k0 ^ 0x736f6d6570736575L
    var v1 = k1 ^ 0x646f72616e646f6dL
    var v2 = k0 ^ 0x6c7967656e657261L
    var v3 = k1 ^ 0x7465646279746573L
    def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))
    def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }
    val len = data.length
    val end = len - (len % 8)
    var i = 0
    while (i < end) {
      var m = 0L
      var j = 7
      while (j >= 0) { m = (m << 8) | (data(i + j) & 0xffL); j -= 1 }
      v3 ^= m; round(); round(); v0 ^= m
      i += 8
    }
    var b = (len.toLong & 0xff) << 56
    var j = len - end - 1
    while (j >= 0) { b |= (data(end + j) & 0xffL) << (8 * j); j -= 1 }
    v3 ^= b; round(); round(); v0 ^= b
    v2 ^= 0xff
    round(); round(); round(); round()
    v0 ^ v1 ^ v2 ^ v3
  }

  /** util/digest/numeric.h IntHashImpl(ui64) — NumericHash's mixer. */
  def numericHash64(key0: Long): Long = {
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

  /** digest_udf.cpp:383 IntHash64: murmur3 finalizer over key ^ C. */
  def intHash64(x0: Long): Long = {
    var x = x0
    x ^= 0x4cf2d2baae6da887L
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  private def md5Of(data: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(data)

  /** MD5 raw 16 bytes (digest_udf Md5Raw). */
  def md5Raw(data: Array[Byte]): Array[Byte] = md5Of(data)

  /** md5.cpp EndHalfMix: big-endian-ish fold of digest[i]^digest[i+8]. */
  def md5HalfMix(data: Array[Byte]): Long = {
    val d = md5Of(data)
    var res = 0L
    var i = 3
    while (i >= 0) {
      res |= ((d(i) ^ d(8 + i)) & 0xffL) << ((3 - i) << 3)
      res |= ((d(4 + i) ^ d(12 + i)) & 0xffL) << ((7 - i) << 3)
      i -= 1
    }
    res
  }

  @inline private def le64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)
  @inline private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)

  /** MurmurHash2 64-bit (util/digest/murmur.cpp MurmurHash64 —
    * Austin Appleby's public algorithm; default seed 0). */
  def murmur64(data: Array[Byte], seed: Long): Long = {
    val m = 0xc6a4a7935bd1e995L
    val len = data.length
    var h = seed ^ (len * m)
    var i = 0
    val blocks = len & ~7
    while (i < blocks) {
      var k = le64(data, i)
      k *= m
      k ^= k >>> 47
      k *= m
      h ^= k
      h *= m
      i += 8
    }
    val left = len - blocks
    if (left >= 7) h ^= (data(blocks + 6) & 0xffL) << 48
    if (left >= 6) h ^= (data(blocks + 5) & 0xffL) << 40
    if (left >= 5) h ^= (data(blocks + 4) & 0xffL) << 32
    if (left >= 4) h ^= (data(blocks + 3) & 0xffL) << 24
    if (left >= 3) h ^= (data(blocks + 2) & 0xffL) << 16
    if (left >= 2) h ^= (data(blocks + 1) & 0xffL) << 8
    if (left >= 1) { h ^= data(blocks) & 0xffL; h *= m }
    h ^= h >>> 47
    h *= m
    h ^= h >>> 47
    h
  }

  /** MurmurHash2 32-bit (murmur.cpp MurmurHash32). */
  def murmur32(data: Array[Byte], seed: Int): Long = {
    val m = 0x5bd1e995
    val len = data.length
    var h = seed ^ len
    var i = 0
    val blocks = len & ~3
    while (i < blocks) {
      var k = le32(data, i)
      k *= m
      k ^= k >>> 24
      k *= m
      h *= m
      h ^= k
      i += 4
    }
    val left = len - blocks
    if (left >= 3) h ^= (data(blocks + 2) & 0xff) << 16
    if (left >= 2) h ^= (data(blocks + 1) & 0xff) << 8
    if (left >= 1) { h ^= data(blocks) & 0xff; h *= m }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h.toLong & 0xffffffffL
  }

  /** MurmurHash2A 64-bit (library/cpp/digest/murmur — the incremental
    * variant's one-shot value: blocks, tail word, length word, then the
    * 47/47 avalanche). */
  def murmur2a64(data: Array[Byte], seed: Long): Long = {
    val m = 0xc6a4a7935bd1e995L
    @inline def mix(h0: Long, k0: Long): Long = {
      var k = k0
      k *= m
      k ^= k >>> 47
      k *= m
      (h0 * m) ^ k
    }
    var h = seed
    val len = data.length
    val blocks = len & ~7
    var i = 0
    while (i < blocks) { h = mix(h, le64(data, i)); i += 8 }
    var tail = 0L
    var c = 0
    while (i < len) { tail |= (data(i) & 0xffL) << (c * 8); i += 1; c += 1 }
    var hash = mix(mix(h, tail), len.toLong)
    hash ^= hash >>> 47
    hash *= m
    hash ^= hash >>> 47
    hash
  }

  /** MurmurHash2A 32-bit. */
  def murmur2a32(data: Array[Byte], seed: Int): Long = {
    val m = 0x5bd1e995
    @inline def mix(h0: Int, k0: Int): Int = {
      var k = k0
      k *= m
      k ^= k >>> 24
      k *= m
      (h0 * m) ^ k
    }
    var h = seed
    val len = data.length
    val blocks = len & ~3
    var i = 0
    while (i < blocks) { h = mix(h, le32(data, i)); i += 4 }
    var tail = 0
    var c = 0
    while (i < len) { tail |= (data(i) & 0xff) << (c * 8); i += 1; c += 1 }
    var hash = mix(mix(h, tail), len)
    hash ^= hash >>> 13
    hash *= m
    hash ^= hash >>> 15
    hash.toLong & 0xffffffffL
  }

  /** old_crc crc64 (Sewell Development Corporation variant the
    * reference's util vendors): MSB-first, poly 0xE543279765927881,
    * init all-ones, no final xor. */
  private val Crc64Poly = 0xE543279765927881L
  private val Crc64Tab: Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var crc = i.toLong << 56
      var j = 0
      while (j < 8) {
        crc = if (crc < 0) (crc << 1) ^ Crc64Poly else crc << 1
        j += 1
      }
      t(i) = crc
      i += 1
    }
    t
  }
  def crc64(data: Array[Byte], init: Long): Long = {
    var crc = init
    var i = 0
    while (i < data.length) {
      crc = Crc64Tab(((crc >>> 56) ^ (data(i) & 0xffL)).toInt) ^ (crc << 8)
      i += 1
    }
    crc
  }

  // ——— BLAKE2b (RFC 7693), 32-byte digest, optional key — the shape
  // digest_udf.cpp:241-262 binds (outSize fixed at 32) ———
  private val Blake2bIV = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)
  private val Blake2bSigma = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3))

  def blake2b(data: Array[Byte], key: Array[Byte], outLen: Int): Array[Byte] = {
    require(outLen >= 1 && outLen <= 64, "blake2b digest size 1..64")
    require(key.length <= 64, "blake2b key up to 64 bytes")
    val h = Blake2bIV.clone()
    h(0) ^= 0x01010000L ^ (key.length.toLong << 8) ^ outLen.toLong
    var tLo = 0L // 128-bit counter: low word only (inputs < 2^64 bytes)

    def compress(block: Array[Byte], off: Int, last: Boolean): Unit = {
      val v = new Array[Long](16)
      val m = new Array[Long](16)
      var i = 0
      while (i < 8) { v(i) = h(i); v(i + 8) = Blake2bIV(i); i += 1 }
      v(12) ^= tLo
      // v(13) ^= tHi — always 0 here
      if (last) v(14) = ~v(14)
      i = 0
      while (i < 16) { m(i) = le64(block, off + i * 8); i += 1 }
      @inline def g(r: Int, x: Int, a: Int, b: Int, c: Int, d: Int): Unit = {
        val s = Blake2bSigma(r)
        v(a) = v(a) + v(b) + m(s(2 * x))
        v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 32)
        v(c) = v(c) + v(d)
        v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 24)
        v(a) = v(a) + v(b) + m(s(2 * x + 1))
        v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 16)
        v(c) = v(c) + v(d)
        v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 63)
      }
      var r = 0
      while (r < 12) {
        g(r, 0, 0, 4, 8, 12); g(r, 1, 1, 5, 9, 13)
        g(r, 2, 2, 6, 10, 14); g(r, 3, 3, 7, 11, 15)
        g(r, 4, 0, 5, 10, 15); g(r, 5, 1, 6, 11, 12)
        g(r, 6, 2, 7, 8, 13); g(r, 7, 3, 4, 9, 14)
        r += 1
      }
      i = 0
      while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
    }

    val keyed = key.nonEmpty
    val total = (if (keyed) 128 else 0) + data.length
    val buf = new Array[Byte](128)
    if (keyed) {
      System.arraycopy(key, 0, buf, 0, key.length)
      tLo = 128
      // the key block is the last block ONLY when there is no data
      compress(buf, 0, last = data.length == 0)
      java.util.Arrays.fill(buf, 0.toByte)
    }
    var off = 0
    // full blocks except the last (the final block is always padded)
    while (data.length - off > 128) {
      System.arraycopy(data, off, buf, 0, 128)
      tLo += 128
      compress(buf, 0, last = false)
      off += 128
    }
    if (data.length > 0 || !keyed) {
      val rem = data.length - off
      java.util.Arrays.fill(buf, 0.toByte)
      if (rem > 0) System.arraycopy(data, off, buf, 0, rem)
      tLo = total.toLong
      compress(buf, 0, last = true)
    }
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = ((h(i / 8) >>> ((i % 8) * 8)) & 0xff).toByte
      i += 1
    }
    out
  }
}

/** One registry expression for the DigestOps functions: string/binary
  * payloads hash over their bytes, integer inputs feed the mixers. */
final case class DigestFnExpr(fn: String,
    children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
  extends org.apache.spark.sql.catalyst.expressions.Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = fn match {
    case "md5raw" | "blake2b" | "argon2" => BinaryType
    case "cityhash128" | "farmhashfingerprint128" | "xxh3_128" =>
      // the reference returns Tuple<ui64,ui64> — the engine's tuple
      // representation is the positional _1.._n struct
      StructType(Seq(StructField("_1", LongType, nullable = false),
        StructField("_2", LongType, nullable = false)))
    case _ => LongType
  }
  override def nullable: Boolean = true
  override def prettyName: String = s"digest_$fn"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val ok = fn match {
      case "numerichash" | "inthash64" =>
        children.length == 1 && (children.head.dataType match {
          case LongType | IntegerType | ShortType | ByteType => true
          case _ => false
        })
      case "cityhash" | "crc64" | "murmurhash" | "murmurhash32" |
           "murmurhash2a" | "murmurhash2a32" =>
        (children.length == 1 || children.length == 2) &&
          (children.head.dataType == StringType ||
            children.head.dataType == BinaryType) &&
          children.drop(1).forall(_.dataType match {
            case LongType | IntegerType | ShortType | ByteType => true
            case _ => false
          })
      case "blake2b" =>
        (children.length == 1 || children.length == 2) &&
          children.forall(c => c.dataType == StringType ||
            c.dataType == BinaryType)
      case "argon2" =>
        children.length == 2 &&
          children.forall(c => c.dataType == StringType ||
            c.dataType == BinaryType)
      case "highwayhash" => children.length == 5 &&
        children.take(4).forall(_.dataType match {
          case LongType | IntegerType | ShortType | ByteType => true
          case _ => false
        }) && (children(4).dataType == StringType ||
          children(4).dataType == BinaryType)
      case "xxh3" | "xxh3_128" =>
        children.length == 1 &&
          (children.head.dataType == StringType ||
            children.head.dataType == BinaryType)
      case "farmhashfingerprint" =>
        children.length == 1 && (children.head.dataType match {
          case LongType | IntegerType | ShortType | ByteType => true
          case _ => false
        })
      case "farmhashfingerprint64" =>
        children.length == 1 &&
          (children.head.dataType == StringType ||
            children.head.dataType == BinaryType)
      case "farmhashfingerprint2" =>
        children.length == 2 && children.forall(_.dataType match {
          case LongType | IntegerType | ShortType | ByteType => true
          case _ => false
        })
      case "siphash" => children.length == 3 &&
        children.take(2).forall(_.dataType.isInstanceOf[LongType.type]) &&
        (children(2).dataType == StringType ||
          children(2).dataType == BinaryType)
      case "fnv32" | "fnv64" =>
        (children.length == 1 || children.length == 2) &&
          (children.head.dataType == StringType ||
            children.head.dataType == BinaryType)
      case _ => children.length == 1 &&
        (children.head.dataType == StringType ||
          children.head.dataType == BinaryType)
    }
    if (ok) TypeCheckSuccess
    else TypeCheckFailure(s"Digest::$fn: unexpected argument types " +
      children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  private def bytesOf(v: Any): Array[Byte] = v match {
    case u: UTF8String => u.getBytes
    case b: Array[Byte] => b
  }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    fn match {
      case "crc32c" => DigestOps.crc32c(bytesOf(vs.head))
      case "superfasthash" => DigestOps.superFastHash(bytesOf(vs.head))
      case "fnv32" =>
        if (vs.length == 2)
          DigestOps.fnv32(bytesOf(vs.head), vs(1).asInstanceOf[Long])
        else DigestOps.fnv32(bytesOf(vs.head))
      case "fnv64" =>
        if (vs.length == 2)
          DigestOps.fnv64(bytesOf(vs.head), vs(1).asInstanceOf[Long])
        else DigestOps.fnv64(bytesOf(vs.head))
      case "siphash" => DigestOps.sipHash(vs(0).asInstanceOf[Long],
        vs(1).asInstanceOf[Long], bytesOf(vs(2)))
      case "numerichash" =>
        DigestOps.numericHash64(vs.head.asInstanceOf[Number].longValue())
      case "inthash64" =>
        DigestOps.intHash64(vs.head.asInstanceOf[Number].longValue())
      case "cityhash" =>
        if (vs.length == 2) CityHash.cityHash64WithSeed(bytesOf(vs.head),
          vs(1).asInstanceOf[Number].longValue())
        else CityHash.cityHash64(bytesOf(vs.head))
      case "cityhash128" =>
        val (lo, hi) = CityHash.cityHash128(bytesOf(vs.head))
        org.apache.spark.sql.catalyst.InternalRow(lo, hi)
      case "farmhashfingerprint" =>
        FarmHash.fpU64(vs.head.asInstanceOf[Number].longValue())
      case "farmhashfingerprint2" =>
        FarmHash.mix(vs(0).asInstanceOf[Number].longValue(),
          vs(1).asInstanceOf[Number].longValue())
      case "farmhashfingerprint32" =>
        FarmHash.fingerprint32(bytesOf(vs.head))
      case "farmhashfingerprint64" =>
        FarmHash.fingerprint64(bytesOf(vs.head))
      case "farmhashfingerprint128" =>
        val (lo, hi) = CityHash.cityHash128(bytesOf(vs.head))
        org.apache.spark.sql.catalyst.InternalRow(lo, hi)
      case "crc64" => DigestOps.crc64(bytesOf(vs.head),
        if (vs.length == 2) vs(1).asInstanceOf[Number].longValue()
        else -1L) // CRC64INIT = all-ones
      case "murmurhash" => DigestOps.murmur64(bytesOf(vs.head),
        if (vs.length == 2) vs(1).asInstanceOf[Number].longValue() else 0L)
      case "murmurhash32" => DigestOps.murmur32(bytesOf(vs.head),
        if (vs.length == 2) vs(1).asInstanceOf[Number].intValue() else 0)
      case "murmurhash2a" => DigestOps.murmur2a64(bytesOf(vs.head),
        if (vs.length == 2) vs(1).asInstanceOf[Number].longValue() else 0L)
      case "murmurhash2a32" => DigestOps.murmur2a32(bytesOf(vs.head),
        if (vs.length == 2) vs(1).asInstanceOf[Number].intValue() else 0)
      case "blake2b" => DigestOps.blake2b(bytesOf(vs.head),
        if (vs.length == 2) bytesOf(vs(1)) else Array.emptyByteArray, 32)
      case "argon2" =>
        // digest_udf.cpp:226-240: Argon2d, tcost=1, mcost=32 KiB,
        // single lane, 32-byte tag, (password, salt)
        Argon2.argon2d(bytesOf(vs(0)), bytesOf(vs(1)), 32, 1, 32)
      case "highwayhash" => HighwayHash.hash64(
        vs(0).asInstanceOf[Number].longValue(),
        vs(1).asInstanceOf[Number].longValue(),
        vs(2).asInstanceOf[Number].longValue(),
        vs(3).asInstanceOf[Number].longValue(), bytesOf(vs(4)))
      case "xxh3" => Xxh3.hash64(bytesOf(vs.head))
      case "xxh3_128" =>
        val (lo, hi) = Xxh3.hash128(bytesOf(vs.head))
        org.apache.spark.sql.catalyst.InternalRow(lo, hi)
      case "md5raw" => DigestOps.md5Raw(bytesOf(vs.head))
      case "md5halfmix" => DigestOps.md5HalfMix(bytesOf(vs.head))
      case other => throw new IllegalStateException(other)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(children = newChildren)
}
