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

  override def dataType: DataType =
    if (fn == "md5raw") BinaryType else LongType
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
