package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{shims => S}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Compress module (reference: yql/essentials/udfs/common/compress_base/
  * compress_udf.cpp — Compress::Gzip/Zlib and the matching Decompress
  * entry points).
  *
  * Codec choice: the JDK's zlib (java.util.zip) — gzip framing and raw
  * zlib streams, the same two wire formats the reference module emits.
  * Brotli/lzma/bzip2 are not bound (no JDK codec; zero-dependency rule).
  *
  * Each function is a Catalyst expression whose `doGenCode` is one
  * static call into [[CompressOps]], so compressing a column stays
  * inside the whole-stage span like every other scalar here. Throughput
  * is dominated by deflate itself, which is JIT-compiled JNI — the same
  * engine any JVM-side codec would use.
  */
/** Static kernels — TOP-LEVEL object so scalac emits static forwarders
  * (`graft.functions.CompressOps.gzip(...)`) that Janino can resolve;
  * a nested object has no forwarders and generated code referencing it
  * falls back to interpreted eval on every row batch. */
object CompressOps {
    import java.util.zip.{CRC32, Deflater, Inflater}

    // Per-thread codec state. zlib's deflateInit/inflateInit allocate
    // ~256 KB of native state; paying that PER ROW dominated the
    // compress path in the sf10 soak (105 s for 15M short rows).
    // One Deflater/Inflater pair per executor thread, reset() between
    // rows, makes the codec itself the cost — the 100 TB posture.
    private val rawDef = ThreadLocal.withInitial[Deflater](() =>
      new Deflater(Deflater.DEFAULT_COMPRESSION, true))
    private val wrapDef = ThreadLocal.withInitial[Deflater](() =>
      new Deflater(Deflater.DEFAULT_COMPRESSION, false))
    private val rawInf = ThreadLocal.withInitial[Inflater](() =>
      new Inflater(true))
    private val wrapInf = ThreadLocal.withInitial[Inflater](() =>
      new Inflater(false))
    private val crc = ThreadLocal.withInitial[CRC32](() => new CRC32)

    private def deflateAll(d: Deflater, in: Array[Byte],
        bos: java.io.ByteArrayOutputStream): Unit = {
      d.setInput(in); d.finish()
      val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    }

    private def inflateAll(inf: Inflater,
        bos: java.io.ByteArrayOutputStream): Unit = {
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        bos.write(buf, 0, n)
        // inflate() may emit 0 bytes on the call that consumes the
        // stream terminator — only a 0-byte round that still wants
        // input without having finished is a truncated stream.
        if (n == 0 && !inf.finished() && inf.needsInput())
          throw new java.util.zip.DataFormatException("truncated stream")
      }
    }

    /** RFC 1952 gzip framing over the per-thread raw deflater:
      * 10-byte header, raw deflate body, CRC32 + ISIZE trailer. */
    def gzipLevel(in: Array[Byte], level: Int): Array[Byte] = {
      val d = rawDef.get(); d.reset(); d.setLevel(level)
      val bos = new java.io.ByteArrayOutputStream(in.length / 2 + 32)
      bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0,
        0xff.toByte))
      deflateAll(d, in, bos)
      val c = crc.get(); c.reset(); c.update(in)
      val v = c.getValue; val n = in.length
      bos.write(Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte,
        (n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
        ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte))
      bos.toByteArray
    }

    def gzip(in: Array[Byte]): Array[Byte] =
      gzipLevel(in, Deflater.DEFAULT_COMPRESSION)

    /** RFC 1952 header walk (FEXTRA/FNAME/FCOMMENT/FHCRC) + raw
      * inflate over the per-thread inflater; multi-member streams
      * concatenate like GZIPInputStream. CRC32 + ISIZE verified. */
    def gunzip(in: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(in.length * 2 + 32)
      var off = 0
      while (off < in.length) {
        require(in.length - off >= 18 &&
          (in(off) & 0xff) == 0x1f && (in(off + 1) & 0xff) == 0x8b &&
          in(off + 2) == 8, "not a gzip stream")
        val flg = in(off + 3) & 0xff
        var p = off + 10
        if ((flg & 4) != 0) { // FEXTRA
          val xlen = (in(p) & 0xff) | ((in(p + 1) & 0xff) << 8)
          p += 2 + xlen
        }
        if ((flg & 8) != 0) { while (in(p) != 0) p += 1; p += 1 } // FNAME
        if ((flg & 16) != 0) { while (in(p) != 0) p += 1; p += 1 } // FCOMMENT
        if ((flg & 2) != 0) p += 2 // FHCRC
        val inf = rawInf.get(); inf.reset()
        inf.setInput(in, p, in.length - p)
        val before = bos.size()
        inflateAll(inf, bos)
        val trailerAt = p + (in.length - p - inf.getRemaining)
        require(in.length - trailerAt >= 8, "truncated gzip trailer")
        val c = crc.get(); c.reset()
        val out = bos.toByteArray // member boundary check only
        c.update(out, before, out.length - before)
        def le32(at: Int): Long =
          (in(at) & 0xffL) | ((in(at + 1) & 0xffL) << 8) |
            ((in(at + 2) & 0xffL) << 16) | ((in(at + 3) & 0xffL) << 24)
        require(le32(trailerAt) == c.getValue, "gzip CRC mismatch")
        require(le32(trailerAt + 4) == ((out.length - before) & 0xffffffffL),
          "gzip ISIZE mismatch")
        off = trailerAt + 8
      }
      bos.toByteArray
    }

    def zlibLevel(in: Array[Byte], level: Int): Array[Byte] = {
      val d = wrapDef.get(); d.reset(); d.setLevel(level)
      val bos = new java.io.ByteArrayOutputStream(in.length / 2 + 32)
      deflateAll(d, in, bos)
      bos.toByteArray
    }

    def zlib(in: Array[Byte]): Array[Byte] =
      zlibLevel(in, Deflater.DEFAULT_COMPRESSION)

    def unzlib(in: Array[Byte]): Array[Byte] = {
      val inf = wrapInf.get(); inf.reset()
      inf.setInput(in)
      val bos = new java.io.ByteArrayOutputStream(in.length * 2 + 32)
      inflateAll(inf, bos)
      bos.toByteArray
    }

    // Zstd/Snappy ride the codec jars Spark itself ships (zstd-jni,
    // snappy-java on the unmanaged classpath) — no new dependencies.
    //
    // Contexts are REUSED per thread: zstd-jni's static
    // Zstd.compress/decompress allocate and free a native
    // ZSTD_CCtx/DCtx (~1 MB workspace) on EVERY call, which profiled
    // as ~60% of yql_fn_compress_module's wall time at 2000 rows.
    // A thread-local ctx with a sticky level turns each call into one
    // JNI invocation over a warm context — the frame bytes are
    // identical (the static helpers wrap the same ctx API).
    private val zstdC = ThreadLocal.withInitial[
        com.github.luben.zstd.ZstdCompressCtx](() =>
      new com.github.luben.zstd.ZstdCompressCtx())
    private val zstdD = ThreadLocal.withInitial[
        com.github.luben.zstd.ZstdDecompressCtx](() =>
      new com.github.luben.zstd.ZstdDecompressCtx())

    def zstd(in: Array[Byte], level: Int): Array[Byte] = {
      val c = zstdC.get(); c.setLevel(level); c.compress(in)
    }

    def unzstd(in: Array[Byte]): Array[Byte] = {
      // single-JNI-call fast path when the frame declares its size
      // (Zstd.compress always does); stream fallback otherwise
      val size = com.github.luben.zstd.Zstd.getFrameContentSize(in)
      if (size >= 0 && size <= Int.MaxValue.toLong)
        zstdD.get().decompress(in, size.toInt)
      else {
        val s = new com.github.luben.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(in))
        try s.readAllBytes() finally s.close()
      }
    }

    def snappy(in: Array[Byte]): Array[Byte] =
      org.xerial.snappy.Snappy.compress(in)

    def unsnappy(in: Array[Byte]): Array[Byte] =
      org.xerial.snappy.Snappy.uncompress(in)
}

object Compress {

  abstract class CodecExpression extends UnaryExpression with ExpectsInputTypes {
    def kernel: String
    override def inputTypes = Seq(BinaryType)
    override def dataType: DataType = BinaryType
    override def nullSafeEval(input: Any): Any = input match {
      case b: Array[Byte] => eval0(b)
    }
    protected def eval0(b: Array[Byte]): Array[Byte]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.CompressOps.$kernel($c);")
  }

  case class GzipCompress(child: Expression) extends CodecExpression {
    override def kernel = "gzip"
    override protected def eval0(b: Array[Byte]) = CompressOps.gzip(b)
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }
  case class GzipDecompress(child: Expression) extends CodecExpression {
    override def kernel = "gunzip"
    override protected def eval0(b: Array[Byte]) = CompressOps.gunzip(b)
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }
  case class ZlibCompress(child: Expression) extends CodecExpression {
    override def kernel = "zlib"
    override protected def eval0(b: Array[Byte]) = CompressOps.zlib(b)
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }
  case class ZlibDecompress(child: Expression) extends CodecExpression {
    override def kernel = "unzlib"
    override protected def eval0(b: Array[Byte]) = CompressOps.unzlib(b)
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  def gzip(c: Column): Column = S.column(GzipCompress(S.expression(c)))
  def gunzip(c: Column): Column = S.column(GzipDecompress(S.expression(c)))
  def zlib(c: Column): Column = S.column(ZlibCompress(S.expression(c)))
  def unzlib(c: Column): Column = S.column(ZlibDecompress(S.expression(c)))

  /** SQL-surface dispatch for the module spellings
    * `Compress::Gzip(data, level)` / `Decompress::Gzip(data)` /
    * `TryDecompress::Gzip(data)` (compress_udf.cpp module triple).
    * CodegenFallback: deflate/zstd/snappy dominate per-row cost by
    * orders of magnitude, so interpreted dispatch is invisible here.
    * `tryMode` maps any codec failure to NULL (the TryDecompress
    * TOptional<char*> contract); plain Decompress lets it raise. */
  final case class CodecFnExpr(codec: String, tryMode: Boolean,
      children: Seq[Expression])
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String =
      (if (tryMode) "trydecompress_" else "") + codec

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      val want = codec match {
        case "gzip" | "zlib" | "zstd" => 2 // (data, ui8 level)
        case _ => 1
      }
      if (children.length == want) TypeCheckSuccess
      else TypeCheckFailure(s"$prettyName expects $want argument(s)")
    }

    private def bytes(v: Any): Array[Byte] = v match {
      case b: Array[Byte] => b
      case u: org.apache.spark.unsafe.types.UTF8String => u.getBytes
    }

    override def eval(
        input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.exists(_ == null)) return null
      val data = bytes(vs.head)
      def level = vs(1) match {
        case i: Int => i
        case l: Long => l.toInt
        case s: Short => s.toInt
        case b: Byte => b.toInt
      }
      try codec match {
        case "gzip" => CompressOps.gzipLevel(data, level)
        case "zlib" => CompressOps.zlibLevel(data, level)
        case "zstd" => CompressOps.zstd(data, level)
        case "snappy" => CompressOps.snappy(data)
        case "ungzip" => CompressOps.gunzip(data)
        case "unzlib" => CompressOps.unzlib(data)
        case "unzstd" => CompressOps.unzstd(data)
        case "unsnappy" => CompressOps.unsnappy(data)
      } catch {
        case _: Exception if tryMode => null
      }
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }
}
