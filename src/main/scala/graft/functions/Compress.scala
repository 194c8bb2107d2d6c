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
    def gzip(in: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(in.length / 2 + 32)
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(in); gz.close()
      bos.toByteArray
    }

    def gunzip(in: Array[Byte]): Array[Byte] = {
      val gz = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(in))
      try gz.readAllBytes() finally gz.close()
    }

    def zlib(in: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(in); d.finish()
      val bos = new java.io.ByteArrayOutputStream(in.length / 2 + 32)
      val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    }

    def gzipLevel(in: Array[Byte], level: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(in.length / 2 + 32)
      val gz = new java.util.zip.GZIPOutputStream(bos) {
        `def`.setLevel(level)
      }
      gz.write(in); gz.close()
      bos.toByteArray
    }

    def zlibLevel(in: Array[Byte], level: Int): Array[Byte] = {
      val d = new java.util.zip.Deflater(level)
      d.setInput(in); d.finish()
      val bos = new java.io.ByteArrayOutputStream(in.length / 2 + 32)
      val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    }

    // Zstd/Snappy ride the codec jars Spark itself ships (zstd-jni,
    // snappy-java on the unmanaged classpath) — no new dependencies.
    def zstd(in: Array[Byte], level: Int): Array[Byte] =
      com.github.luben.zstd.Zstd.compress(in, level)

    def unzstd(in: Array[Byte]): Array[Byte] = {
      val s = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(in))
      try s.readAllBytes() finally s.close()
    }

    def snappy(in: Array[Byte]): Array[Byte] =
      org.xerial.snappy.Snappy.compress(in)

    def unsnappy(in: Array[Byte]): Array[Byte] =
      org.xerial.snappy.Snappy.uncompress(in)

    def unzlib(in: Array[Byte]): Array[Byte] = {
      val inf = new java.util.zip.Inflater()
      inf.setInput(in)
      val bos = new java.io.ByteArrayOutputStream(in.length * 2 + 32)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        bos.write(buf, 0, n)
        // inflate() may emit 0 bytes on the call that consumes the
        // stream terminator — only a 0-byte round that still wants
        // input without having finished is a truncated stream.
        if (n == 0 && !inf.finished() && inf.needsInput())
          throw new java.util.zip.DataFormatException("truncated zlib stream")
      }
      inf.end()
      bos.toByteArray
    }
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
