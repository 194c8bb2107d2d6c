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
}
