package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, EOFException, InputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Skiff — the reference's schematized binary row format for job I/O
  * (SURVEY.md §1.4; spec yt/docs/en/_includes/user-guide/storage/
  * skiff.md): a table stream is a sequence of rows, each framed by a
  * little-endian `variant16` schema tag, followed by the dense fields
  * in schema order. Wire types implemented: int64/uint64 (8-byte LE),
  * double (8-byte LE), boolean (1 byte), string32 (4-byte LE length +
  * bytes); nullable columns are `variant8<nothing; T>` (1-byte tag
  * 0 = nothing, 1 = value).
  *
  * In the reference this format feeds user jobs over pipes
  * (user_job.cpp); here the codec runs inside `mapPartitions` so a
  * "binary mapper" can consume/produce Skiff streams without any
  * driver involvement — each partition is one pipe.
  */
object Skiff {

  final case class Field(name: String, dataType: DataType, optional: Boolean)

  def fieldsOf(schema: StructType): Seq[Field] =
    schema.fields.toSeq.map { f =>
      f.dataType match {
        case LongType | DoubleType | BooleanType | StringType | BinaryType =>
          Field(f.name, f.dataType, f.nullable)
        case other =>
          throw new IllegalArgumentException(s"no skiff wire type for $other")
      }
    }

  /** Encode one row: variant16 tag 0 + dense fields. */
  def encodeRow(row: Row, fields: Seq[Field]): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    def le(n: Int, bytes: Int): Unit = {
      var v = n; var i = 0
      while (i < bytes) { out.write(v & 0xff); v >>= 8; i += 1 }
    }
    def le64(n: Long): Unit = {
      var v = n; var i = 0
      while (i < 8) { out.write((v & 0xffL).toInt); v >>= 8; i += 1 }
    }
    le(0, 2) // variant16 schema tag
    fields.zipWithIndex.foreach { case (f, i) =>
      val isNull = row.isNullAt(i)
      if (f.optional) out.write(if (isNull) 0 else 1)
      else if (isNull) throw new IllegalArgumentException(s"null in required ${f.name}")
      if (!isNull) f.dataType match {
        case LongType => le64(row.getLong(i))
        case DoubleType => le64(java.lang.Double.doubleToLongBits(row.getDouble(i)))
        case BooleanType => out.write(if (row.getBoolean(i)) 1 else 0)
        case StringType =>
          val b = row.getString(i).getBytes("UTF-8")
          le(b.length, 4); out.write(b)
        case BinaryType =>
          val b = row.getAs[Array[Byte]](i)
          le(b.length, 4); out.write(b)
        case other => throw new IllegalArgumentException(other.toString)
      }
    }
    out.toByteArray
  }

  /** Decode a stream of framed rows. */
  def decodeStream(in: InputStream, fields: Seq[Field]): Iterator[Row] = {
    val din = new DataInputStream(in)
    def readLE(bytes: Int): Long = {
      var v = 0L; var i = 0
      while (i < bytes) {
        val b = din.read()
        if (b < 0) throw new EOFException()
        v |= (b.toLong & 0xff) << (8 * i); i += 1
      }
      v
    }
    new Iterator[Row] {
      private var nextRow: Row = _
      private var done = false
      private def advance(): Unit =
        try {
          val tag = try readLE(2) catch { case _: EOFException => done = true; return }
          require(tag == 0, s"unexpected skiff variant16 tag $tag")
          val vals = fields.map { f =>
            val present = if (f.optional) readLE(1) == 1 else true
            if (!present) null
            else f.dataType match {
              case LongType => readLE(8)
              case DoubleType => java.lang.Double.longBitsToDouble(readLE(8))
              case BooleanType => readLE(1) == 1
              case StringType =>
                val n = readLE(4).toInt
                val b = new Array[Byte](n); din.readFully(b); new String(b, "UTF-8")
              case BinaryType =>
                val n = readLE(4).toInt
                val b = new Array[Byte](n); din.readFully(b); b
              case other => throw new IllegalArgumentException(other.toString)
            }
          }
          nextRow = Row.fromSeq(vals)
        } catch { case _: EOFException => done = true }
      advance()
      def hasNext: Boolean = !done
      def next(): Row = { val r = nextRow; advance(); r }
    }
  }

  /** DataFrame → per-partition Skiff byte streams (one blob per
    * partition = one job pipe). */
  def encode(df: DataFrame): org.apache.spark.sql.Dataset[Array[Byte]] = {
    val fields = fieldsOf(df.schema)
    df.mapPartitions { rows =>
      val out = new ByteArrayOutputStream()
      rows.foreach(r => out.write(encodeRow(r, fields)))
      Iterator.single(out.toByteArray)
    }(Encoders.BINARY)
  }

  /** User job over a Skiff pipe (user_job.cpp with Skiff job I/O):
    * one external process per partition, rows streamed to stdin as
    * framed Skiff and read back in the same framing — sibling of
    * [[Proto.pipeMap]]. */
  def pipeMap(input: DataFrame, command: Seq[String], outSchema: StructType): DataFrame = {
    val inFields = fieldsOf(input.schema)
    val outFields = fieldsOf(outSchema)
    val cmd = command
    input.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else PipeJob.run(cmd,
        os => rows.foreach(r => os.write(encodeRow(r, inFields))),
        is => decodeStream(is, outFields))
    }(Encoders.row(outSchema))
  }

  /** Per-partition Skiff byte streams → DataFrame with `schema`. */
  def decode(blobs: org.apache.spark.sql.Dataset[Array[Byte]], schema: StructType): DataFrame = {
    val fields = fieldsOf(schema)
    blobs.mapPartitions { parts =>
      parts.flatMap(b => decodeStream(new java.io.ByteArrayInputStream(b), fields))
    }(Encoders.row(schema))
  }
}
