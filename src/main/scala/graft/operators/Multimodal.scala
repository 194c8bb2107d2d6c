package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride as opaque
  * `binary` columns with a typed metadata struct, processed in batched
  * per-partition passes (the Scala analog of `mapInPandas` — one
  * partition = one batch, vectorizable decode loop inside).
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * container): `decodeStub` derives deterministic fake
  * width/height/duration from the payload bytes. The Spark-side
  * contract — schema, batch shape, partitioning, null passthrough — is
  * real and tested; swap `decodeStub` for a JNI/codec call in
  * production.
  */
object Multimodal {
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  /** Attach a binary payload column built from a string column — stands
    * in for reading real media blobs (spark.read.format("binaryFile")).
    */
  def withBinaryPayload(df: DataFrame, srcCol: String, payloadCol: String): DataFrame =
    df.withColumn(payloadCol, encode(col(srcCol), "UTF-8"))

  /** STUB decode: deterministic pseudo-metadata from payload bytes.
    * Replace with a real codec; everything around it stays unchanged.
    */
  private def decodeStub(payload: Array[Byte]): Row = {
    if (payload == null) Row(null, null, null, null, null)
    else {
      val len = payload.length.toLong
      // ??? real decoder goes here — fake fields derived from content
      val h = java.util.Arrays.hashCode(payload).toLong & 0x7fffffffL
      Row(len, (h % 1920 + 1).toInt, (h % 1080 + 1).toInt, len * 40L,
        if (h % 2 == 0) "fake/rgb" else "fake/yuv")
    }
  }

  /** Per-partition batched decode — schema in, schema+meta out. Runs as
    * one streaming pass per partition; no shuffle, no driver collect.
    */
  def decodeMeta(df: DataFrame, payloadCol: String, metaCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(metaCol, mediaMetaSchema))
    val idx = inSchema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ decodeStub(payload))
      }
    }(Encoders.row(outSchema))
  }

  /** Feature-extraction plumbing: payload → dense Array[Float]
    * embedding, batched per partition (stub: deterministic features
    * from a rolling byte hash; swap for a real encoder model call).
    * Output shape matches the `embeddings` table so the Similarity
    * operators compose directly.
    */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int,
      outCol: String = "vec"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(outCol, ArrayType(FloatType, false)))
    val idx = inSchema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val vec: Array[Float] =
          if (payload == null) null
          else {
            val out = new Array[Float](dim)
            var h = 1125899906842597L
            var i = 0
            while (i < payload.length) {
              h = 31 * h + payload(i)
              out(i % dim) += (h & 0xffff) / 65536.0f - 0.5f
              i += 1
            }
            out
          }
        Row.fromSeq(r.toSeq :+ vec)
      }
    }(Encoders.row(outSchema))
  }

  /** Resize plumbing: payload → payload scaled to a `width`×`height`
    * target, batched per partition. STUB scaling: stride-sample the
    * input bytes down to `min(len, width*height/64)` — deterministic
    * and monotone in the target like a real scaler's output size; swap
    * the loop body for a codec resize call. Null payloads pass through.
    */
  def resize(df: DataFrame, payloadCol: String, width: Int, height: Int,
      outCol: String = "resized"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(outCol, BinaryType))
    val idx = inSchema.fieldIndex(payloadCol)
    val target = math.max(1, width * height / 64)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val out: Array[Byte] =
          if (payload == null) null
          else if (payload.length <= target) payload
          else {
            val res = new Array[Byte](target)
            var i = 0
            while (i < target) {
              res(i) = payload((i.toLong * payload.length / target).toInt)
              i += 1
            }
            res
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling plumbing for video-like payloads: emit one row per
    * sampled frame offset (explode), payload sliced per frame. With a
    * real decoder the slice becomes a frame decode at the timestamp.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, everyBytes: Int): DataFrame =
    df.withColumn("frame_no",
        explode(sequence(lit(0),
          greatest(floor(length(col(payloadCol)) / everyBytes).cast("int") - 1,
            lit(0)))))
      .withColumn("frame_bytes",
        col(payloadCol).substr(
          (col("frame_no") * everyBytes + 1).cast("int"), lit(everyBytes)))
}
