package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride as opaque
  * `binary` columns with a typed metadata struct, processed in batched
  * per-partition passes (the Scala analog of `mapInPandas` — one
  * partition = one batch, vectorizable decode loop inside).
  *
  * Metadata extraction is a REAL container-header probe — PNG IHDR,
  * JPEG SOF marker scan, GIF/BMP headers, WAV RIFF duration — pure
  * byte parsing with no codec library, which is exactly what a
  * pipeline's scan-time metadata pass does. Pixel decode is
  * codec-backed via javax.imageio ([[decodeImage]]): `resize` rescales
  * real PNG/JPEG/GIF/BMP payloads and re-encodes PNG; `extractFeatures`
  * computes block-luminance grid features from true pixels. Audio
  * sample decode is codec-backed via javax.sound.sampled
  * ([[decodeAudio]] — WAV/AIFF/AU to mono float PCM): `extractFeatures`
  * computes per-block RMS waveform features from true samples. Video
  * sample decode is codec-backed for MJPEG-in-AVI ([[decodeVideo]] —
  * the RIFF container walk is ours, each frame chunk is a complete
  * JPEG through javax.imageio): [[videoStats]] reports real decoded
  * frame counts, durations and mean luminance. Payloads matching no
  * known magic keep the deterministic fallbacks so the synthetic
  * text-byte corpus remains covered; other video codecs (H.264 etc.)
  * still need an external codec — [[sampleFrames]] keeps that
  * plumbing real.
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

  /** Codec-backed image decode (javax.imageio — PNG/JPEG/GIF/BMP): the
    * real pixel path behind [[resize]] and [[extractFeatures]]. Only
    * payloads whose magic names a format ImageIO handles are attempted;
    * anything else (and any corrupt container) returns None so the
    * deterministic fallbacks keep covering the synthetic corpus. */
  private[graft] def decodeImage(payload: Array[Byte])
      : Option[java.awt.image.BufferedImage] = {
    if (payload == null || payload.length < 4) return None
    val b = payload
    val known =
      ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
      (b(0) == 'B' && b(1) == 'M')
    if (!known) None
    else
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => None }
  }

  /** Deterministic real-PNG fixture generator: one solid-gray
    * `widthCol`×`heightCol` image per row, encoded through the real
    * PNG encoder — so decode-path tests and oracles run against true
    * container bytes without shipping binary fixtures. */
  def synthesizePng(df: DataFrame, widthCol: String, heightCol: String,
      grayCol: String, outCol: String = "payload"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(outCol, BinaryType))
    val (wi, hi, gi) = (inSchema.fieldIndex(widthCol),
      inSchema.fieldIndex(heightCol), inSchema.fieldIndex(grayCol))
    df.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, g) = (r.getInt(wi), r.getInt(hi), r.getInt(gi))
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** Codec-backed audio decode (javax.sound.sampled — WAV/AIFF/AU):
    * returns channel-averaged mono samples in [-1, 1] plus the sample
    * rate. Non-PCM encodings convert through AudioSystem to signed
    * 16-bit PCM first. Payloads without a known audio magic (or with a
    * corrupt container) return None so deterministic fallbacks keep
    * covering the synthetic corpus, like [[decodeImage]]. */
  private[graft] def decodeAudio(payload: Array[Byte])
      : Option[(Array[Float], Float)] = {
    if (payload == null || payload.length < 12) return None
    val b = payload
    val wav = b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    val aiff = b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M'
    val au = b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'
    if (!wav && !aiff && !au) return None
    try {
      import javax.sound.sampled._
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val f = raw.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
        f.getSampleRate, false)
      val pcm =
        if (f.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            f.getSampleSizeInBits == 16 && !f.isBigEndian) raw
        else AudioSystem.getAudioInputStream(target, raw)
      val bytes = pcm.readAllBytes()
      val ch = pcm.getFormat.getChannels
      val nFrames = bytes.length / (2 * ch)
      val out = new Array[Float](nFrames)
      var i = 0
      while (i < nFrames) {
        var sum = 0.0f
        var c = 0
        while (c < ch) {
          val o = (i * ch + c) * 2
          val s = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort
          sum += s / 32768.0f
          c += 1
        }
        out(i) = sum / ch
        i += 1
      }
      Some((out, pcm.getFormat.getSampleRate))
    } catch { case _: Exception => None }
  }

  /** Deterministic real-WAV fixture generator: a mono 16-bit PCM
    * square wave per row — amplitude `ampCol`·128 (ampCol in 0..255,
    * so decoded |sample| = amp/256 exactly), duration `durMsCol`
    * milliseconds at `rate` Hz — through the real WAVE encoder, so
    * decode-path tests and oracles run against true container bytes
    * (the audio analog of [[synthesizePng]]). */
  def synthesizeWav(df: DataFrame, ampCol: String, durMsCol: String,
      rate: Int = 8000, outCol: String = "payload"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(outCol, BinaryType))
    val (ai, di) = (inSchema.fieldIndex(ampCol), inSchema.fieldIndex(durMsCol))
    df.mapPartitions { rows =>
      rows.map { r =>
        import javax.sound.sampled._
        val amp = r.getInt(ai); val durMs = r.getInt(di)
        val frames = rate * durMs / 1000
        val v = (amp * 128).toShort
        val pcm = new Array[Byte](frames * 2)
        var i = 0
        while (i < frames) {
          val s: Short = if (i % 2 == 0) v else (-v).toShort
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
        val ais = new AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** Codec-backed VIDEO decode for MJPEG-in-AVI: the RIFF/AVI
    * container walk is pure byte parsing (like [[probeMeta]]), each
    * `00dc`/`00db` frame chunk is a complete JPEG decoded through
    * javax.imageio. Returns (frames, microSecPerFrame, headerFrames).
    * Non-AVI payloads and non-MJPEG streams return None so the
    * deterministic fallbacks keep covering them. */
  private[graft] def decodeVideo(payload: Array[Byte])
      : Option[(Seq[java.awt.image.BufferedImage], Long, Int)] = {
    if (payload == null || payload.length < 12) return None
    val b = payload
    def fourcc(i: Int): String =
      if (i + 4 <= b.length) new String(b, i, 4, "US-ASCII") else ""
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    try {
      var musPerFrame = 0L
      var headerFrames = 0
      val frames = scala.collection.mutable.ArrayBuffer
        .empty[java.awt.image.BufferedImage]
      def walk(start: Int, end: Int): Unit = {
        var i = start
        while (i + 8 <= end) {
          val id = fourcc(i)
          val sz = le32(b, i + 4).toInt
          // corrupt/adversarial sizes (negative after .toInt, or past the
          // container) would stall or reverse the walk — stop instead
          if (sz < 0 || sz > end - (i + 8)) return
          if (id == "LIST") {
            walk(i + 12, i + 8 + sz) // skip the list-type fourcc
          } else if (id == "avih" && sz >= 40) {
            musPerFrame = le32(b, i + 8)
            headerFrames = le32(b, i + 24).toInt
          } else if ((id == "00dc" || id == "00db") && sz > 0) {
            val jpeg = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + sz)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(jpeg))
            if (img != null) frames += img
          }
          i += 8 + sz + (sz & 1) // chunks pad to even
        }
      }
      walk(12, math.min(b.length, 8 + le32(b, 4).toInt))
      if (frames.isEmpty) None else Some((frames.toSeq, musPerFrame, headerFrames))
    } catch { case _: Exception => None }
  }

  /** Deterministic real-AVI fixture generator: one MJPEG-in-AVI clip
    * per row — `framesCol` solid-gray `widthCol`×`heightCol` frames at
    * `fps`, each frame a true JPEG through the real encoder, wrapped
    * in a standards-shaped RIFF/AVI container (avih + strl headers +
    * movi chunk list) — the video analog of [[synthesizePng]] /
    * [[synthesizeWav]]. */
  def synthesizeAviMjpeg(df: DataFrame, widthCol: String, heightCol: String,
      grayCol: String, framesCol: String, fps: Int = 10,
      outCol: String = "payload"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(outCol, BinaryType))
    val (wi, hi, gi, fi) = (inSchema.fieldIndex(widthCol),
      inSchema.fieldIndex(heightCol), inSchema.fieldIndex(grayCol),
      inSchema.fieldIndex(framesCol))
    df.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, g, nf) = (r.getInt(wi), r.getInt(hi), r.getInt(gi), r.getInt(fi))
        val out = new java.io.ByteArrayOutputStream()
        def le(v: Long, n: Int): Unit = {
          var x = v; var i = 0
          while (i < n) { out.write((x & 0xff).toInt); x >>= 8; i += 1 }
        }
        def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
        // one JPEG per frame (solid gray — true encoder bytes)
        val jpegs = (0 until nf).map { _ =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (g << 16) | (g << 8) | g
          (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          bos.toByteArray
        }
        val musPerFrame = 1000000L / fps
        def chunkLen(payload: Int) = 8 + payload + (payload & 1)
        val moviSize = 4 + jpegs.map(j => chunkLen(j.length)).sum
        val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
        val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
        cc("RIFF"); le(riffSize.toLong, 4); cc("AVI ")
        cc("LIST"); le(hdrlSize.toLong, 4); cc("hdrl")
        cc("avih"); le(56, 4)
        le(musPerFrame, 4); le(0, 4); le(0, 4); le(0, 4) // musPerFrame..flags
        le(nf.toLong, 4); le(0, 4); le(1, 4); le(0, 4)   // totalFrames..sugBuf
        le(w.toLong, 4); le(h.toLong, 4)
        le(0, 4); le(0, 4); le(0, 4); le(0, 4)           // reserved
        cc("LIST"); le((4 + (8 + 56) + (8 + 40)).toLong, 4); cc("strl")
        cc("strh"); le(56, 4)
        cc("vids"); cc("MJPG")
        le(0, 4); le(0, 4); le(0, 4)                     // flags, prio, init
        le(1, 4); le(fps.toLong, 4)                      // scale, rate
        le(0, 4); le(nf.toLong, 4); le(0, 4); le(0, 4); le(0, 4)
        le(0, 2); le(0, 2); le(w.toLong, 2); le(h.toLong, 2) // rcFrame
        cc("strf"); le(40, 4)
        le(40, 4); le(w.toLong, 4); le(h.toLong, 4); le(1, 2); le(24, 2)
        cc("MJPG"); le((w * h * 3).toLong, 4)
        le(0, 4); le(0, 4); le(0, 4); le(0, 4)
        cc("LIST"); le(moviSize.toLong, 4); cc("movi")
        jpegs.foreach { j =>
          cc("00dc"); le(j.length.toLong, 4); out.write(j)
          if ((j.length & 1) == 1) out.write(0)
        }
        Row.fromSeq(r.toSeq :+ out.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** Decoded-video stats, batched per partition: frame count from the
    * REAL frame decode, header frame count, duration from decoded
    * frames × the header frame interval, and mean luminance over every
    * decoded pixel — the verdict surface for the MJPEG path (JPEG is
    * lossy, so luminance verifies within a tolerance, while counts and
    * durations are exact). Non-video payloads yield nulls. */
  def videoStats(df: DataFrame, payloadCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField("frames_decoded", IntegerType))
      .add(StructField("frames_header", IntegerType))
      .add(StructField("video_ms", LongType))
      .add(StructField("mean_luma", DoubleType))
    val idx = inSchema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val extra: Seq[Any] = decodeVideo(payload) match {
          case Some((frames, mus, headerFrames)) =>
            var sum = 0.0; var n = 0L
            frames.foreach { img =>
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val p = img.getRGB(x, y)
                  sum += 0.299 * ((p >> 16) & 0xff) +
                    0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
                  n += 1; x += 1
                }
                y += 1
              }
            }
            Seq(frames.length, headerFrames,
              frames.length * mus / 1000L,
              if (n == 0) 0.0 else sum / n)
          case None => Seq(null, null, null, null)
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(Encoders.row(outSchema))
  }

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Real container-header metadata probe. Formats by magic:
    *   - PNG (\x89PNG\r\n\x1a\n): IHDR width/height at offsets 16/20 (BE)
    *   - JPEG (\xFF\xD8): marker walk to the first SOFn (C0-CF minus
    *     C4/C8/CC); height/width big-endian after the precision byte
    *   - GIF (GIF87a/GIF89a): logical screen w/h at 6/8 (LE)
    *   - BMP (BM): BITMAPINFOHEADER width/height at 18/22 (LE, signed
    *     height → abs; top-down rows encode as negative)
    *   - WAV (RIFF....WAVE): byte_rate at 28 (LE); duration =
    *     data-chunk bytes · 1000 / byte_rate (chunk walk)
    * Anything else: deterministic pseudo-metadata (codec "unknown"
    * keeps the fake/rgb|fake/yuv labels for corpus compatibility) —
    * and any real format with a truncated header falls back the same
    * way rather than throwing mid-pipeline.
    */
  private[graft] def probeMeta(payload: Array[Byte]): Row = {
    if (payload == null) return Row(null, null, null, null, null)
    val len = payload.length.toLong
    val b = payload
    def fallback: Row = {
      val h = java.util.Arrays.hashCode(payload).toLong & 0x7fffffffL
      Row(len, (h % 1920 + 1).toInt, (h % 1080 + 1).toInt, len * 40L,
        if (h % 2 == 0) "fake/rgb" else "fake/yuv")
    }
    try {
      if (len >= 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
          b(3) == 'G') {
        Row(len, be32(b, 16).toInt, be32(b, 20).toInt, null, "image/png")
      } else if (len >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        // JPEG marker walk
        var i = 2
        var res: Row = null
        while (res == null && i + 3 < len) {
          if ((b(i) & 0xff) != 0xff) { i += 1 }
          else {
            val m = b(i + 1) & 0xff
            if (m == 0xff) i += 1 // fill byte
            else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) i += 2 // standalone
            else {
              val segLen = be16(b, i + 2)
              if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
                  m != 0xcc && i + 8 < len) {
                res = Row(len, be16(b, i + 7), be16(b, i + 5), null, "image/jpeg")
              } else i += 2 + segLen
            }
          }
        }
        if (res != null) res else fallback
      } else if (len >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
        Row(len, le16(b, 6), le16(b, 8), null, "image/gif")
      } else if (len >= 26 && b(0) == 'B' && b(1) == 'M') {
        Row(len, le32(b, 18).toInt, math.abs(le32(b, 22).toInt), null, "image/bmp")
      } else if (len >= 72 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == 'F' && b(8) == 'A' && b(9) == 'V' && b(10) == 'I' &&
          b(11) == ' ') {
        // AVI: chunk-walk to the avih main header (width/height at
        // +32/+36, duration = musPerFrame × totalFrames)
        var i = 12
        var res: Row = null
        while (res == null && i + 8 <= len) {
          val id = new String(b, i, 4, "US-ASCII")
          val sz = le32(b, i + 4).toInt
          if (sz < 0 || sz > len - (i + 8)) i = b.length // corrupt size: stop
          else if (id == "LIST") i += 12
          else if (id == "avih" && sz >= 40) {
            val mus = le32(b, i + 8)
            val nf = le32(b, i + 24)
            res = Row(len, le32(b, i + 40).toInt, le32(b, i + 44).toInt,
              mus * nf / 1000L, "video/avi")
          } else i += 8 + sz + (sz & 1)
        }
        if (res != null) res else fallback
      } else if (len >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
          b(11) == 'E') {
        val byteRate = le32(b, 28)
        // chunk walk to the data chunk
        var i = 12
        var dataLen = -1L
        while (dataLen < 0 && i + 8 <= len) {
          val sz = le32(b, i + 4)
          if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a')
            dataLen = sz
          else if (sz > len - (i + 8)) i = b.length // corrupt size: stop
          else i += 8 + sz.toInt + (sz.toInt & 1)
        }
        if (dataLen >= 0 && byteRate > 0)
          Row(len, null, null, dataLen * 1000L / byteRate, "audio/wav")
        else fallback
      } else fallback
    } catch { case _: IndexOutOfBoundsException => fallback }
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
        Row.fromSeq(r.toSeq :+ probeMeta(payload))
      }
    }(Encoders.row(outSchema))
  }

  /** Feature extraction: payload → dense Array[Float], batched per
    * partition. Decodable images (PNG/JPEG/GIF/BMP via
    * [[decodeImage]]) get REAL pixel features — mean luminance
    * (0.299r+0.587g+0.114b)/255 − 0.5 over a ⌈√dim⌉×⌈√dim⌉ block grid,
    * the classic tiny-thumbnail embedding; non-image payloads keep the
    * deterministic rolling-hash features (swap for an encoder model
    * call in production). Output shape matches the `embeddings` table
    * so the Similarity operators compose directly.
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
          else decodeImage(payload) match {
            case Some(img) =>
              val g = math.ceil(math.sqrt(dim.toDouble)).toInt
              val (w, h) = (img.getWidth, img.getHeight)
              val out = new Array[Float](dim)
              var k = 0
              while (k < dim) {
                val (cx, cy) = (k % g, k / g)
                val x0 = cx * w / g; val x1 = math.max(x0 + 1, (cx + 1) * w / g)
                val y0 = cy * h / g; val y1 = math.max(y0 + 1, (cy + 1) * h / g)
                var sum = 0.0; var n = 0
                var y = y0
                while (y < h && y < y1) {
                  var x = x0
                  while (x < w && x < x1) {
                    val p = img.getRGB(x, y)
                    sum += 0.299 * ((p >> 16) & 0xff) +
                      0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
                    n += 1; x += 1
                  }
                  y += 1
                }
                out(k) = if (n == 0) 0.0f else (sum / n / 255.0 - 0.5).toFloat
                k += 1
              }
              out
            case None => decodeAudio(payload) match {
              // real waveform features: per-block RMS energy over dim
              // windows (the audio analog of the luminance grid)
              case Some((samples, _)) if samples.nonEmpty =>
                val out = new Array[Float](dim)
                val n = samples.length
                var k = 0
                while (k < dim) {
                  val s0 = (k.toLong * n / dim).toInt
                  val s1 = math.max(s0 + 1, ((k + 1).toLong * n / dim).toInt)
                  var acc = 0.0; var m = 0
                  var i = s0
                  while (i < s1 && i < n) {
                    acc += samples(i).toDouble * samples(i); m += 1; i += 1
                  }
                  out(k) = if (m == 0) 0.0f else math.sqrt(acc / m).toFloat
                  k += 1
                }
                out
              case _ =>
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
          }
        Row.fromSeq(r.toSeq :+ vec)
      }
    }(Encoders.row(outSchema))
  }

  /** Resize: payload → payload scaled to a `width`×`height` target,
    * batched per partition. Decodable images ([[decodeImage]]) take the
    * REAL codec path — bilinear rescale through Graphics2D, re-encoded
    * as PNG, so the output is a true container whose header probes to
    * the target dims. Non-image payloads keep the deterministic
    * stride-sample fallback (monotone in the target like a real
    * scaler's output size). Null payloads pass through.
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
          else decodeImage(payload) match {
            case Some(img) =>
              val scaled = new java.awt.image.BufferedImage(width, height,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val gr = scaled.createGraphics()
              gr.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              gr.drawImage(img, 0, 0, width, height, null)
              gr.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(scaled, "png", bos)
              bos.toByteArray
            case None if payload.length <= target => payload
            case None =>
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
