package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernels behind the [[Sketches]] expressions. A top-level
  * object gets JVM static forwarders, so whole-stage-generated Java
  * calls these directly (`graft.functions.SketchOps.dot(...)`) — the
  * expressions stay inside the codegen span with one invoke per row
  * and the loop body JIT-compiled here, instead of falling back to
  * interpreted eval at a codegen boundary.
  *
  * Element-type dispatch for the numeric-array kernels uses the int
  * codes in [[SketchOps.typeCode]], resolved once at planning time.
  */
object SketchOps {

  private val SegSplitRe = java.util.regex.Pattern.compile("[.!?]")
  private val SumInts = new java.util.function.BiFunction[Integer, Integer, Integer] {
    override def apply(a: Integer, b: Integer): Integer = Integer.valueOf(a.intValue + b.intValue)
  }
  private val WsRe = java.util.regex.Pattern.compile("\\s+")

  private def round4(v: Double): Double =
    // mirrors Spark round(): HALF_UP decimal rounding
    java.math.BigDecimal.valueOf(v).setScale(4, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  // Spark's trim() strips ASCII space only — not the \t\n of String.trim
  private def trimSpaces(s: String): String = {
    var from = 0; var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  /** Gopher §A1.1 quality-rule raw statistics (Rae et al. 2021,
    * "Scaling Language Models: Methods, Analysis & Insights from
    * Training Gopher", appendix A1.1) in ONE pass over the document.
    * Every output is an EXACT INTEGER so an external engine (the
    * DuckDB oracle) recomputes them bit-for-bit; the threshold rules
    * (word-count window, mean word length, symbol ratios, bullet/
    * ellipsis line fractions, alpha-word share, stop-word presence)
    * derive downstream in SQL from these counts.
    *
    * Definitions pinned for cross-engine parity:
    *   - a word is a maximal run of non-whitespace, whitespace being
    *     the RE2 `\s` set { space, \t, \n, \f, \r } — NOT Java's \s
    *     (which adds \x0B) — so `regexp_split_to_array(text, '\s+')`
    *     agrees;
    *   - word length counts CODEPOINTS (DuckDB `length()`), not UTF-16
    *     units;
    *   - stop-word hits count how many of Gopher's eight words
    *     { the, be, to, of, and, that, have, with } appear at least
    *     once as a whole lowercased word;
    *   - lines split on \n (empty lines count); a bullet line starts,
    *     after stripping spaces/tabs, with "- ", "* " or "• "; an
    *     ellipsis line ends, after stripping, with "..." or "…";
    *   - n_ellipsis counts non-overlapping "..." occurrences plus "…"
    *     chars (the `replace`-delta the oracle computes).
    */
  private val GopherStopwords = Array("the", "be", "to", "of", "and",
    "that", "have", "with")
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  def gopher(t: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val text = t.toString
    var nWords = 0L; var wordLenSum = 0L; var nAlphaWords = 0L
    val stopSeen = new Array[Boolean](GopherStopwords.length)
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      if (i < n) {
        val start = i
        var alpha = false
        while (i < n && !isWs(text.charAt(i))) {
          val c = text.charAt(i)
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha = true
          i += 1
        }
        nWords += 1
        wordLenSum += text.codePointCount(start, i)
        if (alpha) nAlphaWords += 1
        val len = i - start
        if (len >= 2 && len <= 4) {
          var s = 0
          while (s < GopherStopwords.length) {
            if (!stopSeen(s) && GopherStopwords(s).length == len) {
              var j = 0
              var eq = true
              while (eq && j < len) {
                val c = text.charAt(start + j)
                val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
                if (lc != GopherStopwords(s).charAt(j)) eq = false
                j += 1
              }
              if (eq) stopSeen(s) = true
            }
            s += 1
          }
        }
      }
    }
    var nStopHits = 0L
    stopSeen.foreach(b => if (b) nStopHits += 1)

    var nLines = 0L; var nBullet = 0L; var nEllipsisLines = 0L
    var lineStart = 0
    var k = 0
    while (k <= n) {
      if (k == n || text.charAt(k) == '\n') {
        nLines += 1
        var a = lineStart; var b = k
        while (a < b && (text.charAt(a) == ' ' || text.charAt(a) == '\t')) a += 1
        while (b > a && (text.charAt(b - 1) == ' ' || text.charAt(b - 1) == '\t')) b -= 1
        if (b - a >= 2 && text.charAt(a + 1) == ' ' &&
            (text.charAt(a) == '-' || text.charAt(a) == '*' || text.charAt(a) == '•'))
          nBullet += 1
        if ((b - a >= 3 && text.charAt(b - 1) == '.' && text.charAt(b - 2) == '.' &&
            text.charAt(b - 3) == '.') || (b - a >= 1 && text.charAt(b - 1) == '…'))
          nEllipsisLines += 1
        lineStart = k + 1
      }
      k += 1
    }

    var nHash = 0L; var nEllipsis = 0L
    var p = 0
    while (p < n) {
      val c = text.charAt(p)
      if (c == '#') { nHash += 1; p += 1 }
      else if (c == '…') { nEllipsis += 1; p += 1 }
      else if (c == '.' && p + 2 < n && text.charAt(p + 1) == '.' &&
          text.charAt(p + 2) == '.') { nEllipsis += 1; p += 3 }
      else p += 1
    }

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      nWords, wordLenSum, nAlphaWords, nStopHits,
      nLines, nBullet, nEllipsisLines, nHash, nEllipsis))
  }

  /** Gopher repetition stats in one hash-count pass (no per-row array
    * sorts): returns (dup_seg_frac, dup_seg_char_frac,
    * top_bigram_char_frac) with the exact semantics of the declarative
    * fold it replaces — per distinct segment with count c: dups += c-1,
    * dupChars += (c-1)·len; top bigram = max count; mean gram length
    * averaged over ALL gram occurrences. */
  def repetition(t: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val text = t.toString
    val totalChars = math.max(text.length, 1).toDouble

    var dups = 0L; var dupChars = 0L; var nsegs = 0L
    val segCounts = new java.util.HashMap[String, Integer]()
    val segs = SegSplitRe.split(text, -1)
    var i = 0
    while (i < segs.length) {
      val s = trimSpaces(segs(i))
      if (s.nonEmpty) {
        nsegs += 1
        val c = segCounts.merge(s, Integer.valueOf(1), SumInts)
        if (c > 1) { dups += 1; dupChars += s.length }
      }
      i += 1
    }

    val rawWords = WsRe.split(text.toLowerCase(java.util.Locale.ROOT), -1)
    val words = new java.util.ArrayList[String](rawWords.length)
    i = 0
    while (i < rawWords.length) {
      if (rawWords(i).nonEmpty) words.add(rawWords(i))
      i += 1
    }
    var run = 0L; var gramLenSum = 0L; var gramCount = 0L
    if (words.size >= 2) {
      val gramCounts = new java.util.HashMap[String, Integer]()
      i = 0
      while (i < words.size - 1) {
        val g = words.get(i) + " " + words.get(i + 1)
        val c = gramCounts.merge(g, Integer.valueOf(1), SumInts)
        if (c > run) run = c.longValue()
        gramLenSum += g.length
        gramCount += 1
        i += 1
      }
    }
    val meanGramLen = if (gramCount > 0) gramLenSum.toDouble / gramCount else 0.0

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      round4(dups.toDouble / math.max(nsegs, 1L)),
      round4(dupChars.toDouble / totalChars),
      round4(run * meanGramLen / totalChars)))
  }

  /** Word n-grams as space-joined strings — the values of the
    * declarative split→sequence→slice→concat_ws tree in one pass
    * (the decontamination hot path explodes these per document). */
  def wordGrams(text: UTF8String, n: Int): ArrayData = {
    val raw = WsRe.split(text.toString, -1)
    var wc = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) { raw(wc) = raw(i); wc += 1 }; i += 1 }
    if (wc < n) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](wc - n + 1)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i + n <= wc) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(raw(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def minhash(arr: ArrayData, salts: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val numHashes = salts.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val base = XXH64.hashLong(arr.getLong(j), 42L)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(salts(i), base)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      j += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  def shingles(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val utf8 = UTF8String.fromString(sb.toString)
      seen.add(XXH64.hashUTF8String(utf8, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  // numeric-array element accessor codes: 0=float 1=double 2=long 3=int
  val FloatCode = 0; val DoubleCode = 1; val LongCode = 2; val IntCode = 3

  def typeCode(et: org.apache.spark.sql.types.DataType): Int = et match {
    case org.apache.spark.sql.types.FloatType => FloatCode
    case org.apache.spark.sql.types.DoubleType => DoubleCode
    case org.apache.spark.sql.types.LongType => LongCode
    case org.apache.spark.sql.types.IntegerType => IntCode
    case other => throw new IllegalArgumentException(other.toString)
  }

  private def numAt(arr: ArrayData, code: Int, i: Int): Double = code match {
    case FloatCode => arr.getFloat(i).toDouble
    case DoubleCode => arr.getDouble(i)
    case LongCode => arr.getLong(i).toDouble
    case _ => arr.getInt(i).toDouble
  }

  /** Canonical dedup-key normalization in ONE pass (the declarative
    * chain — lower + two regexp_replace + trim — runs FOUR passes with
    * regex engines over every document; byte-identical output): any
    * run of non-[a-z0-9] maps to a single interior space, leading and
    * trailing runs drop. */
  def normalizeText(s: UTF8String): UTF8String = {
    // Locale.ROOT: locale-independent mapping — identical to Spark's
    // ASCII fast path for every character that survives the filter
    // (a Turkish-locale JVM would otherwise map 'I' to dotless 'ı')
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(str.length)
    var pendingSpace = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** All hyperplane signatures of one vector in ONE tight loop:
    * signature s packs the sign bits of planes[s·bitsPer .. s·bitsPer
    * + bitsPer − 1] (bit k = 1 when the dot clears 0) — the same
    * arithmetic, element order and bit layout as the per-plane
    * `Similarity.hyperplaneSignature` expression chain, which at
    * LSH-auto chunk counts (hundreds of planes) grows generated code
    * past the JVM's 64 KB method limit and silently drops the whole
    * projection out of codegen. The plane table rides into codegen as
    * one reference object. */
  def hyperplaneSigs(v: ArrayData, code: Int, planes: Array[Array[Double]],
      nSigs: Int, bitsPer: Int): ArrayData = {
    val out = new Array[Long](nSigs)
    var s = 0
    while (s < nSigs) {
      var w = 0L
      var k = 0
      while (k < bitsPer) {
        val p = planes(s * bitsPer + k)
        val n = math.min(v.numElements(), p.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += numAt(v, code, i) * p(i); i += 1 }
        if (acc > 0) w |= 1L << k
        k += 1
      }
      out(s) = w
      s += 1
    }
    new GenericArrayData(out)
  }

  def dot(x: ArrayData, y: ArrayData, cx: Int, cy: Int): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += numAt(x, cx, i) * numAt(y, cy, i); i += 1 }
    s
  }

  def cosine(x: ArrayData, y: ArrayData, cx: Int, cy: Int): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = numAt(x, cx, i); val yv = numAt(y, cy, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Multi-path JSON extraction: ONE tree parse per document, one
    * navigation per path (dotted segments; integer segments index
    * arrays). Scalars render via asText (JSON-quoted strings are
    * unquoted, matching get_json_object); containers re-render as
    * JSON. Missing path or malformed doc → null element.
    */
  def jsonMultiGet(doc: UTF8String, paths: Array[String]): ArrayData = {
    val out = new Array[UTF8String](paths.length)
    try {
      val mapper = JsonMapperHolder.mapper
      val root = mapper.readTree(doc.toString)
      var p = 0
      while (p < paths.length) {
        var node: com.fasterxml.jackson.databind.JsonNode = root
        val segs = paths(p)
        var start = 0
        while (node != null && start <= segs.length) {
          val dot = segs.indexOf('.', start)
          val end = if (dot < 0) segs.length else dot
          if (end > start) {
            val seg = segs.substring(start, end)
            node =
              if (node.isArray && seg.forall(_.isDigit)) node.get(seg.toInt)
              else node.get(seg)
          }
          start = end + 1
        }
        if (node != null && !node.isNull && !node.isMissingNode)
          out(p) = UTF8String.fromString(
            if (node.isValueNode) node.asText else node.toString)
        p += 1
      }
    } catch { case scala.util.control.NonFatal(_) => }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  private object JsonMapperHolder {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  }

  def langId(text: UTF8String): UTF8String = {
    import Sketches.LangId._
    val s = text.toString
    var cjk = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '一' && c <= '鿿') cjk += 1
      i += 1
    }
    if (s.nonEmpty && cjk.toDouble / s.length > 0.2)
      return UTF8String.fromString("zh")
    val words = s.toLowerCase.split("\\s+")
    val hits = new Array[Int](langs.length)
    var n = 0
    words.foreach { w =>
      if (w.nonEmpty) {
        n += 1
        var l = 0
        while (l < langs.length) {
          if (markerSets(l).contains(w)) hits(l) += 1
          l += 1
        }
      }
    }
    val nWords = math.max(n, 1).toDouble
    var best = "und"; var bestScore = 0.005
    var l = 0
    while (l < langs.length) {
      val sc = hits(l) / nWords
      if (sc > bestScore) { best = langs(l); bestScore = sc }
      l += 1
    }
    UTF8String.fromString(best)
  }

  /** Portable (md5-based) min-k document fingerprint in one pass —
    * value-identical to the declarative
    * `concat_ws("", slice(array_sort(array_distinct(md5-grams)), 1, k))`
    * over the non-empty `\s+` split, but without the HOF-lambda
    * re-evaluation of the split per gram. Hex is lowercase, matching
    * both Spark's `md5` and DuckDB's; sort order on hex strings is
    * plain byte order on both. */
  def portableFingerprint(text: UTF8String, shingleSize: Int,
      sketchSize: Int): UTF8String = {
    val words0 = text.toString.split("\\s+", -1)
    var wc = 0
    var i = 0
    while (i < words0.length) { if (words0(i).nonEmpty) wc += 1; i += 1 }
    if (wc < shingleSize) return UTF8String.EMPTY_UTF8
    val words = new Array[String](wc)
    var k = 0
    i = 0
    while (i < words0.length) {
      if (words0(i).nonEmpty) { words(k) = words0(i); k += 1 }
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val sorted = new java.util.TreeSet[String]()
    val sb = new java.lang.StringBuilder
    i = 0
    while (i + shingleSize <= wc) {
      sb.setLength(0)
      var j = 0
      while (j < shingleSize) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = Character.forDigit((digest(b) >> 4) & 0xf, 16)
        hex(2 * b + 1) = Character.forDigit(digest(b) & 0xf, 16)
        b += 1
      }
      sorted.add(new String(hex))
      i += 1
    }
    sb.setLength(0)
    val it = sorted.iterator()
    var taken = 0
    while (it.hasNext && taken < sketchSize) {
      sb.append(it.next()); taken += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Exact-integer invariant of [[graft.operators.Multimodal.extractFeatures]]'s
    * rolling byte hash: Σ over byte positions of (h_i & 0xffff), where
    * h_i = 31·h_{i-1} + signed byte_i (wraparound), h_0 = 1125899906842597.
    * Each vec entry accumulates (h_i & 0xffff)/65536 − 0.5 into one dim, so
    * Σ(vec) + len/2 ≈ rollingHashSum/65536 — an oracle-checkable exact pin
    * for the float feature vectors (reimplementable byte-for-byte in SQL).
    */
  def rollingHashSum(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      sum += (h & 0xffffL)
      i += 1
    }
    sum
  }

  /** First hexDigits nibbles of md5(s) as an int — value-identical to
    * `conv(substring(md5(s), 1, hexDigits), 16, 10)` (lowercase hex on
    * both Spark and DuckDB). */
  private def md5Bucket(md: java.security.MessageDigest, s: String,
      hexDigits: Int): Int = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0
    var i = 0
    while (i < hexDigits) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  /** Split-on-space words (the values of
    * `filter(split(trim(text), " "), _ != "")`: runs of non-0x20 chars —
    * tabs/newlines are NOT separators in that form). */
  private def spaceWords(s: String): java.util.ArrayList[String] = {
    val words = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      if (s.charAt(i) != ' ') {
        var j = i + 1
        while (j < len && s.charAt(j) != ' ') j += 1
        words.add(s.substring(i, j))
        i = j
      } else i += 1
    }
    words
  }

  /** DSIR document score in ONE pass (see Mixture.importanceResample):
    * Σ ratios[md5-bucket(gram)] over unigrams then bigrams, plus the
    * gram count — value-identical to the declarative
    * `aggregate(concat(words, bigrams), 0.0, acc + element_at(...))`
    * tree, which runs as an INTERPRETED projection (HOF lambdas never
    * codegen) and re-evaluates the split five times per row. */
  def dsirScore(text: UTF8String, ratios: Array[Double],
      hexDigits: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val words = spaceWords(text.toString)
    val md = java.security.MessageDigest.getInstance("MD5")
    val wc = words.size
    var score = 0.0
    var i = 0
    while (i < wc) {
      score += ratios(md5Bucket(md, words.get(i), hexDigits))
      i += 1
    }
    i = 0
    while (i + 1 < wc) {
      score += ratios(md5Bucket(md, words.get(i) + " " + words.get(i + 1), hexDigits))
      i += 1
    }
    val nGrams = wc + math.max(wc - 1, 0)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](score, nGrams.toLong))
  }

  /** Σ weights[b] over a bucket-id array — the linear-model scoring
    * step over pre-materialized hashed features (weights.length-1 may
    * serve as a per-doc bias bucket appended to the array). */
  def bucketScore(buckets: ArrayData, weights: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = buckets.numElements()
    while (i < n) { s += weights(buckets.getInt(i)); i += 1 }
    s
  }

  /** SemDeDup centroid assignment: argmax cosine over the broadcast
    * centroid table (ids/cents are parallel arrays), sequential double
    * accumulation in index order with the min-id tiebreak — the exact
    * summation order the DuckDB oracle replays. */
  def centroidArgmax(v: ArrayData, ids: Array[Long],
      cents: Array[Array[Double]]): Long = {
    var bestId = Long.MaxValue
    var bestS = Double.NegativeInfinity
    var k = 0
    while (k < ids.length) {
      val c = cents(k)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      val n = math.min(v.numElements(), c.length)
      var i = 0
      while (i < n) {
        val x = v.getFloat(i).toDouble; val y = c(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val s = if (na == 0.0 || nb == 0.0) 0.0
              else dot / (math.sqrt(na) * math.sqrt(nb))
      if (s > bestS || (s == bestS && ids(k) < bestId)) { bestS = s; bestId = ids(k) }
      k += 1
    }
    bestId
  }

  /** Max cosine of `v` against a reference vector table — the
    * map-side kernel of semantic decontamination ([[graft.operators
    * .Dedup.decontaminateEmbedding]]): the benchmark set is eval-sized
    * by contract, so it rides into codegen like the centroid table. */
  def maxCosine(v: ArrayData, refs: Array[Array[Double]]): Double = {
    var best = -1.0
    var k = 0
    while (k < refs.length) {
      val c = refs(k)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      val n = math.min(v.numElements(), c.length)
      var i = 0
      while (i < n) {
        val x = v.getFloat(i).toDouble; val y = c(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val s = if (na == 0.0 || nb == 0.0) 0.0
              else dot / (math.sqrt(na) * math.sqrt(nb))
      if (s > best) best = s
      k += 1
    }
    best
  }

  /** The gram → md5-bucket ids of [[dsirScore]] as an int array (the
    * bucket-count pass explodes these instead of materializing gram
    * strings through an interpreted generator). */
  def dsirBuckets(text: UTF8String, hexDigits: Int): ArrayData = {
    val words = spaceWords(text.toString)
    val md = java.security.MessageDigest.getInstance("MD5")
    val wc = words.size
    val out = new Array[Int](wc + math.max(wc - 1, 0))
    var i = 0
    while (i < wc) {
      out(i) = md5Bucket(md, words.get(i), hexDigits)
      i += 1
    }
    i = 0
    while (i + 1 < wc) {
      out(wc + i) = md5Bucket(md, words.get(i) + " " + words.get(i + 1), hexDigits)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
