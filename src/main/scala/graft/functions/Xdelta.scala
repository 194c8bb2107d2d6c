package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The `xdelta` aggregate column merge (SURVEY.md §2.A; reference
  * builtin_function_registry.cpp:241-253, udf/xdelta3.c,
  * library/cpp/xdelta3/state/merge.cpp) — delta-encoded aggregate
  * states for sorted dynamic tables: a write is either a full BASE
  * state or a PATCH against the previous state, and the row merger
  * folds adjacent states pairwise.
  *
  * Wire layout is the reference's exactly: `varint(headerSize) +
  * proto2 TStateHeader + payload` (state.cpp ParseHeader /
  * EncodeHeaderTo; header fields per state_header.proto: type=1,
  * base_hash=2, state_hash=3, state_size=4, data_size=5,
  * error_code=6). The full merge state machine is implemented —
  * newest BASE wins, PATCH∘PATCH composes when the hash chain links
  * (lhs.state_hash == rhs.base_hash), BASE+PATCH applies with
  * base-hash / state-size / state-hash verification, and every failure
  * lowers to the reference's typed error headers instead of throwing.
  *
  * Documented divergences: (a) the patch payload carries the target
  * state verbatim instead of an xdelta3/VCDIFF delta — protocol- and
  * header-compatible, not payload-compatible; swap [[Xdelta.diff]] /
  * [[Xdelta.patch]] for a VCDIFF codec for wire parity. (b) the 32-bit
  * state hash is xxhash64 folded to 32 bits, not the reference's
  * murmur (same stance as farm_hash → xxhash64).
  */
object Xdelta {

  // TStateHeader.EType
  val NoneType = 0; val Base = 1; val Patch = 2
  // TStateHeader.EErrorCode (subset we can produce)
  val NoError = 0
  val HeaderParseError = 1
  val BaseHashError = 2
  val StateHashError = 3
  val MergePatchesError = 4
  val StateSizeError = 9

  final case class Header(tpe: Int = NoneType, baseHash: Long = -1,
      stateHash: Long = -1, stateSize: Long = -1, dataSize: Long = -1,
      errorCode: Int = -1)

  final case class State(header: Header, payload: Array[Byte])

  /** 32-bit state hash (ui32 in the header). */
  def hash32(data: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < data.length) {
      h = h * 1099511628211L ^ (data(i) & 0xffL)
      i += 1
    }
    (h ^ (h >>> 32)) & 0xffffffffL
  }

  // --- proto2 header codec (wire-compatible with state_header.proto) ---

  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def encodeHeaderBody(h: Header): Array[Byte] = {
    val out = new ByteArrayOutputStream(24)
    def field(num: Int, v: Long): Unit =
      if (v >= 0) { writeVarint(out, (num.toLong << 3) | 0); writeVarint(out, v) }
    field(1, if (h.tpe == NoneType) -1 else h.tpe.toLong)
    field(2, h.baseHash)
    field(3, h.stateHash)
    field(4, h.stateSize)
    field(5, h.dataSize)
    field(6, h.errorCode.toLong)
    out.toByteArray
  }

  def encodeState(s: State): Array[Byte] = {
    val body = encodeHeaderBody(s.header)
    val out = new ByteArrayOutputStream(body.length + s.payload.length + 2)
    writeVarint(out, body.length.toLong)
    out.write(body)
    out.write(s.payload)
    out.toByteArray
  }

  def decodeState(data: Array[Byte]): State = {
    if (data == null || data.isEmpty)
      return State(Header(errorCode = HeaderParseError), Array.empty)
    var p = 0
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        val b = data(p); p += 1
        v |= (b.toLong & 0x7f) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    try {
      val headerSize = varint().toInt
      val headerEnd = p + headerSize
      if (headerEnd > data.length)
        return State(Header(errorCode = HeaderParseError), Array.empty)
      var h = Header()
      while (p < headerEnd) {
        val key = varint()
        val v = varint()
        ((key >>> 3).toInt: @annotation.switch) match {
          case 1 => h = h.copy(tpe = v.toInt)
          case 2 => h = h.copy(baseHash = v)
          case 3 => h = h.copy(stateHash = v)
          case 4 => h = h.copy(stateSize = v)
          case 5 => h = h.copy(dataSize = v)
          case 6 => h = h.copy(errorCode = v.toInt)
          case _ =>
        }
      }
      State(h, java.util.Arrays.copyOfRange(data, headerEnd, data.length))
    } catch {
      case _: Exception => State(Header(errorCode = HeaderParseError), Array.empty)
    }
  }

  // --- payload codec: COPY/ADD delta (xdelta3's core instruction set,
  // udf/xdelta3.c). The wire format is ours (varint-framed ops), but the
  // semantics match: a patch payload is a program rebuilding the target
  // from base copies plus literal runs, and two patch programs compose
  // without the base state (xdelta3's merge API — the map-side partial
  // fold below depends on exactly that property).

  private val DeltaMagic: Int = 0xDC
  private val OpAdd = 0
  private val OpCopy = 1
  private val MatchBlock = 16 // rolling index granularity over the base

  private def readVarint(data: Array[Byte], pos: Array[Int]): Long = {
    var shift = 0; var v = 0L
    while ({
      val b = data(pos(0)) & 0xff; pos(0) += 1
      v |= (b & 0x7fL) << shift; shift += 7
      (b & 0x80) != 0
    }) ()
    v
  }

  /** Delta of `to` against `from`: greedy block matching. The base is
    * indexed at [[MatchBlock]]-aligned offsets by a polynomial hash;
    * each verified seed extends forward byte-wise and backward into the
    * pending literal, so runs far longer than a block become one COPY. */
  def diff(from: Array[Byte], to: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(to.length / 4 + 16)
    out.write(DeltaMagic)
    writeVarint(out, to.length.toLong)
    val lit = new ByteArrayOutputStream()
    def flushLit(): Unit = if (lit.size() > 0) {
      out.write(OpAdd); writeVarint(out, lit.size().toLong)
      lit.writeTo(out); lit.reset()
    }
    def blockHash(a: Array[Byte], off: Int): Long = {
      var h = 1125899906842597L; var i = 0
      while (i < MatchBlock) { h = h * 31 + (a(off + i) & 0xff); i += 1 }
      h
    }
    val index = new java.util.HashMap[Long, java.util.ArrayList[Integer]]()
    if (from != null && from.length >= MatchBlock) {
      var o = 0
      while (o + MatchBlock <= from.length) {
        index.computeIfAbsent(blockHash(from, o), _ => new java.util.ArrayList)
          .add(o)
        o += MatchBlock
      }
    }
    var i = 0
    while (i < to.length) {
      var emitted = false
      if (i + MatchBlock <= to.length && !index.isEmpty) {
        val cands = index.get(blockHash(to, i))
        if (cands != null) {
          // best candidate = longest verified extension
          var bestOff = -1; var bestLen = 0
          val it = cands.iterator()
          while (it.hasNext) {
            val o = it.next().intValue()
            var l = 0
            while (o + l < from.length && i + l < to.length && from(o + l) == to(i + l)) l += 1
            if (l >= MatchBlock && l > bestLen) { bestOff = o; bestLen = l }
          }
          if (bestOff >= 0) {
            // absorb the tail of the pending literal into the copy
            var back = 0
            while (back < lit.size() && bestOff - back > 0 &&
              from(bestOff - back - 1) == to(i - back - 1)) back += 1
            if (back > 0) {
              val keep = lit.toByteArray.dropRight(back)
              lit.reset(); lit.write(keep, 0, keep.length)
            }
            flushLit()
            out.write(OpCopy)
            writeVarint(out, (bestOff - back).toLong)
            writeVarint(out, (bestLen + back).toLong)
            i += bestLen
            emitted = true
          }
        }
      }
      if (!emitted) { lit.write(to(i)); i += 1 }
    }
    flushLit()
    out.toByteArray
  }

  /** Walk a [[diff]] delta's instruction stream — the hook
    * [[Vcdiff.toVcdiff]] re-encodes from (`onAdd` receives the delta
    * buffer + offset/length of the literal run; `onCopy` the base
    * offset and length). */
  private[functions] def foreachInstruction(delta: Array[Byte])(
      onAdd: (Array[Byte], Int, Int) => Unit,
      onCopy: (Int, Int) => Unit): Unit = {
    require(delta.nonEmpty && (delta(0) & 0xff) == DeltaMagic, "bad delta magic")
    val pos = Array(1)
    readVarint(delta, pos) // target length
    while (pos(0) < delta.length) {
      delta(pos(0)) match {
        case 0 =>
          pos(0) += 1
          val len = readVarint(delta, pos).toInt
          onAdd(delta, pos(0), len)
          pos(0) += len
        case 1 =>
          pos(0) += 1
          val off = readVarint(delta, pos).toInt
          val len = readVarint(delta, pos).toInt
          onCopy(off, len)
        case op => throw new IllegalArgumentException(s"bad delta op $op")
      }
    }
  }

  /** Apply [[diff]] output to a base. */
  def patch(base: Array[Byte], delta: Array[Byte]): Array[Byte] = {
    require(delta.nonEmpty && (delta(0) & 0xff) == DeltaMagic, "bad delta magic")
    val pos = Array(1)
    val targetLen = readVarint(delta, pos).toInt
    val out = new Array[Byte](targetLen)
    var w = 0
    while (pos(0) < delta.length) {
      delta(pos(0)) match {
        case 0 =>
          pos(0) += 1
          val len = readVarint(delta, pos).toInt
          System.arraycopy(delta, pos(0), out, w, len)
          pos(0) += len; w += len
        case 1 =>
          pos(0) += 1
          val off = readVarint(delta, pos).toInt
          val len = readVarint(delta, pos).toInt
          System.arraycopy(base, off, out, w, len)
          w += len
        case op => throw new IllegalArgumentException(s"bad delta op $op")
      }
    }
    require(w == targetLen, s"delta produced $w of $targetLen bytes")
    out
  }

  /** Compose `d1: base→s1` with `d2: s1→s2` into `base→s2` WITHOUT any
    * state bytes — d2's COPY ranges (offsets into s1) resolve through
    * d1's instruction list: sections d1 copied from the base stay
    * copies (shifted), sections d1 added resolve to literals. */
  def composeDeltas(d1: Array[Byte], d2: Array[Byte]): Array[Byte] = {
    // decode d1 into (s1Start, len, op, literalBytes|baseOff) spans
    final case class Span(start: Int, len: Int, isCopy: Boolean,
                          baseOff: Int, lit: Array[Byte], litOff: Int)
    val spans = scala.collection.mutable.ArrayBuffer.empty[Span]
    locally {
      require(d1.nonEmpty && (d1(0) & 0xff) == DeltaMagic, "bad delta magic")
      val pos = Array(1); readVarint(d1, pos) // s1 length
      var s = 0
      while (pos(0) < d1.length) {
        d1(pos(0)) match {
          case 0 =>
            pos(0) += 1
            val len = readVarint(d1, pos).toInt
            spans += Span(s, len, isCopy = false, -1, d1, pos(0))
            pos(0) += len; s += len
          case 1 =>
            pos(0) += 1
            val off = readVarint(d1, pos).toInt
            val len = readVarint(d1, pos).toInt
            spans += Span(s, len, isCopy = true, off, null, -1)
            s += len
        }
      }
    }
    val starts = spans.map(_.start).toArray
    val out = new ByteArrayOutputStream(d2.length + 16)
    out.write(DeltaMagic)
    val pos = Array(1)
    val targetLen = readVarint(d2, pos)
    require((d2(0) & 0xff) == DeltaMagic, "bad delta magic")
    writeVarint(out, targetLen)
    def emitCopyRange(off: Int, len: Int): Unit = {
      // walk the s1 range [off, off+len) across d1's spans
      var cur = off; val end = off + len
      while (cur < end) {
        var idx = java.util.Arrays.binarySearch(starts, cur)
        if (idx < 0) idx = -idx - 2
        val sp = spans(idx)
        val take = math.min(end - cur, sp.start + sp.len - cur)
        val rel = cur - sp.start
        if (sp.isCopy) {
          out.write(OpCopy)
          writeVarint(out, (sp.baseOff + rel).toLong)
          writeVarint(out, take.toLong)
        } else {
          out.write(OpAdd); writeVarint(out, take.toLong)
          out.write(sp.lit, sp.litOff + rel, take)
        }
        cur += take
      }
    }
    while (pos(0) < d2.length) {
      d2(pos(0)) match {
        case 0 =>
          pos(0) += 1
          val len = readVarint(d2, pos).toInt
          out.write(OpAdd); writeVarint(out, len.toLong)
          out.write(d2, pos(0), len)
          pos(0) += len
        case 1 =>
          pos(0) += 1
          val off = readVarint(d2, pos).toInt
          val len = readVarint(d2, pos).toInt
          emitCopyRange(off, len)
      }
    }
    out.toByteArray
  }

  // --- state constructors (the write path) ---

  def makeBase(state: Array[Byte]): Array[Byte] =
    encodeState(State(Header(tpe = Base, dataSize = state.length.toLong), state))

  def makePatch(prev: Array[Byte], next: Array[Byte]): Array[Byte] = {
    val payload = diff(prev, next)
    encodeState(State(Header(tpe = Patch,
      baseHash = hash32(prev), stateHash = hash32(next),
      stateSize = next.length.toLong, dataSize = payload.length.toLong), payload))
  }

  private def error(code: Int): Array[Byte] =
    encodeState(State(Header(errorCode = code), Array.empty))

  /** An empty patch (nothing changed) must still link the hash chain
    * (merge.cpp IsBadEmptyPatch). */
  private def isBadEmptyPatch(s: State): Boolean =
    s.payload.isEmpty && s.header.dataSize <= 0 &&
      s.header.baseHash != s.header.stateHash

  /** The reference's MergeStates (merge.cpp:188+): fold `lhs` (older)
    * with `rhs` (newer). */
  def mergeStates(lhsData: Array[Byte], rhsData: Array[Byte]): Array[Byte] = {
    if (rhsData == null) return lhsData
    if (lhsData == null) return rhsData
    val rhs = decodeState(rhsData)
    if (rhs.header.errorCode > 0) return error(rhs.header.errorCode)
    if (rhs.header.tpe == Base) return rhsData // newest base supersedes
    val lhs = decodeState(lhsData)
    if (lhs.header.errorCode > 0) return error(lhs.header.errorCode)

    (lhs.header.tpe, rhs.header.tpe) match {
      case (Patch, Patch) =>
        if (lhs.header.stateHash != rhs.header.baseHash) error(MergePatchesError)
        else if (isBadEmptyPatch(lhs) || isBadEmptyPatch(rhs)) error(MergePatchesError)
        else if (lhs.payload.isEmpty) rhsData
        else if (rhs.payload.isEmpty)
          // rhs changed nothing: keep lhs's delta, extend the chain tip
          encodeState(State(lhs.header.copy(stateHash = rhs.header.stateHash,
            stateSize = rhs.header.stateSize), lhs.payload))
        else {
          // compose lhs (base→s1) with rhs (s1→s2) into base→s2 — the
          // instruction-level merge (no state bytes needed), xdelta3's
          // patch-merge property
          val payload =
            try composeDeltas(lhs.payload, rhs.payload)
            catch { case _: Exception => return error(MergePatchesError) }
          encodeState(State(Header(tpe = Patch,
            baseHash = lhs.header.baseHash, stateHash = rhs.header.stateHash,
            stateSize = rhs.header.stateSize,
            dataSize = payload.length.toLong), payload))
        }
      case (Base, Patch) =>
        val baseHash = hash32(lhs.payload)
        if (baseHash != rhs.header.baseHash) error(BaseHashError)
        else if (rhs.payload.isEmpty && rhs.header.dataSize <= 0) {
          if (rhs.header.stateSize != lhs.payload.length) error(StateSizeError)
          else if (rhs.header.stateHash != baseHash) error(StateHashError)
          else lhsData
        } else {
          val next =
            try patch(lhs.payload, rhs.payload)
            catch { case _: Exception => return error(StateHashError) }
          if (next.length.toLong != rhs.header.stateSize) error(StateSizeError)
          else if (hash32(next) != rhs.header.stateHash) error(StateHashError)
          else makeBase(next)
        }
      case _ => error(MergePatchesError)
    }
  }

  /** The aggregate: fold states in write order (xdelta_merge in
    * udf/xdelta3.c — update is "not applicable", states merge
    * pairwise; null input keeps the accumulated state). */
  val xdelta: Aggregator[Array[Byte], Array[Byte], Array[Byte]] =
    new Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = null
      def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = mergeStates(b, a)
      def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = mergeStates(x, y)
      def finish(r: Array[Byte]): Array[Byte] = r
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Unwrap a merged state to the logical value (BASE payload). */
  def statePayload(data: Array[Byte]): Array[Byte] = {
    val s = decodeState(data)
    if (s.header.errorCode > 0 || s.header.tpe != Base) null else s.payload
  }

  /** [[xdelta]] with the final state unwrapped to its payload — the
    * read-path view of the aggregate column. */
  val xdeltaValue: Aggregator[Array[Byte], Array[Byte], Array[Byte]] =
    new Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = null
      def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = mergeStates(b, a)
      def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = mergeStates(x, y)
      def finish(r: Array[Byte]): Array[Byte] = statePayload(r)
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }
}
