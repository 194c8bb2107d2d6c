package graft.functions

import java.io.ByteArrayOutputStream

/** VCDIFF (RFC 3284) wire format over the [[Xdelta]] instruction
  * stream — the standard generic-delta encoding the reference's xdelta
  * UDF speaks on the wire (reference udf/xdelta3.c; RFC 3284 is the
  * public spec this implements from).
  *
  * [[toVcdiff]] re-encodes an [[Xdelta.diff]] delta (ADD/COPY spans)
  * as a single-window VCDIFF delta with the whole base as the source
  * segment; [[fromVcdiff]] is a full RFC decoder — default code table
  * (built per §7), address caches (near/same, §5.3), combined
  * opcodes — so it reads deltas from other standard encoders, not
  * just our own. No secondary compression (hdr_indicator 0), like
  * open-source xdelta3's default.
  */
object Vcdiff {

  // ——— big-endian base-128 varints (RFC 3284 §2) ———
  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    require(value >= 0)
    val bytes = scala.collection.mutable.ArrayBuffer.empty[Int]
    var v = value
    bytes += (v & 0x7f).toInt
    v >>>= 7
    while (v != 0) { bytes += ((v & 0x7f) | 0x80).toInt; v >>>= 7 }
    bytes.reverse.foreach(out.write)
  }

  private def readVarint(data: Array[Byte], pos: Array[Int]): Long = {
    var v = 0L
    var b = 0
    while ({
      b = data(pos(0)) & 0xff; pos(0) += 1
      v = (v << 7) | (b & 0x7f)
      (b & 0x80) != 0
    }) ()
    v
  }

  // ——— default code table (RFC 3284 §5.6/§7) ———
  private final val RUN = 0
  private final val ADD = 1
  private final val COPY = 2
  private final case class Inst(tpe: Int, size: Int, mode: Int)
  private final case class Entry(first: Inst, second: Option[Inst])

  private val DefaultTable: Array[Entry] = {
    val t = scala.collection.mutable.ArrayBuffer.empty[Entry]
    t += Entry(Inst(RUN, 0, 0), None)
    for (size <- 0 to 17) t += Entry(Inst(ADD, size, 0), None)
    for (mode <- 0 to 8) {
      t += Entry(Inst(COPY, 0, mode), None)
      for (size <- 4 to 18) t += Entry(Inst(COPY, size, mode), None)
    }
    for (mode <- 0 to 5; s1 <- 1 to 4; s2 <- 4 to 6)
      t += Entry(Inst(ADD, s1, 0), Some(Inst(COPY, s2, mode)))
    for (mode <- 6 to 8; s1 <- 1 to 4)
      t += Entry(Inst(ADD, s1, 0), Some(Inst(COPY, 4, mode)))
    for (mode <- 0 to 8)
      t += Entry(Inst(COPY, 4, mode), Some(Inst(ADD, 1, 0)))
    require(t.length == 256, s"code table has ${t.length} entries")
    t.toArray
  }

  /** Address cache (RFC 3284 §5.3): near size 4, same size 3. */
  private final class AddrCache {
    private val near = new Array[Long](4)
    private val same = new Array[Long](3 * 256)
    private var nextSlot = 0
    def update(addr: Long): Unit = {
      near(nextSlot) = addr
      nextSlot = (nextSlot + 1) % near.length
      same((addr % same.length).toInt) = addr
    }
    /** Decode one address for `mode` with `here` = current position in
      * the combined source+target address space. */
    def decode(data: Array[Byte], pos: Array[Int], here: Long, mode: Int): Long = {
      val addr = mode match {
        case 0 => readVarint(data, pos) // VCD_SELF
        case 1 => here - readVarint(data, pos) // VCD_HERE
        case m if m - 2 < near.length => near(m - 2) + readVarint(data, pos)
        case m =>
          val i = (data(pos(0)) & 0xff); pos(0) += 1
          same((m - 2 - near.length) * 256 + i)
      }
      update(addr)
      addr
    }
    /** Encode `addr` with VCD_SELF, keeping the cache in sync (the
      * decoder updates its cache on every address, so the encoder must
      * too even when it always picks mode 0). */
    def encodeSelf(out: ByteArrayOutputStream, addr: Long): Unit = {
      writeVarint(out, addr)
      update(addr)
    }
  }

  /** Re-encode an [[Xdelta.diff]] delta as RFC 3284 VCDIFF bytes: one
    * window, source segment = the whole base (so every COPY is
    * VCD_SELF into the source), opcodes 1 (ADD, explicit size) and 19
    * (COPY mode 0, explicit size). */
  def toVcdiff(base: Array[Byte], xdelta: Array[Byte]): Array[Byte] = {
    val data = new ByteArrayOutputStream()
    val inst = new ByteArrayOutputStream()
    val addrs = new ByteArrayOutputStream()
    val cache = new AddrCache
    var targetLen = 0L
    var hasCopy = false
    // walk the internal instruction stream (Xdelta.diff layout:
    // magic, targetLen varint (LE base-128), then ADD/COPY ops)
    Xdelta.foreachInstruction(xdelta)(
      onAdd = (bytes, off, len) => {
        data.write(bytes, off, len)
        inst.write(1) // ADD, size follows
        writeVarint(inst, len.toLong)
        targetLen += len
      },
      onCopy = (srcOff, len) => {
        hasCopy = true
        inst.write(19) // COPY mode 0 (SELF), size follows
        writeVarint(inst, len.toLong)
        cache.encodeSelf(addrs, srcOff.toLong)
        targetLen += len
      })
    val out = new ByteArrayOutputStream()
    out.write(0xd6); out.write(0xc3); out.write(0xc4) // "VCD" | 0x80
    out.write(0x00) // version
    out.write(0x00) // hdr_indicator: no compression, no custom table
    val srcLen = if (base == null) 0 else base.length
    out.write(if (hasCopy) 0x01 else 0x00) // win_indicator: VCD_SOURCE
    if (hasCopy) {
      writeVarint(out, srcLen.toLong) // source segment length
      writeVarint(out, 0L) // source segment position
    }
    // delta encoding = targetLen, delta_indicator, 3 section lengths,
    // 3 sections
    val body = new ByteArrayOutputStream()
    writeVarint(body, targetLen)
    body.write(0x00) // delta_indicator
    writeVarint(body, data.size().toLong)
    writeVarint(body, inst.size().toLong)
    writeVarint(body, addrs.size().toLong)
    data.writeTo(body); inst.writeTo(body); addrs.writeTo(body)
    writeVarint(out, body.size().toLong)
    body.writeTo(out)
    out.toByteArray
  }

  /** Convenience: base + target → VCDIFF bytes. */
  def encode(base: Array[Byte], target: Array[Byte]): Array[Byte] =
    toVcdiff(base, Xdelta.diff(base, target))

  /** Full RFC 3284 decoder (default code table, address caches,
    * combined opcodes, multi-window; no secondary compression). */
  def fromVcdiff(base: Array[Byte], vcdiff: Array[Byte]): Array[Byte] = {
    val pos = Array(0)
    def u8(): Int = { val b = vcdiff(pos(0)) & 0xff; pos(0) += 1; b }
    require(u8() == 0xd6 && u8() == 0xc3 && u8() == 0xc4, "bad VCDIFF magic")
    require(u8() == 0x00, "unsupported VCDIFF version")
    val hdrInd = u8()
    require((hdrInd & 0x03) == 0, "secondary compression/custom table unsupported")
    if ((hdrInd & 0x04) != 0) { // VCD_APPHEADER: skip
      val n = readVarint(vcdiff, pos).toInt
      pos(0) += n
    }
    val target = new ByteArrayOutputStream()
    while (pos(0) < vcdiff.length) {
      val winInd = u8()
      val (srcSeg, srcSegLen) =
        if ((winInd & 0x01) != 0) { // VCD_SOURCE
          val len = readVarint(vcdiff, pos).toInt
          val p = readVarint(vcdiff, pos).toInt
          (java.util.Arrays.copyOfRange(base, p, p + len), len)
        } else if ((winInd & 0x02) != 0) { // VCD_TARGET
          val len = readVarint(vcdiff, pos).toInt
          val p = readVarint(vcdiff, pos).toInt
          val t = target.toByteArray
          (java.util.Arrays.copyOfRange(t, p, p + len), len)
        } else (Array.empty[Byte], 0)
      readVarint(vcdiff, pos) // delta encoding length
      val targetWinLen = readVarint(vcdiff, pos).toInt
      require(u8() == 0, "compressed sections unsupported")
      val dataLen = readVarint(vcdiff, pos).toInt
      val instLen = readVarint(vcdiff, pos).toInt
      val addrLen = readVarint(vcdiff, pos).toInt
      val dataPos = Array(pos(0))
      val instPos = Array(pos(0) + dataLen)
      val addrPos = Array(pos(0) + dataLen + instLen)
      pos(0) += dataLen + instLen + addrLen
      val win = new Array[Byte](targetWinLen)
      var w = 0
      val cache = new AddrCache
      def run(i: Inst): Unit = i.tpe match {
        case RUN =>
          val size = if (i.size == 0) readVarint(vcdiff, instPos).toInt else i.size
          val b = vcdiff(dataPos(0)); dataPos(0) += 1
          java.util.Arrays.fill(win, w, w + size, b)
          w += size
        case ADD =>
          val size = if (i.size == 0) readVarint(vcdiff, instPos).toInt else i.size
          System.arraycopy(vcdiff, dataPos(0), win, w, size)
          dataPos(0) += size; w += size
        case COPY =>
          val size = if (i.size == 0) readVarint(vcdiff, instPos).toInt else i.size
          val addr = cache.decode(vcdiff, addrPos, srcSegLen + w, i.mode).toInt
          var k = 0
          while (k < size) {
            // addresses below srcSegLen hit the source segment; above
            // it, the target window built so far (self-referential
            // copies overlap byte-by-byte, RFC §5.4)
            win(w) = if (addr + k < srcSegLen) srcSeg(addr + k)
              else win(addr + k - srcSegLen)
            w += 1; k += 1
          }
      }
      while (instPos(0) < pos(0) - addrLen) {
        val entry = DefaultTable(vcdiff(instPos(0)) & 0xff)
        instPos(0) += 1
        run(entry.first)
        entry.second.foreach(run)
      }
      require(w == targetWinLen, s"window produced $w of $targetWinLen bytes")
      target.write(win)
    }
    target.toByteArray
  }
}
