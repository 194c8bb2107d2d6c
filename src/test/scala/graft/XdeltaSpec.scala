package graft

import graft.functions.{Vcdiff, Xdelta}

/** The xdelta aggregate state machine (merge.cpp semantics): header
  * wire codec, hash-chain verification, error lowering, fold order.
  */
class XdeltaSpec extends SparkSpec {

  private def b(s: String) = s.getBytes("UTF-8")

  test("state header round-trips through the proto2 wire codec") {
    val st = Xdelta.State(Xdelta.Header(tpe = Xdelta.Patch, baseHash = 123,
      stateHash = 456, stateSize = 7, dataSize = 3), Array[Byte](1, 2, 3))
    val back = Xdelta.decodeState(Xdelta.encodeState(st))
    assert(back.header == st.header)
    assert(back.payload.toSeq == Seq[Byte](1, 2, 3))
  }

  test("BASE then PATCH chain reconstructs the final state") {
    val s0 = b("v0"); val s1 = b("v1-longer"); val s2 = b("v2")
    val folded = Xdelta.mergeStates(
      Xdelta.mergeStates(Xdelta.makeBase(s0), Xdelta.makePatch(s0, s1)),
      Xdelta.makePatch(s1, s2))
    assert(Xdelta.statePayload(folded).toSeq == s2.toSeq)
  }

  test("PATCH then PATCH composes before the base arrives (map-side partial)") {
    val s0 = b("a"); val s1 = b("bb"); val s2 = b("ccc")
    val composed = Xdelta.mergeStates(Xdelta.makePatch(s0, s1), Xdelta.makePatch(s1, s2))
    val h = Xdelta.decodeState(composed).header
    assert(h.tpe == Xdelta.Patch)
    assert(h.baseHash == Xdelta.hash32(s0) && h.stateHash == Xdelta.hash32(s2))
    val applied = Xdelta.mergeStates(Xdelta.makeBase(s0), composed)
    assert(Xdelta.statePayload(applied).toSeq == s2.toSeq)
  }

  test("broken hash chains lower to typed error headers, never throw") {
    val s0 = b("x"); val s1 = b("y"); val s2 = b("z")
    // patch whose base hash doesn't match the actual base
    val bad = Xdelta.mergeStates(Xdelta.makeBase(s2), Xdelta.makePatch(s0, s1))
    assert(Xdelta.decodeState(bad).header.errorCode == Xdelta.BaseHashError)
    assert(Xdelta.statePayload(bad) == null)
    // two patches that don't link
    val badPair = Xdelta.mergeStates(Xdelta.makePatch(s0, s1), Xdelta.makePatch(s2, s0))
    assert(Xdelta.decodeState(badPair).header.errorCode == Xdelta.MergePatchesError)
    // garbage input
    assert(Xdelta.decodeState(Array[Byte](9, 9)).header.errorCode == Xdelta.HeaderParseError)
  }

  test("delta codec: COPY/ADD roundtrip, compression on similar states, composition") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(4096)(rnd.nextInt(256).toByte)
    // target = base with a small splice in the middle — the delta must be
    // tiny relative to the state (the whole point of the codec)
    val target = base.take(1000) ++ b("spliced-in-edit") ++ base.drop(1010)
    val d = Xdelta.diff(base, target)
    assert(Xdelta.patch(base, d).toSeq == target.toSeq)
    assert(d.length < target.length / 10,
      s"delta ${d.length}B not small vs target ${target.length}B")
    // unrelated target degrades to literals but still roundtrips
    val unrelated = Array.fill(100)(rnd.nextInt(256).toByte)
    assert(Xdelta.patch(base, Xdelta.diff(base, unrelated)).toSeq == unrelated.toSeq)
    // empty/short bases
    assert(Xdelta.patch(Array.empty, Xdelta.diff(Array.empty, b("abc"))).toSeq == b("abc").toSeq)
    // composition: (base→s1) ∘ (s1→s2) applied to base == s2, without s1
    val s1 = base.take(2000) ++ b("v1") ++ base.drop(2000)
    val s2 = s1.take(300) ++ b("v2-edit") ++ s1.drop(310)
    val composed = Xdelta.composeDeltas(Xdelta.diff(base, s1), Xdelta.diff(s1, s2))
    assert(Xdelta.patch(base, composed).toSeq == s2.toSeq)
  }

  test("long patch chains fold to the right state through composed deltas") {
    val states = (0 to 8).map(i => b(s"common-prefix-shared-across-versions-$i-" + "x" * 64))
    val patches = states.sliding(2).map { case Seq(p, n) => Xdelta.makePatch(p, n) }.toSeq
    // compose all patches first (map-side partial), then apply to the base
    val partial = patches.reduce(Xdelta.mergeStates)
    val applied = Xdelta.mergeStates(Xdelta.makeBase(states.head), partial)
    assert(Xdelta.statePayload(applied).toSeq == states.last.toSeq)
  }

  test("vcdiff: golden RFC 3284 bytes for an ADD-only delta") {
    // no base match possible (base shorter than the match block) → the
    // whole target is one ADD; window has no source segment
    val base = "hello world".getBytes("UTF-8")
    val target = "hello spark world".getBytes("UTF-8")
    val vc = Vcdiff.encode(base, target)
    val expected =
      Array(0xd6, 0xc3, 0xc4, // "VCD" | 0x80
        0x00, // version
        0x00, // hdr_indicator
        0x00, // win_indicator: no source segment
        24,   // delta encoding length: 1+1+1+1+1 + 17 data + 2 inst
        17,   // target window length
        0x00, // delta_indicator
        17,   // data section length
        2,    // inst section length
        0     // addr section length
      ).map(_.toByte) ++ target ++ Array(0x01, 17).map(_.toByte)
    assert(vc.toSeq == expected.toSeq,
      vc.map(b => b & 0xff).mkString(","))
    assert(Vcdiff.fromVcdiff(base, vc).toSeq == target.toSeq)
  }

  test("vcdiff: copies emit VCD_SOURCE windows and self-decode exactly") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(512)(rnd.nextInt(256).toByte)
    // target = two base slices + noise between
    val target = base.slice(0, 200) ++ "NEW BYTES".getBytes ++
      base.slice(300, 500) ++ "tail".getBytes
    val vc = Vcdiff.encode(base, target)
    assert((vc(5) & 0x01) == 0x01, "expected VCD_SOURCE window")
    assert(Vcdiff.fromVcdiff(base, vc).toSeq == target.toSeq)
    // and the wire is a real delta, not a literal dump
    assert(vc.length < target.length / 2, s"${vc.length} vs ${target.length}")
    // random-pair property: always reconstructs
    (0 until 20).foreach { i =>
      val b = Array.fill(rnd.nextInt(400))(rnd.nextInt(256).toByte)
      val t0 = if (b.nonEmpty && i % 2 == 0)
        b.slice(0, rnd.nextInt(b.length)) ++
          Array.fill(rnd.nextInt(50))(rnd.nextInt(256).toByte) ++ b
      else Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      assert(Vcdiff.fromVcdiff(b, Vcdiff.encode(b, t0)).toSeq == t0.toSeq)
    }
  }

  test("vcdiff decoder covers the default code table beyond our encoder") {
    // hand-built window using compact opcodes: ADD size 3 (index 4),
    // then RUN (index 0, size 2), then combined ADD(1)+COPY(4, SELF)
    // (index 163) — none of which our encoder emits
    val base = "abcdefgh".getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    Seq(0xd6, 0xc3, 0xc4, 0x00, 0x00).foreach(out.write)
    out.write(0x01) // VCD_SOURCE
    out.write(8); out.write(0) // source segment: whole base at 0
    val data = "XYZq!".getBytes("UTF-8") // ADD 3 takes XYZ, RUN takes q, ADD 1 takes !
    val inst = Array(4, 0, 2, 163) // ADD3, RUN(size 2), ADD1+COPY4-SELF
    val addr = Array(2) // COPY from base offset 2 → cdef
    val body = new java.io.ByteArrayOutputStream()
    body.write(10) // target window length: 3 + 2 + 1 + 4
    body.write(0)
    body.write(data.length); body.write(inst.length); body.write(addr.length)
    body.write(data); inst.foreach(body.write); addr.foreach(body.write)
    out.write(body.size())
    body.writeTo(out)
    val got = Vcdiff.fromVcdiff(base, out.toByteArray)
    assert(new String(got, "UTF-8") == "XYZqq!cdef")
  }

  test("a newer BASE supersedes whatever came before") {
    val folded = Xdelta.mergeStates(Xdelta.makeBase(b("old")), Xdelta.makeBase(b("new")))
    assert(Xdelta.statePayload(folded).toSeq == b("new").toSeq)
    val afterPatch = Xdelta.mergeStates(Xdelta.makePatch(b("p"), b("q")), Xdelta.makeBase(b("new")))
    assert(Xdelta.statePayload(afterPatch).toSeq == b("new").toSeq)
  }
}
