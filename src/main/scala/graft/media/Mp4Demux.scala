package graft.media

/** ISO-BMFF (MP4, ISO/IEC 14496-12) BOX-WALK demuxer: parses the
  * container structure — `moov/trak/mdia/minf/stbl` with the sample
  * tables `stts` (decode deltas), `stsc` (sample→chunk runs), `stsz`
  * (sample sizes) and `stco`/`co64` (chunk offsets) — and resolves
  * every sample's FILE OFFSET, size and decode timestamp. This is the
  * pure-JVM half of video handling: frame *decode* needs a codec the
  * container doesn't ship, but the sample TABLE is plain big-endian
  * arithmetic, so frame sampling can address real sample bytes
  * instead of fixed-size chunks ([[graft.operators.Multimodal]]
  * keeps its clearly-marked stub chunker for non-BMFF payloads).
  *
  * Fail-soft: any malformed/absent table yields None — the caller
  * falls back to the stub chunker, never a partial parse.
  */
object Mp4Demux {

  /** One addressed sample: index, absolute file offset, byte size,
    * decode timestamp in ms (from stts deltas / mdhd timescale). */
  final case class Sample(idx: Int, offset: Long, size: Long, dtsMs: Long)
  final case class Track(timescale: Long, samples: Vector[Sample])

  /** Cheap sniff: every BMFF file leads with an `ftyp` box. */
  def isIsoBmff(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p'

  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  private def u64(b: Array[Byte], p: Int): Long =
    (u32(b, p) << 32) | u32(b, p + 4)
  private def boxType(b: Array[Byte], p: Int): String =
    new String(b, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the boxes of [from, to), calling `f(type, payloadFrom,
    * payloadTo)`. Returns false on a malformed size field. */
  private def walk(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Boolean = {
    var p = from
    while (p + 8 <= to) {
      val size0 = u32(b, p)
      val (size, hdr) =
        if (size0 == 1L) {
          if (p + 16 > to) return false
          (u64(b, p + 8), 16)
        } else if (size0 == 0L) ((to - p).toLong, 8) // box extends to end
        else (size0, 8)
      if (size < hdr || p + size > to) return false
      f(boxType(b, p), p + hdr, p + size.toInt)
      p += size.toInt
    }
    true
  }

  /** First track carrying a complete sample table. */
  def demux(bytes: Array[Byte]): Option[Track] = {
    if (!isIsoBmff(bytes)) return None
    try demuxInner(bytes)
    catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  private def demuxInner(b: Array[Byte]): Option[Track] = {
    var result: Option[Track] = None
    walk(b, 0, b.length) { (t, from, to) =>
      if (t == "moov" && result.isEmpty) {
        walk(b, from, to) { (t2, f2, to2) =>
          if (t2 == "trak" && result.isEmpty)
            result = parseTrak(b, f2, to2)
        }
      }
    }
    result
  }

  private def parseTrak(b: Array[Byte], from: Int, to: Int): Option[Track] = {
    var timescale = 0L
    var stts: Vector[(Long, Long)] = Vector.empty        // (count, delta)
    var stsc: Vector[(Long, Long)] = Vector.empty        // (firstChunk, samplesPerChunk)
    var sizes: Vector[Long] = Vector.empty
    var chunkOffsets: Vector[Long] = Vector.empty
    var complete = true

    walk(b, from, to) { (t, f, e) =>
      if (t == "mdia") walk(b, f, e) { (t2, f2, e2) =>
        if (t2 == "mdhd") {
          // version 0: ts at +12 (after ctime/mtime u32s); version 1: +20
          val v = b(f2) & 0xff
          timescale = if (v == 1) u32(b, f2 + 20) else u32(b, f2 + 12)
        } else if (t2 == "minf") walk(b, f2, e2) { (t3, f3, e3) =>
          if (t3 == "stbl") walk(b, f3, e3) { (t4, f4, e4) =>
            // a declared entry count must FIT the box payload — a
            // hostile/truncated count would otherwise drive tabulate
            // into an allocation bomb before the bounds check fires
            def cnt(at: Int, entryBytes: Int): Int = {
              val n = u32(b, at)
              if (n < 0 || at + 4 + n * entryBytes > e4) -1 else n.toInt
            }
            t4 match {
              case "stts" =>
                val n = cnt(f4 + 4, 8)
                if (n >= 0) stts = Vector.tabulate(n)(i =>
                  (u32(b, f4 + 8 + i * 8), u32(b, f4 + 12 + i * 8)))
              case "stsc" =>
                val n = cnt(f4 + 4, 12)
                if (n >= 0) stsc = Vector.tabulate(n)(i =>
                  (u32(b, f4 + 8 + i * 12), u32(b, f4 + 12 + i * 12)))
              case "stsz" =>
                val uniform = u32(b, f4 + 4)
                val n =
                  if (uniform != 0L) {
                    val raw = u32(b, f4 + 8)
                    // uniform sizes carry no per-entry payload; bound
                    // the count by what any mdat could hold
                    if (raw < 0 || uniform * raw > b.length) -1 else raw.toInt
                  } else cnt(f4 + 8, 4)
                if (n >= 0) sizes =
                  if (uniform != 0L) Vector.fill(n)(uniform)
                  else Vector.tabulate(n)(i => u32(b, f4 + 12 + i * 4))
              case "stco" =>
                val n = cnt(f4 + 4, 4)
                if (n >= 0) chunkOffsets = Vector.tabulate(n)(i => u32(b, f4 + 8 + i * 4))
              case "co64" =>
                val n = cnt(f4 + 4, 8)
                if (n >= 0) chunkOffsets = Vector.tabulate(n)(i => u64(b, f4 + 8 + i * 8))
              case _ => ()
            }
          }
        }
      }
    } match { case false => complete = false; case true => () }

    if (!complete || timescale <= 0L || stts.isEmpty || stsc.isEmpty ||
      sizes.isEmpty || chunkOffsets.isEmpty) return None

    // expand stsc runs into per-chunk sample counts
    val nChunks = chunkOffsets.length
    val perChunk = new Array[Long](nChunks)
    var si = 0
    while (si < stsc.length) {
      val firstChunk = stsc(si)._1.toInt // 1-based
      val lastChunk =
        if (si + 1 < stsc.length) stsc(si + 1)._1.toInt - 1 else nChunks
      if (firstChunk < 1) return None
      var c = firstChunk
      while (c <= lastChunk && c <= nChunks) { perChunk(c - 1) = stsc(si)._2; c += 1 }
      si += 1
    }

    // per-sample decode times from stts runs — expansion CAPPED at the
    // sample count (a hostile 32-bit run count would otherwise drive a
    // multi-billion-element build before any bounds check fires)
    val dts = Vector.newBuilder[Long]
    var t = 0L
    var produced = 0
    stts.foreach { case (count, delta) =>
      var i = 0L
      while (i < count && produced < sizes.length) {
        dts += t; t += delta; i += 1; produced += 1
      }
    }
    val dtsArr = dts.result()
    if (dtsArr.length < sizes.length) return None

    // per-sample file offsets: walk chunks, accumulate sizes. Every
    // sample must lie INSIDE the file — a chunk offset past EOF (or a
    // size walking past it) marks a corrupt/truncated sample table and
    // fails the whole track soft (None → caller's declared fallback),
    // never a crash in the consumer's copyOfRange, and never a silent
    // 32-bit truncation of a >2 GiB offset
    val samples = Vector.newBuilder[Sample]
    var idx = 0
    var chunk = 0
    while (chunk < nChunks && idx < sizes.length) {
      var off = chunkOffsets(chunk)
      var k = 0L
      while (k < perChunk(chunk) && idx < sizes.length) {
        val sz = sizes(idx)
        if (off < 0L || sz < 0L || sz > b.length.toLong ||
          off > b.length.toLong - sz) return None
        samples += Sample(idx, off, sz, dtsArr(idx) * 1000L / timescale)
        off += sz
        idx += 1
        k += 1
      }
      chunk += 1
    }
    val out = samples.result()
    if (out.length != sizes.length) None else Some(Track(timescale, out))
  }

  // ---- fixture builder (tests / oracle twins) ------------------------

  /** Minimal-but-conformant single-track BMFF file: `ftyp` + `moov`
    * (one trak: mdhd v0 + stbl with stts/stsc/stsz/stco, all samples
    * in ONE chunk pointing into `mdat`) + `mdat` carrying the samples
    * back-to-back. Layout is a pure function of the sample sizes, so
    * expected offsets are closed-form for the DuckDB twin
    * ([[mdatPayloadStart]]). */
  def buildFixture(samples: Seq[Array[Byte]], timescale: Long = 1000L,
      delta: Long = 40L): Array[Byte] = {
    val n = samples.length
    require(n >= 1, "fixture needs at least one sample")
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tp: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tp.getBytes("US-ASCII") ++ payload

    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val mdhd = box("mdhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(delta * n) ++
      be32(0x55C40000L)) // version+flags, ctime, mtime, ts, duration, lang 'und'+pre_defined
    val stts = box("stts", be32(0) ++ be32(1) ++ be32(n.toLong) ++ be32(delta))
    val stsc = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(n.toLong) ++ be32(1))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(n.toLong) ++
      samples.toArray.flatMap(s => be32(s.length.toLong)))
    val chunkOff = mdatPayloadStart(n)
    val stco = box("stco", be32(0) ++ be32(1) ++ be32(chunkOff))
    val stbl = box("stbl", stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)
    val mdat = box("mdat", samples.toArray.flatten)
    val out = ftyp ++ moov ++ mdat
    assert(out.length - samples.map(_.length).sum == chunkOff,
      "fixture layout drifted from mdatPayloadStart")
    out
  }

  /** Absolute offset of the first sample byte in a [[buildFixture]]
    * file with `n` samples — closed-form for oracle twins:
    * ftyp(16) + moov(8 + trak(8 + mdia(8 + mdhd(32) + minf(8 +
    * stbl(8 + stts(24) + stsc(28) + stsz(20+4n) + stco(20)))))) + 8. */
  def mdatPayloadStart(n: Int): Long = {
    val stsz = 20L + 4L * n
    val stbl = 8L + 24L + 28L + stsz + 20L
    val minf = 8L + stbl
    val mdia = 8L + 32L + minf
    val trak = 8L + mdia
    val moov = 8L + trak
    16L + moov + 8L
  }
}
