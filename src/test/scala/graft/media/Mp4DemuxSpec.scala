package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** Box-walk demuxer evidence: fixture round-trips (offsets addressed
  * into the real mdat bytes), stsc run expansion across multiple
  * chunks, uniform-stsz and co64 variants, and fail-soft Nones for
  * non-BMFF / truncated input. */
class Mp4DemuxSpec extends AnyFunSuite {

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(tp: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ tp.getBytes("US-ASCII") ++ payload

  test("single-chunk fixture round-trips: offsets, sizes, timestamps, addressed bytes") {
    val samples = (0 until 6).map(j => s"sample-$j-${"x" * j}".getBytes("US-ASCII"))
    val file = Mp4Demux.buildFixture(samples, timescale = 1000L, delta = 40L)
    val track = Mp4Demux.demux(file).getOrElse(fail("demux returned None"))
    assert(track.timescale == 1000L)
    assert(track.samples.length == 6)
    var expectedOff = Mp4Demux.mdatPayloadStart(6)
    samples.zipWithIndex.foreach { case (data, j) =>
      val s = track.samples(j)
      assert(s.offset == expectedOff, s"sample $j offset")
      assert(s.size == data.length, s"sample $j size")
      assert(s.dtsMs == 40L * j, s"sample $j dts")
      // the offset really addresses the sample's bytes in the file
      assert(file.slice(s.offset.toInt, (s.offset + s.size).toInt).toSeq == data.toSeq)
      expectedOff += data.length
    }
  }

  test("stsc run expansion across MULTIPLE chunks + uniform stsz + co64 offsets") {
    // 5 samples of uniform size 10: chunk 1 holds 2 (stsc run 1), the
    // remaining chunks hold 1 each (stsc run 2; last run extends to
    // the chunk count). Offsets via co64, chunks NON-contiguous.
    val sampleSize = 10L
    val chunkOffs = Seq(300L, 400L, 470L, 540L)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    val mdhd = box("mdhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(500L) ++ be32(5L * 100L) ++ be32(0x55C40000L))
    val stts = box("stts", be32(0) ++ be32(1) ++ be32(5L) ++ be32(100L)) // 100/500s = 200ms
    val stsc = box("stsc", be32(0) ++ be32(2) ++
      be32(1L) ++ be32(2L) ++ be32(1L) ++ // chunk 1: 2 samples
      be32(2L) ++ be32(1L) ++ be32(1L))   // chunks 2..: 1 sample
    val stsz = box("stsz", be32(0) ++ be32(sampleSize) ++ be32(5L)) // uniform
    val co64 = box("co64", be32(0) ++ be32(chunkOffs.length.toLong) ++
      chunkOffs.toArray.flatMap(be64))
    val stbl = box("stbl", stts ++ stsc ++ stsz ++ co64)
    val moov = box("moov", box("trak", box("mdia", mdhd ++ box("minf", stbl))))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val pad = new Array[Byte](600) // body large enough to hold the offsets
    val file = ftyp ++ moov ++ box("mdat", pad)
    val track = Mp4Demux.demux(file).getOrElse(fail("demux returned None"))
    assert(track.samples.map(_.offset) ==
      Vector(300L, 310L, 400L, 470L, 540L)) // chunk1: 2 back-to-back, then 1/chunk
    assert(track.samples.forall(_.size == sampleSize))
    assert(track.samples.map(_.dtsMs) == Vector(0L, 200L, 400L, 600L, 800L))
  }

  test("sample table pointing OUTSIDE the file is a fail-soft None, never a crash or 32-bit truncation") {
    // valid fixture, then corrupt the single stco chunk offset in place:
    // (a) just past EOF, (b) far past EOF, (c) a >2^31 offset that a
    // naive .toInt would silently truncate into wrong-but-valid bounds
    val samples = (0 until 3).map(j => s"sample-$j".getBytes("US-ASCII"))
    val good = Mp4Demux.buildFixture(samples, timescale = 1000L, delta = 40L)
    val goodOff = Mp4Demux.mdatPayloadStart(3)
    // locate the 4-byte big-endian stco entry holding goodOff
    val needle = be32(goodOff)
    val at = good.indices.indexWhere(i => i + 4 <= good.length &&
      good.slice(i, i + 4).sameElements(needle))
    assert(at >= 0, "fixture stco entry not found")
    def corrupted(off: Long): Array[Byte] = {
      val c = good.clone(); be32(off).copyToArray(c, at); c }
    // first sample starts at EOF: its size walks past the file end
    assert(Mp4Demux.demux(corrupted(good.length.toLong)).isEmpty)
    assert(Mp4Demux.demux(corrupted(0xFFFFFF00L)).isEmpty)
    assert(Mp4Demux.demux(corrupted(0x80000010L)).isEmpty)
    // sanity: the uncorrupted fixture still demuxes
    assert(Mp4Demux.demux(good).nonEmpty)
  }

  test("non-BMFF and truncated input are fail-soft Nones") {
    assert(!Mp4Demux.isIsoBmff("not a video at all".getBytes))
    assert(Mp4Demux.demux("not a video at all".getBytes).isEmpty)
    val good = Mp4Demux.buildFixture(Seq("abc".getBytes, "defg".getBytes))
    assert(Mp4Demux.demux(good.take(40)).isEmpty) // truncated mid-moov
    // a bare ftyp with no moov sniffs as BMFF but demuxes to None
    val bare = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    assert(Mp4Demux.isIsoBmff(bare) && Mp4Demux.demux(bare).isEmpty)
  }
}
