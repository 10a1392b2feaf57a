package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** RIFF/PCM reader evidence: fixture round-trips with independently
  * computed aggregates, chunk-walk details (word alignment, unknown
  * chunks), and fail-soft Nones for non-WAV / non-PCM input. */
class WavSpec extends AnyFunSuite {

  test("PCM-16 round-trip: header fields and sample aggregates exact, mono and stereo") {
    for (channels <- Seq(1, 2)) {
      val samples = Array.tabulate(240)(k => ((k * 91) % 4001 - 2000).toShort)
      val wav = Wav.encodePcm16(22050, channels, samples)
      val info = Wav.decode(wav).getOrElse(fail("decode returned None"))
      assert(info.sampleRate == 22050 && info.channels == channels && info.bitsPerSample == 16)
      assert(info.nFrames == 240 / channels)
      assert(info.peakAbs == samples.map(s => math.abs(s.toLong)).max)
      assert(info.sumAbs == samples.map(s => math.abs(s.toLong)).sum)
    }
  }

  test("chunk walk: unknown chunks (odd-length, word-aligned) before fmt/data are skipped") {
    val samples = Array.tabulate(8)(k => (k * 100).toShort)
    val wav = Wav.encodePcm16(8000, 1, samples)
    // splice a 3-byte LIST chunk (padded to 4) right after the WAVE tag
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte]('a', 'b', 'c', 0)
    val spliced = wav.take(12) ++ extra ++ wav.drop(12)
    // fix the RIFF size field (not checked by the reader, but stay honest)
    val info = Wav.decode(spliced).getOrElse(fail("spliced decode returned None"))
    assert(info.nFrames == 8 && info.peakAbs == 700)
  }

  test("non-WAV, non-PCM and truncated input are fail-soft Nones") {
    assert(Wav.decode("not audio".getBytes).isEmpty)
    val wav = Wav.encodePcm16(8000, 1, Array.tabulate(8)(_.toShort))
    assert(Wav.decode(wav.take(20)).isEmpty) // truncated mid-fmt
    // flip audioFormat to 2 (ADPCM): declared None, never a guess
    val bad = wav.clone()
    bad(20) = 2
    assert(Wav.decode(bad).isEmpty)
  }

  test("samples: raw waveform round-trips exactly; interleaving preserved; fail-soft None") {
    val src = Array.tabulate(120)(k => ((k * 57) % 3001 - 1500).toShort)
    val wav = Wav.encodePcm16(16000, 2, src)
    val (rate, ch, got) = Wav.samples(wav).getOrElse(fail("samples returned None"))
    assert(rate == 16000 && ch == 2)
    assert(got.toSeq == src.toSeq)
    assert(Wav.samples("RIFFnope".getBytes("US-ASCII")).isEmpty)
  }
}
