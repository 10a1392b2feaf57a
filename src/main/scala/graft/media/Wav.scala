package graft.media

/** RIFF/WAVE PCM reader — the pure-JVM half of audio handling (the
  * analog of [[Mp4Demux]] for video): the RIFF chunk walk and 16-bit
  * PCM sample access are plain little-endian arithmetic, so audio
  * features (rate, channels, frame count, peak, energy) come from the
  * REAL samples with no codec dependency. Compressed audio formats
  * would need a codec this container doesn't ship — a non-PCM or
  * non-WAV payload decodes to None (fail-soft; the caller keeps its
  * declared stub path), never a wrong number.
  */
object Wav {

  /** Decoded PCM summary: integer-exact (cross-engine-oracle-safe)
    * aggregates over ALL samples (channels interleaved). */
  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Long, peakAbs: Long, sumAbs: Long)

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def u16le(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], p: Int): Long =
    (u16le(b, p) & 0xffffL) | ((u16le(b, p + 2) & 0xffffL) << 16)

  /** Parse a 16-bit PCM WAV; None for non-WAV / non-PCM / malformed
    * input (declared fallback, like [[Mp4Demux.demux]]). */
  def decode(b: Array[Byte]): Option[WavInfo] = {
    if (!isWav(b)) return None
    var p = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var fmtOk = false
    var dataFrom = -1
    var dataLen = 0L
    while (p + 8 <= b.length && (dataFrom < 0 || !fmtOk)) {
      val id = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = u32le(b, p + 4)
      if (len < 0 || p + 8 + len > b.length) return None
      id match {
        case "fmt " if len >= 16 =>
          val audioFormat = u16le(b, p + 8)
          channels = u16le(b, p + 10)
          sampleRate = u32le(b, p + 12).toInt
          bits = u16le(b, p + 22)
          fmtOk = audioFormat == 1 && bits == 16 && channels >= 1 && sampleRate > 0
          if (!fmtOk) return None // non-PCM / non-16-bit: declared, not guessed
        case "data" =>
          dataFrom = p + 8
          dataLen = len
        case _ => ()
      }
      p += 8 + len.toInt + (len.toInt & 1) // RIFF chunks are word-aligned
    }
    if (!fmtOk || dataFrom < 0) return None
    val nSamples = dataLen / 2
    var peak = 0L
    var sum = 0L
    var i = 0
    while (i < nSamples) {
      val s = (u16le(b, dataFrom + i * 2).toShort).toLong
      val a = math.abs(s)
      if (a > peak) peak = a
      sum += a
      i += 1
    }
    Some(WavInfo(sampleRate, channels, bits, nSamples / channels, peak, sum))
  }

  /** Raw 16-bit PCM samples (channels interleaved) with rate and
    * channel count — the sample-level access [[decode]]'s aggregates
    * are built on, for consumers that need the waveform itself
    * (autocorrelation, resampling). Same fail-soft contract: None for
    * non-WAV / non-PCM / malformed input. */
  def samples(b: Array[Byte]): Option[(Int, Int, Array[Short])] =
    decode(b).map { w =>
      // re-walk to the data chunk (decode validated the layout)
      var p = 12
      var dataFrom = -1
      var dataLen = 0L
      while (p + 8 <= b.length && dataFrom < 0) {
        val id = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val len = u32le(b, p + 4)
        if (id == "data") { dataFrom = p + 8; dataLen = len }
        p += 8 + len.toInt + (len.toInt & 1)
      }
      val n = (dataLen / 2).toInt
      val out = new Array[Short](n)
      var i = 0
      while (i < n) { out(i) = u16le(b, dataFrom + i * 2).toShort; i += 1 }
      (w.sampleRate, w.channels, out)
    }

  /** Fixture twin: a minimal conformant 16-bit PCM WAV. */
  def encodePcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0, "partial frame")
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
    def le32(v: Long): Array[Byte] = le16((v & 0xffff).toInt) ++ le16(((v >>> 16) & 0xffff).toInt)
    val data = samples.flatMap(s => le16(s & 0xffff))
    val byteRate = sampleRate.toLong * channels * 2
    val fmt = le16(1) ++ le16(channels) ++ le32(sampleRate.toLong) ++
      le32(byteRate) ++ le16(channels * 2) ++ le16(16)
    val body = "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(fmt.length.toLong) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }
}
