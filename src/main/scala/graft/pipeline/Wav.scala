package graft.pipeline

/** Minimal WAV/PCM codec on the bare JDK — the audio analog of
  * [[Png]] (reference surface: FileInfoton binary payloads,
  * Infoton.scala:335-439; the reference stores audio blobs opaquely,
  * decode is the training-pipeline extension the builder brief asks
  * for).
  *
  * Decoder: RIFF/WAVE chunk walk (`fmt ` + `data`, ancillary chunks
  * skipped), PCM integer format (tag 1) at 16 bits, any channel count
  * and sample rate. Anything else — float/ADPCM formats, other bit
  * depths, truncated chunks — fails LOUD: a payload that claims to be
  * WAV must never silently fall back to a fake decode. Output is
  * channel-averaged mono in [-1, 1] (the [[Png]] luma discipline:
  * one analysis series per payload).
  *
  * Encoder: PCM16, used by tests and the synthetic corpus so decode
  * is oracle-checkable against closed-form sample content.
  */
object Wav {

  def isWav(data: Array[Byte]): Boolean =
    data.length >= 12 &&
      data(0) == 'R' && data(1) == 'I' && data(2) == 'F' && data(3) == 'F' &&
      data(8) == 'W' && data(9) == 'A' && data(10) == 'V' && data(11) == 'E'

  private def le16(d: Array[Byte], o: Int): Int =
    (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
  private def le32(d: Array[Byte], o: Int): Int =
    (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8) |
      ((d(o + 2) & 0xff) << 16) | ((d(o + 3) & 0xff) << 24)

  /** Decode a WAV payload → (sampleRate, channels, mono samples in
    * [-1, 1]; multi-channel input is averaged per frame). */
  def decode(data: Array[Byte]): (Int, Int, Array[Float]) = {
    require(isWav(data), "not a WAV (bad RIFF/WAVE header)")
    var pos = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= data.length && (sampleRate < 0 || dataOff < 0)) {
      val id = new String(data, pos, 4, "US-ASCII")
      val len = le32(data, pos + 4)
      require(len >= 0 && pos + 8 + len <= data.length,
        s"truncated WAV (chunk $id)")
      id match {
        case "fmt " =>
          require(len >= 16, "bad fmt chunk")
          val tag = le16(data, pos + 8)
          require(tag == 1, s"WAV format tag $tag unsupported (PCM=1 only)")
          channels = le16(data, pos + 10)
          sampleRate = le32(data, pos + 12)
          bits = le16(data, pos + 22)
          require(channels >= 1, s"bad channel count $channels")
          require(bits == 16, s"bit depth $bits unsupported (16 only)")
          require(sampleRate > 0, s"bad sample rate $sampleRate")
        case "data" => dataOff = pos + 8; dataLen = len
        case _      => () // LIST/INFO/fact … skipped
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    val bytesPerFrame = 2 * channels
    require(dataLen % bytesPerFrame == 0,
      s"data chunk $dataLen bytes is not whole ${bytesPerFrame}-byte frames")
    val frames = dataLen / bytesPerFrame
    val out = new Array[Float](frames)
    var i = 0
    while (i < frames) {
      var acc = 0
      var c = 0
      while (c < channels) {
        // little-endian signed 16-bit
        acc += le16(data, dataOff + i * bytesPerFrame + c * 2).toShort
        c += 1
      }
      out(i) = acc.toFloat / (channels * 32768.0f)
      i += 1
    }
    (sampleRate, channels, out)
  }

  /** Encode PCM16 samples (interleaved if channels > 1) as a WAV. */
  def encodePcm16(sampleRate: Int, channels: Int,
                  samples: Array[Short]): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      "samples must be whole frames")
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    ascii("RIFF"); w32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); w32(16)
    w16(1); w16(channels); w32(sampleRate)
    w32(sampleRate * channels * 2) // byte rate
    w16(channels * 2); w16(16)     // block align, bits
    ascii("data"); w32(dataLen)
    samples.foreach(s => w16(s & 0xffff))
    out.toByteArray
  }
}
