package graft.pipeline

/** Minimal PNG codec on the bare JDK (`java.util.zip` only — the
  * sandbox has no imaging libraries, and none are needed: PNG is
  * zlib + five byte-predictors). Backs the REAL decode path of
  * [[Multimodal]] (reference surface: FileInfoton binary payloads,
  * Infoton.scala:335-439 — the reference stores blobs opaquely; decode
  * here is the training-pipeline extension the builder brief asks for).
  *
  * Decoder: non-interlaced, bit depth 8, color types 0 (gray),
  * 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline
  * filters (None/Sub/Up/Average/Paeth). Anything else fails LOUD — a
  * payload that claims to be PNG must never silently fall back to a
  * fake decode. Output is row-major grayscale in [0,1]: gray channels
  * pass through exactly (v/255), color converts by Rec.601 luma.
  *
  * Encoder: grayscale / RGB, with a pluggable per-row filter choice so
  * tests and synthetic corpora exercise every filter type on decode.
  */
object Png {

  private val Signature = Array[Int](0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  def isPng(data: Array[Byte]): Boolean =
    data.length >= 8 && (0 until 8).forall(i => (data(i) & 0xff) == Signature(i))

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    case t => throw new IllegalArgumentException(s"color type $t unsupported")
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode a PNG payload → (width, height, grayscale pixels in [0,1],
    * row-major). Fails loud on non-PNG bytes, truncation, interlacing,
    * or unsupported depth/color — see object doc. */
  def decode(data: Array[Byte]): (Int, Int, Array[Float]) = {
    require(isPng(data), "not a PNG (bad signature)")
    def be32(o: Int): Int =
      ((data(o) & 0xff) << 24) | ((data(o + 1) & 0xff) << 16) |
        ((data(o + 2) & 0xff) << 8) | (data(o + 3) & 0xff)
    var pos = 8
    var width = -1; var height = -1; var bitDepth = -1; var colorType = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended) {
      require(pos + 8 <= data.length, "truncated PNG (chunk header)")
      val len = be32(pos)
      val ctype = new String(data, pos + 4, 4, "US-ASCII")
      require(len >= 0 && pos + 12 + len <= data.length,
        s"truncated PNG (chunk $ctype)")
      val off = pos + 8
      // fail-loud contract covers bit corruption too: every chunk's
      // stored CRC32 (over type + body) must match, or zlib/structure-
      // preserving flips would decode silently to wrong pixels
      val crc = new java.util.zip.CRC32()
      crc.update(data, pos + 4, 4 + len)
      require(crc.getValue.toInt == be32(off + len),
        s"corrupt PNG (chunk $ctype CRC mismatch)")
      ctype match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          width = be32(off); height = be32(off + 4)
          bitDepth = data(off + 8) & 0xff; colorType = data(off + 9) & 0xff
          require((data(off + 10) & 0xff) == 0, "bad compression method")
          require((data(off + 11) & 0xff) == 0, "bad filter method")
          require((data(off + 12) & 0xff) == 0, "interlaced PNG unsupported")
          require(bitDepth == 8, s"bit depth $bitDepth unsupported (8 only)")
          channelsOf(colorType) // fails loud on bad color type
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
        case "PLTE" => palette = java.util.Arrays.copyOfRange(data, off, off + len)
        case "IDAT" => idat.write(data, off, len)
        case "IEND" => ended = true
        case _      => () // ancillary chunks (tEXt, gAMA, …) skipped
      }
      pos = off + len + 4 // + CRC
    }
    require(width > 0, "missing IHDR")
    val bpp = channelsOf(colorType) // bytes/pixel at depth 8
    val stride = width * bpp
    // inflate the filtered scanlines
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte]((stride + 1) * height)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // 0 without end-of-stream = truncated/stalled zlib data; a
        // retry would spin forever
        require(n > 0 || inf.finished(), "truncated IDAT stream")
        got += n
      }
    } finally inf.end()
    require(got == raw.length,
      s"IDAT inflates to $got bytes, expected ${raw.length}")
    // un-filter (spec §6: each byte predicts from left/up/up-left at
    // bpp offsets, on the RECONSTRUCTED bytes)
    val img = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      val ro = y * (stride + 1) + 1
      val io = y * stride
      var x = 0
      while (x < stride) {
        val v = raw(ro + x) & 0xff
        val a = if (x >= bpp) img(io + x - bpp) & 0xff else 0
        val b = if (y > 0) img(io - stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) img(io - stride + x - bpp) & 0xff else 0
        val rec = ft match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + ((a + b) >> 1)
          case 4 => v + paeth(a, b, c)
          case f => throw new IllegalArgumentException(s"bad filter type $f")
        }
        img(io + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // → grayscale floats (gray exact; color via Rec.601 luma)
    val out = new Array[Float](width * height)
    var i = 0
    while (i < width * height) {
      val o = i * bpp
      val v = colorType match {
        case 0 | 4 => (img(o) & 0xff).toFloat
        case 2 | 6 =>
          0.299f * (img(o) & 0xff) + 0.587f * (img(o + 1) & 0xff) +
            0.114f * (img(o + 2) & 0xff)
        case 3 =>
          val pi = (img(o) & 0xff) * 3
          require(palette != null && pi + 2 < palette.length,
            "palette index out of range")
          0.299f * (palette(pi) & 0xff) + 0.587f * (palette(pi + 1) & 0xff) +
            0.114f * (palette(pi + 2) & 0xff)
      }
      out(i) = v / 255.0f
      i += 1
    }
    (width, height, out)
  }

  // ------------------------------------------------------------- encoding

  /** Encode raw samples (row-major, `channels(colorType)` bytes per
    * pixel) as a PNG. `filterOf(y)` picks each row's filter type 0-4 —
    * cycling it exercises every decoder filter branch. */
  def encode(width: Int, height: Int, colorType: Int, samples: Array[Byte],
             filterOf: Int => Int = _ % 5): Array[Byte] = {
    val bpp = channelsOf(colorType)
    require(colorType == 0 || colorType == 2,
      s"encoder supports gray(0)/rgb(2) only, got $colorType")
    val stride = width * bpp
    require(samples.length == stride * height,
      s"expected ${stride * height} sample bytes, got ${samples.length}")
    val filtered = new Array[Byte]((stride + 1) * height)
    def s(x: Int, y: Int): Int =
      if (x < 0 || y < 0) 0 else samples(y * stride + x) & 0xff
    var y = 0
    while (y < height) {
      val ft = ((filterOf(y) % 5) + 5) % 5
      filtered(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val v = s(x, y); val a = s(x - bpp, y); val b = s(x, y - 1)
        val c = s(x - bpp, y - 1)
        val enc = ft match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - ((a + b) >> 1)
          case 4 => v - paeth(a, b, c)
        }
        filtered(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) { val n = defl.deflate(buf); zbuf.write(buf, 0, n) }
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    Signature.foreach(out.write)
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    def chunk(ctype: String, body: Array[Byte]): Unit = {
      be32(body.length)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(body, 0, body.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      be32(crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    def ihdrBe32(v: Int): Unit = {
      ihdr.write((v >>> 24) & 0xff); ihdr.write((v >>> 16) & 0xff)
      ihdr.write((v >>> 8) & 0xff); ihdr.write(v & 0xff)
    }
    ihdrBe32(width); ihdrBe32(height)
    ihdr.write(8); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Grayscale convenience: pixel values 0-255 (ints), row-major. */
  def encodeGray(width: Int, height: Int, pixels: Array[Int],
                 filterOf: Int => Int = _ % 5): Array[Byte] =
    encode(width, height, 0, pixels.map(p => (p & 0xff).toByte), filterOf)
}
