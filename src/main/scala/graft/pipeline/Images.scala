package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Non-PNG image codecs on the bare JDK: `javax.imageio` ships BMP,
  * GIF and JPEG readers/writers with no external dependency, which
  * shrinks [[Multimodal.fakeDecode]]'s domain to mime types that
  * genuinely have no codec in this container. PNG keeps its
  * hand-written [[Png]] path (exactness pinned per scanline filter);
  * everything here routes by payload SIGNATURE, so a payload that
  * CLAIMS a decodable format must decode or fail loud — exactly the
  * [[Png]] contract. Reference surface: FileInfoton binary payloads
  * (Infoton.scala:335-439 — the reference stores blobs opaquely;
  * decode is the training-pipeline extension).
  *
  * Output matches [[Png.decode]]: row-major grayscale in [0,1], gray
  * pixels (r==g==b) pass through exactly as v/255, color converts by
  * Rec.601 luma. Encoding always goes through a TYPE_INT_RGB frame
  * with gray triples — BMP (24-bit) and GIF (≤256-entry palette)
  * round-trip losslessly; JPEG is lossy by nature, so its checks pin
  * dims plus a bounded per-pixel tolerance. */
object Images {

  // ImageIO's default stream cache is DISK-backed: every read/write
  // through the InputStream/OutputStream entry points creates (and
  // deletes) a temp file under java.io.tmpdir — per payload, per
  // evaluation. All payloads here are small in-memory byte arrays, so
  // the file round-trip is pure overhead that scales with tmpdir
  // latency (measured: the BMP/GIF/JPEG decode queries ran 3-8×
  // slower on a sandbox with slow /tmp; memory-cached streams remove
  // the host dependence). JVM-wide, set once at class init — every
  // executor initializes this object before its first decode.
  javax.imageio.ImageIO.setUseCache(false)

  def isBmp(d: Array[Byte]): Boolean =
    d.length >= 2 && d(0) == 'B'.toByte && d(1) == 'M'.toByte

  def isGif(d: Array[Byte]): Boolean =
    d.length >= 6 && d(0) == 'G'.toByte && d(1) == 'I'.toByte &&
      d(2) == 'F'.toByte && d(3) == '8'.toByte &&
      (d(4) == '7'.toByte || d(4) == '9'.toByte) && d(5) == 'a'.toByte

  def isJpeg(d: Array[Byte]): Boolean =
    d.length >= 3 && (d(0) & 0xff) == 0xff && (d(1) & 0xff) == 0xd8 &&
      (d(2) & 0xff) == 0xff

  /** True when the payload's signature names a format the JDK's
    * ImageIO can decode (the routing predicate used by
    * [[graft.functions.PngDecode.compute]]). */
  def hasImageIoCodec(d: Array[Byte]): Boolean =
    isBmp(d) || isGif(d) || isJpeg(d)

  /** Decode a BMP/GIF/JPEG payload → (width, height, grayscale pixels
    * in [0,1], row-major). Fail-loud: a payload that matched
    * [[hasImageIoCodec]] must decode (a null/throwing reader is a
    * corrupt payload, never a silent fake). */
  def decode(data: Array[Byte]): (Int, Int, Array[Float]) = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(data))
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"corrupt image payload (${e.getMessage})", e)
      }
    require(img != null,
      "payload claims a decodable image signature but ImageIO found no frame")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        // gray passes through exactly (the Png.decode contract);
        // color converts by Rec.601 luma
        out(y * w + x) =
          if (r == g && g == b) r / 255.0f
          else (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** Encode grayscale pixels (0-255 ints, row-major) via the named
    * ImageIO writer ("bmp" | "gif" | "jpg"). Encoding goes through a
    * TYPE_INT_RGB frame with gray triples so BMP/GIF round-trip
    * exactly and JPEG stays within its DC-quantization tolerance. */
  def encodeGray(width: Int, height: Int, pixels: Array[Int],
                 format: String): Array[Byte] = {
    require(pixels.length == width * height,
      s"expected ${width * height} pixels, got ${pixels.length}")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = pixels(y * width + x) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, bos),
      s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }
}
