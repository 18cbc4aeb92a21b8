package graft.sources

import java.io.ByteArrayOutputStream

/** Dependency-free generators of REAL media bytes (public file-format
  * specs): a 24-bit BI_RGB Windows BMP and a PCM RIFF/WAVE file. These
  * are the fixture side of the multimodal decode path — the bytes are
  * genuine spec-conformant files (openable by any image/audio tool),
  * with header fields planted from deterministic formulas so a DuckDB
  * oracle can recompute what a real decoder must extract.
  *
  * (The reference treats media as opaque blobs; this goes one step
  * further than round 2's marked stub by making at least one image and
  * one audio format genuinely decodable, per the multimodal mandate.)
  */
object MediaFixture {

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  /** 24bpp bottom-up BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + pixel
    * rows padded to 4 bytes), deterministic pixel pattern. */
  def bmp(width: Int, height: Int): Array[Byte] = {
    val rowBytes = (width * 3 + 3) / 4 * 4
    val imageSize = rowBytes * height
    val out = new ByteArrayOutputStream(54 + imageSize)
    out.write('B'); out.write('M')
    le32(out, 54 + imageSize) // file size
    le32(out, 0)              // reserved
    le32(out, 54)             // pixel data offset
    le32(out, 40)             // BITMAPINFOHEADER size
    le32(out, width)
    le32(out, height)
    le16(out, 1)              // planes
    le16(out, 24)             // bits per pixel
    le32(out, 0)              // BI_RGB
    le32(out, imageSize)
    le32(out, 2835)           // 72 DPI in pixels/metre
    le32(out, 2835)
    le32(out, 0)              // palette colors
    le32(out, 0)
    var y = 0
    while (y < height) {
      var x = 0
      var written = 0
      while (x < width) {
        out.write((x * 31 + y * 17) & 0xff)       // B
        out.write((x * 13 + y * 7 + 1) & 0xff)    // G
        out.write((x * 5 + y * 3 + 2) & 0xff)     // R
        written += 3
        x += 1
      }
      while (written < rowBytes) { out.write(0); written += 1 }
      y += 1
    }
    out.toByteArray
  }

  /** PCM RIFF/WAVE with a canonical 44-byte header and deterministic
    * samples (a little-endian sawtooth). */
  def wav(channels: Int, sampleRate: Int, bitsPerSample: Int,
          nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    val out = new ByteArrayOutputStream(44 + dataSize)
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    le32(out, 36 + dataSize)
    out.write('W'); out.write('A'); out.write('V'); out.write('E')
    out.write('f'); out.write('m'); out.write('t'); out.write(' ')
    le32(out, 16)             // fmt chunk size
    le16(out, 1)              // PCM
    le16(out, channels)
    le32(out, sampleRate)
    le32(out, sampleRate * blockAlign) // byte rate
    le16(out, blockAlign)
    le16(out, bitsPerSample)
    out.write('d'); out.write('a'); out.write('t'); out.write('a')
    le32(out, dataSize)
    var i = 0
    while (i < dataSize) { out.write((i * 37) & 0xff); i += 1 }
    out.toByteArray
  }

  /** Deterministic RGB test image (same channel formulas as [[bmp]]). */
  private def rgbImage(width: Int, height: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = (x * 5 + y * 3 + 2) & 0xff
        val g = (x * 13 + y * 7 + 1) & 0xff
        val b = (x * 31 + y * 17) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  /** Real PNG bytes via the JDK's ImageIO encoder (no dependency; PNG
    * spec mandates IHDR as the first chunk, so width/height/bit-depth/
    * color-type sit at fixed offsets 17/21/25/26 for ANY conformant
    * encoder — the property Multimodal's pure-Column decode relies on).
    * TYPE_INT_RGB encodes as 8-bit truecolor (color type 2). */
  def png(width: Int, height: Int): Array[Byte] =
    encode(rgbImage(width, height), "png")

  /** Real baseline JPEG bytes via the JDK's ImageIO encoder: FFD8, APP0/
    * DQT/... segments, then an SOF0 frame header carrying precision 8,
    * the planted height/width, and 3 components — what Multimodal's
    * bounded marker walk must find. */
  def jpeg(width: Int, height: Int): Array[Byte] =
    encode(rgbImage(width, height), "jpg")
}
