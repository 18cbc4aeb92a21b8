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

  /** Real GIF89a bytes via the JDK's ImageIO encoder: the 6-byte
    * signature/version then the logical screen descriptor's
    * little-endian canvas dims at fixed 0-based offsets 6/8 — the
    * fields Multimodal's fixed-offset decode reads. */
  def gif(width: Int, height: Int): Array[Byte] =
    encode(rgbImage(width, height), "gif")

  /** Real TIFF bytes via the JDK's ImageIO encoder (big-endian "MM",
    * probed): the 8-byte header points at an IFD whose entries carry
    * ImageWidth(256)/ImageLength(257) as inline SHORTs and
    * BitsPerSample(258) as a count-3 offset-indirected SHORT array
    * [8,8,8] — exercising Multimodal's endian-tagged IFD walk
    * INCLUDING the value-offset indirection path. */
  def tiff(width: Int, height: Int): Array[Byte] =
    encode(rgbImage(width, height), "tiff")

  /** WebP (RIFF/VP8 lossy) bytes with a spec-exact container and frame
    * header: RIFF + 'WEBP' + a 'VP8 ' chunk whose payload opens with
    * the 3-byte frame tag (key frame, version 0, show_frame), the
    * 9D 01 2A start code, and the 14-bit little-endian dims — exactly
    * the bytes any WebP header sniffer reads. The entropy-coded
    * coefficient data after the header is a deterministic STUB (the
    * JDK ships no VP8 encoder), clearly scoped: header decode is the
    * operator under test, pixel decode is the documented batchDecode
    * codec seam. */
  def webp(width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && width < 16384 && height >= 1 && height < 16384,
      "VP8 dims are 14-bit")
    val p = new ByteArrayOutputStream()
    // frame tag: bit0 frame type (0 = key), bits 1-3 version, bit 4
    // show_frame, bits 5-23 first-partition size (stub value)
    val tag = (1 << 4) | (16 << 5)
    p.write(tag & 0xff); p.write((tag >> 8) & 0xff); p.write((tag >> 16) & 0xff)
    p.write(0x9d); p.write(0x01); p.write(0x2a) // keyframe start code
    le16(p, width)  // upper 2 bits = horizontal scaling hint, left 0
    le16(p, height)
    var i = 0
    while (i < 16) { p.write((i * 29 + 5) & 0xff); i += 1 } // stub partition
    val payload = p.toByteArray
    val out = new ByteArrayOutputStream()
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    le32(out, 4 + 8 + payload.length + (payload.length & 1))
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    out.write('V'); out.write('P'); out.write('8'); out.write(' ')
    le32(out, payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0) // RIFF chunk padding
    out.toByteArray
  }

  /** WebP VP8L (lossless) header bytes: the 0x2F signature byte then a
    * 32-bit little-endian bitfield packing width-1 (bits 0-13) and
    * height-1 (bits 14-27) — the second chunk layout a crawl corpus
    * carries. Payload is a stub like [[webp]]'s. */
  def webpLossless(width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && width <= 16384 && height >= 1 && height <= 16384,
      "VP8L dims are 14-bit + 1")
    val p = new ByteArrayOutputStream()
    p.write(0x2f)
    val bits = (width - 1) | ((height - 1) << 14)
    le32(p, bits) // top 4 bits: alpha hint 0, version 0
    var i = 0
    while (i < 11) { p.write((i * 41 + 9) & 0xff); i += 1 } // stub stream
    val payload = p.toByteArray
    val out = new ByteArrayOutputStream()
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    le32(out, 4 + 8 + payload.length + (payload.length & 1))
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    out.write('V'); out.write('P'); out.write('8'); out.write('L')
    le32(out, payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** WebP VP8X (extended) container: RIFF + 'WEBP' opening with a
    * 'VP8X' chunk (payload size 10) — a feature-flags byte, 3 reserved
    * bytes, then canvas width-1 and height-1 as 24-bit little-endian
    * fields — the layout every extended (animated / alpha / EXIF-
    * bearing) crawl WebP starts with, and the case the plain VP8/VP8L
    * reads cannot see (their dims live in a later chunk; the canvas
    * dims live HERE). A stub VP8 image chunk follows so the container
    * is structurally complete. */
  def webpVp8x(width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && width <= (1 << 24) &&
      height >= 1 && height <= (1 << 24), "VP8X canvas dims are 24-bit + 1")
    def le24(out: ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff)
    }
    // reuse a plain lossy file's VP8 chunk (bytes after RIFF+'WEBP')
    val vp8Chunk = webp(math.min(width, 16383), math.min(height, 16383)).drop(12)
    val out = new ByteArrayOutputStream()
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    le32(out, 4 + 8 + 10 + vp8Chunk.length)
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    out.write('V'); out.write('P'); out.write('8'); out.write('X')
    le32(out, 10)
    out.write(0)                            // feature flags: none set
    out.write(0); out.write(0); out.write(0) // reserved
    le24(out, width - 1)
    le24(out, height - 1)
    out.write(vp8Chunk, 0, vp8Chunk.length)
    out.toByteArray
  }

  /** Minimal hand-built LITTLE-endian ("II") TIFF header + IFD with
    * inline-SHORT width/height and a count-1 BitsPerSample — the byte
    * order the JDK encoder does NOT produce, so the decoder's II path
    * has a real fixture too (header-level: no pixel data follows,
    * which a header walk never reads). */
  def tiffLittleEndian(width: Int, height: Int, bits: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write('I'); out.write('I'); le16(out, 42)
    le32(out, 8) // IFD at offset 8
    le16(out, 3) // 3 entries
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      le16(out, tag); le16(out, typ); le32(out, count)
      // SHORT values are left-justified in the 4-byte field
      le16(out, value); le16(out, 0)
    }
    entry(256, 3, 1, width)
    entry(257, 3, 1, height)
    entry(258, 3, 1, bits)
    le32(out, 0) // next-IFD pointer: none
    out.toByteArray
  }

  /** Little-endian TIFF whose IFD carries an EXIF Orientation(274)
    * entry beside the dimension tags (entries tag-sorted per spec).
    * Camera files store SENSOR-layout dims; orientations 5-8 mean the
    * display is TRANSPOSED (rotate 90/270 ± flip), so a pipeline that
    * resizes on stored dims gets portrait/landscape backwards — the
    * fixture for the decoder's display-orientation swap. */
  def tiffOriented(storedWidth: Int, storedHeight: Int, bits: Int,
                   orientation: Int): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, "EXIF orientation is 1-8")
    val out = new ByteArrayOutputStream()
    out.write('I'); out.write('I'); le16(out, 42)
    le32(out, 8) // IFD at offset 8
    le16(out, 4) // 4 entries
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      le16(out, tag); le16(out, typ); le32(out, count)
      le16(out, value); le16(out, 0) // SHORT left-justified
    }
    entry(256, 3, 1, storedWidth)
    entry(257, 3, 1, storedHeight)
    entry(258, 3, 1, bits)
    entry(274, 3, 1, orientation)
    le32(out, 0) // next-IFD pointer: none
    out.toByteArray
  }
}
