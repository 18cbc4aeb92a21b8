package graft

import graft.operators.Multimodal
import graft.sources.MediaFixture
import org.apache.spark.sql.functions._

/** The multimodal decode path, checked against the JDK's own decoders:
  * ImageIO (which ships a BMP reader) and AudioSystem (which parses
  * WAV) are genuinely independent implementations — if they agree with
  * both MediaFixture's written headers and decodeMediaMeta's parsed
  * ones, the bytes are real files and the Column parser reads them
  * correctly. */
class MediaDecodeSpec extends SparkSpec {
  import spark.implicits._

  test("generated BMP bytes are a real image per ImageIO, and the Column parser agrees") {
    val bytes = MediaFixture.bmp(37, 21)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK ImageIO could not decode the generated BMP")
    assert(img.getWidth === 37 && img.getHeight === 21)

    val decoded = Multimodal.decodeMediaMeta(
      Seq((1L, bytes)).toDF("asset_id", "content")).head
    assert(decoded.getString(1) === "bmp")
    assert(decoded.getLong(2) === 37L && decoded.getLong(3) === 21L)
    assert(decoded.getLong(4) === 24L)
    assert(decoded.isNullAt(5) && decoded.isNullAt(6)) // wav fields null
  }

  test("generated WAV bytes are real audio per AudioSystem, and the Column parser agrees") {
    val bytes = MediaFixture.wav(channels = 2, sampleRate = 16000,
      bitsPerSample = 16, nSamples = 50)
    val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(bytes))
    assert(fmt.getFormat.getChannels === 2)
    assert(fmt.getFormat.getSampleRate === 16000f)
    assert(fmt.getFormat.getSampleSizeInBits === 16)
    assert(fmt.getFrameLength === 50)

    val decoded = Multimodal.decodeMediaMeta(
      Seq((1L, bytes)).toDF("asset_id", "content")).head
    assert(decoded.getString(1) === "wav")
    assert(decoded.isNullAt(2) && decoded.isNullAt(3)) // bmp fields null
    assert(decoded.getLong(5) === 2L)
    assert(decoded.getLong(6) === 16000L)
    assert(decoded.getLong(7) === 16L)
    assert(decoded.getLong(8) === 50L)
  }

  test("generated PNG bytes are a real image per ImageIO, and the Column parser agrees") {
    val bytes = MediaFixture.png(41, 23)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK ImageIO could not decode the generated PNG")
    assert(img.getWidth === 41 && img.getHeight === 23)

    val decoded = Multimodal.decodeMediaMeta(
      Seq((1L, bytes)).toDF("asset_id", "content")).head
    assert(decoded.getString(1) === "png")
    assert(decoded.getLong(2) === 41L && decoded.getLong(3) === 23L)
    assert(decoded.getLong(4) === 24L) // 8-bit truecolor = 3x8
    assert(decoded.isNullAt(5) && decoded.isNullAt(6)) // wav fields null
  }

  test("generated JPEG bytes are a real image per ImageIO, and the SOF walk agrees") {
    val bytes = MediaFixture.jpeg(52, 33)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK ImageIO could not decode the generated JPEG")
    assert(img.getWidth === 52 && img.getHeight === 33)

    val decoded = Multimodal.decodeMediaMeta(
      Seq((1L, bytes)).toDF("asset_id", "content")).head
    assert(decoded.getString(1) === "jpeg")
    assert(decoded.getLong(2) === 52L && decoded.getLong(3) === 33L)
    assert(decoded.getLong(4) === 24L) // precision 8 x 3 components
  }

  test("generated GIF bytes are a real image per ImageIO, and the Column parser agrees") {
    val bytes = MediaFixture.gif(37, 21)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK ImageIO could not decode the generated GIF")
    assert(img.getWidth === 37 && img.getHeight === 21)

    val decoded = Multimodal.decodeMediaMeta(
      Seq((1L, bytes)).toDF("asset_id", "content")).head
    assert(decoded.getString(1) === "gif")
    assert(decoded.getLong(2) === 37L && decoded.getLong(3) === 21L)
    assert(decoded.isNullAt(4)) // palette depth is ambiguous: bpp null
    assert(decoded.isNullAt(5) && decoded.isNullAt(6)) // wav fields null
  }

  test("generated TIFF bytes are a real image per ImageIO, and the IFD walk agrees") {
    // the JDK writer emits big-endian 'MM' with BitsPerSample as a
    // count-3 offset-indirected SHORT array: the walk's hardest path
    val bytes = MediaFixture.tiff(37, 21)
    assert(bytes(0) === 'M'.toByte && bytes(1) === 'M'.toByte)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK ImageIO could not decode the generated TIFF")
    assert(img.getWidth === 37 && img.getHeight === 21)

    val decoded = Multimodal.decodeMediaMeta(
      Seq((1L, bytes)).toDF("asset_id", "content")).head
    assert(decoded.getString(1) === "tiff")
    assert(decoded.getLong(2) === 37L && decoded.getLong(3) === 21L)
    assert(decoded.getLong(4) === 24L) // sum of [8,8,8] via the offset
  }

  test("little-endian TIFF (II) decodes through the same walk") {
    val bytes = MediaFixture.tiffLittleEndian(513, 300, 16)
    val decoded = Multimodal.decodeMediaMeta(
      Seq((1L, bytes)).toDF("asset_id", "content")).head
    assert(decoded.getString(1) === "tiff")
    // 513 = 0x0201: a value whose LE and BE u16 reads differ, so this
    // would fail loudly if the walk ignored the byte-order mark
    assert(decoded.getLong(2) === 513L && decoded.getLong(3) === 300L)
    assert(decoded.getLong(4) === 16L) // count-1 inline BitsPerSample
  }

  test("WebP VP8 and VP8L headers decode; truncation and a missing start code yield nulls") {
    val lossy = MediaFixture.webp(320, 240)
    val lossless = MediaFixture.webpLossless(1, 16384) // bitfield extremes
    val rows = Multimodal.decodeMediaMeta(Seq(
        (1L, lossy),
        (2L, lossless),
        (3L, lossy.take(14)),             // cut before the chunk fourcc
        (4L, lossy.updated(25, 0.toByte)) // corrupt the 9D012A start code
      ).toDF("asset_id", "content")).orderBy("asset_id").collect()
    rows.foreach(r => assert(r.getString(1) === "webp"))
    assert(rows(0).getLong(2) === 320L && rows(0).getLong(3) === 240L)
    assert(rows(1).getLong(2) === 1L && rows(1).getLong(3) === 16384L)
    assert((2 to 8).forall(rows(2).isNullAt), "truncated webp leaked fields")
    assert((2 to 8).forall(rows(3).isNullAt), "garbled webp leaked fields")
    assert(rows.forall(_.isNullAt(4)), "webp bpp must be null (YUV420)")
  }

  test("WebP VP8X extended container decodes canvas dims; truncation yields nulls") {
    // canvas dims above the 14-bit VP8 frame limit: only the VP8X
    // 24-bit canvas fields can carry them, so a decoder that fell
    // through to the embedded VP8 chunk would read the wrong numbers
    val ext = MediaFixture.webpVp8x(20000, 17000)
    val rows = Multimodal.decodeMediaMeta(Seq(
        (1L, ext),
        (2L, MediaFixture.webpVp8x(320, 240)),
        (3L, ext.take(24)),   // cut inside the VP8X payload
        (4L, ext.updated(16, 11.toByte)) // corrupt chunk size (must be 10)
      ).toDF("asset_id", "content")).orderBy("asset_id").collect()
    rows.foreach(r => assert(r.getString(1) === "webp"))
    assert(rows(0).getLong(2) === 20000L && rows(0).getLong(3) === 17000L)
    assert(rows(1).getLong(2) === 320L && rows(1).getLong(3) === 240L)
    assert((2 to 8).forall(rows(2).isNullAt), "truncated VP8X leaked fields")
    assert((2 to 8).forall(rows(3).isNullAt),
      "VP8X with a corrupt chunk-size field must yield null, never garbage")
  }

  test("EXIF-oriented TIFF reports display dims (5-8 transpose; 1-4 keep stored)") {
    // stored 30x20: orientations 5-8 display as 20x30, 1-4 as 30x20
    val rows = Multimodal.decodeMediaMeta(
      (1 to 8).map(o => (o.toLong, MediaFixture.tiffOriented(30, 20, 24, o)))
        .toDF("asset_id", "content")).orderBy("asset_id").collect()
    rows.foreach { r =>
      assert(r.getString(1) === "tiff")
      val o = r.getLong(0)
      val (w, h) = if (o >= 5) (20L, 30L) else (30L, 20L)
      assert(r.getLong(2) === w && r.getLong(3) === h,
        s"orientation $o: got ${r.getLong(2)}x${r.getLong(3)}")
      assert(r.getLong(4) === 24L)
    }
    // a TIFF with NO orientation entry keeps stored dims (null-safe swap)
    val plain = Multimodal.decodeMediaMeta(
      Seq((1L, MediaFixture.tiffLittleEndian(30, 20, 24)))
        .toDF("asset_id", "content")).head
    assert(plain.getLong(2) === 30L && plain.getLong(3) === 20L)
  }

  test("TIFF BitsPerSample with a non-SHORT type yields null bpp, not a fabricated number") {
    // patch entry 3 (tag 258) type SHORT(3) -> LONG(4): a left-justified
    // 16-bit read of a LONG value field would fabricate bpp=0
    val bytes = MediaFixture.tiffLittleEndian(10, 10, 8)
    val badType = bytes.clone(); badType(36) = 4
    val decoded = Multimodal.decodeMediaMeta(
      Seq((1L, badType)).toDF("asset_id", "content")).head
    assert(decoded.getString(1) === "tiff")
    assert(decoded.getLong(2) === 10L && decoded.getLong(3) === 10L,
      "width/height entries are untouched and must still decode")
    assert(decoded.isNullAt(4), "non-SHORT BitsPerSample must null bpp")
  }

  test("TIFF walk dies cleanly on adversarial IFDs") {
    val base = MediaFixture.tiffLittleEndian(10, 10, 8)
    // IFD offset pointing past EOF and a zero entry count must null
    // every field (a zero count must NOT build a descending sequence)
    val badOff = base.clone(); badOff(4) = 0xFF.toByte; badOff(5) = 0xFF.toByte
    val zeroEntries = base.clone(); zeroEntries(8) = 0; zeroEntries(9) = 0
    // an entry-count FLOOD (0xFFFF) is capped at maxEntries: the walk
    // stays bounded and the real leading entries still decode exactly
    val flood = base.clone(); flood(8) = 0xFF.toByte; flood(9) = 0xFF.toByte
    val rows = Multimodal.decodeMediaMeta(Seq(
        (1L, badOff), (2L, flood), (3L, zeroEntries))
      .toDF("asset_id", "content")).orderBy("asset_id").collect()
    rows.foreach(r => assert(r.getString(1) === "tiff"))
    assert((2 to 8).forall(rows(0).isNullAt), "past-EOF IFD leaked fields")
    assert(rows(1).getLong(2) === 10L && rows(1).getLong(3) === 10L &&
      rows(1).getLong(4) === 8L, "capped flood walk lost the real entries")
    assert((2 to 8).forall(rows(2).isNullAt), "zero-entry IFD leaked fields")
  }

  test("truncated PNG keeps its sniffed kind with every field null") {
    // signature + chunk length survive the cut; the IHDR payload does
    // not — a partial big-endian read must never become a dimension
    val decoded = Multimodal.decodeMediaMeta(
      Seq((1L, MediaFixture.png(8, 8).take(20)))
        .toDF("asset_id", "content")).head
    assert(decoded.getString(1) === "png")
    (2 to 8).foreach(i => assert(decoded.isNullAt(i), s"field $i not null"))
  }

  test("JPEG SOF walk dies cleanly on truncation mid-segment and on marker floods") {
    // cut inside the first segment: FFD8 + APP0 marker only
    val truncated = MediaFixture.jpeg(16, 16).take(6)
    val d1 = Multimodal.decodeMediaMeta(
      Seq((1L, truncated)).toDF("asset_id", "content")).head
    assert(d1.getString(1) === "jpeg")
    assert(d1.isNullAt(2) && d1.isNullAt(3) && d1.isNullAt(4))
    // adversarial chain: 100 minimal COM segments (FF FE 00 02) and no
    // SOF — the bounded walk must stop at its budget, null result
    val flood = (Array(0xFF, 0xD8).map(_.toByte) ++
      Array.fill(100)(Array(0xFF, 0xFE, 0x00, 0x02).map(_.toByte)).flatten)
    val d2 = Multimodal.decodeMediaMeta(
      Seq((1L, flood)).toDF("asset_id", "content")).head
    assert(d2.getString(1) === "jpeg")
    assert(d2.isNullAt(2) && d2.isNullAt(3) && d2.isNullAt(4))
  }

  test("sniffKind rejects non-media bytes") {
    val rows = Seq((1L, "not media at all".getBytes("UTF-8")))
      .toDF("asset_id", "content")
      .select(Multimodal.sniffKind(col("content")).as("k")).head
    assert(rows.getString(0) === "unknown")
  }

  test("truncated and degenerate headers yield nulls, not garbage") {
    val goodWav = MediaFixture.wav(2, 16000, 16, 50)
    // a zero-channel/zero-bits fmt chunk: would divide by zero in the
    // n_samples derivation
    val zeroCh = goodWav.clone()
    zeroCh(22) = 0; zeroCh(23) = 0 // channels = 0
    zeroCh(34) = 0; zeroCh(35) = 0 // bits_per_sample = 0
    val rows = Multimodal.decodeMediaMeta(Seq(
        (1L, MediaFixture.bmp(37, 21).take(10)), // BM magic, no header
        (2L, goodWav.take(20)),                  // RIFF/WAVE, no fmt chunk
        (3L, zeroCh))
      .toDF("asset_id", "content")).orderBy("asset_id").collect()
    assert(rows(0).getString(1) === "bmp")
    assert((2 to 8).forall(rows(0).isNullAt), "truncated bmp leaked fields")
    assert(rows(1).getString(1) === "wav")
    assert((2 to 8).forall(rows(1).isNullAt), "truncated wav leaked fields")
    assert(rows(2).getString(1) === "wav")
    assert(rows(2).getLong(5) === 0L && rows(2).isNullAt(8),
      "zero-channel wav must have null n_samples")
  }

  test("odd BMP widths survive the row-padding round trip") {
    // rowBytes padding (width*3 -> multiple of 4) is the classic BMP
    // bug; 1-px and 3-px wide images exercise both padding branches
    for (w <- Seq(1, 2, 3, 5); h <- Seq(1, 4)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(MediaFixture.bmp(w, h)))
      assert(img.getWidth === w && img.getHeight === h, s"($w,$h)")
    }
  }

  test("audioEnergy: features equal a JVM-side decode of the same bytes") {
    import spark.implicits._
    val bytes = MediaFixture.wav(channels = 2, sampleRate = 8000,
      bitsPerSample = 16, nSamples = 10)
    // reference decode straight off the byte array (little-endian i16)
    val data = bytes.drop(44)
    val samples = data.grouped(2).map { p =>
      val u = (p(0) & 0xff) | ((p(1) & 0xff) << 8)
      if (u >= 32768) u - 65536 else u
    }.toArray
    val assets = Seq((7L, bytes)).toDF("asset_id", "content")
    val row = graft.operators.Multimodal.audioEnergy(assets).collect().head
    assert(row.getLong(1) === samples.length.toLong)
    assert(row.getLong(2) === samples.map(s => s.toLong * s).sum)
    assert(row.getLong(3) === samples.map(math.abs).max.toLong)
  }

  test("imageStats: channel sums equal ImageIO's decode of the same bytes") {
    import spark.implicits._
    val bytes = MediaFixture.bmp(5, 4) // odd width: padding branch
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (yy <- 0 until img.getHeight; xx <- 0 until img.getWidth) {
      val rgb = img.getRGB(xx, yy)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
    }
    val assets = Seq((2L, bytes)).toDF("asset_id", "content")
    val row = graft.operators.Multimodal.imageStats(assets).collect().head
    assert(row.getLong(1) === 20L)
    assert((row.getLong(2), row.getLong(3), row.getLong(4)) === ((sr, sg, sb)))
  }

  test("imagePHash: bands equal an aHash computed from ImageIO's decode") {
    import spark.implicits._
    // distinct shapes incl. sub-8x8 (cells repeat pixels) and padded rows
    for ((w, h) <- Seq((37, 21), (5, 4), (64, 48), (8, 8))) {
      val bytes = MediaFixture.bmp(w, h)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      // independent aHash: ImageIO row 0 is the TOP of the bottom-up
      // bitmap, so file row sy maps to ImageIO row h-1-sy
      val grays = (0 until 64).map { p =>
        val gx = p % 8; val gy = p / 8
        val sx = gx * w / 8; val sy = gy * h / 8
        val rgb = img.getRGB(sx, h - 1 - sy)
        (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong
      }
      val gsum = grays.sum
      val expect = (0 until 4).map { k =>
        (15 to 0 by -1).foldLeft(0L) { (acc, i) =>
          acc * 2 + (if (grays(k * 16 + i) * 64 > gsum) 1L else 0L) }
      }
      val row = graft.operators.Multimodal.imagePHash(
        Seq((1L, bytes)).toDF("asset_id", "content")).collect().head
      assert((row.getAs[Long]("w"), row.getAs[Long]("h")) === ((w.toLong, h.toLong)))
      val got = Seq(row.getAs[Long]("b0"), row.getAs[Long]("b1"),
        row.getAs[Long]("b2"), row.getAs[Long]("b3"))
      assert(got === expect, s"aHash mismatch for ${w}x$h")
    }
  }

  test("imagePHash: equal dims imply equal hashes across distinct ids") {
    import spark.implicits._
    // ids 0 and 192 plant identical 1x1 BMPs; 16 and 208 identical 17x?;
    // a different-dims control must produce a different hash
    val ids = Seq(16L, 208L, 20L).toDF("doc_id")
    val ph = graft.operators.Multimodal.imagePHash(
      graft.operators.Multimodal.plantedMediaAssets(ids, "doc_id"))
      .collect().map(r => r.getAs[Long]("asset_id") ->
        (r.getAs[Long]("b0"), r.getAs[Long]("b1"),
          r.getAs[Long]("b2"), r.getAs[Long]("b3"))).toMap
    assert(ph(16L) === ph(208L),
      "identical planted content must fingerprint identically")
    assert(ph(16L) !== ph(20L),
      "different dims should not collide on this fixture")
  }

  test("q265 audio fingerprint: recovers exactly the mod-300 duplicate classes") {
    import spark.implicits._
    // odd ids 1..699 -> WAV content determined by (id%3, id%4, id%100);
    // lcm = 300, so classes {i, i+300, i+600} are byte-identical:
    // 50 triples (i <= 99) + 100 pairs (101 <= i <= 299)
    val ids = (0L until 700L).toDF("doc_id")
    val assets = Multimodal.plantedMediaAssets(ids, "doc_id")
    val groups = Multimodal.audioFingerprint(assets).collect()
    assert(groups.length === 150)
    val bySize = groups.groupBy(_.getAs[Long]("n_members"))
      .view.mapValues(_.length).toMap
    assert(bySize === Map(3L -> 50, 2L -> 100))
    // no false positives: every group's min and max member carry
    // byte-identical content (the ground truth the fingerprint claims)
    val content = assets.collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Array[Byte]]("content"))
      .toMap
    groups.foreach { g =>
      val (lo, hi) = (g.getAs[Long]("min_id"), g.getAs[Long]("max_id"))
      assert(java.util.Arrays.equals(content(lo), content(hi)),
        s"group ($lo, $hi) members differ in content")
      assert((hi - lo) % 300 === 0)
    }
  }
}
