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
}
