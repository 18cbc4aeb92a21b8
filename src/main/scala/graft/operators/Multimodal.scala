package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC STUB (clearly marked below): it derives "features"
  * from the raw bytes (length, hash, fake dimensions) instead of real
  * pixel decoding. Everything around it — the asset schema, the
  * per-partition batch iteration, the explode-to-frames shape, column
  * pruning behavior — is the real Spark plumbing a production decoder
  * would drop into (swap `stubDecode` for an opencv/ffmpeg call inside
  * the same mapPartitions).
  */
object Multimodal {

  /** Canonical asset schema: id + media kind + raw bytes + metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("kind", StringType),                    // image|audio|video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("n_frames", IntegerType))))))

  /** Build an asset table from any (id, string) source — the
    * deterministic stand-in for reading real media files; content bytes
    * are the UTF-8 payload. */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val content = col(textCol).cast("binary")
    df.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      content.as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(content).cast("long").as("n_bytes"),
        (col(idCol) % 16 + 1).cast("int").as("n_frames")).as("meta"))
  }

  // ------------------------------------------------------------------
  // STUB DECODE KERNEL — deterministic fake. A real deployment replaces
  // the body with an actual codec call; the signature (bytes in,
  // features out) and the surrounding plan stay identical.
  // ------------------------------------------------------------------
  private def stubWidth(nBytes: Column): Column = nBytes % 640 + 1
  private def stubHeight(nBytes: Column): Column = (nBytes * 7) % 480 + 1

  /** "Decode" assets into per-asset features. Pure Column expressions —
    * at scale this is a projection over the binary scan, no shuffle. */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val n = length(col("content")).cast("long")
    assets.select(
      col("asset_id"), col("kind"),
      n.as("n_bytes"),
      sha2(col("content"), 256).as("content_sha256"),
      stubWidth(n).as("width"),
      stubHeight(n).as("height"),
      (n.cast("double") / greatest(col("meta.n_frames"), lit(1))).as("bytes_per_frame"))
  }

  /** Frame sampling: one row per sampled frame index (stride sampling
    * over meta.n_frames). The explode is the real shape a video
    * pipeline uses; frame content extraction is stubbed to a byte
    * offset. */
  def sampleFrames(assets: DataFrame, stride: Int = 4): DataFrame =
    assets.select(col("asset_id"), col("meta.n_frames").as("n_frames"),
        length(col("content")).cast("long").as("n_bytes"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))))
      .withColumn("frame_offset",
        (col("frame_idx").cast("long") * col("n_bytes")
          / greatest(col("n_frames"), lit(1))).cast("long"))
      .select("asset_id", "frame_idx", "frame_offset")

  /** Partition-level batch decode via mapPartitions — the seam where a
    * real codec (JNI/ffmpeg) would process a batch of blobs per task.
    * Returns (asset_id, feature) pairs; the fake feature is a byte sum
    * so results are deterministic and testable. */
  def batchDecode(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // STUB: byte-sum "embedding"; a real decoder amortizes codec
        // init across the partition exactly like this.
        it.map { case (id, bytes) =>
          var acc = 0L
          var i = 0
          while (i < bytes.length) { acc += (bytes(i) & 0xff); i += 1 }
          (id, acc)
        }
      }.toDF("asset_id", "byte_sum")
  }
}
