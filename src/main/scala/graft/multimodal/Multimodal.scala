package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns with typed metadata, processed by
  * partition-batched transforms.
  *
  * The decode step itself (image/audio codecs) is STUBBED — the codec
  * libraries are not in this container — behind [[DecodeStub]], a
  * deterministic fake that derives "features" from the bytes. Everything
  * around it is real and tested: the schema contract, the
  * `mapPartitions` batch shape (the Scala equivalent of a Pandas-UDF
  * `mapInPandas`: one JVM-side batch loop per partition, codec
  * initialized once per partition, not per row), partition sizing, and
  * the feature-frame output.
  *
  * Scale design: media blobs dominate row size, so [[repartitionForMedia]]
  * targets a byte budget per partition rather than a row count; decode is
  * map-only (no shuffle); features are a narrow projection written
  * separately from the blobs.
  */
object Multimodal {

  /** Typed metadata carried alongside every media blob. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),         // image | audio | video
    StructField("mime", StringType),
    StructField("width", IntegerType),       // images/video
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType), // audio
    StructField("duration_ms", LongType)))   // audio/video

  /** The canonical multimodal table schema. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", MediaMetaType)))

  /** Build a media table from the documents fixture: each doc's UTF-8
    * bytes stand in for an encoded blob (deterministic, real binary
    * column exercising the same plumbing).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("image").as("kind"),
        lit("application/octet-stream").as("mime"),
        (pmod(col("doc_id"), lit(1024)) + 16).cast(IntegerType).as("width"),
        (pmod(col("doc_id") * 7, lit(1024)) + 16).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))

  /** One decoded feature row per media item. */
  final case class MediaFeatures(media_id: Long, n_bytes: Long,
                                 checksum: Long, mean_byte: Double,
                                 entropy_bits: Double)

  /** The stubbed codec. A real deployment swaps `decode` for an actual
    * image/audio decode (???-shaped seam); the surrounding batch loop,
    * schema, and partitioning stay identical.
    */
  object DecodeStub {
    /** Deterministic fake decode: byte statistics standing in for pixel/
      * sample features.
      */
    def decode(mediaId: Long, bytes: Array[Byte]): MediaFeatures = {
      var sum = 0L
      var crc = 0L
      val hist = new Array[Long](256)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xFF
        sum += b
        crc = crc * 31 + b
        hist(b) += 1
        i += 1
      }
      val n = bytes.length.toLong
      var entropy = 0.0
      if (n > 0) {
        var j = 0
        while (j < 256) {
          if (hist(j) > 0) {
            val p = hist(j).toDouble / n
            entropy -= p * (math.log(p) / math.log(2))
          }
          j += 1
        }
      }
      MediaFeatures(mediaId, n, crc,
        if (n > 0) sum.toDouble / n else 0.0, entropy)
    }
  }

  /** Batch feature extraction: `mapPartitions` so any per-codec setup
    * happens once per partition (the JVM analogue of `mapInPandas`
    * batch processing). Returns the narrow feature frame.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition codec init would go here (once, not per row)
        batch.map { case (id, bytes) =>
          DecodeStub.decode(id, Option(bytes).getOrElse(Array.emptyByteArray))
        }
      }
  }

  /** Partition by a per-partition byte budget (blob tables must not use
    * row-count heuristics: 1e6 × 5 MB rows per partition OOMs).
    */
  def repartitionForMedia(media: DataFrame, totalBytes: Long,
                          targetPartitionBytes: Long = 128L << 20): DataFrame = {
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    media.repartition(parts, col("media_id"))
  }
}
