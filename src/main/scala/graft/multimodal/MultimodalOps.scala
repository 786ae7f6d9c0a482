package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column operators (builder-prompt north-star): image/audio/
  * video as opaque `binary` payloads with typed metadata, processed in
  * batch-shaped partition iterators.
  *
  * The real Spark surface — schema, partitioning, the
  * iterator-per-partition transform shape (the Scala analog of PySpark's
  * `mapInPandas` batches), and the frame-sampling fan-out — is fully
  * implemented and tested. The actual byte decoding is a clearly-marked
  * STUB (`decodeStub`): the container ships no image/audio codecs, so it
  * derives deterministic pseudo-features from the bytes. Swapping in a
  * real codec changes only that one function; every plan shape stays.
  */
object MultimodalOps {

  final case class MediaMeta(kind: String, width: Int, height: Int, nFrames: Int)
  final case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 features: Array[Double])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("nFrames", IntegerType))),
      nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Deterministic synthetic media table derived from `documents` (the
    * testdata carries no binary column): payload = utf8 bytes, meta from
    * doc stats. Stands in for `spark.read.format("binaryFile")` at the
    * same schema.
    */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      struct(
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") % 120 + 1).cast("int").as("nFrames")).as("meta"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder: a real implementation would hand `payload` to a codec
    * (JPEG/PNG/PCM) here. This deterministic fake folds the bytes into a
    * fixed-width feature vector so downstream plumbing (schema, joins,
    * ANN over the features) is fully exercisable.
    */
  private[multimodal] def decodeStub(payload: Array[Byte], dim: Int = 8): Array[Double] = {
    val acc = new Array[Double](dim)
    var i = 0
    while (i < payload.length) {
      acc(i % dim) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    acc
  }

  /** Batch-shaped feature extraction: one partition = one batch, the
    * iterator never materializes the partition (constant memory per
    * task — the property that matters at 100 TB). Input is repartitioned
    * by media_id so payloads of one key co-locate.
    */
  def extractFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .repartition(col("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          MediaFeatures(r.media_id, r.meta.kind, r.payload.length.toLong,
            decodeStub(r.payload))
        }
      }
  }

  /** "Resize" as metadata transformation (a real impl would re-encode the
    * payload in the same mapPartitions shape as [[extractFeatures]]).
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(col("meta.kind").as("kind"), lit(w).as("width"), lit(h).as("height"),
        col("meta.nFrames").as("nFrames")))

  /** Frame sampling for video rows: explode every k-th frame index —
    * the row fan-out a video pipeline needs, as a generator (sequence +
    * explode), not a driver loop.
    */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media
      .filter(col("meta.kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.nFrames") - 1, lit(everyK))))
      .select(col("media_id"), col("frame_idx"), col("meta"))
}
