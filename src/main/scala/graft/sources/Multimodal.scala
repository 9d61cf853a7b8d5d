package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus batched per-partition feature
  * extraction.
  *
  * The Spark-side mechanics (schema, partitioning, batch shape, deterministic
  * outputs) are real and tested; the actual media decode is STUBBED — the
  * container has no image/audio codecs — behind [[StubCodec]], which derives
  * deterministic fake features from the bytes. Swapping in a real codec
  * changes only that object.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      format: String,
      payload: Array[Byte],
      declared_width: Int,
      declared_height: Int)

  final case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Long,
      checksum: Long,
      width: Int,
      height: Int,
      brightness: Double)

  /** STUB decode: deterministic pseudo-features from raw bytes. A real
    * implementation would decode pixels/samples here; everything upstream
    * and downstream of this call is production-shaped.
    */
  object StubCodec {
    def decode(format: String, payload: Array[Byte], w: Int, h: Int): (Int, Int, Double) = {
      val brightness =
        if (payload.isEmpty) 0.0
        else payload.map(b => (b & 0xff).toDouble).sum / (payload.length * 255.0)
      (w, h, BigDecimal(brightness).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  /** Build a synthetic media table from the documents table: payload =
    * UTF-8 bytes of the text, metadata derived deterministically. Stands in
    * for `spark.read.format("binaryFile")` over a media lake.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("declared_width"),
      (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("declared_height"))

  /** Batched per-partition feature extraction — the Scala analogue of a
    * `mapInPandas` decode stage: one codec invocation per row, amortized
    * setup per partition, output schema fixed by [[MediaFeatures]].
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition codec setup would go here (real decoders are expensive
      // to construct — never per-row)
      rows.map { r =>
        val crc = new java.util.zip.CRC32
        crc.update(r.payload)
        val (w, h, brightness) =
          StubCodec.decode(r.format, r.payload, r.declared_width, r.declared_height)
        MediaFeatures(r.media_id, r.format, r.payload.length.toLong,
          crc.getValue, w, h, brightness)
      }
    }
  }

  /** Deterministic frame sampling plumbing for video-like payloads: emit
    * every `stride`-th chunk of `frameBytes` bytes as its own row —
    * the schema/partitioning shape of real frame extraction.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.as[MediaRow].flatMap { r =>
      val nFrames = r.payload.length / frameBytes
      (0 until nFrames by stride).map { i =>
        (r.media_id, i.toLong, r.payload.slice(i * frameBytes, (i + 1) * frameBytes))
      }
    }.toDF("media_id", "frame_index", "frame_payload")
  }
}
