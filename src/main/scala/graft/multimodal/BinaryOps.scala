package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads modeled as opaque
  * `binary` columns with typed metadata, processed per-partition.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libraries exist in this container — see the build brief); everything
  * around it — schema, typed Dataset, mapPartitions batching, partition
  * sizing — is the real plumbing a decode UDF would ride on. Swapping
  * [[stubDecode]] for a JNI/FFI decoder changes no query shape.
  *
  * Scale: decode is embarrassingly parallel per-partition;
  * `spark.sql.files.maxPartitionBytes` bounds the bytes decoded per task,
  * so executor memory is bounded regardless of corpus size.
  */
object BinaryOps {

  case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB decoder: derives fake media metadata deterministically from the
    * payload byte length. A real implementation would parse the container
    * header here.
    */
  def stubDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(docId, n, 64 + n % 512, 64 + (n * 7) % 512, 1 + n % 30)
  }

  /** Attach a binary payload column (documents.text encoded as UTF-8 —
    * standing in for real media bytes) and extract metadata per partition.
    */
  def extractMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => stubDecode(id, bytes) })
  }

  /** Frame-sampling shape: explode n_frames into (doc_id, frame_idx) rows —
    * the fan-out a video pipeline feeds to per-frame feature extraction.
    */
  def sampleFrames(meta: Dataset[MediaMeta], everyNth: Int): DataFrame =
    meta.toDF()
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))).as("frame_idx"))

  /** STUB feature extractor: a deterministic `dim`-float vector derived
    * from the payload bytes — standing in for an image/audio embedding
    * model. Each component folds every byte once (one pass over the
    * payload per vector, the same access pattern a real featurizer has).
    */
  def stubFeaturize(payload: Array[Byte], dim: Int): Array[Double] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      val d = i % dim
      acc(d) = acc(d) * 31 + (payload(i) & 0xff)
      i += 1
    }
    acc.map(v => ((v % 1000) + 1000) % 1000 / 1000.0)
  }

  /** Per-payload embedding extraction: the mapPartitions stage a model
    * featurizer rides on (batch shape = one partition; swap
    * [[stubFeaturize]] for an ONNX/JNI model call and nothing else
    * changes). Output embeds straight into [[graft.operators.Similarity]]
    * — `bruteForceTopK` / `lshTopK` / `ivfTopK` accept the array column
    * as-is.
    */
  def featurize(spark: SparkSession, docs: DataFrame, dim: Int = 8): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, stubFeaturize(bytes, dim)) })
      .toDF("doc_id", "embedding")
  }

  /** Resize planning: fit each image into a `box`×`box` square preserving
    * aspect ratio (never upscale) — the target-dimension arithmetic every
    * thumbnail/normalization stage runs before the actual pixel work. Pure
    * column math over the metadata; the decode-and-scale kernel would
    * consume (out_w, out_h) per row.
    */
  def resizePlan(meta: Dataset[MediaMeta], box: Int): DataFrame = {
    val scale = least(lit(1.0), lit(box.toDouble) / col("width"),
      lit(box.toDouble) / col("height"))
    meta.toDF().select(
      col("doc_id"), col("width"), col("height"),
      floor(col("width") * scale).cast("int").as("out_w"),
      floor(col("height") * scale).cast("int").as("out_h"))
  }
}
