package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * decoded per-partition in batches.
  *
  * The corpus has no real image/audio bytes (and this container has no
  * codec libraries), so `decodeMeta` is a DETERMINISTIC STUB — it derives
  * fake media metadata from the payload bytes alone. Everything around it
  * is the real production shape: binary column in, `mapPartitions` with a
  * product encoder (one iterator per partition = one "decoder" per task,
  * amortizing per-batch model/codec init exactly like `mapInPandas`), typed
  * metadata out. Swapping `stubDecode` for a JNI/codec call changes no
  * plumbing.
  */
object Multimodal {

  final case class MediaPayload(doc_id: Long, payload: Array[Byte])

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB decoder: metadata as a pure function of the payload size. A real
    * implementation parses the container header here.
    */
  def stubDecode(p: MediaPayload): MediaMeta = {
    val n = p.payload.length.toLong
    MediaMeta(
      doc_id = p.doc_id,
      n_bytes = n,
      width = (64 + n % 577).toInt,
      height = (64 + (n * 31) % 353).toInt,
      n_frames = (1 + n % 7).toInt)
  }

  /** Attach a binary payload column (here: the utf-8 text bytes standing in
    * for real media bytes) and decode per-partition.
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame, idCol: String = "doc_id"): Dataset[MediaMeta] = {
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaPayload]
      .mapPartitions { it =>
        // per-partition init site (codec/model handle goes here)
        it.map(stubDecode)
      }
  }
}
