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
    payloads(docs, idCol)
      .mapPartitions { it =>
        // per-partition init site (codec/model handle goes here)
        it.map(stubDecode)
      }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame_len: Int, frame: Array[Byte])

  final case class Features(doc_id: Long, features: Array[Float])

  private def payloads(docs: DataFrame, idCol: String): Dataset[MediaPayload] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
      col("text").cast("binary").as("payload")).as[MediaPayload]
  }

  /** Frame sampling: split each payload into its `n_frames` (from the stub
    * decode) equal chunks — one output row per frame. The real analogue is
    * keyframe extraction; the explode shape (1 row in → n rows out via
    * mapPartitions) and the per-frame binary column are production-real.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame, idCol: String = "doc_id"): Dataset[Frame] = {
    import spark.implicits._
    payloads(docs, idCol).mapPartitions { it =>
      it.flatMap { p =>
        val meta = stubDecode(p)
        val n = p.payload.length
        val sz = (n + meta.n_frames - 1) / meta.n_frames // ceil
        (0 until meta.n_frames).iterator.map { i =>
          val from = math.min(i * sz, n)
          val until = math.min((i + 1) * sz, n)
          Frame(p.doc_id, i, until - from, java.util.Arrays.copyOfRange(p.payload, from, until))
        }
      }
    }
  }

  final case class ResizedMedia(
      doc_id: Long, width: Int, height: Int, n_bytes: Long, resized: Array[Byte])

  /** Resize stub: emits target-dimension metadata plus a deterministic
    * byte subsample standing in for the rescaled pixel buffer (every
    * `stride`-th byte, stride chosen so output ≈ targetW·targetH/256
    * bytes). The real analogue swaps the subsample for a scaler call;
    * the 1-row-in/1-smaller-row-out mapPartitions shape is identical.
    */
  def resize(spark: SparkSession, docs: DataFrame, targetW: Int, targetH: Int,
      idCol: String = "doc_id"): Dataset[ResizedMedia] = {
    import spark.implicits._
    payloads(docs, idCol).mapPartitions { it =>
      it.map { p =>
        val n = p.payload.length
        val outLen = math.max(1, math.min(n, targetW * targetH / 256))
        val stride = math.max(1, n / outLen)
        val out = (0 until n by stride).take(outLen).map(p.payload).toArray
        ResizedMedia(p.doc_id, targetW, targetH, n.toLong, out)
      }
    }
  }

  /** Feature extraction stub: a 16-dim byte-histogram "embedding" per
    * payload (normalized). A real model swap changes only the body —
    * batch shape (iterator in, fixed-dim float vectors out) is what a
    * GPU-backed extractor needs.
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame, idCol: String = "doc_id"): Dataset[Features] = {
    import spark.implicits._
    payloads(docs, idCol).mapPartitions { it =>
      it.map { p =>
        val hist = new Array[Float](16)
        p.payload.foreach(b => hist((b & 0xFF) % 16) += 1f)
        val n = math.max(1, p.payload.length).toFloat
        Features(p.doc_id, hist.map(_ / n))
      }
    }
  }
}
