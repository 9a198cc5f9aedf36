package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column with a typed metadata struct beside it, and
  * decode / feature-extraction runs as *batched* partition-local
  * transforms — the Spark-side shape a real pipeline needs (schema,
  * partitioning, batch size), with the actual codec behind a stub.
  *
  * ==== STUB BOUNDARY ====
  * This container has no image/audio libraries. `decodeBatch` is a
  * deterministic fake that reads "header" bytes off the payload; a real
  * deployment swaps ONLY its body for a vectorized decoder (JNI/FFI),
  * keeping the schema, the `mapPartitions` batching, and the plan shape
  * unchanged. That batching is the point: per-batch amortized codec
  * setup, bounded memory per task, no driver involvement.
  *
  * Scale notes (100 TB): payloads never shuffle — decode is a narrow map
  * over the scan; only the small extracted-metadata rows flow onward into
  * joins/aggregations. Partition sizing is controlled by the source
  * `maxPartitionBytes`, not row count, because rows are megabytes.
  */
object Multimodal {

  /** An opaque media row: id + raw bytes (+ declared kind). */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

  /** Typed metadata extracted by "decode". */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                             height: Long, mode: String)

  /** Deterministic fake decode of one batch — the stub body a real codec
    * replaces. "Header" fields are read off the first payload bytes;
    * n_bytes reports the full (virtual) media length. A truncated or
    * empty payload (fewer than 3 header bytes) yields a sentinel row with
    * mode "invalid" instead of throwing — one malformed upload must not
    * fail the whole task (and with it a 100 TB decode job).
    */
  private def decodeBatch(batch: Seq[(MediaRow, Long)]): Seq[MediaMeta] =
    batch.map { case (row, fullLen) =>
      val b = row.payload
      if (b == null || b.length < 3)
        MediaMeta(row.doc_id, fullLen, 0L, 0L, "invalid")
      else
        MediaMeta(
          doc_id = row.doc_id,
          n_bytes = fullLen,
          width = b(0) & 0xff,
          height = b(1) & 0xff,
          mode = if (((b(2) & 0xff) % 2) == 0) "rgb" else "gray")
    }

  /** Decode a media DataFrame (doc_id, kind, payload, full_len) into
    * typed metadata, `batchSize` rows at a time within each partition.
    */
  def decode(media: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("kind"), col("payload"),
        col("full_len").cast("long"))
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { it =>
        it.map { case (id, kind, p, len) => (MediaRow(id, kind, p), len) }
          .grouped(batchSize)
          .flatMap(decodeBatch)
      }
  }

  /** One sampled "video" frame: index + a checksum derived from the
    * payload header (stub for a real frame decode).
    */
  final case class Frame(doc_id: Long, frame_idx: Long, checksum: Long)

  /** Frame sampling: treat the payload as a virtual video of
    * `full_len` bytes in `frameSize`-byte frames and emit every
    * `every`-th frame — the one-to-many decode shape (flatMap inside the
    * batch loop). A real implementation seeks into the container per
    * sampled frame; the stub checksums off the header byte. Sampling
    * happens AT the decode boundary so unsampled frames are never
    * materialized — at 100 TB that's the difference between shuffling
    * sampled frames and shuffling whole videos.
    */
  def sampleFrames(media: DataFrame, every: Int = 7,
                   frameSize: Int = 1000, batchSize: Int = 64): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("payload"),
        col("full_len").cast("long"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, p, len) =>
            // malformed payload (no header byte): emit no frames rather
            // than failing the task — mirrors decodeBatch's sentinel
            if (p == null || p.isEmpty) Nil
            else {
              val nFrames = len / frameSize
              val b0 = p(0) & 0xff
              (0L until nFrames).filter(_ % every == 0).map { i =>
                Frame(id, i, (i * b0) % 256)
              }
            }
          }
        }
      }
  }

  /** Resize planning over decoded metadata: target dimensions that fit a
    * `maxDim`-square box preserving aspect ratio, never upscaling —
    * integer arithmetic only (floor division), so both engines agree
    * exactly. This is the metadata half of a resize stage: the pixel
    * half is codec work behind the stub boundary, and the PLAN (which
    * rows need work, to what size) is what flows into scheduling — pure
    * Column algebra, payloads untouched and never shuffled. Invalid
    * decodes (0-dim sentinel) plan to 0×0 with needs_resize = false.
    */
  def resizePlan(meta: DataFrame, maxDim: Long = 64L): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val needs = longest > maxDim
    meta.select(
      col("doc_id"), col("width"), col("height"),
      when(needs, expr(s"cast(width * $maxDim div greatest(width, height) as bigint)"))
        .otherwise(col("width")).as("out_w"),
      when(needs, expr(s"cast(height * $maxDim div greatest(width, height) as bigint)"))
        .otherwise(col("height")).as("out_h"),
      needs.as("needs_resize"))
  }

  /** One perceptual-hash row (see [[phash16]]). */
  final case class MediaHash(doc_id: Long, phash: Long)

  /** Perceptual-hash stand-in at the decode boundary: a 16-bit
    * signature over the payload's CONTENT bytes (the stub reads the
    * 3-byte header a real pHash would replace with a DCT over decoded
    * pixels). The property that matters is invariance under container
    * re-encodes — bytes past the header can change (new digest) while
    * the signature doesn't — which is exactly what separates perceptual
    * dedup from digest dedup. The stub hash is strictly per-element, so
    * the rows map straight through `mapPartitions` — no `grouped`
    * buffering (a real DCT-based pHash that batches onto an accelerator
    * would reintroduce the [[decode]]-style batch loop at this spot).
    * Payloads never shuffle, only (id, 16-bit hash) rows flow on.
    * Malformed payloads (< 3 header bytes) hash to the -1 sentinel
    * rather than failing the task.
    */
  def phash16(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          if (p == null || p.length < 3) MediaHash(id, -1L)
          else {
            val b0 = p(0) & 0xff; val b1 = p(1) & 0xff; val b2 = p(2) & 0xff
            MediaHash(id, ((b0 * 256 + b1) + b2 * 31) % 65536L)
          }
        }
      }
  }

  /** Synthesize an opaque payload column for the fixtures: the md5 bytes
    * of the text stand in for a media header; `n_chars` plays the full
    * media length. Deterministic, so the decode output is
    * oracle-checkable from `documents` alone.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image").as("kind"),
      unhex(md5(col("text"))).as("payload"),
      col("n_chars").as("full_len"))
}
