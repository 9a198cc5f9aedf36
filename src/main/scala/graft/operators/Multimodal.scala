package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column with a typed metadata struct beside it, and
  * decode / feature-extraction runs as *batched* partition-local
  * transforms — the Spark-side shape a real pipeline needs (schema,
  * partitioning, batch size).
  *
  * Codec status — all three halves now run REAL JDK codecs, no
  * external deps: IMAGE via javax.imageio (genuine PNG/BMP parse,
  * pixel-exact hashes), AUDIO via javax.sound.sampled (genuine
  * WAV/AIFF parse, endian-normalized sample hashes), and VIDEO via
  * javax.imageio's multi-frame containers (animated GIF / multi-page
  * TIFF: genuine frame-directory walks, per-frame pixel folds —
  * [[decodeVideo]]/[[sampleVideoFrames]]/[[videoHash64]]). The JDK
  * ships no MP4/H.264 decoder; since r16 the swap point is a TESTED
  * INTERFACE, not a scaladoc promise: every decode path resolves its
  * codec from [[MediaCodecs]] (a registry keyed by container magic,
  * JDK codecs as the default registration, the chain captured into
  * the plan's closures at construction), so a production deployment
  * registers a vectorized MP4 codec (JNI/FFI) and the SAME schema,
  * `mapPartitions` batching, and plan shape carry it. The original
  * byte-range stubs (`decodeBatch`/[[sampleFrames]]) remain for
  * virtual-frame workloads. That batching is the point: per-batch
  * amortized codec setup, bounded memory per task, no driver
  * involvement.
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

  /** Content hash + container digest from one decode pass (see
    * [[sampleHashDigest64]] / [[videoHashDigest64]]).
    */
  final case class MediaHashDigest(doc_id: Long, phash: Long,
                                   digest: String)

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

  // ===================== REAL CODEC BOUNDARY =====================
  // javax.imageio is part of the JDK, so the image half of the stub
  // boundary can be genuinely real: the fixtures carry true PNG/BMP
  // bytes and the decode below actually parses containers into pixels.
  // The batched `mapPartitions` plumbing is IDENTICAL to the stub
  // path — swapping the codec never touches the plan shape, which is
  // the contract the stub documented.

  // ImageIO's default stream cache writes temp FILES per read — at a
  // million decodes per task that is pure I/O overhead; in-memory
  // caching is what a batch decode wants
  private lazy val imageIoInit: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic REAL image fixture: one true PNG per document, with
    * oracle-computable header facts — width `2 + doc_id % 31`, height
    * `2 + n_chars % 17`, grayscale for odd ids and RGB for even. The
    * first four pixels spell out the doc_id bytes so no two documents
    * can ever share pixel content (what makes [[pixelHash64]] groups
    * exactly predictable); the rest is a position gradient. Encoding
    * runs partition-local (a narrow map), exactly where a real
    * pipeline's media bytes would enter the plan.
    */
  def syntheticImageMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        imageIoInit
        it.map { case (id, nChars) =>
          val w = 2 + (id % 31).toInt
          val hgt = 2 + (nChars % 17).toInt
          val gray = id % 2 != 0
          val img = new java.awt.image.BufferedImage(w, hgt,
            if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
            else java.awt.image.BufferedImage.TYPE_INT_RGB)
          var idx = 0
          var y = 0
          while (y < hgt) {
            var x = 0
            while (x < w) {
              val v =
                if (idx < 4) ((id >> (8 * idx)) & 0xffL).toInt
                else (x * 7 + y * 13 + (id & 0xffL).toInt) & 0xff
              if (gray)
                // write the raster sample DIRECTLY: setRGB on a gray
                // image runs a colorspace conversion that can collapse
                // nearby values — the id-byte pixels must round-trip
                // exactly (PNG is lossless at the sample level)
                img.getRaster.setSample(x, y, 0, v)
              else
                img.setRGB(x, y,
                  (v << 16) | (((x * 5 + y * 11) & 0xff) << 8) | (v ^ 0x5a))
              idx += 1; x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          (id, "image", baos.toByteArray, nChars)
        }
      }
      .toDF("doc_id", "kind", "payload", "full_len")
  }

  /** REAL batched decode: javax.imageio parses each payload's container
    * into pixels and the metadata row reports the genuinely decoded
    * dimensions and color mode (1 component = gray, else rgb);
    * `n_bytes` stays the declared full media length like the stub.
    * Same `grouped(batchSize)` loop as [[decode]] — per-batch amortized
    * codec setup, bounded memory, payloads never shuffle. An
    * unparseable payload yields the "invalid" sentinel row, not a task
    * failure.
    */
  def decodeImage(media: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    // codec chain captured at PLAN time: registered
    // codecs ship to executors inside the closure
    val imgChain = MediaCodecs.imageChain
    media
      .select(col("doc_id").cast("long"), col("payload"),
        col("full_len").cast("long"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { it =>
        imageIoInit
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, p, len) =>
            val img = MediaCodecs.decodeImage(imgChain, p)
            if (img == null) MediaMeta(id, len, 0L, 0L, "invalid")
            else MediaMeta(id, len, img.getWidth.toLong,
              img.getHeight.toLong,
              if (img.getColorModel.getNumComponents == 1) "gray"
              else "rgb")
          }
        }
      }
  }

  /** Re-encode each payload into `format` (e.g. PNG → "bmp"): decoded
    * pixels unchanged, container bytes completely different — the
    * transformation that separates pixel-level dedup from digest
    * dedup. Rows whose image cannot decode or re-encode pass through
    * unchanged (their digest group is unaffected).
    */
  def transcode(media: DataFrame, format: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // codec chain captured at PLAN time: registered
    // codecs ship to executors inside the closure
    val imgChain = MediaCodecs.imageChain
    media
      .select(col("doc_id").cast("long"), col("kind"), col("payload"),
        col("full_len").cast("long"))
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { it =>
        imageIoInit
        it.map { case (id, kind, p, len) =>
          val out = MediaCodecs.decodeImage(imgChain, p) match {
            case null => p // undecodable/null payload: pass through
            case img =>
              try {
                val baos = new java.io.ByteArrayOutputStream()
                if (javax.imageio.ImageIO.write(img, format, baos))
                  baos.toByteArray
                else p
              } catch { case scala.util.control.NonFatal(_) => p }
          }
          (id, kind, out, len)
        }
      }
      .toDF("doc_id", "kind", "payload", "full_len")
  }

  /** Exact content hash over DECODED pixels — container-invariant
    * dedup: a PNG and a BMP of the same pixels collide; any pixel
    * difference separates. Deterministic integer fold over raster
    * samples (gray) / packed RGB (color), dims mixed in. The
    * per-element map shape mirrors [[phash16]]; undecodable payloads
    * hash to the -1 sentinel.
    */
  def pixelHash64(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    // codec chain captured at PLAN time: registered
    // codecs ship to executors inside the closure
    val imgChain = MediaCodecs.imageChain
    media
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoInit
        it.map { case (id, p) => MediaHash(id, pixelPhashOf(imgChain, p)) }
      }
  }

  /** One row's [[pixelHash64]] fold, factored out so the digest-
    * combined variant computes the identical value.
    */
  private def pixelPhashOf(imgChain: Seq[MediaCodecs.ImageCodec],
                           p: Array[Byte]): Long = {
    val img = MediaCodecs.decodeImage(imgChain, p)
    if (img == null) -1L
    else {
      val gray = img.getColorModel.getNumComponents == 1
      var h = 1125899906842597L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val v =
            if (gray) img.getRaster.getSample(x, y, 0)
            else img.getRGB(x, y) & 0xffffff
          h = h * 1000003L + v
          x += 1
        }
        y += 1
      }
      h = h * 31L + img.getWidth
      h = h * 31L + img.getHeight
      h
    }
  }

  /** [[pixelHash64]] + the container md5 digest in the SAME partition
    * pass — the image twin of [[sampleHashDigest64]]: one synthesize/
    * transcode/decode of each payload serves both columns instead of
    * two derivations of the payload table re-joined on doc_id.
    */
  def pixelHashDigest64(media: DataFrame): Dataset[MediaHashDigest] = {
    val spark = media.sparkSession
    import spark.implicits._
    val imgChain = MediaCodecs.imageChain
    media
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoInit
        it.map { case (id, p) =>
          MediaHashDigest(id, pixelPhashOf(imgChain, p), md5Hex(p))
        }
      }
  }

  /** TRUE perceptual average-hash over decoded pixels: integer-exact
    * luminance, block-averaged onto an 8×8 grid, one bit per cell
    * (above the grid mean). Invariant under container re-encode and
    * stable under small pixel noise; NOT oracle-expressible (the hash
    * values have no SQL form), so its contracts are pinned in
    * MultimodalSpec instead. Undecodable payloads hash to -1.
    */
  def ahash64(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    // codec chain captured at PLAN time: registered
    // codecs ship to executors inside the closure
    val imgChain = MediaCodecs.imageChain
    media
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoInit
        it.map { case (id, p) =>
          val img = MediaCodecs.decodeImage(imgChain, p)
          if (img == null) MediaHash(id, -1L)
          else {
            val w = img.getWidth; val hh = img.getHeight
            val gray = img.getColorModel.getNumComponents == 1
            def lum(x: Int, y: Int): Long =
              if (gray) img.getRaster.getSample(x, y, 0).toLong
              else {
                val rgb = img.getRGB(x, y)
                (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                  114L * (rgb & 0xff)) / 1000L
              }
            // block-average onto 8x8: cell (i,j) covers the half-open
            // pixel rectangle [i*w/8,(i+1)*w/8) x [j*h/8,(j+1)*h/8);
            // degenerate (empty) ranges for tiny images fall back to
            // the nearest pixel — all integer math, so the hash is
            // bit-stable across JVMs
            val cells = new Array[Long](64)
            var j = 0
            while (j < 8) {
              var i = 0
              while (i < 8) {
                val x0 = i * w / 8; val x1 = math.max(x0 + 1, (i + 1) * w / 8)
                val y0 = j * hh / 8; val y1 = math.max(y0 + 1, (j + 1) * hh / 8)
                var s = 0L; var n = 0L
                var yy = y0
                while (yy < y1 && yy < hh) {
                  var xx = x0
                  while (xx < x1 && xx < w) {
                    s += lum(xx, yy); n += 1; xx += 1
                  }
                  yy += 1
                }
                cells(j * 8 + i) =
                  if (n == 0) lum(math.min(x0, w - 1), math.min(y0, hh - 1))
                  else s / n
                i += 1
              }
              j += 1
            }
            val mean = cells.sum / 64L
            var bits = 0L
            var k = 0
            while (k < 64) {
              if (cells(k) > mean) bits |= (1L << k)
              k += 1
            }
            MediaHash(id, bits)
          }
        }
      }
  }

  // ---------------------------------------------------------------- audio

  /** Typed metadata from a REAL audio container parse: sample rate in
    * Hz, channel count, frame count, bits per sample — or the
    * "invalid" sentinel for unparseable payloads.
    */
  final case class AudioMeta(doc_id: Long, sample_rate: Long,
                             channels: Long, n_frames: Long, bits: Long,
                             mode: String)

  /** Deterministic REAL audio fixture: one true 16-bit PCM WAV per
    * document, with oracle-computable header facts — sample rate
    * `8000 · (1 + doc_id % 3)`, channels `1 + doc_id % 2`, frames
    * `50 + n_chars % 100`. The first four samples carry the doc_id
    * bytes (sign-extended), so no two documents share sample content
    * (what makes [[sampleHash64]] groups exactly predictable); the
    * rest is a deterministic integer wave. Encoding runs
    * partition-local, where a real pipeline's media bytes enter.
    */
  def syntheticAudioMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val rate = 8000f * (1 + (id % 3))
          val ch = 1 + (id % 2).toInt
          val frames = (50 + nChars % 100).toInt
          val fmt = new javax.sound.sampled.AudioFormat(
            rate, 16, ch, true, false) // signed 16-bit PCM, little-endian
          val data = new Array[Byte](frames * ch * 2)
          var i = 0
          var s = 0 // flat sample ordinal across frames × channels
          while (i < frames) {
            var c = 0
            while (c < ch) {
              val v: Int =
                if (s < 4) ((id >> (8 * s)) & 0xffL).toInt - 128
                else (((id * 31 + i * 7 + c * 13) % 32768L).toInt - 16384)
              data(2 * (i * ch + c)) = (v & 0xff).toByte
              data(2 * (i * ch + c) + 1) = ((v >> 8) & 0xff).toByte
              c += 1; s += 1
            }
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          (id, "audio", baos.toByteArray, frames.toLong)
        }
      }
      .toDF("doc_id", "kind", "payload", "full_len")
  }

  /** REAL batched audio decode: the container header parses into
    * genuine sample-rate / channels / frame-count / bit-depth facts.
    * Same `grouped(batchSize)` loop as [[decodeImage]]; payloads never
    * shuffle; malformed payloads yield the "invalid" sentinel row.
    */
  def decodeAudio(media: DataFrame, batchSize: Int = 64)
      : Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    // codec chain captured at PLAN time: registered
    // codecs ship to executors inside the closure
    val audChain = MediaCodecs.audioChain
    media
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, p) =>
            val ais = MediaCodecs.decodeAudio(audChain, p)
            if (ais == null) AudioMeta(id, 0L, 0L, 0L, 0L, "invalid")
            else
              try {
                val f = ais.getFormat
                AudioMeta(id, f.getSampleRate.toLong,
                  f.getChannels.toLong, ais.getFrameLength,
                  f.getSampleSizeInBits.toLong, "pcm")
              } finally ais.close()
          }
        }
      }
  }

  /** Re-encode each audio payload into `tpe` (e.g. WAV → AIFF): the
    * decoded samples are unchanged while every container byte — and
    * the sample ENDIANNESS (AIFF is big-endian) — differs, which is
    * what separates sample-level dedup from digest dedup. Rows that
    * cannot decode or re-encode pass through unchanged.
    */
  def audioTranscode(media: DataFrame,
                     tpe: String = "aiff"): DataFrame = {
    val tpeName = tpe.toLowerCase // the Type object is not serializable
    val spark = media.sparkSession
    import spark.implicits._
    // codec chain captured at PLAN time: registered
    // codecs ship to executors inside the closure
    val audChain = MediaCodecs.audioChain
    media
      .select(col("doc_id").cast("long"), col("kind"), col("payload"),
        col("full_len").cast("long"))
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { it =>
        val fileType = tpeName match {
          case "aiff" => javax.sound.sampled.AudioFileFormat.Type.AIFF
          case "au"   => javax.sound.sampled.AudioFileFormat.Type.AU
          case _      => javax.sound.sampled.AudioFileFormat.Type.WAVE
        }
        it.map { case (id, kind, p, len) =>
          val ais = MediaCodecs.decodeAudio(audChain, p)
          val out =
            if (ais == null) p
            else
              try {
                val baos = new java.io.ByteArrayOutputStream()
                javax.sound.sampled.AudioSystem.write(ais, fileType, baos)
                baos.toByteArray
              } catch { case scala.util.control.NonFatal(_) => p }
              finally ais.close()
          (id, kind, out, len)
        }
      }
      .toDF("doc_id", "kind", "payload", "full_len")
  }

  /** Exact content hash over DECODED samples — container-invariant
    * audio dedup: a WAV and an AIFF of the same PCM collide; any
    * sample difference separates. Samples are normalized to signed
    * 16-bit values in frame order (interleaved channels) RESPECTING
    * the container's endianness, so the fold sees the audio, not the
    * byte layout. Format facts are mixed in (the same samples at a
    * different declared rate are different audio). Undecodable
    * payloads hash to the -1 sentinel.
    */
  def sampleHash64(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    // codec chain captured at PLAN time: registered
    // codecs ship to executors inside the closure
    val audChain = MediaCodecs.audioChain
    media
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) => MediaHash(id, audioPhashOf(audChain, p)) }
      }
  }

  /** One row's [[sampleHash64]] fold, factored out so the digest-
    * combined variant computes the identical value.
    */
  private def audioPhashOf(audChain: Seq[MediaCodecs.AudioCodec],
                           p: Array[Byte]): Long = {
    val ais = MediaCodecs.decodeAudio(audChain, p)
    if (ais == null) -1L
    else
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 ||
            f.getEncoding != javax.sound.sampled
              .AudioFormat.Encoding.PCM_SIGNED)
          -2L // out-of-scope encoding sentinel
        else {
          val bytes = ais.readAllBytes()
          val big = f.isBigEndian
          var h = 1125899906842597L
          var i = 0
          while (i + 1 < bytes.length) {
            val v: Int =
              if (big) (bytes(i) << 8) | (bytes(i + 1) & 0xff)
              else (bytes(i + 1) << 8) | (bytes(i) & 0xff)
            h = h * 1000003L + v
            i += 2
          }
          h = h * 31L + f.getSampleRate.toLong
          h = h * 31L + f.getChannels
          h
        }
      } finally ais.close()
  }

  /** [[sampleHash64]] + the container md5 digest in the SAME partition
    * pass — the dedup consumer needs both (phash groups the transcode
    * pair, the digest count proves the containers differ), and
    * computing them in one scan halves the synthesize/transcode/decode
    * work and removes the doc_id re-join of two derivations of the
    * same payload table. The digest is bit-identical to Spark's
    * `md5(payload)` (lowercase hex of the MD5 of the container bytes).
    */
  def sampleHashDigest64(media: DataFrame): Dataset[MediaHashDigest] = {
    val spark = media.sparkSession
    import spark.implicits._
    val audChain = MediaCodecs.audioChain
    media
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          MediaHashDigest(id, audioPhashOf(audChain, p), md5Hex(p))
        }
      }
  }

  /** Lowercase-hex MD5 of the raw bytes — the executor-side twin of
    * the `md5()` SQL expression, byte-for-byte BY CONSTRUCTION: Spark's
    * `Md5` expression delegates to the same commons-codec call (null
    * in, null out added here, matching the expression's null handling).
    */
  private def md5Hex(p: Array[Byte]): String =
    if (p == null) null
    else org.apache.commons.codec.digest.DigestUtils.md5Hex(p)

  // ---------------------------------------------------------------- video

  /** Typed metadata from a REAL multi-frame container parse: frame
    * count from the container's own image directory, first-frame
    * dimensions — or the "invalid" sentinel.
    */
  final case class VideoMeta(doc_id: Long, n_frames: Long, width: Long,
                             height: Long, mode: String)

  /** One genuinely decoded sampled frame: index + an exact fold over
    * its colormodel-resolved pixels (container-invariant: a GIF frame
    * and its TIFF twin hash identically).
    */
  final case class FrameHash(doc_id: Long, frame_idx: Long, fhash: Long)

  /** 256-level grayscale palette: GIF stores indexed natively, so
    * samples round-trip EXACTLY (GIF is lossless at <=256 colors) and
    * `getRGB` resolves to the same (v,v,v) under every container.
    */
  private lazy val gray256: java.awt.image.IndexColorModel = {
    val v = Array.tabulate[Byte](256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, v, v, v)
  }

  /** Encode `frames` as one multi-frame container via the JDK's own
    * sequence writers (GIF and multi-page TIFF both ship in
    * javax.imageio).
    */
  private def writeFrames(frames: Seq[java.awt.image.BufferedImage],
                          format: String): Array[Byte] = {
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName(format)
    require(writers.hasNext, s"no ImageIO sequence writer for $format")
    val writer = writers.next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(
        new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** Deterministic REAL video fixture: one animated GIF per document
    * with oracle-computable facts — frames `2 + doc_id % 4`, width
    * `4 + doc_id % 9`, height `4 + n_chars % 7`. Every frame's first
    * four pixels spell the doc_id bytes (no two documents share frame
    * content); the rest of frame `i` depends only on `i % 3`, so
    * frames 3 cycles apart are pixel-identical — what makes per-video
    * distinct-frame counts exactly `least(n_frames, 3)`.
    */
  def syntheticVideoMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        imageIoInit
        it.map { case (id, nChars) =>
          val n = 2 + (id % 4).toInt
          val w = 4 + (id % 9).toInt
          val hgt = 4 + (nChars % 7).toInt
          val frames = (0 until n).map { i =>
            val img = new java.awt.image.BufferedImage(w, hgt,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, gray256)
            var idx = 0
            var y = 0
            while (y < hgt) {
              var x = 0
              while (x < w) {
                val v =
                  if (idx < 4) ((id >> (8 * idx)) & 0xffL).toInt
                  else (x * 7 + y * 13 + (i % 3) * 97 +
                    (id & 0xffL).toInt) & 0xff
                img.getRaster.setSample(x, y, 0, v)
                idx += 1; x += 1
              }
              y += 1
            }
            img
          }
          (id, "video", writeFrames(frames, "gif"), n.toLong)
        }
      }
      .toDF("doc_id", "kind", "payload", "full_len")
  }

  /** REAL batched video decode: the container's frame directory and
    * first-frame header parse into genuine frame-count / dimension
    * facts. Same `grouped(batchSize)` loop as [[decodeImage]];
    * payloads never shuffle; malformed payloads yield the "invalid"
    * sentinel row.
    */
  def decodeVideo(media: DataFrame, batchSize: Int = 64)
      : Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    // codec chain captured at PLAN time: registered
    // codecs ship to executors inside the closure
    val vidChain = MediaCodecs.videoChain
    media
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoInit
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, p) =>
            val frames = MediaCodecs.decodeFrames(vidChain, p)
            if (frames == null || frames.isEmpty)
              VideoMeta(id, 0L, 0L, 0L, "invalid")
            else VideoMeta(id, frames.length.toLong,
              frames.head.getWidth.toLong, frames.head.getHeight.toLong,
              "video")
          }
        }
      }
  }

  /** Re-encode each multi-frame payload into `format` (GIF → "tiff"):
    * identical frames, completely different container bytes — the
    * video twin of [[transcode]]/[[audioTranscode]]. Undecodable rows
    * pass through unchanged.
    */
  def videoTranscode(media: DataFrame, format: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // codec chain captured at PLAN time: registered
    // codecs ship to executors inside the closure
    val vidChain = MediaCodecs.videoChain
    media
      .select(col("doc_id").cast("long"), col("kind"), col("payload"),
        col("full_len").cast("long"))
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { it =>
        imageIoInit
        it.map { case (id, kind, p, len) =>
          val out = MediaCodecs.decodeFrames(vidChain, p) match {
            case null => p
            case frames =>
              try writeFrames(frames, format)
              catch { case scala.util.control.NonFatal(_) => p }
          }
          (id, kind, out, len)
        }
      }
      .toDF("doc_id", "kind", "payload", "full_len")
  }

  /** Exact fold over one frame's colormodel-resolved pixels —
    * container-invariant (an indexed GIF frame and its TIFF twin
    * resolve to the same RGB triples).
    */
  private def frameFold(img: java.awt.image.BufferedImage): Long = {
    var h = 1125899906842597L
    h = h * 31L + img.getWidth
    h = h * 31L + img.getHeight
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        h = h * 1000003L + (img.getRGB(x, y) & 0xffffff)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Exact content hash over ALL decoded frames — container-invariant
    * video dedup: a GIF and a multi-page TIFF of the same frames
    * collide; any pixel or frame-count difference separates.
    * Undecodable payloads hash to the -1 sentinel.
    */
  def videoHash64(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    // codec chain captured at PLAN time: registered
    // codecs ship to executors inside the closure
    val vidChain = MediaCodecs.videoChain
    media
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoInit
        it.map { case (id, p) => MediaHash(id, videoPhashOf(vidChain, p)) }
      }
  }

  /** One row's [[videoHash64]] fold, factored out so the digest-
    * combined variant computes the identical value.
    */
  private def videoPhashOf(vidChain: Seq[MediaCodecs.VideoCodec],
                           p: Array[Byte]): Long = {
    val frames = MediaCodecs.decodeFrames(vidChain, p)
    if (frames == null || frames.isEmpty) -1L
    else {
      var h = frames.length.toLong
      frames.foreach(f => h = h * 1000003L + frameFold(f))
      h
    }
  }

  /** [[videoHash64]] + the container md5 digest in the SAME partition
    * pass — the video twin of [[sampleHashDigest64]]: one decode of
    * each payload serves both the content-hash grouping and the
    * container-digest count, instead of two derivations of the payload
    * table re-joined on doc_id.
    */
  def videoHashDigest64(media: DataFrame): Dataset[MediaHashDigest] = {
    val spark = media.sparkSession
    import spark.implicits._
    val vidChain = MediaCodecs.videoChain
    media
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoInit
        it.map { case (id, p) =>
          MediaHashDigest(id, videoPhashOf(vidChain, p), md5Hex(p))
        }
      }
  }

  /** REAL frame sampling: decode the container, emit every `every`-th
    * frame's index + exact pixel fold. Sampling happens AT the decode
    * boundary (unsampled frames decode but never materialize as rows)
    * — at 100 TB only the small (id, idx, hash) rows flow onward. The
    * byte-range [[sampleFrames]] stub remains for virtual-frame
    * workloads; this is the genuine-codec path.
    */
  def sampleVideoFrames(media: DataFrame, every: Int = 1,
                        batchSize: Int = 64): Dataset[FrameHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    // codec chain captured at PLAN time: registered
    // codecs ship to executors inside the closure
    val vidChain = MediaCodecs.videoChain
    media
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoInit
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, p) =>
            MediaCodecs.decodeFrames(vidChain, p) match {
              case null => Nil
              case frames =>
                frames.zipWithIndex
                  .filter(_._2 % every == 0)
                  .map { case (f, i) => FrameHash(id, i.toLong, frameFold(f)) }
            }
          }
        }
      }
  }
}
