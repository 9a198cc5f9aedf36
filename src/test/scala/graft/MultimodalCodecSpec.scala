package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The REAL codec boundary (javax.imageio): fixtures carry true PNG
  * bytes, decode genuinely parses them, and the pixel-level hashes are
  * container-invariant. The plumbing contract (batched mapPartitions,
  * payloads never shuffle) is unchanged from the stub path — these
  * tests pin that the codec itself is real.
  */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables(spark, sfDir, "documents").limit(60)

  test("syntheticImageMedia emits real PNGs: magic bytes present, " +
       "javax.imageio round-trips the formula dims and color mode") {
    val media = Multimodal.syntheticImageMedia(docs)
    val rows = media.as[(Long, String, Array[Byte], Long)].collect()
    assert(rows.nonEmpty)
    val pngMagic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)
    assert(rows.forall(_._3.take(4).sameElements(pngMagic)),
      "payloads must be genuine PNG containers")
    val meta = Multimodal.decodeImage(media).collect()
    val expect = docs.select("doc_id", "n_chars")
      .as[(Long, Long)].collect().toMap
    meta.foreach { m =>
      val nChars = expect(m.doc_id)
      assert(m.width == 2 + m.doc_id % 31, s"doc ${m.doc_id} width")
      assert(m.height == 2 + nChars % 17, s"doc ${m.doc_id} height")
      assert(m.mode == (if (m.doc_id % 2 == 0) "rgb" else "gray"),
        s"doc ${m.doc_id} mode")
      assert(m.n_bytes == nChars)
    }
  }

  test("pixelHash64 is container-invariant and content-exact: a BMP " +
       "transcode collides with its PNG, distinct documents never " +
       "collide, garbage hashes to the sentinel") {
    val media = Multimodal.syntheticImageMedia(docs)
    val png = Multimodal.pixelHash64(media).collect()
      .map(h => h.doc_id -> h.phash).toMap
    assert(png.values.toSet.size == png.size,
      "id-byte pixels must make every document's pixel hash unique")
    // transcode the RGB images (BMP writer needs a color raster)
    val rgb = media.where(col("doc_id") % 2 === 0)
    val bmp = Multimodal.transcode(rgb, "bmp")
    val bmpBytes = bmp.select("payload").as[Array[Byte]].head()
    assert(bmpBytes(0) == 'B'.toByte && bmpBytes(1) == 'M'.toByte,
      "transcode must produce a genuine BMP container")
    Multimodal.pixelHash64(bmp).collect().foreach(h =>
      assert(h.phash == png(h.doc_id),
        s"doc ${h.doc_id}: BMP pixels must hash like the PNG"))
    val junk = Seq((1L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    assert(Multimodal.pixelHash64(junk).head().phash == -1L)
  }

  test("codec robustness: null/garbage/truncated payloads never fail a " +
       "task — decode yields the invalid sentinel, hashes yield -1, " +
       "transcode passes the bytes through") {
    val pngHead = media0.select("payload")
      .as[Array[Byte]].head().take(24) // valid magic, truncated body
    val rows = Seq(
      (1L, "image", null.asInstanceOf[Array[Byte]], 10L),
      (2L, "image", Array[Byte](1, 2, 3), 10L),
      (3L, "image", pngHead, 10L))
      .toDF("doc_id", "kind", "payload", "full_len")
    val metas = Multimodal.decodeImage(rows).collect().sortBy(_.doc_id)
    assert(metas.forall(_.mode == "invalid"), metas.mkString(", "))
    assert(Multimodal.pixelHash64(rows).collect()
      .forall(_.phash == -1L))
    assert(Multimodal.ahash64(rows).collect().forall(_.phash == -1L))
    val out = Multimodal.transcode(rows, "bmp")
      .select("doc_id", "payload")
      .as[(Long, Array[Byte])].collect().toMap
    assert(out(1L) == null, "null payload must pass through")
    assert(out(2L).toSeq == Seq[Byte](1, 2, 3))
  }

  private def media0 =
    Multimodal.syntheticImageMedia(docs)

  test("ahash64 is a true perceptual hash: invariant under re-encode, " +
       "within 1-2 bits under mild pixel noise, far apart for opposite " +
       "structure") {
    def img(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff
        b.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", baos)
      baos.toByteArray
    }
    def hash(p: Array[Byte]): Long =
      Multimodal.ahash64(Seq((1L, p)).toDF("doc_id", "payload"))
        .head().phash
    // left-dark / right-bright split
    val base = img(32, 32)((x, _) => if (x < 16) 40 else 220)
    val hBase = hash(base)
    // re-encode: same pixels through a BMP container
    val viaBmp = {
      val i = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(base))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "bmp", baos)
      hash(baos.toByteArray)
    }
    assert(viaBmp == hBase, "ahash must survive container re-encode")
    // mild noise: +-3 levels keeps every cell on its side of the mean
    val noisy = img(32, 32)((x, y) =>
      (if (x < 16) 40 else 220) + ((x * 31 + y * 17) % 7) - 3)
    assert(java.lang.Long.bitCount(hash(noisy) ^ hBase) <= 2,
      "small pixel noise must move at most a couple of bits")
    // opposite structure: the inverted split flips every set bit
    val flipped = img(32, 32)((x, _) => if (x < 16) 220 else 40)
    assert(java.lang.Long.bitCount(hash(flipped) ^ hBase) >= 32,
      "structurally opposite images must be far apart")
  }

  test("syntheticVideoMedia emits real animated GIFs: magic present, " +
       "the container's own frame directory round-trips the formula " +
       "frame count and dims") {
    val media = Multimodal.syntheticVideoMedia(docs)
    val rows = media.as[(Long, String, Array[Byte], Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => new String(r._3.take(3), "US-ASCII") == "GIF"),
      "payloads must be genuine GIF containers")
    val meta = Multimodal.decodeVideo(media).collect()
    val expect = docs.select("doc_id", "n_chars")
      .as[(Long, Long)].collect().toMap
    meta.foreach { m =>
      val nChars = expect(m.doc_id)
      assert(m.n_frames == 2 + m.doc_id % 4, s"doc ${m.doc_id} frames")
      assert(m.width == 4 + m.doc_id % 9, s"doc ${m.doc_id} width")
      assert(m.height == 4 + nChars % 7, s"doc ${m.doc_id} height")
      assert(m.mode == "video")
    }
  }

  test("videoHash64 is container-invariant and content-exact: a " +
       "multi-page TIFF transcode collides with its GIF, distinct " +
       "documents never collide, and per-frame folds see the 3-cycle " +
       "content repetition exactly") {
    val media = Multimodal.syntheticVideoMedia(docs)
    val gif = Multimodal.videoHash64(media).collect()
      .map(h => h.doc_id -> h.phash).toMap
    assert(gif.values.toSet.size == gif.size,
      "id-byte frame pixels must make every document's video hash unique")
    val tiff = Multimodal.videoTranscode(media, "tiff")
    val tiffBytes = tiff.select("payload").as[Array[Byte]].head()
    val magic = tiffBytes.take(2).map(_.toChar).mkString
    assert(magic == "II" || magic == "MM",
      "transcode must produce a genuine TIFF container")
    Multimodal.videoHash64(tiff).collect().foreach(h =>
      assert(h.phash == gif(h.doc_id),
        s"doc ${h.doc_id}: TIFF frames must hash like the GIF"))
    // per-frame sampling: distinct folds per video = least(n, 3)
    val perDoc = Multimodal.sampleVideoFrames(media).collect()
      .groupBy(_.doc_id)
    val expect = docs.select("doc_id").as[Long].collect().toSet
    assert(perDoc.keySet == expect)
    perDoc.foreach { case (id, fs) =>
      val n = 2 + id % 4
      assert(fs.length == n, s"doc $id must emit $n frames")
      assert(fs.map(_.fhash).distinct.length == math.min(n, 3L),
        s"doc $id distinct frames")
    }
  }

  test("video codec robustness: null/garbage/truncated payloads never " +
       "fail a task — decode yields the invalid sentinel, hashes -1, " +
       "transcode passes bytes through, sampling emits nothing") {
    val gifHead = Multimodal.syntheticVideoMedia(docs.limit(1))
      .select("payload").as[Array[Byte]].head().take(10)
    val rows = Seq(
      (1L, "video", null.asInstanceOf[Array[Byte]], 3L),
      (2L, "video", Array[Byte](1, 2, 3), 3L),
      (3L, "video", gifHead, 3L)) // valid magic, torn body
      .toDF("doc_id", "kind", "payload", "full_len")
    val metas = Multimodal.decodeVideo(rows).collect()
    assert(metas.forall(_.mode == "invalid"), metas.mkString(", "))
    assert(Multimodal.videoHash64(rows).collect().forall(_.phash == -1L))
    assert(Multimodal.sampleVideoFrames(rows).collect().isEmpty)
    val out = Multimodal.videoTranscode(rows, "tiff")
      .select("doc_id", "payload")
      .as[(Long, Array[Byte])].collect().toMap
    assert(out(1L) == null && out(2L).toSeq == Seq[Byte](1, 2, 3))
  }

  test("syntheticAudioMedia emits real WAVs: RIFF/WAVE magic present, " +
       "javax.sound round-trips the formula rate/channels/frames; " +
       "sampleHash64 is container- and ENDIANNESS-invariant (AIFF " +
       "collides with its WAV), content-exact across documents") {
    val media = Multimodal.syntheticAudioMedia(docs)
    val rows = media.as[(Long, String, Array[Byte], Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, p, _) =>
      p.take(4).sameElements("RIFF".getBytes) &&
        p.slice(8, 12).sameElements("WAVE".getBytes)
    }, "payloads must be genuine RIFF/WAVE containers")
    val expect = docs.select("doc_id", "n_chars")
      .as[(Long, Long)].collect().toMap
    Multimodal.decodeAudio(media).collect().foreach { m =>
      assert(m.mode == "pcm", s"doc ${m.doc_id}")
      assert(m.sample_rate == 8000 * (1 + m.doc_id % 3))
      assert(m.channels == 1 + m.doc_id % 2)
      assert(m.n_frames == 50 + expect(m.doc_id) % 100)
      assert(m.bits == 16)
    }
    // sample-hash: unique per document (id-byte samples), and a
    // WAV→AIFF transcode — different container, OPPOSITE byte order —
    // collides with its original
    val wavHash = Multimodal.sampleHash64(media).collect()
      .map(h => h.doc_id -> h.phash).toMap
    assert(wavHash.values.toSet.size == wavHash.size,
      "id-byte samples must make every document's sample hash unique")
    val aiff = Multimodal.audioTranscode(media, "aiff")
    val aiffBytes = aiff.select("payload").as[Array[Byte]].head()
    assert(aiffBytes.take(4).sameElements("FORM".getBytes),
      "transcode must produce a genuine AIFF container")
    val aiffHash = Multimodal.sampleHash64(aiff).collect()
      .map(h => h.doc_id -> h.phash).toMap
    assert(aiffHash == wavHash,
      "sample hash must be container/endianness-invariant")
    // while the DIGESTS all differ (the containers really changed)
    val wavDigests = media.select(md5($"payload")).as[String].collect()
    val aiffDigests = aiff.select(md5($"payload")).as[String].collect()
    assert(wavDigests.toSet.intersect(aiffDigests.toSet).isEmpty)
  }

  test("audio codec robustness: null/garbage/truncated payloads never " +
       "fail a task — decode yields the invalid sentinel, sampleHash64 " +
       "yields -1, transcode passes bytes through") {
    val wavHead = Multimodal.syntheticAudioMedia(docs)
      .select("payload").as[Array[Byte]].head().take(16) // torn header
    val rows = Seq(
      (1L, "audio", null.asInstanceOf[Array[Byte]], 10L),
      (2L, "audio", Array[Byte](1, 2, 3), 10L),
      (3L, "audio", wavHead, 10L),
      (4L, "audio", "RIFF0000WAVEjunk".getBytes, 10L))
      .toDF("doc_id", "kind", "payload", "full_len")
    val metas = Multimodal.decodeAudio(rows).collect()
    assert(metas.length == 4)
    assert(metas.forall(_.mode == "invalid"), metas.mkString(", "))
    assert(Multimodal.sampleHash64(rows).collect()
      .forall(_.phash == -1L))
    val out = Multimodal.audioTranscode(rows, "aiff")
      .select("doc_id", "payload")
      .as[(Long, Array[Byte])].collect().toMap
    assert(out(1L) == null, "null payload must pass through")
    assert(out(2L).toSeq == Seq[Byte](1, 2, 3))
  }
}
