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

  test("pluggable codec SPI (r16): a registered codec claims payloads " +
       "by container magic AHEAD of the JDK defaults, its decoded " +
       "dims and pixels flow through the SAME decode/hash plans " +
       "unchanged, unclaimed payloads fall through to the JDK codec, " +
       "precedence overrides work, and reset() restores the defaults") {
    import graft.operators.MediaCodecs
    try {
      def fake(w: Int, h: Int): Array[Byte] =
        Array[Byte]('F', 'A', 'K', 'E', w.toByte, h.toByte)
      val png = Multimodal.syntheticImageMedia(docs.limit(4))
        .select("doc_id", "payload")
      val mixed = Seq((1001L, fake(5, 7)), (1002L, fake(5, 7)),
        (1003L, fake(9, 3)))
        .toDF("doc_id", "payload")
        .withColumn("full_len", lit(10L))
        .unionByName(png.withColumn("full_len", lit(10L)))
      // BEFORE registration: the JDK chain cannot read the fake
      // container -> invalid sentinel; the PNGs decode fine
      val before = Multimodal.decodeImage(mixed).collect()
        .map(m => m.doc_id -> m).toMap
      assert(before(1001L).mode == "invalid")
      assert(before.values.count(_.mode != "invalid") == 4)
      // register: fake rows decode through the SAME plan shape; PNGs
      // still fall through to the JDK codec behind it
      MediaCodecs.register(FakeImageCodec)
      val after = Multimodal.decodeImage(mixed).collect()
        .map(m => m.doc_id -> m).toMap
      assert(after(1001L).width == 5 && after(1001L).height == 7 &&
        after(1001L).mode == "gray", s"${after(1001L)}")
      assert(after(1003L).width == 9 && after(1003L).height == 3)
      png.as[(Long, Array[Byte])].collect().map(_._1).foreach(id =>
        assert(after(id) == before(id),
          s"PNG $id must still decode via the JDK codec"))
      // hashes flow: same fake pixels collide, different dims differ,
      // and nothing is the -1 undecodable sentinel anymore
      val hs = Multimodal.pixelHash64(mixed.where(col("doc_id") >= 1000L))
        .collect().map(h => h.doc_id -> h.phash).toMap
      assert(hs(1001L) == hs(1002L) && hs(1001L) != hs(1003L) &&
        hs.values.forall(_ != -1L), s"$hs")
      // precedence: a codec claiming PNG magic OVERRIDES the JDK one
      MediaCodecs.register(PngHijackCodec)
      val hijacked = Multimodal.decodeImage(png
        .withColumn("full_len", lit(10L))).collect()
      assert(hijacked.forall(m => m.width == 1 && m.height == 1),
        hijacked.mkString(", "))
      // the video chain resolves the same way: a fake multi-frame
      // codec feeds decodeVideo/videoHash64 through unchanged plans
      MediaCodecs.register(FakeVideoCodec)
      val vmeta = Multimodal.decodeVideo(
        Seq((2001L, fake(6, 2))).toDF("doc_id", "payload")).collect()
      assert(vmeta.length == 1 && vmeta.head.n_frames == 2L &&
        vmeta.head.width == 6L && vmeta.head.height == 2L,
        vmeta.mkString(", "))
    } finally MediaCodecs.reset()
    // reset restores the JDK defaults: fake magic is invalid again
    val post = Multimodal.decodeImage(
      Seq((1L, Array[Byte]('F', 'A', 'K', 'E', 5, 7)))
        .toDF("doc_id", "payload").withColumn("full_len", lit(10L)))
      .collect()
    assert(post.head.mode == "invalid")
  }

  test("one-pass hash+digest variants (r16 optimization): " +
       "sampleHashDigest64 / videoHashDigest64 / pixelHashDigest64 " +
       "equal the two-derivations shape (phash from the *Hash64 op, " +
       "digest bit-identical to SQL md5(payload)) — including the " +
       "sentinel rows for undecodable payloads") {
    def check(media: org.apache.spark.sql.DataFrame,
              combined: org.apache.spark.sql.DataFrame,
              single: org.apache.spark.sql.DataFrame): Unit = {
      val expect = single.toDF()
        .join(media.select(col("doc_id"),
          md5(col("payload")).as("digest")), "doc_id")
        .select("doc_id", "phash", "digest")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      val got = combined.select("doc_id", "phash", "digest")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      assert(got == expect)
      assert(got.nonEmpty)
    }
    val img = Multimodal.syntheticImageMedia(docs)
    check(img, Multimodal.pixelHashDigest64(img).toDF(),
      Multimodal.pixelHash64(img).toDF())
    val aud = Multimodal.syntheticAudioMedia(docs)
    check(aud, Multimodal.sampleHashDigest64(aud).toDF(),
      Multimodal.sampleHash64(aud).toDF())
    val vid = Multimodal.syntheticVideoMedia(docs)
    check(vid, Multimodal.videoHashDigest64(vid).toDF(),
      Multimodal.videoHash64(vid).toDF())
    // sentinel parity on undecodable payloads: phash -1, digest still
    // the bytes' md5 (null payload is the one row the SQL md5 nulls —
    // the combined op must match, so exercise garbage, not null)
    val bad = Seq((9L, "audio", Array[Byte](1, 2, 3), 3L))
      .toDF("doc_id", "kind", "payload", "full_len")
    val badRow = Multimodal.sampleHashDigest64(bad).collect().head
    assert(badRow.phash == -1L)
    assert(badRow.digest ==
      bad.select(md5(col("payload"))).as[String].head())
  }
}

/** Fake still-image codec for the SPI spec: claims the "FAKE" magic,
  * dims from header bytes, deterministic gradient pixels. Top-level
  * (no outer pointer) so the closure-captured chain serializes.
  */
private object FakeImageCodec
    extends graft.operators.MediaCodecs.ImageCodec {
  def name = "fake-image"
  def claims(p: Array[Byte]): Boolean =
    p.length >= 6 && p(0) == 'F' && p(1) == 'A' && p(2) == 'K' &&
      p(3) == 'E'
  def decode(p: Array[Byte]): java.awt.image.BufferedImage = {
    val w = p(4) & 0xff
    val h = p(5) & 0xff
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.getRaster.setSample(x, y, 0, (x * 3 + y * 5) & 0xff)
        x += 1
      }
      y += 1
    }
    img
  }
}

/** Precedence probe: claims genuine PNG magic, returns a 1x1 image —
  * proves a registration shadows the JDK default for the magic it
  * claims.
  */
private object PngHijackCodec
    extends graft.operators.MediaCodecs.ImageCodec {
  def name = "png-hijack"
  def claims(p: Array[Byte]): Boolean =
    p.length >= 4 && (p(0) & 0xff) == 0x89 && p(1) == 'P' &&
      p(2) == 'N' && p(3) == 'G'
  def decode(p: Array[Byte]): java.awt.image.BufferedImage =
    new java.awt.image.BufferedImage(1, 1,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
}

/** Fake multi-frame codec: two frames at the header dims. */
private object FakeVideoCodec
    extends graft.operators.MediaCodecs.VideoCodec {
  def name = "fake-video"
  def claims(p: Array[Byte]): Boolean = FakeImageCodec.claims(p)
  def frames(p: Array[Byte]): Seq[java.awt.image.BufferedImage] =
    Seq(FakeImageCodec.decode(p), FakeImageCodec.decode(p))
}
