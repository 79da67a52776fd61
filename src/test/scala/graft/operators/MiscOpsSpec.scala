package graft.operators

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

class MiscOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("flattenJson parses fields against schema") {
    val df = Seq((1L, """{"k": 42}"""), (2L, "not json")).toDF("id", "js")
    val out = NestedOps.flattenJson(df, "js",
      StructType(Seq(StructField("k", LongType))))
    val rows = out.orderBy("id").select("k").as[Option[Long]].collect().toSeq
    assert(rows == Seq(Some(42L), None))
  }

  test("flattenStructs flattens recursively with path names") {
    val df = Seq((1, 2, 3, 4)).toDF("a", "b", "c", "d")
      .select(col("a"), struct(col("b"),
        struct(col("c"), col("d")).as("in")).as("s"))
    val out = NestedOps.flattenStructs(df)
    assert(out.columns.toSeq == Seq("a", "s_b", "s_in_c", "s_in_d"))
    assert(out.as[(Int, Int, Int, Int)].head() == ((1, 2, 3, 4)))
  }

  test("windowStartUs integer bucket math") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-01-01 00:20:00"))
      .toDF("ts")
    val us = df.select(TimeOps.windowStartUs(col("ts"), 900L * 1000000L)
      .as("w")).as[Long].head()
    // 00:20 floors to 00:15 bucket
    assert(us == java.sql.Timestamp.valueOf("2024-01-01 00:15:00")
      .getTime * 1000)
  }

  test("tumblingAgg counts and decimal-sums per window+key") {
    val df = Seq(
      ("2024-01-01 00:01:00", "a", 1.5),
      ("2024-01-01 00:14:59", "a", 2.5),
      ("2024-01-01 00:15:00", "a", 4.0)
    ).toDF("s", "k", "v").withColumn("ts", to_timestamp(col("s")))
    val out = TimeOps.tumblingAgg(df, "ts", Seq("k"), "v", 900L * 1000000L)
    val rows = out.orderBy("window_start_us")
      .select("n", "sum_value").as[(Long, Double)].collect().toSeq
    assert(rows == Seq((2L, 4.0), (1L, 4.0)))
  }

  test("slidingAgg: each event lands in width/slide windows") {
    val df = Seq(
      ("2024-01-01 00:05:00", "a", 1.0), // windows 23:45 & 00:00
      ("2024-01-01 00:20:00", "a", 2.0)) // windows 00:00 & 00:15
      .toDF("s", "k", "v").withColumn("ts", to_timestamp(col("s")))
    val out = TimeOps.slidingAgg(df, "ts", Seq("k"), "v",
      1800L * 1000000L, 900L * 1000000L)
      .orderBy("window_start_us")
      .select("window_start_us", "n", "sum_value")
      .as[(Long, Long, Double)].collect().toSeq
    def us(t: String) = java.sql.Timestamp.valueOf(t).getTime * 1000
    assert(out == Seq(
      (us("2023-12-31 23:45:00"), 1L, 1.0),
      (us("2024-01-01 00:00:00"), 2L, 3.0),
      (us("2024-01-01 00:15:00"), 1L, 2.0)))
  }

  test("resizeStub caps the max edge, preserves aspect") {
    val media = Multimodal.asMedia(Seq((1L, "payload")).toDF("id", "text"),
      "text", "image/png")
    val r = media.select(Multimodal.resizeStub(
        Multimodal.decodeImageStub(col("payload")), 512).as("d"))
      .select("d.width", "d.height").head()
    assert(r.getInt(0) <= 512 && r.getInt(1) <= 512)
    assert(r.getInt(0) > 0 && r.getInt(1) > 0)
  }

  test("frameSampleStub explodes strided frame indices") {
    val media = Multimodal.asMedia(Seq((1L, "vid")).toDF("id", "text"),
      "text", "video/mp4")
    val frames = Multimodal.frameSampleStub(media, stride = 10)
      .select("frame_idx").as[Int].collect().toSeq
    assert(frames.nonEmpty && frames.head == 0)
    assert(frames.forall(_ % 10 == 0))
    assert(frames == frames.sorted && frames.distinct == frames)
  }

  test("asMedia + extractFeatures batch plumbing") {
    val df = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(
      Multimodal.asMedia(df, "text", "text/plain"))
    val rows = out.orderBy("doc_id")
      .select("feat_len", "feat_checksum").as[(Long, Long)].collect().toSeq
    assert(rows(0)._1 == 3L && rows(1)._1 == 0L)
    // checksum of "abc" utf8: ((97*31)+98)*31+99
    assert(rows(0)._2 == ((97L * 31 + 98) * 31 + 99))
    // metadata struct carries byte count + sha
    val meta = Multimodal.asMedia(df, "text", "text/plain")
      .select(col("media_meta.n_bytes")).as[Long].collect().toSeq
    assert(meta == Seq(3L, 0L))
  }

  test("imageIoCodec decodes synthesized PNGs to exact channel sums") {
    val docs = Seq(0L, 1L, 7L, 12L).toDF("doc_id")
    val out = Multimodal.extractFeatures(
      Multimodal.asMedia(Multimodal.synthRgbPng(docs), "png", "image/png")
        .select("doc_id", "payload", "media_meta"),
      Multimodal.imageIoCodec)
      .select("doc_id", "feat_width", "feat_height", "feat_channels",
        "feat_sum_r", "feat_sum_g", "feat_sum_b")
      .as[(Long, Int, Int, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    for (d <- Seq(0L, 1L, 7L, 12L)) {
      val w = (4 + d % 5).toInt
      val h = (3 + d % 4).toInt
      val px = for { x <- 0 until w; y <- 0 until h } yield (x, y)
      val sr = px.map { case (x, y) => (d + 3 * x + 7 * y) % 256 }.sum
      val sg = px.map { case (x, y) => (2 * d + 5 * x + 11 * y) % 256 }.sum
      val sb = px.map { case (x, y) => (3 * d + x + 13 * y) % 256 }.sum
      assert(out(d) == ((d, w, h, 3, sr, sg, sb)), s"doc $d")
    }
  }

  test("audioWavCodec decodes synthesized WAVs to exact channel sums") {
    val docs = Seq(0L, 1L, 7L, 42L).toDF("doc_id")
    val out = Multimodal.extractFeatures(
      Multimodal.asMedia(Multimodal.synthWavPcm(docs), "wav", "audio/wav")
        .select("doc_id", "payload", "media_meta"),
      Multimodal.audioWavCodec)
      .select("doc_id", "feat_rate", "feat_audio_channels", "feat_frames",
        "feat_sum_ch0", "feat_sum_ch1")
      .as[(Long, Int, Int, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    for (d <- Seq(0L, 1L, 7L, 42L)) {
      val ch = (1 + d % 2).toInt
      val n = (50 + d % 32).toInt
      def sum(c: Int): Long =
        (0 until n).map(i => (7 * d + 31L * i + 17L * c) % 65536 - 32768).sum
      val ch1 = if (ch == 2) Some(sum(1)) else None
      assert(out(d) == ((d, 8000, ch, n.toLong, sum(0), ch1)), s"doc $d")
    }
  }

  test("audioWavCodec: non-audio payloads yield null features") {
    val df = Seq((1L, "this is not a wav")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(
      Multimodal.asMedia(df, "text", "audio/wav"), Multimodal.audioWavCodec)
      .select("feat_rate", "feat_sum_ch0").head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("frameSampleGif explodes strided frames with exact gray sums") {
    // doc 5 → 9x4 frames, 2 + 5%4 = 3 frames; stride 2 samples f=0,2
    val media = Multimodal.asMedia(
      Multimodal.synthGrayGif(Seq(5L).toDF("doc_id")), "gif", "image/gif")
      .select("doc_id", "payload")
    val out = Multimodal.frameSampleGif(media, stride = 2)
      .select("frame_idx", "frame_width", "frame_height", "frame_gray_sum")
      .as[(Int, Int, Int, Long)].collect().toSeq.sortBy(_._1)
    val d = 5L
    val (w, h) = ((4 + d % 5).toInt, (3 + d % 4).toInt)
    def graySum(f: Int): Long =
      (for { x <- 0 until w; y <- 0 until h }
        yield (d + 5L * x + 3L * y + 11L * f) % 256).sum
    assert(out == Seq((0, w, h, graySum(0)), (2, w, h, graySum(2))))
    // stride 1 sees all 3 frames
    val all = Multimodal.frameSampleGif(media, stride = 1)
      .select("frame_idx").as[Int].collect().toSeq.sorted
    assert(all == Seq(0, 1, 2))
  }

  test("frameSampleGif: undecodable payload yields one quarantine row") {
    val junk = Multimodal.asMedia(
      Seq((9L, "not a gif")).toDF("doc_id", "text"), "text", "image/gif")
      .select("doc_id", "payload")
    val rows = Multimodal.frameSampleGif(junk, stride = 2).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 9L && rows(0).isNullAt(2) &&
      rows(0).isNullAt(5))
  }

  test("imageAHash64 equals the sequential aHash on synthesized pairs") {
    val docs = Seq(0L, 1L, 6L, 7L, 12L).toDF("doc_id")
    val got = Multimodal.imageAHash64(
      Multimodal.asMedia(Multimodal.synthPairGrayPng(docs), "png",
        "image/png").select("doc_id", "payload"))
      .select("doc_id", "feat_ahash").as[(Long, Long)].collect().toMap
    def ref(d: Long): Long = {
      val base = d / 2
      val w = (8 + base % 5).toInt
      val h = (8 + base % 4).toInt
      def px(x: Int, y: Int): Long = {
        val g = (3 * base + 7L * x + 11L * y) % 256
        if (d % 2 == 1 && x == 0 && y == 0) (g + 128) % 256 else g
      }
      val gray = for (j <- 0 until 8; i <- 0 until 8)
        yield px(i * w / 8, j * h / 8)
      val mean = gray.sum / 64
      gray.zipWithIndex.foldLeft(0L) { case (c, (g, idx)) =>
        if (g > mean) c | (1L << idx) else c
      }
    }
    for (d <- Seq(0L, 1L, 6L, 7L, 12L)) assert(got(d) == ref(d), s"doc $d")
  }

  test("phash near-dup pairs: one-pixel edits land within hamming 3") {
    val docs = Seq(0L, 1L, 4L, 5L, 20L, 21L).toDF("doc_id")
    val coded = Multimodal.imageAHash64(
      Multimodal.asMedia(Multimodal.synthPairGrayPng(docs), "png",
        "image/png").select("doc_id", "payload"))
      .select(col("doc_id").as("id"), col("feat_ahash").as("code"))
    val pairs = Dedup.hammingPairs(coded, maxHamming = 3, bands = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // each even/odd sibling pair differs by ONE perturbed pixel:
    // at most the perturbed cell's bit + mean-shift flips
    assert(pairs.contains((0L, 1L)) && pairs.contains((4L, 5L)) &&
      pairs.contains((20L, 21L)), s"missing sibling pairs: $pairs")
  }

  test("audioEnergyHash64 equals the sequential energy hash on pairs") {
    val docs = Seq(0L, 1L, 9L).toDF("doc_id")
    val got = Multimodal.audioEnergyHash64(
      Multimodal.asMedia(Multimodal.synthPairWavPcm(docs), "wav",
        "audio/wav").select("doc_id", "payload"))
      .select("doc_id", "feat_audiohash").as[(Long, Long)].collect().toMap
    def ref(d: Long): Long = {
      val base = d / 2
      val n = (256 + base % 64).toInt
      def sample(i: Int): Long = {
        val raw = (7 * base + 31L * i) % 65536
        (if (d % 2 == 1 && i == 0) (raw + 16384) % 65536 else raw) - 32768
      }
      val energy = (0 until 64).map { k =>
        (k * n / 64 until (k + 1) * n / 64).map(i => math.abs(sample(i))).sum
      }
      val mean = energy.sum / 64
      energy.zipWithIndex.foldLeft(0L) { case (c, (e, k)) =>
        if (e > mean) c | (1L << k) else c
      }
    }
    for (d <- Seq(0L, 1L, 9L)) assert(got(d) == ref(d), s"doc $d")
    // the one-sample edit only shifts window 0's energy + the mean:
    // sibling clips land within banding range of hammingPairs
    val coded = Multimodal.audioEnergyHash64(
      Multimodal.asMedia(Multimodal.synthPairWavPcm(docs), "wav",
        "audio/wav").select("doc_id", "payload"))
      .select(col("doc_id").as("id"), col("feat_audiohash").as("code"))
    val pairs = Dedup.hammingPairs(coded, maxHamming = 3, bands = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"sibling pair missing: $pairs")
  }

  test("audioEnergyHash64: non-audio payload hashes to null") {
    val junk = Multimodal.asMedia(
      Seq((9L, "not a wav")).toDF("doc_id", "text"), "text", "audio/wav")
      .select("doc_id", "payload")
    assert(Multimodal.audioEnergyHash64(junk)
      .select("feat_audiohash").head().isNullAt(0))
  }

  // ---- spectral audio fingerprint (rows-only; invariance contracts) ----
  private def wavOf(samples: Array[Int], channels: Int = 1): Array[Byte] = {
    val rate = 8000f
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      rate, 16, channels, 2 * channels, rate, false)
    val pcm = new Array[Byte](samples.length * 2)
    for (j <- samples.indices) {
      pcm(2 * j) = (samples(j) & 0xff).toByte
      pcm(2 * j + 1) = ((samples(j) >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt,
      (samples.length / channels).toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def spectralOf(clips: Seq[(Long, Array[Byte])]): Map[Long, Long] =
    Multimodal.audioSpectralHash64(clips.toDF("doc_id", "payload"))
      .select("doc_id", "feat_spectralhash")
      .as[(Long, Long)].collect().toMap

  test("audioSpectralHash64: offset, 2x gain, stereo-dup move zero bits") {
    val base = Array.tabulate(800)(i =>
      (if ((i / 5) % 2 == 0) 6000 else -6000) +
        (if ((i / 40) % 2 == 0) 3000 else -3000))
    val got = spectralOf(Seq(
      (0L, wavOf(base)),
      (1L, wavOf(base.map(_ + 100))), // DC offset: u=0 only, excluded
      (2L, wavOf(base.map(_ * 2))),   // exact power-of-2 gain
      (3L, wavOf(base.flatMap(x => Array(x, x)), channels = 2))))
    assert(got(1L) == got(0L), "offset moved the spectral hash")
    assert(got(2L) == got(0L), "2x gain moved the spectral hash")
    assert(got(3L) == got(0L), "stereo duplication moved the spectral hash")
    assert(got(0L) != 0L)
    val bits = java.lang.Long.bitCount(got(0L))
    // strict > at the lower median of 64: at most 32 set, ties reduce
    assert(bits >= 24 && bits <= 32, s"unbalanced spectral hash: $bits")
  }

  test("audioSpectralHash64: soft pairs band-join; silence 0; junk null") {
    val docs = (0L to 9L).toDF("doc_id")
    val coded = Multimodal.audioSpectralHash64(
      Multimodal.asMedia(Multimodal.synthPairWavPcmSoft(docs), "wav",
        "audio/wav").select("doc_id", "payload"))
      .select(col("doc_id").as("id"), col("feat_spectralhash").as("code"))
    val pairs = Dedup.hammingPairs(coded, maxHamming = 3, bands = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // the +512 one-sample edit perturbs ONE of 16 windows (4 bits max)
    for (k <- 0L to 4L)
      assert(pairs.contains((2 * k, 2 * k + 1)),
        s"sibling pair $k missing: $pairs")
    // determinism: re-running reproduces the exact pair set
    val again = Dedup.hammingPairs(coded, maxHamming = 3, bands = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(again == pairs)
    // pure silence: every coefficient snaps to tick 0 -> code 0
    val silent = spectralOf(Seq((7L, wavOf(Array.fill(320)(0)))))
    assert(silent(7L) == 0L)
    val junk = Multimodal.audioSpectralHash64(
      Multimodal.asMedia(Seq((9L, "not a wav")).toDF("doc_id", "text"),
        "text", "audio/wav").select("doc_id", "payload"))
      .select("feat_spectralhash").head()
    assert(junk.isNullAt(0))
  }

  test("imageAHash64: undecodable payload hashes to null") {
    val junk = Multimodal.asMedia(
      Seq((9L, "not a png")).toDF("doc_id", "text"), "text", "image/png")
      .select("doc_id", "payload")
    val r = Multimodal.imageAHash64(junk).select("feat_ahash").head()
    assert(r.isNullAt(0))
  }

  /** One gray PNG from a pixel function — the DCT invariance tests
    * build their own controlled inputs. */
  private def grayPng(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def dctOf(pngs: Seq[(Long, Array[Byte])]): Map[Long, Long] =
    Multimodal.imageDctHash64(pngs.toDF("doc_id", "payload"))
      .select("doc_id", "feat_dcthash").as[(Long, Long)].collect().toMap

  test("imageDctHash64: brightness shift and 2x upscale move zero bits") {
    // non-separable (bx·by cross term): every frequency band carries
    // real structure, not just the u=0/v=0 edges
    def tile(x: Int, y: Int) =
      ((x / 8) * 37 + (y / 8) * 101 + (x / 8) * (y / 8) * 13 + 53) % 200
    val base = grayPng(64, 64)(tile)
    val brighter = grayPng(64, 64)((x, y) => tile(x, y) + 40)
    // pixel-duplication upscale: sample (i·128/32) hits pixel 4i,
    // which duplicates pixel 2i of the 64-px original — identical grid
    val up = grayPng(128, 128)((x, y) => tile(x / 2, y / 2))
    val got = dctOf(Seq((0L, base), (1L, brighter), (2L, up)))
    // DC is excluded, so a constant shift leaves all 63 AC bits alone
    assert(got(1L) == got(0L), "brightness shift changed the dct hash")
    assert(got(2L) == got(0L), "pixel-duplication upscale changed the dct hash")
    assert(got(0L) != 0L)
    val bits = java.lang.Long.bitCount(got(0L))
    // median split of 63 AC coefficients: ~31 set bits (ties only reduce)
    assert(bits >= 28 && bits <= 31, s"unbalanced dct hash: $bits bits")
  }

  test("imageDctHash64: constant image hashes to 0, junk to null") {
    val got = Multimodal.imageDctHash64(
      Seq((0L, grayPng(32, 32)((_, _) => 77))).toDF("doc_id", "payload"))
      .select("feat_dcthash").head()
    assert(!got.isNullAt(0) && got.getLong(0) == 0L)
    val junk = Multimodal.imageDctHash64(
      Multimodal.asMedia(Seq((9L, "not a png")).toDF("doc_id", "text"),
        "text", "image/png").select("doc_id", "payload"))
      .select("feat_dcthash").head()
    assert(junk.isNullAt(0))
  }

  test("imageDctHash64: soft pairs within hamming 3, cross bases far") {
    val docs = (0L until 80L).toDF("doc_id")
    val coded = Multimodal.imageDctHash64(
      Multimodal.asMedia(Multimodal.synthPairGrayPngSoft(docs), "png",
        "image/png").select("doc_id", "payload"))
      .select(col("doc_id").as("id"), col("feat_dcthash").as("code"))
    val got = coded.as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (k <- 0L until 40L)
      assert(ham(got(2 * k), got(2 * k + 1)) <= 3, s"sibling pair $k far")
    // banded pairs at the pigeonhole-exact setting find EXACTLY the
    // 40 sibling pairs: every cross-base distance clears the cutoff
    val pairs = Dedup.hammingPairs(coded, maxHamming = 3, bands = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == (0L until 40L).map(k => (2 * k, 2 * k + 1)).toSet,
      s"pair set mismatch: $pairs")
  }

  test("imageIoCodec: corrupt payloads yield null features, not a crash") {
    val df = Seq((1L, "this is not a png")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(
      Multimodal.asMedia(df, "text", "image/png"), Multimodal.imageIoCodec)
      .select("feat_width", "feat_sum_r").head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("resizeImages: real resample respects maxEdge, never upscales") {
    // doc 3 → 7x6 image: maxEdge 4 scales to 4x3 (floor, aspect kept);
    // maxEdge 100 leaves 7x6 (no upscale); non-image payload → null
    val media = Multimodal.asMedia(
      Multimodal.synthRgbPng(Seq(3L).toDF("doc_id")), "png", "image/png")
      .select("doc_id", "payload")
    def dims(bytes: Array[Byte]): (Int, Int) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      (img.getWidth, img.getHeight)
    }
    val down = Multimodal.resizeImages(media, maxEdge = 4)
      .select("resized_payload").as[Array[Byte]].head()
    assert(dims(down) == ((4, 3)))
    val same = Multimodal.resizeImages(media, maxEdge = 100)
      .select("resized_payload").as[Array[Byte]].head()
    assert(dims(same) == ((7, 6)))
    val junk = Multimodal.resizeImages(
      Multimodal.asMedia(Seq((9L, "junk")).toDF("doc_id", "text"),
        "text", "image/png").select("doc_id", "payload"), maxEdge = 4)
      .select("resized_payload").head()
    assert(junk.isNullAt(0))
  }

  test("extractFeatures runs a CUSTOM codec, open() once per partition") {
    val df = Seq.tabulate(8)(i => (i.toLong, s"payload$i"))
      .toDF("doc_id", "text").repartition(3)
    MiscOpsSpec.codecOpens.set(0)
    val fakeImageCodec = Multimodal.BatchCodec(
      features = Seq(
        org.apache.spark.sql.types.StructField("magic",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false)),
      open = () => {
        MiscOpsSpec.codecOpens.incrementAndGet() // the per-partition init
        bytes => Seq[Any](if (bytes.nonEmpty) bytes(0).toInt else -1,
          bytes.length.toLong)
      })
    val out = Multimodal.extractFeatures(
      Multimodal.asMedia(df, "text", "image/fake"), fakeImageCodec)
    val rows = out.select("magic", "n").as[(Int, Long)].collect()
    assert(rows.length == 8 && rows.forall(_._1 == 'p'.toInt))
    // local mode: executor == driver JVM, so the counter observes the
    // per-partition open calls directly
    assert(MiscOpsSpec.codecOpens.get() == 3)
  }

  test("gapFillLocf: grid densifies, LOCF carries, gaps flagged") {
    import sqlImplicits._
    // key a: buckets 10, 13 observed -> 11, 12 filled from 10;
    // key b: single bucket -> no gaps
    val obs = Seq(("a", 10L, 5L), ("a", 13L, 9L), ("b", 99L, 1L))
      .toDF("k", "bucket", "v")
    val got = graft.operators.TimeOps
      .gapFillLocf(obs, Seq("k"), "bucket", Seq("v"))
      .as[(String, Long, Option[Long], Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got.size == 5)
    assert(got(("a", 10L)) == ((Some(5L), 5L, false)))
    assert(got(("a", 11L)) == ((None, 5L, true)))
    assert(got(("a", 12L)) == ((None, 5L, true)))
    assert(got(("a", 13L)) == ((Some(9L), 9L, false)))
    assert(got(("b", 99L)) == ((Some(1L), 1L, false)))
    // layout independence
    val scrambled = graft.operators.TimeOps
      .gapFillLocf(obs.repartition(4), Seq("k"), "bucket", Seq("v"))
      .as[(String, Long, Option[Long], Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(scrambled == got)
  }
  test("funnel: strict order, greedy min-chain; retention cohorts") {
    import sqlImplicits._
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val events = Seq(
      // user 1 converts in order: signup@10 view@20 purchase@30
      (1L, ts(10), "signup"), (1L, ts(20), "view"), (1L, ts(30), "purchase"),
      // user 2: purchase BEFORE the view chain completes — the
      // purchase@15 precedes the first view@25, so no step 3
      (2L, ts(5), "signup"), (2L, ts(15), "purchase"), (2L, ts(25), "view"),
      // user 3: view before signup does NOT count for step 2; the
      // later view does
      (3L, ts(1), "view"), (3L, ts(2), "signup"), (3L, ts(3), "view"),
      // user 4: never signs up
      (4L, ts(7), "view"), (4L, ts(8), "purchase"))
      .map { case (u, t, e) => (u, t, e, 0.0) }
      .toDF("user_id", "ts", "event_type", "value")
    val f = graft.operators.TimeOps
      .funnel(events, Seq("signup", "view", "purchase"))
      .as[(Long, Long, Long, Long)].head()
    assert(f == ((4L, 3L, 3L, 1L))) // users 1,2,3 signup; 1,2,3 view-after; only 1 converts
    // greedy min-chain: user 2's view@25 counts for step 2 even
    // though their only purchase was earlier — step 3 stays empty
    val r = graft.operators.TimeOps
      .retentionCohorts(events, bucketMicros = 10L * 1000000L)
      .as[(Long, Long, Long)].collect().toSet
    // buckets of 10s: u1 {1,2,3} cohort 1; u2 {0,1,2} cohort 0;
    // u3 {0}; u4 {0}
    assert(r == Set((1L, 0L, 1L), (1L, 1L, 1L), (1L, 2L, 1L),
      (0L, 0L, 3L), (0L, 1L, 1L), (0L, 2L, 1L)))
    // pre-epoch timestamps FLOOR like `//` (the truncating double
    // divide put -1us in bucket 0 alongside +1us; floor puts it in -1)
    val preEpoch = Seq(
      (9L, new java.sql.Timestamp(-1L), "view", 0.0),   // -1 ms → bucket -1
      (9L, new java.sql.Timestamp(15000L), "view", 0.0)) // 15 s → bucket 1
      .toDF("user_id", "ts", "event_type", "value")
    val pre = graft.operators.TimeOps
      .retentionCohorts(preEpoch, bucketMicros = 10L * 1000000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(pre == Set((-1L, 0L, 1L), (-1L, 2L, 1L)))
  }
  test("scd2History: validity intervals, tie order, current flag") {
    val df = Seq(
      (1L, 100L, 1000000L, "bronze"),
      (1L, 101L, 2000000L, "silver"),
      (1L, 102L, 2000000L, "gold"),   // same ts: event_id pins order
      (2L, 200L, 5000000L, "bronze"))
      .toDF("user_id", "event_id", "us", "tier")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = TimeOps.scd2History(df, "user_id", "ts", "event_id",
        Seq("tier"))
      .orderBy("user_id", "valid_from_us", "event_id")
      .select("user_id", "tier", "valid_from_us", "valid_to_us",
        "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "bronze", 1000000L, Some(2000000L), false),
      (1L, "silver", 2000000L, Some(2000000L), false),
      (1L, "gold", 2000000L, None, true),
      (2L, "bronze", 5000000L, None, true)))
  }

  test("homoglyph: roundtrip restore, evasion detection, no false " +
      "positive on an all-confusable word") {
    import graft.functions.TextFunctions
    // vi<CYR a>gra mixes scripts; the all-Cyrillic word does not
    val df = Seq("buy vi\u0430gra now", "\u0430\u0435 ok").toDF("t")
      .select(
        TextFunctions.homoglyphCount(col("t")).as("n"),
        TextFunctions.mixedScriptTokenCount(col("t")).as("mixed"),
        TextFunctions.homoglyphNormalize(col("t")).as("norm"))
      .as[(Long, Long, String)].collect().toSeq
    assert(df(0) == ((1L, 1L, "buy viagra now")))
    assert(df(1) == ((2L, 0L, "ae ok")))
  }
  test("trendSlope: exact OLS on a noiseless line; degenerate key nulls") {
    // key a: daily cents follow y = 300x + 700 exactly -> slope 300
    // (values in dollars: 3x + 7); key b: single day -> null slope
    val rows = (0 to 4).map(x => ("a", x.toLong * 86400000000L, 3.0 * x + 7.0)) :+
      (("b", 0L, 9.99))
    val df = rows.toDF("k", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = TimeOps.trendSlope(df, "k", "ts", "value",
        bucketMicros = 86400000000L)
      .orderBy("k")
      .select("k", "n", "slope_cents_per_bucket", "intercept_cents")
      .as[(String, Long, Option[Double], Option[Double])].collect().toSeq
    assert(out == Seq(
      ("a", 5L, Some(300.0), Some(700.0)),
      ("b", 1L, None, None)))
  }

  test("groupedR2: perfect line = 1, constant column nulls out") {
    val df = Seq(("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),
      ("b", 1.0, 5.0), ("b", 2.0, 5.0), ("b", 3.0, 5.0))
      .toDF("k", "x", "y")
    val out = TimeOps.groupedR2(df, "k", "x", "y")
      .orderBy("k").select("k", "n", "r2")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(out == Seq(("a", 3L, Some(1.0)), ("b", 3L, None)))
  }

}

object MiscOpsSpec {
  val codecOpens = new java.util.concurrent.atomic.AtomicInteger(0)
}
