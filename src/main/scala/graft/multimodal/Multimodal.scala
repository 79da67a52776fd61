package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, with batch-shaped processing hooks.
  *
  * IMAGE decode and resize are REAL since r13 — `javax.imageio` +
  * AWT ship in the JDK, no new dependency: [[imageIoCodec]] decodes
  * PNG/JPEG payloads to width/height/band-count + exact per-channel
  * sample sums, [[resizeImages]] resamples to a max edge and
  * re-encodes. AUDIO decode is REAL too — [[audioWavCodec]] rides
  * `javax.sound.sampled` (also in the JDK) to sample-rate/channel/
  * frame metadata + exact per-channel PCM sample sums. Multi-frame
  * sampling is REAL for GIF payloads ([[frameSampleGif]] — the JDK's
  * one multi-frame decoder); true video containers (mp4, webm…)
  * still need an injected codec, so [[frameSampleStub]] keeps the
  * (payload, frame_idx) explode contract for that remaining case.
  * The original hash-derived stubs remain as the no-codec fallbacks
  * ([[decodeImageStub]], [[resizeStub]], [[byteStatsCodec]]).
  * Everything else — the schema contract, binary column handling,
  * per-partition batch processing with once-per-partition codec
  * init — is the real 100 TB plumbing.
  */
object Multimodal {

  /** Metadata schema attached to every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sha", StringType, nullable = false)))

  /** Wrap a string column as an opaque binary payload + metadata
    * struct — the ingestion shape for image/audio/video bytes. */
  def asMedia(df: DataFrame, payloadCol: String,
              mediaType: String): DataFrame =
    df.withColumn("payload", col(payloadCol).cast("binary"))
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha")))

  /** STUB decode: deterministic fake width/height/channels derived
    * from the payload hash. A real deployment swaps only this column
    * expression for a codec call (e.g. Arrow-batched native decode);
    * schema and plan shape are unchanged. */
  def decodeImageStub(payload: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column = {
    val h = abs(xxhash64(payload))
    struct(
      (h % 1920 + 1).cast("int").as("width"),
      (shiftrightunsigned(h, 16) % 1080 + 1).cast("int").as("height"),
      lit(3).as("channels"))
  }

  /** STUB resize: deterministic target dimensions derived from the
    * decode-stub dims and a fixed max edge — a real deployment swaps
    * the arithmetic for a codec resample on the payload; the column
    * contract (struct in, struct out, payload untouched) is the real
    * plumbing. */
  def resizeStub(decoded: org.apache.spark.sql.Column, maxEdge: Int)
  : org.apache.spark.sql.Column = {
    val w = decoded.getField("width")
    val h = decoded.getField("height")
    val scale = least(lit(1.0),
      lit(maxEdge.toDouble) / greatest(w, h).cast("double"))
    struct(
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"),
      decoded.getField("channels").as("channels"))
  }

  /** STUB frame sampling for video payloads: every `stride`-th frame
    * index up to a deterministic fake frame count derived from the
    * payload hash. Real decoders replace the count; the exploded
    * (payload, frame_idx) shape — one row per sampled frame, ready
    * for per-frame decode — is the 100 TB plumbing. */
  def frameSampleStub(df: DataFrame, stride: Int): DataFrame = {
    val nFrames = (abs(xxhash64(col("payload"))) % 300 + 1).cast("int")
    df.withColumn("frame_idx",
      explode(sequence(lit(0), nFrames - 1, lit(stride))))
  }

  /** Batched codec contract for [[extractFeatures]]: `open()` runs
    * ONCE per partition (load the native codec / model there, amortized
    * over the partition's rows) and returns the per-payload feature
    * function. The whole codec must be serializable — it ships to
    * executors; whatever `open()` allocates does not. */
  final case class BatchCodec(
      features: Seq[StructField],
      open: () => Array[Byte] => Seq[Any]) extends Serializable

  /** Default stub codec: payload length + rolling byte checksum —
    * deterministic, no external libs. A real deployment swaps ONLY
    * this value for e.g. an Arrow-batched image decoder; the plumbing
    * below is unchanged. */
  val byteStatsCodec: BatchCodec = BatchCodec(
    features = Seq(
      StructField("feat_len", LongType, nullable = false),
      StructField("feat_checksum", LongType, nullable = false)),
    open = () => { bytes =>
      var cs = 0L
      var i = 0
      while (i < bytes.length) { cs = cs * 31 + (bytes(i) & 0xff); i += 1 }
      Seq[Any](bytes.length.toLong, cs)
    })

  /** REAL image decode via `javax.imageio` (in the JDK — zero new
    * dependencies): width, height, raster band count, and the EXACT
    * per-channel sample sums (long — integers survive any engine, a
    * float mean would not). PNG is lossless, so decoded samples equal
    * the encoder's input and the features are bit-replayable from the
    * synthesis arithmetic (what promotes q_media_features to
    * oracle-green). Unrecognized or corrupt payloads yield all-null
    * features — the quarantine signal, not an abort; a missing band
    * (grayscale) nulls only that channel's sum. `open()` disables
    * ImageIO's disk cache once per partition. */
  val imageIoCodec: BatchCodec = BatchCodec(
    features = Seq(
      StructField("feat_width", IntegerType, nullable = true),
      StructField("feat_height", IntegerType, nullable = true),
      StructField("feat_channels", IntegerType, nullable = true),
      StructField("feat_sum_r", LongType, nullable = true),
      StructField("feat_sum_g", LongType, nullable = true),
      StructField("feat_sum_b", LongType, nullable = true)),
    open = () => {
      javax.imageio.ImageIO.setUseCache(false)
      bytes => {
        val img =
          if (bytes == null) null // null payload = null features
          else try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException => null }
        if (img == null) Seq[Any](null, null, null, null, null, null)
        else {
          val raster = img.getRaster
          val bands = raster.getNumBands
          val w = img.getWidth
          val h = img.getHeight
          val sums = new Array[Long](bands)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              while (b < bands) {
                sums(b) += raster.getSample(x, y, b)
                b += 1
              }
              x += 1
            }
            y += 1
          }
          def s(i: Int): Any = if (i < bands) sums(i) else null
          Seq[Any](w, h, bands, s(0), s(1), s(2))
        }
      }
    })

  /** Deterministic RGB PNG synthesis — the media-pipeline fixture
    * (the image libs that would DOWNLOAD test corpora are not in the
    * container, but the JDK encoder is): doc `d` becomes a
    * (4 + d%5) × (3 + d%4) image whose pixel (x, y) has channels
    * r = (d + 3x + 7y) % 256, g = (2d + 5x + 11y) % 256,
    * b = (3d + x + 13y) % 256 — pure arithmetic, so a SQL oracle
    * re-derives every decoded feature without decoding anything.
    * Appends a `png` binary column. */
  def synthRgbPng(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val out = StructType(df.schema.fields :+
      StructField("png", BinaryType, nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val d = r.getLong(idIdx)
        val w = (4 + d % 5).toInt
        val h = (3 + d % 4).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val red = ((d + 3L * x + 7L * y) % 256).toInt
            val green = ((2L * d + 5L * x + 11L * y) % 256).toInt
            val blue = ((3L * d + x + 13L * y) % 256).toInt
            img.setRGB(x, y, (red << 16) | (green << 8) | blue)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  /** REAL image resize (AWT resample + PNG re-encode, JDK-only):
    * scale so the longest edge is at most `maxEdge` (never upscale),
    * preserving aspect ratio — floor dims, min 1px. Appends
    * `resized_payload` (null when the payload does not decode — the
    * passthrough/quarantine signal) next to the untouched original.
    * Replaces [[resizeStub]] as the production path; the stub stays
    * for payloads with no codec. */
  def resizeImages(df: DataFrame, maxEdge: Int,
                   payloadCol: String = "payload"): DataFrame = {
    require(maxEdge >= 1, s"maxEdge must be >= 1, got $maxEdge")
    val out = StructType(df.schema.fields :+
      StructField("resized_payload", BinaryType, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        val img =
          if (bytes == null) null // null payload passes through null
          else try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException => null }
        val resized: Any =
          if (img == null) null
          else {
            val w = img.getWidth
            val h = img.getHeight
            val scale = math.min(1.0, maxEdge.toDouble / math.max(w, h))
            val nw = math.max(1, math.floor(w * scale).toInt)
            val nh = math.max(1, math.floor(h * scale).toInt)
            val dst = new java.awt.image.BufferedImage(
              nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            bos.toByteArray
          }
        Row.fromSeq(r.toSeq :+ resized)
      }
    }(enc)
  }

  /** REAL audio decode via `javax.sound.sampled` (in the JDK — zero
    * new dependencies, the audio twin of [[imageIoCodec]]): sample
    * rate, channel count, frame count, and the EXACT per-channel
    * sample sums over 16-bit signed little-endian PCM (longs —
    * integers survive any engine). WAV PCM is lossless, so decoded
    * samples equal the synthesis arithmetic and the features are
    * SQL-replayable (what makes q_audio_features oracle-green).
    * Payloads that are not an audio container, or whose format is
    * not 16-bit signed LE PCM, yield all-null features — the
    * quarantine signal, not an abort; a mono payload nulls only the
    * second channel's sum. */
  val audioWavCodec: BatchCodec = BatchCodec(
    features = Seq(
      StructField("feat_rate", IntegerType, nullable = true),
      StructField("feat_audio_channels", IntegerType, nullable = true),
      StructField("feat_frames", LongType, nullable = true),
      StructField("feat_sum_ch0", LongType, nullable = true),
      StructField("feat_sum_ch1", LongType, nullable = true)),
    open = () => { bytes =>
      val in =
        if (bytes == null) null // null payload = null features
        else try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      val fmt = if (in == null) null else in.getFormat
      if (fmt == null ||
          fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.isBigEndian)
        Seq[Any](null, null, null, null, null)
      else {
        val channels = fmt.getChannels
        val nFrames = in.getFrameLength
        val data = in.readAllBytes()
        val sums = new Array[Long](channels)
        var i = 0
        while (i + 1 < data.length) {
          val s = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort
          sums((i / 2) % channels) += s
          i += 2
        }
        def s(c: Int): Any = if (c < channels) sums(c) else null
        Seq[Any](fmt.getSampleRate.toInt, channels, nFrames, s(0), s(1))
      }
    })

  /** Deterministic 16-bit PCM WAV synthesis — the audio-pipeline
    * fixture (the audio corpora that would need downloading are not
    * in the container, but the JDK encoder is): doc `d` becomes a
    * (1 + d%2)-channel, (50 + d%32)-frame, 8 kHz clip whose frame
    * `i`, channel `c` sample is ((7d + 31i + 17c) % 65536) − 32768 —
    * pure arithmetic over a nonnegative id, so a SQL oracle
    * re-derives every decoded feature without decoding anything.
    * Appends a `wav` binary column. */
  def synthWavPcm(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val out = StructType(df.schema.fields :+
      StructField("wav", BinaryType, nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val d = r.getLong(idIdx)
        require(d >= 0, s"synthWavPcm needs a nonnegative id, got $d")
        val channels = (1 + d % 2).toInt
        val nFrames = (50 + d % 32).toInt
        val rate = 8000f
        val fmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          rate, 16, channels, 2 * channels, rate, false)
        val pcm = new Array[Byte](nFrames * 2 * channels)
        var i = 0
        while (i < nFrames) {
          var c = 0
          while (c < channels) {
            val s = ((7 * d + 31L * i + 17L * c) % 65536 - 32768).toInt
            val off = (i * channels + c) * 2
            pcm(off) = (s & 0xff).toByte
            pcm(off + 1) = ((s >> 8) & 0xff).toByte
            c += 1
          }
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  /** Deterministic multi-frame grayscale GIF synthesis — the
    * video-pipeline fixture: doc `d` becomes a (2 + d%4)-frame
    * animation of (4 + d%5) × (3 + d%4) frames whose frame `f` pixel
    * (x, y) has gray value (d + 5x + 3y + 11f) % 256. The frames are
    * written through an EXPLICIT 256-level gray palette with
    * progressive (interlaced) mode disabled — both are what make the
    * round trip bit-exact (the writer's default palette quantizes
    * and its interlacing permutes rows on 3+-frame sequences).
    * Appends a `gif` binary column. */
  def synthGrayGif(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val out = StructType(df.schema.fields :+
      StructField("gif", BinaryType, nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val gray = Array.tabulate[Byte](256)(_.toByte)
      val cm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
      rows.map { r =>
        val d = r.getLong(idIdx)
        require(d >= 0, s"synthGrayGif needs a nonnegative id, got $d")
        val w = (4 + d % 5).toInt
        val h = (3 + d % 4).toInt
        val nFrames = (2 + d % 4).toInt
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        val param = writer.getDefaultWriteParam
        param.setProgressiveMode(
          javax.imageio.ImageWriteParam.MODE_DISABLED)
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0,
                ((d + 5L * x + 3L * y + 11L * f) % 256).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), param)
          f += 1
        }
        writer.endWriteSequence()
        ios.close()
        writer.dispose()
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  /** REAL video-style frame sampling over multi-frame GIF payloads
    * (`javax.imageio`'s GIF reader is the one multi-frame decoder in
    * the JDK): every `stride`-th frame explodes to its own row with
    * the frame index, dimensions, and EXACT gray-sample sum — the
    * per-frame feature rows a video pipeline feeds to downstream
    * embedding/dedup stages. Replaces [[frameSampleStub]] as the
    * production path for GIF payloads; true video containers (mp4…)
    * still need an injected codec — the JDK has none. Payloads that
    * do not decode yield ONE all-null-feature row (the quarantine
    * signal — rows are never silently dropped). Plan shape: scan →
    * mapPartitions, zero exchanges; decode cost is per-row compute,
    * which is exactly where a 1000-executor cluster scales linearly. */
  def frameSampleGif(df: DataFrame, stride: Int,
                     payloadCol: String = "payload"): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val out = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = true),
      StructField("frame_width", IntegerType, nullable = true),
      StructField("frame_height", IntegerType, nullable = true),
      StructField("frame_gray_sum", LongType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        val frames: Seq[Seq[Any]] =
          if (bytes == null) Nil
          else try {
            val reader = javax.imageio.ImageIO
              .getImageReadersByFormatName("gif").next()
            try {
              reader.setInput(javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(bytes)))
              val n = reader.getNumImages(true)
              (0 until n by stride).map { f =>
                val img = reader.read(f)
                val w = img.getWidth
                val h = img.getHeight
                var sum = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    sum += (img.getRGB(x, y) & 0xff)
                    x += 1
                  }
                  y += 1
                }
                Seq[Any](f, w, h, sum)
              }
            } finally reader.dispose()
          } catch { case _: Exception => Nil }
        if (frames.isEmpty) // undecodable / null → one quarantine row
          Iterator(Row.fromSeq(r.toSeq ++ Seq(null, null, null, null)))
        else frames.iterator.map(f => Row.fromSeq(r.toSeq ++ f))
      }
    }(enc)
  }

  /** Deterministic grayscale PNG synthesis in NEAR-DUPLICATE PAIRS —
    * the perceptual-dedup fixture: docs 2k and 2k+1 share base
    * image k ((8 + k%5) × (8 + k%4), gray(x, y) = (3k + 7x + 11y) %
    * 256), and the odd doc perturbs pixel (0, 0) by +128 — a
    * one-pixel edit, the canonical "same image, tiny change"
    * near-dup. TYPE_BYTE_GRAY PNG is lossless, so [[imageAHash64]]
    * features replay in SQL from this arithmetic. Appends `png`. */
  def synthPairGrayPng(df: DataFrame, idCol: String = "doc_id")
  : DataFrame = {
    val out = StructType(df.schema.fields :+
      StructField("png", BinaryType, nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val d = r.getLong(idIdx)
        require(d >= 0, s"synthPairGrayPng needs a nonnegative id, got $d")
        val base = d / 2
        val w = (8 + base % 5).toInt
        val h = (8 + base % 4).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g0 = ((3 * base + 7L * x + 11L * y) % 256).toInt
            val g = if (d % 2 == 1 && x == 0 && y == 0) (g0 + 128) % 256
                    else g0
            raster.setSample(x, y, 0, g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  /** 64-bit average-hash (aHash) over decoded images — the LAION-
    * style perceptual fingerprint that makes IMAGE near-dup dedup an
    * equi-join problem: nearest-neighbor 8×8 downsample (cell (i, j)
    * reads pixel ((i·w) div 8, (j·h) div 8) — pure INDEX arithmetic,
    * no resample kernel, which is what keeps the hash bit-replayable
    * in SQL from a synthesis formula), per-cell gray = mean of bands
    * (integer div), threshold at the integer-div mean of the 64
    * cells, bit 8j+i set iff gray > mean (strict — ties clear).
    * Undecodable/null payloads hash to null. Pipe the codes into
    * [[graft.operators.Dedup.hammingPairs]] for banded near-dup
    * candidate generation (never all-pairs). Appends `feat_ahash`. */
  def imageAHash64(df: DataFrame, payloadCol: String = "payload")
  : DataFrame = {
    val out = StructType(df.schema.fields :+
      StructField("feat_ahash", LongType, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        val img =
          if (bytes == null) null
          else try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException => null }
        val hash: Any =
          if (img == null) null
          else {
            val raster = img.getRaster
            val bands = raster.getNumBands
            val w = img.getWidth
            val h = img.getHeight
            val gray = new Array[Long](64)
            var j = 0
            while (j < 8) {
              var i = 0
              while (i < 8) {
                val x = i * w / 8
                val y = j * h / 8
                var s = 0L
                var b = 0
                while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
                gray(8 * j + i) = s / bands
                i += 1
              }
              j += 1
            }
            val mean = gray.sum / 64
            var code = 0L
            var idx = 0
            while (idx < 64) {
              if (gray(idx) > mean) code |= (1L << idx)
              idx += 1
            }
            code
          }
        Row.fromSeq(r.toSeq :+ hash)
      }
    }(enc)
  }

  /** Deterministic mono PCM WAV synthesis in NEAR-DUPLICATE PAIRS —
    * the audio-dedup fixture mirroring [[synthPairGrayPng]]: docs 2k
    * and 2k+1 share base clip k ((256 + k%64) frames, 8 kHz, sample
    * i = ((7k + 31i) % 65536) − 32768) and the odd doc perturbs
    * sample 0 by +16384 — the one-sample edit. Appends `wav`. */
  def synthPairWavPcm(df: DataFrame, idCol: String = "doc_id")
  : DataFrame = {
    val out = StructType(df.schema.fields :+
      StructField("wav", BinaryType, nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val d = r.getLong(idIdx)
        require(d >= 0, s"synthPairWavPcm needs a nonnegative id, got $d")
        val base = d / 2
        val nFrames = (256 + base % 64).toInt
        val rate = 8000f
        val fmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          rate, 16, 1, 2, rate, false)
        val pcm = new Array[Byte](nFrames * 2)
        var i = 0
        while (i < nFrames) {
          val raw = (7 * base + 31L * i) % 65536
          val adj = if (d % 2 == 1 && i == 0) (raw + 16384) % 65536 else raw
          val s = (adj - 32768).toInt
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  /** 64-bit energy-hash over decoded PCM audio — the audio twin of
    * [[imageAHash64]] (a chromaprint-shaped fingerprint without the
    * FFT, so it stays EXACT integer arithmetic and SQL-replayable):
    * the clip's frames split into 64 index-arithmetic windows
    * (window k covers frames [k·n div 64, (k+1)·n div 64) — empty
    * when n < 64, energy 0), per-window energy = Σ |sample| over all
    * channels, threshold at the integer-div mean, bit k set iff
    * energy > mean (strict). Same decode gate as [[audioWavCodec]]
    * (16-bit signed LE PCM or null); codes feed
    * [[graft.operators.Dedup.hammingPairs]] for banded audio
    * near-dup candidate generation. Appends `feat_audiohash`. */
  def audioEnergyHash64(df: DataFrame, payloadCol: String = "payload")
  : DataFrame = {
    val out = StructType(df.schema.fields :+
      StructField("feat_audiohash", LongType, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        val in =
          if (bytes == null) null
          else try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => null
            case _: java.io.IOException => null
          }
        val fmt = if (in == null) null else in.getFormat
        val hash: Any =
          if (fmt == null ||
              fmt.getEncoding !=
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) null
          else {
            val channels = fmt.getChannels
            val data = in.readAllBytes()
            val n = data.length / (2 * channels)
            val energy = new Array[Long](64)
            var k = 0
            while (k < 64) {
              val start = k.toLong * n / 64
              val end = (k + 1).toLong * n / 64
              var i = start
              var e = 0L
              while (i < end) {
                var c = 0
                while (c < channels) {
                  val off = ((i * channels + c) * 2).toInt
                  val s = ((data(off) & 0xff) | (data(off + 1) << 8)).toShort
                  e += math.abs(s.toLong)
                  c += 1
                }
                i += 1
              }
              energy(k) = e
              k += 1
            }
            val mean = energy.sum / 64
            var code = 0L
            var idx = 0
            while (idx < 64) {
              if (energy(idx) > mean) code |= (1L << idx)
              idx += 1
            }
            code
          }
        Row.fromSeq(r.toSeq :+ hash)
      }
    }(enc)
  }

  /** Near-duplicate WAV pairs sized for a FREQUENCY-domain hash (the
    * audio sibling of [[synthPairGrayPngSoft]]): docs 2k and 2k+1
    * share base k — a mono 16-bit clip of two superimposed square
    * waves whose periods derive from the base (square waves carry
    * strong, base-DISTINCT low-frequency content, so different bases
    * land far apart in the spectral hash) — and the odd doc perturbs
    * ONE mid-clip sample by +512 (amplitude ~5% of the signal, one
    * time window of the 16): the small local edit a spectral
    * fingerprint should absorb. All-integer synthesis. Appends
    * `wav`. */
  def synthPairWavPcmSoft(df: DataFrame, idCol: String = "doc_id")
  : DataFrame = {
    val out = StructType(df.schema.fields :+
      StructField("wav", BinaryType, nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val d = r.getLong(idIdx)
        require(d >= 0, s"synthPairWavPcmSoft needs a nonnegative id, got $d")
        val base = d / 2
        val nFrames = (960 + (base % 5) * 64).toInt
        val p = (3 + base % 6).toInt
        val q = (24 + (base % 9) * 8).toInt
        val rate = 8000f
        val fmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          rate, 16, 1, 2, rate, false)
        val pcm = new Array[Byte](nFrames * 2)
        var i = 0
        while (i < nFrames) {
          var s = (if ((i / p) % 2 == 0) 6000 else -6000) +
            (if ((i / q) % 2 == 0) 4000 else -4000)
          if (d % 2 == 1 && i == nFrames / 2) s += 512
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  /** 64-bit SPECTRAL audio fingerprint — the chromaprint-shaped
    * frequency-domain twin of [[audioEnergyHash64]] (which is
    * deliberately FFT-free for SQL-exactness; this one trades the
    * oracle for real spectral structure, built on the
    * [[imageDctHash64]] StrictMath-DCT + tick-snap discipline). The
    * clip's mono mix (per-frame channel AVERAGE — duplicating a mono
    * signal across channels does not move the hash) splits into 16
    * index-arithmetic time windows; per window a DCT-II at
    * frequencies u = 1..4 with orthonormal sqrt(2/len) scaling —
    * u = 0 EXCLUDED, so a constant sample offset moves no bit (the
    * cosine rows for u ≥ 1 sum to zero; float residue dies in the
    * tick snap). The 64 (window, band) coefficients snap to 1e-6
    * ticks (rint) and threshold at their median: bit 4k+(u−1) set
    * iff tick > median, strict — ~32 set bits, the balance
    * [[graft.operators.Dedup.hammingPairs]] banding needs. Positive
    * gain also preserves every comparison up to tick quantization
    * (all coefficients scale together). StrictMath keeps the doubles
    * bit-reproducible across JVMs/executors; floats make the hash
    * NOT SQL-replayable → rows-only gate, invariances
    * property-pinned in MiscOpsSpec. Same decode gate as
    * [[audioEnergyHash64]]; undecodable/null → null; clips shorter
    * than one frame hash to 0. Appends `feat_spectralhash`. */
  def audioSpectralHash64(df: DataFrame, payloadCol: String = "payload")
  : DataFrame = {
    val out = StructType(df.schema.fields :+
      StructField("feat_spectralhash", LongType, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        val in =
          if (bytes == null) null
          else try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => null
            case _: java.io.IOException => null
          }
        val fmt = if (in == null) null else in.getFormat
        val hash: Any =
          if (fmt == null ||
              fmt.getEncoding !=
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) null
          else {
            val channels = fmt.getChannels
            val data = in.readAllBytes()
            val n = data.length / (2 * channels)
            val mono = new Array[Double](n)
            var i = 0
            while (i < n) {
              var s = 0L
              var c = 0
              while (c < channels) {
                val off = (i * channels + c) * 2
                s += ((data(off) & 0xff) | (data(off + 1) << 8)).toShort
                c += 1
              }
              mono(i) = s.toDouble / channels
              i += 1
            }
            val ticks = new Array[Long](64)
            var k = 0
            while (k < 16) {
              val start = (k.toLong * n / 16).toInt
              val end = ((k + 1).toLong * n / 16).toInt
              val len = end - start
              if (len > 0) {
                var u = 1
                while (u <= 4) {
                  var acc = 0.0
                  var x = 0
                  while (x < len) {
                    acc += mono(start + x) * StrictMath.cos(
                      (2 * x + 1) * u * StrictMath.PI / (2.0 * len))
                    x += 1
                  }
                  val coefVal = StrictMath.sqrt(2.0 / len) * acc
                  ticks(4 * k + (u - 1)) =
                    StrictMath.rint(coefVal * 1e6).toLong
                  u += 1
                }
              }
              k += 1
            }
            val sorted = ticks.clone()
            java.util.Arrays.sort(sorted)
            // even count: element 31 of the sorted 64 (lower median)
            val med = sorted(31)
            var code = 0L
            var idx = 0
            while (idx < 64) {
              if (ticks(idx) > med) code |= (1L << idx)
              idx += 1
            }
            code
          }
        Row.fromSeq(r.toSeq :+ hash)
      }
    }(enc)
  }

  /** Per-partition batched feature extraction over binary payloads —
    * the Scala analog of `mapInPandas`: one iterator per partition,
    * `codec.open()` called once per partition before the rows stream
    * through it. */
  /** The DCT-scale sibling of [[synthPairGrayPng]]: near-duplicate
    * PNG pairs sized for a FREQUENCY-domain hash. Docs 2k and 2k+1
    * share base k — a (64 + k%5) × (64 + k%4) gray image of 8×8-px
    * tiles whose levels mix base and tile coordinates through an
    * integer polynomial (coarse BLOCKY texture = strong, per-base
    * DISTINCT low-frequency content; a plain shifted ramp makes
    * different bases near-identical in the low-freq spectrum) — and
    * the odd doc perturbs pixel (0,0) by +16 mod 256: ONE cell of
    * the 32×32 downsample grid, amplitude 16/256 — the small local
    * edit a perceptual hash should absorb. ([[synthPairGrayPng]]'s
    * +128 on an 8×8 source moves ~30 of [[imageDctHash64]]'s 63
    * bits — a quarter of the image energy is not a "near" duplicate
    * in the frequency domain; that fixture stays the aHash/SQL-
    * replay one.) Appends `png`. */
  def synthPairGrayPngSoft(df: DataFrame, idCol: String = "doc_id")
  : DataFrame = {
    val out = StructType(df.schema.fields :+
      StructField("png", BinaryType, nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val d = r.getLong(idIdx)
        require(d >= 0, s"synthPairGrayPngSoft needs a nonnegative id, got $d")
        val base = d / 2
        val w = (64 + base % 5).toInt
        val h = (64 + base % 4).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val bx = x / 8
            val by = y / 8
            val g0 = ((1000003L * base + 4973L * bx + 9851L * by +
              7919L * bx * by + 271L * base * bx + 331L * base * by)
              % 256).toInt
            val g = if (d % 2 == 1 && x == 0 && y == 0) (g0 + 16) % 256
                    else g0
            raster.setSample(x, y, 0, g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  /** 64-bit DCT perceptual hash (pHash) over decoded images — the
    * frequency-domain sibling of [[imageAHash64]]: robust to
    * brightness shifts and uniform rescaling, which aHash's raw
    * spatial means are not. Per image: grayscale 32×32 nearest-
    * neighbor downsample (same index arithmetic as aHash; per-cell
    * gray = band mean as a double), separable 2D DCT-II of the grid
    * with orthonormal α scaling (only the top-left 8×8 low-frequency
    * block is computed — O(8·32·32) per axis, ~10k flops/image), the
    * DC term EXCLUDED (that is what buys brightness invariance: a
    * constant shift moves ONLY C(0,0) — cosine rows for u ≥ 1 sum to
    * zero), and the remaining 63 coefficients thresholded at their
    * median (element 31 of the sorted 63): bit 8v+u set iff
    * C(u,v) > median, strict, so a constant image hashes to 0L and
    * every non-degenerate hash carries ~31 set bits — the balance
    * that makes [[graft.operators.Dedup.hammingPairs]] banding
    * effective. Coefficients are snapped to fixed-point 1e-6 ticks
    * BEFORE the median (rint) so mathematically-zero coefficients —
    * constant images, separable patterns, brightness shifts — don't
    * leave ±1e-13 accumulation noise for the median to amplify into
    * unstable bits; `StrictMath` trig keeps the doubles
    * bit-reproducible across JVMs/platforms (Math.cos may use
    * platform intrinsics; a hash that differs across executors would
    * poison an equi-join dedup). Floats make this hash NOT
    * SQL-replayable — it ships under a rows-only gate with the
    * invariance contracts property-pinned in MultimodalSpec.
    * Undecodable/null payloads hash to null. Appends
    * `feat_dcthash`. */
  def imageDctHash64(df: DataFrame, payloadCol: String = "payload")
  : DataFrame = {
    val out = StructType(df.schema.fields :+
      StructField("feat_dcthash", LongType, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val N = 32
      // cosine basis + orthonormal scale, built once per partition
      val basis = Array.tabulate(8, N)((u, x) =>
        StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * N)))
      val alpha = Array.tabulate(8)(u =>
        if (u == 0) StrictMath.sqrt(1.0 / N) else StrictMath.sqrt(2.0 / N))
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        val img =
          if (bytes == null) null
          else try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException => null }
        val hash: Any =
          if (img == null) null
          else {
            val raster = img.getRaster
            val bands = raster.getNumBands
            val w = img.getWidth
            val h = img.getHeight
            val g = new Array[Double](N * N)
            var y = 0
            while (y < N) {
              var x = 0
              while (x < N) {
                val px = x * w / N
                val py = y * h / N
                var s = 0L
                var b = 0
                while (b < bands) { s += raster.getSample(px, py, b); b += 1 }
                g(N * y + x) = s.toDouble / bands
                x += 1
              }
              y += 1
            }
            // separable DCT: rows pass tmp(u,y), then columns pass
            val tmp = new Array[Double](8 * N)
            var u = 0
            while (u < 8) {
              var yy = 0
              while (yy < N) {
                var acc = 0.0
                var x = 0
                while (x < N) { acc += g(N * yy + x) * basis(u)(x); x += 1 }
                tmp(N * u + yy) = acc
                yy += 1
              }
              u += 1
            }
            val coef = new Array[Double](64)
            u = 0
            while (u < 8) {
              var v = 0
              while (v < 8) {
                var acc = 0.0
                var yy = 0
                while (yy < N) { acc += tmp(N * u + yy) * basis(v)(yy); yy += 1 }
                coef(8 * v + u) = alpha(u) * alpha(v) * acc
                v += 1
              }
              u += 1
            }
            // fixed-point ticks (the Pq.trainCodebooks discipline):
            // a mathematically-zero coefficient (constant image,
            // separable pattern, brightness shift) accumulates as
            // ±1e-13 float noise, and a median over raw doubles
            // turns that noise into unstable bits. rint(c·1e6)
            // snaps it to tick 0 (rint, NOT floor — floor(-1e-7)
            // is -1) while real structure (|c| up to 255·32, tick
            // magnitudes ≥ thousands) is untouched.
            val ticks = new Array[Long](64)
            var k = 0
            while (k < 64) {
              ticks(k) = StrictMath.rint(coef(k) * 1e6).toLong
              k += 1
            }
            val ac = java.util.Arrays.copyOfRange(ticks, 1, 64)
            // index 1..63 skips only ticks(0) = C(0,0): the layout
            // puts (u=0,v=0) at 0 and no other (0,*)/(*,0) below 1
            java.util.Arrays.sort(ac)
            val med = ac(31)
            var code = 0L
            k = 1
            while (k < 64) {
              if (ticks(k) > med) code |= (1L << k)
              k += 1
            }
            code
          }
        Row.fromSeq(r.toSeq :+ hash)
      }
    }(enc)
  }

  def extractFeatures(df: DataFrame,
                      codec: BatchCodec = byteStatsCodec): DataFrame = {
    val out = StructType(df.schema.fields ++ codec.features)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(out)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      val perRow = codec.open() // codec/model init, once per partition
      rows.map { r =>
        Row.fromSeq(r.toSeq ++ perRow(r.getAs[Array[Byte]](payloadIdx)))
      }
    }(enc)
  }
}
