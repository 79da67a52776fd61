package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, with batch-shaped processing hooks.
  *
  * The decode step itself is STUBBED (no image/audio libs in this
  * container): [[decodeImageStub]] derives deterministic fake
  * dimensions from the payload hash. Everything around it — the
  * schema contract, binary column handling, per-partition batch
  * processing, and partition sizing — is the real 100 TB plumbing:
  * payloads stay opaque bytes end-to-end, metadata travels in a
  * struct column, and heavy decode work runs `mapPartitions`-style so
  * a real codec would amortize per-batch setup.
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

  /** Per-partition batched feature extraction over binary payloads —
    * the Scala analog of `mapInPandas`: one iterator per partition,
    * `codec.open()` called once per partition before the rows stream
    * through it. */
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
