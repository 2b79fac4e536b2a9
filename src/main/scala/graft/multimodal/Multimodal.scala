package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling.
  *
  * Payloads are opaque `binary` columns + a typed metadata struct; that is
  * the layout that scales — parquet stores the bytes contiguously, metadata
  * predicates (mime, size) push down without touching payloads, and
  * payload-heavy stages control batch shape via partitioning.
  *
  * The actual media decode (JPEG/PNG/audio codecs) is STUBBED — the decode
  * libraries are not in this container. `decodeFeaturesStub` derives a
  * deterministic fake feature vector from the bytes so the Spark-side
  * plumbing (schema, batch iteration, partition sizing) is fully real and
  * testable; swap in a real `MediaDecoder` implementation on a cluster
  * with codecs installed.
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("magic_hex", StringType)
  ))

  /** Classify payloads by magic bytes and attach the metadata struct.
    * Pure Column ops — pushdown-friendly, no payload decode.
    */
  def withMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    val magic = lower(hex(substring(p, 1, 8)))
    val mime = when(magic.startsWith("ffd8ff"), "image/jpeg")
      .when(magic.startsWith("89504e47"), "image/png")
      .when(magic.startsWith("52494646"), "audio/wav")
      .when(magic.startsWith("494433"), "audio/mpeg")
      .otherwise("application/octet-stream")
    df.withColumn("meta", struct(
      mime.as("mime"),
      length(p).cast("long").as("n_bytes"),
      magic.as("magic_hex")
    ))
  }

  /** Pluggable per-payload decoder contract. Implementations ship to
    * executors, so they must be Serializable and hold no driver-side
    * resources; heavyweight codec state belongs in a lazy transient field
    * (initialized once per executor JVM, reused across rows).
    */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB decode: deterministic fake "feature extraction" from raw bytes —
    * the media codecs are not in this container. The signature, batching
    * and output schema are the real contract; swap in a real
    * [[MediaDecoder]] on a cluster with codecs installed.
    */
  object StubDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte], dim: Int): Array[Float] = {
      // ??? real decoder goes here; deterministic byte-fold stand-in below
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Pluggable bytes→bytes media transform (image resize, audio resample).
    * Same executor contract as [[MediaDecoder]].
    */
  trait MediaResizer extends Serializable {
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** STUB resize: deterministic stride-sample of the payload down to w·h
    * bytes — real pixel resampling needs codecs this container lacks. The
    * schema/NULL/partitioning plumbing is the real contract.
    */
  object StubResizer extends MediaResizer {
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // ??? real image decode→resample→encode goes here
      if (bytes.isEmpty) bytes // zero-byte payload: nothing to sample
      else {
        val target = math.max(1, math.min(w * h, bytes.length))
        val out = new Array[Byte](target)
        val stride = math.max(1, bytes.length / target)
        var i = 0
        while (i < target) { out(i) = bytes(math.min(i * stride, bytes.length - 1)); i += 1 }
        out
      }
    }
  }

  /** Resized payload column (NULL payloads stay NULL). Narrow codegen'd
    * projection around the pluggable transform — no shuffle, no plan
    * change; payload-heavy stages control memory via partition sizing
    * exactly like [[extractFeatures]].
    */
  def resized(
      df: DataFrame,
      payloadCol: String,
      w: Int,
      h: Int,
      resizer: MediaResizer = StubResizer
  ): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null else resizer.resize(bytes, w, h)
    }
    df.withColumn("resized", f(col(payloadCol)))
  }

  /** Pluggable frame sampler (video → every k-th frame). */
  trait FrameSampler extends Serializable {
    def frames(bytes: Array[Byte], everyK: Int): Seq[Array[Byte]]
  }

  /** STUB sampler: treats the payload as fixed 4 KiB "frames" and keeps
    * every k-th — a real implementation demuxes the container and decodes
    * keyframes. Deterministic, so the exploded row count is testable.
    */
  object StubFrameSampler extends FrameSampler {
    def frames(bytes: Array[Byte], everyK: Int): Seq[Array[Byte]] = {
      // ??? real demux/keyframe-decode goes here
      bytes.grouped(4096).zipWithIndex.collect {
        case (chunk, i) if i % everyK == 0 => chunk
      }.toSeq
    }
  }

  /** Explode each payload into sampled frames: (idCol, frame_idx, frame).
    * The explode multiplies rows but stays NARROW (frames land in their
    * parent's partition — no shuffle); when frames feed a heavy stage,
    * repartition AFTER sampling so batch memory is governed by frame
    * count, not source-file skew. NULL/empty payloads produce no rows.
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      everyK: Int = 2,
      sampler: FrameSampler = StubFrameSampler
  ): DataFrame = {
    require(everyK >= 1, "everyK must be >= 1")
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) Seq.empty[Array[Byte]] else sampler.frames(bytes, everyK)
    }
    df.select(col(idCol), posexplode(f(col(payloadCol))).as(Seq("frame_idx", "frame")))
  }

  /** Batch feature extraction over payload partitions (the Scala analogue
    * of arrow-batched pandas UDFs): mapPartitions keeps the decode loop
    * off the driver and lets partition sizing control memory per batch.
    */
  def extractFeatures(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      dim: Int = 16,
      batchPartitions: Option[Int] = None,
      decoder: MediaDecoder = StubDecoder
  ): DataFrame = {
    val input = batchPartitions.map(df.repartition(_)).getOrElse(df)
      .select(col(idCol), col(payloadCol))
    val outSchema = StructType(Seq(
      input.schema.head,
      StructField("features", ArrayType(FloatType, containsNull = false))
    ))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.get(0), decoder.decode(if (bytes == null) Array.emptyByteArray else bytes, dim))
      }
    }(enc)
  }
}
