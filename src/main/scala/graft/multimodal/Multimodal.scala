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
