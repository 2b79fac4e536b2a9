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
  * IMAGE decode/resize is REAL via the JDK's own codecs
  * ([[Multimodal.ImageIoDecoder]]/[[Multimodal.ImageIoResizer]]: PNG, JPEG,
  * BMP, GIF — javax.imageio needs no external dependency), and AUDIO
  * decode is REAL via javax.sound.sampled ([[Multimodal.JavaSoundDecoder]]:
  * WAV/AU/AIFF PCM, also in the bare JDK). Only VIDEO keeps a deterministic
  * STUB (the JDK genuinely has no demuxer) behind the same
  * [[Multimodal.FrameSampler]] contract; the Spark-side plumbing (schema,
  * batch iteration, partition sizing) is identical either way.
  */
object Multimodal {

  /** Decompression-bomb guard: a hostile payload can declare a huge
    * width×height that `ImageIO.read` would eagerly allocate — and the
    * resulting OutOfMemoryError is an Error, so it escapes a
    * catch-Exception fallback and kills the executor. 2^26 pixels
    * (8192×8192, ~256 MB as INT_RGB) comfortably covers real corpus
    * images while bounding the allocation.
    */
  val MaxImagePixels: Long = 1L << 26

  /** Decode an image payload with the header checked FIRST: the reader's
    * `getWidth/getHeight(0)` parse only the header (O(bytes-read) tiny),
    * so oversized/declared-bomb payloads return null — and take the stub
    * fallback — without ever allocating the full raster. Returns null for
    * anything unreadable or over [[MaxImagePixels]].
    */
  private[multimodal] def readImageBounded(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) null
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            val w = r.getWidth(0).toLong
            val h = r.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > MaxImagePixels) null
            else r.read(0)
          } finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => null }

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

  /** STUB decode: deterministic fake "feature extraction" from raw bytes.
    * Serves two roles: the per-row FALLBACK the real decoders
    * ([[ImageIoDecoder]], [[JavaSoundDecoder]]) take on unreadable
    * payloads, and the stand-in for formats the bare JDK has no codec
    * for (MP3/OGG, video). The signature, batching and output schema are
    * the real contract; swap in a richer [[MediaDecoder]] on a cluster
    * with those codecs installed.
    */
  object StubDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte], dim: Int): Array[Float] = {
      // ??? MP3/OGG/video decoder goes here; deterministic byte-fold stand-in below
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** REAL image decoder over the JDK's own codecs (javax.imageio: PNG,
    * JPEG, BMP, GIF, WBMP — no external dependency). Features are
    * grid-pooled mean luminances: the image is divided into a
    * ceil(sqrt(dim)) × ceil(sqrt(dim)) grid row-major and each cell
    * averages its pixels' Rec.601 luma — a real, deterministic visual
    * signature (downstream dedup/ANN operate on it like any embedding).
    *
    * Payloads ImageIO cannot read (actual audio/video, truncated files)
    * fall back to [[StubDecoder]]'s byte-fold so a mixed-modality corpus
    * never fails the job; at 100 TB a per-row try/fallback beats a
    * job-killing throw on the first corrupt file.
    */
  object ImageIoDecoder extends MediaDecoder {
    // executor-hot path: never spill a temp cache file per decoded row
    // (ImageIO's default wraps every InputStream in a disk-backed cache)
    javax.imageio.ImageIO.setUseCache(false)

    def decode(bytes: Array[Byte], dim: Int): Array[Float] = {
      val img = readImageBounded(bytes)
      if (img == null || img.getWidth == 0 || img.getHeight == 0)
        StubDecoder.decode(bytes, dim)
      else {
        val g = math.ceil(math.sqrt(dim.toDouble)).toInt
        val sums = new Array[Float](dim)
        val counts = new Array[Int](dim)
        val (w, h) = (img.getWidth, img.getHeight)
        // one bulk row fetch per scanline instead of a per-pixel
        // getRGB(x,y) ColorModel call — the difference between an
        // O(pixels) loop and O(pixels) JNI-ish dispatch overhead
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          val cellRow = (y * g / h) * g
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val lum = (((rgb >> 16) & 0xff) * 0.299f +
              ((rgb >> 8) & 0xff) * 0.587f + (rgb & 0xff) * 0.114f) / 255f
            val cell = math.min(dim - 1, cellRow + (x * g / w))
            sums(cell) += lum
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < dim) { if (counts(i) > 0) sums(i) /= counts(i); i += 1 }
        sums
      }
    }
  }

  /** REAL audio decoder over the JDK's own javax.sound.sampled codecs
    * (WAV, AU, AIFF — PCM plus the built-in ULAW/ALAW converters; no
    * external dependency, exactly the ImageIO story for images). The
    * payload is decoded to mono PCM and summarized as `dim` features:
    * the first half are per-window RMS energies, the second half the
    * matching per-window zero-crossing rates — a real, deterministic
    * acoustic signature (energy envelope + coarse spectral brightness)
    * that downstream dedup/ANN consume like any embedding.
    *
    * Payloads javax.sound can't read (MP3/OGG, images, truncated files)
    * fall back to [[StubDecoder]]'s byte-fold so a mixed-modality corpus
    * never fails the job. Decode work is bounded by [[MaxAudioBytes]]
    * total regardless of what the header declares (channel count
    * included — it is attacker-controlled input).
    */
  object JavaSoundDecoder extends MediaDecoder {
    /** Per-payload decode budget in PCM BYTES, independent of channel
      * count (2^25 = 32 MB ≈ 35 min of 8 kHz mono; a 64-channel payload
      * just gets proportionally fewer frames): bounds memory/CPU against
      * hostile headers the same way [[MaxImagePixels]] bounds image
      * rasters — a total-byte bound, because a per-channel sample budget
      * would scale allocation with the (attacker-controlled) channel
      * count.
      */
    val MaxAudioBytes: Int = 1 << 25

    def decode(bytes: Array[Byte], dim: Int): Array[Float] = {
      val samples = readPcmMono(bytes)
      if (samples == null || samples.length == 0) StubDecoder.decode(bytes, dim)
      else {
        val out = new Array[Float](dim)
        val nw = math.max(1, dim / 2) // windows; RMS in [0,nw), ZCR in [nw,dim)
        val n = samples.length
        var w = 0
        while (w < nw) {
          val lo = (w.toLong * n / nw).toInt
          val hi = math.max(lo + 1, ((w + 1).toLong * n / nw).toInt)
          var sumSq = 0.0
          var zc = 0
          var prev = samples(lo)
          var i = lo
          while (i < hi) {
            val s = samples(i)
            sumSq += s.toDouble * s
            if ((s >= 0f) != (prev >= 0f)) zc += 1
            prev = s
            i += 1
          }
          out(w) = math.sqrt(sumSq / (hi - lo)).toFloat
          if (nw + w < dim) out(nw + w) = zc.toFloat / (hi - lo)
          w += 1
        }
        out
      }
    }

    /** Mono float samples in [-1,1], or null when javax.sound can't read
      * the payload. Multi-channel audio is mixed down by averaging; any
      * readable source encoding is converted to 16-bit signed PCM by the
      * JDK's own converters before parsing.
      */
    private def readPcmMono(bytes: Array[Byte]): Array[Float] = {
      import javax.sound.sampled._
      try {
        val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val src = in.getFormat
          val ch = math.max(1, src.getChannels)
          val target = new AudioFormat(
            AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, ch, ch * 2, src.getSampleRate, false)
          val pcm =
            if (src.matches(target)) in
            else AudioSystem.getAudioInputStream(target, in)
          val maxBytes = MaxAudioBytes
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](64 * 1024)
          var read = 0
          var total = 0
          while (read >= 0 && total < maxBytes) {
            read = pcm.read(chunk, 0, math.min(chunk.length, maxBytes - total))
            if (read > 0) { buf.write(chunk, 0, read); total += read }
          }
          val raw = buf.toByteArray
          val frameBytes = 2 * ch
          val nFrames = raw.length / frameBytes
          if (nFrames == 0) null
          else {
            val out = new Array[Float](nFrames)
            var f = 0
            while (f < nFrames) {
              var sum = 0f
              var c = 0
              while (c < ch) {
                val o = f * frameBytes + c * 2
                val s = ((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort
                sum += s / 32768f
                c += 1
              }
              out(f) = sum / ch
              f += 1
            }
            out
          }
        } finally in.close()
      } catch { case _: Exception => null }
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

  /** REAL image resize via the JDK: decode (javax.imageio) → bilinear
    * Graphics2D scale to w×h → re-encode PNG. Unreadable payloads fall
    * back to [[StubResizer]] (same mixed-corpus rationale as
    * [[ImageIoDecoder]]).
    */
  object ImageIoResizer extends MediaResizer {
    javax.imageio.ImageIO.setUseCache(false) // no per-row temp cache files

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = readImageBounded(bytes)
      if (img == null) StubResizer.resize(bytes, w, h)
      else {
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = dst.createGraphics()
        g2.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.drawImage(img, 0, 0, w, h, null)
        g2.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        bos.toByteArray
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
