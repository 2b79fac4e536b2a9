package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image deduplication via dHash (difference hash — the
  * published 64-bit gradient fingerprint family behind pHash/dHash
  * image dedup; e.g. Krawetz's dHash write-up, public): the image is
  * pooled to a 9×8 mean-luminance grid and bit (r,c) records whether
  * cell (r,c+1) is brighter than cell (r,c). Row-wise GRADIENTS, not
  * absolute values, so the hash is invariant to global brightness/
  * contrast shifts and JPEG re-encode noise — the transformations that
  * defeat byte-level exact dedup on image corpora.
  *
  * Connects the multimodal and dedup pillars with zero new
  * dependencies: decode is [[Multimodal.readImageBounded]] (JDK
  * javax.imageio, bomb-guarded), and near-dup blocking is the
  * [[graft.dedup.SimHash.pairsOfFingerprints]] banded-hamming engine —
  * pigeonhole-lossless for maxHamming < bands, so the q126 all-pairs
  * DuckDB oracle catches any blocking recall miss (the q21/q22
  * discipline).
  *
  * Scale shape: hashing is a narrow per-row kernel (no shuffle);
  * pairing exchanges (band, 16-bit chunk, id) rows — 4 rows of ~20
  * bytes per image, never payloads.
  */
object ImageHash {

  /** 64-bit dHash of an encoded image payload, or None when the JDK
    * cannot decode it (callers keep the row with a NULL hash — a
    * mixed-modality corpus never fails the job, the
    * [[Multimodal.ImageIoDecoder]] rationale). Deterministic: grid
    * pooling is integer arithmetic over Rec.601 luma, ties (equal
    * neighbor means) are 0 bits.
    */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    val img = Multimodal.readImageBounded(bytes)
    if (img == null || img.getWidth == 0 || img.getHeight == 0) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = new Array[Double](72) // 8 rows × 9 cols
      val counts = new Array[Int](72)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        val rIdx = math.min(7, y * 8 / h) * 9
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val lum = ((rgb >> 16) & 0xff) * 0.299 +
            ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114
          val cell = rIdx + math.min(8, x * 9 / w)
          sums(cell) += lum
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      def mean(i: Int): Double = if (counts(i) > 0) sums(i) / counts(i) else 0.0
      var hash = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (mean(r * 9 + c + 1) > mean(r * 9 + c)) hash |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      Some(hash)
    }
  }

  /** (idCol, ph): 64-bit dHash per payload; NULL for NULL/undecodable
    * payloads. Narrow projection — partition sizing governs decode
    * batch memory, exactly like [[Multimodal.extractFeatures]].
    */
  def hashes(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None else dHash64(bytes)
    }
    df.select(col(idCol), f(col(payloadCol)).as("ph"))
  }

  /** Near-duplicate image pairs (id_a < id_b, hamming ≤ maxHamming)
    * over a hashed frame — the [[graft.dedup.SimHash]] banded blocking
    * (lossless recall for maxHamming < bands); NULL hashes never pair.
    */
  def nearDuplicates(
      hashed: DataFrame,
      idCol: String,
      hashCol: String = "ph",
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 200
  ): DataFrame =
    graft.dedup.SimHash.pairsOfFingerprints(
      hashed.filter(col(hashCol).isNotNull),
      idCol, hashCol, maxHamming, bands, maxBucketSize)
}
