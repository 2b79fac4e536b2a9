package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the manual form of a runtime join filter.
  *
  * The 100 TB problem it solves: a fact⋈dim equi-join where the dim side is
  * too big to broadcast-hash-join (tens of millions of keys) still shuffles
  * the ENTIRE fact table, even when only a sliver of fact rows have a
  * partner. A Bloom filter of the dim keys is small enough to broadcast
  * (~1.2 MB per million keys at 1% fpp), and filtering the fact side
  * against it BEFORE the exchange turns a full-table shuffle into a
  * matching-sliver shuffle. False positives only cost wasted shuffle rows —
  * the join itself re-verifies, so results are exactly the plain join's.
  *
  * Mechanics: keys are collapsed to a 64-bit `xxhash64` (codegen'd, no
  * UDF on the wide path), the bit array is built by a typed [[Aggregator]]
  * with map-side partial merge (partials are bit-ORed, so the exchange
  * carries one bit array per partition, never keys), and the probe is a
  * broadcast bit-test on the same hash. Kirsch–Mitzenmacher double hashing
  * derives the k probe positions from the two 32-bit halves of the hash.
  */
object BloomPrune {

  /** Optimal Bloom geometry for `expectedItems` at `fpp`. */
  def geometry(expectedItems: Long, fpp: Double): (Int, Int) = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp out of range: $fpp")
    val ln2 = math.log(2)
    val m = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    val numBits = math.min(m.max(64), Int.MaxValue.toLong / 2).toInt
    val k = math.max(1, math.round(numBits.toDouble / expectedItems * ln2).toInt)
    (numBits, k)
  }

  private def probeBit(bits: Array[Long], idx: Int): Boolean =
    (bits(idx >>> 6) & (1L << (idx & 63))) != 0

  private def setBit(bits: Array[Long], idx: Int): Unit =
    bits(idx >>> 6) |= (1L << (idx & 63))

  /** k bit positions from one 64-bit hash (Kirsch–Mitzenmacher). */
  private def positions(h: Long, k: Int, numBits: Int): Iterator[Int] = {
    val h1 = h.toInt
    val h2 = (h >>> 32).toInt | 1 // odd increment: full period mod 2^32
    Iterator.tabulate(k)(i => math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt)
  }

  /** Typed aggregate building the bit array; partials OR together, so the
    * build is one narrow pass over the dim keys plus a bit-array-sized
    * exchange (independent of key count).
    */
  private final class BloomAgg(numBits: Int, k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
    override def zero: Array[Long] = new Array[Long]((numBits + 63) >>> 6)
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      positions(h, k, numBits).foreach(setBit(b, _)); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The built filter: geometry + bits. `mightContain` is the driver-side
    * probe (spec/debug); the distributed probe is [[prune]].
    */
  final case class Bloom(numBits: Int, k: Int, bits: Array[Long]) {
    def mightContain(h: Long): Boolean = positions(h, k, numBits).forall(probeBit(bits, _))
    def sizeBytes: Int = bits.length * 8
  }

  /** One job over the dim side: hash the join key columns, fold into bits.
    * `expectedItems` sizes the filter — pass the dim's (approximate) key
    * count; an underestimate only raises the false-positive rate, never
    * breaks correctness.
    */
  def build(dim: DataFrame, keyCols: Seq[String], expectedItems: Long, fpp: Double = 0.01): Bloom = {
    val (numBits, k) = geometry(expectedItems, fpp)
    val bits = dim
      .select(xxhash64(keyCols.map(col): _*).as("h"))
      .agg(udaf(new BloomAgg(numBits, k)).apply(col("h")).as("bloom"))
      .head().getAs[scala.collection.Seq[Long]]("bloom").toArray
    Bloom(numBits, k, bits)
  }

  /** Filter `fact` to rows whose key MIGHT be in the filter. The bit array
    * ships to executors as a broadcast variable (not a task-closure copy);
    * the probe input is the codegen'd xxhash64 of the key columns, so the
    * only interpreted work per row is k bit tests.
    */
  def prune(fact: DataFrame, keyCols: Seq[String], bloom: Bloom): DataFrame = {
    val bc = fact.sparkSession.sparkContext.broadcast(bloom.bits)
    val numBits = bloom.numBits
    val k = bloom.k
    val test = udf { (h: Long) =>
      val bits = bc.value
      var i = 0
      var ok = true
      val h1 = h.toInt
      val h2 = (h >>> 32).toInt | 1
      while (ok && i < k) {
        val idx = math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
        ok = (bits(idx >>> 6) & (1L << (idx & 63))) != 0
        i += 1
      }
      ok
    }
    fact.filter(test(xxhash64(keyCols.map(col): _*)))
  }

  /** Equi-join with the fact side Bloom-pruned first. Result is EXACTLY
    * `fact.join(dim, keys)` — false positives are eliminated by the join —
    * but the fact-side exchange only carries rows that pass the filter.
    * Builds the filter eagerly (one job on the dim side), like Spark's own
    * runtime-filter planning would.
    */
  def prunedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKeys: Seq[String],
      dimKeys: Seq[String],
      expectedItems: Long,
      fpp: Double = 0.01
  ): DataFrame = {
    require(factKeys.length == dimKeys.length && factKeys.nonEmpty, "key lists must align")
    val bloom = build(dim, dimKeys, expectedItems, fpp)
    val pruned = prune(fact, factKeys, bloom)
    val cond = factKeys.zip(dimKeys)
      .map { case (f, d) => pruned(f) === dim(d) }
      .reduce(_ && _)
    pruned.join(dim, cond)
  }
}
