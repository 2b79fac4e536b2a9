package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate: union of minhash signatures = element-wise min.
  * The signature of a UNION of sets is exactly the element-wise min of the
  * member signatures — so a cluster/partition/day-level signature
  * aggregates associatively with map-side partial merge (this is why
  * minhash composes at 100 TB: signatures fold like sums).
  *
  * Usage: `df.groupBy("cluster").agg(MinHashUnion.column(col("sig")))` or
  * register `udaf` for SQL.
  */
object MinHashUnion extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] =
    if (sig == null) buf
    else if (buf.isEmpty) sig.toArray
    else {
      var i = 0
      val n = math.min(buf.length, sig.length)
      while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
      buf
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** Column form for DataFrame aggregations. */
  def column(sig: Column): Column = udaf(MinHashUnion).apply(sig)

  /** Estimated jaccard between two (union-level) signatures. */
  def estimatedJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val n = math.min(a.length, b.length)
    if (n == 0) 0.0
    else {
      var eq = 0; var i = 0
      while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
      eq.toDouble / n
    }
  }
}
