package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cheap reconciliation of two huge tables: instead of joining 100 TB
  * against 100 TB to find what changed ([[CompareDataFrames]] — exact but
  * both sides shuffle), each side reduces to one digest row per key-range
  * bucket and only the DIGESTS are compared. Mismatched buckets localize
  * the differences; a targeted [[CompareDataFrames]] over those ranges
  * (partition-pruned on both sides) finishes the job. Sync cost becomes
  * O(buckets) rows exchanged, not O(rows).
  *
  * The per-bucket digest is `bit_xor` of a 60-bit md5 row hash — an
  * order- and partitioning-independent reduction built from the same
  * engine-portable [[Sampling.keyHash]], so either side of the
  * reconciliation can be computed by ANY engine (Spark here, DuckDB/Trino
  * at the other end) and the digests still agree.
  */
object Reconcile {

  /** 60-bit engine-portable row hash over the given columns. */
  private def rowHash(cols: Seq[Column]): Column =
    conv(substring(Sampling.keyHash(cols), 1, 15), 16, 10).cast("long")

  /** One digest row per bucket: (bucket, n_rows, digest). `bucketCol`
    * should spread rows evenly (e.g. `pk div 1000`); every row's full
    * content participates via `hashCols`. Fully partial-aggregatable —
    * the shuffle carries one (count, xor) pair per bucket per task.
    */
  def digests(df: DataFrame, bucketCol: Column, hashCols: Seq[Column]): DataFrame =
    df.select(bucketCol.as("bucket"), rowHash(hashCols).as("__h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("digest"))

  /** Buckets whose (count, digest) differ between the two sides — the
    * ranges a targeted re-sync must touch. Digest frames are tiny; the
    * join is broadcast either way.
    */
  def mismatchedBuckets(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("bucket"), col("n_rows").as("n_a"), col("digest").as("digest_a"))
    val r = b.select(col("bucket"), col("n_rows").as("n_b"), col("digest").as("digest_b"))
    l.join(r, Seq("bucket"), "full_outer")
      .filter(
        !(col("n_a") <=> col("n_b")) || !(col("digest_a") <=> col("digest_b")))
      .select("bucket", "n_a", "n_b", "digest_a", "digest_b")
  }

  /** The drill-down that finishes the reconciliation: both sides are
    * pruned to the mismatched buckets (broadcast left-semi against the
    * tiny bucket list — when the bucket derives from a partition column
    * this is partition pruning, otherwise a map-side filter; either way
    * the exact compare join only ever sees the differing slivers) and an
    * exact [[CompareDataFrames]] classifies every divergent row.
    *
    * digests → mismatchedBuckets → repair is the full sync pipeline:
    * O(buckets) exchanged to localize, O(differing sliver) to resolve —
    * never O(table) joined against O(table).
    */
  def repair(
      a: DataFrame,
      bucketA: Column,
      b: DataFrame,
      bucketB: Column,
      keyColumns: Seq[String],
      mismatched: DataFrame
  ): CompareDataFrames.Compared = {
    val buckets = broadcast(mismatched.select(col("bucket").as("__mb")).distinct())
    def slice(df: DataFrame, bucket: Column): DataFrame =
      df.join(buckets, bucket === col("__mb"), "left_semi")
    CompareDataFrames(slice(a, bucketA), slice(b, bucketB), keyColumns)
  }
}
