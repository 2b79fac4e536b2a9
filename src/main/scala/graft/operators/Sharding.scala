package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-output sharding — the last step of a curation
  * pipeline: write the final mixture as `numShards` balanced, internally
  * pre-shuffled files that any trainer can stream without a shuffle of its
  * own.
  *
  * Shard identity is pure key content (60-bit md5 prefix mod K): the same
  * document lands in the same shard on any engine, any partitioning, any
  * rerun — so incremental re-curation only rewrites shards whose membership
  * actually changed, and ablations compare shard-for-shard.
  *
  * Scale shape: the assignment is a narrow codegen'd expression (no
  * shuffle); [[layoutByShard]] adds exactly ONE hash-partition exchange
  * (md5 keys are uniform, so shards are balanced within binomial noise —
  * no skew mitigation needed) and a within-partition sort by the row hash,
  * which gives every shard a deterministic pseudo-random internal order —
  * trainers read pre-shuffled data with zero additional passes.
  */
object Sharding {

  /** Shard id in [0, numShards) from key content only. */
  def shardId(keyCols: Seq[Column], numShards: Int): Column = {
    require(numShards > 0, "numShards must be positive")
    conv(substring(Sampling.keyHash(keyCols), 1, 15), 16, 10)
      .cast("long") % numShards
  }

  /** Attach the deterministic `shard` column (narrow, no shuffle). */
  def assignShards(df: DataFrame, keyCols: Seq[String], numShards: Int): DataFrame =
    df.withColumn("shard", shardId(keyCols.map(col), numShards))

  /** One exchange: co-locate each shard's rows (a shard is never split
    * across task partitions — hash partitioning may pack several shards
    * into one task, which `.write.partitionBy("shard")` then splits into
    * per-shard files) and order rows by their own md5 hash — deterministic
    * pre-shuffled shard files with zero additional passes.
    */
  def layoutByShard(df: DataFrame, keyCols: Seq[String], numShards: Int): DataFrame = {
    // materialize the key hash ONCE: shard id and the within-shard sort
    // both derive from it, and md5 over the key columns is the expensive
    // part of this narrow stage
    val h = substring(Sampling.keyHash(keyCols.map(col)), 1, 15)
    df.withColumn("__kh", h)
      .withColumn("shard", conv(col("__kh"), 16, 10).cast("long") % numShards)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__kh"))
      .drop("__kh")
  }

  /** Per-shard balance report: row count plus an optional weight sum (e.g.
    * tokens/bytes) — the check that shards are trainer-ready.
    */
  def shardSummary(
      df: DataFrame,
      keyCols: Seq[String],
      numShards: Int,
      weightCol: Option[String] = None
  ): DataFrame = {
    val assigned = assignShards(df, keyCols, numShards)
    val aggs = count(lit(1)).as("n_rows") +:
      weightCol.map(w => sum(col(w).cast("long")).as("weight")).toSeq
    assigned.groupBy("shard").agg(aggs.head, aggs.tail: _*)
  }
}
