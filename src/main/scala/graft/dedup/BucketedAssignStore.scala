package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed, per-bucket-versioned (node, component) assignment store
  * — [[BucketedSpanStore]]'s sibling for STREAMING/incremental duplicate
  * clustering: each fold runs [[ConnectedComponents.incrementalResolve]]
  * against the current assignment and rewrites ONLY buckets holding a
  * component the batch touched (or created).
  *
  * Layout: `path/bucket=<b>/v=<version>/`, bucket = md5(component) mod K
  * — bucketing by COMPONENT id means a re-solved component's rows are
  * confined to the (few) buckets its old/new ids hash to, so the write
  * side is O(touched members), never O(corpus). The read side of a fold
  * scans the slim (node, component) index once to find batch nodes'
  * components — two 8-byte columns, the cheapest possible full pass; a
  * node-keyed secondary index would trade that scan for double writes
  * (documented trade, not taken).
  *
  * Versions are per bucket and keyed by the fold's id, so crash-replay is
  * idempotent exactly like [[BucketedSpanStore]]: a replayed fold rebuilds
  * from each bucket's latest version BELOW its own id and overwrites its
  * own output; superseded versions are deleted with one prior kept.
  */
final class BucketedAssignStore(path: String, numBuckets: Int)
    extends Serializable {
  require(numBuckets > 0, "numBuckets must be positive")

  import BucketedAssignStore.bucketOf

  /** Latest assignment strictly below `belowVersion`; None for a fresh
    * store.
    */
  def load(spark: SparkSession, belowVersion: Long = Long.MaxValue): Option[DataFrame] = {
    val dirs = VersionedBuckets.latestDirs(
      VersionedBuckets.bucketVersions(spark, path), path, belowVersion)
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", path).parquet(dirs: _*)
      .select("node", "component"))
  }

  /** Fold a batch of (src, dst) edges into the assignment at `version`
    * (monotone across folds; same-version replay is idempotent).
    * Result semantics == [[ConnectedComponents.labelPropagation]] over
    * all edges ever folded (spec-asserted).
    *
    * I/O shape per fold: ONE bucket-directory listing, ONE pass over the
    * slim (node, component) index (persisted and shared by the resolve
    * joins and the affected-bucket rewrite), bucket-pruned writes.
    */
  def merge(newEdges: DataFrame, version: Long, maxIter: Int = 20): Unit = {
    val spark = newEdges.sparkSession
    // single listing serves the load, the write set and retention
    val vmap = VersionedBuckets.bucketVersions(spark, path)
    val priorDirs = VersionedBuckets.latestDirs(vmap, path, version)
    val assign = (
      if (priorDirs.isEmpty) {
        import spark.implicits._
        Seq.empty[(Long, Long)].toDF("node", "component")
      } else
        spark.read.option("basePath", path).parquet(priorDirs: _*)
          .select("node", "component")
    ).persist()
    try {
      val (touchedComps0, resolved0) =
        ConnectedComponents.incrementalResolve(assign, newEdges, maxIter)
      val touchedComps = touchedComps0.persist() // batch-bounded
      try {
        // resolved is a checkpointed frame (labelPropagation materializes)
        val resolved = resolved0
          .withColumn("bucket", bucketOf(col("component"), numBuckets))
        // buckets needing a rewrite: where touched components' rows LIVE
        // now (their old bucket) and where re-solved rows LAND
        val affected = touchedComps
          .select(bucketOf(col("component"), numBuckets).as("bucket"))
          .unionByName(resolved.select("bucket"))
          .distinct().collect().map(_.getLong(0)).sorted // ≤ numBuckets ids
        if (affected.nonEmpty) {
          val affectedCol = affected.toSeq
          // prior content of affected buckets minus re-solved rows —
          // derived from the PERSISTED assign, not a second store read
          val prior = assign
            .withColumn("bucket", bucketOf(col("component"), numBuckets))
            .filter(col("bucket").isin(affectedCol: _*))
            .join(broadcast(touchedComps), Seq("component"), "left_anti")
          val content = prior.select("node", "component", "bucket")
            .unionByName(resolved.select("node", "component", "bucket"))
            .withColumn("v", lit(version))
            .persist()
          val populated = try {
            content.repartition(col("bucket"))
              .write
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("bucket", "v")
              .mode("overwrite")
              .parquet(path)
            // an affected bucket can end up EMPTY (a merged-away
            // component's rows all moved to another bucket) — dynamic
            // overwrite writes no partition for it, which would leave its
            // stale prior version live. Write an explicit empty v=version
            // dir so the bucket's latest version advances past it.
            content.select("bucket").distinct()
              .collect().map(_.getLong(0)).toSet
          } finally content.unpersist(blocking = false)
          affected.filterNot(populated.contains).foreach { b =>
            resolved.limit(0).select("node", "component")
              .write.mode("overwrite").parquet(s"$path/bucket=$b/v=$version")
          }
          // retention from the fold's one pre-write listing
          VersionedBuckets.retain(spark, path, vmap, affected, version)
        }
      } finally { touchedComps.unpersist(blocking = false); () }
    } finally { assign.unpersist(blocking = false); () }
  }
}

object BucketedAssignStore {
  /** Store bucket for a component id — literally
    * [[graft.operators.Sharding.shardId]], so the md5-mod-K layout has
    * ONE definition (component ids are non-null longs, for which the
    * shardId null-token coalesce is a no-op).
    */
  def bucketOf(component: Column, numBuckets: Int): Column =
    graft.operators.Sharding.shardId(Seq(component), numBuckets)
}
