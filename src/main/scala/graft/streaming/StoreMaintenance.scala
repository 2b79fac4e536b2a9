package graft.streaming

import org.apache.spark.sql.SparkSession

/** Maintenance for the versioned sketch/dedup stores the streaming folds
  * write (`v=<batchId>` dirs: HLL/CMS/quantile profiles, gram and line
  * stores): every fold rewrites the FULL merged state into a new
  * version — which is what makes crash replay deterministic — so a
  * long-running stream accumulates one complete state copy per batch.
  * At 100 TB that is the classic small-files/unbounded-history problem;
  * pruning old versions loses only time-travel, never data, because the
  * newest version is self-contained by construction.
  *
  * Pruning keeps a safety margin (`keepLast` ≥ 2 recommended): the fold
  * reads the latest version STRICTLY BELOW the current batch id, so a
  * replayed batch N needs its predecessor version to still exist —
  * never prune to fewer than the deepest replay you expect.
  */
object StoreMaintenance {

  /** Version ids present under `storePath`, ascending. */
  def versions(spark: SparkSession, storePath: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .sorted
  }

  /** Delete all but the newest `keepLast` versions; returns the pruned
    * ids. Idempotent; a concurrent writer adding NEWER versions is safe
    * (only ids below the keep set are touched).
    */
  def pruneVersions(spark: SparkSession, storePath: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val vs = versions(spark, storePath)
    val doomed = vs.dropRight(keepLast)
    val base = new org.apache.hadoop.fs.Path(storePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$storePath/v=$v"), true)
    }
    doomed
  }
}
