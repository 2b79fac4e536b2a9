package graft.plans

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (beam walks, label
  * propagation, pair-merge rounds): the per-round plan references the
  * previous round's frame, so without truncation the logical tree — and
  * even its STRING rendering — grows exponentially (the driver OOM found
  * in the round-9 layered-descent work).
  */
object Lineage {

  /** Truncate a frame's lineage, eagerly materializing it.
    *
    * With a configured checkpoint dir (`sparkContext.setCheckpointDir`)
    * this is a RELIABLE checkpoint: blocks live on the cluster's fault-
    * tolerant store, so executor loss / dynamic deallocation recomputes
    * nothing and long multi-hop searches survive on a real cluster.
    * Without one (local[n], tests, gate runs) it falls back to
    * `localCheckpoint` — executor-local, non-fault-tolerant blocks: fine
    * single-JVM, but a cluster deployment running iterative searches
    * should set a checkpoint dir.
    */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
