package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair/edge list — the step that turns
  * near-duplicate PAIRS into duplicate CLUSTERS (keep one representative
  * per component).
  *
  * Algorithm: iterative min-label propagation. Each round every node takes
  * the minimum label among itself and its neighbors; converges in
  * O(component diameter) rounds. Near-dup graphs have tiny diameters
  * (duplicates of a document link to each other), so this typically
  * finishes in 3-5 rounds even at corpus scale.
  *
  * Scale notes: each round is one shuffle (join on node + groupBy);
  * `localCheckpoint` cuts the lineage every round so plans don't grow
  * exponentially; convergence is detected with a changed-label count.
  */
object ConnectedComponents {

  /** @param edges DataFrame with columns (src, dst) — undirected.
    * @return (node, component) where component = min node id reachable.
    */
  def labelPropagation(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialized once: every round joins against it, and without the
    // checkpoint each iteration would re-scan + re-distinct the edge source
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbor minimum per node, then min with own label
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("component")).as("nbr_min"))
      val updated = labels.join(neighborMin, Seq("node"), "left")
        .select(
          col("node"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"),
          (col("nbr_min") < col("component")).as("__changed")
        )
        .localCheckpoint()
      val changed = updated.filter(col("__changed")).limit(1).count()
      labels = updated.drop("__changed")
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Cluster summary: representative (min id) + member count per component. */
  def clusters(edges: DataFrame, maxIter: Int = 20): DataFrame =
    labelPropagation(edges, maxIter)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"))
}
