package graft.sources

import org.apache.spark.sql.DataFrame

/** Physical-layout helpers.
  *
  * CPU-heavy NARROW stages (fingerprinting, signature computation) run at
  * the scan's split count: Spark never re-splits a stage that has no
  * exchange. A low-split input — few files, single-row-group parquet, a
  * small union — therefore serializes the expensive pass onto a handful of
  * cores while the rest of the cluster idles.
  */
object Layout {

  /** Round-robin repartition to the cluster's parallelism, ONLY when the
    * input has fewer splits — on a healthy many-split source this is a
    * plan no-op (no exchange added). Use directly upstream of a
    * CPU-dominated narrow stage whose per-row cost dwarfs one row copy
    * (minhash signatures: ~10⁴ hash ops/row vs one ~KB shuffle write).
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
