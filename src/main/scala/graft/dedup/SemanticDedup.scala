package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.Knn

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540 — public): near-duplicates in EMBEDDING space are
  * found only WITHIN k-means cells, so the quadratic pair search is
  * bounded by cell size instead of corpus size. The reference corpus
  * (/root/reference/bdq) has no semantic-dedup surface; this is part of
  * the LLM-pipeline extension set (SURVEY §2.3).
  *
  * Scale contract (100 TB): the corpus shuffles ONCE, hashed on `cell`;
  * pair generation is a per-cell self-join whose cost is Σ|cell|² — the
  * operator inherits SemDeDup's own scaling rule that nlist must grow
  * with the corpus (the paper uses 11k clusters for 1.3B examples;
  * sqrt(n) is a reasonable default). Duplicate PAIRS are tiny relative
  * to the corpus, so the component solve rides
  * [[ConnectedComponents.labelPropagation]]'s driver-local fast path at
  * micro-batch scale and its O(log diameter) distributed loop beyond it.
  * A pathologically hot cell (mass near-duplication of one template) is
  * the same skew class as a hot join key — raise nlist, or pre-thin with
  * exact/minhash dedup, both standard SemDeDup practice.
  */
object SemanticDedup {

  /** Within-cell duplicate pairs: (id_a, id_b, cos) with id_a < id_b and
    * cosine(v_a, v_b) >= tau. `assigned` is (id, v, cell) — the output of
    * [[Knn.assignCells]] against a prebuilt index; cell < 0 is that
    * method's NULL-embedding sentinel and never pairs.
    */
  def duplicatePairs(assigned: DataFrame, tau: Double): DataFrame = {
    val a = assigned.filter(col("cell") >= 0)
    val left = a.select(col("cell"), col("id").as("id_a"), col("v").as("va"))
    val right = a.select(col("cell"), col("id").as("id_b"), col("v").as("vb"))
    left.join(right, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Knn.cosine(col("va"), col("vb")))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Full SemDeDup pass: duplicate pairs → connected components → one
    * representative per duplicate group. Returns (id, component, keep)
    * for EVERY input row: component = min id reachable through the
    * duplicate graph (own id for singletons), keep = (id == component) —
    * the deterministic min-id representative policy (the paper's
    * keep-farthest-from-centroid variant trades determinism for a small
    * quality gain; min-id keeps the gate engine-replayable).
    *
    * The survivors join keys on id and is AQE-sized: component rows are
    * bounded by the docs that appear in any duplicate pair, usually a
    * small corpus fraction, so the join broadcasts in practice but
    * degrades safely to a hash join under mass duplication.
    */
  def semDedup(assigned: DataFrame, tau: Double, maxIter: Int = 20): DataFrame = {
    val pairs = duplicatePairs(assigned, tau)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comps = ConnectedComponents.labelPropagation(pairs, maxIter)
      .withColumnRenamed("node", "id")
    assigned.select(col("id"))
      .join(comps, Seq("id"), "left")
      .withColumn("component", coalesce(col("component"), col("id")))
      .withColumn("keep", col("component") === col("id"))
  }
}
