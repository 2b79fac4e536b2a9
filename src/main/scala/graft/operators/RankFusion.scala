package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  * combine N retrieval rankings over a shared id space by
  * `score(d) = Σ_lists 1 / (k + rank_list(d))`, summing only over lists
  * where the document appears. The canonical hybrid-retrieval combiner —
  * lexical [[graft.text.Bm25]] ranks fused with dense ANN cosine ranks
  * ([[graft.similarity.Knn]]) — because it needs no score calibration
  * across heterogeneous retrievers, only ranks.
  *
  * Scale shape: inputs are RANK LISTS (top-n per retriever), so every
  * join here is list-sized — bounded by Σ topN — never corpus-sized; the
  * expensive corpus work already happened inside each retriever. The
  * fused score is a fixed left-to-right fold of `1.0/(k + rank)` terms
  * (integer ranks, one IEEE division and additions in declared list
  * order), so it is bit-reproducible across engines — no unordered SUM.
  */
object RankFusion {

  val DefaultRrfK = 60

  /** Fuse rank lists into (idCol, rrf DOUBLE), one row per id appearing
    * in ≥1 list, unsorted (callers rank by `rrf DESC, id` and cut top-k).
    *
    * @param rankings each a DataFrame with `idCol` and `rankCol`
    *   (1-based, unique per list — enforced only as a doc contract; ties
    *   would double-count)
    * @param rrfK the damping constant k (60 in the RRF paper)
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      rrfK: Int = DefaultRrfK
  ): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val slim = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol), col(rankCol).as(s"__rank$i"))
    }
    val joined = slim.reduceLeft((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings.indices
      .map(i => coalesce(lit(1.0) / (lit(rrfK) + col(s"__rank$i")), lit(0.0)))
      .reduceLeft(_ + _)
    joined.select(col(idCol), score.as("rrf"))
  }
}
