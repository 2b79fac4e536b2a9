package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic PageRank (Brin & Page 1998) in exact integer
  * arithmetic — the graph-centrality scorer web-curation pipelines use
  * for domain authority (Common Crawl publishes harmonic-centrality /
  * PageRank host rankings; a "rank the hosts, keep the authoritative
  * tail" step sits next to the blocklist filter in
  * [[graft.text.Urls]]-based funnels).
  *
  * Why integer: float PageRank sums partial contributions in
  * shuffle-arrival order, so two runs of the same job can disagree in
  * the last ulp — unacceptable under this repo's hash-equality gates
  * (q132 replays every iteration in DuckDB). Ranks are scaled longs
  * (`scale` = 1.0); per-edge contributions use truncating integer
  * division (all values non-negative, so trunc == floor on both
  * engines); integer sums are associative, so the result is
  * bit-identical regardless of partitioning. The floor loses < 1 unit
  * per in-edge per iteration — at scale 10^6 that is < 10^-6 · indeg
  * of absolute rank, noise for ranking purposes but EXACTLY the same
  * noise on every engine.
  *
  * Scale shape: each iteration is one shuffle-join of the rank frame
  * (N rows) with the edge frame (E rows) on `src` plus one aggregation
  * on `dst` — O(E) exchanged per iteration, the textbook distributed
  * formulation. Degrees are precomputed once. The edge frame is reused
  * every iteration, so callers at 100 TB should cache/bucket it by
  * `src` (one co-partitioned layout serves all iterations); the rank
  * frame is N rows, never wider than (node, long).
  *
  * Dangling nodes (no out-edges) keep their damped base share and
  * simply do not redistribute — the "drop dangling mass" variant;
  * documented, deterministic, and replayed identically by the oracle.
  */
object PageRank {

  val DefaultScale: Long = 1000000L

  /** Iterate PageRank over directed `edges(src, dst)` (duplicates
    * ignored). Returns (node, r) with r the scaled integer rank after
    * `iters` iterations from a uniform `scale` start; damping 85/100.
    *
    * Node set = src ∪ dst. Overflow guard: ranks are bounded by
    * N·scale; callers with N·scale ≥ 2^62/100 must lower `scale`
    * (fail-fast is on the multiply below via Spark's ANSI-off wrap —
    * so the bound is asserted here instead).
    */
  def ranks(
      edges: DataFrame,
      iters: Int = 5,
      scale: Long = DefaultScale,
      dampNum: Long = 85L,
      dampDen: Long = 100L
  ): DataFrame = {
    require(iters >= 0 && iters <= 50, s"iters out of range: $iters")
    require(scale > 0 && dampNum > 0 && dampDen >= dampNum,
      s"bad damping/scale: $dampNum/$dampDen @ $scale")
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val base = (scale * (dampDen - dampNum)) / dampDen
    var rank = nodes.withColumn("r", lit(scale))
    for (_ <- 0 until iters) {
      val contribs = e
        .join(rank.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"),
          expr(s"(r * $dampNum) div ($dampDen * outdeg)").as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("inflow"))
      rank = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("r"))
    }
    rank
  }

  /** Host-authority convenience: rank the distinct (src_host, dst_host)
    * link graph, symmetrized (a link is evidence about both endpoints —
    * the undirected-authority variant curation funnels use when crawl
    * link direction is noisy).
    */
  def hostAuthority(links: DataFrame, iters: Int = 5, scale: Long = DefaultScale): DataFrame = {
    val e = links.select(col("src"), col("dst"))
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    ranks(sym, iters, scale)
  }
}

/** Triangle counting over an undirected graph — the standard
  * compact-forward / node-ordering formulation (each triangle counted
  * once via a < b < c). The density diagnostic for near-dup graphs: a
  * healthy dedup pair set is near-forest (few triangles); a triangle
  * explosion means a boilerplate template is pairing everything with
  * everything and the downstream connected-components pass will produce
  * a giant component — cheaper to detect here than after clustering.
  *
  * Scale shape: edges canonicalize to a < b (dedup + self-loop drop),
  * then ONE self-join on the shared middle node b builds wedges
  * (a<b<c) and a second join closes them against the edge set — the
  * exchanged mass is O(Σ deg(b)²) wedges, the algorithm's inherent
  * cost; per-node counts fold from the closed triangles.
  */
object Triangles {

  /** Canonical undirected edge set: (a, b) with a < b as strings. */
  private def canon(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("string").as("s"), col("dst").cast("string").as("d"))
      .filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"), greatest(col("s"), col("d")).as("b"))
      .distinct()

  /** All triangles as (a, b, c) with a < b < c, each exactly once. */
  def triangles(edges: DataFrame): DataFrame = {
    val e = canon(edges)
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
    wedges.join(e.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .select(col("a"), col("b"), col("c"))
  }

  /** (node, n_triangles) for every node in at least one triangle, plus
    * the global count via `triangles().count()` if needed.
    */
  def perNode(edges: DataFrame): DataFrame =
    triangles(edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
}
