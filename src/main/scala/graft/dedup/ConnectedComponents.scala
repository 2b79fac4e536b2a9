package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair/edge list — the step that turns
  * near-duplicate PAIRS into duplicate CLUSTERS (keep one representative
  * per component).
  *
  * Algorithm: iterative min-label propagation with POINTER JUMPING: each
  * round every node takes the minimum label among itself and its
  * neighbors, then shortcuts to its label's label (label ids are node
  * ids, so the mapping composes with itself). The jump halves the
  * effective distance to the component minimum every round, so
  * convergence is O(log diameter) — a 1000-link adversarial chain
  * converges in ~10 rounds, not 1000 — while duplicate clusters (tiny
  * diameter) still finish in 2-3 rounds. Same idea as the star-contraction
  * family (large-star/small-star); the jump composes with the neighbor-min
  * step instead of rewriting the edge set.
  *
  * Correctness: a node's label is always the id of some node REACHABLE
  * from it (neighbor-min picks a neighbor's label; the jump picks a label
  * reachable from the labelled node), labels only decrease, and the
  * minimum reachable id is a fixpoint — so the fixpoint is exactly
  * component = min reachable node.
  *
  * Scale notes: each round is two shuffled joins + one aggregation;
  * `localCheckpoint` cuts the lineage every round so plans don't grow
  * exponentially; convergence is detected with a changed-label metric
  * OBSERVED during the checkpoint's own materialization job
  * (`Dataset.observe`) — one Spark job per round, where a separate
  * changed-count probe would double the per-round scheduling latency
  * that dominates small-round iterative queries.
  */
object ConnectedComponents {

  /** Frees the executor blocks behind a `localCheckpoint`ed DataFrame.
    * `Dataset.unpersist()` cannot do this — checkpoint data lives as RDD
    * storage blocks (not CacheManager entries), so without an explicit
    * RDD-level unpersist every round's blocks linger until GC.
    */
  private[graft] def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** @param edges DataFrame with columns (src, dst) — undirected.
    * @param localEdgeThreshold edge sets at most this large are solved by
    *        ONE driver union-find instead of the iterative distributed
    *        propagation (0 disables). Near-dup edge sets are tiny relative
    *        to the corpus they came from — blocking emits pairs, not rows —
    *        so at micro-batch and per-query scale the O(log diameter)
    *        round chain is pure scheduling latency; the probe pays one
    *        incremental `limit(n+1).collect()` (CollectLimit stops after
    *        the first partitions when the set is huge) and falls back.
    * @return (node, component) where component = min node id reachable.
    *         Distributed results are materialized (checkpointed); local
    *         ones are a LocalRelation — deterministic and free to branch.
    */
  def labelPropagation(
      edges: DataFrame,
      maxIter: Int = 20,
      localEdgeThreshold: Int = 1 << 20
  ): DataFrame =
    localLabelPropagation(edges, localEdgeThreshold)
      .getOrElse(distributedLabelPropagation(edges, maxIter))

  /** Driver union-find twin of the propagation loop: same fixpoint
    * (component = min reachable node id), zero Spark jobs after the edge
    * collect. Bails (None) on oversized edge sets, non-long id columns,
    * or NULL endpoints — the distributed loop is the semantics owner.
    */
  private def localLabelPropagation(
      edges: DataFrame,
      localEdgeThreshold: Int
  ): Option[DataFrame] = {
    import org.apache.spark.sql.types.LongType
    val longIds = Seq(edges.schema.fields.find(_.name == "src"),
        edges.schema.fields.find(_.name == "dst"))
      .forall(_.exists(_.dataType == LongType))
    if (localEdgeThreshold <= 0 || !longIds) return None
    val spark = edges.sparkSession
    import spark.implicits._
    val rows = edges.select(col("src"), col("dst"))
      .limit(localEdgeThreshold + 1).collect()
    if (rows.length > localEdgeThreshold) return None
    if (rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) return None
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    rows.foreach { r =>
      val a = r.getLong(0); val b = r.getLong(1)
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    Some(parent.keys.toSeq.map(k => (k, find(k))).toDF("node", "component"))
  }

  private def distributedLabelPropagation(edges: DataFrame, maxIter: Int): DataFrame = {
    // materialized once: every round joins against it, and without the
    // checkpoint each iteration would re-scan + re-distinct the edge source
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    try {
      // ckpt = the round's materialized checkpoint (freed next round);
      // labels = the user-facing view of it
      var ckpt = sym.select(col("src").as("node")).distinct()
        .withColumn("component", col("node"))
        .localCheckpoint()
      var labels = ckpt
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        // neighbor minimum per node, then min with own label
        val neighborMin = sym
          .join(labels.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(min(col("component")).as("nbr_min"))
        val afterNbr = labels.join(neighborMin, Seq("node"), "left")
          .select(
            col("node"),
            least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"),
            col("component").as("__old")
          )
        // pointer jump: shortcut each node to its (post-neighbor-min)
        // label's label — the exponential-convergence step. The parent map
        // is the round's materialized `labels` checkpoint (classic pointer
        // doubling composes the same generation's mapping with itself), so
        // the self-reference costs a join, not a recompute of neighborMin.
        // the convergence signal rides the checkpoint's OWN
        // materialization job via observe() — no separate probe job
        val obs = org.apache.spark.sql.Observation(s"cc_round_$iter")
        val updated = afterNbr.join(
            labels.select(col("node").as("component"), col("component").as("__parent")),
            Seq("component"), "left")
          .select(
            col("node"),
            least(col("component"), coalesce(col("__parent"), col("component"))).as("component"),
            col("__old")
          )
          .withColumn("__changed", col("component") < col("__old"))
          .drop("__old")
          .observe(obs, sum(col("__changed").cast("long")).as("n_changed"))
          .localCheckpoint() // eager: materialized here, prior round now free-able
        val changed = obs.get.get("n_changed").collect { case l: Long => l }.getOrElse(0L)
        freeLocalCheckpoint(ckpt)
        ckpt = updated
        labels = updated.drop("__changed")
        converged = changed == 0
        iter += 1
      }
      labels
    } finally freeLocalCheckpoint(sym)
  }

  /** Cluster summary: representative (min id) + member count per component. */
  def clusters(edges: DataFrame, maxIter: Int = 20): DataFrame =
    labelPropagation(edges, maxIter)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"))

  /** Cluster-SIZE histogram + duplication summary from a
    * (node, component) assignment — the one-screen dedup health read:
    * how big are the near-dup families (a fat tail = a boilerplate
    * template pairing everything), and what fraction of the corpus is
    * redundant (dup_factor = (nodes − clusters)/nodes — keeping one doc
    * per cluster removes exactly that share of the EDGE-TOUCHED corpus;
    * singletons never enter an edge list, so feed assignments that
    * include them, or read the factor as edge-touched-only — stated).
    * One row per distinct size: size, n_clusters, n_nodes (= their
    * product, exact), plus the replicated totals and the ONE pinned
    * dup_factor division. Size-cardinality output; two aggregations +
    * one all-frame window over the histogram — nothing corpus-sized
    * after the first groupBy.
    */
  def clusterSizeProfile(assign: DataFrame): DataFrame = {
    val sizes = assign.groupBy(col("component")).agg(count(lit(1)).as("size"))
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    sizes.groupBy(col("size")).agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_nodes", col("size") * col("n_clusters"))
      .withColumn("total_nodes", sum("n_nodes").over(all))
      .withColumn("total_clusters", sum("n_clusters").over(all))
      .withColumn("dup_factor",
        (col("total_nodes") - col("total_clusters")).cast("double") /
          col("total_nodes").cast("double"))
  }

  /** Dedup THRESHOLD sweep: for every candidate verification threshold,
    * the clustering that WOULD result — one summary row per threshold t
    * with the edge count, touched-node count, cluster count, and
    * duplication factor of the graph restricted to edges with
    * `distCol` ≤ t. The maxDist tuning curve read directly: where the
    * dup_factor elbow sits is where the verifier should cut.
    *
    * The thresholds are NESTED (edges at t are a subset of t+1), so the
    * whole curve is ONE incremental union-find sweep, not a clustering
    * per threshold: the pair frame collapses to per-(src, dst) MIN
    * distance (one aggregation — a pair is "in" at t iff its min dist
    * is), the distinct pairs are collected (bounded by the blocking
    * contract, same `localEdgeThreshold` bound as [[labelPropagation]]'s
    * driver path, which these gate-scale pair sets already ride) and
    * processed in ascending-dist order; every threshold's
    * (pairs, nodes, clusters) snapshot falls out of the running
    * union-find counters. Oversized pair sets fall back to one
    * [[labelPropagation]] per threshold over the SHARED checkpointed
    * min-dist frame (the blocking+verify chain is computed once, not
    * once per threshold).
    */
  def thresholdClusterSweep(
      pairs: DataFrame,
      srcCol: String,
      dstCol: String,
      distCol: String,
      thresholds: Seq[Int],
      localPairThreshold: Int = 1 << 20
  ): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val grouped = pairs
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull && col(distCol).isNotNull)
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(min(col(distCol).cast("double")).as("d"))
    localThresholdSweep(grouped, thresholds, localPairThreshold)
      .getOrElse(distributedThresholdSweep(grouped, thresholds))
  }

  /** The single-pass driver sweep over collected (src, dst, min dist)
    * rows. Bails (None) on oversized pair sets or non-long id columns —
    * the per-threshold distributed loop is the semantics owner.
    */
  private def localThresholdSweep(
      grouped: DataFrame,
      thresholds: Seq[Int],
      localPairThreshold: Int
  ): Option[DataFrame] = {
    import org.apache.spark.sql.types.LongType
    val longIds = Seq(grouped.schema.fields.find(_.name == "src"),
        grouped.schema.fields.find(_.name == "dst"))
      .forall(_.exists(_.dataType == LongType))
    if (localPairThreshold <= 0 || !longIds) return None
    val spark = grouped.sparkSession
    import spark.implicits._
    val rows = grouped.limit(localPairThreshold + 1).collect()
    if (rows.length > localPairThreshold) return None
    val edges = rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(e => (e._3, e._1, e._2))
    // incremental union-find with running node/component counters
    val parent = scala.collection.mutable.LongMap.empty[Long]
    var nNodes = 0L
    var nClusters = 0L
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def touch(x: Long): Unit =
      if (!parent.contains(x)) { parent(x) = x; nNodes += 1; nClusters += 1 }
    var i = 0
    val out = thresholds.sorted.map { t =>
      while (i < edges.length && edges(i)._3 <= t.toDouble) {
        val (s, d, _) = edges(i)
        touch(s); touch(d)
        val rs = find(s); val rd = find(d)
        if (rs != rd) {
          if (rs < rd) parent(rd) = rs else parent(rs) = rd
          nClusters -= 1
        }
        i += 1
      }
      val dup = if (nNodes > 0L) (nNodes - nClusters).toDouble / nNodes.toDouble else 0d
      (t, i.toLong, nNodes, nClusters, dup)
    }
    // ascending snapshots re-ordered to the caller's threshold order
    val byT = out.map(r => r._1 -> r).toMap
    Some(thresholds.map(byT)
      .toDF("threshold", "n_pairs", "n_nodes", "n_clusters", "dup_factor"))
  }

  /** Per-threshold fallback for pair sets too large to collect: one
    * [[labelPropagation]] per threshold, all over the ONE checkpointed
    * min-dist frame (summaries are collected eagerly — threshold-count
    * rows — so the checkpoint can be freed before returning).
    */
  private def distributedThresholdSweep(
      grouped: DataFrame,
      thresholds: Seq[Int]
  ): DataFrame = {
    val spark = grouped.sparkSession
    import spark.implicits._
    val ckpt = grouped.localCheckpoint()
    try {
      // the per-threshold clusterings are INDEPENDENT jobs over the one
      // checkpointed frame — overlap them from a small thread pool so a
      // threshold's label-propagation tail back-fills idle executors
      // (guide §2.6); results are collected per threshold and re-emitted
      // in caller order, so the overlap changes nothing downstream
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(4, thresholds.size))
      val out =
        try {
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutorService(pool)
          val futs = thresholds.map { t =>
            scala.concurrent.Future {
              val e = ckpt.filter(col("d") <= t.toDouble).select(col("src"), col("dst"))
              val s = clusters(e)
                .agg(
                  coalesce(sum("n_members"), lit(0L)).as("n_nodes"),
                  count(lit(1)).as("n_clusters"))
                .collect()(0)
              val nPairs = ckpt.filter(col("d") <= t.toDouble).count()
              val (nNodes, nClusters) = (s.getLong(0), s.getLong(1))
              val dup = if (nNodes > 0L) (nNodes - nClusters).toDouble / nNodes.toDouble else 0d
              (t, nPairs, nNodes, nClusters, dup)
            }
          }
          // a bounded wait so a wedged job cannot block the sweep forever;
          // any failure/timeout propagates after the finally reclaims the pool
          futs.map(f => scala.concurrent.Await.result(
            f, scala.concurrent.duration.Duration(1, "h")))
        } finally pool.shutdown()
      out.toDF("threshold", "n_pairs", "n_nodes", "n_clusters", "dup_factor")
    } finally freeLocalCheckpoint(ckpt)
  }

  /** Fold NEW edges into an existing (node, component) assignment without
    * re-clustering the corpus — the nightly-dedup shape (new near-dup
    * pairs arrive from [[MinHashLsh.incrementalBlockedPairs]]; clusters
    * must absorb them, including merging previously separate components).
    *
    * Only components TOUCHED by a new edge are re-solved: their members
    * are collapsed to star edges (node — old component; the old component
    * id is the component's min node id, so min-label semantics carry
    * over), unioned with the new edges, and re-run through
    * [[labelPropagation]]; every other assignment row passes through
    * UNSHUFFLED (left-anti against the touched-component set) — the same
    * closed-versions-pass-through contract as `Scd2.merge`. Nodes seen
    * only in new edges join as fresh singleton/cluster members.
    *
    * Cost: O(members of touched components + new edges) per fold, never
    * O(corpus); the touched node/component sets are batch-sized
    * (broadcast when `broadcastBatch`, the usual incremental contract).
    *
    * @param assign (node, component) from a previous [[labelPropagation]]
    *               (or this function) — component ids must be min node
    *               ids, which both produce.
    */
  def incrementalComponents(
      assign: DataFrame,
      newEdges: DataFrame,
      maxIter: Int = 20,
      broadcastBatch: Boolean = true
  ): DataFrame = {
    val (touchedComps, resolved) =
      incrementalResolve(assign, newEdges, maxIter, broadcastBatch)
    val hint: DataFrame => DataFrame =
      if (broadcastBatch) broadcast else identity
    assign.join(hint(touchedComps), Seq("component"), "left_anti")
      .select("node", "component")
      .unionByName(resolved.select("node", "component"))
  }

  /** The incremental core, exposed for sinks that materialize only the
    * CHANGED part: (old component ids touched by a batch edge, the
    * re-solved (node, component) assignment covering exactly those
    * components' members plus batch-only nodes). Rows of `assign` outside
    * the touched set are — by construction — final and untouched.
    */
  private[graft] def incrementalResolve(
      assign: DataFrame,
      newEdges: DataFrame,
      maxIter: Int = 20,
      broadcastBatch: Boolean = true,
      maxLocalEdges: Int = 1 << 20
  ): (DataFrame, DataFrame) =
    localResolve(assign, newEdges, broadcastBatch, maxLocalEdges)
      .getOrElse(distributedResolve(assign, newEdges, maxIter, broadcastBatch))

  /** Fast path for the usual incremental contract (small batch vs huge
    * assignment): the only graph that needs SOLVING is the batch edges
    * CONTRACTED over the old assignment — each endpoint replaced by its
    * old component id (itself when unassigned) — which is batch-sized by
    * construction. That graph is union-found ON THE DRIVER (bounded by
    * `maxLocalEdges`, the same batch-is-small bound the broadcast hints
    * assert; min-id roots preserve min-label semantics because old
    * component ids ARE min member ids), and the merged mapping
    * broadcast-joins back over the touched members — so a fold is ONE
    * distributed pass with no wide exchange, instead of an O(log
    * diameter) chain of pointer-jumping jobs whose per-round scheduling
    * latency dominates at micro-batch sizes. Falls back to
    * [[distributedResolve]] for oversized batches (`broadcastBatch =
    * false` or more than `maxLocalEdges` edges) and for non-long id
    * columns.
    */
  private def localResolve(
      assign: DataFrame,
      newEdges: DataFrame,
      broadcastBatch: Boolean,
      maxLocalEdges: Int
  ): Option[(DataFrame, DataFrame)] = {
    import org.apache.spark.sql.types.LongType
    val longIds = Seq(assign.schema.fields.find(_.name == "node"),
        assign.schema.fields.find(_.name == "component"),
        newEdges.schema.fields.find(_.name == "src"),
        newEdges.schema.fields.find(_.name == "dst"))
      .forall(_.exists(_.dataType == LongType))
    if (!broadcastBatch || !longIds) return None
    val spark = assign.sparkSession
    import spark.implicits._
    val rows = newEdges.select(col("src"), col("dst"))
      .limit(maxLocalEdges + 1).collect()
    // NULL endpoints: bail to the distributed path (same guard as
    // localLabelPropagation — null join keys are tolerated there, while
    // getLong on a null primitive would NPE here)
    if (rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) return None
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    if (pairs.length > maxLocalEdges) return None
    val endpoints = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
    // old component per batch endpoint — the ONLY assignment rows read
    // eagerly, bounded by 2·|batch|
    val endpointAssign = assign
      .join(broadcast(endpoints.toSeq.toDF("node")), Seq("node"), "left_semi")
      .select(col("node"), col("component"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // union-find with min-id roots over contracted keys
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Unit = {
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    def key(n: Long): Long = endpointAssign.getOrElse(n, n)
    pairs.foreach { case (s, d) => union(key(s), key(d)) }
    val rootOf = parent.keys.map(k => k -> find(k)).toMap
    val touchedComps = endpointAssign.values.toSeq.distinct.toDF("component")
    val mapping = rootOf.toSeq.toDF("component", "__newc")
    val fresh = endpoints.filterNot(endpointAssign.contains)
      .map(n => (n, rootOf(n))).toSeq.toDF("node", "component")
    val resolved = assign
      .join(broadcast(touchedComps), Seq("component"), "left_semi")
      .join(broadcast(mapping), Seq("component"))
      .select(col("node"), col("__newc").as("component"))
      .unionByName(fresh)
    Some((touchedComps, resolved))
  }

  /** The generic distributed form: touched members collapse to star edges
    * (node — old component) and re-run through [[labelPropagation]]
    * together with the batch — right when the batch itself is too large
    * to hold on the driver.
    */
  private def distributedResolve(
      assign: DataFrame,
      newEdges: DataFrame,
      maxIter: Int,
      broadcastBatch: Boolean
  ): (DataFrame, DataFrame) = {
    def hint(df: DataFrame): DataFrame = if (broadcastBatch) broadcast(df) else df
    val touchedNodes = newEdges.select(col("src").as("node"))
      .unionByName(newEdges.select(col("dst").as("node")))
      .distinct()
    val touchedComps = assign.join(hint(touchedNodes), Seq("node"), "left_semi")
      .select("component").distinct()
    val members = assign.join(hint(touchedComps), Seq("component"), "left_semi")
    val starEdges = members.select(col("node").as("src"), col("component").as("dst"))
    val resolved = labelPropagation(
      starEdges.unionByName(newEdges.select(col("src"), col("dst"))), maxIter)
    (touchedComps, resolved)
  }

  /** The dedup END product: map every document to its cluster's
    * representative — the highest-`scoreCol` member (ties → lowest id) —
    * so a curation pipeline keeps the best copy of each duplicate cluster
    * instead of an arbitrary one. Documents in no edge are their own
    * singleton representative.
    *
    * Scale shape: components from [[labelPropagation]]; the representative
    * is `first(id)` over a per-component window ordered by (score desc,
    * id) — ONE pass over the doc+component frame (an agg+join-back form
    * was measured planning the frame TWICE, once per branch; the window
    * keeps a single branch and its shuffle doubles as the mapping's
    * distribution). Components are duplicate clusters — small by nature —
    * so the within-partition sort never sees a skewed group.
    *
    * @return (idCol, component, canonical_id, is_kept) per input document.
    */
  def canonicalize(
      docs: DataFrame,
      edges: DataFrame,
      idCol: String,
      scoreCol: String,
      maxIter: Int = 20
  ): DataFrame = {
    val comp = labelPropagation(edges, maxIter)
    val withComp = docs.select(col(idCol), col(scoreCol))
      .join(comp, col(idCol) === col("node"), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .drop("node")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component").orderBy(col(scoreCol).desc, col(idCol))
    withComp
      .withColumn("canonical_id", first(col(idCol)).over(w))
      .select(col(idCol), col("component"), col("canonical_id"),
        (col(idCol) === col("canonical_id")).as("is_kept"))
  }
}
