package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical association statistics over contingency counts: mutual
  * information (Shannon 1948), chi-square independence / Cramér's V
  * (Cramér 1946), Shannon entropy, and Jensen–Shannon divergence
  * (Lin 1991) — the "are these two columns related, and how mixed is
  * this one" audit family next to [[Profiler]]'s drift checks (those
  * compare SNAPSHOTS of one column; this measures structure BETWEEN
  * columns, or a single column's mixture, inside one snapshot). A
  * training-data pipeline uses these to catch label leakage
  * (high MI between a feature and the split column), collapsed
  * mixtures (entropy dropping), and corpus shift (JS divergence
  * between yesterday's and today's token distribution — symmetric and
  * bounded at ln 2, unlike KL).
  *
  * House determinism rules, same as the chi-square/KS drift family:
  * ALL mass state is integer (counts, cross-multiplied numerators in
  * DECIMAL(38,0) where squares outrun a long), and every transcendental
  * surface is NANO-SCALED — each per-cell `ln` term is rounded to an
  * integer count of 1e-9 units BEFORE summation, so per-group sums are
  * order-free integer arithmetic and the statistic both engines emit is
  * the SAME number by construction (the q198 9-decimal idiom, moved
  * before the sum so group aggregation never adds doubles). The nano
  * surface differs from the unrounded float statistic by < #cells·5e-10
  * — documented, deterministic, and hashable at any scale.
  *
  * Scale: the contingency frame is value-cardinality-sized (a
  * categorical audit input by contract — bucket continuous columns
  * first), so everything after the one counting aggregation is
  * bookkeeping. Counts are MERGEABLE: per-snapshot frames over disjoint
  * row sets fold by summing per cell into exactly the rebuild's counts
  * (the valueCounts discipline), so a standing audit tracks a growing
  * corpus without rescans.
  */
object Association {

  private val dec = "decimal(38,0)"

  /** Per-(group, x, y) contingency counts — the mergeable state. NULL
    * is a category (missing IS signal, the chiSquareDrift rule); both
    * columns surface as strings so one schema covers every input type.
    * Columns: keyCols…, x, y, n.
    */
  def contingencyCounts(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String
  ): DataFrame =
    df.groupBy((keyCols.map(col) :+
        col(xCol).cast("string").as("x") :+
        col(yCol).cast("string").as("y")): _*)
      .agg(count(lit(1)).as("n"))

  /** Fold two [[contingencyCounts]] frames over disjoint row sets. */
  def mergeContingencyCounts(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keyCols.map(col) :+ col("x") :+ col("y")): _*)
      .agg(sum("n").as("n"))

  /** Per-cell association frame from (possibly folded) counts. Emits,
    * per (group, x, y): the cell count `n`, marginals `row_tot` (x) and
    * `col_tot` (y), group total `n_tot` — all exact integers — plus:
    *
    *  - `chi_num` = (n·N − row_tot·col_tot)² in DECIMAL(38,0): the
    *    cross-multiplied chi-square numerator over the common
    *    denominator N·row_tot·col_tot (q172's lossless form — the one
    *    division lives in the driver-side [[associationStat]] fold);
    *  - `mi_term_n9` = round(1e9 · (n/N)·ln(n·N/(row_tot·col_tot)))
    *    as a long: the cell's mutual-information contribution in nats,
    *    nano-scaled so [[mutualInformation]] sums integers.
    *
    * Marginals ride three window sums over the cell frame itself —
    * value-cardinality-sized bookkeeping, not a data-sized shuffle.
    */
  def associationCells(counts: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val all = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byX = Window.partitionBy((g :+ col("x")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byY = Window.partitionBy((g :+ col("y")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withMarg = counts
      .withColumn("row_tot", sum("n").over(byX))
      .withColumn("col_tot", sum("n").over(byY))
      .withColumn("n_tot", sum("n").over(all))
    val gap = col("n").cast(dec) * col("n_tot").cast(dec) -
      col("row_tot").cast(dec) * col("col_tot").cast(dec)
    // n ≥ 1 in every cell (it's a count frame), so the log argument is
    // a strictly positive ratio of exact integers; the double casts are
    // exact below 2^53 and documented 1–2 ulp above — absorbed by the
    // nano rounding (q198 finding).
    val miTerm = (col("n").cast("double") / col("n_tot")) *
      log(col("n").cast("double") * col("n_tot") /
        (col("row_tot").cast("double") * col("col_tot")))
    withMarg
      .withColumn("chi_num", gap * gap)
      .withColumn("mi_term_n9", round(miTerm * 1e9d).cast("long"))
      .select((g :+ col("x") :+ col("y") :+ col("n") :+ col("row_tot") :+
        col("col_tot") :+ col("n_tot") :+ col("chi_num") :+ col("mi_term_n9")): _*)
  }

  /** Per-group mutual information (nats) between the two columns of an
    * [[associationCells]] frame: MI = Σ_cells mi_term, summed as
    * nano-ints (order-free, exact) with ONE terminal pinned division.
    * Also emits the cardinalities (n_x, n_y), the group total, and
    * normalized MI / max-possible ln(min(n_x, n_y)) — the 0-to-1 "how
    * much does knowing x tell you about y" reading (NULL for a 1×k
    * table, where MI is identically 0 and normalization is undefined).
    */
  def mutualInformation(cells: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    cells.groupBy(g: _*)
      .agg(
        countDistinct(col("x")).as("n_x"),
        countDistinct(col("y")).as("n_y"),
        max("n_tot").as("n"),
        sum("mi_term_n9").as("__mi_n9"))
      .withColumn("mi", col("__mi_n9").cast("double") / 1e9d)
      .withColumn("mi_norm",
        when(least(col("n_x"), col("n_y")) > 1L,
          col("mi") / log(least(col("n_x"), col("n_y")).cast("double"))))
      .drop("__mi_n9")
  }

  /** Driver-side scalar fold of ONE group's [[associationCells]] rows:
    * (chi-square, Cramer's V, degrees of freedom). The count frame
    * carries only OBSERVED (x, y) cells, but a contingency table's
    * STRUCTURAL ZEROS contribute (0-E)^2/E = E each, so the fold uses
    * the expansion that absorbs them exactly:
    * chi^2 = N * (sum over observed cells of n^2/(row_tot*col_tot)) - N
    * (the zero cells' sum of E is N minus the observed cells' E).
    * Cell-order summation after a deterministic sort, divisions
    * deferred here (the chiSquareStat discipline);
    * V = sqrt(chi^2 / (N*(min(r,c)-1))), df = (r-1)(c-1).
    */
  def associationStat(cells: DataFrame): (Double, Double, Long) = {
    val rows = cells
      .select("x", "y", "n", "row_tot", "col_tot", "n_tot")
      .collect()
      .sortBy(r => (Option(r.getString(0)).getOrElse(""), Option(r.getString(1)).getOrElse("")))
    if (rows.isEmpty) return (0.0, 0.0, 0L)
    val nTot = rows.head.getLong(5).toDouble
    val nX = rows.map(r => Option(r.getString(0))).distinct.length
    val nY = rows.map(r => Option(r.getString(1))).distinct.length
    val ratio = rows.map { r =>
      val n = r.getLong(2).toDouble
      n * n / (r.getLong(3).toDouble * r.getLong(4).toDouble)
    }.sum
    val chi = nTot * ratio - nTot
    val minDim = math.min(nX, nY) - 1
    val v = if (minDim > 0 && nTot > 0) math.sqrt(math.max(chi, 0.0) / (nTot * minDim)) else 0.0
    (chi, v, (nX - 1).toLong * (nY - 1))
  }

  /** Per-group association SUMMARY — the gateable one-row-per-group
    * companion of the driver-side [[associationStat]]: chi-square,
    * Cramér's V (Cramér 1946), mutual information, and BOTH Theil
    * uncertainty coefficients (Theil 1970) U(x|y) = MI/H(x),
    * U(y|x) = MI/H(y) — the asymmetric "how much of x's uncertainty
    * does y explain" reading a symmetric V can't give.
    *
    * Engine-exact construction: chi² uses the structural-zero-absorbing
    * identity χ² = Σ_observed N·n²/(rᵢcⱼ) − N with each cell term
    * nano-scaled AFTER the ×N scaling (so the rounding error stays
    * < #cells·5e-10 in χ² itself, independent of N — rounding the bare
    * ratio first would amplify the per-cell error by N) and summed as
    * DECIMAL(38,0) (N·1e9 per cell overflows a long at corpus scale); the
    * marginal entropies H(x), H(y) are nano-sums over the DISTINCT
    * marginal rows; MI is the [[mutualInformation]] nano-sum. Every
    * emitted statistic is then a fixed dag over exact integers —
    * gate at 9 decimals for the √/÷ steps. NULL V when min(r,c) < 2;
    * NULL U when the corresponding marginal entropy is 0 (a constant
    * column explains nothing and has nothing to explain).
    */
  def associationSummary(cells: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    def nanoEntropy(marginal: DataFrame, totCol: String, as: String): DataFrame =
      marginal
        .withColumn("__t",
          round(-(col(totCol).cast("double") / col("n_tot")) *
            log(col(totCol).cast("double") / col("n_tot")) * 1e9d).cast("long"))
        .groupBy(g: _*)
        .agg(sum("__t").as(as))
    val hx = nanoEntropy(
      cells.select((g :+ col("x") :+ col("row_tot") :+ col("n_tot")): _*).distinct(),
      "row_tot", "__hx_n9")
    val hy = nanoEntropy(
      cells.select((g :+ col("y") :+ col("col_tot") :+ col("n_tot")): _*).distinct(),
      "col_tot", "__hy_n9")
    val base = cells
      .withColumn("__chi_t",
        round(col("n_tot").cast("double") * col("n") * col("n") /
          (col("row_tot").cast("double") * col("col_tot")) * 1e9d).cast("decimal(38,0)"))
      .groupBy(g: _*)
      .agg(
        countDistinct(col("x")).as("n_x"),
        countDistinct(col("y")).as("n_y"),
        max("n_tot").as("n"),
        sum("__chi_t").as("__chi_n9"),
        sum("mi_term_n9").as("__mi_n9"))
    val joined =
      if (keyCols.isEmpty) base.crossJoin(hx).crossJoin(hy)
      else base.join(hx, keyCols).join(hy, keyCols)
    joined
      .withColumn("chi2",
        col("__chi_n9").cast("double") / 1e9d - col("n"))
      .withColumn("cramers_v",
        when(least(col("n_x"), col("n_y")) > 1L && col("n") > 0L,
          sqrt(greatest(col("chi2"), lit(0d)) /
            (col("n").cast("double") * (least(col("n_x"), col("n_y")) - 1L)))))
      .withColumn("mi", col("__mi_n9").cast("double") / 1e9d)
      .withColumn("h_x", col("__hx_n9").cast("double") / 1e9d)
      .withColumn("h_y", col("__hy_n9").cast("double") / 1e9d)
      .withColumn("theil_u_x",
        when(col("__hx_n9") > 0L, col("__mi_n9").cast("double") / col("__hx_n9")))
      .withColumn("theil_u_y",
        when(col("__hy_n9") > 0L, col("__mi_n9").cast("double") / col("__hy_n9")))
      .drop("__chi_n9", "__mi_n9", "__hx_n9", "__hy_n9")
  }

  /** Per-group Shannon entropy (nats) of one categorical column, from a
    * per-(group, category) count frame shaped like
    * [[Profiler.simpsonDiversityFromCounts]]'s input (keyCols…, __cat,
    * __n) — the `ln`-family companion Simpson deliberately avoids,
    * gateable here because each cell's −p·ln p term is nano-scaled
    * before the (integer, order-free) sum. Emits n_cats, n, entropy,
    * and entropy_norm = H/ln(n_cats) (NULL when n_cats < 2).
    */
  def entropyFromCounts(counts: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val all = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("__tot", sum("__n").over(all))
      .withColumn("__h_n9",
        round(-(col("__n").cast("double") / col("__tot")) *
          log(col("__n").cast("double") / col("__tot")) * 1e9d).cast("long"))
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("n_cats"),
        max("__tot").as("n"),
        sum("__h_n9").as("__sum_n9"))
      .withColumn("entropy", col("__sum_n9").cast("double") / 1e9d)
      .withColumn("entropy_norm",
        when(col("n_cats") > 1L, col("entropy") / log(col("n_cats").cast("double"))))
      .drop("__sum_n9")
  }

  /** [[entropyFromCounts]] over raw rows. */
  def entropy(df: DataFrame, keyCols: Seq[String], catCol: String): DataFrame =
    entropyFromCounts(
      df.groupBy((keyCols.map(col) :+ col(catCol).cast("string").as("__cat")): _*)
        .agg(count(lit(1)).as("__n")),
      keyCols)

  /** Jensen–Shannon divergence between two (possibly folded)
    * [[Profiler.valueCounts]] histograms — the SYMMETRIC, ln(2)-bounded
    * drift statistic for distributions with no order (chi-square tests
    * homogeneity; JS measures DISTANCE, comparable across column pairs
    * and over time). Per value: both counts and
    * `js_term_n9` = round(1e9·(½p·ln(p/m) + ½q·ln(q/m))), p = n_base/N_base,
    * q = n_cur/N_cur, m = (p+q)/2 — a one-sided value contributes its
    * ½p·ln 2 (resp. ½q·ln 2) term exactly (0·ln 0 ≡ 0). NULL-safe on the
    * NULL category like the chi-square join. [[jsStat]] folds the frame
    * to the scalar; both sides mergeable, so a standing JS audit needs
    * no baseline rescan.
    */
  def jsDivergenceFromCounts(baseCounts: DataFrame, curCounts: DataFrame): DataFrame = {
    val hb = baseCounts.select(col("value").as("__vb"), col("cnt").as("n_base"))
    val hc = curCounts.select(col("value").as("__vc"), col("cnt").as("n_cur"))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val joined = hb.join(hc, col("__vb") <=> col("__vc"), "full_outer")
      .select(coalesce(col("__vb"), col("__vc")).as("value"), col("n_base"), col("n_cur"))
      .na.fill(0L, Seq("n_base", "n_cur"))
      .withColumn("__tb", sum("n_base").over(all))
      .withColumn("__tc", sum("n_cur").over(all))
    val p = col("n_base").cast("double") / col("__tb")
    val q = col("n_cur").cast("double") / col("__tc")
    val m = (p + q) / 2d
    val term =
      when(col("n_base") > 0L, p * log(p / m) / 2d).otherwise(0d) +
        when(col("n_cur") > 0L, q * log(q / m) / 2d).otherwise(0d)
    joined
      .withColumn("js_term_n9", round(term * 1e9d).cast("long"))
      .select("value", "n_base", "n_cur", "js_term_n9")
  }

  /** [[jsDivergenceFromCounts]] over raw snapshots. */
  def jsDivergence(base: DataFrame, cur: DataFrame, column: String): DataFrame =
    jsDivergenceFromCounts(Profiler.valueCounts(base, column), Profiler.valueCounts(cur, column))

  /** Scalar JS divergence (nats) from the per-value frame: one integer
    * sum, one pinned division. 0 ≤ JS ≤ ln 2 ≈ 0.6931.
    */
  def jsStat(frame: DataFrame): Double = {
    val s = frame.agg(sum("js_term_n9")).collect()(0)
    if (s.isNullAt(0)) 0.0 else s.getLong(0).toDouble / 1e9
  }

  /** Per-(group, x, y) cell counts for [[kendallFromCells]] — like
    * [[contingencyCounts]] but the values keep their ORIGINAL (orderable)
    * type: Kendall needs <, not just =. Mergeable (plain sums). NULLs in
    * either column are dropped — a rank correlation over an unordered
    * missing marker has no defined sign.
    */
  def kendallCells(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String
  ): DataFrame =
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy((keyCols.map(col) :+ col(xCol).as("x") :+ col(yCol).as("y")): _*)
      .agg(count(lit(1)).as("n"))

  /** Fold two [[kendallCells]] frames over disjoint row sets. */
  def mergeKendallCells(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keyCols.map(col) :+ col("x") :+ col("y")): _*)
      .agg(sum("n").as("n"))

  /** Exact Kendall τ-b (Kendall 1938; τ-b tie correction as in Kruskal
    * 1958) from a cell-count frame — the rank correlation whose exact
    * distributed form the repo's Spearman family can't reach (Spearman
    * needs each row's global rank; Kendall needs only PAIR ORDER
    * relations, which aggregate over distinct-value CELLS):
    *
    *   C  = Σ n_a·n_b over cell pairs with x_a<x_b, y_a<y_b (concordant)
    *   D  = Σ over x_a<x_b, y_a>y_b                        (discordant)
    *   Ty = Σ over x_a<x_b, y_a=y_b (tied y only)
    *   Tx = Σ over x_a=x_b, y_a<y_b (tied x only)
    *   Txy= Σ n(n−1)/2 within cells (tied both)
    *   τ-b = (C−D) / (√(C+D+Tx) · √(C+D+Ty))
    *
    * Every count is an exact DECIMAL(38,0) (pair products square past a
    * long at corpus scale); τ-b is a fixed dag of two √ and one ÷ over
    * their double casts — gate at 9 decimals (q198 cast-ulp finding).
    *
    * SCALE: cost is O(cells²) per group and INDEPENDENT of row count —
    * the join runs on the (group, x, y) count frame, so 100 TB of rows
    * over bounded-cardinality values (categorical, bucketed, or
    * integer-scaled measures) costs the same join as 60k rows. This is
    * the skew-safe shape by construction: no per-group row sort exists
    * anywhere. For genuinely continuous columns, bucket first (the
    * operator composes with any monotone discretization; τ is then the
    * τ of the buckets, stated plainly). Cells are MERGEABLE counts, so
    * the standing τ audit folds batches like the chi-square family.
    */
  def kendallFromCells(cells: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val zero = lit(0L).cast(dec)
    // DENSE-GRID PREFIX LAYOUT (round 11; replaces the O(cells²)
    // pairwise cell join — measured 25 s on q210's 80M pair rows vs
    // ~1 s here, and the join's equi-key collapsed the work onto
    // #groups tasks). Every pair class is recovered from the |X|·|Y|
    // grid and the marginals, bit-identically:
    //   S(x,y)     = Σ_{x'<x, y'<y} n   (2-D strict dominance prefix)
    //   C          = Σ_cell n·S
    //   D          = Σ_cell n·(X<(x) − S − colcum)  with
    //                colcum(x,y) = Σ_{x'<x} n(x',y), X<(x) = Σ_{x'<x} cnt_x'
    //   Tx         = Σ_x (cnt_x 2) − Txy;  Ty = Σ_y (cnt_y 2) − Txy
    // S comes from two bounded ordered windows (per (key,y) over x,
    // then per (key,x) over y) on the grid — never a pair
    // materialization; grid = |X|·|Y| ≤ cells² always, ≪ when dense.
    val wXlt = Window.partitionBy(g: _*).orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val xs = cells.groupBy((g :+ col("x")): _*).agg(sum("n").as("__cx"))
      .withColumn("__xlt", coalesce(sum(col("__cx").cast(dec)).over(wXlt), zero))
    val ys = cells.groupBy((g :+ col("y")): _*).agg(sum("n").as("__cy"))
    // ys and cells are value-cardinality-bounded (the operator's input
    // contract) — broadcast them so the |X|·|Y| grid, the one frame
    // that grows, never reshuffles for a join
    val grid =
      (if (keyCols.isEmpty) xs.crossJoin(broadcast(ys))
       else xs.join(broadcast(ys), keyCols))
        .join(broadcast(cells), keyCols :+ "x" :+ "y", "left_outer")
        .withColumn("__n0", coalesce(col("n"), lit(0L)))
    val wCol = Window.partitionBy((g :+ col("y")): _*).orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRow = Window.partitionBy((g :+ col("x")): _*).orderBy("y")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = grid
      .withColumn("__colcum", coalesce(sum(col("__n0").cast(dec)).over(wCol), zero))
      .withColumn("__s", coalesce(sum(col("__colcum")).over(wRow), zero))
    val n0D = col("__n0").cast(dec)
    val pairAgg = pre.groupBy(g: _*).agg(
      sum(n0D * col("__s")).as("c_pairs"),
      sum(n0D * (col("__xlt") - col("__s") - col("__colcum"))).as("d_pairs"))
    val cxD = col("__cx").cast(dec)
    val xTies = xs.groupBy(g: _*)
      .agg((sum(cxD * (cxD - 1)) / 2).cast(dec).as("__ax"))
    val cyD = col("__cy").cast(dec)
    val yTies = ys.groupBy(g: _*)
      .agg((sum(cyD * (cyD - 1)) / 2).cast(dec).as("__ay"))
    val cellAgg = cells.groupBy(g: _*).agg(
      sum("n").as("n"),
      (sum(col("n").cast(dec) * (col("n") - 1L).cast(dec)) / 2).cast(dec).as("t_xy"))
    // NULL-keyed groups never match the equi-joins below — they emit
    // with zero pair counts (τ undefined), exactly as the old pairwise
    // join's NULL-key behavior
    val frame =
      (if (keyCols.isEmpty) cellAgg.crossJoin(pairAgg).crossJoin(xTies).crossJoin(yTies)
       else cellAgg.join(broadcast(pairAgg), keyCols, "left_outer")
         .join(broadcast(xTies), keyCols, "left_outer")
         .join(broadcast(yTies), keyCols, "left_outer"))
        .withColumn("t_x", coalesce(col("__ax") - col("t_xy"), zero))
        .withColumn("t_y", coalesce(col("__ay") - col("t_xy"), zero))
    val filled = frame
      .select((g :+ col("n") :+
        coalesce(col("c_pairs"), zero).as("c_pairs") :+
        coalesce(col("d_pairs"), zero).as("d_pairs") :+
        coalesce(col("t_x"), zero).as("t_x") :+
        coalesce(col("t_y"), zero).as("t_y") :+
        col("t_xy")): _*)
    val dx = (col("c_pairs") + col("d_pairs") + col("t_x")).cast("double")
    val dy = (col("c_pairs") + col("d_pairs") + col("t_y")).cast("double")
    filled.withColumn("tau_b",
      when(dx > 0d && dy > 0d,
        (col("c_pairs") - col("d_pairs")).cast("double") / (sqrt(dx) * sqrt(dy))))
  }

  /** [[kendallFromCells]] over raw rows. */
  def kendall(df: DataFrame, keyCols: Seq[String], xCol: String, yCol: String): DataFrame =
    kendallFromCells(kendallCells(df, keyCols, xCol, yCol), keyCols)

  /** Kruskal–Wallis H test (Kruskal & Wallis 1952): do k groups share a
    * location, judged on RANKS — the distribution-free one-way ANOVA a
    * pipeline reaches for when per-group means are skew-poisoned. Exact
    * integer construction on the CELL layout (no per-row rank window
    * anywhere — the Kendall discipline, not the Spearman one):
    *
    *  - per distinct value v: tie count t_v and the DOUBLED average
    *    rank R2_v = 2·(#smaller) + t_v + 1, from ONE cumulative window
    *    over the value-cardinality-sized distinct-value frame;
    *  - per group g: the doubled rank sum R2_g = Σ_v c_{g,v}·R2_v and
    *    the exact deviation D_g = R2_g − n_g·(N+1) (both DECIMAL digit
    *    strings; Σ_g D_g = 0 is a built-in invariant);
    *  - H = 3/(N(N+1)) · Σ_g D_g²/n_g: each group's term is nano-scaled
    *    to a long as round(1e9·3·(D²/n_g)/N/(N+1)) — a fixed dag both
    *    engines replay — then summed order-free; the tie-corrected
    *    H* = H/(1 − ΣT_v/(N³−N)) with T_v = t_v³−t_v kept exact until
    *    its one division. Gate H at 9 decimals.
    *
    * SCALE: everything after the (group, value) counting aggregation is
    * value-cardinality-sized bookkeeping (bucket continuous columns
    * first, as with [[kendall]]); the only ordered window runs over
    * DISTINCT VALUES per key — never a per-group row sort, so a 500M-row
    * hot group costs the same as its value cardinality. NULL values and
    * NULL group labels are dropped.
    *
    * Emits one row per (keys, grp): n_g, r2_sum, d (digit strings), and
    * the key-level n, h, h_tie replicated per group row.
    */
  /** Per-(keys, group, value) counts — the ADDITIVE, mergeable state
    * the whole rank-test family reduces over: [[kruskalWallisFromCells]],
    * [[mannWhitneyFromCells]] and [[brownForsytheFromCells]] all read
    * this one frame, so a versioned fold of it (the
    * [[contingencyCounts]] discipline) makes location, scale and
    * two-sample tests STANDING reads over all history. The value keeps
    * its ORDERABLE type (ranks need an order — the [[kendallCells]]
    * rule, not the contingency string cast); value cardinality is the
    * store bound (bucket continuous columns first).
    */
  def rankCells(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String
  ): DataFrame =
    df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(keyCols.map(col) :+ col(groupCol).cast("string").as("grp") :+
        col(valueCol).as("v"): _*)
      .agg(count(lit(1)).as("n"))

  /** Fold two [[rankCells]] frames over disjoint row sets. */
  def mergeRankCells(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keyCols.map(col) :+ col("grp") :+ col("v"): _*)
      .agg(sum("n").as("n"))

  private def fromRankCells(cellsIn: DataFrame, keyCols: Seq[String]): DataFrame =
    cellsIn.select(keyCols.map(col) :+ col("grp") :+ col("v").as("__v") :+
      col("n").cast("long").as("__c"): _*)

  def kruskalWallis(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String
  ): DataFrame =
    kruskalWallisFromCells(rankCells(df, keyCols, groupCol, valueCol), keyCols)

  /** [[kruskalWallis]] from a (possibly folded) [[rankCells]] frame. */
  def kruskalWallisFromCells(cellsIn: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val cells = fromRankCells(cellsIn, keyCols)
    val vals = cells.groupBy(g :+ col("__v"): _*).agg(sum("__c").as("__t"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = vals
      .withColumn("__cum", coalesce(sum("__t").over(wCum), lit(0L)))
      .withColumn("__r2", lit(2L) * col("__cum") + col("__t") + lit(1L))
    val tD = col("__t").cast(dec)
    val tot =
      if (keyCols.isEmpty)
        ranked.groupBy().agg(
          sum("__t").as("n"),
          sum(tD * tD * tD - tD).as("__ties"))
      else
        ranked.groupBy(g: _*).agg(
          sum("__t").as("n"),
          sum(tD * tD * tD - tD).as("__ties"))
    val joinCols = keyCols :+ "__v"
    val grpAgg = cells
      .join(ranked.select(g :+ col("__v") :+ col("__r2"): _*), joinCols)
      .groupBy(g :+ col("grp"): _*)
      .agg(
        sum("__c").as("n_g"),
        sum(col("__c").cast(dec) * col("__r2").cast(dec)).as("__r2sum"))
    val frame =
      if (keyCols.isEmpty) grpAgg.crossJoin(tot)
      else grpAgg.join(tot, keyCols)
    val nD = col("n").cast(dec)
    val withD = frame.withColumn("__d", col("__r2sum") - col("n_g").cast(dec) * (nD + 1))
    // nano term: H = 12/(N(N+1))·Σ n_g(R̄_g−R̄)² and n_g(R̄_g−R̄) = D/2
    // (D is DOUBLED), so per group term = 12·(D/2)²/(n_g·N·(N+1)) =
    // 3·D²/(n_g·N·(N+1)); the dag order below is the oracle's
    val dDbl = col("__d").cast("double")
    val term9 = round(
      dDbl * dDbl / col("n_g").cast("double") / col("n").cast("double") /
        (col("n").cast("double") + 1d) * 3d * 1e9d).cast("long")
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withH = withD
      .withColumn("__h9", sum(term9).over(wKey))
      .withColumn("h", col("__h9").cast("double") / 1e9d)
    // tie correction: H* = H / (1 − T/(N³−N)); NULL when N < 2 or the
    // column is constant (T = N³−N — every rank tied, nothing to test)
    val n3n = nD * nD * nD - nD
    withH
      .withColumn("h_tie",
        when(col("n") > 1L && col("__ties").cast(dec) < n3n,
          col("h") / (lit(1d) - col("__ties").cast("double") / n3n.cast("double"))))
      .select(g :+ col("grp") :+ col("n_g") :+
        col("__r2sum").cast("string").as("r2_sum") :+
        col("__d").cast("string").as("d") :+
        col("n") :+ col("h") :+ col("h_tie"): _*)
  }

  /** Cochran–Mantel–Haenszel test (Cochran 1954; Mantel & Haenszel
    * 1959): the two-group success-rate comparison ADJUSTED for a
    * stratifying confounder — "is variant A's pass rate really higher,
    * or does it just have more English?" — the Simpson's-paradox-proof
    * form of [[twoProportion]] (at ONE stratum CMH = (n−1)/n · z² —
    * the hypergeometric variance carries the finite-population n−1;
    * spec-asserted; no continuity correction, like z).
    *
    *   CMH = (Σₛ aₛ − Σₛ E ₛ)² / Σₛ Varₛ,   with per stratum s
    *   E = r₁·c₁/n,  Var = r₁·r₂·c₁·c₂/(n²(n−1))
    *
    * Determinism: E and Var carry per-stratum denominators, so each
    * stratum's E and Var are nano-scaled longs (fixed dags), summed
    * order-free in DECIMAL; the final statistic is one fixed dag over
    * the three sums, gated at 9 decimals. Group-lo = the smaller label
    * (the [[mannWhitney]] pivot rule); `a` = (group-lo, success) count.
    * Strata with n < 2 or a degenerate margin contribute 0 to every sum
    * (their Var is 0 — the standard convention). The test is a
    * TWO-group test: a stratum with >2 distinct group labels is a
    * contract violation — it is dropped whole (NOT lumped into a fake
    * hi arm) and counted in `n_multi`, the [[mannWhitney]]
    * flag-don't-guess convention. NULL statistic when ΣVar = 0.
    * SCALE: one (stratum, group, success) count agg; the pivot and the
    * sums are stratum-cardinality bookkeeping.
    */
  def cmh(
      df: DataFrame,
      strataCol: String,
      groupCol: String,
      successCol: String
  ): DataFrame = {
    val counts = df
      .filter(col(strataCol).isNotNull && col(groupCol).isNotNull &&
        col(successCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("__s"),
        col(groupCol).cast("string").as("grp"),
        col(successCol).cast("long").as("__hit"))
      .agg(count(lit(1)).as("__n"))
    cmhFromCounts(counts, "__s", "grp", "__hit", "__n")
  }

  /** [[cmh]] from a pre-aggregated (stratum, group, success, n) count
    * frame — the shape [[contingencyCounts]] emits with the stratum as
    * key (x = group, y = success), so a VERSIONED contingency fold
    * ([[graft.streaming.StreamingOps.contingencyStream]]) IS the CMH
    * streaming state: the standing store answers "confounder-adjusted
    * A/B so far" without re-reading trials. Success values cast to long
    * (string "0"/"1" from the contingency cast round-trips), falling
    * back to a boolean cast ("true"/"false" from a boolean-column
    * contingency cast). Trials whose success value enters NO quadrant —
    * it survives neither cast, casts to something other than 0/1 (a
    * count like 2 is NOT a Bernoulli outcome), or is NULL (a store fold
    * that lost the outcome; the subject-level [[cmh]] excludes NULL
    * success at intake, so a NULL HERE is out-of-contract, not an
    * excluded trial) — are counted into `n_bad_success` (flag, never
    * guess — the n_multi convention): a nonzero flag means the store's
    * success column isn't the 0/1 contract, and exactly the flagged
    * trials were dropped.
    */
  def cmhFromCounts(
      countsIn: DataFrame,
      strataCol: String,
      groupCol: String,
      successCol: String,
      nCol: String
  ): DataFrame = {
    // try_cast, not cast: a malformed success value must FLAG, not
    // abort the whole read under ANSI / silently NULL under legacy
    val hit = coalesce(
      expr(s"try_cast(`$successCol` AS BIGINT)"),
      expr(s"try_cast(`$successCol` AS BOOLEAN)").cast("long"))
    val counts = countsIn.select(
      col(strataCol).cast("string").as("__s"),
      col(groupCol).cast("string").as("grp"),
      hit.as("__hit"),
      col(nCol).cast("long").as("__n"),
      // every trial entering no quadrant — uncastable, non-0/1 (e.g. a
      // count of 2), or NULL success — is flagged, none silently dropped
      when(hit.isNull || (hit =!= 0L && hit =!= 1L), col(nCol).cast("long"))
        .otherwise(0L).as("__bad"))
    val wS = Window.partitionBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = counts
      .withColumn("grp_lo", min("grp").over(wS))
      .withColumn("grp_hi", max("grp").over(wS))
      .withColumn("n_grps", size(collect_set(col("grp")).over(wS)))
      .groupBy(col("__s"), col("grp_lo"), col("grp_hi"), col("n_grps"))
      .agg(
        sum(when(col("grp") === col("grp_lo") && col("__hit") === 1L, col("__n"))
          .otherwise(0L)).as("__a"),
        sum(when(col("grp") === col("grp_lo") && col("__hit") === 0L, col("__n"))
          .otherwise(0L)).as("__b"),
        sum(when(col("grp") =!= col("grp_lo") && col("__hit") === 1L, col("__n"))
          .otherwise(0L)).as("__c"),
        sum(when(col("grp") =!= col("grp_lo") && col("__hit") === 0L, col("__n"))
          .otherwise(0L)).as("__d"),
        sum(col("__bad")).as("__badS"))
    val (a, b, c, d) = (col("__a"), col("__b"), col("__c"), col("__d"))
    val n = (a + b + c + d).cast("double")
    val r1 = (a + b).cast("double"); val r2 = (c + d).cast("double")
    val c1 = (a + c).cast("double"); val c2 = (b + d).cast("double")
    val usable = col("n_grps") === 2 &&
      (a + b + c + d) >= 2L && r1 > 0d && r2 > 0d && c1 > 0d && c2 > 0d
    val e9 = when(usable, round(r1 * c1 / n * 1e9d).cast("long")).otherwise(0L)
    val v9 = when(usable,
      round(r1 * r2 * c1 * c2 / (n * n * (n - 1d)) * 1e9d).cast("long")).otherwise(0L)
    // Mantel–Haenszel common odds-ratio terms: OR = Σ(a·d/n)/Σ(b·c/n)
    // — same per-stratum nano discipline, same usable gate
    val orNum9 = when(usable,
      round(a.cast("double") * d.cast("double") / n * 1e9d).cast("long")).otherwise(0L)
    val orDen9 = when(usable,
      round(b.cast("double") * c.cast("double") / n * 1e9d).cast("long")).otherwise(0L)
    val dec2 = "decimal(38,0)"
    val sums = wide
      .withColumn("__e9", e9).withColumn("__v9", v9)
      .withColumn("__on9", orNum9).withColumn("__od9", orDen9)
      // a USABLE stratum contributes a, E and Var together — a
      // degenerate stratum (one group / empty margin) contributes to
      // NONE of them (counting its a with a zero E would bias the
      // deviation; the textbook convention drops the stratum whole)
      .agg(
        count(lit(1)).as("n_strata"),
        sum(when(usable, 1L).otherwise(0L)).as("n_used"),
        sum(when(col("n_grps") > 2, 1L).otherwise(0L)).as("n_multi"),
        sum(col("__badS")).cast("long").as("n_bad_success"),
        sum(when(usable, a).otherwise(0L)).cast("long").as("sum_a"),
        sum(col("__e9").cast(dec2)).as("__se9"),
        sum(col("__v9").cast(dec2)).as("__sv9"),
        sum(col("__on9").cast(dec2)).as("__son9"),
        sum(col("__od9").cast(dec2)).as("__sod9"))
    val dev = col("sum_a").cast("double") - col("__se9").cast("double") / 1e9d
    sums
      .withColumn("e_sum9", col("__se9").cast("string"))
      .withColumn("var_sum9", col("__sv9").cast("string"))
      .withColumn("cmh",
        when(col("__sv9") > 0L, dev * dev / (col("__sv9").cast("double") / 1e9d)))
      .withColumn("or_mh",
        when(col("__sod9") > 0L,
          col("__son9").cast("double") / col("__sod9").cast("double")))
      .drop("__se9", "__sv9", "__son9", "__sod9")
  }

  /** Pairwise association MATRIX over categorical columns — the
    * [[associationSummary]] of every unordered column pair in ONE
    * pass, the categorical companion of the Pearson/Spearman matrices
    * (q185/q192): which metadata fields are redundant, which explain
    * which (the asymmetric Theil U pair per row says both directions).
    * Construction: one NARROW generator per row (explode over the pair
    * structs — fan-out = #pairs, documented), one (pair, x, y) count
    * aggregation, then the existing cells→summary machinery with the
    * pair LABEL as an extra key — so every determinism property (nano
    * MI terms, N-scaled chi terms in DECIMAL, pinned divisions) is
    * inherited, not re-implemented. NULL stays a category (the
    * contingency rule). Emits one row per (keys, pair "a|b").
    *
    * SCALE: the exploded frame is rows×pairs (bounded fan-out); the one
    * count agg map-side combines; everything after is
    * category-cardinality bookkeeping per pair.
    */
  def associationMatrix(
      df: DataFrame,
      keyCols: Seq[String],
      cols: Seq[String]
  ): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns: $cols")
    val pairs = for (i <- cols.indices; j <- (i + 1) until cols.size)
      yield (cols(i), cols(j))
    val structs = pairs.map { case (a, b) =>
      struct(lit(s"$a|$b").as("pair"),
        col(a).cast("string").as("x"), col(b).cast("string").as("y"))
    }
    val long = df
      .select((keyCols.map(col) :+ explode(array(structs: _*)).as("__p")): _*)
      .select((keyCols.map(col) :+ col("__p").getField("pair").as("pair") :+
        col("__p").getField("x").as("x") :+ col("__p").getField("y").as("y")): _*)
    val counts = long
      .groupBy((keyCols.map(col) :+ col("pair") :+ col("x") :+ col("y")): _*)
      .agg(count(lit(1)).as("n"))
    associationSummary(associationCells(counts, keyCols :+ "pair"), keyCols :+ "pair")
  }

  /** Two-proportion z-test (the pooled-variance form; equivalent to the
    * 2×2 chi-square, z² = χ² — spec-asserted against
    * [[associationStat]]): do two variants share a success RATE — the
    * A/B primitive for curation-filter pass rates, dedup hit rates,
    * label prevalences. Per (keys, group ∈ {lo, hi by label order}):
    * successes s and totals m as exact longs, the rate-difference
    * numerator s_lo·m_hi − s_hi·m_lo as a digit string, and
    *
    *   z = num·√n / (√(m_lo·m_hi)·√(s·(n−s)))    (s = s_lo+s_hi, n = m_lo+m_hi)
    *
    * a fixed three-√ dag over exact integers (the algebraic collapse of
    * (p̂_lo−p̂_hi)/√(p̂(1−p̂)(1/m_lo+1/m_hi)) — no intermediate rate float).
    * NULL z when every trial succeeded or failed (pooled variance 0).
    * No continuity correction (stated). Input: one row per trial with a
    * boolean/0-1 success column; >2 groups flagged like [[mannWhitney]].
    */
  def twoProportion(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      successCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val grpAgg = df
      .filter(col(groupCol).isNotNull && col(successCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("__m"),
        sum(col(successCol).cast("long")).as("__s"))
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = grpAgg
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("__m"))).as("__m_lo"),
        max(when(col("grp") === col("grp_lo"), col("__s"))).as("__s_lo"),
        max(when(col("grp") === col("grp_hi"), col("__m"))).as("__m_hi"),
        max(when(col("grp") === col("grp_hi"), col("__s"))).as("__s_hi"))
    val two = col("__ngrps") === 2L
    val mLo = col("__m_lo").cast(dec); val mHi = col("__m_hi").cast(dec)
    val sLo = col("__s_lo").cast(dec); val sHi = col("__s_hi").cast(dec)
    val n = mLo + mHi
    val s = sLo + sHi
    val num = sLo * mHi - sHi * mLo
    val varCore = s * (n - s)
    wide
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("m_lo", when(two, col("__m_lo")))
      .withColumn("s_lo", when(two, col("__s_lo")))
      .withColumn("m_hi", when(two, col("__m_hi")))
      .withColumn("s_hi", when(two, col("__s_hi")))
      .withColumn("num", when(two, num.cast("string")))
      .withColumn("z", when(two && varCore > 0,
        num.cast("double") * sqrt(n.cast("double")) /
          (sqrt((mLo * mHi).cast("double")) * sqrt(varCore.cast("double")))))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("m_lo") :+ col("s_lo") :+ col("m_hi") :+ col("s_hi") :+
        col("num") :+ col("z"): _*)
  }

  /** Mann–Whitney U / Wilcoxon rank-sum test (Mann & Whitney 1947;
    * Wilcoxon 1945) — "do these TWO samples share a location", the
    * two-sample sibling of [[kruskalWallis]] (k samples) and the
    * distribution-free alternative to a t-test a skewed pipeline metric
    * actually satisfies. Same cell discipline: per distinct value the
    * tie count and DOUBLED average rank from one value-ordered
    * cumulative window; per group the exact HUGEINT doubled rank sum.
    *
    * Exact construction (group 1 = the LEXICOGRAPHICALLY SMALLER label,
    * stated in the output): 2·U₁ = R2₁ − n₁(n₁+1) (an exact integer —
    * U₁ itself can be half-integral under ties), 2·U₂ = 2n₁n₂ − 2U₁
    * (identity, emitted for symmetry), z = (2U₁ − n₁n₂) /
    * (2·√(Var)) with the tie-corrected Var = n₁n₂((N+1)N(N−1) − ΣT_v) /
    * (12N(N−1)), T_v = t_v³−t_v — the variance NUMERATOR
    * n₁n₂((N+1)N(N−1) − ΣT) is emitted as an exact DECIMAL digit
    * string; z is a fixed two-division dag over it, gate at 9 decimals.
    * NULL z when the variance is 0 (every value tied). No continuity
    * correction (stated; both engines replay the same dag).
    *
    * Input contract: exactly two distinct group labels per key — more
    * is a contract violation and the row is flagged `n_groups` > 2
    * with NULL statistics rather than silently mis-tested. SCALE: all
    * bookkeeping after the (group, value) count agg is
    * value-cardinality-sized; the one ordered window runs over DISTINCT
    * values per key (bucket continuous columns first, the τ/KW rule).
    */
  def mannWhitney(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String
  ): DataFrame =
    mannWhitneyFromCells(rankCells(df, keyCols, groupCol, valueCol), keyCols)

  /** [[mannWhitney]] from a (possibly folded) [[rankCells]] frame. */
  def mannWhitneyFromCells(cellsIn: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val cells = fromRankCells(cellsIn, keyCols)
    val vals = cells.groupBy(g :+ col("__v"): _*).agg(sum("__c").as("__t"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = vals
      .withColumn("__cum", coalesce(sum("__t").over(wCum), lit(0L)))
      .withColumn("__r2", lit(2L) * col("__cum") + col("__t") + lit(1L))
    val tD = col("__t").cast(dec)
    val tot =
      if (keyCols.isEmpty)
        ranked.groupBy().agg(sum("__t").as("n"), sum(tD * tD * tD - tD).as("__ties"))
      else
        ranked.groupBy(g: _*).agg(sum("__t").as("n"), sum(tD * tD * tD - tD).as("__ties"))
    val grpAgg = cells
      .join(ranked.select(g :+ col("__v") :+ col("__r2"): _*), keyCols :+ "__v")
      .groupBy(g :+ col("grp"): _*)
      .agg(sum("__c").as("__ng"),
        sum(col("__c").cast(dec) * col("__r2").cast(dec)).as("__r2sum"))
    // pivot the ≤2 groups wide by label order (lo = the smaller label):
    // label frame is group-cardinality-sized, one key exchange shared by
    // the window and the conditional agg
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = grpAgg
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("__ng"))).as("__ng_lo"),
        max(when(col("grp") === col("grp_hi"), col("__ng"))).as("__ng_hi"),
        max(when(col("grp") === col("grp_lo"), col("__r2sum"))).as("__r2sum"))
    val frame =
      (if (keyCols.isEmpty) wide.crossJoin(tot) else wide.join(tot, keyCols))
    val n1D = col("__ng_lo").cast(dec)
    val n2D = col("__ng_hi").cast(dec)
    val nD = col("n").cast(dec)
    val twoU1 = col("__r2sum") - n1D * (n1D + 1)
    val varNum = n1D * n2D * ((nD + 1) * nD * (nD - 1) - col("__ties"))
    val zNum = twoU1 - n1D * n2D
    val zDen = lit(2d) * sqrt(varNum.cast("double") /
      (lit(12d) * col("n").cast("double") * (col("n").cast("double") - 1d)))
    val two = col("__ngrps") === 2L
    frame
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_lo", when(two, col("__ng_lo")))
      .withColumn("n_hi", when(two, col("__ng_hi")))
      .withColumn("u2_lo", when(two, twoU1.cast("string")))
      .withColumn("u2_hi", when(two, (n1D * n2D * 2 - twoU1).cast("string")))
      .withColumn("var_num", when(two, varNum.cast("string")))
      .withColumn("z", when(two && varNum > lit(0L).cast(dec),
        zNum.cast("double") / zDen))
      // Cliff's delta (Cliff 1993) — the effect SIZE beside the test
      // (the cmh/or_mh pairing rule): δ = (#(lo>hi) − #(lo<hi))/(n₁n₂).
      // The ½-tie terms inside each U cancel in the difference, so
      // δ = (2U₁ − 2U₂)/(2n₁n₂) EXACTLY from the doubled integers —
      // one pinned division, no new pass
      .withColumn("cliffs_delta", when(two && col("__ng_lo") > 0L && col("__ng_hi") > 0L,
        (twoU1 - (n1D * n2D * 2 - twoU1)).cast("double") /
          (lit(2d) * col("__ng_lo").cast("double") * col("__ng_hi").cast("double"))))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("u2_lo") :+ col("u2_hi") :+
        col("var_num") :+ col("z") :+ col("cliffs_delta"): _*)
  }

  /** The ordinal effect-size card (Cliff 1993, 1996; the read R's
    * effsize::cliff.delta prints beside a Mann–Whitney test): HOW BIG
    * is the two-sample ordinal difference — Cliff's dominance
    * δ = P(lo > hi) − P(lo < hi), the common-language effect size
    * CLES = P(lo > hi) + ½P(lo = hi) = (δ+1)/2 (probability of
    * superiority, ties split), Cliff's CONSISTENT variance estimate
    *
    *   var(δ̂) = (n₂²·Σᵢ(dᵢ.−δ̂)² + n₁²·Σⱼ(d.ⱼ−δ̂)² − Σᵢⱼ(dᵢⱼ−δ̂)²)
    *            / (n₁n₂(n₁−1)(n₂−1))
    *
    * and the ASYMMETRIC CI from Cliff's transformation (respects the
    * [−1, 1] bounds where a symmetric z-interval spills):
    * (δ − δ³ ∓ z·s·√(1 − 2δ² + δ⁴ + z²s²)) / (1 − δ² + z²s²).
    *
    * EXACT at scale (no n₁×n₂ dominance matrix anywhere): all three
    * Σ-terms collapse onto the VALUE-CELL frame — units sharing a value
    * share their row/column dominance mean, so dᵢ. = (#hi<v − #hi>v)/n₂
    * is constant per cell and each Σ is a cell-weighted sum off ONE
    * value-ordered cumulative window; Σᵢⱼ(dᵢⱼ−δ̂)² reduces by the
    * dominance identities to n₁n₂ − T − n₁n₂δ̂² with T the exact tied
    * pair count. The dominance numerator Σᵢⱼdᵢⱼ and T are exact
    * DECIMAL; the deviation TERMS pass through double and land at 1e9
    * before an order-free DECIMAL sum (the Brown–Forsythe
    * deviations-exact / terms-rounded split); δ̂, var, CI are fixed
    * dags over the landed sums, gated at 9dp. The variance clamps at 0
    * (the unbiased estimator can round below zero at degenerate δ̂ =
    * ±1); δ̂ = ±1 with zero variance emits the point CI.
    *
    * ORIENTATION: lo = the lexicographically smaller label (the
    * [[mannWhitney]] rule); δ here equals [[mannWhitneyFromCells]]'s
    * `cliffs_delta` EXACTLY (spec-pinned). NULL statistics when
    * n_groups ≠ 2 or either side has n < 2. SCALE: everything after
    * the (group, value) count agg is value-cardinality bookkeeping
    * (bucket continuous columns first — the rank-family contract).
    */
  def cliffsDelta(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String,
      alpha: Double = 0.05d
  ): DataFrame =
    cliffsDeltaFromCells(rankCells(df, keyCols, groupCol, valueCol),
      keyCols, alpha)

  /** [[cliffsDelta]] from a (possibly folded) [[rankCells]] frame. */
  def cliffsDeltaFromCells(
      cellsIn: DataFrame,
      keyCols: Seq[String],
      alpha: Double = 0.05d
  ): DataFrame = {
    require(alpha == 0.05d, s"only the pinned alpha = 0.05 is supported: $alpha")
    val z = 1.959964d
    val g = keyCols.map(col)
    val cells = fromRankCells(cellsIn, keyCols)
    val wKeyAll = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val labeled = cells
      .withColumn("grp_lo", min("grp").over(wKeyAll))
      .withColumn("grp_hi", max("grp").over(wKeyAll))
      .withColumn("__ngrps",
        size(collect_set(col("grp")).over(wKeyAll)).cast("long"))
    // per distinct value: counts on each side
    val vals = labeled
      .groupBy(g ++ Seq(col("grp_lo"), col("grp_hi"), col("__ngrps"),
        col("__v")): _*)
      .agg(sum(when(col("grp") === col("grp_lo"), col("__c"))
          .otherwise(0L)).as("__tlo"),
        sum(when(col("grp") =!= col("grp_lo"), col("__c"))
          .otherwise(0L)).as("__thi"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = vals
      .withColumn("__hilt", coalesce(sum("__thi").over(wCum), lit(0L)))
      .withColumn("__lolt", coalesce(sum("__tlo").over(wCum), lit(0L)))
      .withColumn("__n1", sum("__tlo").over(wKey))
      .withColumn("__n2", sum("__thi").over(wKey))
      .withColumn("__higt", col("__n2") - col("__hilt") - col("__thi"))
      .withColumn("__logt", col("__n1") - col("__lolt") - col("__tlo"))
    // the exact dominance numerator and tie count, then the deviation
    // terms: exact DECIMAL deviations, 1e9-landed double terms (the
    // brownForsythe split), order-free DECIMAL sums
    val n1D = col("__n1").cast(dec); val n2D = col("__n2").cast(dec)
    val dNum = (col("__tlo").cast(dec) *
      (col("__hilt") - col("__higt")).cast(dec))
    val tiedNum = col("__tlo").cast(dec) * col("__thi").cast(dec)
    // the exact dominance sum lands on every cell row via one more
    // window over the SAME key partition (no join back)
    val back = cum.withColumn("__D", sum(dNum).over(wKey))
    val kD = (n1D * n2D).cast("double")
    // d_i. for a LO unit at v is (#hi<v − #hi>v)/n2; d_.j for a HI unit
    // at w is (#lo>w − #lo<w)/n1 (the sign flips with the side — d_ij =
    // sign(x_i − y_j) reads opposite ways along rows and columns)
    val eLo = (col("__hilt") - col("__higt")).cast(dec) * n1D - col("__D")
    val eHi = (col("__logt") - col("__lolt")).cast(dec) * n2D - col("__D")
    // ANSI: a one-group key has k = 0 — the guard keeps the division
    // from ever running there (ok masks the output anyway)
    val bothLive = col("__n1") > 0L && col("__n2") > 0L
    val qLo = when(bothLive, eLo.cast("double") / kD)
    val qHi = when(bothLive, eHi.cast("double") / kD)
    val termLo9 = round(col("__tlo").cast("double") * (qLo * qLo) * 1e9d)
      .cast(dec)
    val termHi9 = round(col("__thi").cast("double") * (qHi * qHi) * 1e9d)
      .cast(dec)
    val terms = back
      .groupBy(g ++ Seq(col("grp_lo"), col("grp_hi"), col("__ngrps"),
        col("__n1"), col("__n2"), col("__D")): _*)
      .agg(sum(tiedNum).as("__T"),
        sum(termLo9).as("__s1_9"), sum(termHi9).as("__s2_9"))
    val n1F = col("__n1").cast("double"); val n2F = col("__n2").cast("double")
    val kF = (n1D * n2D).cast("double")
    val delta = col("__D").cast("double") / kF
    val s1 = col("__s1_9").cast("double") / 1e9d
    val s2 = col("__s2_9").cast("double") / 1e9d
    val s3 = kF - col("__T").cast("double") - kF * (delta * delta)
    val varRaw = (n2F * n2F * s1 + n1F * n1F * s2 - s3) /
      (n1F * n2F * (n1F - 1d) * (n2F - 1d))
    val ok = col("__ngrps") === 2L && col("__n1") >= 2L && col("__n2") >= 2L
    val staged = terms
      .withColumn("__delta", when(ok, delta))
      .withColumn("__var", when(ok, greatest(varRaw, lit(0d))))
      .withColumn("__sd", sqrt(col("__var")))
    val d = col("__delta"); val sd = col("__sd"); val v = col("__var")
    val zz = lit(z) * lit(z)
    val den = (lit(1d) - d * d) + zz * v
    val rad = sqrt(greatest(
      lit(1d) - lit(2d) * (d * d) + (d * d) * (d * d) + zz * v, lit(0d)))
    val ciLo = when(den > 0d,
      (d - d * d * d - lit(z) * sd * rad) / den).otherwise(d)
    val ciHi = when(den > 0d,
      (d - d * d * d + lit(z) * sd * rad) / den).otherwise(d)
    staged
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_lo", when(col("__ngrps") === 2L, col("__n1")))
      .withColumn("n_hi", when(col("__ngrps") === 2L, col("__n2")))
      .withColumn("num_d", when(col("__ngrps") === 2L,
        col("__D").cast("string")))
      .withColumn("n_tied_pairs", when(col("__ngrps") === 2L,
        col("__T").cast("string")))
      .withColumn("cliffs_delta", d)
      .withColumn("cles", when(ok, (d + lit(1d)) / lit(2d)))
      .withColumn("var_delta", v)
      .withColumn("ci_lo", when(ok, ciLo))
      .withColumn("ci_hi", when(ok, ciHi))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("num_d") :+
        col("n_tied_pairs") :+ col("cliffs_delta") :+ col("cles") :+
        col("var_delta") :+ col("ci_lo") :+ col("ci_hi"): _*)
  }

  /** Brown–Forsythe test (Brown & Forsythe 1974): do k groups share a
    * SCALE — the robust (median-centered) Levene variance-equality
    * test, the dispersion companion of [[kruskalWallis]]'s location
    * test: a curation change that leaves every group's median alone but
    * fattens one group's tails is invisible to KW and lights this up.
    * One-way ANOVA on z = |x − med_g| with med_g the LOWER-MEDIAN exact
    * rank selection (rank (n_g+1) div 2 — the madOutliers pin):
    *
    *   W = (N−k)/(k−1) · Σ_g n_g(z̄_g − z̄)² / Σ_g Σ_i (z_gi − z̄_g)²
    *
    * Determinism (the KW discipline — exact integer deviations FIRST,
    * nano terms second): values cast long (integer-units contract), so
    * z, S_g = Σz and Q_g = Σz² are exact; the between deviation
    * D_g = N·S_g − n_g·S and the within numerator E_g = n_g·Q_g − S_g²
    * are DECIMAL integer differences — the DEVIATIONS are exact; the
    * nano TERMS round(1e9·D_g²/(n_g·N²)) / round(1e9·E_g/n_g) pass
    * through double (D_g² can exceed 10²⁵, past double's 2⁵³ exact
    * range), so the 9-decimal result is exact up to that documented
    * double rounding of each term's fixed dag — the same
    * deviations-exact / terms-rounded split as [[kruskalWallis]] —
    * summed order-free, and W is one fixed dag over the two sums,
    * gated at 9 decimals.
    * NULL when k < 2, N ≤ k, or the within sum is 0.
    *
    * SCALE: the cell layout throughout — the median comes from the
    * cumulative window over the per-(keys, grp) DISTINCT-VALUE frame
    * (never a row sort; the [[kruskalWallis]] bound), z/S/Q are
    * cell-weighted sums, and everything after is group-cardinality
    * bookkeeping. Emits one row per (keys, grp): n_g, med, s_abs digit
    * string, with N, k and W replicated (the KW surface shape).
    */
  def brownForsythe(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String
  ): DataFrame =
    brownForsytheFromCells(
      rankCells(df.withColumn("__bf_v", col(valueCol).cast("long")),
        keyCols, groupCol, "__bf_v"), keyCols)

  /** [[brownForsythe]] from a (possibly folded) [[rankCells]] frame —
    * values must already be long (the integer-units contract). */
  def brownForsytheFromCells(cellsIn: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val gg = g :+ col("grp")
    val cells = fromRankCells(cellsIn, keyCols)
      .withColumn("__v", col("__v").cast("long"))
    val wCum = Window.partitionBy(gg: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wGrp = Window.partitionBy(gg: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withCum = cells
      .withColumn("__cum", coalesce(sum("__c").over(wCum), lit(0L)))
      .withColumn("__ng", sum("__c").over(wGrp))
    val medRank = expr("(__ng + 1) div 2")
    val med = withCum
      .filter(col("__cum") < medRank && medRank <= col("__cum") + col("__c"))
      .select(gg :+ col("__v").as("__med"): _*)
    val zD = abs(col("__v") - col("__med")).cast(dec)
    val grpAgg = withCum.join(med, keyCols :+ "grp")
      .groupBy(gg: _*)
      .agg(
        max(col("__ng")).as("n_g"),
        max(col("__med")).as("med"),
        sum(col("__c").cast(dec) * zD).as("__s"),
        sum(col("__c").cast(dec) * zD * zD).as("__q"))
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val tot = grpAgg
      .withColumn("n", sum("n_g").over(wKey))
      .withColumn("k", count(lit(1)).over(wKey))
      .withColumn("__stot", sum("__s").over(wKey))
    val nD = col("n").cast(dec)
    val bigD = nD * col("__s") - col("n_g").cast(dec) * col("__stot")
    val bigE = col("n_g").cast(dec) * col("__q") - col("__s") * col("__s")
    // nano terms land in DECIMAL directly — with integer-unit values the
    // scaled between term can pass 10^25, far outside a long
    val b9 = round(bigD.cast("double") * bigD.cast("double") /
      (col("n_g").cast("double") * col("n").cast("double") * col("n").cast("double")) *
      1e9d).cast(dec)
    val w9 = round(bigE.cast("double") / col("n_g").cast("double") * 1e9d).cast(dec)
    val sums = tot
      .withColumn("__b9s", sum(b9).over(wKey))
      .withColumn("__w9s", sum(w9).over(wKey))
    sums
      .withColumn("w",
        when(col("k") >= 2L && col("n") > col("k") && col("__w9s") > 0L,
          (col("n") - col("k")).cast("double") / (col("k") - 1L).cast("double") *
            (col("__b9s").cast("double") / col("__w9s").cast("double"))))
      .select(g :+ col("grp") :+ col("n_g") :+ col("med") :+
        col("__s").cast("string").as("s_abs") :+
        col("n") :+ col("k") :+ col("w"): _*)
  }

  /** Friedman test + Kendall's W (Friedman 1937; Kendall & Babington
    * Smith 1939): do k TREATMENTS (judges, scorers, model versions)
    * differ systematically across b matched blocks (documents) — the
    * repeated-measures rank ANOVA. Only WITHIN-block ranks enter, so
    * judges on arbitrary different scales compare directly — the
    * multi-judge generalization of [[mcnemar]]'s paired read, with
    * Kendall's W = χ²/(b(k−1)) as the [0,1] concordance effect size
    * (the cmh/or pairing rule).
    *
    *   χ² = 3·Σ_j D_j² / (b·k·(k+1)),   D_j = R2_j − b(k+1)
    *
    * with R2_j the DOUBLED midrank sum of treatment j (the Spearman
    * rank2 trick: 2·rank + t − 1 per cell; Σ_j D_j = 0 built-in) and
    * the tie correction χ²/(1 − ΣT/(b·(k³−k))), T = Σ_blocks Σ_v
    * (t³−t). KW discipline throughout: D_j exact DECIMAL, per-treatment
    * nano terms, fixed dags at 9 decimals.
    *
    * COMPLETE blocks only (the test's own requirement): a block is kept
    * iff it has exactly ONE observation of EVERY treatment; dropped
    * blocks are counted in `n_incomplete` (flag, never guess — the
    * mannWhitney convention). NULL chi2 / tie-corrected statistics when
    * k < 2 (a one-treatment panel has no between-treatment variation to
    * test) or every block is fully tied (C ≤ 0); zero complete blocks
    * emit nothing. The treatment universe and the completeness flag are
    * broadcast 1-row frames INSIDE the dag (r12 ran them as two
    * separate driver count jobs — a 100 TB caller paid two extra
    * full-scan actions per call; folded r13).
    * SCALE: the only ordered window is per BLOCK —
    * k rows each by construction; everything else is treatment- or
    * block-cardinality bookkeeping. Emits one row per treatment with
    * key-level statistics replicated.
    */
  def friedman(
      df: DataFrame,
      blockCol: String,
      treatmentCol: String,
      valueCol: String
  ): DataFrame = {
    val obs = df
      .filter(col(blockCol).isNotNull && col(treatmentCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(blockCol).cast("string").as("__b"),
        col(treatmentCol).cast("string").as("__t"),
        col(valueCol).as("__v"))
    // the treatment universe as a broadcast 1-row frame — part of the
    // dag, not a driver count job
    val kUni = obs.agg(countDistinct("__t").as("__k"))
    val blockProfile = obs.groupBy("__b")
      .agg(countDistinct("__t").as("__kd"), count(lit(1)).as("__cnt"))
      .crossJoin(broadcast(kUni))
      .withColumn("__complete",
        col("__kd") === col("__k") && col("__cnt") === col("__k"))
    // the universe and the incomplete-block count ride ONE broadcast
    // 1-row bookkeeping frame onto the per-treatment output
    val meta = blockProfile.agg(
      coalesce(max("__k"), lit(0L)).as("__k"),
      coalesce(sum(when(col("__complete"), 0L).otherwise(1L)), lit(0L))
        .as("__ninc"))
    val kept = obs.join(
      blockProfile.filter(col("__complete")).select("__b"), Seq("__b"), "left_semi")
    // doubled midranks within each (k-row) block; the per-row tie count
    // __tcnt doubles as the tie-correction carrier — a (block, value)
    // tie group of t rows contributes (t² − 1) per row, so
    // Σ_rows (t² − 1) = Σ_groups (t³ − t) EXACTLY, folding the tie sum
    // into the one per-treatment aggregation instead of a second
    // kept-consuming branch (one fewer evaluation of the whole
    // obs → completeness → semi-join subtree)
    val wRank = Window.partitionBy(col("__b")).orderBy(col("__v"))
    val wTie = Window.partitionBy(col("__b"), col("__v"))
    val ranked = kept
      .withColumn("__tcnt", count(lit(1)).over(wTie))
      .withColumn("__r2", lit(2L) * rank().over(wRank) + col("__tcnt") - 1L)
    val tcD = col("__tcnt").cast(dec)
    val perT = ranked.groupBy("__t")
      .agg(count(lit(1)).as("b"), sum(col("__r2").cast(dec)).as("__r2sum"),
        sum(tcD * tcD - 1).as("__t3t"))
      .crossJoin(broadcast(meta))
    val kD = col("__k").cast(dec)
    val kDbl = col("__k").cast("double")
    val bD = col("b").cast(dec)
    val withD = perT
      .withColumn("__d", col("__r2sum") - bD * (kD + 1))
    val t9 = round(col("__d").cast("double") * col("__d").cast("double") * 3d /
      (col("b").cast("double") * kDbl * (kDbl + 1d)) * 1e9d).cast(dec)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withChi = withD
      .withColumn("__chi9", sum(t9).over(wAll))
      .withColumn("__tsum3",
        coalesce(sum(col("__t3t")).over(wAll), lit(0L).cast(dec)))
      // k = 1 has no between-treatment variation — chi2 is meaningless
      // there, NULLed under the same guard as chi2_tie/w
      .withColumn("chi2",
        when(col("__k") >= 2L, col("__chi9").cast("double") / 1e9d))
    // tie correction C = 1 − T/(b·(k³−k)); all-tied blocks → C ≤ 0 → NULL
    val denom = col("b").cast("double") * (kDbl * kDbl * kDbl - kDbl)
    val cFac = lit(1d) - col("__tsum3").cast("double") / denom
    withChi
      .withColumn("k", col("__k"))
      .withColumn("n_incomplete", col("__ninc"))
      .withColumn("chi2_tie",
        when(col("__k") >= 2L && col("b") > 0L && cFac > 0d, col("chi2") / cFac))
      .withColumn("w",
        when(col("__k") >= 2L && col("b") > 0L && cFac > 0d,
          col("chi2") / cFac / (col("b").cast("double") * (kDbl - 1d))))
      .select(col("__t").as("treatment"), col("b"), col("k"), col("n_incomplete"),
        col("__r2sum").cast("string").as("r2_sum"),
        col("__d").cast("string").as("d"),
        col("chi2"), col("chi2_tie"), col("w"))
  }

  /** Page's trend test (Page 1963): do k ORDERED treatments trend
    * monotonically across b matched blocks — the ordered-alternatives
    * [[friedman]] (Friedman asks "any difference"; Page asks "does
    * quality rise with model version v1 < v2 < v3", which is usually
    * the actual question): L = Σ_j j·R_j over the hypothesized order
    * index j (the treatment's NUMERIC order — treatments must cast to
    * long, the ordinal contract), with
    *
    *   E[L] = b·k·(k+1)²/4,   Var[L] = b·(k³−k)²/(144·(k−1))
    *   z    = (L − E)/√Var    (large-b normal; one-sided — positive z
    *                           means the ranks RISE with j)
    *
    * Friedman discipline throughout: complete blocks only (dropped
    * blocks flagged in n_incomplete), doubled midranks so L2 = Σ j·R2_j
    * is an EXACT DECIMAL integer (L = L2/2), universe/completeness as
    * in-dag broadcast 1-row frames, z a fixed dag at 9dp. The variance
    * is the classical NO-TIES form — midranks keep L exact under ties
    * but Var is then an approximation (stated; the tie-heavy caveat).
    * NULL z when k < 2 or b = 0. Emits one row per treatment:
    * treatment, j, b, r2_sum, with k, n_incomplete, l2, z replicated.
    */
  def pageTrend(
      df: DataFrame,
      blockCol: String,
      treatmentCol: String,
      valueCol: String
  ): DataFrame = {
    val obs = df
      .filter(col(blockCol).isNotNull && col(treatmentCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(blockCol).cast("string").as("__b"),
        col(treatmentCol).cast("long").as("__t"),
        col(valueCol).as("__v"))
    val kUni = obs.agg(countDistinct("__t").as("__k"))
    val blockProfile = obs.groupBy("__b")
      .agg(countDistinct("__t").as("__kd"), count(lit(1)).as("__cnt"))
      .crossJoin(broadcast(kUni))
      .withColumn("__complete",
        col("__kd") === col("__k") && col("__cnt") === col("__k"))
    val meta = blockProfile.agg(
      coalesce(max("__k"), lit(0L)).as("__k"),
      coalesce(sum(when(col("__complete"), 0L).otherwise(1L)), lit(0L))
        .as("__ninc"))
    val kept = obs.join(
      blockProfile.filter(col("__complete")).select("__b"), Seq("__b"), "left_semi")
    val wRank = Window.partitionBy(col("__b")).orderBy(col("__v"))
    val wTie = Window.partitionBy(col("__b"), col("__v"))
    val ranked = kept
      .withColumn("__r2", lit(2L) * rank().over(wRank) + count(lit(1)).over(wTie) - 1L)
    // the hypothesized order index: the treatment's rank by its own
    // numeric value, on the treatment-cardinality frame
    val perT = ranked.groupBy("__t")
      .agg(count(lit(1)).as("b"), sum(col("__r2").cast(dec)).as("__r2sum"))
      .withColumn("j", row_number().over(Window.orderBy(col("__t"))).cast("long"))
      .crossJoin(broadcast(meta))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val kDbl = col("__k").cast("double")
    val bDbl = col("b").cast("double")
    val l2 = sum(col("j").cast(dec) * col("__r2sum")).over(wAll)
    val e = bDbl * kDbl * (kDbl + 1d) * (kDbl + 1d) / 4d
    val v = bDbl * (kDbl * kDbl * kDbl - kDbl) * (kDbl * kDbl * kDbl - kDbl) /
      (lit(144d) * (kDbl - 1d))
    perT
      .withColumn("__l2", l2)
      .withColumn("k", col("__k"))
      .withColumn("n_incomplete", col("__ninc"))
      .withColumn("l2", col("__l2").cast("string"))
      .withColumn("z",
        when(col("__k") >= 2L && col("b") > 0L,
          (col("__l2").cast("double") / 2d - e) / sqrt(v)))
      .select(col("__t").as("treatment"), col("j"), col("b"),
        col("__r2sum").cast("string").as("r2_sum"),
        col("k"), col("n_incomplete"), col("l2"), col("z"))
  }

  /** Cohen's d + Hedges' g (Cohen 1969; Hedges 1981): the MEAN-based
    * two-group effect size — the parametric companion of
    * [[mannWhitney]]'s Cliff's delta (δ reads dominance, d reads
    * standardized mean distance; a heavy-tailed shift can move one and
    * not the other, report both):
    *
    *   d = (m̄₁ − m̄₂) / s_p,  s_p² = (V₁/n₁ + V₂/n₂)/(n₁+n₂−2)
    *   g = d · (1 − 3/(4(n₁+n₂) − 9))     (small-sample correction)
    *
    * with V_i = n_i·Σx² − (Σx)² the EXACT DECIMAL variance numerators
    * (no float mean subtraction — the Neyman/OLS discipline) and the
    * mean difference the exact cross product S₁n₂ − S₂n₁ over n₁n₂.
    * Values cast long (integer-units contract); d/g fixed dags at 9dp;
    * NULL when a side is empty, n ≤ 2, or s_p = 0. >2 groups flagged
    * via n_groups with NULL statistics (the [[mannWhitney]] pivot and
    * convention — lo = smaller label). SCALE: one moments aggregation +
    * group-cardinality pivot.
    */
  def cohensD(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val vD = col(valueCol).cast("long").cast(dec)
    val grpAgg = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("__n"), sum(vD).as("__s"), sum(vD * vD).as("__q"))
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = grpAgg
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("__n"))).as("__n1"),
        max(when(col("grp") === col("grp_hi"), col("__n"))).as("__n2"),
        max(when(col("grp") === col("grp_lo"), col("__s"))).as("__s1"),
        max(when(col("grp") === col("grp_hi"), col("__s"))).as("__s2"),
        max(when(col("grp") === col("grp_lo"), col("__q"))).as("__q1"),
        max(when(col("grp") === col("grp_hi"), col("__q"))).as("__q2"))
    val n1D = col("__n1").cast(dec); val n2D = col("__n2").cast(dec)
    val v1 = n1D * col("__q1") - col("__s1") * col("__s1")
    val v2 = n2D * col("__q2") - col("__s2") * col("__s2")
    val diffNum = col("__s1") * n2D - col("__s2") * n1D
    val two = col("__ngrps") === 2L
    val nTot = col("__n1") + col("__n2")
    val sp2 = (v1.cast("double") / col("__n1").cast("double") +
      v2.cast("double") / col("__n2").cast("double")) /
      (nTot.cast("double") - 2d)
    val dStat = diffNum.cast("double") /
      (col("__n1").cast("double") * col("__n2").cast("double")) / sqrt(sp2)
    val ok = two && col("__n1") > 0L && col("__n2") > 0L && nTot > 2L &&
      (v1 + v2) > 0L
    wide
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_lo", when(two, col("__n1")))
      .withColumn("n_hi", when(two, col("__n2")))
      .withColumn("diff_num", when(two, diffNum.cast("string")))
      .withColumn("var_num_lo", when(two, v1.cast("string")))
      .withColumn("var_num_hi", when(two, v2.cast("string")))
      .withColumn("d", when(ok, dStat))
      .withColumn("g_hedges", when(ok,
        dStat * (lit(1d) - lit(3d) / (lit(4d) * nTot.cast("double") - 9d))))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("diff_num") :+
        col("var_num_lo") :+ col("var_num_hi") :+ col("d") :+
        col("g_hedges"): _*)
  }

  /** Two-proportion EFFECT SIZES — the magnitude panel beside
    * [[twoProportion]]'s z (the test+effect pairing rule: a 100 TB
    * corpus makes a 0.01 pp difference "significant"; these say whether
    * anyone should care). From the same (group, 0/1-success) input and
    * 2-label pivot, with a = s_lo, b = m_lo−s_lo, c = s_hi,
    * d = m_hi−s_hi:
    *
    *   risk_diff  = a/m₁ − c/m₂       (exact cross product / m₁m₂)
    *   risk_ratio = (a·m₂)/(c·m₁)     (one division; NULL at c = 0)
    *   odds_ratio = ad/bc with Woolf's CI exp(ln OR ± 1.96·√Σ1/cell)
    *                (NULL + n_zero_cells flag on any empty cell —
    *                flag, never Haldane-correct silently)
    *   cohens_h   = 2·asin(√p₁) − 2·asin(√p₂)   (the arcsine-stabilized
    *                effect whose detectability doesn't depend on where
    *                the baseline sits)
    *
    * Integer numerators exact in DECIMAL; every surfaced ratio ONE
    * division / fixed transcendental dag at 9dp (the ln/asin
    * correctly-rounded-libm convention). >2 groups flagged via
    * n_groups with NULL statistics. One counting aggregation.
    */
  def proportionEffects(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      successCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val grpAgg = df
      .filter(col(groupCol).isNotNull && col(successCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("__m"), sum(col(successCol).cast("long")).as("__s"))
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = grpAgg
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("__m"))).as("__m1"),
        max(when(col("grp") === col("grp_lo"), col("__s"))).as("__s1"),
        max(when(col("grp") === col("grp_hi"), col("__m"))).as("__m2"),
        max(when(col("grp") === col("grp_hi"), col("__s"))).as("__s2"))
    val two = col("__ngrps") === 2L
    val a = col("__s1"); val b = col("__m1") - col("__s1")
    val c = col("__s2"); val d = col("__m2") - col("__s2")
    val m1D = col("__m1").cast(dec); val m2D = col("__m2").cast(dec)
    val rdNum = col("__s1").cast(dec) * m2D - col("__s2").cast(dec) * m1D
    val okBase = two && col("__m1") > 0L && col("__m2") > 0L
    val zeroCells = (when(a === 0L, 1).otherwise(0) + when(b === 0L, 1).otherwise(0) +
      when(c === 0L, 1).otherwise(0) + when(d === 0L, 1).otherwise(0))
    val lnOr = log((a.cast("double") * d.cast("double")) /
      (b.cast("double") * c.cast("double")))
    val seLn = sqrt(lit(1d) / a.cast("double") + lit(1d) / b.cast("double") +
      lit(1d) / c.cast("double") + lit(1d) / d.cast("double"))
    val p1 = a.cast("double") / col("__m1").cast("double")
    val p2 = c.cast("double") / col("__m2").cast("double")
    wide
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("m_lo", when(two, col("__m1")))
      .withColumn("s_lo", when(two, col("__s1")))
      .withColumn("m_hi", when(two, col("__m2")))
      .withColumn("s_hi", when(two, col("__s2")))
      .withColumn("rd_num", when(two, rdNum.cast("string")))
      .withColumn("risk_diff",
        when(okBase, rdNum.cast("double") /
          (col("__m1").cast("double") * col("__m2").cast("double"))))
      .withColumn("risk_ratio",
        when(okBase && c > 0L,
          (a.cast("double") * col("__m2").cast("double")) /
            (c.cast("double") * col("__m1").cast("double"))))
      .withColumn("n_zero_cells", when(two, zeroCells.cast("long")))
      .withColumn("odds_ratio",
        when(okBase && zeroCells === 0,
          (a.cast("double") * d.cast("double")) /
            (b.cast("double") * c.cast("double"))))
      .withColumn("or_ci_lo",
        when(okBase && zeroCells === 0, exp(lnOr - lit(1.959964d) * seLn)))
      .withColumn("or_ci_hi",
        when(okBase && zeroCells === 0, exp(lnOr + lit(1.959964d) * seLn)))
      .withColumn("cohens_h",
        when(okBase, lit(2d) * asin(sqrt(p1)) - lit(2d) * asin(sqrt(p2))))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("m_lo") :+ col("s_lo") :+ col("m_hi") :+ col("s_hi") :+
        col("rd_num") :+ col("risk_diff") :+ col("risk_ratio") :+
        col("n_zero_cells") :+ col("odds_ratio") :+ col("or_ci_lo") :+
        col("or_ci_hi") :+ col("cohens_h"): _*)
  }

  /** One-way ANOVA F (Fisher 1925): do k groups share a MEAN — the
    * parametric companion of [[kruskalWallis]] (KW reads rank location,
    * F reads mean location under the equal-variance normal model; a
    * heavy-tailed corpus can move one and not the other — run both,
    * the d/δ pairing rule) and the location sibling of
    * [[brownForsythe]]'s scale test, whose exact dag this reuses with
    * z = x instead of |x − med| (no median pass needed):
    *
    *   F = (N−k)/(k−1) · Σ_g n_g(x̄_g − x̄)² / Σ_g Σ_i (x_gi − x̄_g)²
    *
    * Determinism (the KW/BF discipline): values cast long
    * (integer-units contract) so S_g = Σx and Q_g = Σx² are exact; the
    * between deviation D_g = N·S_g − n_g·S and the within numerator
    * E_g = n_g·Q_g − S_g² are DECIMAL integer differences (the
    * deviations are exact; the nano terms round(1e9·D_g²/(n_g·N²)) /
    * round(1e9·E_g/n_g) pass through double — the BF terms-rounded
    * split), summed order-free; F is one fixed dag over the two sums,
    * gated at 9 decimals. NULL when k < 2, N ≤ k, or the within sum
    * is 0. NULL group labels / values dropped.
    *
    * SCALE: ONE moments aggregation (map-side partial) + group-
    * cardinality bookkeeping windows. Emits one row per (keys, grp):
    * n_g, s digit string, with N, k and F replicated (the BF surface).
    */
  def oneWayAnova(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val vD = col(valueCol).cast("long").cast(dec)
    val grpAgg = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("n_g"),
        sum(vD).as("__s"),
        sum(vD * vD).as("__q"))
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val tot = grpAgg
      .withColumn("n", sum("n_g").over(wKey))
      .withColumn("k", count(lit(1)).over(wKey))
      .withColumn("__stot", sum("__s").over(wKey))
    val nD = col("n").cast(dec)
    val bigD = nD * col("__s") - col("n_g").cast(dec) * col("__stot")
    val bigE = col("n_g").cast(dec) * col("__q") - col("__s") * col("__s")
    val b9 = round(bigD.cast("double") * bigD.cast("double") /
      (col("n_g").cast("double") * col("n").cast("double") * col("n").cast("double")) *
      1e9d).cast(dec)
    val w9 = round(bigE.cast("double") / col("n_g").cast("double") * 1e9d).cast(dec)
    val sums = tot
      .withColumn("__b9s", sum(b9).over(wKey))
      .withColumn("__w9s", sum(w9).over(wKey))
    sums
      .withColumn("f",
        when(col("k") >= 2L && col("n") > col("k") && col("__w9s") > 0L,
          (col("n") - col("k")).cast("double") / (col("k") - 1L).cast("double") *
            (col("__b9s").cast("double") / col("__w9s").cast("double"))))
      .select(g :+ col("grp") :+ col("n_g") :+
        col("__s").cast("string").as("s") :+
        col("n") :+ col("k") :+ col("f"): _*)
  }

  /** Pinned ONE-SIDED normal quantiles for the equivalence family —
    * the q149 pinned-data rule: no erf inversion, explicit grid.
    */
  private val zOneSided: Map[Double, Double] = Map(
    0.05 -> 1.644854d, 0.025 -> 1.959964d, 0.01 -> 2.326348d)

  /** TOST equivalence test for two proportions (Schuirmann 1987's two
    * one-sided tests): a dashboard can show "no significant
    * difference" forever without ever showing EQUIVALENT — absence of
    * evidence is not evidence of absence, and launch decisions
    * ("the cheaper model is not worse by more than δ") need the
    * latter. Declare the arms equivalent within ±`margin` iff BOTH
    * one-sided tests reject:
    *
    *   z_L = (Δ̂ + δ)/se ≥ z_{1−α}  AND  z_U = (δ − Δ̂)/se ≥ z_{1−α}
    *   p_tost = max(1 − Φ(z_L), 1 − Φ(z_U))
    *
    * with the UNPOOLED Wald se √(p̂₁(1−p̂₁)/n₁ + p̂₂(1−p̂₂)/n₂) (under
    * equivalence the proportions are not assumed equal — pooling is
    * the null of the wrong test). Φ evaluates IN-ENGINE as the
    * [[GroupSequential.phiCol]] Column dag (codegen'd, no UDF) whose
    * DuckDB rendering is bitwise-identical (the q335 discipline).
    * Determinism: exact counts from ONE aggregation; Δ̂ the exact
    * cross product; z's/p's fixed dags at 9dp; the verdict is a
    * nano-integer compare of min(z_L, z_U) against the PINNED
    * one-sided z (α ∈ {.05, .025, .01} — never a float equality).
    * Conventions: (grp_lo, grp_hi) = (min, max) label, Δ̂ oriented
    * lo − hi; ≠2 groups flags via n_groups; NULL statistics when an
    * arm is empty or both arms are conversion-degenerate (se = 0).
    * SCALE: one counting aggregation + the 2-label pivot.
    */
  def tostTwoProportion(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      hitCol: String,
      margin: Double,
      alpha: Double = 0.05d
  ): DataFrame = {
    val g = keyCols.map(col)
    val counts = df
      .filter(col(groupCol).isNotNull && col(hitCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col(hitCol).cast("boolean"), 1L).otherwise(0L)).as("n_pass"))
    tostTwoProportionFromCounts(counts, keyCols, margin, alpha)
  }

  /** [[tostTwoProportion]] from a (possibly folded) per-(keys, grp)
    * count frame — columns `grp, n, n_pass` (the
    * [[wilsonFromCounts]] shape), so the same standing count state the
    * dashboard's Wilson/monitor stages read also answers the
    * equivalence question.
    */
  def tostTwoProportionFromCounts(
      counts: DataFrame,
      keyCols: Seq[String],
      margin: Double,
      alpha: Double = 0.05d
  ): DataFrame = {
    require(margin > 0d, s"margin must be positive: $margin")
    require(zOneSided.contains(alpha),
      s"alpha must be one of ${zOneSided.keys.toSeq.sorted}: $alpha")
    val bound9 = math.round(zOneSided(alpha) * 1e9d)
    val g = keyCols.map(col)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = counts
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("n"))).as("__n1"),
        max(when(col("grp") === col("grp_lo"), col("n_pass"))).as("__s1"),
        max(when(col("grp") === col("grp_hi"), col("n"))).as("__n2"),
        max(when(col("grp") === col("grp_hi"), col("n_pass"))).as("__s2"))
    val two = col("__ngrps") === 2L
    val n1 = col("__n1").cast("double"); val n2 = col("__n2").cast("double")
    // STAGED projections (the cupedMulti2 Janino discipline): delta/se
    // then the z's land as named non-cheap columns, so the Φ dag isn't
    // inlined once per reuse site — the single wide projection blew the
    // 64 KB consume-function limit. Same trees, bitwise-same values.
    val bothN = col("__n1") > 0L && col("__n2") > 0L
    val staged = wide
      .select(col("*"),
        // ANSI: every staged division carries its own guard — the
        // when(ok)-consumers used to shield these lazily
        when(bothN,
          (col("__s1").cast(dec) * col("__n2").cast(dec) -
            col("__s2").cast(dec) * col("__n1").cast(dec)).cast("double") /
            (n1 * n2)).as("__delta"),
        when(bothN,
          sqrt((col("__s1").cast("double") / n1) *
              (lit(1d) - col("__s1").cast("double") / n1) / n1 +
            (col("__s2").cast("double") / n2) *
              (lit(1d) - col("__s2").cast("double") / n2) / n2)).as("__se"))
      .select(col("*"),
        when(col("__se") > lit(0d),
          (col("__delta") + lit(margin)) / col("__se")).as("__zl"),
        when(col("__se") > lit(0d),
          (lit(margin) - col("__delta")) / col("__se")).as("__zu"))
    val delta = col("__delta"); val se = col("__se")
    val zL = col("__zl"); val zU = col("__zu")
    val pL = lit(1d) - GroupSequential.phiCol(zL)
    val pU = lit(1d) - GroupSequential.phiCol(zU)
    // se > 0 iff at least one arm's conversions sit strictly inside (0, n)
    val live = (col("__s1") > 0L && col("__s1") < col("__n1")) ||
      (col("__s2") > 0L && col("__s2") < col("__n2"))
    val ok = two && col("__n1") > 0L && col("__n2") > 0L && live
    staged
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_lo", when(two, col("__n1")))
      .withColumn("s_lo", when(two, col("__s1")))
      .withColumn("n_hi", when(two, col("__n2")))
      .withColumn("s_hi", when(two, col("__s2")))
      .withColumn("delta", when(two && col("__n1") > 0L && col("__n2") > 0L, delta))
      .withColumn("se", when(ok, se))
      .withColumn("z_lower", when(ok, zL))
      .withColumn("z_upper", when(ok, zU))
      .withColumn("p_tost", when(ok, greatest(pL, pU)))
      .withColumn("equivalent", when(ok,
        round(least(zL, zU) * 1e9d).cast("long") >= bound9))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("s_lo") :+ col("n_hi") :+ col("s_hi") :+
        col("delta") :+ col("se") :+ col("z_lower") :+ col("z_upper") :+
        col("p_tost") :+ col("equivalent"): _*)
  }

  /** [[tostTwoProportion]] for MEAN metrics (latency, cost, tokens per
    * request: "not worse by more than δ units") — the same two
    * one-sided tests on the Welch unpooled se from exact DECIMAL
    * moments (v_i = (n_iΣx² − (Σx)²)/(n_i²(n_i−1)), the [[welchT]]
    * fixed dags), Δ̂ the exact cross product, Φ in-engine, the pinned
    * nano verdict. Same conventions and flags; NULL when either
    * n_i < 2 or both variances are 0.
    */
  def tostMean(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String,
      margin: Double,
      alpha: Double = 0.05d
  ): DataFrame = {
    val g = keyCols.map(col)
    val vD = col(valueCol).cast("long").cast(dec)
    val grpAgg = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("__n"), sum(vD).as("__s"), sum(vD * vD).as("__q"))
    tostMeanFromMoments(grpAgg, keyCols, margin, alpha)
  }

  /** [[tostMean]] from a (possibly folded) per-(keys, grp) moment frame
    * — columns `grp, __n, __s, __q` (the [[welchT]] aggregation shape).
    */
  def tostMeanFromMoments(
      grpAgg: DataFrame,
      keyCols: Seq[String],
      margin: Double,
      alpha: Double = 0.05d
  ): DataFrame = {
    require(margin > 0d, s"margin must be positive: $margin")
    require(zOneSided.contains(alpha),
      s"alpha must be one of ${zOneSided.keys.toSeq.sorted}: $alpha")
    val bound9 = math.round(zOneSided(alpha) * 1e9d)
    val g = keyCols.map(col)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = grpAgg
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("__n"))).as("__n1"),
        max(when(col("grp") === col("grp_lo"), col("__s"))).as("__s1"),
        max(when(col("grp") === col("grp_lo"), col("__q"))).as("__q1"),
        max(when(col("grp") === col("grp_hi"), col("__n"))).as("__n2"),
        max(when(col("grp") === col("grp_hi"), col("__s"))).as("__s2"),
        max(when(col("grp") === col("grp_hi"), col("__q"))).as("__q2"))
    val two = col("__ngrps") === 2L
    val n1D = col("__n1").cast(dec); val n2D = col("__n2").cast(dec)
    val v1 = n1D * col("__q1") - col("__s1") * col("__s1")
    val v2 = n2D * col("__q2") - col("__s2") * col("__s2")
    val n1 = col("__n1").cast("double"); val n2 = col("__n2").cast("double")
    // STAGED projections (the cupedMulti2 Janino discipline) — the
    // inlined Φ-per-reuse-site projection blew the 64 KB limit; same
    // trees as named columns, bitwise-same values
    val staged = wide
      .select(col("*"),
        // ANSI: every staged division carries its own guard — the
        // when(ok)-consumers used to shield these lazily
        when(col("__n1") > 0L && col("__n2") > 0L,
          (col("__s1") * n2D - col("__s2") * n1D).cast("double") / (n1 * n2))
          .as("__delta"),
        when(col("__n1") >= 2L && col("__n2") >= 2L,
          sqrt(v1.cast("double") / (n1 * n1 * (n1 - 1d)) +
            v2.cast("double") / (n2 * n2 * (n2 - 1d)))).as("__se"))
      .select(col("*"),
        when(col("__se") > lit(0d),
          (col("__delta") + lit(margin)) / col("__se")).as("__zl"),
        when(col("__se") > lit(0d),
          (lit(margin) - col("__delta")) / col("__se")).as("__zu"))
    val delta = col("__delta"); val se = col("__se")
    val zL = col("__zl"); val zU = col("__zu")
    val pL = lit(1d) - GroupSequential.phiCol(zL)
    val pU = lit(1d) - GroupSequential.phiCol(zU)
    val ok = two && col("__n1") >= 2L && col("__n2") >= 2L && (v1 + v2) > 0L
    staged
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_lo", when(two, col("__n1")))
      .withColumn("n_hi", when(two, col("__n2")))
      .withColumn("delta",
        when(two && col("__n1") > 0L && col("__n2") > 0L, delta))
      .withColumn("se", when(ok, se))
      .withColumn("z_lower", when(ok, zL))
      .withColumn("z_upper", when(ok, zU))
      .withColumn("p_tost", when(ok, greatest(pL, pU)))
      .withColumn("equivalent", when(ok,
        round(least(zL, zU) * 1e9d).cast("long") >= bound9))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("delta") :+ col("se") :+
        col("z_lower") :+ col("z_upper") :+ col("p_tost") :+
        col("equivalent"): _*)
  }

  /** Paired t-test (Student, the matched-units design): per UNIT both
    * conditions are observed (pre/post the change, control/treatment
    * prompt on the same document) and the between-unit variance —
    * which [[welchT]] must carry — cancels in the per-unit difference:
    * d = x − y, t = d̄/(s_d/√n), df = n − 1. The parametric member of
    * the matched family beside [[mcnemar]] (binary) and
    * [[wilcoxonSignedRank]] (ranks).
    *
    * Determinism: values cast long; n/Σd/Σd² are EXACT DECIMAL sums
    * from ONE aggregation; t = Σd·√(n−1)/√(n·Σd² − (Σd)²) — exact
    * integer pieces, two √s, one division — gated at 9dp. NULL t when
    * n < 2 or the diffs are constant (zero variance — flagged, with
    * the mean kept). Pairs with either side NULL drop. One row per key
    * set. SCALE: one moments aggregation, map-side combined.
    */
  def pairedT(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String
  ): DataFrame =
    pairedTFromCells(pairedDiffCells(df, keyCols, xCol, yCol), keyCols)

  /** The paired family's standing state: per-(keys, d) counts of the
    * per-UNIT differences d = x − y (zeros INCLUDED — the signed-rank
    * read needs its n_zero flag and the t read needs them in n).
    * Additively mergeable ([[mergePairedDiffCells]], fold == rebuild);
    * diff-cardinality-bounded. ONE cell store answers BOTH matched
    * tests — [[pairedTFromCells]] and
    * [[wilcoxonSignedRankFromCells]].
    */
  def pairedDiffCells(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(g :+ (col(xCol).cast("long") - col(yCol).cast("long")).as("d"): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Additive merge of two [[pairedDiffCells]] frames. */
  def mergePairedDiffCells(
      a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keyCols.map(col) :+ col("d")): _*)
      .agg(sum("c").as("c"))

  /** [[pairedT]] from a (possibly folded) [[pairedDiffCells]] frame —
    * the exact moments are Σc, Σc·d, Σc·d² over the bounded cell
    * frame.
    */
  def pairedTFromCells(cells: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val cD = col("c").cast(dec)
    val dD = col("d").cast(dec)
    val agg =
      (if (keyCols.isEmpty) cells.groupBy() else cells.groupBy(g: _*))
        .agg(sum("c").as("n"),
          sum(cD * dD).as("__sd"),
          sum(cD * dD * dD).as("__sdd"))
    val nD = col("n").cast(dec)
    val varNum = nD * col("__sdd") - col("__sd") * col("__sd")
    val nDd = col("n").cast("double")
    val tStat = col("__sd").cast("double") * sqrt(nDd - 1d) /
      sqrt(varNum.cast("double"))
    val ok = col("n") >= 2L && varNum > 0L
    agg
      .withColumn("mean_diff",
        when(col("n") > 0L, col("__sd").cast("double") / nDd))
      .withColumn("var_num", varNum.cast("string"))
      .withColumn("t", when(ok, tStat))
      .withColumn("df", when(ok, nDd - 1d))
      .select(g :+ col("n") :+ col("mean_diff") :+ col("var_num") :+
        col("t") :+ col("df"): _*)
  }

  /** Wilcoxon signed-rank test (Wilcoxon 1945): the NONPARAMETRIC
    * matched-pairs test — [[pairedT]] without the normality bet and
    * [[mannWhitney]]'s within-unit sibling: rank the |d| of the
    * nonzero per-unit differences (AVERAGE ranks on ties — the
    * [[mannWhitney]] doubled-rank discipline, so every rank is an
    * exact integer when doubled), W⁺ = Σ ranks of positive d, and the
    * tie-corrected normal approximation
    *
    *   z = (4W⁺ − n(n+1)) / √((2n(n+1)(2n+1) − Σ(t³−t)) / 3)
    *
    * (the quadrupled form of the textbook W⁺ ∼ N(n(n+1)/4,
    * n(n+1)(2n+1)/24 − Σ(t³−t)/48) — every piece an exact integer,
    * ties over the |d| groups). Zero differences DROP (the
    * standard discard treatment), counted in `n_zero` — flagged,
    * never silent. Determinism: d cast long; per distinct |d| the
    * doubled average rank 2·cum + t + 1 is exact; 2W⁺, the expectation
    * and the variance numerator are exact DECIMAL integers; z is one
    * division, gated at 9dp. NULL z when n = 0 or every |d| ties into
    * one value leaves no variance. Emits n (nonzero pairs), n_zero,
    * w2_plus / var_num (exact doubled integers as digit strings), z.
    * SCALE: one per-unit diff projection + a |d|-cardinality rank
    * fold (cumulative window over distinct |d| values — the
    * [[mannWhitney]] cell shape), never a row sort.
    */
  def wilcoxonSignedRank(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String
  ): DataFrame =
    wilcoxonSignedRankFromCells(
      pairedDiffCells(df, keyCols, xCol, yCol), keyCols)

  /** [[wilcoxonSignedRank]] from a (possibly folded)
    * [[pairedDiffCells]] frame — zeros read from the d = 0 cell,
    * |d| rank cells folded from the signed cells.
    */
  def wilcoxonSignedRankFromCells(
      cells: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    // ONE chain: the d = 0 cell rides the same |d| frame (ad = 0 sorts
    // first, contributes nothing to ranks via the when-guards, and
    // lands as n_zero in the final fold) — no zeros-branch join, so a
    // folded upstream never re-executes per branch
    val vals = cells
      .groupBy(g :+ abs(col("d")).as("__ad"): _*)
      .agg(sum("c").as("__t"),
        sum(when(col("d") > 0L, col("c")).otherwise(0L)).as("__tpos"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__ad"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val nzT = when(col("__ad") > 0L, col("__t")).otherwise(0L)
    val ranked = vals
      .withColumn("__cum", coalesce(sum(nzT).over(wCum), lit(0L)))
      .withColumn("__r2", lit(2L) * col("__cum") + col("__t") + lit(1L))
    val tD = col("__t").cast(dec)
    val nz = col("__ad") > 0L
    val zeroD = lit(0L).cast(dec)
    val tot =
      (if (keyCols.isEmpty) ranked.groupBy() else ranked.groupBy(g: _*))
        .agg(
          sum(when(nz, col("__t")).otherwise(0L)).as("n"),
          sum(when(col("__ad") === 0L, col("__t")).otherwise(0L)).as("n_zero"),
          sum(when(nz, col("__tpos").cast(dec) * col("__r2").cast(dec))
            .otherwise(zeroD)).as("__w2"),
          sum(when(nz, tD * tD * tD - tD).otherwise(zeroD)).as("__ties"))
    val nD = col("n").cast(dec)
    val zNum = lit(2L).cast(dec) * col("__w2") - nD * (nD + 1)
    val varNum = lit(2L).cast(dec) * nD * (nD + 1) * (nD * 2 + 1) - col("__ties")
    val ok = col("n").isNotNull && col("n") > 0L && varNum > 0L
    tot
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("n_zero", coalesce(col("n_zero"), lit(0L)))
      .withColumn("w2_plus", coalesce(col("__w2"), zeroD).cast("string"))
      .withColumn("var_num", varNum.cast("string"))
      .withColumn("z", when(ok,
        zNum.cast("double") / sqrt(varNum.cast("double") / lit(3d))))
      .select(g :+ col("n") :+ col("n_zero") :+ col("w2_plus") :+
        col("var_num") :+ col("z"): _*)
  }

  /** Hodges–Lehmann location estimate for the paired design (Hodges &
    * Lehmann 1963): the EFFECT SIZE beside [[wilcoxonSignedRank]]'s
    * test (the house test-plus-effect pairing rule) — the median of
    * the n(n+1)/2 Walsh averages (dᵢ+dⱼ)/2, i ≤ j, the shift estimator
    * the signed-rank test inverts: robust like the median, ~0.96
    * efficient at the normal unlike it. Zeros INCLUDED (they are
    * differences like any other — only the TEST discards them).
    *
    * EXACT at scale without materializing pairs per row: from the
    * [[pairedDiffCells]] state the Walsh population is the CELL-PAIR
    * grid — (a ≤ b) cell pairs weighted c_a·c_b (doubled; the diagonal
    * c(c+1)), summed per DOUBLED Walsh value s₂ = d_a + d_b — a
    * |d|-cardinality² frame (the kendall-cells bound), never n² rows.
    * The lower median is the smallest s₂ whose doubled cumulative
    * weight clears the doubled pair total (2·cum₂ ≥ T₂ = N(N+1) — the
    * house (T+1) div 2 rank rule, exact integers end to end; hl is the
    * one division s₂/2). NOTE the R delta: on an EVEN pair count R's
    * wilcox.test averages the two middle Walsh values where this takes
    * the LOWER one — a deterministic, fuzz-pinned convention, so hl can
    * sit half a Walsh-grid step below R's. Emits n_pairs2 = N(N+1) and
    * hl2 (exact digit
    * strings) plus hl; empty input yields NULLs, never a crash. SCALE:
    * one cell self-join bounded by distinct-diff cardinality² + one
    * cumulative window.
    */
  def hodgesLehmann(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String
  ): DataFrame =
    hodgesLehmannFromCells(pairedDiffCells(df, keyCols, xCol, yCol), keyCols)

  /** [[hodgesLehmann]] from a (possibly folded) [[pairedDiffCells]]
    * frame.
    */
  def hodgesLehmannFromCells(
      cells: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val a = cells.select((g :+ col("d").as("__da") :+ col("c").as("__ca")): _*)
    val b = cells.select((g :+ col("d").as("__db") :+ col("c").as("__cb")): _*)
    val joined =
      if (keyCols.isEmpty) a.join(b, col("__da") <= col("__db"))
      else a.join(b, keyCols).filter(col("__da") <= col("__db"))
    val caD = col("__ca").cast(dec); val cbD = col("__cb").cast(dec)
    // doubled pair weight: diagonal c(c+1) (each value paired with
    // itself and every later copy), off-diagonal 2·ca·cb
    val w2 = when(col("__da") === col("__db"), caD * (caD + 1))
      .otherwise(lit(2L).cast(dec) * caD * cbD)
    val byS2 = joined
      .withColumn("__s2", col("__da") + col("__db"))
      .withColumn("__w2", w2)
      .groupBy((g :+ col("__s2")): _*)
      .agg(sum("__w2").as("__w2s"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__s2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = byS2
      .withColumn("__cum2", sum("__w2s").over(wCum).cast(dec))
      .withColumn("__t2", sum("__w2s").over(wKey).cast(dec))
    val hit = lit(2L).cast(dec) * col("__cum2") >= col("__t2")
    (if (keyCols.isEmpty) ranked.groupBy() else ranked.groupBy(g: _*))
      .agg(
        max(col("__t2")).as("__t2m"),
        min(when(hit, col("__s2"))).as("__hl2"))
      .withColumn("n_pairs2", col("__t2m").cast("string"))
      .withColumn("hl2", col("__hl2").cast("string"))
      .withColumn("hl", col("__hl2").cast("double") / lit(2d))
      .select(g :+ col("n_pairs2") :+ col("hl2") :+ col("hl"): _*)
  }

  /** TWO-SAMPLE Hodges–Lehmann shift + CI (Hodges & Lehmann 1963;
    * Bauer 1972 for the CI): the effect SIZE beside [[mannWhitney]]'s
    * test (the house test-plus-effect pairing rule) — the median of the
    * m·n cross-pair differences x − y, the shift estimator the MW test
    * inverts, with the confidence interval from inverting the test:
    * CI = [D₍ₖ₊₁₎, D₍ₘₙ₋ₖ₎] order statistics of the differences at
    *
    *   k = max(0, ⌊mn/2 − z_{α/2}·√(mn(m+n+1)/12)⌋)
    *
    * — the LARGE-SAMPLE normal inversion (Lehmann 1975 §5.4; z pinned
    * 1.959964), with NO tie correction in σ and the house LOWER-median
    * convention for the point estimate (R's wilcox.test averages the
    * two middle differences on even mn and uses the exact distribution
    * for small untied samples — documented deltas, both at most one
    * difference-grid step).
    *
    * EXACT at scale without materializing pairs per row: from the
    * [[rankCells]] state the difference population is the (lo-value ×
    * hi-value) CELL-PAIR grid weighted c_lo·c_hi (the kendall-cells
    * bound), summed per integer difference d = v_lo − v_hi (lo − hi,
    * the [[welchT]] sign); the three rank selections (2·cum ≥ T,
    * cum ≥ k+1, cum ≥ mn−k) are exact-integer comparisons on ONE
    * cumulative window. k's dag is the only float (fixed, mirrored in
    * the oracle). Emits per key set: grp_lo/grp_hi/n_groups/n_lo/n_hi,
    * n_pairs (exact digit string), k_alpha, hl/ci_lo/ci_hi (integer-
    * valued doubles on the value grid). ≠2 groups → NULL statistics via
    * n_groups (the [[mannWhitney]] rule). SCALE: one cell-pair grid
    * join bounded by distinct-value cardinality² + one window; never
    * n² rows.
    */
  def hodgesLehmannTwoSample(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String
  ): DataFrame =
    hodgesLehmannTwoSampleFromCells(
      rankCells(df.select(keyCols.map(col) :+ col(groupCol) :+
        col(valueCol).cast("long").as("__vl"): _*), keyCols, groupCol, "__vl"),
      keyCols)

  /** [[hodgesLehmannTwoSample]] from a (possibly folded) [[rankCells]]
    * frame with INTEGER values (cast long upstream — the house
    * integer-units contract).
    */
  def hodgesLehmannTwoSampleFromCells(
      cellsIn: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val cells = fromRankCells(cellsIn, keyCols)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val labeled = cells
      .withColumn("__ngrps", size(collect_set(col("grp")).over(wKey)))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
    val meta = labeled
      .groupBy(g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps"): _*)
      .agg(
        sum(when(col("grp") === col("grp_lo"), col("__c")).otherwise(0L)).as("__m"),
        sum(when(col("grp") =!= col("grp_lo"), col("__c")).otherwise(0L)).as("__n"))
    val lo = labeled.filter(col("grp") === col("grp_lo"))
      .select(g :+ col("__v").cast("long").as("__va") :+ col("__c").as("__ca"): _*)
    val hi = labeled.filter(col("__ngrps") === 2 && col("grp") === col("grp_hi"))
      .select(g :+ col("__v").cast("long").as("__vb") :+ col("__c").as("__cb"): _*)
    val pairs =
      if (keyCols.isEmpty) lo.crossJoin(hi) else lo.join(hi, keyCols)
    val byD = pairs
      .withColumn("__d", col("__va") - col("__vb"))
      .groupBy(g :+ col("__d"): _*)
      .agg(sum(col("__ca").cast(dec) * col("__cb").cast(dec)).as("__w"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byD.withColumn("__cum", sum("__w").over(wCum).cast(dec))
    val joined =
      if (keyCols.isEmpty) ranked.crossJoin(broadcast(meta))
      else ranked.join(broadcast(meta), keyCols)
    val mD = col("__m").cast("double"); val nD2 = col("__n").cast("double")
    val mn = col("__m").cast(dec) * col("__n").cast(dec)
    // the large-sample inversion rank: one fixed float dag, floored to
    // an exact integer, clamped at 0
    val kAlpha = greatest(lit(0L),
      floor(mD * nD2 / lit(2d) -
        lit(1.959964d) * sqrt(mD * nD2 * (mD + nD2 + 1d) / lit(12d)))
        .cast("long"))
    val withK = joined.withColumn("__k", kAlpha)
    val hlHit = lit(2L).cast(dec) * col("__cum") >= mn
    val loHit = col("__cum") >= (col("__k") + 1L).cast(dec)
    val hiHit = col("__cum") >= mn - col("__k").cast(dec)
    // the rank selections live on the pair grid (empty off the 2-group
    // path); the flag row comes from meta so ≠2 groups still emits
    val sel = (if (keyCols.isEmpty) withK.groupBy() else withK.groupBy(g: _*))
      .agg(
        max(mn).as("__mn"), max(col("__k")).as("__ka"),
        min(when(hlHit, col("__d"))).as("__hl"),
        min(when(loHit, col("__d"))).as("__cilo"),
        min(when(hiHit, col("__d"))).as("__cihi"))
    val out =
      if (keyCols.isEmpty) meta.join(sel, lit(true), "left_outer")
      else meta.join(sel, keyCols, "left_outer")
    val two = col("__ngrps") === 2 && col("__m") > 0L && col("__n") > 0L
    out
      .withColumn("n_groups", col("__ngrps").cast("long"))
      .withColumn("n_lo", when(two, col("__m")))
      .withColumn("n_hi", when(two, col("__n")))
      .withColumn("n_pairs", when(two, col("__mn").cast("string")))
      .withColumn("k_alpha", when(two, col("__ka")))
      .withColumn("hl", when(two, col("__hl").cast("double")))
      .withColumn("ci_lo", when(two, col("__cilo").cast("double")))
      .withColumn("ci_hi", when(two, col("__cihi").cast("double")))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("n_pairs") :+ col("k_alpha") :+
        col("hl") :+ col("ci_lo") :+ col("ci_hi"): _*)
  }

  /** Yuen's t on trimmed means (Yuen 1974): the ROBUST two-group mean
    * test the heavy-tail regime needs — Welch's t on raw means is
    * dominated by the tail a 100 TB value column always has, and
    * "cap at p1/p99 then t-test" ad-hockery has no sampling theory;
    * Yuen's does: compare γ-TRIMMED means with the WINSORIZED variance
    * (Tukey–McLaughlin), Welch–Satterthwaite df on the trimmed counts.
    * Per arm with n values sorted, g = ⌊γn⌋ trimmed EACH side,
    * h = n − 2g kept:
    *
    *   x̄t = Σ middle h values / h
    *   s²w = winsorized sample variance (ends clamped to the g+1-th /
    *         (n−g)-th values — the [[graft.operators.Quantiles.winsorize]]
    *         clamp at exact ranks)
    *   se²_i = s²wᵢ·(nᵢ−1) / (hᵢ(hᵢ−1)),  t = (x̄t₁ − x̄t₂)/√(se²₁+se²₂)
    *   df = (se²₁+se²₂)² / (se⁴₁/(h₁−1) + se⁴₂/(h₂−1))
    *
    * γ = 0 (g = 0) reduces EXACTLY to [[welchT]] (spec-pinned) — the
    * same way the winsorized variance reduces to the sample variance.
    * Determinism: values cast long; per arm ONE rank window (value,
    * tie-break — the house exact-rank discipline) feeding exact DECIMAL
    * trimmed/winsorized sums (the clamp contribution is g·v_lo + g·v_hi
    * added as exact integers); trimmed-mean difference is the exact
    * cross product T₁h₂ − T₂h₁; t/df fixed dags at 9dp. Conventions:
    * (grp_lo, grp_hi) = (min, max) label, effect oriented lo − hi,
    * ≠2 groups flagged via n_groups with NULL statistics; NULL when
    * either h < 2 or both winsorized variances are 0. SCALE: one rank
    * window per (keys, grp) partition + one aggregation + the 2-label
    * pivot — the [[graft.operators.Quantiles.winsorize]] cost class
    * (hot groups: the winsorizeBucketed cell-prune layout supplies the
    * same exact ranks; compose it upstream if a group outgrows a
    * reducer sort).
    */
  def yuenT(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String,
      tieBreakCol: String,
      trimPct: Int = 20
  ): DataFrame = {
    require(trimPct >= 0 && trimPct < 50, s"need 0 <= trimPct < 50: $trimPct")
    val g = keyCols.map(col)
    val grp = col(groupCol).cast("string")
    val part = Window.partitionBy((g :+ col("__grp")): _*)
    val ordered = part.orderBy(col(valueCol), col(tieBreakCol))
    val vD = col(valueCol).cast("long").cast(dec)
    val ranked = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__grp", grp)
      .select((g :+ col("__grp") :+ col(valueCol) :+ col(tieBreakCol)): _*)
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__n", count(lit(1)).over(part))
      .withColumn("__g", expr(s"($trimPct * __n) div 100"))
    val mid = col("__rn") > col("__g") && col("__rn") <= col("__n") - col("__g")
    val grpAgg = ranked
      .groupBy((g :+ col("__grp").as("grp")): _*)
      .agg(
        max(col("__n")).as("__n"),
        max(col("__g")).as("__gg"),
        sum(when(mid, vD).otherwise(lit(0L).cast(dec))).as("__ts"),
        sum(when(mid, vD * vD).otherwise(lit(0L).cast(dec))).as("__tq"),
        // the clamp bounds: the g+1-th and (n−g)-th order statistics
        max(when(col("__rn") === col("__g") + 1L, vD)).as("__vlo"),
        max(when(col("__rn") === col("__n") - col("__g"), vD)).as("__vhi"))
      // winsorized sums: middle mass + g copies of each clamp bound,
      // all exact DECIMAL
      .withColumn("__h", col("__n") - lit(2L) * col("__gg"))
      .withColumn("__ws",
        col("__ts") + col("__gg").cast(dec) * (col("__vlo") + col("__vhi")))
      .withColumn("__wq",
        col("__tq") + col("__gg").cast(dec) *
          (col("__vlo") * col("__vlo") + col("__vhi") * col("__vhi")))
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = grpAgg
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("__n"))).as("__n1"),
        max(when(col("grp") === col("grp_lo"), col("__gg"))).as("__g1"),
        max(when(col("grp") === col("grp_lo"), col("__h"))).as("__h1"),
        max(when(col("grp") === col("grp_lo"), col("__ts"))).as("__t1"),
        max(when(col("grp") === col("grp_lo"), col("__ws"))).as("__ws1"),
        max(when(col("grp") === col("grp_lo"), col("__wq"))).as("__wq1"),
        max(when(col("grp") === col("grp_hi"), col("__n"))).as("__n2"),
        max(when(col("grp") === col("grp_hi"), col("__gg"))).as("__g2"),
        max(when(col("grp") === col("grp_hi"), col("__h"))).as("__h2"),
        max(when(col("grp") === col("grp_hi"), col("__ts"))).as("__t2"),
        max(when(col("grp") === col("grp_hi"), col("__ws"))).as("__ws2"),
        max(when(col("grp") === col("grp_hi"), col("__wq"))).as("__wq2"))
    val two = col("__ngrps") === 2L
    // winsorized variance numerators: n·Σw² − (Σw)², exact
    val vw1 = col("__n1").cast(dec) * col("__wq1") - col("__ws1") * col("__ws1")
    val vw2 = col("__n2").cast(dec) * col("__wq2") - col("__ws2") * col("__ws2")
    val n1 = col("__n1").cast("double"); val n2 = col("__n2").cast("double")
    val h1 = col("__h1").cast("double"); val h2 = col("__h2").cast("double")
    // se²_i = s²w·(n−1)/(h(h−1)) = V_w/(n(n−1)) · (n−1)/(h(h−1))
    //       = V_w / n / (h(h−1)) — one exact numerator, two divisions
    val se1 = vw1.cast("double") / n1 / (h1 * (h1 - 1d))
    val se2 = vw2.cast("double") / n2 / (h2 * (h2 - 1d))
    val se = se1 + se2
    // trimmed-mean difference: exact cross product over the kept counts
    val diffNum = col("__t1") * col("__h2").cast(dec) -
      col("__t2") * col("__h1").cast(dec)
    val tStat = diffNum.cast("double") / (h1 * h2) / sqrt(se)
    val dfWs = se * se / (se1 * se1 / (h1 - 1d) + se2 * se2 / (h2 - 1d))
    val ok = two && col("__h1") >= 2L && col("__h2") >= 2L && (vw1 + vw2) > 0L
    wide
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_lo", when(two, col("__n1")))
      .withColumn("n_hi", when(two, col("__n2")))
      .withColumn("g_lo", when(two, col("__g1")))
      .withColumn("g_hi", when(two, col("__g2")))
      .withColumn("h_lo", when(two, col("__h1")))
      .withColumn("h_hi", when(two, col("__h2")))
      .withColumn("mean_trim_lo",
        when(two && col("__h1") > 0L, col("__t1").cast("double") / h1))
      .withColumn("mean_trim_hi",
        when(two && col("__h2") > 0L, col("__t2").cast("double") / h2))
      .withColumn("effect_trim",
        when(two && col("__h1") > 0L && col("__h2") > 0L,
          diffNum.cast("double") / (h1 * h2)))
      .withColumn("t", when(ok, tStat))
      .withColumn("df", when(ok, dfWs))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("g_lo") :+ col("g_hi") :+
        col("h_lo") :+ col("h_hi") :+ col("mean_trim_lo") :+
        col("mean_trim_hi") :+ col("effect_trim") :+ col("t") :+
        col("df"): _*)
  }

  /** Welch's t (Welch 1947): the two-group mean test that does NOT
    * assume equal variances — the inference companion of [[cohensD]]
    * (d sizes the gap, t/df test it) and the parametric sibling of
    * [[mannWhitney]]'s rank test, sharing both their conventions
    * (values cast long; >2 groups flagged via n_groups with NULL
    * statistics; lo = smaller label):
    *
    *   t  = (x̄₁ − x̄₂) / √(v₁/n₁ + v₂/n₂),  v_i = V_i/(n_i(n_i−1))
    *   df = (v₁/n₁ + v₂/n₂)² / ((v₁/n₁)²/(n₁−1) + (v₂/n₂)²/(n₂−1))
    *
    * with V_i = n_i·Σx² − (Σx)² the EXACT DECIMAL variance numerators
    * and the mean difference the exact cross product S₁n₂ − S₂n₁ over
    * n₁n₂ (no float mean subtraction); t and the Welch–Satterthwaite
    * df are fixed dags at 9dp. NULL when either n_i < 2 or both
    * variances are 0. SCALE: one moments aggregation + the 2-label
    * pivot (the cohensD shape).
    */
  def welchT(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val vD = col(valueCol).cast("long").cast(dec)
    val grpAgg = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("__n"), sum(vD).as("__s"), sum(vD * vD).as("__q"))
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = grpAgg
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("__n"))).as("__n1"),
        max(when(col("grp") === col("grp_hi"), col("__n"))).as("__n2"),
        max(when(col("grp") === col("grp_lo"), col("__s"))).as("__s1"),
        max(when(col("grp") === col("grp_hi"), col("__s"))).as("__s2"),
        max(when(col("grp") === col("grp_lo"), col("__q"))).as("__q1"),
        max(when(col("grp") === col("grp_hi"), col("__q"))).as("__q2"))
    val n1D = col("__n1").cast(dec); val n2D = col("__n2").cast(dec)
    val v1 = n1D * col("__q1") - col("__s1") * col("__s1")
    val v2 = n2D * col("__q2") - col("__s2") * col("__s2")
    val diffNum = col("__s1") * n2D - col("__s2") * n1D
    val two = col("__ngrps") === 2L
    // v_i/n_i = V_i / (n_i²(n_i−1)) — each a fixed dag over exact pieces
    val n1 = col("__n1").cast("double"); val n2 = col("__n2").cast("double")
    val se1 = v1.cast("double") / (n1 * n1 * (n1 - 1d))
    val se2 = v2.cast("double") / (n2 * n2 * (n2 - 1d))
    val se = se1 + se2
    val tStat = diffNum.cast("double") / (n1 * n2) / sqrt(se)
    val dfWs = se * se / (se1 * se1 / (n1 - 1d) + se2 * se2 / (n2 - 1d))
    val ok = two && col("__n1") >= 2L && col("__n2") >= 2L && (v1 + v2) > 0L
    wide
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_lo", when(two, col("__n1")))
      .withColumn("n_hi", when(two, col("__n2")))
      .withColumn("diff_num", when(two, diffNum.cast("string")))
      .withColumn("var_num_lo", when(two, v1.cast("string")))
      .withColumn("var_num_hi", when(two, v2.cast("string")))
      .withColumn("t", when(ok, tStat))
      .withColumn("df", when(ok, dfWs))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("diff_num") :+
        col("var_num_lo") :+ col("var_num_hi") :+ col("t") :+ col("df"): _*)
  }

  /** CUPED variance-reduced A/B (Deng, Xu, Kohavi & Walker 2013):
    * adjust the experiment metric y by a PRE-PERIOD covariate x —
    * y′ = y − θ(x − x̄) with θ = cov(y,x)/var(x) pooled — shrinking the
    * effect's variance by the factor 1 − ρ²(x,y): the standard "half
    * the sample size for free" read on top of [[welchT]] when the
    * pre-period metric correlates with the outcome. Randomization makes
    * the adjustment unbiased (x̄_lo ≈ x̄_hi in expectation); the POINT
    * estimate moves exactly when the arms' pre-period means differ —
    * the seasonality/imbalance CUPED exists to remove.
    *
    *   effect = (ȳ_lo − θx̄_lo) − (ȳ_hi − θx̄_hi)
    *   se²    = s²_lo(y−θx)/n_lo + s²_hi(y−θx)/n_hi,  CI ±1.959964·se
    *
    * Determinism: values cast long (the [[welchT]] rule); ALL moments —
    * pooled n/Σx/Σy/Σxy/Σxx and per-arm n/Σx/Σy/Σxx/Σyy/Σxy — are
    * EXACT DECIMAL sums (one aggregation, order-free); θ is one
    * division of exact cross-products (n·Σxy − ΣxΣy over n·Σxx − Σx²),
    * and effect/se/CI are fixed dags over the exact pieces, gated at
    * 9dp. Conventions: (grp_lo, grp_hi) = (min, max) label, effect
    * oriented lo − hi (the welchT sign), ≠2 groups flagged via
    * n_groups with NULL statistics, NULL when var(x) = 0 (θ undefined
    * — use plain Welch) or either n_i < 2. Also emits theta and
    * rho2 = cov²/ (var_x·var_y) — the achieved variance-reduction
    * fraction — plus the UNADJUSTED effect for the side-by-side.
    * SCALE: one moments aggregation + the 2-label pivot; one row out.
    */
  def cuped(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      yCol: String,
      xCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val yD = col(yCol).cast("long").cast(dec)
    val xD = col(xCol).cast("long").cast(dec)
    val grpAgg = df
      .filter(col(groupCol).isNotNull && col(yCol).isNotNull && col(xCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("__n"),
        sum(xD).as("__sx"), sum(yD).as("__sy"),
        sum(xD * xD).as("__sxx"), sum(yD * yD).as("__syy"),
        sum(xD * yD).as("__sxy"))
    cupedFromMoments(grpAgg, keyCols)
  }

  /** [[cuped]] from a (possibly folded) per-(keys, grp) moment frame —
    * columns `grp, __n, __sx, __sy, __sxx, __syy, __sxy` with the sums
    * exact DECIMAL(38,0), the shape [[cuped]]'s own aggregation emits
    * and an additive store fold preserves. This is the from-cells twin
    * the composed A/B dashboard reads (cumulative per-peek moments keyed
    * by peek), so the adjustment a standing store answers is THE q298
    * dag, not a re-implementation.
    */
  def cupedFromMoments(grpAgg: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = grpAgg
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("__n"))).as("__n1"),
        max(when(col("grp") === col("grp_lo"), col("__sx"))).as("__sx1"),
        max(when(col("grp") === col("grp_lo"), col("__sy"))).as("__sy1"),
        max(when(col("grp") === col("grp_lo"), col("__sxx"))).as("__sxx1"),
        max(when(col("grp") === col("grp_lo"), col("__syy"))).as("__syy1"),
        max(when(col("grp") === col("grp_lo"), col("__sxy"))).as("__sxy1"),
        max(when(col("grp") === col("grp_hi"), col("__n"))).as("__n2"),
        max(when(col("grp") === col("grp_hi"), col("__sx"))).as("__sx2"),
        max(when(col("grp") === col("grp_hi"), col("__sy"))).as("__sy2"),
        max(when(col("grp") === col("grp_hi"), col("__sxx"))).as("__sxx2"),
        max(when(col("grp") === col("grp_hi"), col("__syy"))).as("__syy2"),
        max(when(col("grp") === col("grp_hi"), col("__sxy"))).as("__sxy2"))
    val two = col("__ngrps") === 2L
    val nT = (col("__n1") + col("__n2")).cast(dec)
    val sxT = col("__sx1") + col("__sx2"); val syT = col("__sy1") + col("__sy2")
    val sxxT = col("__sxx1") + col("__sxx2"); val syyT = col("__syy1") + col("__syy2")
    val sxyT = col("__sxy1") + col("__sxy2")
    // pooled θ from exact cross-products: cov/var with the common n²
    // normalizer cancelled — one division of two DECIMAL integers
    val covNum = nT * sxyT - sxT * syT
    val varXNum = nT * sxxT - sxT * sxT
    val varYNum = nT * syyT - syT * syT
    val theta = covNum.cast("double") / varXNum.cast("double")
    val n1 = col("__n1").cast("double"); val n2 = col("__n2").cast("double")
    // adjusted arm means: ȳᵢ − θ·x̄ᵢ (the common +θx̄ shift cancels in
    // the difference); raw effect from the exact cross product
    // ANSI: the raw-effect division needs live arms — an all-zero
    // moment row (a store spine's empty peek) must NULL, not divide by 0
    val bothLive = col("__n1") > 0L && col("__n2") > 0L
    val rawEff = (col("__sy1") * col("__n2").cast(dec) -
      col("__sy2") * col("__n1").cast(dec)).cast("double") / (n1 * n2)
    val adjEff = rawEff -
      theta * (col("__sx1") * col("__n2").cast(dec) -
        col("__sx2") * col("__n1").cast(dec)).cast("double") / (n1 * n2)
    // per-arm sample variance of z = y − θx:
    //   [n·Szz − Sz²]/(n(n−1)),  Szz = Syy − 2θSxy + θ²Sxx, Sz = Sy − θSx
    def varAdj(n: Column, sx: Column, sy: Column, sxx: Column, syy: Column,
        sxy: Column): Column = {
      val szz = syy.cast("double") - lit(2d) * theta * sxy.cast("double") +
        theta * theta * sxx.cast("double")
      val sz = sy.cast("double") - theta * sx.cast("double")
      val nDd = n.cast("double")
      (nDd * szz - sz * sz) / (nDd * nDd * (nDd - 1d))
    }
    val se = sqrt(
      varAdj(col("__n1"), col("__sx1"), col("__sy1"), col("__sxx1"),
        col("__syy1"), col("__sxy1")) +
      varAdj(col("__n2"), col("__sx2"), col("__sy2"), col("__sxx2"),
        col("__syy2"), col("__sxy2")))
    val rho2 = covNum.cast("double") * covNum.cast("double") /
      (varXNum.cast("double") * varYNum.cast("double"))
    val ok = two && col("__n1") >= 2L && col("__n2") >= 2L && varXNum > 0L
    wide
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_lo", when(two, col("__n1")))
      .withColumn("n_hi", when(two, col("__n2")))
      .withColumn("theta", when(ok, theta))
      .withColumn("rho2", when(ok && varYNum > 0L, rho2))
      .withColumn("effect_raw", when(two && bothLive, rawEff))
      .withColumn("effect_cuped", when(ok, adjEff))
      .withColumn("se_cuped", when(ok, se))
      .withColumn("ci_lo", when(ok, adjEff - lit(1.959964d) * se))
      .withColumn("ci_hi", when(ok, adjEff + lit(1.959964d) * se))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("theta") :+ col("rho2") :+
        col("effect_raw") :+ col("effect_cuped") :+ col("se_cuped") :+
        col("ci_lo") :+ col("ci_hi"): _*)
  }

  /** CUPED with a VECTOR of pre-period covariates — the multivariate
    * regression adjustment Deng, Xu, Kohavi & Walker 2013 §4 describe
    * (and every large experiment platform runs in practice): adjust the
    * metric by SEVERAL pre-period signals at once,
    * y′ = y − θᵀ(x − x̄) with θ = Var(X)⁻¹ Cov(X, y) pooled, shrinking
    * the effect variance by the multiple-R² of the covariates instead
    * of one covariate's ρ².
    *
    * `xCols` supports ONE covariate (delegates to [[cuped]]'s q298 dag
    * verbatim — the k = 1 reduction is exact by construction) or TWO.
    * For k = 2 the normal-equations solve is CRAMER'S RULE over the
    * EXACT DECIMAL central cross-products
    * (A11 = nΣx1x1 − (Σx1)², A12, A22, b1 = nΣx1y − Σx1Σy, b2 — all
    * exact integers from ONE moments aggregation); the determinant and
    * θ components are fixed double dags over those exact pieces (a
    * det of two exact ~10²⁰ integers would overflow DECIMAL(38,0), so
    * the two multiplications land in doubles — deterministic, same
    * rounding both engines). Emits theta1/theta2 (theta2 NULL at
    * k = 1), rho2 = the achieved multiple-R² (θᵀb over the y central
    * moment), effect_raw, effect_cuped, se_cuped and the 95% CI — the
    * [[cupedFromMoments]] column contract widened by one component.
    * NULL statistics when det(Var X) ≤ 0 (collinear or constant
    * covariates — use fewer covariates) or either n < 2; ≠2 groups
    * flagged via n_groups. SCALE: one moments aggregation (map-side
    * combined) + the 2-label pivot; one row out per key set.
    */
  def cupedMulti(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      yCol: String,
      xCols: Seq[String]
  ): DataFrame = xCols match {
    case Seq(x1) =>
      val one = cuped(df, keyCols, groupCol, yCol, x1)
      val g = keyCols.map(col)
      one.select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("theta").as("theta1") :+
        lit(null).cast("double").as("theta2") :+ col("rho2") :+
        col("effect_raw") :+ col("effect_cuped") :+ col("se_cuped") :+
        col("ci_lo") :+ col("ci_hi"): _*)
    case Seq(x1, x2) =>
      val g = keyCols.map(col)
      val yD = col(yCol).cast("long").cast(dec)
      val x1D = col(x1).cast("long").cast(dec)
      val x2D = col(x2).cast("long").cast(dec)
      val grpAgg = df
        .filter(col(groupCol).isNotNull && col(yCol).isNotNull &&
          col(x1).isNotNull && col(x2).isNotNull)
        .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
        .agg(count(lit(1)).as("__n"),
          sum(yD).as("__sy"), sum(yD * yD).as("__syy"),
          sum(x1D).as("__sx1"), sum(x2D).as("__sx2"),
          sum(x1D * x1D).as("__sx1x1"), sum(x2D * x2D).as("__sx2x2"),
          sum(x1D * x2D).as("__sx1x2"),
          sum(x1D * yD).as("__sx1y"), sum(x2D * yD).as("__sx2y"))
      cupedMulti2FromMoments(grpAgg, keyCols)
    case other => throw new IllegalArgumentException(
      s"cupedMulti supports 1 or 2 covariates, got ${other.size}: $other")
  }

  /** [[cupedMulti]]'s two-covariate dag from a (possibly folded)
    * per-(keys, grp) moment frame — columns `grp, __n, __sy, __syy,
    * __sx1, __sx2, __sx1x1, __sx2x2, __sx1x2, __sx1y, __sx2y` with the
    * sums exact DECIMAL(38,0) (the shape [[cupedMulti]]'s own
    * aggregation emits and an additive store fold preserves).
    */
  def cupedMulti2FromMoments(grpAgg: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val moments = Seq("__n", "__sy", "__syy", "__sx1", "__sx2", "__sx1x1",
      "__sx2x2", "__sx1x2", "__sx1y", "__sx2y")
    val wide = grpAgg
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col(moments.head))).as(moments.head + "1"),
        (moments.tail.map(m =>
          max(when(col("grp") === col("grp_lo"), col(m))).as(m + "1")) ++
         moments.map(m =>
          max(when(col("grp") === col("grp_hi"), col(m))).as(m + "2"))): _*)
    def t(m: String): Column = col(m + "1") + col(m + "2")
    val two = col("__ngrps") === 2L
    val nT = (col("__n1") + col("__n2")).cast(dec)
    // exact central cross-products, pooled: the normal equations' pieces
    val a11 = nT * t("__sx1x1") - t("__sx1") * t("__sx1")
    val a22 = nT * t("__sx2x2") - t("__sx2") * t("__sx2")
    val a12 = nT * t("__sx1x2") - t("__sx1") * t("__sx2")
    val b1 = nT * t("__sx1y") - t("__sx1") * t("__sy")
    val b2 = nT * t("__sx2y") - t("__sx2") * t("__sy")
    val varYNum = nT * t("__syy") - t("__sy") * t("__sy")
    // Cramer in doubles over the exact pieces (the det would overflow
    // DECIMAL(38,0) at scale): fixed dags, same rounding both engines.
    // The pieces and thetas land as NAMED COLUMNS in two narrow
    // projections before the wide output dag: inlining theta into the
    // six varAdj/adjEff reuse sites blew the single consume function
    // past Janino's 64 KB limit (whole-stage fallback); multiply-
    // referenced non-cheap aliases block CollapseProject, so each
    // projection codegens its own method. Same expression trees, same
    // float order — the values are bitwise unchanged.
    val staged = wide
      .select(col("*"),
        a11.cast("double").as("__a11d"), a22.cast("double").as("__a22d"),
        a12.cast("double").as("__a12d"),
        b1.cast("double").as("__b1d"), b2.cast("double").as("__b2d"))
      .select(col("*"),
        (col("__a11d") * col("__a22d") - col("__a12d") * col("__a12d"))
          .as("__det"))
      .select(col("*"),
        // ANSI: the division only exists where ok (det > 0) can hold —
        // a collinear/constant-covariate det = 0 row must NULL here,
        // not divide (every consumer is when(ok, ...)-guarded anyway)
        when(col("__det") > lit(0d),
          (col("__a22d") * col("__b1d") - col("__a12d") * col("__b2d")) /
            col("__det")).as("__theta1"),
        when(col("__det") > lit(0d),
          (col("__a11d") * col("__b2d") - col("__a12d") * col("__b1d")) /
            col("__det")).as("__theta2"))
    val det = col("__det")
    val theta1 = col("__theta1")
    val theta2 = col("__theta2")
    val b1d = col("__b1d"); val b2d = col("__b2d")
    val n1 = col("__n1").cast("double"); val n2 = col("__n2").cast("double")
    val bothLive = col("__n1") > 0L && col("__n2") > 0L
    def rawEff(m: String): Column =
      (col(m + "1") * col("__n2").cast(dec) -
        col(m + "2") * col("__n1").cast(dec)).cast("double") / (n1 * n2)
    val rawY = rawEff("__sy")
    val adjEff = rawY - theta1 * rawEff("__sx1") - theta2 * rawEff("__sx2")
    // per-arm sample variance of z = y − θ1x1 − θ2x2 from the arm's own
    // exact moments: Szz and Sz assembled in one fixed double dag each
    def varAdj(side: String): Column = {
      def c(m: String): Column = col(m + side).cast("double")
      val szz = c("__syy") + theta1 * theta1 * c("__sx1x1") +
        theta2 * theta2 * c("__sx2x2") +
        lit(2d) * theta1 * theta2 * c("__sx1x2") -
        lit(2d) * theta1 * c("__sx1y") - lit(2d) * theta2 * c("__sx2y")
      val sz = c("__sy") - theta1 * c("__sx1") - theta2 * c("__sx2")
      val nDd = c("__n")
      (nDd * szz - sz * sz) / (nDd * nDd * (nDd - 1d))
    }
    val se = sqrt(varAdj("1") + varAdj("2"))
    val rho2 = (theta1 * b1d + theta2 * b2d) / varYNum.cast("double")
    val ok = two && col("__n1") >= 2L && col("__n2") >= 2L && det > lit(0d)
    staged
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_lo", when(two, col("__n1")))
      .withColumn("n_hi", when(two, col("__n2")))
      .withColumn("theta1", when(ok, theta1))
      .withColumn("theta2", when(ok, theta2))
      .withColumn("rho2", when(ok && varYNum > 0L, rho2))
      .withColumn("effect_raw", when(two && bothLive, rawY))
      .withColumn("effect_cuped", when(ok, adjEff))
      .withColumn("se_cuped", when(ok, se))
      .withColumn("ci_lo", when(ok, adjEff - lit(1.959964d) * se))
      .withColumn("ci_hi", when(ok, adjEff + lit(1.959964d) * se))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("theta1") :+ col("theta2") :+
        col("rho2") :+ col("effect_raw") :+ col("effect_cuped") :+
        col("se_cuped") :+ col("ci_lo") :+ col("ci_hi"): _*)
  }

  /** Delta-method ratio-metric A/B (Deng, Knoblich & Lu 2018 — "Applying
    * the Delta method in metric analytics"): the CI for a RATIO metric
    * (clicks/views, bad-tokens/tokens, cost/query) randomized by UNIT
    * when the ratio's denominator varies per unit — the read a naive
    * per-row proportion test gets wrong because rows within a unit are
    * correlated. Per arm the metric is R = Σx/Σy over per-unit
    * (x = numerator, y = denominator) totals, and the delta method gives
    *
    *   var(R) = (s²_x − 2R·s_xy + R²·s²_y) / (n·ȳ²)
    *   effect = R_lo − R_hi,  se = √(var_lo + var_hi),  CI ±1.959964·se
    *
    * Determinism: per-unit values cast long (the [[welchT]] rule); the
    * ONLY aggregation is per-arm n/Σx/Σy/Σxx/Σyy/Σxy as EXACT DECIMAL
    * sums (order-free); each R is one division of exact integers and
    * var/se/CI are fixed dags, gated at 9dp. Conventions: (grp_lo,
    * grp_hi) = (min, max) label, effect oriented lo − hi (the [[welchT]]
    * sign), ≠2 groups flagged via n_groups with NULL statistics; NULL
    * ratio when an arm's Σy = 0; NULL se/CI when either n < 2 or either
    * Σy = 0. SCALE: one moments aggregation (map-side combined) + the
    * 2-label pivot; one row out per key set.
    */
  def deltaRatio(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      numCol: String,
      denCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val xD = col(numCol).cast("long").cast(dec)
    val yD = col(denCol).cast("long").cast(dec)
    val grpAgg = df
      .filter(col(groupCol).isNotNull && col(numCol).isNotNull && col(denCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("__n"),
        sum(xD).as("__sx"), sum(yD).as("__sy"),
        sum(xD * xD).as("__sxx"), sum(yD * yD).as("__syy"),
        sum(xD * yD).as("__sxy"))
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = grpAgg
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("__n"))).as("__n1"),
        max(when(col("grp") === col("grp_lo"), col("__sx"))).as("__sx1"),
        max(when(col("grp") === col("grp_lo"), col("__sy"))).as("__sy1"),
        max(when(col("grp") === col("grp_lo"), col("__sxx"))).as("__sxx1"),
        max(when(col("grp") === col("grp_lo"), col("__syy"))).as("__syy1"),
        max(when(col("grp") === col("grp_lo"), col("__sxy"))).as("__sxy1"),
        max(when(col("grp") === col("grp_hi"), col("__n"))).as("__n2"),
        max(when(col("grp") === col("grp_hi"), col("__sx"))).as("__sx2"),
        max(when(col("grp") === col("grp_hi"), col("__sy"))).as("__sy2"),
        max(when(col("grp") === col("grp_hi"), col("__sxx"))).as("__sxx2"),
        max(when(col("grp") === col("grp_hi"), col("__syy"))).as("__syy2"),
        max(when(col("grp") === col("grp_hi"), col("__sxy"))).as("__sxy2"))
    val two = col("__ngrps") === 2L
    // per-arm ratio + delta-method variance from the exact moments:
    //   s²_x − 2R·s_xy + R²·s²_y over n·ȳ² with the shared (n−1)
    //   sample-variance denominator
    def ratio(sx: Column, sy: Column): Column =
      when(sy =!= lit(0L).cast(dec), sx.cast("double") / sy.cast("double"))
    def varR(n: Column, sx: Column, sy: Column, sxx: Column, syy: Column,
        sxy: Column): Column = {
      val nDd = n.cast("double")
      val r = sx.cast("double") / sy.cast("double")
      val sx2 = (n.cast(dec) * sxx - sx * sx).cast("double")
      val sy2 = (n.cast(dec) * syy - sy * sy).cast("double")
      val sxy2 = (n.cast(dec) * sxy - sx * sy).cast("double")
      val yBar = sy.cast("double") / nDd
      // the n(n−1) normalizer of the exact central cross-products,
      // then /(n·ȳ²): var(R) in one fixed dag
      (sx2 - lit(2d) * r * sxy2 + r * r * sy2) /
        (nDd * (nDd - 1d)) / (nDd * yBar * yBar)
    }
    val r1 = ratio(col("__sx1"), col("__sy1"))
    val r2 = ratio(col("__sx2"), col("__sy2"))
    val eff = r1 - r2
    val okArm = col("__sy1") =!= lit(0L).cast(dec) && col("__sy2") =!= lit(0L).cast(dec)
    val ok = two && okArm && col("__n1") >= 2L && col("__n2") >= 2L
    val se = sqrt(
      varR(col("__n1"), col("__sx1"), col("__sy1"), col("__sxx1"),
        col("__syy1"), col("__sxy1")) +
      varR(col("__n2"), col("__sx2"), col("__sy2"), col("__sxx2"),
        col("__syy2"), col("__sxy2")))
    wide
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_lo", when(two, col("__n1")))
      .withColumn("n_hi", when(two, col("__n2")))
      .withColumn("ratio_lo", when(two, r1))
      .withColumn("ratio_hi", when(two, r2))
      .withColumn("effect", when(two && okArm, eff))
      .withColumn("se", when(ok, se))
      .withColumn("ci_lo", when(ok, eff - lit(1.959964d) * se))
      .withColumn("ci_hi", when(ok, eff + lit(1.959964d) * se))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("ratio_lo") :+ col("ratio_hi") :+
        col("effect") :+ col("se") :+ col("ci_lo") :+ col("ci_hi"): _*)
  }

  /** Sample-ratio-mismatch check (the SRM guardrail — Fabijan et al.
    * 2019's "diagnosing sample ratio mismatch"): BEFORE reading any A/B
    * effect, verify the arms' traffic split matches the design — a
    * mismatched split (broken bucketing, bot filtering one arm, crashed
    * variant) invalidates every downstream statistic, and at 100 TB
    * cadence it is the most common way an experiment silently lies.
    * χ² goodness-of-fit of observed arm counts against the design
    * weights:
    *
    *   χ² = Σ_arms (n_i − N·w_i)² / (N·w_i),   df = k − 1
    *
    * `weights` DEFINES the arm universe (normalized internally, so
    * 50/50 and 1/1 mean the same): a designed arm with zero traffic
    * still contributes its full expected count, and observed groups NOT
    * in the design are excluded from χ² but surfaced in `n_unexpected`
    * — a nonzero value there is itself an SRM. Determinism: counts
    * exact longs; each arm's (n−Nw)²/(Nw) is a fixed per-row dag landed
    * to a nano long, summed order-free in DECIMAL; χ² gates at 9dp.
    * Reading (k = 2, α = 0.001 — the conventional SRM alarm level):
    * χ² > 10.828 rejects the designed split. SCALE: one counting
    * aggregation (map-side combined) + a broadcast k-row design frame;
    * one row out per key set.
    */
  def srmCheck(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      weights: Seq[(String, Double)]
  ): DataFrame = {
    val g = keyCols.map(col)
    val counts = df
      .filter(col(groupCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("__n"))
    srmFromCounts(counts, keyCols, weights)
  }

  /** [[srmCheck]] from a (possibly folded) per-(keys, grp) count frame —
    * columns `grp, __n`, the shape [[srmCheck]]'s own aggregation emits
    * and an additive store fold preserves; the composed A/B dashboard
    * reads it on cumulative per-peek counts so the guardrail a standing
    * store answers is THE q306 dag.
    */
  def srmFromCounts(
      counts: DataFrame,
      keyCols: Seq[String],
      weights: Seq[(String, Double)]
  ): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0d),
      s"weights must be non-empty and positive: $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate arm in weights: $weights")
    val wSum = weights.map(_._2).sum
    val spark = counts.sparkSession
    import spark.implicits._
    val design = broadcast(
      weights.toDF("grp", "__w").withColumn("__w", col("__w") / wSum))
    val g = keyCols.map(col)
    // the design universe per key set: every designed arm present even
    // at zero traffic (a vanished arm is the loudest SRM there is)
    val keyUni =
      if (keyCols.isEmpty) design
      else counts.select(g: _*).distinct().crossJoin(design)
    val joined = keyUni.join(counts, keyCols :+ "grp", "full_outer")
      .na.fill(0L, Seq("__n"))
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // N counts DESIGNED arms only — unexpected traffic is its own flag,
    // not a distortion of every expected count
    val withTot = joined
      .withColumn("__nDesigned",
        sum(when(col("__w").isNotNull, col("__n")).otherwise(0L)).over(wKey))
    val exp = col("__nDesigned").cast("double") * col("__w")
    val dev = col("__n").cast("double") - exp
    val t9 = when(col("__w").isNotNull && col("__nDesigned") > 0L,
      round(dev * dev / exp * 1e9d).cast("long")).otherwise(0L)
    withTot
      .withColumn("__t9", t9)
      .groupBy(g: _*)
      .agg(
        max("__nDesigned").as("n_total"),
        sum(when(col("__w").isNotNull, 1L).otherwise(0L)).as("n_arms"),
        sum(when(col("__w").isNull, col("__n")).otherwise(0L)).as("n_unexpected"),
        sum(when(col("__w").isNotNull, col("__t9")).otherwise(0L)
          .cast(dec)).as("__chi9"))
      .withColumn("df", col("n_arms") - 1L)
      .withColumn("chi2",
        when(col("n_total") > 0L, col("__chi9").cast("double") / 1e9d))
      .select(g :+ col("n_total") :+ col("n_arms") :+ col("n_unexpected") :+
        col("df") :+ col("chi2"): _*)
  }

  /** Cochran's Q (Cochran 1950): did k MATCHED binary treatments differ
    * — [[mcnemar]]'s k-treatment generalization and [[friedman]]'s
    * binary special case: "do the k versions of a quality filter flag
    * the same documents", where per-document matching removes the
    * between-document variance [[twoProportion]] would drown in.
    *
    *   Q = (k−1)·(k·ΣC_j² − T²) / (k·T − ΣR_i²)   ~ χ²_{k−1}
    *
    * (C_j = treatment column totals, R_i = unit row totals, T = grand
    * total, over COMPLETE units — the [[friedman]] completeness rule:
    * units missing any treatment drop, counted in n_incomplete.)
    * Determinism: Q is a pure rational of exact integer counts — ΣC_j²
    * and T as DECIMAL sums over the k-bounded treatment frame, ΣR_i²
    * folded map-side into the same one unit-level aggregation — one
    * division, gated at 9dp. NULL when k < 2 or every complete unit is
    * all-0/all-1 (k·T = ΣR_i² — no discordance, [[mcnemar]]'s b+c = 0
    * boundary). Emits one row per treatment (the [[friedman]] frame
    * shape): treatment, flagged_n (= C_j), n_units, k, n_incomplete, q,
    * df. SCALE: one (unit)-level aggregation (map-side combined) + one
    * k-bounded treatment aggregation + broadcast 1-row metas; never a
    * per-unit sort.
    */
  def cochranQ(
      df: DataFrame,
      unitCol: String,
      treatmentCol: String,
      outcomeCol: String
  ): DataFrame = {
    val obs = df
      .filter(col(unitCol).isNotNull && col(treatmentCol).isNotNull &&
        col(outcomeCol).isNotNull)
      .select(col(unitCol).cast("string").as("__u"),
        col(treatmentCol).cast("string").as("__t"),
        when(col(outcomeCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
    // the treatment universe as a broadcast 1-row frame — part of the
    // dag, not a driver count job (the friedman discipline)
    val kUni = obs.agg(countDistinct("__t").as("__k"))
    val unitProfile = obs.groupBy("__u")
      .agg(countDistinct("__t").as("__kd"), count(lit(1)).as("__cnt"),
        sum("__y").as("__r"))
      .crossJoin(broadcast(kUni))
      .withColumn("__complete",
        col("__kd") === col("__k") && col("__cnt") === col("__k"))
    // T, ΣR², unit counts and k ride ONE broadcast 1-row frame
    val meta = unitProfile.agg(
      coalesce(max("__k"), lit(0L)).as("k"),
      coalesce(sum(when(col("__complete"), 1L).otherwise(0L)), lit(0L))
        .as("n_units"),
      coalesce(sum(when(col("__complete"), 0L).otherwise(1L)), lit(0L))
        .as("n_incomplete"),
      coalesce(sum(when(col("__complete"), col("__r")).otherwise(0L))
        .cast(dec), lit(0L).cast(dec)).as("__tT"),
      coalesce(sum(when(col("__complete"), col("__r") * col("__r"))
        .otherwise(0L)).cast(dec), lit(0L).cast(dec)).as("__rr"))
    val kept = obs.join(
      unitProfile.filter(col("__complete")).select("__u"), Seq("__u"), "left_semi")
    val perT = kept.groupBy("__t")
      .agg(sum("__y").as("flagged_n"))
      .crossJoin(broadcast(meta))
    val kD = col("k").cast(dec)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cc = sum(col("flagged_n").cast(dec) * col("flagged_n").cast(dec)).over(wAll)
    val qNum = (kD - lit(1L).cast(dec)) * (kD * cc - col("__tT") * col("__tT"))
    val qDen = kD * col("__tT") - col("__rr")
    perT
      .withColumn("__qn", qNum)
      .withColumn("__qd", qDen)
      .withColumn("q",
        when(col("k") >= 2L && col("__qd") > lit(0L).cast(dec),
          col("__qn").cast("double") / col("__qd").cast("double")))
      .withColumn("df", when(col("k") >= 2L, col("k") - 1L))
      .select(col("__t").as("treatment"), col("flagged_n"), col("n_units"),
        col("k"), col("n_incomplete"), col("q"), col("df"))
  }

  /** Jonckheere–Terpstra test (Terpstra 1952; Jonckheere 1954): the
    * ORDERED-alternatives location test across k independent groups —
    * [[kruskalWallis]] asks "do the groups differ ANYHOW"; JT asks "does
    * the value RISE with the group order" (quality with model version,
    * latency with batch-size tier) and buys its power from that
    * direction, exactly as [[pageTrend]] does for matched blocks. Groups
    * order by the natural ascending order of the group column's string
    * form (the [[pageTrend]] treatment-order rule — encode the intended
    * order in the label). The statistic is the pairwise Mann–Whitney sum
    *
    *   J = Σ_{i<j} U_ij,  U_ij = #{x_i < x_j} + ½·#{x_i = x_j}
    *   E[J] = (N² − Σn_i²)/4,  z = (J − E[J])/√var
    *
    * with the tie-corrected null variance (Hollander & Wolfe eq. 6.19,
    * the Kendall-S form over group sizes n_i and pooled tie-group sizes
    * t_u):
    *
    *   var = [N(N−1)(2N+5) − Σnᵢ(nᵢ−1)(2nᵢ+5) − Σtᵤ(tᵤ−1)(2tᵤ+5)]/72
    *       + [Σnᵢ(nᵢ−1)(nᵢ−2)·Σtᵤ(tᵤ−1)(tᵤ−2)]/[36N(N−1)(N−2)]
    *       + [Σnᵢ(nᵢ−1)·Σtᵤ(tᵤ−1)]/[8N(N−1)]
    *
    * Determinism: values cast long (the [[welchT]] rule) and reduced to
    * (group, value) CELLS first; 2J (half-units doubled away — the
    * doubled-midrank rule) is an exact DECIMAL sum over ordered cell
    * pairs; E[J] in quarter-units and every variance piece are exact
    * DECIMAL rationals; z is fixed-dag divisions, gated at 9dp. NULL z
    * when k < 2 or var = 0 (all values tied). Emits one row per key
    * set: n_groups, n_total, j2 (= 2J, digit string), ej4 (= 4E[J]),
    * var_num/var-pieces folded to z. SCALE: the pair sum runs on the
    * CELL grid — (group × distinct value)², NOT rows², so the value
    * column must be bounded-cardinality by contract (bucket continuous
    * metrics first — the q210 discipline); one cells aggregation
    * (map-side combined), one key-partitioned cell self-join, k- and
    * tie-bounded bookkeeping aggregations.
    */
  def jonckheereTerpstra(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val cells = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("__grp") :+
        col(valueCol).cast("long").as("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))
    // 2J over ordered cell pairs: lower group strictly before higher,
    // 2·(count of <) + 1·(count of =) — an exact integer
    val a = cells.select(g :+ col("__grp").as("__ga") :+ col("__v").as("__va") :+
      col("__cnt").as("__ca"): _*)
    val b = cells.select(g :+ col("__grp").as("__gb") :+ col("__v").as("__vb") :+
      col("__cnt").as("__cb"): _*)
    val pairCond = col("__ga") < col("__gb") && col("__va") <= col("__vb")
    val pairs =
      (if (keyCols.isEmpty) a.crossJoin(b) else a.join(b, keyCols))
        .filter(pairCond)
        .withColumn("__j2c",
          col("__ca").cast(dec) * col("__cb").cast(dec) *
            when(col("__va") < col("__vb"), 2L).otherwise(1L).cast(dec))
    def grouped(d: DataFrame) =
      if (keyCols.isEmpty) d.groupBy() else d.groupBy(g: _*)
    val j2 = grouped(pairs).agg(sum("__j2c").as("__j2"))
    // group-size pieces: n_i from cells (k-bounded)
    val perG = grouped(cells.groupBy(g :+ col("__grp"): _*)
        .agg(sum("__cnt").as("__n")).withColumn("__nD", col("__n").cast(dec)))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("__nD")).as("__nT"),
        sum(col("__nD") * col("__nD")).as("__sn2"),
        sum(col("__nD") * (col("__nD") - 1) * (col("__nD") * 2 + 5)).as("__sn125"),
        sum(col("__nD") * (col("__nD") - 1) * (col("__nD") - 2)).as("__sn12"),
        sum(col("__nD") * (col("__nD") - 1)).as("__sn1"))
    // pooled tie-group pieces: t_u from value cells across groups
    val perV = grouped(cells.groupBy(g :+ col("__v"): _*)
        .agg(sum("__cnt").as("__t")).withColumn("__tD", col("__t").cast(dec)))
      .agg(
        sum(col("__tD") * (col("__tD") - 1) * (col("__tD") * 2 + 5)).as("__st125"),
        sum(col("__tD") * (col("__tD") - 1) * (col("__tD") - 2)).as("__st12"),
        sum(col("__tD") * (col("__tD") - 1)).as("__st1"))
    // perG is the base frame (always one row per key set); an empty
    // pair set is a LEGITIMATE J = 0 (every lo-group value above every
    // hi-group value), not an absent statistic
    val joined =
      (if (keyCols.isEmpty) perG.crossJoin(perV).crossJoin(j2)
       else perG.join(perV, keyCols).join(j2, keyCols, "left_outer"))
        .withColumn("__j2", coalesce(col("__j2"), lit(0L).cast(dec)))
    val nT = col("__nT")
    val nD = nT.cast("double")
    // E[J] in quarter-units: 4E = N² − Σn² (exact)
    val ej4 = nT * nT - col("__sn2")
    val v1 = (nT * (nT - 1) * (nT * 2 + 5) - col("__sn125") - col("__st125"))
      .cast("double") / 72d
    // N ≤ 2 zeroes the v2/v3 NUMERATORS exactly (every n_i, t_u ≤ 2 ⇒
    // Σn(n−1)(n−2) = 0), so guarding the vanishing denominators with a
    // literal 0 is the formula's own limit, not an approximation
    val v2 = when(nT > 2,
      col("__sn12").cast("double") * col("__st12").cast("double") /
        (lit(36d) * nD * (nD - 1d) * (nD - 2d))).otherwise(lit(0d))
    val v3 = when(nT > 1,
      col("__sn1").cast("double") * col("__st1").cast("double") /
        (lit(8d) * nD * (nD - 1d))).otherwise(lit(0d))
    val varJ = v1 + v2 + v3
    // z from doubled/quadrupled integers: (J − E)/√var = (4J − 4E)/(4√var)
    val zv = (lit(2L).cast(dec) * col("__j2") - ej4).cast("double") /
      (lit(4d) * sqrt(varJ))
    val ok = col("n_groups") >= 2L && varJ > 0d
    joined
      .withColumn("n_total", nT.cast("long"))
      .withColumn("j2", col("__j2").cast("string"))
      .withColumn("ej4", ej4.cast("string"))
      .withColumn("z", when(ok, zv))
      .select(g :+ col("n_groups") :+ col("n_total") :+ col("j2") :+
        col("ej4") :+ col("z"): _*)
  }

  /** Cochran–Armitage trend test (Cochran 1954; Armitage 1955): does a
    * PASS RATE trend monotonically across k ORDERED groups — the
    * binary-outcome member of the ordered-alternatives family
    * ([[jonckheereTerpstra]] for locations, [[pageTrend]] for matched
    * blocks): "does the filter pass rate rise with model version" asked
    * directly of the (group, pass) counts. Groups order by the natural
    * ascending order of the group label (the [[pageTrend]] rule) with
    * integer scores w = 1..k; with T = Σw·r − p̄·Σw·n,
    *
    *   z = T/√var,   var = p̄(1−p̄)·[Σw²n − (Σwn)²/N]
    *
    * ENTIRELY RATIONAL-EXACT: every piece (N, R, Σwn, Σwr, Σw²n) is an
    * exact integer, the numerator N·Σwr − R·Σwn is an exact DECIMAL,
    * and z = num/√(R(N−R)(N·Σw²n − (Σwn)²)/N) is ONE division over one
    * √ of exact-integer dags — no nano landing anywhere. Sign: positive
    * z = pass rate RISING with the label order. NULL z when k < 2, all
    * pass (R = N), none pass (R = 0), or degenerate scores. Emits one
    * row per key set with the exact num digits beside z. SCALE: one
    * (group) counting aggregation + the k-bounded score window; never
    * touches rows after the count.
    */
  def cochranArmitage(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      hitCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val perG = df
      .filter(col(groupCol).isNotNull && col(hitCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("__grp"): _*)
      .agg(count(lit(1)).as("__n"),
        sum(when(col(hitCol).cast("boolean"), 1L).otherwise(0L)).as("__r"))
    val wOrd = Window.partitionBy(g: _*).orderBy(col("__grp"))
    val scored = perG.withColumn("__w", row_number().over(wOrd).cast("long"))
    def grouped(d: DataFrame) =
      if (keyCols.isEmpty) d.groupBy() else d.groupBy(g: _*)
    val agg = grouped(scored).agg(
      count(lit(1)).as("n_groups"),
      sum(col("__n")).as("n_total"),
      sum(col("__r")).as("n_pass"),
      sum(col("__w").cast(dec) * col("__n").cast(dec)).as("__wn"),
      sum(col("__w").cast(dec) * col("__r").cast(dec)).as("__wr"),
      sum(col("__w").cast(dec) * col("__w").cast(dec) * col("__n").cast(dec))
        .as("__wwn"))
    val nD = col("n_total").cast(dec); val rD = col("n_pass").cast(dec)
    val num = nD * col("__wr") - rD * col("__wn")
    val varNum = rD * (nD - rD) * (nD * col("__wwn") - col("__wn") * col("__wn"))
    val ok = col("n_groups") >= 2L && col("n_pass") > 0L &&
      col("n_pass") < col("n_total") && varNum > lit(0L).cast(dec)
    val z = num.cast("double") /
      sqrt(varNum.cast("double") / col("n_total").cast("double"))
    agg
      .withColumn("trend_num", num.cast("string"))
      .withColumn("z", when(ok, z))
      .select(g :+ col("n_groups") :+ col("n_total") :+ col("n_pass") :+
        col("trend_num") :+ col("z"): _*)
  }

  /** Brunner–Munzel test (Brunner & Munzel 2000): the two-sample rank
    * test for H₀: P(X < Y) + ½P(X = Y) = ½ that stays valid when the
    * two groups' RANK VARIANCES differ — [[mannWhitney]] assumes
    * exchangeable spread under H₀ (its variance is a pooled constant)
    * and over/under-rejects when one cohort is rank-noisier; BM
    * studentizes with per-group empirical rank variances and a
    * Welch–Satterthwaite df (the modern default recommendation, e.g.
    * R's lawstat). With pooled midranks R and within-group midranks
    * R⁽ⁱ⁾,
    *
    *   S_i² = 1/(n_i−1)·Σ_k (R_k − R_k⁽ⁱ⁾ − R̄_i + (n_i+1)/2)²
    *   BM = (R̄₂ − R̄₁)·n₁n₂ / (N·√(n₁S₁² + n₂S₂²))
    *   df = (n₁S₁² + n₂S₂²)² / ((n₁S₁²)²/(n₁−1) + (n₂S₂²)²/(n₂−1))
    *
    * plus p̂ = P(lo < hi) + ½P(=) — the stochastic-superiority effect
    * size (= (R̄₂ − (n₂+1)/2)/n₁, exact).
    *
    * Determinism: the [[mannWhitney]] doubled-midrank discipline — per
    * cell Q2 = 2R − 2R⁽ⁱ⁾ is an exact integer, the variance numerator
    * A_i = Σ c·(n_i·Q2 − ΣcQ2)² an exact DECIMAL (count contract:
    * n_i³ ≲ 10³⁸ per key set — DECIMAL's bound, stated), S_i² and
    * BM/df/p̂ single divisions of exact pieces, gated at 9dp.
    * Conventions: values cast long, (grp_lo, grp_hi) = (min, max), ≠2
    * groups flagged with NULL statistics, NULL BM/df when either n < 2
    * or both A_i = 0 (every value tied). BM > 0 ⟺ the HI-labeled group
    * stochastically larger. SCALE: the [[mannWhitneyFromCells]] shape —
    * one cells aggregation, value- and (group × value)-cardinality
    * windows, one row out.
    */
  def brunnerMunzel(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String
  ): DataFrame =
    brunnerMunzelFromCells(
      df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
        .groupBy(keyCols.map(col) :+ col(groupCol).cast("string").as("grp") :+
          col(valueCol).cast("long").as("__v"): _*)
        .agg(count(lit(1)).as("__c")),
      keyCols)

  /** [[brunnerMunzel]] from a (grp, __v, __c) cell frame. */
  def brunnerMunzelFromCells(cellsIn: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val cells = cellsIn.select(g ++ Seq(col("grp"), col("__v"), col("__c")): _*)
    // pooled doubled midranks per value (the mannWhitney machinery)
    val vals = cells.groupBy(g :+ col("__v"): _*).agg(sum("__c").as("__t"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = vals
      .withColumn("__cum", coalesce(sum("__t").over(wCum), lit(0L)))
      .withColumn("__r2", lit(2L) * col("__cum") + col("__t") + lit(1L))
    // within-group doubled midranks per cell
    val wCumG = Window.partitionBy(g :+ col("grp"): _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wGrp = Window.partitionBy(g :+ col("grp"): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withQ = cells
      .withColumn("__cumg", coalesce(sum("__c").over(wCumG), lit(0L)))
      .withColumn("__r2i", lit(2L) * col("__cumg") + col("__c") + lit(1L))
      .join(ranked.select(g :+ col("__v") :+ col("__r2"): _*), keyCols :+ "__v")
      .withColumn("__q2", col("__r2") - col("__r2i"))
      .withColumn("__ng", sum("__c").over(wGrp))
      .withColumn("__t2", sum(col("__c").cast(dec) * col("__q2").cast(dec)).over(wGrp))
    val devNum = col("__ng").cast(dec) * col("__q2").cast(dec) - col("__t2")
    val grpAgg = withQ
      .groupBy(g :+ col("grp"): _*)
      .agg(
        max("__ng").as("__n"),
        sum(col("__c").cast(dec) * col("__r2").cast(dec)).as("__r2sum"),
        sum(col("__c").cast(dec) * devNum * devNum).as("__a"))
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = grpAgg
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("__n"))).as("__n1"),
        max(when(col("grp") === col("grp_lo"), col("__r2sum"))).as("__rs1"),
        max(when(col("grp") === col("grp_lo"), col("__a"))).as("__a1"),
        max(when(col("grp") === col("grp_hi"), col("__n"))).as("__n2"),
        max(when(col("grp") === col("grp_hi"), col("__r2sum"))).as("__rs2"),
        max(when(col("grp") === col("grp_hi"), col("__a"))).as("__a2"))
    val n1 = col("__n1").cast("double"); val n2 = col("__n2").cast("double")
    val n1D = col("__n1").cast(dec); val n2D = col("__n2").cast(dec)
    val nn = n1 + n2
    // (R̄₂ − R̄₁)·n₁n₂ in doubled units: (n₁·R2sum₂ − n₂·R2sum₁)/2
    val num = n1D * col("__rs2") - n2D * col("__rs1")
    // n_i·S_i² = A_i/(4·n_i·(n_i−1))
    val ns1 = col("__a1").cast("double") / (lit(4d) * n1 * (n1 - 1d))
    val ns2 = col("__a2").cast("double") / (lit(4d) * n2 * (n2 - 1d))
    val bm = (num.cast("double") / 2d) / (nn * sqrt(ns1 + ns2))
    val dfW = (ns1 + ns2) * (ns1 + ns2) /
      (ns1 * ns1 / (n1 - 1d) + ns2 * ns2 / (n2 - 1d))
    // p̂ = (R2sum₂ − n₂(n₂+1))/(2·n₁·n₂), exact numerator
    val pHat = (col("__rs2") - n2D * (n2D + 1)).cast("double") / (lit(2d) * n1 * n2)
    val two = col("__ngrps") === 2L
    val ok = two && col("__n1") >= 2L && col("__n2") >= 2L &&
      (col("__a1") + col("__a2")) > lit(0L).cast(dec)
    wide
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_lo", when(two, col("__n1")))
      .withColumn("n_hi", when(two, col("__n2")))
      .withColumn("p_hat", when(two && col("__n1") > 0L && col("__n2") > 0L, pHat))
      .withColumn("a_lo", when(two, col("__a1").cast("string")))
      .withColumn("a_hi", when(two, col("__a2").cast("string")))
      .withColumn("bm", when(ok, bm))
      .withColumn("df", when(ok, dfW))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("p_hat") :+ col("a_lo") :+
        col("a_hi") :+ col("bm") :+ col("df"): _*)
  }

  /** Mood's median test (Mood 1950): do k groups share the pooled
    * MEDIAN — the blunt-but-assumption-free location check beside
    * [[kruskalWallis]] (which needs similar shapes to read as a median
    * test): dichotomize every value at the pooled median (lower-median
    * convention: the smallest value with 2·cum ≥ N — an exact integer
    * rank selection on the value-cell frame, never a sort of rows),
    * then the k×2 Pearson χ² on (group × above/≤) counts with
    * expecteds from the margins. Per-group nano χ² terms over exact
    * integers; χ² at 9dp, df = k−1; NULL when a margin is empty (all
    * values on one side — every value equal to the median). Emits one
    * row per (keys, group): n, n_above, median (the pooled one), plus
    * the shared chi2/df. SCALE: one cells aggregation + value-cell
    * windows + a k-bounded group aggregation.
    */
  def moodMedian(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val cells = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp") :+
        col(valueCol).cast("long").as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val vals = cells.groupBy(g :+ col("__v"): _*).agg(sum("__c").as("__t"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val med = vals
      .withColumn("__cum", sum("__t").over(wCum))
      .withColumn("__N", sum("__t").over(wKey))
      .withColumn("__isMed", lit(2L) * col("__cum") >= col("__N"))
      .groupBy(g: _*)
      .agg(min(when(col("__isMed"), col("__v"))).as("median"))
    val joined =
      if (keyCols.isEmpty) cells.crossJoin(broadcast(med))
      else cells.join(med, keyCols)
    val perG = joined
      .groupBy(g :+ col("grp") :+ col("median"): _*)
      .agg(sum("__c").as("n"),
        sum(when(col("__v") > col("median"), col("__c")).otherwise(0L)).as("n_above"))
    val withTot = perG
      .withColumn("__k", count(lit(1)).over(wKey))
      .withColumn("__N", sum("n").over(wKey))
      .withColumn("__A", sum("n_above").over(wKey))
    val nD = col("__N").cast("double"); val aD = col("__A").cast("double")
    val e1 = col("n").cast("double") * aD / nD
    val e0 = col("n").cast("double") * (nD - aD) / nD
    val d1 = col("n_above").cast("double") - e1
    val d0 = (col("n") - col("n_above")).cast("double") - e0
    val t9 = when(col("__A") > 0L && col("__A") < col("__N"),
      round((d1 * d1 / e1 + d0 * d0 / e0) * 1e9d).cast("long")).otherwise(0L)
    val dec2 = "decimal(38,0)"
    withTot
      .withColumn("__t9", t9)
      .withColumn("__chi9", sum(col("__t9").cast(dec2)).over(wKey))
      .withColumn("chi2",
        when(col("__k") >= 2L && col("__A") > 0L && col("__A") < col("__N"),
          col("__chi9").cast("double") / 1e9d))
      .withColumn("df", when(col("__k") >= 2L, col("__k") - 1L))
      .select(g :+ col("grp") :+ col("median") :+ col("n") :+ col("n_above") :+
        col("chi2") :+ col("df"): _*)
  }

  /** Wilson score interval (Wilson 1927) per group: the proportion CI
    * that stays HONEST at small n and extreme p̂ — the Wald interval
    * p̂ ± z√(p̂(1−p̂)/n) collapses to zero width at p̂ ∈ {0, 1} and
    * undercovers badly below n ≈ 40, exactly the regime of per-slice
    * pass-rate dashboards:
    *
    *   center = (p̂ + z²/2n)/(1 + z²/n)
    *   half   = z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n)
    *
    * z = 1.959964 (the house 95% constant). Exact counts from ONE
    * aggregation; the bounds are fixed dags over them, gated at 9dp;
    * NULL bounds when n = 0 never crash. By construction the interval
    * always lies inside [0, 1] and is non-degenerate at p̂ ∈ {0, 1} —
    * both spec-asserted. One row per (keys, group). SCALE: one counting
    * aggregation, map-side combined.
    */
  def wilsonInterval(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      hitCol: String,
      z: Double = 1.959964d
  ): DataFrame = {
    val g = keyCols.map(col)
    val counts = df
      .filter(col(groupCol).isNotNull && col(hitCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col(hitCol).cast("boolean"), 1L).otherwise(0L)).as("n_pass"))
    wilsonFromCounts(counts, keyCols, z)
  }

  /** [[wilsonInterval]] from a (possibly folded) per-(keys, grp) count
    * frame — columns `grp, n, n_pass`, the shape [[wilsonInterval]]'s
    * own aggregation emits and an additive store fold preserves; the
    * composed A/B dashboard reads it on cumulative per-peek counts so
    * the per-arm CI a standing store answers is THE q324 dag.
    */
  def wilsonFromCounts(
      counts: DataFrame,
      keyCols: Seq[String],
      z: Double = 1.959964d
  ): DataFrame = {
    require(z > 0d, s"z must be positive: $z")
    val g = keyCols.map(col)
    val nD = col("n").cast("double")
    val p = col("n_pass").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1d) + z2 / nD
    val center = (p + z2 / (lit(2d) * nD)) / denom
    val half = lit(z) * sqrt(p * (lit(1d) - p) / nD +
      z2 / (lit(4d) * nD * nD)) / denom
    counts
      .withColumn("p_hat", when(col("n") > 0L, p))
      .withColumn("ci_lo", when(col("n") > 0L, center - half))
      .withColumn("ci_hi", when(col("n") > 0L, center + half))
      .select(g :+ col("grp") :+ col("n") :+ col("n_pass") :+ col("p_hat") :+
        col("ci_lo") :+ col("ci_hi"): _*)
  }

  /** Pinned normal quantiles for the power family — the q149
    * pinned-data rule: no erf inversion anywhere, the supported
    * (α, power) grid is explicit and each z is the published 6dp
    * constant (two-sided z_{α/2}; one-sided z_{1−β}).
    */
  private val zTwoSided: Map[Double, Double] = Map(
    0.10 -> 1.644854d, 0.05 -> 1.959964d, 0.01 -> 2.575829d)
  private val zPower: Map[Double, Double] = Map(
    0.5 -> 0.0d, 0.8 -> 0.841621d, 0.9 -> 1.281552d, 0.95 -> 1.644854d)

  private def zSumCols(alpha: Double, power: Double): (Column, Column) = {
    require(zTwoSided.contains(alpha),
      s"alpha must be one of ${zTwoSided.keys.toSeq.sorted}: $alpha")
    require(zPower.contains(power),
      s"power must be one of ${zPower.keys.toSeq.sorted}: $power")
    // the SUM is formed in the engine (lit+lit), so the oracle's
    // (zA + zB) literal addition reproduces the identical double
    val zs = lit(zTwoSided(alpha)) + lit(zPower(power))
    (zs, zs * zs)
  }

  /** Power / minimum-detectable-effect panel for a TWO-PROPORTION A/B
    * (the normal-approximation closed forms every experiment sizing
    * table publishes — e.g. Fleiss, Levin & Paik 2003 ch. 4's pooled
    * form): from the SAME per-arm count state the monitors and Wilson
    * CIs read, answer the two design questions a dashboard owes BEFORE
    * any effect is read —
    *
    *   MDE(n)  = (z_{α/2} + z_{1−β}) · √(p̄(1−p̄)(1/n₁ + 1/n₂))
    *   n(MDE)  = ⌈ 2·p̄(1−p̄)·(z_{α/2}+z_{1−β})² / MDE² ⌉  per arm
    *
    * with p̄ the pooled conversion rate the state already holds (the
    * planning-stage stand-in for the baseline). At power = 0.5 the MDE
    * reduces EXACTLY to the Wald radius z_{α/2}·se — the fixed-test
    * closure the spec pins. Determinism: exact counts; z's from the
    * pinned table (never an erf inversion); every output a fixed dag
    * over them, gated at 9dp; ⌈·⌉ an integer long. Conventions:
    * (grp_lo, grp_hi) = (min, max) label; ≠2 groups flagged via
    * n_groups with NULL statistics; NULL when either arm is empty or
    * p̄ ∈ {0, 1} (no variance to power against). One row per key set;
    * SCALE: the pivot + fixed dags over the already-bounded count
    * frame — nothing row-scale happens here.
    */
  def powerTwoProportionFromCounts(
      counts: DataFrame,
      keyCols: Seq[String],
      targetMde: Double,
      alpha: Double = 0.05d,
      power: Double = 0.8d
  ): DataFrame = {
    require(targetMde > 0d, s"targetMde must be positive: $targetMde")
    val (zs, zs2) = zSumCols(alpha, power)
    val g = keyCols.map(col)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = counts
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("n"))).as("__n1"),
        max(when(col("grp") === col("grp_lo"), col("n_pass"))).as("__s1"),
        max(when(col("grp") === col("grp_hi"), col("n"))).as("__n2"),
        max(when(col("grp") === col("grp_hi"), col("n_pass"))).as("__s2"))
    val n1 = col("__n1").cast("double"); val n2 = col("__n2").cast("double")
    val pPool = (col("__s1") + col("__s2")).cast("double") /
      (col("__n1") + col("__n2")).cast("double")
    val pq = pPool * (lit(1d) - pPool)
    val mde = zs * sqrt(pq * (lit(1d) / n1 + lit(1d) / n2))
    val nReq = ceil(lit(2d) * pq * zs2 / (lit(targetMde) * lit(targetMde)))
      .cast("long")
    val two = col("__ngrps") === 2L
    val live = two && col("__n1") > 0L && col("__n2") > 0L
    val ok = live && (col("__s1") + col("__s2")) > 0L &&
      (col("__s1") + col("__s2")) < (col("__n1") + col("__n2"))
    wide
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_lo", when(two, col("__n1")))
      .withColumn("n_hi", when(two, col("__n2")))
      .withColumn("p_pool", when(live, pPool))
      .withColumn("mde_abs", when(ok, mde))
      .withColumn("mde_rel", when(ok, mde / pPool))
      .withColumn("n_required_per_arm", when(ok, nReq))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("p_pool") :+ col("mde_abs") :+
        col("mde_rel") :+ col("n_required_per_arm"): _*)
  }

  /** Row-level wrapper of [[powerTwoProportionFromCounts]] — the
    * [[wilsonInterval]] counting aggregation, then the panel.
    */
  def powerTwoProportion(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      hitCol: String,
      targetMde: Double,
      alpha: Double = 0.05d,
      power: Double = 0.8d
  ): DataFrame = {
    val g = keyCols.map(col)
    val counts = df
      .filter(col(groupCol).isNotNull && col(hitCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col(hitCol).cast("boolean"), 1L).otherwise(0L)).as("n_pass"))
    powerTwoProportionFromCounts(counts, keyCols, targetMde, alpha, power)
  }

  /** Power / MDE panel for a MEAN-metric A/B (the normal-approximation
    * two-sample forms): from per-arm exact moment state (n, Σy, Σy² —
    * the [[cuped]]/mSPRT fold shape),
    *
    *   σ̂²_pool = (V₁/n₁ + V₂/n₂) / (n₁+n₂−2),  V = n·Σy² − (Σy)²
    *   MDE(n)  = (z_{α/2}+z_{1−β}) · √(σ̂²(1/n₁ + 1/n₂))
    *   n(MDE)  = ⌈ 2·σ̂²·(z_{α/2}+z_{1−β})² / MDE² ⌉  per arm
    *
    * (V/n = (n−1)s² — the pooled variance assembles from the exact
    * DECIMAL numerators in one fixed dag). Same conventions, pinned-z
    * determinism and NULL guards as the proportion panel; NULL when
    * either n < 2 or σ̂² = 0. One row per key set.
    */
  def powerMeanFromMoments(
      moments: DataFrame,
      keyCols: Seq[String],
      targetMde: Double,
      alpha: Double = 0.05d,
      power: Double = 0.8d
  ): DataFrame = {
    require(targetMde > 0d, s"targetMde must be positive: $targetMde")
    val (zs, zs2) = zSumCols(alpha, power)
    val g = keyCols.map(col)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = moments
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("__n"))).as("__n1"),
        max(when(col("grp") === col("grp_lo"), col("__s"))).as("__sy1"),
        max(when(col("grp") === col("grp_lo"), col("__q"))).as("__syy1"),
        max(when(col("grp") === col("grp_hi"), col("__n"))).as("__n2"),
        max(when(col("grp") === col("grp_hi"), col("__s"))).as("__sy2"),
        max(when(col("grp") === col("grp_hi"), col("__q"))).as("__syy2"))
    val n1 = col("__n1").cast("double"); val n2 = col("__n2").cast("double")
    val v1 = (col("__n1").cast(dec) * col("__syy1") -
      col("__sy1") * col("__sy1")).cast("double") / n1
    val v2 = (col("__n2").cast(dec) * col("__syy2") -
      col("__sy2") * col("__sy2")).cast("double") / n2
    val sig2 = (v1 + v2) / (n1 + n2 - lit(2d))
    val mde = zs * sqrt(sig2 * (lit(1d) / n1 + lit(1d) / n2))
    val nReq = ceil(lit(2d) * sig2 * zs2 / (lit(targetMde) * lit(targetMde)))
      .cast("long")
    val two = col("__ngrps") === 2L
    val live = two && col("__n1") >= 2L && col("__n2") >= 2L
    val ok = live && (v1 + v2) > lit(0d)
    wide
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_lo", when(two, col("__n1")))
      .withColumn("n_hi", when(two, col("__n2")))
      .withColumn("sigma2_pool", when(ok, sig2))
      .withColumn("mde_abs", when(ok, mde))
      .withColumn("n_required_per_arm", when(ok, nReq))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("sigma2_pool") :+ col("mde_abs") :+
        col("n_required_per_arm"): _*)
  }

  /** Row-level wrapper of [[powerMeanFromMoments]] — the [[welchT]]
    * long-cast moment aggregation, then the panel.
    */
  def powerMean(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      valueCol: String,
      targetMde: Double,
      alpha: Double = 0.05d,
      power: Double = 0.8d
  ): DataFrame = {
    val g = keyCols.map(col)
    val yD = col(valueCol).cast("long").cast(dec)
    val moments = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("__n"), sum(yD).as("__s"), sum(yD * yD).as("__q"))
    powerMeanFromMoments(moments, keyCols, targetMde, alpha, power)
  }

  /** Power / MDE panel for a RATE metric A/B (count per exposure — the
    * sizing question behind [[SequentialTests.msprtTwoRate]]'s monitor,
    * with the Poisson plug-in variance in the [[powerTwoProportionFromCounts]]
    * closed forms): from per-arm (exposure, count) state,
    *
    *   MDE(E)  = (z_{α/2} + z_{1−β}) · √(λ̄·(1/E₁ + 1/E₂)),
    *   E(MDE)  = ⌈ 2·λ̄·(z_{α/2}+z_{1−β})² / MDE² ⌉  per arm,
    *
    * λ̄ = (C₁+C₂)/(E₁+E₂) the pooled rate (var of a Poisson rate
    * estimate is λ/E). At power = 0.5 the MDE reduces exactly to the
    * Wald radius (spec-pinned). Same pinned-z determinism, (lo, hi)
    * orientation and NULL guards as the proportion panel; NULL when
    * either exposure is 0 or no events at all. One row per key set.
    */
  def powerRateFromCounts(
      counts: DataFrame,
      keyCols: Seq[String],
      targetMde: Double,
      alpha: Double = 0.05d,
      power: Double = 0.8d
  ): DataFrame = {
    require(targetMde > 0d, s"targetMde must be positive: $targetMde")
    val (zs, zs2) = zSumCols(alpha, power)
    val g = keyCols.map(col)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = counts
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("e"))).as("__e1"),
        max(when(col("grp") === col("grp_lo"), col("c"))).as("__c1"),
        max(when(col("grp") === col("grp_hi"), col("e"))).as("__e2"),
        max(when(col("grp") === col("grp_hi"), col("c"))).as("__c2"))
    val e1 = col("__e1").cast("double"); val e2 = col("__e2").cast("double")
    val lamPool = (col("__c1") + col("__c2")).cast("double") /
      (col("__e1") + col("__e2")).cast("double")
    val mde = zs * sqrt(lamPool * (lit(1d) / e1 + lit(1d) / e2))
    val eReq = ceil(lit(2d) * lamPool * zs2 /
      (lit(targetMde) * lit(targetMde))).cast("long")
    val two = col("__ngrps") === 2L
    val live = two && col("__e1") > 0L && col("__e2") > 0L
    val ok = live && (col("__c1") + col("__c2")) > 0L
    wide
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("e_lo", when(two, col("__e1")))
      .withColumn("e_hi", when(two, col("__e2")))
      .withColumn("lambda_pool", when(live, lamPool))
      .withColumn("mde_abs", when(ok, mde))
      .withColumn("mde_rel", when(ok, mde / lamPool))
      .withColumn("e_required_per_arm", when(ok, eReq))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("e_lo") :+ col("e_hi") :+ col("lambda_pool") :+ col("mde_abs") :+
        col("mde_rel") :+ col("e_required_per_arm"): _*)
  }

  /** Poisson rate-ratio A/B (the classic two-rate comparison — e.g.
    * Rothman & Greenland's person-time methods): COUNT metrics with
    * EXPOSURE (crashes per active-hour, errors per request, purchases
    * per user-day) compared as rates λ = C/T, with the log-rate-ratio's
    * Poisson standard error
    *
    *   RR = λ_lo/λ_hi,  se(ln RR) = √(1/C_lo + 1/C_hi),
    *   CI = exp(ln RR ± z·se),  z = 1.959964
    *
    * (exposure enters the point estimate, counts alone the variance —
    * the Poisson likelihood's exact information). Determinism: C/T are
    * exact long sums from ONE aggregation; rates/RR/CI are fixed dags,
    * gated at 9dp. Conventions: (grp_lo, grp_hi) = (min, max) label;
    * ≠2 groups flagged via n_groups with NULL statistics; NULL RR when
    * either side's T = 0; NULL se/CI when either C = 0 (no events — an
    * infinite-information boundary the normal approximation cannot
    * price). One row per key set. SCALE: one counting aggregation
    * (map-side combined) + the 2-label pivot.
    */
  def rateRatioFromCounts(
      counts: DataFrame,
      keyCols: Seq[String],
      z: Double = 1.959964d
  ): DataFrame = {
    val g = keyCols.map(col)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = counts
      .withColumn("__ngrps", count(lit(1)).over(wKey))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        max(when(col("grp") === col("grp_lo"), col("events"))).as("__c1"),
        max(when(col("grp") === col("grp_lo"), col("exposure"))).as("__t1"),
        max(when(col("grp") === col("grp_hi"), col("events"))).as("__c2"),
        max(when(col("grp") === col("grp_hi"), col("exposure"))).as("__t2"))
    val r1 = col("__c1").cast("double") / col("__t1").cast("double")
    val r2 = col("__c2").cast("double") / col("__t2").cast("double")
    val rr = r1 / r2
    val lnRr = log(rr)
    val se = sqrt(lit(1d) / col("__c1").cast("double") +
      lit(1d) / col("__c2").cast("double"))
    val two = col("__ngrps") === 2L
    val exposed = two && col("__t1") > 0L && col("__t2") > 0L
    val ok = exposed && col("__c1") > 0L && col("__c2") > 0L
    wide
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("events_lo", when(two, col("__c1")))
      .withColumn("exposure_lo", when(two, col("__t1")))
      .withColumn("events_hi", when(two, col("__c2")))
      .withColumn("exposure_hi", when(two, col("__t2")))
      .withColumn("rate_lo", when(two && col("__t1") > 0L, r1))
      .withColumn("rate_hi", when(two && col("__t2") > 0L, r2))
      .withColumn("rate_ratio", when(exposed && col("__c2") > 0L, rr))
      .withColumn("se_ln_rr", when(ok, se))
      .withColumn("ci_lo", when(ok, exp(lnRr - lit(z) * se)))
      .withColumn("ci_hi", when(ok, exp(lnRr + lit(z) * se)))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("events_lo") :+ col("exposure_lo") :+ col("events_hi") :+
        col("exposure_hi") :+ col("rate_lo") :+ col("rate_hi") :+
        col("rate_ratio") :+ col("se_ln_rr") :+ col("ci_lo") :+ col("ci_hi"): _*)
  }

  /** Row-level wrapper of [[rateRatioFromCounts]]: per-(keys, grp)
    * exact event/exposure sums (long-cast, the house rule), then the
    * panel.
    */
  def rateRatio(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      eventsCol: String,
      exposureCol: String,
      z: Double = 1.959964d
  ): DataFrame = {
    val g = keyCols.map(col)
    val counts = df
      .filter(col(groupCol).isNotNull && col(eventsCol).isNotNull &&
        col(exposureCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(sum(col(eventsCol).cast("long")).as("events"),
        sum(col(exposureCol).cast("long")).as("exposure"))
    rateRatioFromCounts(counts, keyCols, z)
  }

  /** Mantel–Haenszel pooled rate ratio (Greenland & Robins 1985's
    * person-time estimator and variance): [[rateRatioFromCounts]]
    * ADJUSTED for a confounder — per stratum i with arm events/exposure
    * (c₁ᵢ, t₁ᵢ, c₂ᵢ, t₂ᵢ), Tᵢ = t₁ᵢ + t₂ᵢ:
    *
    *   RR_MH = Σᵢ c₁ᵢ·t₂ᵢ/Tᵢ / Σᵢ c₂ᵢ·t₁ᵢ/Tᵢ
    *   var(ln RR_MH) = Σᵢ (c₁ᵢ+c₂ᵢ)·t₁ᵢ·t₂ᵢ/Tᵢ² / (num·den)
    *
    * — the stratified-pooling triple beside [[cmhFromCounts]] (odds)
    * and the stratified log-rank (lifetimes): a traffic-mix shift
    * between arms can no longer masquerade as a rate effect.
    * Determinism: each stratum's three terms are fixed dags over exact
    * longs landed to nano longs, pooled order-free in DECIMAL (the
    * [[cmhFromCounts]] discipline); RR/CI fixed dags at 9dp, gated.
    * Conventions: input one row per (keys, stratum, grp) with `events`/
    * `exposure`; (grp_lo, grp_hi) = global (min, max); an arm absent
    * from a stratum (or present with 0 events and 0 exposure)
    * self-cancels — its Tᵢ-weighted terms are 0 by construction. A
    * MALFORMED stratum — an arm reporting events > 0 with exposure = 0
    * — would contribute one-sidedly (only to the numerator or only the
    * denominator) and silently bias the pooled ratio, so it is EXCLUDED
    * from the pooled terms AND the count totals, surfaced via
    * `n_strata_dropped` (the flag-don't-guess convention). NULL RR when
    * either pooled term is 0; NULL se/CI additionally when the variance
    * numerator is 0. One row per key set. SCALE: one counting
    * aggregation upstream + one stratum-bounded pooling aggregation
    * here.
    */
  def mhRateRatioFromCounts(
      counts: DataFrame,
      keyCols: Seq[String],
      z: Double = 1.959964d
  ): DataFrame = {
    val g = keyCols.map(col)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wide = counts
      .withColumn("__ngrps", size(collect_set(col("grp")).over(wKey)).cast("long"))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps") :+
        col("stratum")): _*)
      .agg(
        coalesce(max(when(col("grp") === col("grp_lo"), col("events"))), lit(0L)).as("__c1"),
        coalesce(max(when(col("grp") === col("grp_lo"), col("exposure"))), lit(0L)).as("__t1"),
        coalesce(max(when(col("grp") === col("grp_hi"), col("events"))), lit(0L)).as("__c2"),
        coalesce(max(when(col("grp") === col("grp_hi"), col("exposure"))), lit(0L)).as("__t2"))
    val tT = (col("__t1") + col("__t2")).cast("double")
    val dec2 = "decimal(38,0)"
    // malformed: events with zero exposure on an arm — its c·t/T term
    // hits only one side of the pooled ratio (one-sided bias)
    val bad = (col("__c1") > 0L && col("__t1") === 0L) ||
      (col("__c2") > 0L && col("__t2") === 0L)
    def nano(x: Column): Column =
      when(col("__t1") + col("__t2") === 0L, 0L)
        .otherwise(round(x * 1e9d).cast("long"))
    val num9 = nano(col("__c1").cast("double") * col("__t2").cast("double") / tT)
    val den9 = nano(col("__c2").cast("double") * col("__t1").cast("double") / tT)
    val var9 = nano((col("__c1") + col("__c2")).cast("double") *
      col("__t1").cast("double") * col("__t2").cast("double") / (tT * tT))
    val pooled = wide
      .withColumn("__bad", bad)
      .withColumn("__n9", num9).withColumn("__d9", den9).withColumn("__v9", var9)
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(sum(when(col("__bad"), 0L).otherwise(1L)).as("n_strata"),
        sum(when(col("__bad"), 1L).otherwise(0L)).as("n_strata_dropped"),
        sum(when(col("__bad"), 0L).otherwise(col("__c1"))).as("events_lo"),
        sum(when(col("__bad"), 0L).otherwise(col("__t1"))).as("exposure_lo"),
        sum(when(col("__bad"), 0L).otherwise(col("__c2"))).as("events_hi"),
        sum(when(col("__bad"), 0L).otherwise(col("__t2"))).as("exposure_hi"),
        sum(when(col("__bad"), 0L).otherwise(col("__n9")).cast(dec2)).as("__num9"),
        sum(when(col("__bad"), 0L).otherwise(col("__d9")).cast(dec2)).as("__den9"),
        sum(when(col("__bad"), 0L).otherwise(col("__v9")).cast(dec2)).as("__var9"))
    val two = col("__ngrps") === 2L
    val numD = col("__num9").cast("double") / 1e9d
    val denD = col("__den9").cast("double") / 1e9d
    val rr = numD / denD
    val se = sqrt(col("__var9").cast("double") / 1e9d / (numD * denD))
    val okRr = two && col("__num9") > 0L && col("__den9") > 0L
    val ok = okRr && col("__var9") > 0L
    pooled
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("rate_ratio_mh", when(okRr, rr))
      .withColumn("se_ln_rr", when(ok, se))
      .withColumn("ci_lo", when(ok, exp(log(rr) - lit(z) * se)))
      .withColumn("ci_hi", when(ok, exp(log(rr) + lit(z) * se)))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_strata") :+ col("n_strata_dropped") :+ col("events_lo") :+
        col("exposure_lo") :+ col("events_hi") :+ col("exposure_hi") :+
        col("rate_ratio_mh") :+ col("se_ln_rr") :+ col("ci_lo") :+
        col("ci_hi"): _*)
  }

  /** Difference-in-differences (the canonical 2×2 quasi-experimental
    * read — Card & Krueger 1994's design): when assignment is NOT
    * randomized but both groups are observed before AND after the
    * change, the treatment effect estimate is the divergence of the two
    * groups' pre→post deltas — the parallel-trends counterfactual:
    *
    *   DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)
    *   se² = Σ_{4 cells} s²_cell/n_cell,  CI ±1.959964·se
    *
    * Determinism: values cast long; per-(group, period) n/Σy/Σy² are
    * exact DECIMAL sums from ONE aggregation; each cell's sample
    * variance assembles from the exact pieces ((n·Σy² − (Σy)²)/
    * (n(n−1))); DiD/se/CI fixed dags at 9dp. Conventions: group labels
    * (grp_lo, grp_hi) = (min, max) — grp_hi is conventionally TREATED
    * (document the mapping at the call site); periods compare
    * period_hi − period_lo (max − min label, "post − pre"); ≠2 groups
    * or ≠2 periods flagged via n_groups/n_periods with NULL statistics;
    * NULL se/CI when any cell has n < 2. One row per key set. SCALE:
    * one moments aggregation (map-side combined) + the 4-cell pivot.
    */
  def diffInDiff(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      periodCol: String,
      valueCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val yD = col(valueCol).cast("long").cast(dec)
    val cells = df
      .filter(col(groupCol).isNotNull && col(periodCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp") :+
        col(periodCol).cast("string").as("per"): _*)
      .agg(count(lit(1)).as("__n"), sum(yD).as("__s"), sum(yD * yD).as("__q"))
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val lab = cells
      .withColumn("__ngrps", size(collect_set(col("grp")).over(wKey)).cast("long"))
      .withColumn("__npers", size(collect_set(col("per")).over(wKey)).cast("long"))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
      .withColumn("per_lo", min("per").over(wKey))
      .withColumn("per_hi", max("per").over(wKey))
    def cell(gSide: String, pSide: String, c: String, as: String) =
      max(when(col("grp") === col(gSide) && col("per") === col(pSide),
        col(c))).as(as)
    val wide = lab
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("per_lo") :+
        col("per_hi") :+ col("__ngrps") :+ col("__npers")): _*)
      .agg(
        cell("grp_lo", "per_lo", "__n", "__n_cl"), cell("grp_lo", "per_lo", "__s", "__s_cl"),
        cell("grp_lo", "per_lo", "__q", "__q_cl"),
        cell("grp_lo", "per_hi", "__n", "__n_ch"), cell("grp_lo", "per_hi", "__s", "__s_ch"),
        cell("grp_lo", "per_hi", "__q", "__q_ch"),
        cell("grp_hi", "per_lo", "__n", "__n_tl"), cell("grp_hi", "per_lo", "__s", "__s_tl"),
        cell("grp_hi", "per_lo", "__q", "__q_tl"),
        cell("grp_hi", "per_hi", "__n", "__n_th"), cell("grp_hi", "per_hi", "__s", "__s_th"),
        cell("grp_hi", "per_hi", "__q", "__q_th"))
    def mean(n: String, s: String) =
      col(s).cast("double") / col(n).cast("double")
    def varOverN(n: String, s: String, q: String) = {
      val nD = col(n).cast("double")
      (col(n).cast(dec) * col(q) - col(s) * col(s)).cast("double") /
        (nD * nD * (nD - lit(1d)))
    }
    val did = (mean("__n_th", "__s_th") - mean("__n_tl", "__s_tl")) -
      (mean("__n_ch", "__s_ch") - mean("__n_cl", "__s_cl"))
    val se = sqrt(varOverN("__n_th", "__s_th", "__q_th") +
      varOverN("__n_tl", "__s_tl", "__q_tl") +
      varOverN("__n_ch", "__s_ch", "__q_ch") +
      varOverN("__n_cl", "__s_cl", "__q_cl"))
    val grid = col("__ngrps") === 2L && col("__npers") === 2L &&
      col("__n_cl").isNotNull && col("__n_ch").isNotNull &&
      col("__n_tl").isNotNull && col("__n_th").isNotNull
    val live = grid && col("__n_cl") > 0L && col("__n_ch") > 0L &&
      col("__n_tl") > 0L && col("__n_th") > 0L
    val ok = grid && col("__n_cl") >= 2L && col("__n_ch") >= 2L &&
      col("__n_tl") >= 2L && col("__n_th") >= 2L
    wide
      .withColumn("n_groups", col("__ngrps"))
      .withColumn("n_periods", col("__npers"))
      .withColumn("mean_ctrl_pre", when(live, mean("__n_cl", "__s_cl")))
      .withColumn("mean_ctrl_post", when(live, mean("__n_ch", "__s_ch")))
      .withColumn("mean_treat_pre", when(live, mean("__n_tl", "__s_tl")))
      .withColumn("mean_treat_post", when(live, mean("__n_th", "__s_th")))
      .withColumn("did", when(live, did))
      .withColumn("se_did", when(ok, se))
      .withColumn("ci_lo", when(ok, did - lit(1.959964d) * se))
      .withColumn("ci_hi", when(ok, did + lit(1.959964d) * se))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("per_lo") :+
        col("per_hi") :+ col("n_groups") :+ col("n_periods") :+
        col("mean_ctrl_pre") :+ col("mean_ctrl_post") :+
        col("mean_treat_pre") :+ col("mean_treat_post") :+
        col("did") :+ col("se_did") :+ col("ci_lo") :+ col("ci_hi"): _*)
  }

  /** Empirical-Bayes rate shrinkage (the Efron & Morris 1975 program,
    * beta-binomial method-of-moments — Robinson's canonical batting-
    * average treatment): per-segment success rates p̂ᵢ = sᵢ/nᵢ ranked
    * RAW put every tiny-n segment at the extremes; fit Beta(α, β) to
    * the OBSERVED rate distribution by moments and shrink each segment
    * toward the grand mean in proportion to its evidence:
    *
    *   m₁ = Σp̂/k,  v = Σp̂²/k − m₁²
    *   α+β = (m₁(1−m₁) − v)/v,  α = m₁(α+β)
    *   p̃ᵢ = (sᵢ + α)/(nᵢ + α + β)
    *
    * — the posterior-mean ranking a per-slice pass-rate dashboard
    * should sort by. Determinism: exact per-segment counts from ONE
    * aggregation; the moment sums are ORDERED cumulative windows over
    * the k-bounded segment frame (the [[metaAnalysis]] discipline —
    * never an order-free double sum); α/β/p̃ fixed dags at 9dp.
    * Conventions: segments with n = 0 drop; MoM undefined (v = 0 —
    * identical rates, nothing to shrink toward — or m₁(1−m₁) ≤ v —
    * more dispersion than a Beta can carry, α would be ≤ 0) → NULL
    * alpha/beta/p_shrunk on every row, p_raw intact, the flag rule.
    * Emits one row per (keys, grp): n, n_pass, p_raw, alpha, beta,
    * p_shrunk. SCALE: one counting aggregation + two k-bounded window
    * passes.
    */
  def ebShrinkRatesFromCounts(
      counts: DataFrame,
      keyCols: Seq[String]
  ): DataFrame = {
    val g = keyCols.map(col)
    val live = counts.filter(col("n") > 0L)
    val wOrd = Window.partitionBy(g: _*).orderBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val p = col("n_pass").cast("double") / col("n").cast("double")
    val withM = live
      .withColumn("__p", p)
      .withColumn("__k", count(lit(1)).over(wAll))
      .withColumn("__sp", sum(col("__p")).over(wOrd))
      .withColumn("__sp2", sum(col("__p") * col("__p")).over(wOrd))
      // the FINAL cumulative value, broadcast back over the frame: the
      // last row in grp order holds the full ordered fold
      .withColumn("__spT", last(col("__sp")).over(
        Window.partitionBy(g: _*).orderBy(col("grp"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__sp2T", last(col("__sp2")).over(
        Window.partitionBy(g: _*).orderBy(col("grp"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val kD = col("__k").cast("double")
    val m1 = col("__spT") / kD
    val v = col("__sp2T") / kD - m1 * m1
    val ab = (m1 * (lit(1d) - m1) - v) / v
    val alpha = m1 * ab
    val beta = ab - alpha
    val ok = col("__k") >= 2L && v > 0d && m1 * (lit(1d) - m1) > v
    val shrunk = (col("n_pass").cast("double") + alpha) /
      (col("n").cast("double") + ab)
    withM
      .withColumn("p_raw", col("__p"))
      .withColumn("alpha", when(ok, alpha))
      .withColumn("beta", when(ok, beta))
      .withColumn("p_shrunk", when(ok, shrunk))
      .select(g :+ col("grp") :+ col("n") :+ col("n_pass") :+
        col("p_raw") :+ col("alpha") :+ col("beta") :+ col("p_shrunk"): _*)
  }

  /** Row-level wrapper of [[ebShrinkRatesFromCounts]] — the
    * [[wilsonInterval]] counting aggregation, then the shrinkage.
    */
  def ebShrinkRates(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      hitCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val counts = df
      .filter(col(groupCol).isNotNull && col(hitCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp"): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col(hitCol).cast("boolean"), 1L).otherwise(0L)).as("n_pass"))
    ebShrinkRatesFromCounts(counts, keyCols)
  }

  /** Meta-analysis panel over per-stratum effects (inverse-variance
    * pooling; DerSimonian & Laird 1986 for τ²; Higgins & Thompson 2003
    * for I²): the "does the effect REPLICATE across strata" read a
    * segmented experiment owes before anyone trusts a pooled number —
    * one row per key set from k (stratum, effect, se) rows:
    *
    *   w_i = 1/se_i²,  θ̂_F = Σw·e/Σw,  se_F = √(1/Σw)
    *   Q   = Σw·e² − (Σw·e)²/Σw,  df = k−1
    *   I²  = max(0, (Q−df)/Q),  τ²_DL = max(0, (Q−df)/(Σw − Σw²/Σw))
    *   w*_i = 1/(se_i² + τ²) → θ̂_R, se_R  (the random-effects pool)
    *
    * Q rejecting (χ²_{k−1}) says the strata disagree beyond chance —
    * read θ̂_R with its wider CI, not θ̂_F. Determinism: inputs are the
    * upstream dags' doubles; every Σ here is an ORDERED cumulative
    * window over the k-bounded stratum frame (binary stratum order,
    * left-to-right float fold — the engines agree bitwise), never an
    * order-free double sum; two window passes (the second carries
    * τ² back over the strata), fixed dags after, z = 1.959964 CIs.
    * Conventions: NULL/non-positive-se strata drop into n_dropped;
    * k = 1 emits the single effect as both pools with NULL Q/I²/τ²;
    * Q = 0 (or ≤ df) → I² = 0, τ² = 0 and the pools coincide. SCALE:
    * the input frame is one row per stratum — everything here is
    * k-bounded; the row-scale work lives in whatever built the
    * per-stratum effects.
    */
  def metaAnalysis(
      df: DataFrame,
      keyCols: Seq[String],
      strataCol: String,
      effectCol: String,
      seCol: String,
      z: Double = 1.959964d
  ): DataFrame = {
    val g = keyCols.map(col)
    val valid = col(seCol).isNotNull && col(seCol) > 0d && col(effectCol).isNotNull
    // Truncate the projected input's lineage ONCE (r18 optimization,
    // guide §3.3): `base` feeds three branches (the fixed-effects pass,
    // the τ²-carrying random-effects pass, the dropped-strata count), so
    // a lazy upstream — typically a row-scale per-stratum effect
    // aggregation like q365's CUPED — executed once per branch. The
    // frame is strata-bounded after the projection; the only joins over
    // it are already explicit broadcasts.
    val base = graft.plans.Lineage.truncate(
      df.select(g :+ col(strataCol).cast("string").as("__st") :+
        col(effectCol).cast("double").as("__e") :+
        col(seCol).cast("double").as("__se") :+
        when(valid, 1L).otherwise(0L).as("__ok"): _*))
    val wOrd = Window.partitionBy(g: _*).orderBy(col("__st"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val w = lit(1d) / (col("__se") * col("__se"))
    val pass1 = base.filter(col("__ok") === 1L)
      .withColumn("__w", w)
      .withColumn("__sw", sum(col("__w")).over(wOrd))
      .withColumn("__swe", sum(col("__w") * col("__e")).over(wOrd))
      .withColumn("__swe2", sum(col("__w") * col("__e") * col("__e")).over(wOrd))
      .withColumn("__sww", sum(col("__w") * col("__w")).over(wOrd))
      .withColumn("__k", count(lit(1)).over(wAll))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(g: _*).orderBy(col("__st"))))
      .filter(col("__rn") === col("__k"))
    val kD = col("__k").cast("double")
    val efF = col("__swe") / col("__sw")
    val seF = sqrt(lit(1d) / col("__sw"))
    val q = col("__swe2") - col("__swe") * col("__swe") / col("__sw")
    val dfQ = kD - lit(1d)
    val i2 = when(q > dfQ, (q - dfQ) / q).otherwise(lit(0d))
    val cDen = col("__sw") - col("__sww") / col("__sw")
    val tau2 = when(q > dfQ && cDen > 0d, (q - dfQ) / cDen).otherwise(lit(0d))
    val multi = col("__k") >= 2L
    val summary = pass1.select(g :+ col("__k").as("n_strata") :+
      efF.as("effect_fixed") :+ seF.as("se_fixed") :+
      when(multi, q).as("q") :+
      when(multi, dfQ.cast("long")).as("df") :+
      when(multi, i2).as("i2") :+
      when(multi, tau2).otherwise(lit(0d)).as("tau2_dl"): _*)
    // pass 2: the random-effects pool with τ² carried back over strata
    val joined =
      if (keyCols.isEmpty)
        base.filter(col("__ok") === 1L).crossJoin(
          broadcast(summary.select(col("tau2_dl").as("__t2"))))
      else base.filter(col("__ok") === 1L).join(
        broadcast(summary.select(g :+ col("tau2_dl").as("__t2"): _*)),
        keyCols)
    val wr = lit(1d) / (col("__se") * col("__se") + col("__t2"))
    val pass2 = joined
      .withColumn("__wr", wr)
      .withColumn("__swr", sum(col("__wr")).over(wOrd))
      .withColumn("__swre", sum(col("__wr") * col("__e")).over(wOrd))
      .withColumn("__k2", count(lit(1)).over(wAll))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(g: _*).orderBy(col("__st"))))
      .filter(col("__rn") === col("__k2"))
      .select(g :+ (col("__swre") / col("__swr")).as("effect_random") :+
        sqrt(lit(1d) / col("__swr")).as("se_random"): _*)
    val dropped =
      if (keyCols.isEmpty)
        base.groupBy().agg(sum(lit(1L) - col("__ok")).as("n_dropped"))
      else base.groupBy(g: _*).agg(sum(lit(1L) - col("__ok")).as("n_dropped"))
    val out =
      if (keyCols.isEmpty) summary.crossJoin(broadcast(pass2)).crossJoin(broadcast(dropped))
      else summary.join(pass2, keyCols).join(dropped, keyCols)
    out.select(g :+ col("n_strata") :+ col("n_dropped") :+
      col("effect_fixed") :+ col("se_fixed") :+
      (col("effect_fixed") - lit(z) * col("se_fixed")).as("ci_fixed_lo") :+
      (col("effect_fixed") + lit(z) * col("se_fixed")).as("ci_fixed_hi") :+
      col("q") :+ col("df") :+ col("i2") :+ col("tau2_dl") :+
      col("effect_random") :+ col("se_random") :+
      (col("effect_random") - lit(z) * col("se_random")).as("ci_random_lo") :+
      (col("effect_random") + lit(z) * col("se_random")).as("ci_random_hi"): _*)
  }

  /** The EFFECT-HETEROGENEITY card — "did the effect differ across
    * segments", the subgroup read every experiment review asks after
    * the topline: one row PER SEGMENT carrying that segment's effect
    * and CI beside the replicated [[metaAnalysis]] panel (fixed/random
    * pools, Cochran Q, I², DL τ²) across the segments — the
    * Friedman/KW replicated-summary surface shape, so a dashboard
    * renders the forest plot AND its heterogeneity verdict from one
    * frame. Input is any per-segment effect frame (`segCol`,
    * `effectCol`, `seCol` — e.g. the q298 CUPED read keyed by segment
    * over segment-keyed ab-cells); segments with NULL effect or
    * non-positive se are EXCLUDED from the pool (`included` = false,
    * counted in n_dropped) but still emit their row. Determinism and
    * scale are [[metaAnalysis]]'s (ordered cumulative float folds over
    * the segment-bounded frame, mirrored by the oracle) plus one
    * broadcast join back.
    */
  def heterogeneityCard(
      effects: DataFrame,
      keyCols: Seq[String],
      segCol: String,
      effectCol: String,
      seCol: String,
      z: Double = 1.959964d
  ): DataFrame = {
    val g = keyCols.map(col)
    // one execution of the (typically row-scale) upstream effect
    // aggregation: the card reads `effects` twice — the meta-analysis
    // pool and the per-segment panel — so truncate the projected frame's
    // lineage first (r18; see [[metaAnalysis]]'s note)
    val effectsT = graft.plans.Lineage.truncate(
      effects.select(g ++ Seq(col(segCol), col(effectCol), col(seCol)): _*))
    val summary = metaAnalysis(effectsT, keyCols, segCol, effectCol, seCol, z)
    val inc = col("se_seg").isNotNull && col("se_seg") > 0d &&
      col("effect_seg").isNotNull
    val eff = effectsT.select(g :+ col(segCol).cast("string").as("segment") :+
        col(effectCol).cast("double").as("effect_seg") :+
        col(seCol).cast("double").as("se_seg"): _*)
      .withColumn("included", inc)
      .withColumn("seg_ci_lo", when(inc, col("effect_seg") - lit(z) * col("se_seg")))
      .withColumn("seg_ci_hi", when(inc, col("effect_seg") + lit(z) * col("se_seg")))
    // LEFT join: segments still emit their rows when the pool is empty
    // (every segment dropped) — the panel columns NULL instead of the
    // whole card vanishing
    val joined =
      if (keyCols.isEmpty) eff.join(broadcast(summary), lit(true), "left_outer")
      else eff.join(broadcast(summary), keyCols, "left_outer")
    joined.select(g :+ col("segment") :+ col("effect_seg") :+
      col("se_seg") :+ col("seg_ci_lo") :+ col("seg_ci_hi") :+
      col("included") :+ col("n_strata") :+ col("n_dropped") :+
      col("effect_fixed") :+ col("se_fixed") :+
      col("ci_fixed_lo") :+ col("ci_fixed_hi") :+
      col("q") :+ col("df") :+ col("i2") :+ col("tau2_dl") :+
      col("effect_random") :+ col("se_random") :+
      col("ci_random_lo") :+ col("ci_random_hi"): _*)
  }

  /** Intraclass correlation + design effect (one-way random effects —
    * Fisher's ANOVA estimator; Kish 1965 for deff): events cluster by
    * USER, documents by SOURCE — and a per-row test on clustered rows
    * overstates its sample size by the design effect
    * deff = 1 + (m̄ − 1)·ICC (effective n = N/deff), the correction
    * every q279/q299-style per-event read silently owes when the
    * randomization unit is the cluster:
    *
    *   MSB = SSB/(k−1),  MSW = SSW/(N−k)
    *   n₀  = (N − Σn_i²/N)/(k−1)   (the unbalanced-size adjustment)
    *   ICC = (MSB − MSW)/(MSB + (n₀−1)·MSW),  m̄ = N/k
    *
    * Determinism: values cast long; per-cluster n/Σy/Σy² are exact
    * DECIMAL sums; each cluster's S_i²/n_i lands as a nano long (fixed
    * per-cluster dag) so SSB/SSW assemble from exact pieces order-free;
    * ICC/deff are fixed dags at 9dp. NULL when k < 2, N = k (no
    * within-cluster replication → MSW undefined), or zero total
    * variance. Emits one row per key set: n_total, n_clusters, icc,
    * deff, n_effective. SCALE: one cluster-level aggregation (map-side
    * combined) + one k-bounded fold; never a second pass over rows.
    */
  def iccDesignEffect(
      df: DataFrame,
      keyCols: Seq[String],
      clusterCol: String,
      valueCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val yD = col(valueCol).cast("long").cast(dec)
    val perC = df
      .filter(col(clusterCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(g :+ col(clusterCol).cast("string").as("__cl"): _*)
      .agg(count(lit(1)).as("__n"), sum(yD).as("__sy"), sum(yD * yD).as("__syy"))
    // per-cluster S_i²/n_i as a nano long — the only non-integer piece
    val sn9 = round((col("__sy") * col("__sy")).cast("double") /
      col("__n").cast("double") * 1e9d).cast("long")
    def grouped(d: DataFrame) =
      if (keyCols.isEmpty) d.groupBy() else d.groupBy(g: _*)
    val agg = grouped(perC.withColumn("__sn9", sn9))
      .agg(
        count(lit(1)).as("n_clusters"),
        coalesce(sum("__n"), lit(0L)).as("n_total"),
        sum(col("__sy")).as("__syT"),
        sum(col("__syy")).as("__syyT"),
        sum(col("__n").cast(dec) * col("__n").cast(dec)).as("__nn"),
        sum(col("__sn9").cast(dec)).as("__sn9T"))
    val nD = col("n_total").cast("double"); val kD = col("n_clusters").cast("double")
    // ANSI: every division sits under a when-guard (NULL propagates to
    // `ok`, and when() treats a NULL condition as false)
    val basic = col("n_clusters") >= 2L && col("n_total") > col("n_clusters")
    val snT = col("__sn9T").cast("double") / 1e9d // Σ S_i²/n_i
    val grand = when(basic, (col("__syT") * col("__syT")).cast("double") / nD)
    val ssb = snT - grand
    val ssw = col("__syyT").cast("double") - snT
    val msb = when(basic, ssb / (kD - 1d))
    val msw = when(basic, ssw / (nD - kD))
    val n0 = when(basic, (nD - col("__nn").cast("double") / nD) / (kD - 1d))
    val iccDen = msb + (n0 - 1d) * msw
    val icc = (msb - msw) / iccDen
    val mBar = nD / kD
    val deff = lit(1d) + (mBar - 1d) * icc
    val ok = basic && iccDen > 0d
    agg
      .withColumn("icc", when(ok, icc))
      .withColumn("deff", when(ok, deff))
      .withColumn("n_effective", when(ok && deff > 0d, nD / deff))
      .select(g :+ col("n_total") :+ col("n_clusters") :+ col("icc") :+
        col("deff") :+ col("n_effective"): _*)
  }

  /** McNemar's test (McNemar 1947): did a PAIRED binary outcome change
    * — the "new curation filter vs old, on the SAME documents" A/B that
    * [[twoProportion]] (independent groups) gets wrong on paired data:
    * only the discordant units carry signal. Exact integer quadrant
    * counts (both / only_a / only_b / neither), the statistic
    * (b−c)²/(b+c) with NO continuity correction (stated), NULL when
    * every unit agrees (b+c = 0), and the α = 0.05 verdict decided by
    * the exact integer comparison (b−c)²·10⁶ ≷ 3841459·(b+c) (the χ²₁
    * 0.95 critical value 3.841459 to 6 decimals — the [[mannKendall]]
    * never-a-float-boundary rule, at a precision that keeps statistics
    * in (3.841459, 3.8416] significant, which the 1.96²-rounded 3.8416
    * constant would misreport). One count aggregation; one row per key
    * set.
    */
  def mcnemar(
      df: DataFrame,
      keyCols: Seq[String],
      aCol: String,
      bCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val a = col(aCol).cast("boolean")
    val b = col(bCol).cast("boolean")
    val agg = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(a && b, 1L).otherwise(0L)).as("both_pass"),
        sum(when(a && !b, 1L).otherwise(0L)).as("only_a"),
        sum(when(!a && b, 1L).otherwise(0L)).as("only_b"),
        sum(when(!a && !b, 1L).otherwise(0L)).as("neither"))
    val diff = col("only_a") - col("only_b")
    val disc = col("only_a") + col("only_b")
    agg
      .withColumn("mcnemar",
        when(disc > 0L, (diff * diff).cast("double") / disc.cast("double")))
      .withColumn("significant",
        when(disc === 0L, lit(null).cast("boolean"))
          .otherwise(diff * diff * 1000000L > disc * 3841459L))
  }
}
