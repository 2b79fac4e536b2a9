package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-sequential alpha-spending boundaries (Lan & DeMets 1983) — the
  * FIXED-HORIZON industry standard beside the always-valid mSPRT family:
  * a design plans K interim looks at equally-spaced information
  * fractions t_k = k/K and spends its two-sided α along a spending
  * function s(t); the per-look boundary c_k makes the FIRST-crossing
  * probability at look k equal the increment s(t_k) − s(t_{k−1}) under
  * H₀ (Brownian-motion null). Supported spending shapes:
  *
  *   - "obf"    — O'Brien–Fleming-like: s(t) = 2(1 − Φ(z_{a/2}/√t)),
  *                a = α/2 per side (conservative early, ≈ fixed-test at
  *                the end — the DSMB default)
  *   - "pocock" — Pocock-like: s(t) = a·ln(1 + (e−1)t) (near-constant
  *                boundaries, aggressive early looks)
  *
  * Boundaries solve the classic Armitage–McPherson–Rowe recursion: the
  * sub-density f_k of B(t_k) on not-yet-absorbed paths propagates by
  * convolution with the N(0, Δt) increment on a FIXED grid (trapezoid,
  * step [[GridH]], span ±8 — absolute truncation error < 1e-15), and
  * each c_k is found by bisection on the tail integral (the two-sided
  * boundary uses the standard one-sided-α/2 construction; the
  * cross-both-barriers correction is < 1e-9 at these α). Φ rides the
  * Numerical-Recipes Chebyshev erfc (relative error < 1.2e-7 at ALL
  * tail depths — an absolute-error approximation would swamp the OBF
  * first look's ~5e-7 spend). Everything is a pure deterministic double
  * dag: fixed grid, fixed 80-step bisections, no randomness, no library
  * calls — the q149 pinned-data rule applied to a solver. K = 1 reduces
  * to the fixed test (z = 1.959964 at α = 0.05, spec-pinned); the K = 5
  * OBF boundaries reproduce the published Lan–DeMets table (4.8769,
  * 3.3569, 2.6803, 2.2898, 2.0310 — DeMets & Lan 1994), spec-anchored.
  */
object GroupSequential {

  /** Grid step for the absorbed-density recursion. */
  private val GridH = 0.005d
  private val GridSpan = 8.0d

  /** Chebyshev erfc (the classic Numerical-Recipes fit): relative error
    * < 1.2e-7 everywhere — accurate in the far tail, where the OBF
    * spending lives.
    */
  private def erfc(x: Double): Double = {
    val ax = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * ax)
    val ans = t * math.exp(-ax * ax - 1.26551223 + t * (1.00002368 +
      t * (0.37409196 + t * (0.09678418 + t * (-0.18628806 +
      t * (0.27886807 + t * (-1.13520398 + t * (1.48851587 +
      t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0d) ans else 2.0 - ans
  }

  /** Standard normal CDF / upper tail / density. */
  def phi(x: Double): Double = 0.5 * erfc(-x / math.sqrt(2.0))
  private def upperTail(x: Double): Double = 0.5 * erfc(x / math.sqrt(2.0))
  private def dens(x: Double): Double =
    math.exp(-0.5 * x * x) / math.sqrt(2.0 * math.Pi)

  /** Φ⁻¹ by bisection on the deterministic Φ — no erf inversion series. */
  def phiInv(p: Double): Double = {
    require(p > 0d && p < 1d, s"p must be in (0,1): $p")
    var lo = -40.0; var hi = 40.0
    var i = 0
    while (i < 200) {
      val mid = 0.5 * (lo + hi)
      if (phi(mid) < p) lo = mid else hi = mid
      i += 1
    }
    0.5 * (lo + hi)
  }

  /** ONE-SIDED spending function value s₁(t) for a two-sided design of
    * total size α — the standard construction spends α/2 per side, so
    * s₁(1) = α/2 (the symmetric two-sided bound then uses each look's
    * one-sided increment for its |z| barrier). Shapes: "obf", "pocock",
    * and the Kim–DeMets power family "power<ρ>" (s₁(t) = (α/2)·t^ρ,
    * ρ > 0 — ρ = 1 spends linearly, ρ = 3 approximates the OBF shape;
    * Kim & DeMets 1987).
    */
  def spend(t: Double, alpha: Double, spending: String): Double = {
    require(t > 0d && t <= 1d, s"t must be in (0,1]: $t")
    val a = alpha / 2.0
    spending match {
      case "obf" => 2.0 * upperTail(phiInv(1.0 - a / 2.0) / math.sqrt(t))
      case "pocock" => a * math.log(1.0 + (math.E - 1.0) * t)
      case p if p.startsWith("power") =>
        val rho = p.stripPrefix("power").toDouble
        require(rho > 0d, s"power spending needs rho > 0: $spending")
        a * math.pow(t, rho)
      case other => throw new IllegalArgumentException(
        s"spending must be obf|pocock|power<rho>: $other")
    }
  }

  /** One boundary row: look index (1-based), information fraction,
    * CUMULATIVE two-sided α spent through this look, and the |z|
    * boundary.
    */
  final case class GsBoundary(look: Int, t: Double, alphaSpent: Double, z: Double)

  /** The K equally-spaced boundaries for two-sided `alpha` under the
    * named spending function. Driver-side and deterministic, so the
    * solve is memoized per (K, α, spending) — query re-construction
    * (bench passes, plan audits) must not re-pay the O(K·G²) grid.
    * ONLY this equally-spaced path caches: its key space is tiny
    * (K ≤ 50 × a handful of αs × spending names), while
    * [[boundariesAt]]'s observed, data-dependent fraction vectors
    * would grow an unbounded map in a long-lived driver.
    */
  private val boundaryCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Double, String), Seq[GsBoundary]]()

  def boundaries(k: Int, alpha: Double, spending: String): Seq[GsBoundary] = {
    require(k >= 1 && k <= 50, s"K must be in [1, 50]: $k")
    val key = (k, alpha, spending)
    val hit = boundaryCache.get(key)
    if (hit != null) return hit
    val solved = boundariesAt((1 to k).map(_.toDouble / k), alpha, spending)
    boundaryCache.putIfAbsent(key, solved)
    solved
  }

  /** Bounded LRU for [[boundariesAt]]'s observed, data-dependent
    * fraction vectors: a driver that re-reads the SAME real-fraction
    * monitor (bench passes, dashboard refreshes) must not re-pay the
    * O(K·G²) grid solve per call, but the key space is unbounded (any
    * observed traffic split is a new key), so — unlike [[boundaries]]'
    * tiny planned-grid map — this one evicts least-recently-used past
    * 64 entries.
    */
  private val boundaryAtCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(Seq[Double], Double, String), Seq[GsBoundary]](
        16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(Seq[Double], Double, String), Seq[GsBoundary]])
            : Boolean = size() > 64
      })

  /** [[boundaries]] at ARBITRARY information fractions — the read real
    * dashboards need, where looks land at observed traffic fractions
    * rather than the planned grid (the Lan–DeMets point: the spending
    * function, not the look schedule, is the design). `ts` strictly
    * increasing in (0, 1], last element 1 for a full-spend design.
    */
  def boundariesAt(ts: Seq[Double], alpha: Double,
      spending: String): Seq[GsBoundary] = {
    val key = (ts.toList, alpha, spending)
    val hit = boundaryAtCache.get(key)
    if (hit != null) return hit
    val solved = solveBoundaries(ts, alpha, spending)
    boundaryAtCache.put(key, solved)
    solved
  }

  private def solveBoundaries(ts: Seq[Double], alpha: Double,
      spending: String): Seq[GsBoundary] = {
    require(ts.nonEmpty && ts.size <= 50, s"1..50 looks: ${ts.size}")
    require(ts.forall(t => t > 0d && t <= 1d) &&
      ts.sliding(2).forall(p => p.size < 2 || p(0) < p(1)),
      s"information fractions must be strictly increasing in (0,1]: $ts")
    require(alpha > 0d && alpha < 1d, s"alpha must be in (0,1): $alpha")
    val g = math.round(2 * GridSpan / GridH).toInt + 1
    val xs = Array.tabulate(g)(i => -GridSpan + i * GridH)
    // sub-density of B(t_j) on surviving paths; starts as a point mass
    // at 0 (handled analytically for look 1)
    var f: Array[Double] = null
    var tPrev = 0.0
    var spentPrev = 0.0
    val out = Vector.newBuilder[GsBoundary]
    for (j <- 1 to ts.size) {
      val t = ts(j - 1)
      val sd = math.sqrt(t - tPrev)
      val spentNow = spend(t, alpha, spending) // one-sided s₁(t)
      val inc = math.max(0.0, spentNow - spentPrev)
      // tail probability above barrier b at this look, given survivors
      def tail(b: Double): Double =
        if (f == null) upperTail(b / sd)
        else {
          var s = 0.0; var i = 0
          while (i < g) {
            val w = if (i == 0 || i == g - 1) 0.5 else 1.0
            s += w * f(i) * upperTail((b - xs(i)) / sd)
            i += 1
          }
          s * GridH
        }
      // bisection for the barrier on the B scale
      var lo = 0.0; var hi = 10.0 * math.sqrt(t)
      var it = 0
      while (it < 80) {
        val mid = 0.5 * (lo + hi)
        if (tail(mid) > inc) lo = mid else hi = mid
        it += 1
      }
      val b = 0.5 * (lo + hi)
      // propagate the surviving sub-density (truncate above the barrier)
      val nf = new Array[Double](g)
      var i = 0
      while (i < g) {
        if (xs(i) <= b) {
          nf(i) =
            if (f == null) dens(xs(i) / sd) / sd
            else {
              var s = 0.0; var m = 0
              while (m < g) {
                val w = if (m == 0 || m == g - 1) 0.5 else 1.0
                s += w * f(m) * dens((xs(i) - xs(m)) / sd) / sd
                m += 1
              }
              s * GridH
            }
        }
        i += 1
      }
      f = nf
      out += GsBoundary(j, t, 2.0 * spentNow, b / math.sqrt(t))
      tPrev = t
      spentPrev = spentNow
    }
    out.result()
  }

  /** Group-sequential monitor for a TWO-PROPORTION A/B from the SAME
    * per-(keys, peek) increment state [[SequentialTests.msprtTwoProportion]]
    * reads: cumulative counts per look, z = Δ̂/√V with the pooled
    * variance, compared against the spending boundary for look k of the
    * PLANNED K (peeks map to looks 1..K in peek order; looks beyond K
    * carry NULL boundary/reject — never silently dropped). The
    * boundary/z comparison is nano-integer (round(|z|·10⁹) ≥
    * round(c_k·10⁹)) — the mannKendall never-a-float-boundary rule.
    * Emits per (keys, peek): look, t_frac, cumulative n/s per arm,
    * z, alpha_spent, z_bound, reject_at (this look crosses), crossed
    * (any look so far crossed — the monotone stopping read).
    * Determinism: exact cumulative counts, fixed dags, the pinned
    * driver-side boundary constants. SCALE: one counting aggregation
    * shape upstream (the caller's), peek-cardinality windows + a
    * broadcast K-row boundary join here.
    */
  def groupSequentialTwoProportion(
      df: DataFrame,
      keyCols: Seq[String],
      peekCol: String,
      n1Col: String, s1Col: String,
      n2Col: String, s2Col: String,
      k: Int,
      alpha: Double = 0.05d,
      spending: String = "obf"
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val bs = boundaries(k, alpha, spending)
    val spark = df.sparkSession
    import spark.implicits._
    val bFrame = broadcast(bs.map(b =>
        (b.look, b.t, b.alphaSpent, b.z, math.round(b.z * 1e9d)))
      .toDF("look", "t_frac", "alpha_spent", "z_bound", "__zb9"))
    val g = keyCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLook = Window.partitionBy(g: _*).orderBy(col("peek"))
    val cum = df.select(g :+ col(peekCol).as("peek") :+
        col(n1Col).cast("long").as("__dn1") :+ col(s1Col).cast("long").as("__ds1") :+
        col(n2Col).cast("long").as("__dn2") :+ col(s2Col).cast("long").as("__ds2"): _*)
      .withColumn("n_lo", sum("__dn1").over(wCum))
      .withColumn("s_lo", sum("__ds1").over(wCum))
      .withColumn("n_hi", sum("__dn2").over(wCum))
      .withColumn("s_hi", sum("__ds2").over(wCum))
      .withColumn("look", row_number().over(wLook))
    val n1 = col("n_lo").cast("double"); val n2 = col("n_hi").cast("double")
    val s1 = col("s_lo").cast("double"); val s2 = col("s_hi").cast("double")
    val delta = (col("s_lo").cast(dec) * col("n_hi").cast(dec) -
      col("s_hi").cast(dec) * col("n_lo").cast(dec)).cast("double") / (n1 * n2)
    val pPool = (s1 + s2) / (n1 + n2)
    val v = pPool * (lit(1d) - pPool) * (lit(1d) / n1 + lit(1d) / n2)
    val usable = col("n_lo") > 0L && col("n_hi") > 0L &&
      (col("s_lo") + col("s_hi")) > 0L &&
      (col("s_lo") + col("s_hi")) < (col("n_lo") + col("n_hi"))
    val z = delta / sqrt(v)
    val withZ = cum
      .withColumn("z", when(usable, z))
      .withColumn("__z9", when(usable, round(abs(z) * 1e9d).cast("long")))
      .join(bFrame, Seq("look"), "left")
    val rejectAt = when(col("__zb9").isNotNull && col("__z9").isNotNull,
      col("__z9") >= col("__zb9"))
    withZ
      .withColumn("reject_at", rejectAt)
      .withColumn("crossed", coalesce(
        max(when(rejectAt, 1L).otherwise(0L)).over(wCum) > 0L, lit(false)))
      .select(g :+ col("peek") :+ col("look") :+ col("t_frac") :+
        col("n_lo") :+ col("s_lo") :+ col("n_hi") :+ col("s_hi") :+
        col("z") :+ col("alpha_spent") :+ col("z_bound") :+
        col("reject_at") :+ col("crossed"): _*)
  }

  /** Φ as a COLUMN dag — the same NR-Chebyshev erfc as [[phi]], written
    * in Column arithmetic so conditional power evaluates inside the
    * engine (Spark has no normal-CDF builtin); [[phiSqlFragment]] emits
    * the identical expression as DuckDB SQL, so the oracle's doubles
    * match bitwise. Keep the two in lockstep: same coefficients, same
    * association order.
    */
  def phiCol(x: Column): Column = {
    val y = x / lit(math.sqrt(2.0)) * lit(-1.0) // erfc argument
    val ax = abs(y)
    val t = lit(1.0) / (lit(1.0) + lit(0.5) * ax)
    val poly = t * exp(lit(-1.0) * ax * ax - lit(1.26551223) +
      t * (lit(1.00002368) + t * (lit(0.37409196) + t * (lit(0.09678418) +
      t * (lit(-0.18628806) + t * (lit(0.27886807) + t * (lit(-1.13520398) +
      t * (lit(1.48851587) + t * (lit(-0.82215223) + t * lit(0.17087277))))))))))
    val erfc = when(y >= 0d, poly).otherwise(lit(2.0) - poly)
    lit(0.5) * erfc
  }

  /** The DuckDB rendering of [[phiCol]] over the SQL expression `x` —
    * substituted where the oracle needs Φ. `x` must be a parenthesized
    * expression.
    */
  def phiSqlFragment(x: String): String = {
    val sqrt2 = math.sqrt(2.0).toString
    val y = s"($x / $sqrt2 * -1.0)"
    val ax = s"abs($y)"
    val t = s"(1.0 / (1.0 + 0.5 * $ax))"
    val poly = s"($t * exp(-1.0 * $ax * $ax - 1.26551223 + " +
      s"$t * (1.00002368 + $t * (0.37409196 + $t * (0.09678418 + " +
      s"$t * (-0.18628806 + $t * (0.27886807 + $t * (-1.13520398 + " +
      s"$t * (1.48851587 + $t * (-0.82215223 + $t * 0.17087277))))))))))"
    s"(0.5 * (CASE WHEN $y >= 0 THEN $poly ELSE 2.0 - $poly END))"
  }

  /** Conditional power at each interim look (Lan & Wittes 1988's
    * B-value formulation; Proschan, Lan & Wittes 2006 ch. 3) — the
    * futility read beside the boundaries: with B(t) = z_t·√t Brownian
    * with drift θ·t, the probability the FIXED final test (|z| ≥
    * z_{α/2}, the house pinned 1.959964 at α = 0.05) still rejects is
    *
    *   CP(θ) = 1 − Φ( (z_{α/2} − B(t) − θ(1−t)) / √(1−t) )
    *
    * evaluated under three conventions per look: θ = 0 (`cp_null` — the
    * drift vanishes from here on), θ̂ = B(t)/t (`cp_trend` — the current
    * trend continues; the standard futility input, stop when it falls
    * below ~0.1), and θ_d = δ_design/(se_t·√t) (`cp_design` — the
    * originally powered effect; se_t from the pooled-p variance, so
    * θ_d uses the observed information rate). The final look (t = 1)
    * carries NULL CPs — the fixed test itself answers there. Same
    * increment state, cumulative counts, and determinism rules as
    * [[groupSequentialTwoProportion]]; Φ evaluates in-engine via
    * [[phiCol]].
    */
  def conditionalPowerTwoProportion(
      df: DataFrame,
      keyCols: Seq[String],
      peekCol: String,
      n1Col: String, s1Col: String,
      n2Col: String, s2Col: String,
      k: Int,
      deltaDesign: Double,
      zAlpha: Double = 1.959964d
  ): DataFrame = {
    require(k >= 1, s"K must be >= 1: $k")
    val dec = "decimal(38,0)"
    val g = keyCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLook = Window.partitionBy(g: _*).orderBy(col("peek"))
    val cum = df.select(g :+ col(peekCol).as("peek") :+
        col(n1Col).cast("long").as("__dn1") :+ col(s1Col).cast("long").as("__ds1") :+
        col(n2Col).cast("long").as("__dn2") :+ col(s2Col).cast("long").as("__ds2"): _*)
      .withColumn("n_lo", sum("__dn1").over(wCum))
      .withColumn("s_lo", sum("__ds1").over(wCum))
      .withColumn("n_hi", sum("__dn2").over(wCum))
      .withColumn("s_hi", sum("__ds2").over(wCum))
      .withColumn("look", row_number().over(wLook))
    val n1 = col("n_lo").cast("double"); val n2 = col("n_hi").cast("double")
    val s1 = col("s_lo").cast("double"); val s2 = col("s_hi").cast("double")
    val delta = (col("s_lo").cast(dec) * col("n_hi").cast(dec) -
      col("s_hi").cast(dec) * col("n_lo").cast(dec)).cast("double") / (n1 * n2)
    val pPool = (s1 + s2) / (n1 + n2)
    val v = pPool * (lit(1d) - pPool) * (lit(1d) / n1 + lit(1d) / n2)
    val usable = col("n_lo") > 0L && col("n_hi") > 0L &&
      (col("s_lo") + col("s_hi")) > 0L &&
      (col("s_lo") + col("s_hi")) < (col("n_lo") + col("n_hi"))
    val t = col("look").cast("double") / lit(k.toDouble)
    val z = delta / sqrt(v)
    val b = z * sqrt(t)
    val interim = usable && col("look") < k
    // STAGE each Φ argument as a real column before it enters [[phiCol]]
    // (r17 optimization): phiCol references its argument ~12× (the
    // Chebyshev t appears ten times in the polynomial), so an inline
    // argument tree — itself containing b and z substituted repeatedly —
    // multiplied to tens of thousands of Catalyst nodes and cost ~2 s of
    // driver-side analysis/optimization PER EXECUTION at any data scale.
    // As staged columns the duplication copies attribute references;
    // CollapseProject keeps non-cheap multi-use aliases staged. The
    // float ops are UNCHANGED — same dag per value, same oracle.
    // the `interim` guard stays ON the staged columns too: ANSI evaluates
    // an unguarded division eagerly, and √(1−t) = 0 at the final look
    def cpArg(theta: Column): Column = when(interim,
      (lit(zAlpha) - b - theta * (lit(1.0) - t)) / sqrt(lit(1.0) - t))
    def cp(arg: Column): Column = when(interim, lit(1.0) - phiCol(arg))
    cum
      .withColumn("__a_null", cpArg(lit(0.0)))
      .withColumn("__a_trend", cpArg(b / t))
      .withColumn("__a_design", cpArg(lit(deltaDesign) / (sqrt(v) * sqrt(t))))
      .withColumn("t_frac", t)
      .withColumn("z", when(usable, z))
      .withColumn("cp_null", cp(col("__a_null")))
      .withColumn("cp_trend", cp(col("__a_trend")))
      .withColumn("cp_design", cp(col("__a_design")))
      .select(g :+ col("peek") :+ col("look") :+ col("t_frac") :+
        col("n_lo") :+ col("s_lo") :+ col("n_hi") :+ col("s_hi") :+
        col("z") :+ col("cp_null") :+ col("cp_trend") :+ col("cp_design"): _*)
  }

  /** [[groupSequentialTwoProportion]]'s MEAN-metric twin on the
    * [[SequentialTests.msprtMean]] increment state (per-peek n/Σy/Σy²
    * per arm): cumulative exact moments, Δ̂ from the exact cross
    * product, the Welch plug-in variance V = V₁/(n₁²(n₁−1)) +
    * V₂/(n₂²(n₂−1)), z = Δ̂/√V against the same pinned boundaries with
    * the same nano-integer compare. Unusable peeks (either n < 2 or
    * zero pooled variance) carry NULL z and contribute no crossing.
    */
  def groupSequentialMean(
      df: DataFrame,
      keyCols: Seq[String],
      peekCol: String,
      n1Col: String, s1Col: String, q1Col: String,
      n2Col: String, s2Col: String, q2Col: String,
      k: Int,
      alpha: Double = 0.05d,
      spending: String = "obf"
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val bs = boundaries(k, alpha, spending)
    val spark = df.sparkSession
    import spark.implicits._
    val bFrame = broadcast(bs.map(b =>
        (b.look, b.t, b.alphaSpent, b.z, math.round(b.z * 1e9d)))
      .toDF("look", "t_frac", "alpha_spent", "z_bound", "__zb9"))
    val g = keyCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLook = Window.partitionBy(g: _*).orderBy(col("peek"))
    val cum = df.select(g :+ col(peekCol).as("peek") :+
        col(n1Col).cast("long").as("__dn1") :+
        col(s1Col).cast(dec).as("__ds1") :+ col(q1Col).cast(dec).as("__dq1") :+
        col(n2Col).cast("long").as("__dn2") :+
        col(s2Col).cast(dec).as("__ds2") :+ col(q2Col).cast(dec).as("__dq2"): _*)
      .withColumn("n_lo", sum("__dn1").over(wCum))
      .withColumn("__s1", sum("__ds1").over(wCum))
      .withColumn("__q1", sum("__dq1").over(wCum))
      .withColumn("n_hi", sum("__dn2").over(wCum))
      .withColumn("__s2", sum("__ds2").over(wCum))
      .withColumn("__q2", sum("__dq2").over(wCum))
      .withColumn("look", row_number().over(wLook))
    val n1D = col("n_lo").cast(dec); val n2D = col("n_hi").cast(dec)
    val n1 = col("n_lo").cast("double"); val n2 = col("n_hi").cast("double")
    val v1 = n1D * col("__q1") - col("__s1") * col("__s1")
    val v2 = n2D * col("__q2") - col("__s2") * col("__s2")
    val delta = (col("__s1") * n2D - col("__s2") * n1D).cast("double") / (n1 * n2)
    val v = v1.cast("double") / (n1 * n1 * (n1 - 1d)) +
      v2.cast("double") / (n2 * n2 * (n2 - 1d))
    val usable = col("n_lo") >= 2L && col("n_hi") >= 2L && (v1 + v2) > 0L
    val z = delta / sqrt(v)
    val withZ = cum
      .withColumn("z", when(usable, z))
      .withColumn("__z9", when(usable, round(abs(z) * 1e9d).cast("long")))
      .join(bFrame, Seq("look"), "left")
    val rejectAt = when(col("__zb9").isNotNull && col("__z9").isNotNull,
      col("__z9") >= col("__zb9"))
    withZ
      .withColumn("reject_at", rejectAt)
      .withColumn("crossed", coalesce(
        max(when(rejectAt, 1L).otherwise(0L)).over(wCum) > 0L, lit(false)))
      .withColumn("sum_lo", col("__s1").cast("string"))
      .withColumn("sum_hi", col("__s2").cast("string"))
      .select(g :+ col("peek") :+ col("look") :+ col("t_frac") :+
        col("n_lo") :+ col("sum_lo") :+ col("n_hi") :+ col("sum_hi") :+
        col("z") :+ col("alpha_spent") :+ col("z_bound") :+
        col("reject_at") :+ col("crossed"): _*)
  }
}
