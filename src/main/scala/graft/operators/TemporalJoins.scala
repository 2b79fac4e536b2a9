package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators Spark lacks as primitives, built by
  * composition (the preferred path — Catalyst keeps optimizing them):
  *
  *  - as-of join: attach the latest right-side row at-or-before each left
  *    timestamp, per key. Implemented as union + one window pass — ONE
  *    shuffle on the key, versus the naive approach (inequality join +
  *    aggregation) which is a quadratic per-key blowup.
  *  - range join: point-in-interval matching via bucket blocking — an
  *    equi-join on bucket ids instead of a cross join with a BETWEEN
  *    filter (Spark would otherwise plan BroadcastNestedLoopJoin).
  */
object TemporalJoins {

  /** As-of join (left join semantics): every left row, plus `valueCols`
    * from the nearest right row with equal keys — the latest at-or-before
    * (`direction = "backward"`, default) or earliest at-or-after
    * (`"forward"`). With `tolerance = Some(t)` a match further than `t`
    * timestamp units away is nulled out (pandas merge_asof semantics;
    * requires numeric timestamps).
    *
    * Right rows must be unique per (keys, rightTs) — deduplicate first
    * (ties would be resolved arbitrarily, same caveat as DuckDB's ASOF).
    *
    * Scale shape: one hash shuffle of (left ∪ right) on the keys, one sort
    * within partitions, no join node at all. Window carries only the value
    * columns forward (`last(..., ignoreNulls)`).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None
  ): DataFrame = {
    require(keys.nonEmpty, "keys must not be empty")
    require(Seq("backward", "forward").contains(direction), s"unknown direction: $direction")
    val leftCols = left.columns.toSeq
    // the matched right timestamp rides along as a pseudo value column so
    // the tolerance check can see it
    val carried = valueCols :+ "__rts"
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_left", lit(1))
      .select(
        (keys.map(col) :+ col("__ts") :+ col("__is_left")) ++
          leftCols.filterNot(keys.contains).map(col) ++
          valueCols.map(v => lit(null).cast(right.schema(v).dataType).as(s"__v_$v")) :+
          lit(null).cast(right.schema(rightTs).dataType).as("__v___rts"): _*
      )
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__is_left", lit(0))
      .select(
        (keys.map(col) :+ col("__ts") :+ col("__is_left")) ++
          leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          valueCols.map(v => col(v).as(s"__v_$v")) :+
          col(rightTs).as("__v___rts"): _*
      )
    // right sorts before left at equal __ts => inclusive semantics in
    // both directions; forward just walks time in reverse
    val tsOrder = if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = l.unionByName(r)
      .select(col("*") +: carried.map(v => last(col(s"__v_$v"), ignoreNulls = true).over(w).as(v)): _*)
    val withinTol = tolerance match {
      case None => lit(true)
      case Some(t) =>
        if (direction == "backward") col("__ts") - col("__rts") <= t
        else col("__rts") - col("__ts") <= t
    }
    attached
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => when(withinTol, col(v)).otherwise(lit(null)).as(v)): _*)
  }

  /** As-of join, `nearest` direction — the third pandas `merge_asof`
    * direction (backward/forward landed rounds 2/3): each left row takes
    * the right row with the SMALLEST absolute timestamp distance, ties
    * broken toward backward (the at-or-before row), `tolerance` bounding
    * the distance on both sides. One union + ONE keyed exchange with TWO
    * window passes over it (ascending for the backward candidate,
    * descending for the forward one) — the same single-shuffle contract
    * as [[asOfJoin]], one extra sort.
    */
  def asOfJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None
  ): DataFrame = {
    require(keys.nonEmpty, "keys must not be empty")
    val leftCols = left.columns.toSeq
    val carried = valueCols :+ "__rts"
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_left", lit(1))
      .select(
        (keys.map(col) :+ col("__ts") :+ col("__is_left")) ++
          leftCols.filterNot(keys.contains).map(col) ++
          valueCols.map(v => lit(null).cast(right.schema(v).dataType).as(s"__v_$v")) :+
          lit(null).cast(right.schema(rightTs).dataType).as("__v___rts"): _*
      )
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__is_left", lit(0))
      .select(
        (keys.map(col) :+ col("__ts") :+ col("__is_left")) ++
          leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          valueCols.map(v => col(v).as(s"__v_$v")) :+
          col(rightTs).as("__v___rts"): _*
      )
    // right before left at equal __ts in BOTH orders => inclusive both ways
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = l.unionByName(r).select(
      col("*") +:
        (carried.map(v => last(col(s"__v_$v"), ignoreNulls = true).over(wB).as(s"__b_$v")) ++
          carried.map(v => last(col(s"__v_$v"), ignoreNulls = true).over(wF).as(s"__f_$v"))): _*)
    val bDist = col("__ts") - col("__b___rts")
    val fDist = col("__f___rts") - col("__ts")
    val bValid = col("__b___rts").isNotNull &&
      tolerance.map(t => bDist <= t).getOrElse(lit(true))
    val fValid = col("__f___rts").isNotNull &&
      tolerance.map(t => fDist <= t).getOrElse(lit(true))
    val chooseB = bValid && (!fValid || bDist <= fDist)
    attached
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v =>
          when(chooseB, col(s"__b_$v"))
            .when(fValid, col(s"__f_$v"))
            .otherwise(lit(null)).as(v)): _*)
  }

  /** As-of join through the custom planner path (graft.plans.AsOfJoinNode →
    * AsOfJoinStrategy → AsOfJoinExec): a real sort-merge as-of physical
    * operator — one clustered exchange + sort per side, single merge pass,
    * O(1) state. Requires the session to carry [[graft.GraftExtensions]]
    * (which injects the strategy) and LONG timestamp columns.
    *
    * Semantics are identical to [[asOfJoin]]; both are oracle-checked
    * against DuckDB's native ASOF JOIN (q34/q36).
    */
  def asOfJoinNative(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]
  ): DataFrame = {
    import org.apache.spark.sql.graftbridge
    import org.apache.spark.sql.types.LongType
    require(left.schema(leftTs).dataType == LongType, s"$leftTs must be LONG")
    require(right.schema(rightTs).dataType == LongType, s"$rightTs must be LONG")
    val lp = graftbridge.analyzed(left)
    // re-alias every right column: fresh exprIds prevent self-join ambiguity
    // when left and right share lineage (DeduplicateRelations couldn't tell
    // which side the node's right-key attributes refer to otherwise)
    val rightFresh = right.select(right.columns.map(c => right(c).as(c)).toSeq: _*)
    val rp = graftbridge.analyzed(rightFresh)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      plan.output.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"column not found: $n"))
    graftbridge.ofRows(left.sparkSession, graft.plans.AsOfJoinNode(
      lp, rp,
      keys.map(attr(lp, _)), keys.map(attr(rp, _)),
      attr(lp, leftTs), attr(rp, rightTs),
      valueCols.map(attr(rp, _))
    ))
  }

  /** Point-in-interval join: rows of `points` matched to every interval
    * containing them. Bucket blocking: intervals explode onto the fixed
    * grid of `bucketSize`-wide buckets they overlap; points hash to their
    * single bucket; the match becomes equi-join(bucket) + BETWEEN filter.
    * Choose bucketSize near the typical interval width: wider ⇒ more
    * false candidates per bucket, narrower ⇒ more replicas per interval.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketSize: Long
  ): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    val p = points.withColumn("__bucket", floor(col(pointCol) / bucketSize).cast("long"))
    val iv = intervals
      .withColumn(
        "__bucket",
        explode(sequence(
          floor(col(loCol) / bucketSize).cast("long"),
          floor(col(hiCol) / bucketSize).cast("long")))
      )
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bucket")
  }

  /** Valid-time alignment join: intersect two interval tables (e.g. two
    * SCD2 histories tracking different attributes of the same entity) into
    * the piecewise segments where BOTH were valid — "what was the user's
    * event_type AND value band between t1 and t2". The standard temporal
    * warehouse question, answered without any timeline explosion:
    * equi-join on the entity key (one co-partitioned shuffle per side),
    * overlap predicate, intersection bounds via greatest/least.
    *
    * Interval convention: [start, end) with NULL end = open/current (both
    * inputs follow [[graft.operators.Scd2]]'s contract). Output carries
    * both sides' payloads plus `seg_from`/`seg_to` (NULL = open).
    *
    * Per-key version counts are naturally small (bounded by change
    * frequency), so the join fan-out is |versions_a| × |versions_b| per
    * key only in the worst case and the overlap filter prunes to the
    * O(|a| + |b|) aligned segments.
    */
  def validTimeAlign(
      a: DataFrame,
      b: DataFrame,
      keys: Seq[String],
      fromCol: String = "valid_from",
      toCol: String = "valid_to"
  ): DataFrame = {
    val open = Long.MaxValue
    // suffix collision-prone bound columns; payload columns are the
    // caller's responsibility to keep distinct across the two sides
    val la = a.withColumnRenamed(fromCol, "__a_from")
      .withColumn("__a_to", coalesce(col(toCol).cast("long"), lit(open))).drop(toCol)
    val lb = b.withColumnRenamed(fromCol, "__b_from")
      .withColumn("__b_to", coalesce(col(toCol).cast("long"), lit(open))).drop(toCol)
    la.join(lb, keys)
      .filter(col("__a_from") < col("__b_to") && col("__b_from") < col("__a_to"))
      .withColumn("seg_from", greatest(col("__a_from"), col("__b_from")))
      .withColumn("seg_to",
        when(least(col("__a_to"), col("__b_to")) === open, lit(null).cast("long"))
          .otherwise(least(col("__a_to"), col("__b_to"))))
      .drop("__a_from", "__a_to", "__b_from", "__b_to")
  }
}
