package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-order interleave — the final ordering step of
  * a pretraining-data pipeline: given per-source mixture weights, emit a
  * global order in which EVERY PREFIX carries each source in proportion
  * to its weight (so training can stop at any token budget and still
  * have seen the designed mixture). Classic stride scheduling / start-
  * time fair queuing (Waldspurger & Weihl 1995, public): source s's
  * k-th document sits at virtual time (k − 1/2) / w_s; sorting all
  * documents by that time interleaves sources at weight ratio.
  *
  * Everything is integer-exact and engine-replayable:
  * - within-source shuffle order is the md5 of the id (the repo's
  *   portable uniform draw),
  * - the within-source rank is computed SKEW-SAFELY: documents bucket
  *   by their 2-hex-char md5 prefix (256 buckets), per-(source, bucket)
  *   counts roll up into bucket offsets on a tiny frame, and the
  *   row_number window partitions by (source, bucket) — no
  *   one-reducer-per-source sort at 100 TB; bucket-prefix order equals
  *   md5-string order, so offset + in-bucket rank IS the source rank,
  * - the stride key floor((2r−1)·scale / 2w) uses the repo's exact
  *   DECIMAL(38,0) floor-division idiom `(n − pmod(n, d)) / d` — never
  *   a rounded decimal divide; ties (possible once ranks exceed
  *   scale/w) break deterministically by (key, source, rank).
  *
  * The operator emits the ORDER KEY, not positions: a global
  * consecutive position column is a one-partition window by
  * construction. The trainer materializes order with a distributed
  * `ORDER BY (order_key, source, src_rank)` (range-partitioned sort);
  * gates that want explicit positions compute them at gate scale.
  */
object Interleave {

  /** Default stride resolution: ranks up to scale/weight get distinct
    * keys; beyond that, deterministic tie-breaks keep order total.
    */
  val DefaultScale: Long = 1000000000L

  /** Portable within-source shuffle key: 15 hex chars of md5(id). */
  private def md5Key(id: Column): Column =
    substring(md5(encode(id.cast("string"), "UTF-8")), 1, 15)

  /** Global interleave order for `df` given a `(source, weight)` frame
    * (weights ≥ 1; a source missing from `weights` fails fast per-row).
    * Returns (id, source, weight, src_rank, order_key); global training
    * order = ORDER BY (order_key, source, src_rank).
    */
  def trainingOrder(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weights: DataFrame,
      scale: Long = DefaultScale
  ): DataFrame = {
    val t = df.select(col(idCol).as("id"), col(sourceCol).as("source"))
      .withColumn("__h", md5Key(col("id")))
      .withColumn("__b", substring(col("__h"), 1, 2))
    // per-(source, bucket) counts → bucket start offsets; ≤ 256·|sources|
    // rows, so the cumsum window is driver-trivial and the join broadcasts
    val offsets = t.groupBy("source", "__b").count()
      .withColumn("__off",
        sum("count").over(
          Window.partitionBy("source").orderBy("__b")) - col("count"))
      .select("source", "__b", "__off")
    val ranked = t
      .join(broadcast(offsets), Seq("source", "__b"))
      .withColumn("__rb",
        row_number().over(
          Window.partitionBy("source", "__b").orderBy("__h", "id")))
      .withColumn("src_rank", (col("__off") + col("__rb")).cast("long"))
    // validate weights BEFORE the long cast: a fractional weight would
    // silently truncate (0.9 → 0 even divides by zero downstream), and
    // the stride contract needs integers ≥ 1 — fail fast per-row instead.
    // A duplicated source row would fan out the join below and silently
    // duplicate every document of that source in the emitted order —
    // fail fast on that too (the weights frame is tiny; the window is free).
    val wdeduped = weights
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("source")))
      .select(col("source"),
        when(col("__n") > 1, raise_error(format_string(
          "Interleave: source '%s' appears %s times in weights (must be unique)",
          col("source"), col("__n"))))
          .otherwise(col("weight")).as("weight"))
    val wchecked = wdeduped.select(col("source"),
      when(col("weight").cast("double") =!= col("weight").cast("long").cast("double") ||
           col("weight").cast("long") < 1 || col("weight").isNull,
        raise_error(format_string(
          "Interleave: weight for source '%s' must be an integer >= 1, got %s",
          col("source"), col("weight"))))
        .otherwise(col("weight").cast("long")).as("weight"))
    val withW = ranked
      .join(broadcast(wchecked), Seq("source"), "left")
      .withColumn("weight",
        when(col("weight").isNull,
          raise_error(format_string(
            "Interleave: source '%s' has no weight", col("source"))))
          .otherwise(col("weight")))
    val dec = "decimal(38,0)"
    val num = (col("src_rank").cast(dec) * 2 - 1) * lit(scale).cast(dec)
    val den = col("weight").cast(dec) * 2
    withW
      .withColumn("order_key", ((num - pmod(num, den)) / den).cast("long"))
      .select("id", "source", "weight", "src_rank", "order_key")
  }
}
