package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Same-JVM alternating A/B of [[graft.operators.Quantiles.madOutliers]]
  * (single-exchange: the median attaches as a window aggregate over the
  * shared group-key partitioning) vs the round-8 first formulation
  * (median via groupBy, re-joined onto a second scan of the fact) — the
  * bench discipline SURVEY records for intra-query optimizations.
  *
  * Usage: runMain graft.AbMad [sfDir] [reps]
  */
object AbMad {

  /** The replaced formulation, kept verbatim as the control arm. */
  private def madJoin(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      tieBreakCol: String, k: Int): DataFrame = {
    val part = Window.partitionBy(keyCols.map(col): _*)
    val med = df.select((keyCols :+ valueCol :+ tieBreakCol).map(col): _*)
      .withColumn("__rn", row_number().over(part.orderBy(col(valueCol), col(tieBreakCol))))
      .withColumn("__n", count(lit(1)).over(part))
      .groupBy(keyCols.map(col): _*)
      .agg(max(when(col("__rn") === expr("(__n + 1) div 2"), col(valueCol))).as("med"))
    val dev = df.select((keyCols :+ valueCol :+ tieBreakCol).map(col): _*)
      .join(med, keyCols)
      .withColumn("__dev", abs(col(valueCol) - col("med")))
    dev
      .withColumn("__rn", row_number().over(part.orderBy(col("__dev"), col(tieBreakCol))))
      .withColumn("__n", count(lit(1)).over(part))
      .withColumn("__mad",
        max(when(col("__rn") === expr("(__n + 1) div 2"), col("__dev"))).over(part))
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("__n")).as("n"), max(col("med")).as("med"),
        max(col("__mad")).as("mad"),
        sum((col("__dev") > lit(k.toDouble) * col("__mad")).cast("long")).as("n_outliers"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def input() = Tables.lineitem(spark, sfDir).select(
      col("l_returnflag"),
      (col("l_quantity").cast("long") +
        when(col("l_orderkey") % 997 === 0, 500L).otherwise(0L)).as("qty"),
      concat_ws(":", col("l_orderkey"), col("l_linenumber")).as("tb"))
    def run(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val win = () => graft.operators.Quantiles
      .madOutliers(input(), Seq("l_returnflag"), "qty", "tb", 3)
    val join = () => madJoin(input(), Seq("l_returnflag"), "qty", "tb", 3)
    // equivalence first: an A/B of unequal results is meaningless
    val a = win().orderBy("l_returnflag").collect().toSeq
    val b = join().orderBy("l_returnflag").collect().toSeq
    require(a == b, s"arms disagree:\n$a\n$b")
    run(win); run(join) // warmup both arms
    val (ws, js) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    for (i <- 0 until reps) { // alternate so JIT/GC drift hits both arms
      ws(i) = run(win)
      js(i) = run(join)
      println(f"[ab] rep$i window=${ws(i)}%.3f join=${js(i)}%.3f")
    }
    println(f"[ab] min window=${ws.min}%.3f s, min join=${js.min}%.3f s, " +
      f"ratio=${js.min / ws.min}%.2f")
    spark.stop()
  }
}
