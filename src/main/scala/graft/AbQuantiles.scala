package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B: windowed exact rank selection ([[graft.operators.Quantiles
  * .exactQuantiles]] — per-group sort on one reducer) vs the skew-safe
  * bucketed-rank variant ([[graft.operators.Quantiles
  * .exactQuantilesBucketed]] — 256 value cells, only target cells
  * ranked) on a HOT-GROUP corpus: every lineitem row in ONE group, so
  * the windowed arm's single reducer sorts the entire fact while the
  * bucketed arm's largest sort is one cell. Methodology mirrors
  * [[AbMad]]: arm-equivalence asserted first, both arms warmed, reps
  * alternated, min-of-reps reported.
  *
  * Run: sbt "runMain graft.AbQuantiles /root/testdata/sf0.1 3"
  */
object AbQuantiles {
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
    // one group holds ~86% of the corpus (hot), the rest spread thin —
    // the shape where a per-group window serializes on one reducer;
    // optional 3rd arg replicates the fact ×N (distinct tie-breaks) to
    // probe how the gap moves with group size
    val amp = args.lift(2).map(_.toInt).getOrElse(1)
    def input() = Tables.lineitem(spark, sfDir)
      .crossJoin(spark.range(amp).toDF("rep"))
      .select(
      when(col("l_orderkey") % 7 < 6, lit("hot"))
        .otherwise(concat(lit("g"), col("l_orderkey") % 97)).as("grp"),
      col("l_extendedprice").cast("double").as("v"),
      concat_ws(":", col("l_orderkey"), col("l_linenumber"), col("rep")).as("tb"))
    def run(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val win = () => graft.operators.Quantiles
      .exactQuantiles(input(), Seq("grp"), "v", "tb")
    val buck = () => graft.operators.Quantiles
      .exactQuantilesBucketed(input(), Seq("grp"), "v", "tb")
    val a = win().orderBy("grp").collect().toSeq
    val b = buck().orderBy("grp").collect().toSeq
    require(a == b, s"arms disagree:\n${a.take(5)}\n${b.take(5)}")
    run(win); run(buck)
    val (ws, bs) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    for (i <- 0 until reps) {
      ws(i) = run(win)
      bs(i) = run(buck)
      println(f"[ab] rep$i window=${ws(i)}%.3f bucketed=${bs(i)}%.3f")
    }
    println(f"[ab] min window=${ws.min}%.3f s, min bucketed=${bs.min}%.3f s, " +
      f"win/buck ratio=${ws.min / bs.min}%.2f")
    spark.stop()
  }
}
