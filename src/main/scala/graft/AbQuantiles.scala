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
    // 4th arg picks the statistic: quantiles (default) | gini |
    // spearman | winsorize — same hot-group corpus, same methodology,
    // so the round-10 bucketed family A/Bs on the exact shape the
    // quantile adopt decision used. gini needs integer non-negative
    // values (cents); spearman pairs v with a second monotone-with-noise
    // column derived from the tie-break hash.
    val op = args.lift(3).getOrElse("quantiles")
    import graft.operators.Quantiles
    import graft.quality.Profiler
    def giniIn() = input().select(col("grp"),
      (col("v") * 100).cast("long").as("v"), col("tb"))
    def spIn() = input().select(col("grp"),
      (col("v") * 100).cast("long").as("x"),
      ((col("v") * 100).cast("long") * 3 +
        (conv(substring(md5(col("tb")), 1, 4), 16, 10).cast("long") % 997)).as("y"))
    val (win, buck): (() => DataFrame, () => DataFrame) = op match {
      case "quantiles" => (
        () => Quantiles.exactQuantiles(input(), Seq("grp"), "v", "tb"),
        () => Quantiles.exactQuantilesBucketed(input(), Seq("grp"), "v", "tb"))
      case "gini" => (
        () => Quantiles.gini(giniIn(), Seq("grp"), "v", "tb"),
        () => Quantiles.giniBucketed(giniIn(), Seq("grp"), "v", "tb"))
      case "winsorize" => (
        () => Quantiles.winsorize(input(), Seq("grp"), "v", "tb"),
        () => Quantiles.winsorizeBucketed(input(), Seq("grp"), "v", "tb"))
      case "spearman" => (
        () => Profiler.spearman(spIn(), Seq("grp"), "x", "y"),
        () => Profiler.spearmanBucketed(spIn(), Seq("grp"), "x", "y"))
      case other => sys.error(s"unknown op: $other")
    }
    // winsorize emits row-per-input (millions at amp 8) — arm equivalence
    // checks an exact per-group reduction (count + decimal clamp sum +
    // bounds) instead of a driver-sized collect; the per-row identity is
    // the ScaleOpsSpec arm-equivalence spec's job at spec scale
    def armView(df: DataFrame) =
      if (op == "winsorize")
        df.groupBy("grp").agg(
          count(lit(1)).as("n"),
          sum(col("v_wins").cast("decimal(38,6)")).as("s"),
          min("lo").as("lo"), max("hi").as("hi"))
      else df
    val a = armView(win()).orderBy("grp").collect().toSeq
    val b = armView(buck()).orderBy("grp").collect().toSeq
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
