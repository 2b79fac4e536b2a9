package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-amplified A/B of every windowed-vs-bucketed twin pair — the
  * operating-curve measurement SURVEY §5.12 records. The hot-GROUP
  * regime the cellScaffold twins exist for is manufactured directly:
  * every sf lineitem row is replicated `amp`-fold into ONE group
  * (values de-tied by replica index — hot VALUES are a different
  * problem with a different answer, the sketch sample path), so the
  * windowed arm's per-group rank window degenerates to a single-reducer
  * sort of the whole frame while the bucketed arm sorts cells. Theil–Sen
  * runs on a synthetic dense series instead (its O(n²) PAIR frame is
  * the thing that lands on one reducer in the windowed arm).
  *
  * Equivalence first (bit-identical collect for 1-row outputs, an
  * order-free count+xxhash64 checksum for row-emitting ops), then
  * alternating timed reps, min-of-reps reported per arm.
  *
  * Usage: runMain graft.AbTwinSkew [amp] [sfDir] [reps]
  */
object AbTwinSkew {

  def main(args: Array[String]): Unit = {
    val amp = args.lift(0).map(_.toInt).getOrElse(8)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
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
    import graft.operators.Quantiles
    import graft.quality.Profiler
    import graft.operators.TimeSeries

    // ONE hot group: |lineitem| × amp rows, values de-tied per replica
    def hot(): DataFrame = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("long").as("__q"),
        concat_ws(":", col("l_orderkey"), col("l_linenumber")).as("__tb0"))
      .withColumn("__rep", explode(expr(s"sequence(1, $amp)")))
      .select(lit("hot").as("g"),
        (col("__q") * 1000L + col("__rep") % 997L).as("v"),
        (col("__q") * 7L % 5000L + col("__rep")).as("y"),
        concat_ws(":", col("__tb0"), col("__rep")).as("tb"))

    // dense single-key series for the Theil–Sen pair frame
    def series(n: Int): DataFrame = spark.range(n.toLong).select(
      col("id").as("t"),
      (col("id") % 97L * 3L + col("id") / 50L).as("yv"))

    def run(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def checksum(df: DataFrame): Seq[Any] = {
      val cs = df.columns.toSeq.map(c => col(c).cast("string"))
      // DECIMAL sum: full-range hash longs overflow a long sum under ANSI
      df.agg(count(lit(1)), sum(xxhash64(cs: _*).cast("decimal(38,0)")))
        .collect()(0).toSeq
    }
    def ab(name: String, win: () => DataFrame, bkt: () => DataFrame,
        oneRow: Boolean): Unit = {
      if (oneRow) {
        val a = win().collect().toSeq
        val b = bkt().collect().toSeq
        require(a == b, s"$name arms disagree:\n$a\n$b")
      } else require(checksum(win()) == checksum(bkt()), s"$name checksums disagree")
      run(win); run(bkt) // warmup
      val (ws, bs) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
      for (i <- 0 until reps) {
        ws(i) = run(win)
        bs(i) = run(bkt)
      }
      println(f"[abtwin] $name%-10s amp=$amp windowed=${ws.min}%.2f s " +
        f"bucketed=${bs.min}%.2f s ratio=${bs.min / ws.min}%.2f")
    }

    ab("mad",
      () => Quantiles.madOutliers(hot(), Seq("g"), "v", "tb", 3),
      () => Quantiles.madOutliersBucketed(hot(), Seq("g"), "v", "tb", 3),
      oneRow = true)
    ab("iqr",
      () => Quantiles.iqrOutliers(hot(), Seq("g"), "v", "tb"),
      () => Quantiles.iqrOutliersBucketed(hot(), Seq("g"), "v", "tb"),
      oneRow = false)
    ab("gini",
      () => Quantiles.gini(hot(), Seq("g"), "v", "tb"),
      () => Quantiles.giniBucketed(hot(), Seq("g"), "v", "tb"),
      oneRow = true)
    ab("spearman",
      () => Profiler.spearman(hot(), Seq("g"), "v", "y"),
      () => Profiler.spearmanBucketed(hot(), Seq("g"), "v", "y"),
      oneRow = true)
    ab("trimmed",
      () => Quantiles.trimmedMean(hot(), Seq("g"), "v", "tb", trimPct = 10),
      () => Quantiles.trimmedMean(hot(), Seq("g"), "v", "tb", trimPct = 10),
      oneRow = true) // scaffold-only op: self-A/B = run-to-run noise floor
    // quantile shift: the hot frame split into two snapshots by replica
    // parity — each arm pays its per-side rank machinery twice
    def half(parity: Int): DataFrame = hot()
      .withColumn("__h", xxhash64(col("tb")) % 2)
      .filter(abs(col("__h")) === parity).drop("__h")
    ab("qshift",
      () => Quantiles.quantileShift(half(0), half(1), Seq("g"), "v", "tb"),
      () => Quantiles.quantileShiftBucketed(half(0), half(1), Seq("g"), "v", "tb"),
      oneRow = false)
    val n = 3000
    ab("theilsen",
      () => TimeSeries.theilSen(series(n), Nil, "t", "yv"),
      () => TimeSeries.theilSenBucketed(series(n), Nil, "t", "yv"),
      oneRow = true)
    spark.stop()
  }
}
