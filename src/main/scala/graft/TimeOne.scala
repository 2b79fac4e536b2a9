package graft

import org.apache.spark.sql.SparkSession

/** Single-query timer: `runMain graft.TimeOne <queryName> [sfDir] [reps]`
  * runs one SparkEntry query `reps` times (after one warmup) and prints
  * per-rep seconds — the micro-loop for optimizing a single query without
  * paying for the full Bench sweep.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: TimeOne <queryName> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("SPARK_GRAFT_MAXPART", "134217728"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; have: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    (0 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      // full execution via noop, matching Bench (count() lets Catalyst
      // eliminate count-invariant subtrees and under-report)
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      if (i > 0) println(f"[timeone] $name rep$i: $dt%.3f s")
      else println(f"[timeone] $name warmup: $dt%.3f s")
    }
    spark.stop()
  }
}
