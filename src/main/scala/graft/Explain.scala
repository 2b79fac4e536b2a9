package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Explain <queryName> [sfDir]` prints the
  * formatted physical plan of one SparkEntry query — the feedback loop for
  * keeping scans pruned, aggregates hash-based, and joins broadcast where
  * intended.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <queryName> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
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
    // comma-separated names print one labeled plan each (single-JVM batch)
    name.split(",").foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n'; have: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      println(s"[explain] ===== $n =====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
