package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM alternating A/B of [[graft.text.LmScore.score]] (fused
  * single-explode) vs the two-pass reference formulation — the bench
  * discipline SURVEY records for intra-query optimizations (two separate
  * Bench runs can't resolve sub-second deltas on a shared host).
  *
  * Usage: runMain graft.AbLmScore [sfDir] [reps]
  */
object AbLmScore {
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
    val d = Tables.documents(spark, sfDir).select("doc_id", "lang", "text")
    val ref = d.filter(col("doc_id") % 10 < 8)
    val uni = graft.text.LmScore.unigramCounts(ref, "text", minCount = 2)
      .persist()
    val bi = graft.text.LmScore.bigramCounts(ref, "text", minCount = 2)
      .persist()
    uni.count(); bi.count() // model build cost excluded from both arms
    def run(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val fused = () => graft.text.LmScore.score(d, "doc_id", "text", uni, bi)
    val twoPass = () => graft.text.LmScore.scoreTwoPass(d, "doc_id", "text", uni, bi)
    run(fused); run(twoPass) // warmup both arms
    val (fs, ts) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    for (i <- 0 until reps) { // alternate so JIT/GC drift hits both arms
      fs(i) = run(fused)
      ts(i) = run(twoPass)
      println(f"[ab] rep$i fused=${fs(i)}%.3f two-pass=${ts(i)}%.3f")
    }
    println(f"[ab] min fused=${fs.min}%.3f s, min two-pass=${ts.min}%.3f s, " +
      f"ratio=${ts.min / fs.min}%.2f")
    spark.stop()
  }
}
