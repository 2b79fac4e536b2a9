package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of [[graft.dedup.ExactSubstr.scrub]] on the q124
  * input shape — locates the cost (gram kernel vs dup aggregate vs the
  * join+rewrite) before any optimization is attempted (the AbLmScore
  * discipline: same-JVM alternation, min-of-N).
  *
  * Usage: runMain graft.AbExactSubstr [sfDir] [reps]
  */
object AbExactSubstr {
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
    val t = when(col("doc_id") % 3 === 0,
        concat(lit("alpha beta gamma delta epsilon zeta eta theta "), col("text")))
      .when(col("doc_id") % 3 === 1,
        concat(col("text"), lit(" omega psi chi phi upsilon tau sigma rho")))
      .otherwise(col("text"))
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), t.as("text"))
    d.persist(); d.count()

    import graft.dedup.ExactSubstr
    def time(label: String, f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      // drop any cache the run left so reps stay independent (Spark's
      // CacheManager matches by logical plan, so a leftover cache would
      // silently accelerate EVERY later arm)
      spark.catalog.clearCache()
      d.persist(); d.count()
      println(f"[ab] $label%-22s ${s}%.3f s")
      s
    }
    val gramsOnly = () => ExactSubstr.grams(d, "doc_id", "text", 8)
    val dupAgg = () => ExactSubstr.grams(d, "doc_id", "text", 8)
      .withColumn("__code", expr("doc_id * 1048576 + pos"))
      .groupBy("h").agg(count(lit(1)).as("f"), min("__code").as("fc"))
      .filter(col("f") > 1)
    val full = () => ExactSubstr.scrub(d, "doc_id", "text", 8, persistGrams = false)
    val persisted = () => ExactSubstr.scrub(d, "doc_id", "text", 8, persistGrams = true)
    Seq("grams" -> gramsOnly, "dupAgg" -> dupAgg, "full" -> full, "persisted" -> persisted)
      .foreach { case (l, f) => time(s"warm:$l", f) }
    val mins = collection.mutable.Map[String, Double]().withDefaultValue(1e9)
    for (_ <- 0 until reps) {
      Seq("grams" -> gramsOnly, "dupAgg" -> dupAgg, "full" -> full, "persisted" -> persisted).foreach {
        case (l, f) => mins(l) = math.min(mins(l), time(l, f))
      }
    }
    println(f"[ab] MIN grams=${mins("grams")}%.3f dupAgg=${mins("dupAgg")}%.3f full=${mins("full")}%.3f persisted=${mins("persisted")}%.3f")
    spark.stop()
  }
}
