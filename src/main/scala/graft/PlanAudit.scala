package graft

/** Physical-plan dump for every SparkEntry query — the audit artifact
  * behind SURVEY §5's plan claims. Writes `<out>/<name>.plan.txt` with
  * the POST-EXECUTION plan (AQE final: `isFinalPlan=true`), so what's
  * audited is what actually ran, not the initial speculative plan.
  *
  * Usage: runMain graft.PlanAudit <sfDir> <outDir> [namePrefixFilter]
  * The structural load-bearing shapes are asserted per-query in
  * PlanShapeSpec (the regression gate); this main is for eyeballing
  * and for regenerating the audit record after an intentional change.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val filter: String => Boolean =
      if (args.length > 2) { val ps = args(2).split(","); n => ps.exists(n.startsWith) }
      else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if filter(name)) {
      try {
        val df = fn(spark, sfDir)
        df.collect() // drive AQE to the final plan
        val plan = df.queryExecution.executedPlan.toString
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$name.plan.txt"),
          plan.getBytes("UTF-8"))
      } catch {
        case e: Exception =>
          println(s"[planaudit] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
