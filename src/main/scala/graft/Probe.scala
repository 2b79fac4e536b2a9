package graft

import org.apache.spark.sql.SparkSession

/** Decomposed single-query timer: `runMain graft.Probe <q1,q2,...> [sfDir] [reps] [cpus]`
  * times each query's CONSTRUCTION (fn(spark, dir) — which for the
  * eager-materialize family includes the upstream row-scale collect) and
  * its EXECUTION (the noop write) separately, so an optimization session
  * can see which side of the eager-execution contract the seconds sit on.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse(sys.error("usage: Probe <q1,q2,...> [sfDir] [reps] [cpus]"))
      .split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = args.lift(3).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(js.stageInfos.size)
        starts.put(js.jobId, System.nanoTime())
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(je.jobId)
        if (t0 != 0L) jobMs.addAndGet((System.nanoTime() - t0) / 1000000L)
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      (0 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force optimize + physical planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        val tag = if (i == 0) "warmup" else s"rep$i"
        println(f"[probe] $name $tag: construct ${(t1 - t0) / 1e9}%.3f s, plan ${(t2 - t1) / 1e9}%.3f s, run ${(t3 - t2) / 1e9}%.3f s, jobs ${jobs.getAndSet(0)}, stages ${stages.getAndSet(0)}, jobwall ${jobMs.getAndSet(0) / 1000.0}%.2f s")
      }
    }
    spark.stop()
  }
}
