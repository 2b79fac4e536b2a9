package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Min-of-N timing of the graph operators on the q132/q135/q139 input
  * shapes (the AbLmScore discipline: same-JVM alternation, cache
  * cleared between reps so Spark's plan-keyed CacheManager cannot let
  * one arm accelerate another). The stage-level variants of this
  * harness located the three §5.8 iterative-plan traps; this is the
  * surviving regression harness for the fixed operators.
  *
  * Usage: runMain graft.AbGraph [sfDir] [reps]
  */
object AbGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
    li.persist(); li.count()
    val prEdges = Tables.lineitem(spark, sfDir)
      .select((-col("l_suppkey") - 1).cast("long").as("src"),
        col("l_partkey").cast("long").as("dst"))
    def supEdges = li.as("x")
      .join(li.as("y"), col("x.l_orderkey") === col("y.l_orderkey"))
      .filter(col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
      .select(col("pa").cast("long").as("src"), col("pb").cast("long").as("dst"))

    def time(label: String, f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      li.persist(); li.count()
      println(f"[ab] $label%-22s ${s}%.3f s")
      s
    }
    val arms: Seq[(String, () => DataFrame)] = Seq(
      "pagerank" -> (() => graft.graph.PageRank.hostAuthority(prEdges, 5)),
      "triangles" -> (() => graft.graph.Triangles.perNode(
        supEdges.select(col("src").cast("string").as("src"),
          col("dst").cast("string").as("dst")))),
      "kcore" -> (() => graft.graph.KCore.corePeel(supEdges, k = 3, rounds = 12))
    )
    arms.foreach { case (l, f) => time(s"warm:$l", f) }
    val mins = collection.mutable.Map[String, Double]().withDefaultValue(1e9)
    for (_ <- 0 until reps)
      arms.foreach { case (l, f) => mins(l) = math.min(mins(l), time(l, f)) }
    println(mins.toSeq.sortBy(_._1).map { case (l, v) => f"$l=${v}%.2f" }
      .mkString("[ab] MIN ", " ", ""))
    spark.stop()
  }
}
