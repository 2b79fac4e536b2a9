package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the graph operators' plan strategies on the q132/q135
  * input shapes (the AbLmScore discipline): PageRank with vs without
  * per-iteration checkpoints, Triangles id-ordered vs degree-ordered vs
  * degree-ordered with a checkpointed oriented-edge frame.
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
      .select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst"))
    val triEdges = li.as("x")
      .join(li.as("y"), col("x.l_orderkey") === col("y.l_orderkey"))
      .filter(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").cast("string").as("src"),
        col("y.l_partkey").cast("string").as("dst"))

    def time(label: String, f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      li.persist(); li.count()
      println(f"[ab] $label%-28s ${s}%.3f s")
      s
    }
    def stage(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ab] stage $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
    }
    val canon = triEdges.select(col("src").as("s"), col("dst").as("d"))
      .filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"), greatest(col("s"), col("d")).as("b"))
      .distinct().localCheckpoint()
    stage("canon")(canon.count())
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val deg = canon.select(col("a").as("n")).unionAll(canon.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d")).persist(mad)
    stage("deg")(deg.count())
    val withDeg = canon
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    val ka = struct(col("da").as("d"), col("a").as("n"))
    val kb = struct(col("db").as("d"), col("b").as("n"))
    val o = withDeg.select(
      when(ka < kb, col("a")).otherwise(col("b")).as("src"),
      when(ka < kb, kb).otherwise(ka).as("dk"))
      .select(col("src"), col("dk").getField("n").as("dst"), col("dk"))
      .localCheckpoint()
    stage("orient")(o.count())
    val wedges = o.as("e1").join(o.as("e2"),
      col("e1.src") === col("e2.src") && col("e1.dk") < col("e2.dk"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"), col("e2.dst").as("z"))
    stage("wedges")(wedges.count())
    val tri = wedges.join(o.select(col("src").as("y"), col("dst").as("z")), Seq("y", "z"))
    stage("closure")(tri.count())
    spark.stop()

  }
}
