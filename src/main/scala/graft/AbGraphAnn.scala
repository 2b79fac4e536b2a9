package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.{GraphAnn, Knn}

/** Operating-curve harness for the graph-ANN retriever (q166/q167):
  * recall@5 against [[Knn.bruteForceTopK]] truth across
  * beam ∈ {8, 16, 32} × hops ∈ {2, 3, 4} × entry strategy
  * (global md5-earliest 8 vs one per k-means cell) on the SF-dir
  * embeddings, one graph build shared by all cells of the grid.
  * Numbers are recorded in SURVEY §5; the recall-vs-beam monotonicity
  * the curve shows is spec-locked in ScaleOpsSpec.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.AbGraphAnn"
  */
object AbGraphAnn {
  def main(args: Array[String]): Unit = {
    val dir = sys.env("SPARK_GRAFT_SF_DIR")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < 50)
    val assigned = Knn.assignCells(e, "vec_id", "embedding",
      Knn.buildIvfIndex(e, "vec_id", "embedding", nlist = 16)).persist()
    assigned.count()
    val degree = sys.env.getOrElse("SPARK_GRAFT_ANN_DEGREE", "8").toInt
    val graph = GraphAnn.buildGraph(assigned, graphDegree = degree).persist()
    graph.count()
    val truth = Knn.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id")).persist()
    val nTruth = truth.count().toDouble

    val entryArms = Seq(
      "global8" -> GraphAnn.entryPoints(assigned, 8),
      "perCell1" -> GraphAnn.entryPointsPerCell(assigned, 1))
    for ((ename, entries) <- entryArms; beam <- Seq(8, 16, 32); hops <- Seq(2, 3, 4)) {
      val res = GraphAnn.searchTopK(graph, e, queries, "vec_id", "embedding",
        entries, k = 5, beam = beam, hops = hops)
      val hits = res.join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"degree=$degree%2d entries=$ename%-9s beam=$beam%2d hops=$hops recall@5=${hits / nTruth}%.3f ($hits/${nTruth.toLong})")
    }
    // layered (HNSW) arm: same degree, content-keyed levels, descent seeds
    val leveled = GraphAnn.assignLevels(assigned, maxLevel = 2).persist()
    val layers = GraphAnn.buildLayers(assigned, graphDegree = degree, maxLevel = 2).persist()
    leveled.count(); layers.count()
    for (beam <- Seq(8, 16, 32); hops <- Seq(2, 3, 4)) {
      val res = GraphAnn.searchLayered(layers, e, queries, "vec_id", "embedding",
        leveled, maxLevel = 2, k = 5, beam = beam, hops = hops, upperBeam = 8)
      val hits = res.join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"degree=$degree%2d entries=layered    beam=$beam%2d hops=$hops recall@5=${hits / nTruth}%.3f ($hits/${nTruth.toLong})")
    }
    spark.stop()
  }
}
