package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-time sf1-scale anchor run — the natural-distribution datum SURVEY
  * §5.13 records next to §5.12's skew-synthetic curve: the slowest gate
  * queries, run once against a 10× blow-up of the sf0.1 tables, so every
  * "would survive 100×" adjudication has at least one measured 10× point.
  * A query whose sf0.1→sf1 wall-clock scales superlinearly (≫ amp×) earns
  * a plan re-audit.
  *
  * The blow-up keeps the STAR GEOMETRY of the generator: dimension tables
  * (region/nation/customer/supplier/part) stay single-copy; fact tables
  * (orders/lineitem/events/documents/embeddings) replicate `amp`-fold with
  * internal keys shifted per copy (orderkey, event_id, doc_id, vec_id —
  * +copy·10¹⁰, far above any sf0.1 key) so intra-fact joins stay 1:1 and
  * group cardinality grows with the data, while dim FKs are left alone so
  * star joins keep matching. Document text gets a per-copy marker token
  * appended — without it every copy is an EXACT duplicate and the dedup
  * blocking frames grow amp²-adversarial, which is not what sf1 looks
  * like.
  *
  * Usage: runMain graft.AnchorSf1 [amp] [srcDir] [outDir] [q1,q2,... |
  * "top15"]. Tables build once (skipped when outDir/_ANCHOR_DONE exists);
  * each query is timed with one warmup discarded and one timed rep
  * (noop-write sink, the AbTwinSkew discipline).
  */
object AnchorSf1 {

  /** The 15 slowest r12 gate queries (bench_full.json, descending). */
  val Top15: Seq[String] = Seq(
    "q197_spearman_matrix_bucketed", "q165_personalized_pagerank",
    "q220_theil_sen_bucketed", "q132_pagerank", "q217_theil_sen",
    "q188_spearman_bucketed", "q153_harmonic", "q191_spearman_sketch",
    "q192_spearman_matrix", "q139_kcore", "q124_exactsubstr",
    "q135_triangles", "q154_quantile_sketch", "q133_containment",
    "q103_dsir_select")

  private val KeyOff = 10000000000L

  def main(args: Array[String]): Unit = {
    val amp = args.lift(0).map(_.toInt).getOrElse(10)
    val srcDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(2).getOrElse("target/anchor_sf1")
    val names = args.lift(3) match {
      case None | Some("top15") => Top15
      case Some(csv)            => csv.split(",").toSeq
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    buildIfAbsent(spark, srcDir, outDir, amp)

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, outDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- names) {
      try {
        run(name) // warmup (scan cache, codegen)
        println(f"[anchor] $name%-32s amp=$amp ${run(name)}%.2f s")
      } catch {
        case e: Throwable =>
          println(s"[anchor] $name FAILED: ${e.getMessage.linesIterator.next()}")
      }
    }
    spark.stop()
  }

  private def buildIfAbsent(
      spark: SparkSession, srcDir: String, outDir: String, amp: Int): Unit = {
    val done = new java.io.File(s"$outDir/_ANCHOR_DONE")
    if (done.exists()) { println(s"[anchor] tables ready at $outDir"); return }
    def src(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[anchor] built $t")
    }
    // replicate with per-copy shifts on the named internal key columns
    def blow(df: DataFrame, shiftCols: Seq[String]): DataFrame = {
      val withCopy = df
        .withColumn("__copy", explode(expr(s"sequence(0L, ${amp - 1}L)")))
      shiftCols.foldLeft(withCopy)((d, c) =>
        d.withColumn(c, col(c) + col("__copy") * KeyOff)).drop("__copy")
    }
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      write(t, src(t))
    write("orders", blow(src("orders"), Seq("o_orderkey")))
    write("lineitem", blow(src("lineitem"), Seq("l_orderkey")))
    write("events", blow(src("events"), Seq("event_id")))
    write("documents",
      blow(src("documents"), Seq("doc_id"))
        // de-duplicate copies textually: an sf1 corpus is bigger, not
        // amp-fold exact-duplicated (which would square the dedup
        // blocking frames); copy 0 keeps the original text byte-for-byte
        .withColumn("text",
          when(col("doc_id") >= KeyOff,
            concat(col("text"), lit(" anchorc"), (col("doc_id") / KeyOff).cast("long")))
            .otherwise(col("text"))))
    write("embeddings", blow(src("embeddings"), Seq("vec_id")))
    done.getParentFile.mkdirs()
    java.nio.file.Files.writeString(done.toPath, s"amp=$amp src=$srcDir\n")
    ()
  }
}
