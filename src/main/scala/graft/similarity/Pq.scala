package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for memory-bound ANN at corpus scale.
  *
  * IVF ([[Knn.buildIvfIndex]]) prunes WHICH vectors are scored; PQ shrinks
  * WHAT is scored: each (L2-normalized) vector is chopped into `m`
  * subvectors, each subvector replaced by the id of its nearest codebook
  * centroid — the corpus is stored as `m` small ints per vector (8 bytes at
  * m=8) instead of 4·dim float bytes, a 32× compression at dim=64 that is
  * the difference between an in-memory corpus scan and an I/O-bound one at
  * 100 TB. Scoring uses the asymmetric distance computation (ADC): ONE
  * m×k lookup table of ⟨query-subvector, centroid⟩ dots per query, then
  * every corpus row costs m table lookups + adds — no per-row float math.
  *
  * The ADC score is approximate, so [[pqTopK]] reranks the top
  * `rerankFactor`·k ADC candidates with EXACT cosine against the original
  * vectors — the standard two-stage shape: candidates from the compressed
  * scan, final order from the exact metric.
  *
  * Codebooks are a tiny (m·k rows) parquet-persistable DataFrame, built
  * once per corpus from a deterministic sample — same lifecycle as the IVF
  * index.
  */
object Pq {

  private def normalized(v: Column): Column = {
    val norm = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    transform(v, x => x / norm)
  }

  /** Train per-subvector k-means codebooks: (sub, code, centroid) with
    * `m` · `codesPerBook` rows. Vectors are L2-normalized first so ADC
    * inner products approximate cosine.
    */
  def buildCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      codesPerBook: Int = 16,
      seed: Long = 7L,
      maxIter: Int = 5,
      trainFraction: Double = 1.0,
      initMode: String = "k-means||"
  ): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    val spark = corpus.sparkSession
    val base = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("v", normalized(col("v")))
    val train =
      if (trainFraction >= 1.0) base
      else graft.operators.Sampling.deterministic(base, Seq("id"), trainFraction)
    val dim = train.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val toVec = udf { (a: Seq[Double]) =>
      org.apache.spark.ml.linalg.Vectors.dense(a.toArray)
    }
    // one persisted pass feeds all m fits (each fit re-reads its slice)
    val slices = train.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      import spark.implicits._
      val rows = (0 until m).flatMap { s =>
        val sub = slices.select(
          toVec(slice(col("v"), s * dsub + 1, dsub)).as("features"))
        val model = new KMeans().setK(codesPerBook).setSeed(seed + s)
          .setMaxIter(maxIter).setInitMode(initMode)
          .setFeaturesCol("features").setPredictionCol("code")
          .fit(sub)
        model.clusterCenters.zipWithIndex.map { case (c, i) =>
          (s, i, c.toArray.toSeq)
        }
      }
      rows.toDF("sub", "code", "centroid")
    } finally { slices.unpersist(false); () }
  }

  /** Codebooks from a deterministic md5-ordered sample — NO k-means: the
    * first `codesPerBook` sampled vectors' subvectors become the
    * centroids. Centroid quality is data-dependent (use [[buildCodebooks]]
    * for production recall; [[pqTopK]]'s exact rerank is correct under ANY
    * codebook), but the build is one tiny driver-side collect — the
    * bootstrap/CI path, and a valid k-means init.
    */
  def sampleCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      codesPerBook: Int = 16
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("v", normalized(col("v")))
      .withColumn("__h", substring(graft.operators.Sampling.keyHash(Seq(col("id"))), 1, 15))
      .orderBy("__h")
      .limit(codesPerBook)
    val sample = base.select("v").collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "corpus has no non-null vectors")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val rows = for {
      s <- 0 until m
      (vec, i) <- sample.zipWithIndex
    } yield (s, i, vec.slice(s * dsub, (s + 1) * dsub).toSeq)
    rows.toDF("sub", "code", "centroid")
  }

  private def booksOf(codebooks: DataFrame): Array[Array[Array[Double]]] = {
    val rows = codebooks
      .select(col("sub"), col("code"), col("centroid").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val out = Array.ofDim[Array[Array[Double]]](m)
    rows.groupBy(_._1).foreach { case (s, rs) =>
      val k = rs.map(_._2).max + 1
      val book = Array.ofDim[Array[Double]](k)
      rs.foreach { case (_, c, v) => book(c) = v }
      out(s) = book
    }
    out
  }

  /** Encode every corpus vector as its `m` nearest-centroid codes — one
    * narrow compiled pass against the broadcast codebooks. NULL vectors
    * encode as NULL (never candidates, mirrors [[Knn.assignCells]]).
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, codebooks: DataFrame): DataFrame = {
    val books = booksOf(codebooks)
    val m = books.length
    val enc = udf { (v0: Seq[Double]) =>
      if (v0 == null) null
      else {
        val v = v0.toArray
        var nrm = 0.0
        var t = 0
        while (t < v.length) { nrm += v(t) * v(t); t += 1 }
        nrm = math.sqrt(nrm)
        val dsub = v.length / m
        val codes = new Array[Int](m)
        var s = 0
        while (s < m) {
          val book = books(s)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < book.length) {
            var d = 0.0; var j = 0
            while (j < dsub) {
              val x = v(s * dsub + j) / nrm - book(c)(j)
              d += x * x
              j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          codes(s) = best
          s += 1
        }
        codes.toSeq
      }
    }
    corpus.select(col(idCol).as("id"), enc(col(vecCol).cast("array<double>")).as("codes"))
      .filter(col("codes").isNotNull)
  }

  /** Two-stage PQ top-k: ADC candidate scan over the compressed codes
    * (per-task LUT memo — the table is built once per query per task, each
    * corpus row then costs m lookups), exact-cosine rerank of the top
    * `rerankFactor`·k candidates against the original vectors.
    *
    * @param corpus the ORIGINAL vectors (id, vec) for the rerank stage.
    */
  def pqTopK(
      codes: DataFrame,
      codebooks: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rerankFactor: Int = 4
  ): DataFrame = {
    require(k > 0 && rerankFactor >= 1)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .filter(col("qv").isNotNull)
    val cand = codes.join(broadcast(q), col("id") =!= col("query_id"))
    adcShortlistRerank(cand, codebooks, corpus, idCol, vecCol, k, rerankFactor)
  }

  /** IVF × PQ — the production ANN shape at corpus scale: the IVF index
    * prunes WHICH rows are scanned (nprobe cells per query), the PQ codes
    * shrink WHAT each scanned row costs (m lookups on m bytes), and the
    * exact-cosine rerank restores precision on the shortlist.
    *
    * @param cells  (id, cell) from [[Knn.assignCells]]
    * @param ivfIndex (cell, centroid) from [[Knn.buildIvfIndex]]
    * @param codes  (id, codes) from [[encode]]
    */
  def ivfPqTopK(
      cells: DataFrame,
      ivfIndex: DataFrame,
      codes: DataFrame,
      codebooks: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 4,
      rerankFactor: Int = 4
  ): DataFrame = {
    require(k > 0 && nprobe > 0 && rerankFactor >= 1)
    val q = Knn.probeCells(queries, idCol, vecCol, ivfIndex, nprobe)
    val cand = codes.join(cells.select(col("id"), col("cell")), Seq("id"))
      .join(broadcast(q), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
    adcShortlistRerank(cand, codebooks, corpus, idCol, vecCol, k, rerankFactor)
  }

  /** ADC-score candidates (id, codes, query_id, qv), shortlist the top
    * rerankFactor·k per query, exact-cosine rerank against the original
    * vectors.
    */
  private def adcShortlistRerank(
      cand0: DataFrame,
      codebooks: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rerankFactor: Int
  ): DataFrame = {
    val books = booksOf(codebooks)
    val m = books.length
    val adc = udf {
      new ((Seq[Int], Seq[Double], Long) => java.lang.Double) with Serializable {
        // per-task instance (Spark deserializes the closure per task, and a
        // task is single-threaded), so a plain memo map is safe
        @transient private lazy val luts =
          scala.collection.mutable.Map.empty[Long, Array[Array[Double]]]
        private def lut(q: Seq[Double]): Array[Array[Double]] = {
          val qa = q.toArray
          var nrm = 0.0
          var t = 0
          while (t < qa.length) { nrm += qa(t) * qa(t); t += 1 }
          nrm = math.sqrt(nrm)
          val dsub = qa.length / m
          Array.tabulate(m) { s =>
            val book = books(s)
            Array.tabulate(book.length) { c =>
              var d = 0.0; var j = 0
              while (j < dsub) { d += (qa(s * dsub + j) / nrm) * book(c)(j); j += 1 }
              d
            }
          }
        }
        def apply(cs: Seq[Int], qv: Seq[Double], qid: Long): java.lang.Double =
          if (cs == null || qv == null) null
          else {
            val table = luts.getOrElseUpdate(qid, lut(qv))
            var sc = 0.0; var s = 0
            while (s < m) { sc += table(s)(cs(s)); s += 1 }
            sc
          }
      }
    }
    val cand = cand0.withColumn("adc", adc(col("codes"), col("qv"), col("query_id")))
    val wAdc = Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("id"))
    val shortlist = cand
      .withColumn("__r", row_number().over(wAdc))
      .filter(col("__r") <= k * rerankFactor)
      .select(col("query_id"), col("id"), col("qv"))
    val exact = shortlist.join(
        corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v")),
        Seq("id"))
      .withColumn("score", Knn.cosine(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("id"))
    exact
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("score"))
  }
}
