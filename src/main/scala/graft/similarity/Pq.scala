package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for memory-bound ANN at corpus scale.
  *
  * IVF ([[Knn.buildIvfIndex]]) prunes WHICH vectors are scored; PQ shrinks
  * WHAT is scored: each (L2-normalized) vector is chopped into `m`
  * subvectors, each subvector replaced by the byte id of its nearest
  * codebook centroid — the corpus is stored as a BINARY column of exactly
  * m bytes per vector (8 bytes at m=8) instead of 4·dim float bytes, a
  * true 32× compression at dim=64 that is the difference between an
  * in-memory corpus scan and an I/O-bound one at 100 TB. Scoring uses the
  * asymmetric distance computation (ADC): ONE m×k lookup table of
  * ⟨query-subvector, centroid⟩ dots per query, then every corpus row
  * costs m table lookups + adds — no per-row float math.
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
    require(codesPerBook <= 256, "codesPerBook must fit a byte (<= 256)")
    val train =
      if (trainFraction >= 1.0) base
      else graft.operators.Sampling.deterministic(base, Seq("id"), trainFraction)
    val first = train.select(size(col("v"))).head(1)
    require(first.nonEmpty, "corpus has no non-null vectors (or the train sample is empty)")
    val dim = first.head.getInt(0)
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
    require(codesPerBook <= 256, "codesPerBook must fit a byte (<= 256)")
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
    require(rows.nonEmpty, "codebooks frame is empty")
    val m = rows.map(_._1).max + 1
    val out = Array.ofDim[Array[Array[Double]]](m)
    rows.groupBy(_._1).foreach { case (s, rs) =>
      val k = rs.map(_._2).max + 1
      require(k <= 256, s"codesPerBook $k exceeds 256 — codes would not fit a byte")
      val book = Array.ofDim[Array[Double]](k)
      rs.foreach { case (_, c, v) => book(c) = v }
      out(s) = book
    }
    require(out.flatMap(_.map(_.length)).distinct.length == 1,
      "codebooks have inconsistent centroid dimensions")
    out
  }

  private def encUdf(books: Array[Array[Array[Double]]]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val m = books.length
    val dsubBook = books(0)(0).length
    udf { (v0: Seq[Double]) =>
      // NULL or wrong-dimension vectors (codebooks trained on a different
      // dim) encode as NULL — dropped, never a silently-truncated code
      if (v0 == null || v0.length != m * dsubBook) null
      else {
        val v = v0.toArray
        var nrm = 0.0
        var t = 0
        while (t < v.length) { nrm += v(t) * v(t); t += 1 }
        nrm = math.sqrt(nrm)
        val codes = new Array[Byte](m)
        var s = 0
        while (s < m) {
          val book = books(s)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < book.length) {
            var d = 0.0; var j = 0
            while (j < dsubBook) {
              val x = v(s * dsubBook + j) / nrm - book(c)(j)
              d += x * x
              j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          codes(s) = best.toByte
          s += 1
        }
        codes
      }
    }
  }

  /** Encode every corpus vector as its `m` nearest-centroid codes — a
    * BINARY column of exactly m bytes (codesPerBook ≤ 256), so the stored
    * compression ratio really is 4·dim / m. One narrow compiled pass
    * against the broadcast codebooks; NULL (or wrong-dimension) vectors
    * encode as NULL (never candidates, mirrors [[Knn.assignCells]]).
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, codebooks: DataFrame): DataFrame = {
    val books = booksOf(codebooks)
    corpus.select(col(idCol).as("id"),
        encUdf(books)(col(vecCol).cast("array<double>")).as("codes"))
      .filter(col("codes").isNotNull)
  }

  /** (id, cell, codes) — the IVF-PQ index frame: cell assignment and PQ
    * codes attached in ONE narrow pass (no join). Build this once per
    * corpus at index time; [[ivfPqTopK]] then never touches raw vectors
    * until its rerank.
    */
  def indexCodes(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: DataFrame,
      ivfIndex: DataFrame
  ): DataFrame = {
    val books = booksOf(codebooks)
    Knn.assignCells(corpus, idCol, vecCol, ivfIndex)
      .withColumn("codes", encUdf(books)(col("v")))
      .filter(col("codes").isNotNull)
      .select(col("id"), col("cell"), col("codes"))
  }

  /** Two-stage PQ top-k: ADC candidate scan over the compressed codes
    * (per-task LUT memo — the table is built once per query per task, each
    * corpus row then costs m lookups), exact-cosine rerank of the top
    * `rerankFactor`·k candidates against the original vectors.
    *
    * DELIBERATELY EXHAUSTIVE: this flat variant scores every (row, query)
    * pair and ranks all N·Q ADC scores through one per-query window — it
    * is the oracle/validation path (q83 uses it with the shortlist opened
    * so the identity vs flat search gates the machinery) and the
    * small-corpus fallback. At corpus scale use [[ivfPqTopK]], where IVF
    * cells prune the scan before any ranking; bolting a TakeOrdered-style
    * per-partition pre-filter onto THIS path would just re-implement a
    * worse cell pruner while complicating the oracle contract.
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
    adcShortlistRerank(cand, q, codebooks, corpus, idCol, vecCol, k, rerankFactor)
  }

  /** IVF × PQ — the production ANN shape at corpus scale: the IVF index
    * prunes WHICH rows are scanned (nprobe cells per query), the PQ codes
    * shrink WHAT each scanned row costs (m lookups on m bytes), and the
    * exact-cosine rerank restores precision on the shortlist. The per-query
    * path is one broadcast join on `cell` against the prebuilt
    * [[indexCodes]] frame — the corpus never shuffles (joining separate
    * cells/codes frames per query batch would have paid a corpus-wide id
    * shuffle before any pruning, which is why the index frame carries both).
    *
    * @param cellCodes (id, cell, codes) from [[indexCodes]] — built once
    *   per corpus at index time.
    * @param ivfIndex  (cell, centroid) from [[Knn.buildIvfIndex]]
    */
  def ivfPqTopK(
      cellCodes: DataFrame,
      ivfIndex: DataFrame,
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
    val probed = Knn.probeCells(queries, idCol, vecCol, ivfIndex, nprobe)
    val q = probed.select(col("query_id"), col("qv")).distinct()
    val cand = cellCodes.join(broadcast(probed), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
    adcShortlistRerank(cand, q, codebooks, corpus, idCol, vecCol, k, rerankFactor)
  }

  /** ADC-score candidates (id, codes, query_id, qv), shortlist the top
    * rerankFactor·k per query, exact-cosine rerank against the original
    * vectors. The query vector is DROPPED before the shortlist window —
    * the ranking exchange carries (query_id, id, adc) only, never dim
    * doubles per candidate — and rejoined from the tiny broadcast query
    * frame for the rerank.
    */
  private def adcShortlistRerank(
      cand0: DataFrame,
      qFrame: DataFrame,
      codebooks: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rerankFactor: Int
  ): DataFrame = {
    val books = booksOf(codebooks)
    val m = books.length
    val dsubBook = books(0)(0).length
    val adc = udf {
      new ((Array[Byte], Seq[Double], String) => java.lang.Double) with Serializable {
        // per-task instance (Spark deserializes the closure per task, and a
        // task is single-threaded), so a plain memo map is safe; the id is
        // keyed as STRING so any idCol type works (a Long-typed param would
        // ANSI-fail or null out non-numeric ids)
        @transient private lazy val luts =
          scala.collection.mutable.Map.empty[String, Array[Array[Double]]]
        private def lut(q: Seq[Double]): Array[Array[Double]] = {
          val qa = q.toArray
          var nrm = 0.0
          var t = 0
          while (t < qa.length) { nrm += qa(t) * qa(t); t += 1 }
          nrm = math.sqrt(nrm)
          Array.tabulate(m) { s =>
            val book = books(s)
            Array.tabulate(book.length) { c =>
              var d = 0.0; var j = 0
              while (j < dsubBook) { d += (qa(s * dsubBook + j) / nrm) * book(c)(j); j += 1 }
              d
            }
          }
        }
        def apply(cs: Array[Byte], qv: Seq[Double], qid: String): java.lang.Double =
          // wrong-dimension queries score null -> filtered out below (no
          // silent truncated-LUT ranking)
          if (cs == null || qv == null || qid == null || qv.length != m * dsubBook) null
          else {
            val table = luts.getOrElseUpdate(qid, lut(qv))
            var sc = 0.0; var s = 0
            while (s < m) { sc += table(s)(cs(s) & 0xff); s += 1 }
            sc
          }
      }
    }
    val cand = cand0
      .withColumn("adc", adc(col("codes"), col("qv"), col("query_id").cast("string")))
      .filter(col("adc").isNotNull)
      .select(col("query_id"), col("id"), col("adc"))
    val wAdc = Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("id"))
    val shortlist = cand
      .withColumn("__r", row_number().over(wAdc))
      .filter(col("__r") <= k * rerankFactor)
      .select(col("query_id"), col("id"))
    val exact = shortlist.join(
        corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v")),
        Seq("id"))
      .join(broadcast(qFrame), Seq("query_id"))
      .withColumn("score", Knn.cosine(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("id"))
    exact
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("score"))
  }
}
