package graft

import graft.sources.TextFormats
import graft.text.{Chunking, Dsir, LmScore}
import org.apache.spark.sql.functions._

class ChunkSourceSpec extends SparkSpec {
  import spark.implicits._

  test("slidingChunks: window/stride geometry, short docs, NULL text, overlap accounting") {
    val d = Seq(
      (1L, "a b c d e f g"), // n=7, W=3, S=2 -> starts 0,2,4
      (2L, "a b"),           // shorter than window -> one whole-doc chunk
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Chunking.slidingChunks(d, "doc_id", "text", windowTokens = 3, strideTokens = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getInt(3))).toMap
    assert(out((1L, 0)) == ("a b c", 3))
    assert(out((1L, 1)) == ("c d e", 3))
    assert(out((1L, 2)) == ("e f g", 3))
    assert(out((2L, 0)) == ("a b", 2))
    assert(out.size == 4) // NULL text contributes nothing
    // boundary: n == W exactly -> one chunk, no phantom overlap window
    val exact = Chunking.slidingChunks(
        Seq((9L, "x y z")).toDF("doc_id", "text"), "doc_id", "text", 3, 2)
      .collect()
    assert(exact.length == 1 && exact.head.getString(2) == "x y z")
    // summary: overlap makes chunk_tokens exceed the doc's own tokens
    val sum = Chunking.chunkSummary(d, "doc_id", "text", 3, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sum(1L) == (3L, 9L)) // 9 chunk tokens over a 7-token doc
    assert(sum(2L) == (1L, 2L))
  }

  test("slidingChunks covers every token across the (n, W, S) grid — the REAL operator, not a formula mirror") {
    // distinct word per position, so set-union of chunk words == coverage
    def doc(n: Int) = (0 until n).map(i => s"w$i").mkString(" ")
    val ns = Seq(1, 2, 3, 5, 7, 8, 9, 63, 64, 65, 100)
    for ((w, s) <- Seq((3, 2), (8, 8), (8, 3), (1, 1), (64, 48))) {
      val d = ns.map(n => (n.toLong, doc(n))).toDF("doc_id", "text")
      val chunks = Chunking.slidingChunks(d, "doc_id", "text", w, s)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .groupBy(_._1)
      ns.foreach { n =>
        val expected = if (n <= w) 1 else ((n - w + s - 1) / s) + 1
        val cs = chunks(n.toLong)
        assert(cs.length == expected, s"n=$n W=$w S=$s: ${cs.length} chunks, want $expected")
        val covered = cs.flatMap(_._3.split(" ")).toSet
        assert(covered == (0 until n).map(i => s"w$i").toSet,
          s"n=$n W=$w S=$s: coverage hole")
        // chunk i starts at token i*S (the overlap geometry itself)
        cs.sortBy(_._2).zipWithIndex.foreach { case ((_, idx, text), i) =>
          assert(idx == i && text.split(" ").head == s"w${i * s}")
        }
      }
    }
  }

  test("CSV round-trip: quoting, NULLs, doubles; corrupt line quarantines instead of failing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val d = Seq(
      (1L, "plain", Some(1.5)),
      (2L, "comma, inside", Some(-0.25)),
      (3L, "quote \" and, both", None),
      (4L, null.asInstanceOf[String], Some(3.0))
    ).toDF("id", "s", "x")
    TextFormats.writeCsv(d, s"$tmp/t")
    // Spark refuses a query touching ONLY the corrupt column on raw files;
    // cache() is the documented workaround (and what a DQ gate would do)
    val back = TextFormats.readCsv(spark, s"$tmp/t", "id BIGINT, s STRING, x DOUBLE").cache()
    val rows = back.collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), Option(r.get(2)))).toMap
    assert(rows(2L)._1.contains("comma, inside"))
    assert(rows(3L)._1.contains("quote \" and, both") && rows(3L)._2.isEmpty)
    assert(rows(4L)._1.isEmpty && rows(4L)._2.contains(3.0))
    assert(back.filter(col(TextFormats.CorruptCol).isNotNull).count() == 0)
    // a malformed row (bad long) lands in the corrupt column, never a throw
    back.unpersist(blocking = true) // else the re-read reuses the cached (pre-bad-file) plan
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/t/zzz_bad.csv"),
      "id,s,x\nnot_a_long,oops,nan?\n".getBytes("UTF-8"))
    val withBad = TextFormats.readCsv(spark, s"$tmp/t", "id BIGINT, s STRING, x DOUBLE").cache()
    assert(withBad.filter(col(TextFormats.CorruptCol).isNotNull).count() == 1)
    assert(withBad.count() == 5)
  }

  test("JSON-lines round-trip: escaping and unicode; corrupt line quarantines") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val d = Seq(
      (1L, "tab\there \"quoted\" back\\slash"),
      (2L, "unicode: café 中文"),
      (3L, null.asInstanceOf[String])
    ).toDF("id", "s")
    TextFormats.writeJsonLines(d, s"$tmp/t")
    val back = TextFormats.readJsonLines(spark, s"$tmp/t", "id BIGINT, s STRING").cache()
    val rows = back.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows(1L).contains("tab\there \"quoted\" back\\slash"))
    assert(rows(2L).contains("unicode: café 中文"))
    assert(rows(3L).isEmpty)
    back.unpersist(blocking = true)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/t/zzz_bad.json"),
      "{\"id\": 7, \"s\": unterminated\n".getBytes("UTF-8"))
    val withBad = TextFormats.readJsonLines(spark, s"$tmp/t", "id BIGINT, s STRING").cache()
    assert(withBad.filter(col(TextFormats.CorruptCol).isNotNull).count() == 1)
  }

  test("LmScore: oov and bigram-hit goldens, minCount pruning, empty-bigram docs") {
    val ref = Seq(
      (1L, "the cat sat"),
      (2L, "the cat ran"),
      (3L, "a dog ran")).toDF("doc_id", "text")
    // minCount 2: vocab {the(2), cat(2), ran(2)}; bigrams {the cat(2)}
    val uni = LmScore.unigramCounts(ref, "text", minCount = 2)
    assert(uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("the" -> 2L, "cat" -> 2L, "ran" -> 2L))
    val bi = LmScore.bigramCounts(ref, "text", minCount = 2)
    assert(bi.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap ==
      Map(("the", "cat") -> 2L))
    val scored = Seq(
      (10L, "the cat zzz"), // 3 tokens, 1 oov; bigrams: (the,cat) hit, (cat,zzz) miss
      (11L, "qqq"),         // single token, oov, zero bigrams
      (12L, "ran ran")      // in-vocab, bigram (ran,ran) unattested
    ).toDF("doc_id", "text")
    val out = LmScore.score(scored, "doc_id", "text", uni, bi)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(10L) == (3L, 1L, 2L, 1L))
    assert(out(11L) == (1L, 1L, 0L, 0L))
    assert(out(12L) == (2L, 0L, 1L, 0L))
    // the fused single-explode production path equals the two-pass
    // reference formulation row-for-row
    val fused = LmScore.score(scored, "doc_id", "text", uni, bi)
    val twoPass = LmScore.scoreTwoPass(scored, "doc_id", "text", uni, bi)
    assert(fused.exceptAll(twoPass).isEmpty && twoPass.exceptAll(fused).isEmpty)
  }

  test("QualityClassifier: pure-corpus extremes hit ±scale, unattested text is neutral, gate keeps by avg margin") {
    import graft.text.QualityClassifier
    val S = QualityClassifier.DefaultScale
    val pos = Seq((1L, "good fine nice"), (2L, "good solid fine")).toDF("doc_id", "text")
    val neg = Seq((3L, "bad awful junk"), (4L, "bad noisy junk")).toDF("doc_id", "text")
    val model = QualityClassifier.train(pos, neg, "text", numBuckets = 4096)
    val docs = Seq(
      (10L, "good fine"),       // pure positive vocab → every gram at +S
      (11L, "bad awful"),       // pure negative vocab → every gram at −S
      (12L, "zzz qqq"),         // unattested → margin 0
      (13L, "good bad")         // mixed: unigrams cancel, bigram unattested
    ).toDF("doc_id", "text")
    val out = QualityClassifier.score(docs, "doc_id", "text", model, numBuckets = 4096)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(10L) == ((3L, 3L * S)))   // 2 unigrams + 1 bigram, all +S
    assert(out(11L) == ((3L, -3L * S)))
    assert(out(12L) == ((3L, 0L)))
    assert(out(13L) == ((3L, 0L)))       // +S − S + 0
    val kept = QualityClassifier.filterByQuality(docs, "doc_id", "text", model,
        numBuckets = 4096)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 12L, 13L))   // avg ≥ 0 keeps neutral, drops negative
    val tight = QualityClassifier.filterByQuality(docs, "doc_id", "text", model,
        numBuckets = 4096, thrNum = S / 2, thrDen = 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(tight == Set(10L))
    intercept[IllegalArgumentException] {
      QualityClassifier.train(pos, Seq.empty[(Long, String)].toDF("doc_id", "text"), "text")
    }
  }

  test("Dsir: selectionKey integer arithmetic golden + zero-evidence sentinel") {
    val sig = Seq(
      (1L, 10L, 100L, 200L),
      (2L, 5L, 0L, 0L),   // no gram attested in either model
      (3L, 4L, 7L, 3L)
    ).toDF("doc_id", "n_grams", "target_mass", "raw_mass")
    val out = Dsir.selectionKey(sig, targetTotal = 50L, rawTotal = 500L)
      .select("doc_id", "dsir_key").as[(Long, Long)].collect().toMap
    // t·R = 100·500 = 50000, r·T = 200·50 = 10000 → ⌊50000e9/60000⌋
    assert(out(1L) == BigInt(50000) * BigInt(1000000000) / BigInt(60000))
    assert(out(2L) == -1L)
    assert(out(3L) == BigInt(3500) * BigInt(1000000000) / BigInt(3650))
  }

  test("Dsir: target-like docs outrank off-target docs; selection is per-group") {
    val docs = Seq(
      (1L, "g", "cat cat sat mat"), (2L, "g", "cat sat on the mat"),
      (3L, "g", "zebra quark flux blip"), (4L, "g", "quark blip www yyy"),
      (5L, "h", "cat mat cat"), (6L, "h", "flux blip www")
    ).toDF("doc_id", "lang", "text")
    val sel = Dsir.select(docs, "doc_id", "text",
        targetCorpus = docs.filter($"doc_id" <= 2), fraction = 0.5,
        groupCols = Seq("lang"))
    // group g keeps ceil(4·0.5)=2 (the two target docs themselves),
    // group h keeps ceil(2·0.5)=1 (doc 5 shares cat/mat vocabulary with
    // the target; doc 6 shares nothing)
    assert(sel.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 5L))
    // off-target doc with zero target evidence keys at 0 or -1, never above
    val keys = Dsir.select(docs, "doc_id", "text",
        targetCorpus = docs.filter($"doc_id" <= 2), fraction = 1.0,
        groupCols = Seq("lang"))
      .select("doc_id", "dsir_key").as[(Long, Long)].collect().toMap
    assert(keys(1L) > keys(3L) && keys(5L) > keys(6L))
  }

  test("PerplexitySample: skew-safe tercile ranks equal the naive window; keep rule nests") {
    import graft.text.PerplexitySample
    val sigs = (1 to 90).map { i =>
      // synthetic signals: key decreases with i; a few zero-evidence docs
      if (i > 87) (i.toLong, s"g${i % 3}", 0L, 0L, 0L, 0L)
      else (i.toLong, s"g${i % 3}", 100L, i.toLong, 99L, (99 - i).toLong)
    }.toDF("doc_id", "lang", "n_tokens", "n_oov", "n_bigrams", "n_bigram_hits")
    val keyed = PerplexitySample.qualityKey(sigs)
    val got = PerplexitySample.tercileBuckets(keyed, "doc_id", Seq("lang"))
    val naive = keyed
      .withColumn("r", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("lm_key").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id").as("id2"), col("r"))
    assert(got.join(naive, got("doc_id") === naive("id2"))
      .filter(col("q_rank") =!= col("r")).isEmpty)
    // zero-evidence docs key at -1, rank last, land in the tail bucket
    val tail = got.filter(col("lm_key") === -1L).select("bucket").distinct()
      .as[Long].collect().toSeq
    assert(tail == Seq(2L))
    // terciles are 10/10/10 per 30-doc group
    val sizes = got.groupBy("lang", "bucket").count().select("count")
      .as[Long].collect().toSeq
    assert(sizes.forall(_ == 10L), sizes)
    // a caller-supplied scale threads into the cell grid: ranks stay
    // correct AND keys spread across cells (no one-reducer-per-group
    // degeneration when scale ≠ DefaultScale)
    val smallKeyed = PerplexitySample.qualityKey(sigs, scale = 1000L)
    val gotSmall = PerplexitySample
      .tercileBuckets(smallKeyed, "doc_id", Seq("lang"), scale = 1000L)
    val naiveSmall = smallKeyed
      .withColumn("r", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("lm_key").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id").as("id2"), col("r"))
    assert(gotSmall.join(naiveSmall, gotSmall("doc_id") === naiveSmall("id2"))
      .filter(col("q_rank") =!= col("r")).isEmpty)
    // the spread claim, observed directly: distinct cells > 1 per group
    val nCells = smallKeyed
      .withColumn("__c", when(col("lm_key") < 0, lit(256L))
        .otherwise(lit(255L) - floor(col("lm_key") * 255L / 1000L)))
      .filter($"lang" === "g0").select("__c").distinct().count()
    assert(nCells > 10, s"expected spread across cells, got $nCells")
    intercept[IllegalArgumentException] {
      PerplexitySample.tercileBuckets(smallKeyed, "doc_id", Seq("lang"), scale = 0L)
    }
  }

  test("Dsir: fused fits (subset and union) equal the two-pass fits exactly") {
    val docs = Seq(
      (1L, "cat cat sat mat"), (2L, "cat sat on the mat"),
      (3L, "zebra quark flux blip"), (4L, "quark blip www yyy")
    ).toDF("doc_id", "text")
    val pred = $"doc_id" <= 2
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tRef = m(Dsir.fitModel(docs.filter(pred), "text", 64))
    val rRef = m(Dsir.fitModel(docs, "text", 64))
    val (tSub, rSub) = Dsir.fitModelsSubset(docs, "text", pred, 64)
    assert(m(tSub) == tRef && m(rSub) == rRef)
    val (tUni, rUni) = Dsir.fitModels(docs.filter(pred), docs, "text", 64)
    assert(m(tUni) == tRef && m(rUni) == rRef)
    // and the fused selection path is output-identical to select()
    val a = Dsir.select(docs, "doc_id", "text", targetCorpus = docs.filter(pred),
        fraction = 0.5).select("doc_id", "dsir_key").as[(Long, Long)].collect().toSet
    val b = Dsir.selectSubset(docs, "doc_id", "text", targetPred = pred,
        fraction = 0.5).select("doc_id", "dsir_key").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("sentences: boundary runs, trimming, documented abbreviation naivety, empty/null") {
    val d = Seq(
      (1L, "One two. Three four!  Five?! Six"),
      (2L, "Dr. Smith arrived."),          // naive: splits after "Dr."
      (3L, "No terminator here"),
      (4L, "Ends exactly. "),              // trailing boundary -> no empty tail
      (5L, ""),
      (6L, null: String)
    ).toDF("id", "text")
    val got = graft.text.Chunking.sentences(d, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("One two.", "Three four!", "Five?!", "Six"))
    assert(got(2L) == Seq("Dr.", "Smith arrived."))
    assert(got(3L) == Seq("No terminator here"))
    assert(got(4L) == Seq("Ends exactly."))
    assert(got(5L) == Seq.empty)
    assert(got(6L) == Seq.empty)
    val stats = graft.text.Chunking.sentenceStats(d, "id", "text")
      .filter($"id" === 1L).head()
    assert(stats.getLong(1) == 4L)
    assert(stats.getLong(2) == "One two.Three four!Five?!Six".length.toLong)
  }

  test("sentenceChunks: greedy fill, exact-boundary pack, oversized window fallback, budget invariant") {
    val d = Seq(
      // sentences: "a b." (2) | "c d e." (3) | "f." (1) | "g h i j k l m n." (8) | "o p." (2)
      (1L, "a b. c d e. f. g h i j k l m n. o p."),
      (2L, "one two three four five."),  // t=5 == budget exactly: NOT oversized, single chunk
      (3L, ""),                           // no sentences -> no rows
      (4L, "x. y. z.")                    // three 1-token sentences pack into one chunk
    ).toDF("id", "text")
    val out = Chunking.sentenceChunks(d, "id", "text", budgetTokens = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3), r.getLong(4)))
      .toMap
    // doc 1: [a b. | c d e.] (2+3=5 exact fill) [f.] then oversized 8-token
    // sentence -> two window pieces (5, 3), then [o p.] opens fresh
    assert(out((1L, 0L)) == ("a b. c d e.", 2L, 5L))
    assert(out((1L, 1L)) == ("f.", 1L, 1L))
    assert(out((1L, 2L)) == ("g h i j k", 1L, 5L))
    assert(out((1L, 3L)) == ("l m n.", 1L, 3L))
    assert(out((1L, 4L)) == ("o p.", 1L, 2L))
    assert(out((2L, 0L)) == ("one two three four five.", 1L, 5L))
    assert(out((4L, 0L)) == ("x. y. z.", 3L, 3L))
    assert(!out.keys.exists(_._1 == 3L))
    // THE invariant: every chunk (including window pieces) is <= budget
    assert(out.values.forall(_._3 <= 5L))
    // chunk indexes are dense 0..n-1 per doc
    val byDoc = out.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
    byDoc.foreach { case (_, idxs) => assert(idxs == (0L until idxs.length.toLong)) }
  }
}
