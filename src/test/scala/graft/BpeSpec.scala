package graft

import graft.text.{Bpe, TextAnalysis}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("greedy merges produce golden subword counts on the checked-in vocab") {
    val r = Bpe.defaultRanks
    assert(r.nonEmpty && r(("t", "h")) == 0 && r(("th", "e")) == 1)
    val golden = Map(
      "the" -> 1,   // t+h (rank 0), th+e (1)
      "and" -> 1,   // a+n (3), an+d (8)
      "that" -> 1,  // t+h, a+t (7), th+at (48)
      "thing" -> 2, // t+h, i+n (2), in+g (9) -> th|ing
      "hello" -> 3, // h+e (27), l+l (28) -> he|ll|o
      "for" -> 2,   // (o,r)=16 outranks (f,o)=42 -> f|or
      "was" -> 1,   // (w,a)=43 beats (a,s)=44, wa+s (51)
      "you" -> 2,   // (o,u)=10 outranks (y,o)=47 -> y|ou
      "whizz" -> 3, // w+h (29), wh+i (49) -> whi|z|z
      "2024" -> 4,  // digits never merge in this vocab
      "thth" -> 2,  // BOTH (t,h) occurrences merge in one round
      "a" -> 1,
      "" -> 0)
    golden.foreach { case (w, n) =>
      assert(Bpe.subwordCount(w, r) == n,
        s"'$w' expected $n got ${Bpe.subwordCount(w, r)}")
    }
  }

  test("bpeTokenCounts: pre-tokenization, NULL text, corpus invariants, partitioning determinism") {
    val d = Seq(
      (1L, "the thing that was"),
      (2L, "the, the!"),
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTokenCounts(d, "text")
      .collect()
      .map(r => r.getLong(0) ->
        Option(r.getAs[Any]("n_subword_tokens")).map(_.asInstanceOf[Int]))
      .toMap
    assert(out(1L).contains(5), s"got ${out(1L)}") // 1+2+1+1
    assert(out(2L).contains(4), s"got ${out(2L)}") // the , the !
    assert(out(3L).isEmpty) // NULL text -> NULL count
    assert(out(4L).contains(0))
    // every regex pre-token yields >= 1 subword, so the subword count
    // dominates the regex estimate row-for-row (same pre-token pattern)
    val docs = Tables.documents(spark, sf).limit(200).select("doc_id", "text")
    val both = TextAnalysis.bpeTokenCounts(
      TextAnalysis.tokenCounts(docs, "text"), "text")
    assert(both.filter(col("n_subword_tokens") < col("n_bpe_tokens")).count() == 0)
    assert(both.filter(col("n_subword_tokens") > col("n_bpe_tokens")).count() > 0,
      "multi-subword words must exist in the corpus, else the gate is vacuous")
    // the per-task memo is an optimization, never state: identical counts
    // on a different partitioning
    val a = TextAnalysis.bpeTokenCounts(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("n_subword_tokens")).toMap
    val b = TextAnalysis.bpeTokenCounts(docs.repartition(7), "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("n_subword_tokens")).toMap
    assert(a == b)
  }

  test("BPE training reproduces hand-computed merges (Sennrich dictionary)") {
    // low×5 lower×2 newest×6 widest×3; tie-break (-count, l, r):
    //   r1 counts: es=9 st=9 we=8 lo=7 ow=7 ne=6 ew=6 ... -> (e,s)
    //   r2: (es,t)=9  r3: (l,o)=7 ties (o,w)=7, lex -> (l,o)
    //   r4: (lo,w)=7  r5: (e,w)=6 ties (n,e),(w,est), lex -> (e,w)
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainMergesFromDict(dict, numMerges = 5)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w")),
      s"got $merges")
    // counting under the trained ranks agrees with a hand trace
    val r = Bpe.ranksOf(merges)
    assert(Bpe.subwordCount("low", r) == 1)     // lo|w -> low
    assert(Bpe.subwordCount("lowest", r) == 2)  // low|est
    assert(Bpe.subwordCount("newest", r) == 3)  // n|ew|est
    assert(Bpe.subwordCount("widest", r) == 4)  // w|i|d|est
  }

  test("distributed trainMerges == local trainer; merges.txt round-trip") {
    val docs = Seq(
      "the thin thing", "the other thing", "this thesis", "thin gin",
      "other others", "the the the").toDF("text")
    val local = Bpe.trainMergesLocal(docs, "text", numMerges = 8)
    val dist = Bpe.trainMerges(docs, "text", numMerges = 8)
    assert(local == dist, s"local=$local dist=$dist")
    assert(local.length == 8)
    // format -> parse round-trip is exactly ranksOf
    val parsed = Bpe.parseRanks(Bpe.formatMerges(local).linesIterator)
    assert(parsed == Bpe.ranksOf(local))
    // minPairCount stops early, prefix-consistent with the unbounded run
    val stopped = Bpe.trainMergesLocal(docs, "text", numMerges = 8, minPairCount = 4L)
    assert(stopped.length < 8 && local.startsWith(stopped))
  }

  test("sampled trainer: partition-invariant, sample>=corpus == full local fit, frame roundtrip") {
    val docs = Seq(
      (10L, "the thing that was the thing"),
      (11L, "hello hello for you"),
      (12L, "that was the thing for"),
      (13L, "whizz whizz 2024 the"),
      (14L, "you for the that")).toDF("doc_id", "text")
    val m1 = Bpe.trainMergesSampled(docs, "doc_id", "text", numMerges = 12, sampleDocs = 3)
    // sample selection is keyed on id CONTENT — any partitioning/order
    // of the input yields the identical merge list
    val m7 = Bpe.trainMergesSampled(
      docs.repartition(7).orderBy(col("text")), "doc_id", "text",
      numMerges = 12, sampleDocs = 3)
    assert(m1 == m7)
    // a below-corpus sample trains on a strict subset: still deterministic
    // and non-empty on this fixture
    assert(m1.nonEmpty)
    // sample >= corpus reproduces the full local fit exactly
    val full = Bpe.trainMergesLocal(docs, "text", numMerges = 12)
    val mAll = Bpe.trainMergesSampled(docs, "doc_id", "text", numMerges = 12, sampleDocs = 100)
    assert(mAll == full)
    // merges frame: ranks survive the DataFrame (and thus parquet) form,
    // row order irrelevant
    val frame = Bpe.mergesFrame(spark, full).orderBy(col("l").desc)
    assert(Bpe.ranksFromFrame(frame) == Bpe.ranksOf(full))
  }

  test("non-BMP symbols survive the distributed trainer (code-point symbols)") {
    // an astral pre-token (U+1F600) is ONE symbol, never two lone
    // surrogates — lone surrogates would be mangled to '?' by the UDF's
    // UTF-8 round-trip and conflated with genuine '?' punctuation
    val emoji = "😀"
    assert(Bpe.mergeWord(emoji, Map.empty).toSeq == Seq(emoji))
    val docs = Seq(s"ab $emoji ab $emoji", s"ab? $emoji?").toDF("text")
    val local = Bpe.trainMergesLocal(docs, "text", numMerges = 3)
    val dist = Bpe.trainMerges(docs, "text", numMerges = 3)
    assert(local == dist, s"local=$local dist=$dist")
    assert(!local.exists { case (l, r) =>
      (l + r).exists(c => Character.isSurrogate(c) &&
        !(l + r).codePoints().toArray.exists(Character.isSupplementaryCodePoint)) })
    // the tokenizer emits the emoji intact
    val toks = new Bpe.Tokenizer(Bpe.ranksOf(local))(s"hi $emoji").get
    assert(toks.contains(emoji))
  }

  test("mergeWord emits the golden symbol sequences; Tokenizer streams match Counter lengths") {
    val r = Bpe.defaultRanks
    // sequences for the same golden words the count test pins
    assert(Bpe.mergeWord("the", r).toSeq == Seq("the"))
    assert(Bpe.mergeWord("thing", r).toSeq == Seq("th", "ing"))
    assert(Bpe.mergeWord("hello", r).toSeq == Seq("he", "ll", "o"))
    assert(Bpe.mergeWord("for", r).toSeq == Seq("f", "or"))
    assert(Bpe.mergeWord("whizz", r).toSeq == Seq("whi", "z", "z"))
    assert(Bpe.mergeWord("thth", r).toSeq == Seq("th", "th"))
    assert(Bpe.mergeWord("a", r).toSeq == Seq("a"))
    assert(Bpe.mergeWord("", r).isEmpty)
    // concatenating a word's tokens recovers the word
    Seq("the", "thing", "hello", "whizz", "2024").foreach(w =>
      assert(Bpe.mergeWord(w, r).mkString == w))
    // document-level: token stream length == Counter's count, pre-token
    // order preserved, NULL text -> None; covers the chunked-word path too
    val tok = new Bpe.Tokenizer(r)
    val cnt = new Bpe.Counter(r)
    val texts = Seq("The thing, for you!", "hello  WHIZZ 2024", "",
      "a" * (Bpe.MaxExactWordLen * 2 + 5))
    texts.foreach { t =>
      assert(tok(t).get.length == cnt(t).get, s"length mismatch on '${t.take(30)}'")
    }
    assert(tok("the thing").get == Seq("the", "th", "ing"))
    assert(tok(null).isEmpty && cnt(null).isEmpty)
    // corpus sample: the invariant holds on real text via the DataFrame API
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(50)
    val both = TextAnalysis.bpeTokens(docs, "text")
      .withColumn("n_stream", size(col("toks")).cast("long"))
    val joined = TextAnalysis.bpeTokenCounts(both, "text")
      .filter(col("n_stream") =!= col("n_subword_tokens").cast("long"))
    assert(joined.count() == 0)
  }

  test("hostile long-word input: chunked counting is bounded and deterministic") {
    val r = Bpe.defaultRanks
    val n = Bpe.MaxExactWordLen * 3 + 17
    val w = "a" * n
    // chunked count == sum over MaxExactWordLen-sized chunks counted exactly
    val expected = (0 until n by Bpe.MaxExactWordLen)
      .map(i => Bpe.subwordCount(w.substring(i, math.min(i + Bpe.MaxExactWordLen, n)), r))
      .sum
    val c = new Bpe.Counter(r)
    assert(c(w).contains(expected))
    // a multi-hundred-KB letter run completes (O(len) via chunks, not O(len²))
    val huge = "z" * 400000
    val t0 = System.nanoTime()
    val got = c(huge)
    assert(got.contains(400000)) // 'z' never merges in the checked-in vocab
    assert((System.nanoTime() - t0) < 30e9, "chunked path must not be quadratic")
  }
}
