package graft

import graft.dedup.SpanDedup
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("spans chops non-overlapping word spans, drops trailing fragment") {
    val d = docs((1L, "a b c d e f g"))  // 7 words, spanWords=3 -> 2 spans, tail "g"
    val sp = SpanDedup.spans(d, "doc_id", "text", spanWords = 3)
      .orderBy("span_idx").collect().map(r => (r.getInt(1), r.getString(2)))
    assert(sp.toSeq == Seq((0, "a b c"), (1, "d e f")))
  }

  test("doc shorter than spanWords yields zero spans; empty input yields empty output") {
    val d = docs((1L, "a b"), (2L, ""))
    assert(SpanDedup.spans(d, "doc_id", "text", spanWords = 3).count() == 0)
    val empty = docs().filter(lit(false))
    assert(SpanDedup.spans(empty, "doc_id", "text", 3).count() == 0)
    assert(SpanDedup.duplicatedSpanStats(empty, "doc_id", "text", 3).count() == 0)
    assert(SpanDedup.removeDuplicateSpans(empty, "doc_id", "text", 3).count() == 0)
  }

  test("duplicatedSpanStats counts corpus-wide recurring spans") {
    val d = docs(
      (1L, "dup dup dup x y z"),   // spans: "dup dup dup", "x y z"
      (2L, "dup dup dup p q r"),   // shares span 0 with doc 1
      (3L, "u v w"))               // unique
    val stats = SpanDedup.duplicatedSpanStats(d, "doc_id", "text", spanWords = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(stats.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 1L, 0L, 0.0)))
  }

  test("removeDuplicateSpans keeps first (min id, idx) occurrence, preserves tail fragment") {
    val d = docs(
      (1L, "dup dup dup x y z t1"),
      (2L, "dup dup dup p q r t2"),
      (3L, "dup dup dup"))
    val out = SpanDedup.removeDuplicateSpans(d, "doc_id", "text", spanWords = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(
      (1L, "dup dup dup x y z t1"),  // first owner keeps the dup span
      (2L, "p q r t2"),              // dup span stripped, own span + tail kept
      (3L, "")))                     // all spans removed, no tail -> empty text
  }

  test("span repeated WITHIN one document keeps only its first occurrence") {
    val d = docs((1L, "a b c a b c tail"))
    val out = SpanDedup.removeDuplicateSpans(d, "doc_id", "text", spanWords = 3)
      .collect().map(_.getString(1))
    assert(out.toSeq == Seq("a b c tail"))
  }

  test("multi-space tokenization is literal single-space split (empty tokens count)") {
    // "a  b c" splits to ["a","","b","c"]: one 3-word span "a  b", tail "c"
    val d = docs((1L, "a  b c"))
    val sp = SpanDedup.spans(d, "doc_id", "text", spanWords = 3)
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(sp.toSeq == Seq((0, "a  b")))
    val out = SpanDedup.removeDuplicateSpans(d, "doc_id", "text", spanWords = 3)
      .collect().map(_.getString(1))
    assert(out.toSeq == Seq("a  b c"))  // reassembly reproduces the original text
  }

  test("incremental span stats equal full-corpus stats restricted to the batch") {
    val corpus = Tables.documents(spark, sf).select("doc_id", "text")
    // batch: new ids, every 7th doc duplicates a corpus doc's text (so its
    // spans hit the store), plus one batch-internal duplicate pair
    val batch = corpus.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
      .unionByName(docs((900001L, "aa bb cc dd ee ff"), (900002L, "aa bb cc dd ee ff")))
    val store = SpanDedup.spanStore(corpus, "doc_id", "text", spanWords = 5)
    val inc = SpanDedup.incrementalStats(batch, store, "doc_id", "text", spanWords = 5)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val full = SpanDedup.duplicatedSpanStats(
        corpus.unionByName(batch), "doc_id", "text", spanWords = 5)
      .filter(col("doc_id") >= 500000L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(inc == full, s"diff: ${(inc.toSet diff full.toSet) ++ (full.toSet diff inc.toSet)}")
    // merged store equals a from-scratch rebuild over the union
    val merged = SpanDedup.mergeSpanStore(store, batch, "doc_id", "text", 5)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getInt(3)))).toSet
    val rebuilt = SpanDedup.spanStore(corpus.unionByName(batch), "doc_id", "text", 5)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getInt(3)))).toSet
    assert(merged == rebuilt)
  }

  test("bucketed span store: folds equal full rebuild, untouched buckets stay byte-identical, replay is idempotent") {
    import graft.dedup.BucketedSpanStore
    val tmp = java.nio.file.Files.createTempDirectory("graft-bss").toString
    val sink = new BucketedSpanStore(tmp, numBuckets = 8, "doc_id", "text", 3)
    // base load: enough distinct spans to populate (almost) all 8 buckets
    val base = Tables.documents(spark, sf).select("doc_id", "text").limit(60)
    sink.merge(base, version = 0L)
    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(tmp)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> (f.length(), f.lastModified())).toMap
    }
    val before = snapshot()
    // small batch: two docs, few distinct spans -> only a few buckets touched
    val batch = docs((900001L, "aa bb cc dd ee ff"), (900002L, "aa bb cc zz yy xx"))
    sink.merge(batch, version = 1L)
    // (a) fold result == from-scratch rebuild over the union
    def loaded(): Set[(String, Long, Long, Int)] = sink.load(spark).get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val rebuilt = SpanDedup.spanStore(base.unionByName(docs(
        (900001L, "aa bb cc dd ee ff"), (900002L, "aa bb cc zz yy xx"))),
        "doc_id", "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(loaded() == rebuilt)
    // (b) buckets the batch never touched: same files, untouched on disk
    val touched = graft.dedup.SpanDedup.spans(batch, "doc_id", "text", 3)
      .select(BucketedSpanStore.bucketOf(
        graft.dedup.SpanDedup.spanKey(col("span")), 8).as("b"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(touched.size < 8, s"batch touched all buckets ($touched) — test needs slack")
    val after = snapshot()
    val untouchedBefore = before.filter { case (p, _) =>
      !touched.exists(b => p.contains(s"/bucket=$b/")) }
    assert(untouchedBefore.nonEmpty, "no untouched bucket existed before the fold")
    untouchedBefore.foreach { case (p, meta) =>
      assert(after.get(p).contains(meta), s"untouched bucket file rewritten: $p")
    }
    // (c) replaying the same fold at the same version changes nothing
    sink.merge(batch, version = 1L)
    assert(loaded() == rebuilt)
    // (d) a fold that replays with MORE history below it still sees only
    //     versions below its own id (what batch 1 originally saw)
    assert(sink.load(spark, belowVersion = 1L).get.count() ==
      SpanDedup.spanStore(base, "doc_id", "text", 3).count())
  }

  test("bucketed span store fold shape: only touched buckets scanned, batch keys pushed, cold rows bypass the aggregate") {
    import graft.dedup.BucketedSpanStore
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val tmp = java.nio.file.Files.createTempDirectory("graft-bss-plan").toString
    val sink = new BucketedSpanStore(tmp, numBuckets = 8, "doc_id", "text", 3)
    sink.merge(Tables.documents(spark, sf).select("doc_id", "text").limit(60), version = 0L)
    val batch = docs((900001L, "aa bb cc dd ee ff"))
    val (frame, touched) = sink.plannedFold(batch, version = 1L).get
    // read contract: every file the fold reads lives in a touched bucket
    val files = frame.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(f => touched.exists(b => f.contains(s"/bucket=$b/"))),
      files.mkString("\n"))
    val plan = frame.queryExecution.sparkPlan
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.length == 2, plan.toString) // hot + cold prior reads, nothing else
    val underAgg = plan.collect { case a: BaseAggregateExec => a }
      .flatMap(_.collect { case s: FileSourceScanExec => s }).distinct
    // hot side: the only store scan feeding the h-aggregate; the batch's
    // span keys reached the parquet reader
    assert(underAgg.length == 1, plan.toString)
    assert(underAgg.head.metadata("PushedFilters").contains("In(h"), underAgg.head.toString)
    // cold side: outside the aggregate (bypasses the groupBy entirely),
    // with the pushed complement filter
    val cold = scans.filterNot(underAgg.contains)
    assert(cold.length == 1, plan.toString)
    assert(cold.head.metadata("PushedFilters").contains("Not(In(h"), cold.head.toString)
  }

  test("text that is an exact span multiple has empty tail and round-trips") {
    val d = docs((1L, "a b c d e f"))
    val out = SpanDedup.removeDuplicateSpans(d, "doc_id", "text", spanWords = 3)
      .collect().map(_.getString(1))
    assert(out.toSeq == Seq("a b c d e f"))
  }

  test("decontamination scrub removes eval spans at ANY alignment; clean docs round-trip") {
    import graft.text.Contamination
    // train doc 1's middle span "p q r" appears inside eval text at an
    // offset that is NOT span-aligned on the eval side — overlapping
    // eval grams must still catch it. doc 2 is clean. doc 3 IS the eval
    // doc (its own aligned spans scrub; short tail survives).
    val train = docs(
      (1L, "a b c p q r x y z"),   // spans: [a b c][p q r][x y z]
      (2L, "m n o u v w"),         // clean
      (3L, "junk1 junk2 p q r k1 k2 k3 tail9 tailX"))
    val evalSet = docs((99L, "junk1 junk2 p q r k1 k2 k3 tail9 tailX"))
    val out = Contamination.scrubSpans(train, "doc_id", "text",
        evalSet, "text", spanWords = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // doc 1: "p q r" occurs in eval (as an overlapping gram) → scrubbed
    assert(out(0) == ((1L, "a b c x y z", 3L, 1L)))
    // doc 2: untouched, zero scrubbed
    assert(out(1) == ((2L, "m n o u v w", 2L, 0L)))
    // doc 3: every aligned span is eval text → only the sub-span tail survives
    assert(out(2) == ((3L, "tailX", 3L, 3L)))
  }
}
