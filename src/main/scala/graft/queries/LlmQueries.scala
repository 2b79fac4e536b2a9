package graft.queries

import graft.Tables
import graft.dedup._
import graft.operators.Sampling
import graft.similarity.Knn
import graft.text.{Bm25, Chunking, HtmlStrip, LmScore, Normalize, Packing, TextAnalysis, Urls}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline queries (SURVEY.md §2.3).
  *
  * The synthetic `documents`/`embeddings` tables contain no natural
  * duplicates, so dedup queries append deterministic "twins" (exact copies,
  * near copies with two appended tokens, identical/negated vectors) with
  * id + 1_000_000 — both the Spark side and the DuckDB oracle construct the
  * same twins, and the operators must find exactly them.
  */
object LlmQueries {

  private val TwinOffset = 1000000L

  def docsWithExactCopies(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + TwinOffset)
    )
  }

  def docsWithNearCopies(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + TwinOffset)
        .withColumn("text", concat(col("text"), lit(" zyx wvu")))
    )
  }

  def vecsWithTwins(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
    e.unionByName(
      e.withColumn("vec_id", col("vec_id") + TwinOffset)
        .withColumn(
          "embedding",
          when(col("vec_id") % 2 === 0, col("embedding"))
            .otherwise(transform(col("embedding"), x => -x))
        )
    )
  }

  def q20DedupExact(s: SparkSession, dir: String): DataFrame =
    ExactDedup.groups(docsWithExactCopies(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** MinHash-LSH near-dup detection, block → verify: LSH candidate pairs
    * (generous estimated-jaccard cut) re-scored with EXACT n-gram jaccard —
    * the production shape (candidates are cheap, verification is what you
    * act on). Output = verified pairs, so the oracle is the all-pairs exact
    * jaccard ≥ τ ground truth; equality means LSH recall was 1 on this
    * corpus (band parameters chosen so a miss at the corpus's similarity
    * level is ~1e-7).
    */
  def q21DedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val docs = docsWithNearCopies(s, dir)
    // blocking only — r=4 banding is already selective (est filtering
    // pruned 2 of 823 pairs at sf0.1), and skipping it spares two
    // signature joins; exact verification is the real filter
    val candidates = MinHashLsh.blockedPairs(docs, "doc_id", "text")
    NgramJaccard.verify(candidates, docs, "doc_id", "text", k = 3, minJaccard = 0.5)
      .orderBy("id_a", "id_b")
  }

  /** SimHash near-dup pairs with the portable (md5-based) token hash, so
    * the DuckDB oracle recomputes the exact same fingerprints. Blocking is
    * pigeonhole-exact for hamming ≤ bands-1; bucket cap is above the
    * sf0.01/sf0.1 corpus sizes so no candidate is dropped at test scale.
    */
  def q22DedupSimhash(s: SparkSession, dir: String): DataFrame =
    SimHash.pairs(docsWithNearCopies(s, dir), "doc_id", "text", maxHamming = 3,
        portableHash = true, maxBucketSize = 20000)
      .orderBy("id_a", "id_b")

  /** Exact 3-gram jaccard on the constructed twin pairs (the oracle can
    * replicate the exact set math; LSH candidate generation is covered by
    * q21 + specs).
    */
  def q23DedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = docsWithNearCopies(s, dir)
    val candidates = docs.filter(col("doc_id") < TwinOffset && col("doc_id") % 10 === 0)
      .select(col("doc_id").as("id_a"), (col("doc_id") + TwinOffset).as("id_b"))
    NgramJaccard.verify(candidates, docs, "doc_id", "text", k = 3, minJaccard = 0.5)
      .orderBy("id_a")
  }

  /** Embedding near-dup pairs via LSH buckets; only the identical twins can
    * clear tau=0.99 (random 64-dim vectors are near-orthogonal). Score is
    * dropped from the output: last-ulp float sums differ across engines.
    */
  def q24DedupEmbedding(s: SparkSession, dir: String): DataFrame =
    Knn.nearDupPairs(vecsWithTwins(s, dir), "vec_id", "embedding", tau = 0.99)
      .select("id_a", "id_b")
      .orderBy("id_a")

  def q25KnnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Knn.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed top-k. Score is excluded from the output (float sums
    * differ in the last ulp across engines); the oracle replays the same
    * hyperplane bucketing in DuckDB from the plan's own plane constants.
    */
  def q26KnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Knn.lshTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** Multi-probe LSH top-k (probe radius 1): each query scores its own
    * bucket plus the numPlanes single-bit-flip neighbors — the standard
    * recall recovery for sign-flip losses. Oracle replays bucketing AND
    * the probe fan-out from the plan's own hyperplane/mask literals.
    */
  def q56KnnMultiprobe(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Knn.lshTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5, probeRadius = 1)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** Dedup clustering: chain edges (doc i — i+1 for i%10 ∈ {0,1}) →
    * connected components via label propagation → (node, component).
    * The oracle computes the same closure with a recursive CTE.
    */
  def q37DedupClusters(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id")
    val edges = d.filter(col("doc_id") % 10 <= 1)
      .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      .join(d.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
    ConnectedComponents.labelPropagation(edges)
      .orderBy("node")
  }

  /** q37's edges through the DISTRIBUTED pointer-jumping path
    * (`localEdgeThreshold = 0` disables the driver union-find fast
    * path): at gate scale q37/q57/q93/q102 all ride the local solver,
    * so this keeps the 100 TB code path under the same hash oracle —
    * the two paths are additionally spec-asserted equal on random
    * graphs (DedupSpec).
    */
  def q113DedupClustersDistributed(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id")
    val edges = d.filter(col("doc_id") % 10 <= 1)
      .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      .join(d.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
    ConnectedComponents.labelPropagation(edges, localEdgeThreshold = 0)
      .orderBy("node")
  }

  /** Incremental clustering: q37's components absorb a batch of NEW edges
    * — decade-pair bridges (id, id+10) for id % 20 == 0 MERGE two
    * previously separate components; fresh (id, id+1) pairs at
    * id % 10 == 5 add brand-new clusters — via
    * [[ConnectedComponents.incrementalComponents]], which re-solves only
    * touched components (star-edges + batch) while every other assignment
    * passes through untouched. Oracle: the full recursive-CTE closure
    * over old ∪ new edges — incremental must equal rebuild.
    */
  def q93CcIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id")
    def within(e: DataFrame) =
      e.join(d.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
    val oldEdges = within(d.filter(col("doc_id") % 10 <= 1)
      .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst")))
    val newEdges = within(d.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 10).as("dst")))
      .unionByName(within(d.filter(col("doc_id") % 10 === 5)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))))
    val assign = ConnectedComponents.labelPropagation(oldEdges)
    ConnectedComponents.incrementalComponents(assign, newEdges)
      .orderBy("node")
  }

  /** q93's production twin (the q85/q96 move applied to clustering): the
    * pre-existing (node, component) assignment is built ONCE per sf dir
    * and parquet-roundtripped — assignment state is corpus state produced
    * by the PREVIOUS fold, not per-query work — so the only query-time
    * machinery is [[ConnectedComponents.incrementalComponents]] itself.
    * Same full-rebuild recursive-CTE oracle as q93 (incremental must
    * equal rebuild); the q93 − q97 bench delta isolates the in-query
    * base-assignment build cost (two chained iterative CC solves).
    */
  def q97CcIncrementalPrebuilt(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id")
    def within(e: DataFrame) =
      e.join(d.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
    val assign = Fixtures.cachedParquet(s, dir, "cc_base_assign") {
      ConnectedComponents.labelPropagation(
        within(d.filter(col("doc_id") % 10 <= 1)
          .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))))
    }
    val newEdges = within(d.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 10).as("dst")))
      .unionByName(within(d.filter(col("doc_id") % 10 === 5)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))))
    ConnectedComponents.incrementalComponents(assign, newEdges)
      .orderBy("node")
  }

  /** Canonical dedup: q37's clusters reduced to one representative per
    * component (longest doc, ties → lowest id); every doc mapped to its
    * keeper. Oracle: recursive-CTE closure + windowed argmax.
    */
  def q57DedupCanonical(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "n_chars")
    val edges = d.filter(col("doc_id") % 10 <= 1)
      .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      .join(d.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
    ConnectedComponents.canonicalize(d, edges, "doc_id", "n_chars")
      .orderBy("doc_id")
  }

  /** IVF top-k with nprobe = nlist: probing every cell is the standard way
    * to validate an IVF index (it must reproduce flat search exactly), so
    * the oracle is the brute-force ground truth. The recall/latency trade
    * at nprobe < nlist is exercised in KnnSpec.
    */
  def q33KnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Knn.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5,
        nlist = 16, nprobe = 16)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** Shared prebuilt IVF index (nlist=16) for q85/q86: built ONCE per sf
    * dir and parquet-roundtripped — the production "the index is corpus
    * state" shape (an ANN index is built at ingest, not per query batch).
    * Queries that use it carry zero k-means work at query time; q33 keeps
    * its in-query build so the bench A/B isolates the fit cost (the
    * round-3 q33 regression bisect).
    */
  private def prebuiltIvfIndex(s: SparkSession, dir: String): DataFrame =
    Fixtures.cachedParquet(s, dir, "ivf_index") {
      Knn.buildIvfIndex(Tables.embeddings(s, dir), "vec_id", "embedding", nlist = 16)
    }

  /** IVF probe against the PREBUILT parquet-roundtripped index — q33's
    * production twin: same nprobe = nlist = flat-search equality gate
    * (brute-force oracle), but the only query-time work is assignment +
    * probe. The q33 − q85 bench delta IS the in-query k-means fit.
    */
  def q85KnnIvfPrebuilt(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val index = prebuiltIvfIndex(s, dir)
    Knn.ivfTopKPrebuilt(Knn.assignCells(e, "vec_id", "embedding", index), index,
        e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5, nprobe = 16)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** IVF × PQ composition at full probe (nprobe = nlist) + full shortlist
    * (rerankFactor ≥ |corpus|/k): cell pruning disabled and rerank opened,
    * so the composed machinery (indexCodes one-pass cell+code frame →
    * broadcast probe join → ADC → exact rerank) must reproduce flat search
    * exactly — promoting the round-3 spec-only identity to the hash gate.
    * Practical-setting recall stays ScaleOpsSpec's job.
    */
  def q86KnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.Pq
    val e = Tables.embeddings(s, dir)
    val index = prebuiltIvfIndex(s, dir)
    val books = Pq.sampleCodebooks(e, "vec_id", "embedding", m = 8, codesPerBook = 16)
    val cellCodes = Pq.indexCodes(e, "vec_id", "embedding", books, index)
    Pq.ivfPqTopK(cellCodes, index, books, e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nprobe = 16, rerankFactor = 1000)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** q86's production twin (the q85 move applied to IVF×PQ): codebooks
    * AND the one-pass (id, cell, codes) frame are prebuilt and
    * parquet-roundtripped — the m-byte BINARY codes must survive storage
    * — so query-time work is probe + ADC + exact rerank only. Same
    * flat-search oracle; the q86 − q96 bench delta isolates the
    * codebook-train + encode build cost.
    */
  def q96KnnIvfPqPrebuilt(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.Pq
    val e = Tables.embeddings(s, dir)
    val index = prebuiltIvfIndex(s, dir)
    val books = Fixtures.cachedParquet(s, dir, "pq_books") {
      Pq.sampleCodebooks(e, "vec_id", "embedding", m = 8, codesPerBook = 16)
    }
    val cellCodes = Fixtures.cachedParquet(s, dir, "pq_cellcodes") {
      // encode against the ROUNDTRIPPED books so cached codes can never
      // drift from the cached codebooks
      Pq.indexCodes(e, "vec_id", "embedding", books, index)
    }
    Pq.ivfPqTopK(cellCodes, index, books, e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nprobe = 16, rerankFactor = 1000)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** PQ two-stage search with the shortlist opened to the WHOLE corpus
    * (k·rerankFactor ≥ |corpus|): the exact-cosine rerank must then equal
    * flat search regardless of quantization error — hash-gating the
    * encode/ADC/rerank machinery (practical-setting recall is spec-tested
    * in ScaleOpsSpec).
    */
  def q83KnnPq(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.Pq
    val e = Tables.embeddings(s, dir)
    // full-shortlist rerank is codebook-quality-INDEPENDENT, so the gate
    // query uses the zero-kmeans sample codebooks (trained-quality recall
    // is ScaleOpsSpec's job)
    val books = Pq.sampleCodebooks(e, "vec_id", "embedding", m = 8, codesPerBook = 16)
    val codes = Pq.encode(e, "vec_id", "embedding", books)
    Pq.pqTopK(codes, books, e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, rerankFactor = 1000)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** Predicted-language distribution (heuristic stopword scorer). */
  def q27LangId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(TextAnalysis.langId(col("text")).as("lang_pred"))
      .groupBy("lang_pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang_pred")

  def q28TextQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFeatures(Tables.documents(s, dir).select("doc_id", "text"), "text")
      .select(
        col("doc_id"), col("n_chars").as("len_chars"), col("n_words"),
        col("alpha_ratio"), col("punct_ratio"), col("avg_word_len"),
        col("stop_ratio_en"), col("quality_score")
      )
      .orderBy("doc_id")

  def q29TokenCount(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(Tables.documents(s, dir).select("doc_id", "text"), "text")
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens")
      .orderBy("doc_id")

  def q30Fingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(Tables.documents(s, dir).select("doc_id", "text"), "text")
      .select("doc_id", "fp_md5")
      .orderBy("doc_id")

  /** Multimodal metadata over binary payloads (deterministic fake payload =
    * utf-8 bytes of text; metadata extraction is the real, pushdown-safe
    * production path).
    */
  def q31MultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val withPayload = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    Multimodal.withMeta(withPayload, "payload")
      .select(
        col("doc_id"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"), col("meta.magic_hex").as("magic_hex")
      )
      .orderBy("doc_id")
  }

  /** Exact corpus heavy hitters: top-20 tokens; partial map-side counts
    * absorb the explode before the single shuffle, top-k runs as
    * TakeOrderedAndProject (never a global sort).
    */
  def q43TopTokens(s: SparkSession, dir: String): DataFrame =
    graft.text.HeavyHitters.topTokens(Tables.documents(s, dir).select("text"), "text", 20)

  /** PII flag rollup per source (clean synthetic corpus → zero counts; the
    * regex machinery itself is oracle-checked because DuckDB evaluates the
    * same RE2-compatible patterns).
    */
  def q44PiiScan(s: SparkSession, dir: String): DataFrame =
    graft.text.PiiScan.flags(Tables.documents(s, dir).select("source", "text"), "text")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("pii_email").cast("long")).as("n_email"),
        sum(col("pii_phone").cast("long")).as("n_phone"),
        sum(col("pii_url").cast("long")).as("n_url"),
        sum(col("pii_ip").cast("long")).as("n_ip")
      )
      .orderBy("source")

  /** Deterministic 75/12.5/12.5 split assignment rollup by split × lang. */
  def q45SplitAssign(s: SparkSession, dir: String): DataFrame =
    Sampling.splitAssign(
      Tables.documents(s, dir).select("doc_id", "lang"),
      Seq("doc_id"),
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    )
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split", "lang")

  /** Mixture report: docs + token budget per (split, lang) with token
    * shares — the closing accounting step of a curation pipeline.
    */
  def q60MixtureReport(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.mixtureReport(
      Tables.documents(s, dir).select("doc_id", "text", "lang"),
      "doc_id", "text", "lang",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .orderBy("split", "lang")

  /** Type-token ratio (repetition filter feature) per document. */
  def q46Ttr(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.typeTokenRatio(Tables.documents(s, dir).select("doc_id", "text"), "text")
      .select("doc_id", "n_tokens", "n_distinct", "ttr")
      .orderBy("doc_id")

  /** Train/test contamination: deterministic 75/12.5/12.5 split (same as
    * q45), then per test doc the count of distinct 5-grams shared with the
    * train split. The corpus's organic near-duplicates land on both sides
    * of the split, so the check fires on real signal.
    */
  def q47Contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Sampling.splitAssign(
      Tables.documents(s, dir).select("doc_id", "text"),
      Seq("doc_id"),
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    )
    // tagged form: both splits come from one table, so the plan keeps a
    // single documents scan (two filtered branches would scan it twice)
    graft.text.Contamination.sharedGramsTagged(
      docs.filter(col("split").isin("train", "test"))
        .select(col("doc_id"), (col("split") === "train").as("__is_train"), col("text")),
      "doc_id", "__is_train", "text", n = 5
    ).orderBy("doc_id")
  }

  /** Gopher-style repeated-phrase filter feature: top 2-gram fraction per
    * document, computed shuffle-free in one compiled pass.
    */
  def q48Repetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.topNgramFraction(
      Tables.documents(s, dir).select("doc_id", "text"), "doc_id", "text", n = 2)
      .orderBy("doc_id")

  /** Gopher quality gate: all filter rules per document + the pass flag. */
  def q52GopherFilters(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherFilters(
      Tables.documents(s, dir).select("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")

  /** Quality-weighted deterministic sampling: keep probability scales with
    * document length (least(1, n_chars/400)) — longer docs oversampled, all
    * selection reproducible from key content alone.
    */
  def q54WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "n_chars")
    graft.operators.Sampling.weighted(
      docs, Seq("doc_id"), least(lit(1.0), col("n_chars") / lit(400.0)))
      .orderBy("doc_id")
  }

  /** Deterministic per-source document cap: at most 15 docs per source,
    * chosen by md5-hash order of doc_id — the domain-capping curation step,
    * reproducible on any engine/partitioning (oracle replays the same
    * window).
    */
  def q69SourceCap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.capPerGroup(
      Tables.documents(s, dir).select("doc_id", "source"),
      groupCols = Seq("source"), keyCols = Seq("doc_id"), maxPerGroup = 15)
      .orderBy("doc_id")

  /** Sequence packing (concat-then-chunk) of each language's documents
    * into 512-token training chunks, summarized per chunk. Deterministic
    * md5-order concatenation — the oracle replays the identical stream.
    */
  def q70Pack(s: SparkSession, dir: String): DataFrame = {
    val docs = TextAnalysis.tokenCounts(
      Tables.documents(s, dir).select("doc_id", "lang", "text"), "text")
      .select(col("doc_id"), col("lang"), col("n_ws_tokens").cast("long").as("toks"))
    Packing.packSummary(docs, Seq("lang"), Seq("doc_id"), "toks", budget = 512L)
      .orderBy("lang", "bin")
  }

  /** Sliding-window chunking (64-token windows, stride 48 — 25% overlap):
    * the RAG/embedding-prep unit. Chunk geometry is pure integer
    * arithmetic on the split; the oracle replays windows from the same
    * split and must match chunk text md5-exact.
    */
  def q89SlidingChunks(s: SparkSession, dir: String): DataFrame =
    Chunking.slidingChunks(Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", windowTokens = 64, strideTokens = 48)
      .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
        md5(to_binary(col("chunk"), lit("utf-8"))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** Count-based bigram-LM quality signals (CCNet-style, integer-exact):
    * the reference model is trained on docs with doc_id % 10 < 8
    * (minCount 2 prunes hapax n-grams), the held-out rest is scored.
    * Every output is a count, so the DuckDB oracle replays training AND
    * scoring exactly — no floating log-prob in the gate.
    */
  def q92LmScore(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val ref = d.filter(col("doc_id") % 10 < 8)
    val scored = d.filter(col("doc_id") % 10 >= 8)
    LmScore.score(scored, "doc_id", "text",
        LmScore.unigramCounts(ref, "text", minCount = 2),
        LmScore.bigramCounts(ref, "text", minCount = 2))
      .orderBy("doc_id")
  }

  /** Per-document token counts under a CORPUS-TRAINED BPE vocabulary,
    * materialized once per sf dir: train merges on the documents table
    * ([[graft.text.Bpe.trainMergesLocal]], the Sennrich algorithm — so
    * budgets come from a vocabulary learned on THIS corpus, not the
    * checked-in demo table), then count every document under the learned
    * ranks. SQL cannot replay iterative training or greedy merging (both
    * are spec-gated: hand-computed merges, distributed==local, golden
    * counting traces), but it CAN replay everything downstream of the
    * materialized counts — which is exactly what q88 gates.
    */
  def bpeTrainedCounts(s: SparkSession, dir: String): DataFrame =
    Fixtures.cachedParquet(s, dir, "bpe_counts") {
      val docs = Tables.documents(s, dir).select("doc_id", "lang", "text")
      val merges = graft.text.Bpe.trainMergesLocal(docs, "text", numMerges = 200)
      TextAnalysis.bpeTokenCounts(docs, "text", graft.text.Bpe.ranksOf(merges))
        .select(col("doc_id"), col("lang"),
          col("n_subword_tokens").cast("long").as("toks"))
    }

  /** Per-document subword token STREAMS under the same corpus-trained
    * vocabulary (docs subset: every 5th id keeps the gate's exploded-row
    * count bounded), materialized once per sf dir — the tokens are the
    * part SQL cannot replay (iterative greedy merges); everything
    * downstream of the parquet boundary is replayed by the oracle.
    */
  private def bpeTrainedTokens(s: SparkSession, dir: String): DataFrame =
    Fixtures.cachedParquet(s, dir, "bpe_tokens") {
      val docs = Tables.documents(s, dir).select("doc_id", "lang", "text")
        .filter(col("doc_id") % 5 === 0 && col("text").isNotNull)
      val merges = graft.text.Bpe.trainMergesLocal(docs, "text", numMerges = 200)
      TextAnalysis.bpeTokens(docs, "text", graft.text.Bpe.ranksOf(merges))
        .select(col("doc_id"), col("lang"), col("toks"))
    }

  /** Packed-sequence EMISSION — the actual trainer feed, not just q88's
    * chunk accounting: every token of every (subset) doc lands at an
    * explicit global stream position `gpos` within its language's
    * concatenated stream, with `bin` = the training chunk its document
    * starts in (`gpos // budget` recovers the token's own chunk; docs
    * straddle — inherent to concatenate-then-chunk). Shuffle story: ONE
    * exchange (the packing window's partition by lang); the posexplode is
    * narrow and after the window, so token rows never shuffle.
    */
  def q104PackedSequences(s: SparkSession, dir: String): DataFrame = {
    val assigned = Packing.chunkAssignments(
      bpeTrainedTokens(s, dir).withColumn("n_toks", size(col("toks")).cast("long")),
      Seq("lang"), Seq("doc_id"), "n_toks", budget = 512L)
    assigned
      .select(col("lang"), col("bin"), col("doc_id"), col("start_offset"),
        posexplode(col("toks")))
      .select(col("lang"), col("bin"), col("doc_id"),
        (col("start_offset") + col("pos")).as("gpos"), col("col").as("token"))
      .orderBy("lang", "gpos")
  }

  /** Token streams under SAMPLE-trained merges (the 100 TB trainer path,
    * [[graft.text.Bpe.trainMergesSampled]]): vocabulary fit on the
    * md5-earliest 256 docs only, materialized through TWO parquet
    * roundtrips — the (rank, l, r) merges frame itself (so the persisted
    * artifact, not the in-memory fit, is what tokenizes) and the token
    * streams the oracle replays. Output is per-doc stream geometry:
    * count, char mass, first/last token — enough that a wrong merge
    * order, a lost rank on roundtrip, or a sample-selection
    * nondeterminism each flip the hash.
    */
  private def bpeSampledTokens(s: SparkSession, dir: String): DataFrame =
    Fixtures.cachedParquet(s, dir, "bpe_sampled_tokens") {
      val docs = Tables.documents(s, dir).select("doc_id", "lang", "text")
        .filter(col("doc_id") % 5 === 1 && col("text").isNotNull)
      val merges = graft.text.Bpe.trainMergesSampled(
        docs, "doc_id", "text", numMerges = 200, sampleDocs = 256)
      val roundtripped = Fixtures.cachedParquet(s, dir, "bpe_sampled_merges") {
        graft.text.Bpe.mergesFrame(s, merges)
      }
      TextAnalysis.bpeTokens(docs, "text", graft.text.Bpe.ranksFromFrame(roundtripped))
        .select(col("doc_id"), col("lang"), col("toks"))
    }

  def q145BpeSampled(s: SparkSession, dir: String): DataFrame =
    bpeSampledTokens(s, dir)
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_toks"),
        coalesce(aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)),
          lit(0L)).as("n_chars"),
        element_at(col("toks"), 1).as("first_token"),
        element_at(col("toks"), -1).as("last_token"))
      .orderBy("doc_id")

  /** Sequence packing under a REAL subword-BPE token budget (q70's regex
    * twin), vocabulary trained on the corpus itself. The counts fixture
    * is parquet on disk and the DuckDB oracle reads the SAME files
    * (`__GRAFT_FIXTURE:bpe_counts__`, spliced by Verify), so chunk
    * assignment is hash-gated end to end — the fixture boundary is the
    * replayability line, not a weaker gate.
    */
  def q88PackBpe(s: SparkSession, dir: String): DataFrame =
    Packing.packSummary(bpeTrainedCounts(s, dir),
        Seq("lang"), Seq("doc_id"), "toks", budget = 1024L)
      .orderBy("lang", "bin")

  /** The WHOLE curation pipeline as one oracle-verified query: quality
    * gate (Gopher) → exact dedup (keep lowest id per content) → per-source
    * cap → leakage-safe split (keyed on SOURCE, so every host lands in one
    * split) → mixture summary per (split, lang). Every stage is
    * engine-portable, so the DuckDB oracle replays the pipeline end to end
    * and the final mixture hash-matches — the strongest statement the gate
    * can make about a multi-stage pipeline.
    */
  def q76CurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = docsWithExactCopiesFull(s, dir)
    val passIds = TextAnalysis.gopherFilters(docs.select("doc_id", "text"), "doc_id", "text")
      .filter(col("passes"))
      .select("doc_id")
    val gated = docs.join(passIds, Seq("doc_id"), "left_semi")
    val deduped = ExactDedup.dedup(gated, "doc_id", "text")
    val capped = graft.operators.Sampling.capPerGroup(
      deduped, Seq("source"), Seq("doc_id"), maxPerGroup = 20)
    val split = graft.operators.Sampling.splitAssign(
      capped, Seq("source"), Seq(("train", 0.75), ("val", 0.125), ("test", 0.125)))
    TextAnalysis.tokenCounts(split, "text")
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_ws_tokens").cast("long")).as("n_tokens"))
      .orderBy("split", "lang")
  }

  /** 16 words = exactly two 8-word spans, so the injected header aligns
    * with span boundaries and every third document shares its first two
    * spans corpus-wide — deterministic sub-document duplication both
    * engines replay identically (the rest of each doc shifts by a whole
    * number of spans, leaving its own spans unchanged).
    */
  private val SpanHeader =
    "graft corpus boilerplate header alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"

  private def docsWithBoilerplate(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, concat(lit(SpanHeader + " "), col("text")))
        .otherwise(col("text")).as("text"))

  /** Per-document span-duplication profile (C4-style sub-document dedup,
    * measurement half): fraction of each doc's 8-word spans that recur
    * anywhere in the corpus.
    */
  def q77SpanStats(s: SparkSession, dir: String): DataFrame =
    SpanDedup.duplicatedSpanStats(docsWithBoilerplate(s, dir), "doc_id", "text", spanWords = 8)
      .orderBy("doc_id")

  /** Sub-document rewrite: corpus-duplicated spans removed everywhere but
    * their first (min (doc_id, span_idx)) occurrence; the injected
    * boilerplate header survives only in the first doc that carries it.
    */
  def q78SpanRewrite(s: SparkSession, dir: String): DataFrame =
    SpanDedup.removeDuplicateSpans(docsWithBoilerplate(s, dir), "doc_id", "text", spanWords = 8)
      .orderBy("doc_id")

  /** Deterministic output sharding: the curated corpus split into 16
    * content-addressed shards with per-shard row/char budgets — the
    * trainer-facing last step ([[graft.operators.Sharding]]).
    */
  def q80Shards(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sharding.shardSummary(
      Tables.documents(s, dir).select("doc_id", "n_chars"),
      keyCols = Seq("doc_id"), numShards = 16, weightCol = Some("n_chars"))
      .orderBy("shard")

  /** Square-root temperature resampling of the language mix (T=2): per-lang
    * keep probability sqrt(n_min/n_lang), reported as before/after counts.
    */
  def q81TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "lang")
    val kept = graft.operators.Sampling.sqrtResample(docs, Seq("lang"), Seq("doc_id"))
    docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
      .join(kept.groupBy("lang").agg(count(lit(1)).as("n_after")), Seq("lang"))
      .orderBy("lang")
  }

  /** [[q81TemperatureMix]] on the general dyadic alpha grid: alpha = 3/8,
    * keep probability (n_min/n_lang)^(5/8) = sqrt(r)·sqrt(sqrt(sqrt(r))) —
    * a pinned chain of correctly-rounded IEEE sqrts/multiplies the oracle
    * replays literally, gating the general-alpha construction hash-exact.
    */
  def q87TemperatureMixDyadic(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "lang")
    val kept = graft.operators.Sampling.temperatureResampleDyadic(
      docs, Seq("lang"), Seq("doc_id"), alphaNum = 3, alphaDen = 8)
    docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
      .join(kept.groupBy("lang").agg(count(lit(1)).as("n_after")), Seq("lang"))
      .orderBy("lang")
  }

  private def langWeights(s: SparkSession) = {
    import s.implicits._
    Seq(("en", 1L), ("de", 3L), ("es", 2L), ("fr", 4L), ("zh", 2L)).toDF("lang", "weight")
  }

  /** Mixture epoch planning: a 2M-token budget split by per-language
    * weights (rare languages upweighted); each language's target is met
    * by whole-corpus repeats + a partial epoch. All-integer outputs —
    * the oracle replays the exact floor arithmetic.
    */
  def q94EpochPlan(s: SparkSession, dir: String): DataFrame = {
    val docs = TextAnalysis.tokenCounts(
      Tables.documents(s, dir).select("doc_id", "lang", "text"), "text")
      .select(col("doc_id"), col("lang"), col("n_ws_tokens").cast("long").as("toks"))
    graft.operators.Sampling.epochPlan(docs, Seq("lang"), "toks",
        langWeights(s), budgetTokens = 2000000L)
      .orderBy("lang")
  }

  /** q94's plan MATERIALIZED: per (lang, epoch) doc/token counts after
    * the sequence-explode expansion; the partial-epoch membership is the
    * shared-uniform threshold the oracle replays per document.
    */
  def q95EpochExpand(s: SparkSession, dir: String): DataFrame = {
    val docs = TextAnalysis.tokenCounts(
      Tables.documents(s, dir).select("doc_id", "lang", "text"), "text")
      .select(col("doc_id"), col("lang"), col("n_ws_tokens").cast("long").as("toks"))
    val plan = graft.operators.Sampling.epochPlan(docs, Seq("lang"), "toks",
      langWeights(s), budgetTokens = 2000000L)
    graft.operators.Sampling.epochExpand(docs, Seq("lang"), Seq("doc_id"), plan)
      .groupBy("lang", "epoch")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("epoch_tokens"))
      .orderBy("lang", "epoch")
  }

  /** Classifier-threshold selection: the top 25% of each language's docs
    * by length score (ties → lowest doc_id) — the "keep what the quality
    * classifier likes best" curation step.
    */
  def q82TopFraction(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.topFractionByScore(
      Tables.documents(s, dir).select("doc_id", "lang", "n_chars"),
      groupCols = Seq("lang"), scoreCol = "n_chars", keyCols = Seq("doc_id"),
      fraction = 0.25)
      .orderBy("doc_id")

  /** The EMBEDDING-side curation pipeline end-to-end (q76's vector twin):
    * LSH-bucketed near-dup pairs → connected components → canonical
    * representative per cluster (ties → lowest id) → deterministic shard
    * summary of the kept set. The oracle replays every stage from the twin
    * construction (pairs via exact cosine, clusters are exactly the twin
    * pairs, canonical keeps the lower id, md5-mod sharding), so the final
    * per-shard counts hash-match only if ALL four stages are right.
    */
  def q84EmbeddingPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.ConnectedComponents
    val vecs = vecsWithTwins(s, dir)
    val pairs = Knn.nearDupPairs(vecs, "vec_id", "embedding", tau = 0.99)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val docs = vecs.select(col("vec_id"), lit(1.0).as("score"))
    val kept = ConnectedComponents.canonicalize(docs, pairs, "vec_id", "score")
      .filter(col("is_kept"))
      .select("vec_id")
    graft.operators.Sharding.shardSummary(kept, Seq("vec_id"), numShards = 8)
      .orderBy("shard")
  }

  /** [[docsWithExactCopies]] but keeping lang + source (pipeline inputs). */
  private def docsWithExactCopiesFull(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text", "lang", "source")
    d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + TwinOffset)
    )
  }

  /** Fixed BM25 query-term set for q98–q100 — words present in the
    * synthetic vocabulary with differentiated frequencies.
    */
  private val Bm25Terms = Seq("spark", "window", "merge")

  /** Rounded-decimal BM25 ranking shared by q98/q99/q100: ranking on the
    * DECIMAL(18,6)-rounded score (ties → doc_id) is where the idf `ln`'s
    * cross-engine ulp cannot flip an order; raw doubles stay inside the
    * engine.
    */
  private def bm25Ranked(scored: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scored
      .select(col(idCol).as("doc_id"),
        col("score").cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("bm25"))
      .filter(col("bm25") > 0)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
  }

  /** BM25 top-20 for a fixed term set, ad-hoc scan shape: narrow per-row
    * term frequencies, one-row broadcast corpus constants, fixed-order
    * score fold ([[Bm25.scoreScan]]). The oracle replays tokenization,
    * df/avgdl and the exact fold association in DuckDB, so the
    * DECIMAL(18,6) scores hash-match — the gate verifies BM25 VALUES, not
    * just order. The final window ranks only docs matching ≥1 term.
    */
  def q98Bm25(s: SparkSession, dir: String): DataFrame =
    bm25Ranked(
      Bm25.scoreScan(Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", Bm25Terms), "doc_id")
      .filter(col("rank") <= 20)
      // DOUBLE on the gate surface (decimals stringify differently across
      // the compare harness's readers); ranking already happened on the
      // rounded decimal
      .select(col("rank"), col("doc_id"), col("bm25").cast("double").as("bm25"))
      .orderBy("rank")

  /** q98's production twin (the q85/q96 move applied to lexical search):
    * the inverted postings index and the one-row corpus stats are built
    * ONCE per sf dir and parquet-roundtripped — index state is corpus
    * state — so query-time work is a term-pruned postings read + pivot +
    * the same fixed score fold ([[Bm25.topKPrebuilt]]). Same oracle as
    * q98 (prebuilt must equal scan bit-for-bit); the q98 − q99 bench
    * delta isolates the in-query full-corpus scan.
    */
  def q99Bm25Prebuilt(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val postings = Fixtures.cachedParquet(s, dir, "bm25_postings") {
      Bm25.buildIndex(docs, "doc_id", "text")
    }
    val stats = Fixtures.cachedParquet(s, dir, "bm25_stats") {
      Bm25.corpusStats(docs, "doc_id", "text")
    }
    bm25Ranked(Bm25.topKPrebuilt(postings, stats, Bm25Terms), "id")
      .filter(col("rank") <= 20)
      .select(col("rank"), col("doc_id"), col("bm25").cast("double").as("bm25"))
      .orderBy("rank")
  }

  /** Hybrid retrieval: BM25 lexical top-100 fused with dense cosine
    * top-100 (query = vec_id 0's embedding over the shared 0..N id space)
    * by Reciprocal Rank Fusion ([[graft.operators.RankFusion.rrfFuse]]),
    * top-20 by fused score. Every fusion join is rank-list-sized. The
    * fused score is integer ranks through one division and a fixed
    * two-term add — bit-reproducible — so the oracle replays BOTH
    * retrievers and the fusion arithmetic, gating the full hybrid stack.
    */
  def q100HybridRrf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, dir)
    val lex = bm25Ranked(
      Bm25.scoreScan(Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", Bm25Terms), "doc_id")
      .filter(col("rank") <= 100)
      .select("doc_id", "rank")
    val dense = Knn.bruteForceTopK(e, e.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 100)
      .select(col("neighbor_id").as("doc_id"), col("rank"))
    graft.operators.RankFusion.rrfFuse(Seq(lex, dense), "doc_id", "rank")
      .withColumn("rank", row_number().over(Window.orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rank") <= 20)
      .select(col("rank"), col("doc_id"),
        col("rrf").cast(org.apache.spark.sql.types.DecimalType(18, 9)).cast("double").as("rrf_score"))
      .orderBy("rank")
  }

  /** Rank-biased-overlap gate: RBO@20 (p = 0.9) between the lexical
    * BM25 top-20 and the dense cosine top-20 over the shared id space —
    * "how much do the two retrievers agree, top-weighted", the direct
    * system-vs-system diagnostic recall can't give. The oracle replays
    * both retrievers (the q100 CTEs), the pinned weight table, and the
    * fixed-order depth fold.
    */
  def q199Rbo(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankEval
    val e = Tables.embeddings(s, dir)
    val lex = bm25Ranked(
      Bm25.scoreScan(Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", Bm25Terms), "doc_id")
      .filter(col("rank") <= 20)
      .select("doc_id", "rank")
    val dense = Knn.bruteForceTopK(e, e.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 20)
      .select(col("neighbor_id").as("doc_id"), col("rank"))
    RankEval.rbo(lex, dense, "doc_id", "rank", k = 20)
  }

  /** SemDeDup corpus-state fixture: embeddings ∪ exact twins (+1e6 for
    * even ids, a second +2e6 twin for every 4th id — triangle components)
    * ∪ negated twins (+1e6 for odd ids — must NOT pair), assigned to the
    * shared prebuilt IVF index's cells at BUILD time. Cell assignment is
    * ingest-time corpus state (the q85 framing), so the oracle reads the
    * same (id, v, cell) parquet instead of replaying the argmin — which
    * keeps the gate free of cross-engine FP ties in the nearest-centroid
    * race. Exact/negated twins put every pair decision at cos ≈ ±1, far
    * from tau, so the threshold can never flip on an ulp.
    */
  private def semDedupAssigned(s: SparkSession, dir: String): DataFrame =
    Fixtures.cachedParquet(s, dir, "semdedup_assign") {
      val base = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      val corpus = base
        .unionByName(base.filter(col("id") % 2 === 0)
          .select((col("id") + TwinOffset).as("id"), col("v")))
        .unionByName(base.filter(col("id") % 4 === 0)
          .select((col("id") + 2 * TwinOffset).as("id"), col("v")))
        .unionByName(base.filter(col("id") % 2 === 1)
          .select((col("id") + TwinOffset).as("id"),
            transform(col("v"), x => -x).as("v")))
      Knn.assignCells(corpus, "id", "v", prebuiltIvfIndex(s, dir))
    }

  /** Semantic dedup over the prebuilt cell assignment: within-cell cosine
    * pairs → connected components → min-id representative. Expected
    * structure: {i, i+1e6} pairs for even i (plus i+2e6 triangles for
    * i % 4 == 0), negated twins and everything else singleton — but the
    * oracle replays pairs + recursive-CTE closure + keep over the WHOLE
    * fixture, so any spurious pair or lost member breaks the hash.
    */
  def q102SemanticDedup(s: SparkSession, dir: String): DataFrame =
    SemanticDedup.semDedup(semDedupAssigned(s, dir), tau = 0.99)
      .select("id", "component", "keep")
      .orderBy("id")

  /** DSIR-style importance selection: English even-id docs as the target
    * distribution, whole corpus as raw; hashed-gram models (1024
    * buckets), integer evidence masses, cross-multiplied integer key,
    * top 25% per language. The oracle replays model fitting, scoring,
    * the key arithmetic (HUGEINT), and the grouped selection window —
    * every column integer-exact, so the gate needs no FP tolerance.
    */
  def q103DsirSelect(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "lang", "text")
    // target = a predicate subset of the corpus → the fused single-pass
    // fit (one gram explosion for BOTH models instead of two)
    graft.text.Dsir.selectSubset(d, "doc_id", "text",
        targetPred = col("lang") === "en" && col("doc_id") % 2 === 0,
        fraction = 0.25, numBuckets = 1024, groupCols = Seq("lang"))
      .select("doc_id", "lang", "n_grams", "target_mass", "raw_mass", "dsir_key")
      .orderBy("doc_id")
  }

  /** q103's production twin (the q33/q85 bisect applied to DSIR): both
    * hashed-gram models are PREBUILT parquet-roundtripped fixtures —
    * models are corpus state fit at ingest — so query-time work is
    * scoring + key + selection only. Same oracle expectation as q103
    * modulo the fixture read; the q103 − q106 bench delta isolates the
    * two model-fit corpus passes.
    */
  def q106DsirPrebuilt(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "lang", "text")
    val target = Fixtures.cachedParquet(s, dir, "dsir_target") {
      graft.text.Dsir.fitModel(
        d.filter(col("lang") === "en" && col("doc_id") % 2 === 0), "text", 1024)
    }
    val raw = Fixtures.cachedParquet(s, dir, "dsir_raw") {
      graft.text.Dsir.fitModel(d, "text", 1024)
    }
    graft.text.Dsir.selectWithModels(d, "doc_id", "text", target, raw,
        fraction = 0.25, numBuckets = 1024, groupCols = Seq("lang"))
      .select("doc_id", "lang", "n_grams", "target_mass", "raw_mass", "dsir_key")
      .orderBy("doc_id")
  }

  /** C4-style global line dedup + scrub: every doc gets a shared
    * boilerplate header and footer line around its body, plus exact
    * twins — the scrub must keep ONE global occurrence of each line
    * (first by (id, pos)) and reassemble: the min-id doc keeps the
    * header/footer, originals keep their bodies, exact twins are
    * scrubbed to empty. clean_md5 gates the reconstructed TEXT exactly.
    */
  def q105LineDedupScrub(s: SparkSession, dir: String): DataFrame = {
    val docs = docsWithExactCopies(s, dir)
      .withColumn("text", concat_ws("\n",
        lit("shared boilerplate header"), col("text"),
        lit("shared boilerplate footer")))
    LineDedup.scrub(docs, "doc_id", "text")
      .select(col("id").as("doc_id"), md5(col("text_clean")).as("clean_md5"),
        col("n_lines"), col("n_kept"))
      .orderBy("doc_id")
  }

  /** Unicode/whitespace normalization scrub: every document gets a messy
    * suffix exercising each rule — CRLF + lone CR line endings, tab and
    * space runs, trailing spaces, a blank-line run, a decomposed-é NFC
    * pair, zero-width/soft-hyphen invisibles, C0 controls — and the gate
    * hashes the scrubbed text against DuckDB replaying `nfc_normalize` +
    * the identical regexp chain.
    */
  def q107NormalizeScrub(s: SparkSession, dir: String): DataFrame = {
    val messy = Tables.documents(s, dir).select(
      col("doc_id"),
      concat(
        lit("  "), col("text"),
        lit("\r\nline with\ttabs\tand   runs   "),
        lit("\rlone cr line"),
        lit("\n\n\n\n"),
        lit("cafe\u0301 vs caf\u00e9"),
        lit(" zero\u200Bwidth\u00ADsoft"),
        lit("ctrl\u0001\u0002chars"),
        lit("\n end ")
      ).as("text"))
    Normalize.clean(messy, "doc_id", "text")
      .select(col("doc_id"), md5(col("text_norm")).as("norm_md5"),
        col("n_chars_raw"), col("n_chars_norm"), col("changed"))
      .orderBy("doc_id")
  }

  /** URL canonicalization: every doc gets a synthesized messy URL —
    * mixed-case schemes/hosts, default and explicit ports, empty and
    * real paths, tracking params in first/middle positions, fragments
    * — and the gate hashes scheme/host/registered-domain/canonical
    * against DuckDB replaying the identical regexp chain.
    */
  def q108UrlCanonical(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val url = concat(
      when(id % 3 === 0, "HTTPS").when(id % 3 === 1, "http").otherwise("https"),
      lit("://"),
      when(id % 2 === 0, "WWW.").otherwise(""),
      lit("ExAmple"), (id % 7).cast("string"),
      when(id % 5 === 0, ".CO.UK").otherwise(".COM"),
      when(id % 4 === 0, ":443").when(id % 4 === 1, ":8080").otherwise(""),
      when(id % 6 === 0, "").otherwise(concat(lit("/Path/"), (id % 13).cast("string"))),
      when(id % 2 === 0,
        concat(lit("?utm_source=news&id="), id.cast("string"), lit("&utm_campaign=x")))
        .when(id % 5 === 1, concat(lit("?id="), id.cast("string")))
        .otherwise(""),
      when(id % 3 === 2, "#Sec").otherwise(""))
    val d = Tables.documents(s, dir).select(col("doc_id")).withColumn("url", url)
    Urls.canonicalReport(d, "doc_id", "url").orderBy("doc_id")
  }

  /** Deterministic training-order interleave: weights derived in-query
    * from the source name (both engines replay the same rule), global
    * positions materialized at gate scale. The oracle replays the
    * md5 shuffle ranks, the integer stride-key arithmetic, and the
    * (key, source, rank) total order.
    */
  def q109TrainingOrder(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val weights = docs.select("source").distinct()
      .withColumn("weight", (length(col("source")) * 7 % 5 + 1).cast("long"))
    val ordered = graft.operators.Interleave.trainingOrder(
      docs, "doc_id", "source", weights)
    ordered
      .withColumn("pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("order_key", "source", "src_rank")).cast("long"))
      .select(col("pos"), col("id").as("doc_id"), col("source"),
        col("weight"), col("src_rank"), col("order_key"))
      .orderBy("pos")
  }

  /** Intra-doc repetition: a quarter of docs get three copies of a
    * boilerplate line, another quarter a twice-quoted paragraph; the
    * gate checks all four duplicate fractions and the Gopher threshold
    * verdict per document.
    */
  def q110IntraDocRepetition(s: SparkSession, dir: String): DataFrame = {
    val t = when(col("doc_id") % 4 === 0,
        concat(col("text"), lit("\nrepeat me\nrepeat me\nrepeat me")))
      .when(col("doc_id") % 4 === 1,
        concat(col("text"), lit("\n\nquoted para\n\nquoted para")))
      .otherwise(col("text"))
    val d = Tables.documents(s, dir).select(col("doc_id"), t.as("text"))
    TextAnalysis.intraDocRepetition(d, "doc_id", "text").orderBy("doc_id")
  }

  /** Provenance curation pipeline, end to end: synthesize messy URLs
    * with deliberate collisions (www/no-www variants, default ports,
    * tracking params, fragments) → canonicalize (row 65) → URL-exact
    * dedup keeping the first occurrence per canonical → per-domain cap
    * (row 56b, deterministic md5 order) → per-domain provenance
    * report. The oracle derives the canonical form INDEPENDENTLY
    * (arithmetic construction, not the regexp chain) and replays
    * dedup, cap, and report — so composition AND chain cross-check.
    */
  def q111UrlCurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val url = concat(
      when(id % 2 === 0, "HTTPS").otherwise("https"), lit("://"),
      when(id % 3 === 0, "WWW.").otherwise(""),
      lit("Site"), (id % 20).cast("string"), lit(".COM"),
      when(id % 4 === 0, ":443").otherwise(""),
      lit("/p/"), (id % 40).cast("string"),
      when(id % 2 === 0, "?utm_source=feed").otherwise(""),
      when(id % 5 === 0, "#frag").otherwise(""))
    val docs = Tables.documents(s, dir).select(id).withColumn("url", url)
    val canon = Urls.canonicalReport(docs, "doc_id", "url")
      .select("doc_id", "domain", "canonical")
      // canonicalize is NULL for non-URL values; URL-exact dedup must
      // exempt those rows rather than merge them under one NULL key
      // (all q111 inputs parse, so the gate output is unchanged)
      .filter(col("canonical").isNotNull)
    val firstPer = canon.groupBy("canonical")
      .agg(min("doc_id").as("doc_id"), min("domain").as("domain"))
    val capped = Sampling.capPerGroup(firstPer, Seq("domain"), Seq("doc_id"), 2)
    capped.join(Tables.documents(s, dir).select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy("domain").agg(
        count(lit(1)).cast("long").as("n_pages"),
        sum("n_chars").cast("long").as("chars_kept"))
      .orderBy("domain")
  }

  /** Tokenizer fertility report over the corpus-trained BPE token
    * streams (the q104 fixture): tokens, character mass, single-char
    * token count, exact tokens-per-million-chars (the repo's decimal
    * floor-division idiom — fertility without a float division), and
    * the single-token fraction. The dashboard every tokenizer-training
    * run closes with; a vocabulary too small for its corpus shows up
    * as high fertility + high single-char fraction.
    */
  def q112TokenizerFertility(s: SparkSession, dir: String): DataFrame =
    graft.text.TokenizerReport.perDoc(bpeTrainedTokens(s, dir), "toks")
      .select("doc_id", "lang", "n_toks", "n_chars", "n_single",
        "toks_per_mchar", "single_tok_frac")
      .orderBy("doc_id")

  /** The unified one-pass tokenizer dashboard (row 69 + packing +
    * mixture without re-scanning the token stream per report): per
    * language — fertility, chunk counts at the q104 budget, fill
    * fraction, and mixture share. Oracle replays the folds, the integer
    * ceil/floor-division idioms, and the share divisions in DuckDB.
    */
  def q114TokenizerReport(s: SparkSession, dir: String): DataFrame =
    graft.text.TokenizerReport.report(
        bpeTrainedTokens(s, dir).select("doc_id", "lang", "toks"),
        groupCols = Seq("lang"), toksCol = "toks", budget = 512L)
      .orderBy("lang")

  /** CCNet-style perplexity-bucket triage (row 70): every document
    * scored against reference n-gram models (ref = 80% of the corpus,
    * minCount 2), per-language terciles by the integer attested-mass
    * key, head kept whole / middle at 1/2 / tail at 1/4 via the md5
    * draw. The oracle replays model fitting, the key, the per-language
    * rank/bucket arithmetic, and the hex thresholds — all integer.
    */
  def q115PerplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "lang", "text")
    val ref = d.filter(col("doc_id") % 10 < 8)
    graft.text.PerplexitySample.sample(
        d, "doc_id", "text",
        graft.text.LmScore.unigramCounts(ref, "text", minCount = 2),
        graft.text.LmScore.bigramCounts(ref, "text", minCount = 2),
        groupCols = Seq("lang"))
      .select("doc_id", "lang", "n_tokens", "n_oov", "n_bigrams",
        "n_bigram_hits", "lm_key", "q_rank", "bucket")
      .orderBy("doc_id")
  }

  /** HTML → text extraction (row 71): every doc wrapped in a synthesized
    * page — doctype, style/script blocks (content must vanish), comments,
    * block tags (must become newlines), inline tags (must become spaces,
    * not fuse words), and the five named entities. The gate hashes the
    * extracted text + tag counts against DuckDB replaying the identical
    * regexp chain ((?is) inline flags, non-greedy spans — same semantics
    * in Java regex and RE2).
    */
  def q116HtmlExtract(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val html = concat(
      lit("<!DOCTYPE html><html><head><title>T"), id.cast("string"),
      lit("</title><style>p { color: red; }</style>"),
      lit("<script type=\"text/javascript\">var x = 1 < 2;</script></head><body>"),
      lit("<!-- comment "), id.cast("string"), lit(" -->"),
      lit("<h1 class=\"hd\">Heading "), (id % 7).cast("string"), lit("</h1>"),
      lit("<p>"), col("text"), lit("</p>"),
      when(id % 3 === 0,
        lit("<p>first &amp; second &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>"))
        .otherwise(lit("<div>plain<b>bold</b>tail</div>")),
      lit("<ul><li>item a</li><li>item b</li></ul></body></html>"))
    val d = Tables.documents(s, dir).select(id, col("text"))
      .withColumn("html", html).drop("text")
    HtmlStrip.extract(d, "doc_id", "html")
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        col("n_tags"), col("n_chars_html"), col("n_chars_text"))
      .orderBy("doc_id")
  }

  /** Domain blocklist filter (row 72): synthesized URLs with www/ccTLD
    * variation, a literal blocklist of registered domains, broadcast
    * anti-join on the PSL registered domain. The oracle derives each
    * URL's domain INDEPENDENTLY (arithmetic construction, not the
    * host/PSL chain) and replays NOT IN — so the whole
    * host→registered-domain path is cross-checked.
    */
  def q117DomainBlocklist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val id = col("doc_id")
    val url = concat(
      lit("https://"), when(id % 3 === 0, "www.").otherwise(""),
      lit("site"), (id % 20).cast("string"),
      when(id % 4 === 0, ".co.uk").otherwise(".com"),
      lit("/p/"), (id % 40).cast("string"))
    val docs = Tables.documents(s, dir).select(id).withColumn("url", url)
    val block = Seq("site3.com", "site7.co.uk", "site12.com", "site16.co.uk")
      .toDF("domain")
    Urls.filterByDomain(docs, "url", block, keep = false).orderBy("doc_id")
  }

  /** Decontamination scrub (row 73): eval set = every 17th doc; their
    * text is removed span-by-span from the whole corpus (including the
    * eval docs' own rows — decontamination removes eval text wherever
    * it appears). The oracle replays overlapping eval grams, the 60-bit
    * span keys, the anti-join, and the ordered reassembly in SQL.
    */
  def q118DecontaminationScrub(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    graft.text.Contamination.scrubSpans(
        d, "doc_id", "text",
        evalSet = d.filter(col("doc_id") % 17 === 0), evalTextCol = "text",
        spanWords = 8)
      .orderBy("doc_id")
  }

  /** Web-curation funnel v2 (row 74 — the round-6 surface composed in
    * production order): synthesized HTML pages → [[HtmlStrip]] text
    * extraction → [[Normalize]] unicode/whitespace scrub → minimum-
    * length gate → URL canonicalization + first-per-canonical dedup →
    * registered-domain blocklist → per-domain provenance report
    * (n_pages, chars_kept over the NORMALIZED text — the funnel's
    * output mass, not the raw crawl's). The oracle replays the HTML and
    * normalize chains verbatim but derives canonicals and domains
    * ARITHMETICALLY (never the regexp/PSL chain), so the composition
    * and both chains cross-check each other.
    */
  def q119CurationFunnelV2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val id = col("doc_id")
    val html = concat(
      lit("<html><head><style>b { color: blue }</style></head><body>"),
      lit("<!-- crawler "), id.cast("string"), lit(" -->"),
      lit("<p>"), col("text"), lit("</p>"),
      lit("<script>track();</script></body></html>"))
    val url = concat(
      when(id % 2 === 0, "HTTPS").otherwise("https"), lit("://"),
      when(id % 3 === 0, "WWW.").otherwise(""),
      lit("Site"), (id % 20).cast("string"), lit(".COM"),
      lit("/p/"), (id % 40).cast("string"),
      when(id % 2 === 0, "?utm_source=feed").otherwise(""))
    val extracted = Tables.documents(s, dir).select(id, col("text"))
      .withColumn("html", html).withColumn("url", url)
      .withColumn("text_x", HtmlStrip.textOf(col("html")))
      .withColumn("text_n", Normalize.cleanColumn(col("text_x")))
      .filter(length(col("text_n")) >= 100)
    val canon = Urls.canonicalReport(extracted, "doc_id", "url")
      .select(col("doc_id"), col("domain"), col("canonical"))
      .filter(col("canonical").isNotNull)
      .join(extracted.select(id, col("text_n")), Seq("doc_id"))
    val firstPer = canon.groupBy("canonical")
      .agg(min(struct(col("doc_id"), col("domain"), col("text_n"))).as("f"))
      .select(col("f.doc_id"), col("f.domain"), col("f.text_n"))
    val block = Seq("site4.com", "site11.com").toDF("domain_b")
    Urls.filterByDomain(
        firstPer.withColumn("u2", concat(lit("https://"), col("domain"), lit("/"))),
        "u2", block, keep = false)
      .groupBy("domain")
      .agg(count(lit(1)).cast("long").as("n_pages"),
        sum(length(col("text_n"))).cast("long").as("chars_kept"))
      .orderBy("domain")
  }

  /** Within-doc repeated-line scrub (row 75): a third of docs get a
    * thrice-repeated "Subscribe" line, another third a twice-repeated
    * banner with blank-line structure; the narrow HOF fold keeps first
    * occurrences (blank lines always survive). Oracle replays with a
    * per-(doc, line) first-position window + ordered re-aggregation.
    */
  def q120IntraDocLineScrub(s: SparkSession, dir: String): DataFrame = {
    val t = when(col("doc_id") % 3 === 0,
        concat(col("text"),
          lit("\nSubscribe now!\nMore content here indeed\nSubscribe now!\nSubscribe now!")))
      .when(col("doc_id") % 3 === 1,
        concat(col("text"), lit("\n\nCookie banner\n\nCookie banner")))
      .otherwise(col("text"))
    val d = Tables.documents(s, dir).select(col("doc_id"), t.as("text"))
    graft.dedup.LineDedup.scrubWithinDoc(d, "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** Full Gopher repetition table (row 76): a quarter of docs get a
    * thrice-repeated phrase (fires top-gram + short dup-grams), another
    * quarter a twice-repeated long clause (fires dup-5..10); the gate
    * checks all nine coverage fractions and the published-threshold
    * verdict against a DuckDB replay (per-n gram explode → counts →
    * covered-position distinct → char mass).
    */
  def q121GopherRepetitionTable(s: SparkSession, dir: String): DataFrame = {
    val t = when(col("doc_id") % 4 === 0,
        concat(col("text"), lit(" click here to subscribe click here to subscribe click here to subscribe")))
      .when(col("doc_id") % 4 === 1,
        concat(col("text"), lit(" the quick brown fox jumped over the lazy dog and then the quick brown fox jumped over the lazy dog")))
      .otherwise(col("text"))
    val d = Tables.documents(s, dir).select(col("doc_id"), t.as("text"))
    TextAnalysis.gopherRepetitionTable(d, "doc_id", "text").orderBy("doc_id")
  }

  /** Token-budget truncation (row 77): docs cut at 64 whitespace tokens
    * with a single-space rejoin; untouched docs keep their original
    * bytes (spacing included — the flag tells the two cases apart).
    */
  def q122TruncateBudget(s: SparkSession, dir: String): DataFrame =
    Packing.truncateToBudget(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", maxTokens = 64)
      .orderBy("doc_id")

  /** Incremental line scrub (row 63's online form, hash-gated like the
    * other incremental twins): the corpus splits into an already-
    * ingested store (doc_id < 250) and an arriving batch; injected
    * shared header/footer lines collide across the split. The oracle
    * replays the store membership test, the batch-first (id,pos)
    * min-code rule, and the ordered reassembly wholly in SQL.
    */
  def q123LineScrubIncremental(s: SparkSession, dir: String): DataFrame = {
    val t = when(col("doc_id") % 3 === 0,
        concat(lit("shared header line\n"), col("text")))
      .when(col("doc_id") % 3 === 1,
        concat(col("text"), lit("\nshared footer line")))
      .otherwise(col("text"))
    val d = Tables.documents(s, dir).select(col("doc_id"), t.as("text"))
    val store = graft.dedup.LineDedup.lineStore(
      d.filter(col("doc_id") < 250), "doc_id", "text")
    graft.dedup.LineDedup.incrementalScrub(
        store, d.filter(col("doc_id") >= 250), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** (doc_id, ph) dHash fixture: one deterministic synthetic PNG per doc
    * (36×32 gray gradient pattern keyed by doc_id%25, plus a global
    * brightness shift by (doc_id/25)%3 that dHash must be INVARIANT to —
    * that invariance is what makes the clusters), decoded and hashed by
    * the real JDK-codec kernel ([[graft.multimodal.ImageHash.dHash64]]).
    * The decode is the part SQL cannot replay (the q88 BPE-fixture
    * discipline); everything downstream of this parquet boundary is
    * oracle-replayed.
    */
  private def imagePhashFixture(s: SparkSession, dir: String): DataFrame =
    Fixtures.cachedParquet(s, dir, "image_phash") {
      val mkPng = udf { (id: Long) =>
        val p = (id % 25).toInt
        val bright = ((id / 25) % 3).toInt * 8
        val img = new java.awt.image.BufferedImage(
          36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 36) {
            // max 22*10+16 = 236 < 255: the brightness shift never clips,
            // so within-pattern gradient ORDER (hence dHash) is identical
            val v = ((x * (p + 3) + y * (p + 7)) % 23) * 10 + bright
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      graft.multimodal.ImageHash.hashes(
        Tables.documents(s, dir).select(col("doc_id"))
          .withColumn("payload", mkPng(col("doc_id"))),
        "doc_id", "payload")
    }

  /** Perceptual image near-dup (row 80): banded-hamming pairs over the
    * dHash fixture. maxHamming 3 < 4 bands ⇒ blocking is pigeonhole-
    * LOSSLESS, so the oracle is ALL-PAIRS hamming over the same fixture
    * (the q21/q22 discipline — a blocking recall miss fails the gate);
    * bucket cap 2000 clears the sf0.1 cluster size (5000 docs / 25
    * patterns) so the cap never silently drops a bucket at gate scales.
    */
  def q126ImageNearDup(s: SparkSession, dir: String): DataFrame =
    graft.multimodal.ImageHash.nearDuplicates(
        imagePhashFixture(s, dir), "doc_id", maxBucketSize = 2000)
      .orderBy("id_a", "id_b")

  /** Quality classifier (row 79, fastText-architecture NBSVM weights):
    * positive corpus = doc_id%5==0, negative = doc_id%5==3, hashed
    * uni+bigram buckets; every doc scored by its integer margin and
    * gated on avg-margin ≥ 0. The oracle REFITS the model (hexdigit-
    * fold buckets, HUGEINT cross-multiplied floor-div weights) and
    * replays every margin — training and scoring both cross-checked.
    */
  def q125QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val model = graft.text.QualityClassifier.train(
      d.filter(col("doc_id") % 5 === 0),
      d.filter(col("doc_id") % 5 === 3),
      "text", numBuckets = 1024)
    graft.text.QualityClassifier.score(d, "doc_id", "text", model, numBuckets = 1024)
      .withColumn("keep", col("margin") >= 0)
      .orderBy("doc_id")
  }

  /** Numeric HTML entity decode (row 71 extension): the
    * [[graft.functions.HtmlEntityDecode]] kernel's numeric path
    * (`&#NNN;` decimal, `&#xHHHH;` hex incl. supplementary-plane
    * emoji) gated against DuckDB constructing the expected DECODED
    * text independently via chr() on the same arithmetic codepoints —
    * the two sides never share the decode logic. Malformed (`&#zz;`),
    * out-of-range (`&#1234567;`) and unknown-named (`&copy;`) entities
    * must pass through verbatim; `&amp;` still decodes; the tag-strip
    * half of [[HtmlStrip.textOfFull]] rides along.
    */
  def q127NumericEntities(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val decCp = (id % 400) + 160           // Latin-1 supplement and beyond
    val hexCp = (id % 256) + lit(0x4E00L)  // CJK, hex-form entity
    val emojiCp = (id % 16) + lit(0x1F600L) // supplementary plane
    val html = concat(
      lit("<p>a &#"), decCp.cast("string"), lit("; b &#x"), hex(hexCp),
      lit("; c</p><div>d &#x"), hex(emojiCp),
      lit("; bad &#zz; over &#1234567; amp &amp;<b>mid</b> copy &copy; end</div>"))
    Tables.documents(s, dir).select(id).withColumn("html", html)
      .select(id, HtmlStrip.textOfFull(col("html")).as("text"))
      .select(id, md5(col("text")).as("text_md5"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  /** Exact-substring dedup (row 78, Lee et al. 2021): shared 8-token
    * boilerplate is prepended/appended by doc_id class so corpus-
    * duplicated ≥8-token runs exist at every alignment; every non-first
    * occurrence must scrub. The oracle re-derives gram keys, the
    * min-code first-occurrence rule, and coverage (by EXPANDING each
    * duplicated position — a different formulation than the engine's
    * island merge, same semantics) entirely in SQL.
    */
  def q124ExactSubstr(s: SparkSession, dir: String): DataFrame = {
    val t = when(col("doc_id") % 3 === 0,
        concat(lit("alpha beta gamma delta epsilon zeta eta theta "), col("text")))
      .when(col("doc_id") % 3 === 1,
        concat(col("text"), lit(" omega psi chi phi upsilon tau sigma rho")))
      .otherwise(col("text"))
    val d = Tables.documents(s, dir).select(col("doc_id"), t.as("text"))
    graft.dedup.ExactSubstr.scrub(d, "doc_id", "text", k = 8)
      .select(col("doc_id"), md5(col("text_clean")).as("text_md5"),
        col("n_tokens"), col("n_removed"))
      .orderBy("doc_id")
  }

  /** Containment dedup gate: every 10th doc gets a contained FRAGMENT
    * (its first 60% of tokens as a new doc) — jaccard-blind pairs that
    * only the containment measure catches. The prefix-filter blocking
    * must find every pair the all-pairs oracle finds (pigeonhole
    * recall), and each directional containment is an exact int division.
    */
  def q133Containment(s: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    val nFrag = floor(size(toks) * lit(0.6)).cast("int")
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val frags = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(2000000L)).as("doc_id"),
        array_join(slice(toks, lit(1), nFrag), " ").as("text"))
    val docs = base.unionByName(frags)
    graft.dedup.Containment.containmentPairs(docs, "doc_id", "text", k = 3, tau = 0.9)
      .orderBy("id_a", "id_b")
  }

  /** Chat-template SFT export gate: deterministic 5-turn conversations
    * synthesized from token slices, rendered with the ChatML surface
    * form; the oracle reconstructs the full rendered string AND every
    * assistant loss-mask span offset independently, so a hash match
    * proves the template bytes and the prefix-sum arithmetic.
    */
  def q134ChatTemplate(s: SparkSession, dir: String): DataFrame = {
    import graft.text.ChatTemplate
    val w = split(trim(lower(col("text"))), "\\s+")
    def seg(a: Int, n: Int) = array_join(slice(w, a, n), " ")
    val turns = array(
      struct(lit("system").as("role"), lit("you are a helpful assistant").as("content")),
      struct(lit("user").as("role"), seg(1, 10).as("content")),
      struct(lit("assistant").as("role"), seg(11, 10).as("content")),
      struct(lit("user").as("role"), seg(21, 5).as("content")),
      struct(lit("assistant").as("role"), seg(26, 5).as("content")))
    // NULL text → NULL rendered text → the oracle's n_chars column turns
    // nullable (float64 in the compare harness); render the empty string
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .select(col("doc_id"), turns.as("turns"))
    ChatTemplate.renderWithSpans(d, "doc_id", "turns")
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        length(col("text")).cast("long").as("n_chars"),
        array_join(transform(col("assistant_spans"), sp =>
          concat(sp.getField("s").cast("string"), lit(":"),
            sp.getField("e").cast("string"))), ",").as("spans"))
      .orderBy("doc_id")
  }

  /** Sentence segmentation gate: word-salad docs get deterministic
    * punctuation injected (periods every 7th token, "!?" + newline every
    * 11th, doubled spaces), then the rule-based segmenter runs; the
    * oracle re-derives the decorated text AND replays the boundary
    * rule + trimming independently — seg_md5 gates exact boundaries.
    */
  def q142Sentences(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), decoratedSentenceText.as("text"))
    graft.text.Chunking.sentenceStats(d, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** The q142 punctuation decoration (periods every 7th token, "!?" +
    * newline every 11th, doubled spaces) — shared by the segmentation
    * (q142) and sentence-chunking (q146) gates so both run the rule on
    * the same sentence structure.
    */
  private def decoratedSentenceText: org.apache.spark.sql.Column = {
    val w = split(trim(lower(coalesce(col("text"), lit("")))), "\\s+")
    array_join(
      transform(w, (t, i) =>
        concat(t,
          when(pmod(i, lit(11)) === 10, lit("!?\n"))
            .when(pmod(i, lit(7)) === 6, lit(".  "))
            .otherwise(lit(" ")))), "")
  }

  /** Sentence-aligned chunking gate: q142's sentences greedily packed
    * into ≤5-token chunks (budget BELOW the ~7-token sentence cadence so
    * the oversized token-window fallback fires on real rows, while the
    * 1–4-token sentences the 7/11 decoration cadence produces exercise
    * multi-sentence packing). The oracle replays segmentation + the
    * greedy fill as a RECURSIVE CTE over running (chunk, tokens) state —
    * a different derivation than the engine's array fold — and gates
    * chunk geometry AND chunk-text md5.
    */
  def q146SentenceChunks(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), decoratedSentenceText.as("text"))
    graft.text.Chunking.sentenceChunks(d, "doc_id", "text", budgetTokens = 5)
      .select(col("doc_id"), col("chunk_idx"), col("n_sentences"), col("n_chunk_tokens"),
        md5(to_binary(col("chunk"), lit("utf-8"))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Per-line language profile gate (CCNet-style): deterministic
    * multilingual line injection (French/German by doc_id % 3, a CJK
    * line by doc_id % 7), then per-line langid counts, the
    * fixed-tie-break dominant language, and foreign_ppm — the oracle
    * replays the q27 rule on every LINE.
    */
  def q160LineLangProfile(s: SparkSession, dir: String): DataFrame = {
    val fr = "le chat est sur la table et il est pas pour dans"
    val de = "der hund ist nicht mit der katze und das ist ein haus"
    val zh = "这是一个中文句子测试"
    val aug = Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 3 === 1, lit("\n" + fr))
          .when(col("doc_id") % 3 === 2, lit("\n" + fr + "\n" + de))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit("\n" + zh)).otherwise(lit(""))).as("text"))
    TextAnalysis.lineLanguageProfile(aug, "doc_id", "text")
      .select(col("doc_id"),
        col("n_lines").cast("long").as("n_lines"),
        col("n_en").cast("long").as("n_en"), col("n_de").cast("long").as("n_de"),
        col("n_fr").cast("long").as("n_fr"), col("n_es").cast("long").as("n_es"),
        col("n_zh").cast("long").as("n_zh"), col("n_und").cast("long").as("n_und"),
        col("dominant_lang"), col("foreign_ppm"))
      .orderBy("doc_id")
  }

  /** Checksum-id gate: every doc gets a deterministic synthetic card
    * number (spaced AND plain form of the same 16 digits) and a
    * synthetic IBAN derived from doc_id; whether each validates is
    * decided by the CHECKSUM, not the injection (~1/10 of cards pass
    * Luhn, ~1/97 of IBANs pass mod-97), so the oracle must recompute
    * every checksum digit-for-digit to match counts AND the validated
    * id lists.
    */
  def q147PiiChecksum(s: SparkSession, dir: String): DataFrame = {
    val card16 = concat(lit("4"),
      lpad(((col("doc_id") * 7919) % 1000000000000000L).cast("string"), 15, "0"))
    val spaced = concat_ws(" ",
      substring(card16, 1, 4), substring(card16, 5, 4),
      substring(card16, 9, 4), substring(card16, 13, 4))
    val iban = concat(lit("DE"),
      lpad((col("doc_id") % 100).cast("string"), 2, "0"),
      lpad(((col("doc_id") * 37) % 10000000000L).cast("string"), 10, "0"))
    val aug = Tables.documents(s, dir).select(col("doc_id"),
      concat(coalesce(col("text"), lit("")), lit(" pay "), spaced,
        lit(" acct "), iban, lit(" ref "), card16).as("text"))
    graft.text.PiiScan.checksumScan(aug, "text")
      .select(col("doc_id"), col("n_cards_valid"), col("n_ibans_valid"),
        array_join(col("cards_valid"), ",").as("cards"),
        array_join(col("ibans_valid"), ",").as("ibans"))
      .orderBy("doc_id")
  }

  /** Retrieval evaluation gate: single-probe LSH top-5 scored against
    * brute-force ground truth — the oracle replays BOTH retrievers (the
    * q25/q26 CTEs) and then the metric joins, so a hash match proves
    * hits, first-hit ranks, and the silently-empty-query contract. Also
    * the honest published number for the LSH path's recall loss.
    */
  def q143RetrievalEval(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankEval
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 10)
    val lsh = Knn.lshTopK(e, queries, "vec_id", "embedding", k = 5)
    val truth = Knn.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
    RankEval.perQuery(lsh, truth, k = 5).orderBy("query_id")
  }

  /** Graded-retrieval gate (nDCG@5): LSH top-5 scored against
    * brute-force truth with pinned grades (rank 1 → rel 3, ranks 2–3 →
    * 2, ranks 4–5 → 1); discounts are the [[graft.operators.RankEval]]
    * pinned integer table, which the oracle receives as spliced
    * literals — neither engine computes a logarithm, the ln rule
    * satisfied by construction.
    */
  def q149NdcgEval(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankEval
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 10)
    val lsh = Knn.lshTopK(e, queries, "vec_id", "embedding", k = 5)
    val graded = Knn.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .withColumn("rel",
        when(col("rank") === 1, 3L).when(col("rank") <= 3, 2L).otherwise(1L))
    RankEval.ndcg(lsh, graded, k = 5).orderBy("query_id")
  }

  /** Classifier evaluation gate: the q125 quality classifier's
    * training-set confusion counts — tp/fp/fn/tn as exact integers (the
    * oracle refits the model, replays every margin, and re-derives the
    * counts). The honest "how separable were the labels" number that
    * belongs next to any trained gate.
    */
  def q144ClassifierEval(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankEval
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val model = graft.text.QualityClassifier.train(
      d.filter(col("doc_id") % 5 === 0),
      d.filter(col("doc_id") % 5 === 3),
      "text", numBuckets = 1024)
    val scored = graft.text.QualityClassifier
      .score(d, "doc_id", "text", model, numBuckets = 1024)
      .withColumn("predicted", col("margin") >= 0)
    val labels = d.filter(col("doc_id") % 5 === 0 || col("doc_id") % 5 === 3)
      .select(col("doc_id"), (col("doc_id") % 5 === 0).as("label"))
    RankEval.confusion(scored, labels, "doc_id")
  }

  /** Calibration gate: the q125 classifier's margins cut into 10
    * integer-arithmetic rank buckets over the labeled split — positives
    * per bucket + actual margin extremes, the "is this margin a
    * probability or just a vote" report. The oracle refits the model,
    * replays every margin, and re-derives every bucket edge.
    */
  def q163Calibration(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankEval
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val model = graft.text.QualityClassifier.train(
      d.filter(col("doc_id") % 5 === 0),
      d.filter(col("doc_id") % 5 === 3),
      "text", numBuckets = 1024)
    val scored = graft.text.QualityClassifier
      .score(d, "doc_id", "text", model, numBuckets = 1024)
    val labels = d.filter(col("doc_id") % 5 === 0 || col("doc_id") % 5 === 3)
      .select(col("doc_id"), (col("doc_id") % 5 === 0).as("label"))
    RankEval.calibration(scored, labels, "doc_id", "margin", "label", nBuckets = 10)
      .orderBy("bucket")
  }

  /** Graph-ANN evaluation gate: NSW-style beam search results are a
    * parquet FIXTURE (a greedy walk can't be replayed in SQL — the
    * replayability-line pattern), the oracle replays exact brute truth
    * and the RankEval joins, and the integer metrics carry the hash.
    * Doubles as the published recall number for the graph path.
    */
  def q166GraphAnnEval(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankEval
    import graft.similarity.GraphAnn
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 10)
    val results = Fixtures.cachedParquet(s, dir, "nsw_topk") {
      val assigned = Knn.assignCells(e, "vec_id", "embedding",
          Knn.buildIvfIndex(e, "vec_id", "embedding", nlist = 16))
        .persist()
      assigned.count() // feeds the graph build AND the entry sample
      val graph = GraphAnn.buildGraph(assigned, graphDegree = 8)
      val out = GraphAnn.searchTopK(graph, e, queries, "vec_id", "embedding",
        GraphAnn.entryPoints(assigned, 8), k = 5, beam = 16, hops = 4)
      assigned.unpersist(false)
      out.select("query_id", "neighbor_id", "rank")
    }
    val truth = Knn.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
    RankEval.perQuery(results, truth, k = 5).orderBy("query_id")
  }

  /** Incremental graph-ANN gate: the standing corpus's block-edge store
    * folded forward with a new batch ([[graft.similarity.GraphAnn
    * .foldBatch]] — exactly rebuild-equivalent, spec-asserted), then the
    * assembled graph searched with cell-diverse entry points and scored
    * against brute truth over the FULL (standing + batch) corpus. Same
    * fixture/replay discipline as q166; this is the gate that proves the
    * last rebuild-only index now folds forward like IVF/PQ/BM25.
    */
  def q167GraphAnnFold(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankEval
    import graft.similarity.GraphAnn
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 10)
    val results = Fixtures.cachedParquet(s, dir, "nsw_fold_topk") {
      val batchPred = col("vec_id") % 7 === 3
      val corpus0 = e.filter(!batchPred)
      // the IVF index is corpus state: built on the STANDING corpus, the
      // batch assigned against the same centers (the q85 prebuilt contract)
      val index = Knn.buildIvfIndex(corpus0, "vec_id", "embedding", nlist = 16)
      val assigned0 = Knn.assignCells(corpus0, "vec_id", "embedding", index).persist()
      val assignedB = Knn.assignCells(e.filter(batchPred), "vec_id", "embedding", index).persist()
      assigned0.count(); assignedB.count()
      val store = GraphAnn.blockEdges(assigned0, graphDegree = 8).persist()
      store.count() // the standing graph state a real deployment persists
      val folded = GraphAnn.foldBatch(store, assigned0, assignedB, graphDegree = 8)
      val allAssigned = assigned0.unionByName(assignedB)
      val out = GraphAnn.searchTopK(GraphAnn.assembleGraph(folded), e, queries,
        "vec_id", "embedding", GraphAnn.entryPointsPerCell(allAssigned, perCell = 1),
        k = 5, beam = 16, hops = 4)
        .select("query_id", "neighbor_id", "rank")
      val materialized = out.persist()
      materialized.count()
      assigned0.unpersist(false); assignedB.unpersist(false); store.unpersist(false)
      materialized
    }
    val truth = Knn.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
    RankEval.perQuery(results, truth, k = 5).orderBy("query_id")
  }

  /** Threshold-free classifier-ranking gate: exact ROC-AUC of the q125
    * quality classifier over its labeled split via Mann–Whitney pair
    * counting — concordant/discordant/tied pair counts are EXACT LONGS
    * (counted from per-distinct-margin cumulative sums, never pair
    * enumeration), AUC one division of exact integers; the oracle
    * refits the model, replays every margin, and recounts the pairs.
    */
  def q168ClassifierAuc(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankEval
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val model = graft.text.QualityClassifier.train(
      d.filter(col("doc_id") % 5 === 0),
      d.filter(col("doc_id") % 5 === 3),
      "text", numBuckets = 1024)
    val scored = graft.text.QualityClassifier
      .score(d, "doc_id", "text", model, numBuckets = 1024)
    val labels = d.filter(col("doc_id") % 5 === 0 || col("doc_id") % 5 === 3)
      .select(col("doc_id"), (col("doc_id") % 5 === 0).as("label"))
    RankEval.auc(scored, labels, "doc_id", "margin")
  }

  /** AUC from-STORE gate: the q168 margins' per-distinct-score
    * histogram ([[graft.operators.RankEval.aucHistogram]]) folded in
    * three disjoint prediction batches through
    * [[graft.operators.RankEval.mergeAucHistogram]], then the
    * cumulative pair-counting tail
    * ([[graft.operators.RankEval.aucFromHistogram]]) over the standing
    * store — q168's oracle verbatim; the last mergeable store family
    * gains its own CORRECTNESS row (the q256–q262 discipline).
    */
  def q275AucFromStore(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankEval
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val model = graft.text.QualityClassifier.train(
      d.filter(col("doc_id") % 5 === 0),
      d.filter(col("doc_id") % 5 === 3),
      "text", numBuckets = 1024)
    val scored = graft.text.QualityClassifier
      .score(d, "doc_id", "text", model, numBuckets = 1024)
    val labels = d.filter(col("doc_id") % 5 === 0 || col("doc_id") % 5 === 3)
      .select(col("doc_id"), (col("doc_id") % 5 === 0).as("label"))
    def batch(i: Int) = RankEval.aucHistogram(
      scored.filter(col("doc_id") % 3 === i), labels, "doc_id", "margin")
    val folded = (1 to 2).foldLeft(batch(0))((acc, i) =>
      RankEval.mergeAucHistogram(acc, batch(i)))
    RankEval.aucFromHistogram(folded)
  }

  /** Hierarchical (HNSW-proper) graph-ANN gate: content-keyed geometric
    * levels, one navigable graph per layer, and the layered descent —
    * top-layer seeds routed down through narrow upper-layer walks into
    * the full-width layer-0 search. Same fixture/brute-truth replay
    * discipline as q166/q167.
    */
  def q174GraphAnnLayered(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankEval
    import graft.similarity.GraphAnn
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 10)
    val results = Fixtures.cachedParquet(s, dir, "nsw_layered_topk") {
      val assigned = Knn.assignCells(e, "vec_id", "embedding",
          Knn.buildIvfIndex(e, "vec_id", "embedding", nlist = 16)).persist()
      assigned.count()
      val leveled = GraphAnn.assignLevels(assigned, maxLevel = 2).persist()
      val layers = GraphAnn.buildLayers(assigned, graphDegree = 8, maxLevel = 2).persist()
      leveled.count(); layers.count() // the hierarchy is corpus state
      val out = GraphAnn.searchLayered(layers, e, queries, "vec_id", "embedding",
        leveled, maxLevel = 2, k = 5, beam = 16, hops = 4, upperBeam = 8)
        .select("query_id", "neighbor_id", "rank")
      val materialized = out.persist()
      materialized.count()
      assigned.unpersist(false); leveled.unpersist(false); layers.unpersist(false)
      materialized
    }
    val truth = Knn.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
    RankEval.perQuery(results, truth, k = 5).orderBy("query_id")
  }

  /** Sorted-neighborhood candidate gate: every pair within a 4-row window
    * of the (lang:text-prefix, doc_id) total order — the blocking family
    * that catches sort-adjacent near-misses hashes scatter; the oracle
    * replays the identical pair set from one SQL rank self-join, so the
    * gate proves the bucketed-rank layout computes the TRUE global order.
    */
  def q173SortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SortedNeighborhood
    val d = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("lang"), lit(":"),
        substring(regexp_replace(trim(lower(col("text"))), "\\s+", " "), 1, 24)).as("snkey"))
    SortedNeighborhood.candidatePairs(d, "doc_id", "snkey", window = 4, prefixLen = 3)
      .orderBy("id_a", "id_b")
  }

  /** Incremental sorted-neighborhood gate: the NEW window pairs from
    * folding the doc_id%7==3 batch into the standing corpus — computed
    * touching only batch cells + w−1 boundary rows, while the oracle
    * re-ranks the ENTIRE union and filters to batch-involving pairs;
    * hash equality proves the bounded fold sees exactly the full
    * reorder's delta.
    */
  def q175SortedNeighborhoodFold(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SortedNeighborhood
    val d = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("lang"), lit(":"),
        substring(regexp_replace(trim(lower(col("text"))), "\\s+", " "), 1, 24)).as("snkey"))
    SortedNeighborhood.incrementalPairs(
      d.filter(col("doc_id") % 7 =!= 3), d.filter(col("doc_id") % 7 === 3),
      "doc_id", "snkey", window = 4, prefixLen = 3)
      .orderBy("id_a", "id_b")
  }

  /** Judge-agreement gate: Cohen's κ between the learned quality
    * classifier (margin ≥ 0) and the blunt length heuristic
    * (n_chars ≥ 256) over every document — the chance-corrected number
    * that says whether the cheap filter can stand in for the model.
    * Every count and the pe numerator are exact integers the oracle
    * recomputes from its own model refit; κ is one division.
    */
  def q176JudgeKappa(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankEval
    val d = Tables.documents(s, dir).select("doc_id", "text", "n_chars")
    val model = graft.text.QualityClassifier.train(
      d.filter(col("doc_id") % 5 === 0),
      d.filter(col("doc_id") % 5 === 3),
      "text", numBuckets = 1024)
    val scored = graft.text.QualityClassifier
      .score(d, "doc_id", "text", model, numBuckets = 1024)
    val ratings = scored.join(d.select("doc_id", "n_chars"), Seq("doc_id"))
      .select((col("margin") >= 0).as("judge_model"),
        (col("n_chars") >= 256).as("judge_length"))
    RankEval.cohenKappa(ratings, "judge_model", "judge_length")
      .select(col("n_items"), col("n_agree"),
        col("pe_num").cast("long").as("pe_num"), col("agree_ppm"), col("kappa"))
  }

  /** Split-leakage audit gate: sorted-neighborhood near-dup pairs crossed
    * with the 75/12.5/12.5 hash split — the (train, test)/(train, val)
    * counts are the memorization risk a random split of an un-canonical
    * corpus always carries. Oracle replays pairs, split, and the
    * unordered matrix from scratch.
    */
  def q178SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SortedNeighborhood
    import graft.operators.Sampling
    val d = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("lang"), lit(":"),
        substring(regexp_replace(trim(lower(col("text"))), "\\s+", " "), 1, 24)).as("snkey"))
    val pairs = SortedNeighborhood.candidatePairs(d, "doc_id", "snkey",
      window = 4, prefixLen = 3)
    val assign = Sampling.splitAssign(
      Tables.documents(s, dir).select("doc_id"), Seq("doc_id"),
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    Sampling.splitLeakage(pairs, assign, idCol = "doc_id",
        idACol = "id_a", idBCol = "id_b")
      .orderBy("split_lo", "split_hi")
  }

  /** Batch-admission leakage gate — q178's audit made incremental: the
    * q175 standing/batch split (doc_id % 7), the q178 key and hash
    * split, and [[graft.operators.Sampling.splitLeakageDelta]]'s
    * O(touched) matrix of the NEW pairs only. The oracle replays the
    * full rebuild restricted to ≥1 batch side (the incremental law the
    * SNM fold spec asserts) plus the split matrix.
    */
  def q194SplitLeakageFold(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val d = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("lang"), lit(":"),
        substring(regexp_replace(trim(lower(col("text"))), "\\s+", " "), 1, 24)).as("snkey"))
    val assign = Sampling.splitAssign(
      Tables.documents(s, dir).select("doc_id"), Seq("doc_id"),
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    Sampling.splitLeakageDelta(
        standing = d.filter(col("doc_id") % 7 =!= 3),
        batch = d.filter(col("doc_id") % 7 === 3),
        assign = assign, idCol = "doc_id", keyCol = "snkey",
        window = 4, prefixLen = 3)
      .orderBy("split_lo", "split_hi")
  }

  /** Blocked edit-distance near-dup gate — the merge/purge pipeline
    * completed: q173's sorted-neighborhood window proposes, Levenshtein
    * decides ([[graft.dedup.SortedNeighborhood.editDistancePairs]]).
    * Integer distances, definitionally identical in DuckDB — every
    * surviving pair AND its distance hash.
    */
  def q195EditDistancePairs(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SortedNeighborhood
    val d = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("lang"), lit(":"),
        substring(regexp_replace(trim(lower(col("text"))), "\\s+", " "), 1, 24)).as("snkey"))
    SortedNeighborhood.editDistancePairs(d, "doc_id", "snkey",
        window = 4, prefixLen = 3, maxDist = 6)
      .orderBy("id_a", "id_b")
  }

  /** Poisson-bootstrap gate: 32 deterministic resamples of the corpus,
    * each replicate's (Σw, Σw·n_chars) exact and its mean one division —
    * the oracle redraws every (doc, replicate) Poisson weight from the
    * same md5 uniform and pinned CDF thresholds and re-sums.
    */
  def q179Bootstrap(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bootstrap
    Bootstrap.replicateMeans(
      Tables.documents(s, dir).select("doc_id", "n_chars"),
      Seq("doc_id"), "n_chars", reps = 32)
      .select(col("b"), col("n_drawn"),
        col("sum_v").cast("long").as("sum_v"), col("mean"))
      .orderBy("b")
  }

  /** Grouped bootstrap gate: per-source replicate means of document
    * length, 16 deterministic resamples each — the A/B harness's state;
    * the oracle redraws every (doc, replicate) weight inside its group.
    */
  def q182BootstrapBySource(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bootstrap
    Bootstrap.replicateMeansBy(
      Tables.documents(s, dir).select("source", "doc_id", "n_chars"),
      Seq("source"), Seq("doc_id"), "n_chars", reps = 16)
      .select(col("source"), col("b"), col("n_drawn"),
        col("sum_v").cast("long").as("sum_v"), col("mean"))
      .orderBy("source", "b")
  }

  /** Readability gate: Flesch reading ease per document from three exact
    * regexp counts; the oracle recomputes every count and the fixed IEEE
    * formula — the score itself hashes.
    */
  def q184Readability(s: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.readability(
      Tables.documents(s, dir).select("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")

  /** Batched (mapPartitions) stub feature extraction — plumbing check. */
  def q32MultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val withPayload = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    Multimodal.extractFeatures(s, withPayload, "doc_id", "payload", dim = 16, batchPartitions = Some(8))
      .select(col("doc_id"), size(col("features")).as("dim"))
      .orderBy("doc_id")
  }

  /** Shannon token-entropy gate: per language, the vocabulary mixture
    * entropy H = −Σ p·ln p over exact token counts — the ln companion
    * to q196's Simpson λ, gateable because every term is nano-scaled to
    * an integer BEFORE the (order-free) sum; H itself is one pinned
    * division, hash-exact.
    */
  def q202TokenEntropy(s: SparkSession, dir: String): DataFrame = {
    import graft.quality.Association
    val counts = Tables.documents(s, dir)
      .filter(col("text").isNotNull && col("lang").isNotNull)
      .select(col("lang"), explode(split(lower(col("text")), "\\s+")).as("__cat"))
      .filter(col("__cat") =!= "")
      .groupBy("lang", "__cat").agg(count(lit(1)).as("__n"))
    Association.entropyFromCounts(counts, Seq("lang"))
      .select(col("lang"), col("n_cats"), col("n"), col("entropy"),
        round(col("entropy_norm"), 9).as("entropy_norm"))
      .orderBy("lang")
  }

  /** Zipf rank–frequency gate: one-row OLS fit of ln(count) on ln(rank)
    * over the top-1000 tokens — the normal-equation sums are exact
    * nano-int DECIMALs (digit strings), slope/intercept their one
    * division each at 9 decimals.
    */
  def q204Zipf(s: SparkSession, dir: String): DataFrame = {
    import graft.text.CorpusLaws
    CorpusLaws.zipfSlope(
      Tables.documents(s, dir).filter(col("text").isNotNull).select("text"),
      "text", topN = 1000)
      .select(col("n_points"), col("ols_num"), col("ols_den"),
        round(col("slope"), 9).as("slope"),
        round(col("intercept"), 9).as("intercept"))
  }

  /** Heaps'-law vocabulary-growth gate: per power-of-two doc-id
    * checkpoint, the EXACT docs / cumulative-token / cumulative-vocab
    * counts from the single-scan first-occurrence form — an all-integer
    * frame, lossless cross-engine.
    */
  def q205Heaps(s: SparkSession, dir: String): DataFrame =
    graft.text.CorpusLaws.heapsCheckpoints(
      Tables.documents(s, dir), "doc_id", "text")
      .orderBy("ck")

  /** Fellegi–Sunter linkage gate: sorted-neighborhood candidates scored
    * by the agreement vector over (lang, length bucket, source) with
    * data-estimated u (exact collision counts) and pinned m = 0.95 —
    * each weight one nano-scaled ln, each score an integer sum, the
    * link/possible/non-link decision an integer threshold compare.
    */
  def q208FellegiSunter(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.Linkage
    val d = Tables.documents(s, dir)
      .filter(col("text").isNotNull && col("lang").isNotNull)
      .select(col("doc_id"),
        concat(col("lang"), lit(":"),
          substring(regexp_replace(trim(lower(col("text"))), "\\s+", " "), 1, 24)).as("snkey"),
        col("lang"), (col("n_chars") / 256L).cast("long").as("len_b"), col("source"))
    Linkage.fellegiSunter(d, "doc_id", "snkey",
        fields = Seq("lang", "len_b", "source"), window = 4, prefixLen = 3)
      .select(col("id_a"), col("id_b"), col("agree_lang"), col("agree_len_b"),
        col("agree_source"), col("score"), col("decision"))
      .orderBy("id_a", "id_b")
  }

  /** Jaro/Jaro–Winkler gate: the native codegen'd expression over the
    * q195 blocking pairs, 9-decimal surfaces against DuckDB's own
    * jaro_similarity / jaro_winkler_similarity — the fuzzy-compare
    * verify where Levenshtein's unit-edit model is wrong (JW weights
    * prefix agreement, the identifier-typo shape).
    */
  def q211JaroWinkler(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SortedNeighborhood
    import graft.functions.{jaroSim, jaroWinklerSim}
    val d = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("lang"), lit(":"),
        substring(regexp_replace(trim(lower(col("text"))), "\\s+", " "), 1, 24)).as("snkey"))
    SortedNeighborhood.candidatePairs(d, "doc_id", "snkey", window = 4, prefixLen = 3)
      .select(col("id_a"), col("id_b"),
        round(jaroSim(col("key_a"), col("key_b")), 9).as("jaro"),
        round(jaroWinklerSim(col("key_a"), col("key_b")), 9).as("jw"))
      .orderBy("id_a", "id_b")
  }

  /** Collocation gate: top bigrams with exact counts and both scores —
    * PMI (one fixed ln dag) and Dunning LLR (probability-form nano
    * terms, 2B·sum one dag) at 9 decimals; the oracle replays the
    * filtered-token pair stream and every term.
    */
  def q212Collocations(s: SparkSession, dir: String): DataFrame =
    graft.text.Collocations.collocations(
      Tables.documents(s, dir).select("text"), "text", minCount = 5L, k = 100)
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        col("b_tot"), col("n_tot"),
        round(col("pmi"), 9).as("pmi"),
        round(col("llr"), 9).as("llr"))
      .orderBy(col("c_xy").desc, col("w1"), col("w2"))

  /** Skip-gram co-occurrence gate: unordered token pairs within a
    * ±3-token window, PMI on the pair scale — counts exact, PMI at 9
    * decimals; the oracle replays the per-distance zips, the
    * least/greatest canonicalization, and every margin.
    */
  def q224Cooccurrence(s: SparkSession, dir: String): DataFrame =
    graft.text.Collocations.cooccurrence(
      Tables.documents(s, dir).select("text"), "text",
      window = 3, minCount = 5L, k = 100)
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        col("p_tot"), col("n_tot"), round(col("pmi"), 9).as("pmi"))
      .orderBy(col("c_xy").desc, col("w1"), col("w2"))

  /** Cluster-size histogram gate: the q113 component assignment folded
    * to the dedup health card — per cluster size the cluster/node
    * counts (exact), totals replicated, dup_factor one division.
    */
  def q231ClusterSizes(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id")
    val edges = d.filter(col("doc_id") % 10 <= 1)
      .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      .join(d.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
    ConnectedComponents.clusterSizeProfile(
      ConnectedComponents.labelPropagation(edges, localEdgeThreshold = 0))
      .select(col("size"), col("n_clusters"), col("n_nodes"),
        col("total_nodes"), col("total_clusters"),
        round(col("dup_factor"), 9).as("dup_factor"))
      .orderBy("size")
  }

  /** Hellinger-drift gate: the bounded [0,1] distance between the
    * even/odd-half event-value histograms — per-cell nano √(p·q) terms
    * summed order-free, H²/H a fixed dag.
    */
  def q232HellingerDrift(s: SparkSession, dir: String): DataFrame = {
    import graft.quality.Profiler
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_id"),
        // FLOOR division, matching the oracle's `//` on negative supports
        floor(round(col("value") * 1000).cast("long") / lit(5000d)).cast("long").as("bkt"))
    Profiler.hellingerDrift(
      base = ev.filter(col("event_id") % 2 === 0),
      cur = ev.filter(col("event_id") % 2 === 1),
      column = "bkt")
      .select(col("n_base"), col("n_cur"), col("bc9"),
        round(col("h2"), 9).as("h2"),
        round(col("hellinger"), 9).as("hellinger"))
  }

  /** Effective-sample-size gate: how many equal-weight docs each
    * language's n_chars-weighted corpus is worth — exact Σw/Σw² digit
    * strings, ESS and its ratio fixed dags.
    */
  def q233EffectiveSampleSize(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    Sampling.effectiveSampleSize(
      Tables.documents(s, dir).select("lang", "n_chars"), Seq("lang"), "n_chars")
      .select(col("lang"), col("n"), col("sw"), col("sww"),
        round(col("ess"), 9).as("ess"),
        round(col("ess_ratio"), 9).as("ess_ratio"))
      .orderBy("lang")
  }

  /** k-fold gate: 5 folds per language, md5-ranked — fold sizes within
    * a stratum differ by at most one row, assignment replayable from id
    * content alone.
    */
  def q237KFold(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    Sampling.kFoldAssign(
      Tables.documents(s, dir).select("lang", "doc_id"), Seq("lang"), Seq("doc_id"), k = 5)
      .select(col("lang"), col("doc_id"), col("rank"), col("fold"))
      .orderBy("lang", "rank")
  }

  /** Allocation→sampling composition gate: Hamilton-apportion 100
    * sample slots across languages by doc count, then draw each
    * language's exact quota with the A-ES race — the end-to-end
    * "balanced sampling plan" pipeline in one deterministic dag.
    */
  def q238AllocatedSample(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val d = Tables.documents(s, dir).select("lang", "doc_id", "n_chars")
    val seats = Sampling.apportion(
        d.groupBy("lang").agg(count(lit(1)).as("n_docs")),
        Nil, "n_docs", "lang", seats = 100L)
      .select(col("lang"), col("seats"))
    Sampling.weightedSampleWithoutReplacement(d, Seq("lang"), Seq("doc_id"), "n_chars", k = 500)
      .join(broadcast(seats), Seq("lang"))
      .filter(col("rank") <= col("seats"))
      .select(col("lang"), col("doc_id"), col("n_chars"), col("l9"),
        col("rank"), col("seats"))
      .orderBy("lang", "rank")
  }

  /** Threshold-sweep gate: the q195 blocked pair set clustered at every
    * maxDist 0..6 — per threshold the exact pair/node/cluster counts
    * and duplication factor (the verifier-cutoff tuning curve).
    */
  def q239ThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SortedNeighborhood
    val d = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("lang"), lit(":"),
        substring(regexp_replace(trim(lower(col("text"))), "\\s+", " "), 1, 24)).as("snkey"))
    val pairs = SortedNeighborhood.editDistancePairs(d, "doc_id", "snkey",
      window = 4, prefixLen = 3, maxDist = 6)
    ConnectedComponents.thresholdClusterSweep(pairs, "id_a", "id_b", "dist", 0 to 6)
      .select(col("threshold"), col("n_pairs"), col("n_nodes"),
        col("n_clusters"), round(col("dup_factor"), 9).as("dup_factor"))
      .orderBy("threshold")
  }

  /** Distributed threshold-sweep gate — the q239 chain with
    * `localPairThreshold = 0`, forcing the per-threshold
    * [[ConnectedComponents.labelPropagation]] fallback over the one
    * shared checkpointed min-dist frame: the path an oversized 100 TB
    * pair set actually takes, under q239's oracle verbatim (the q113
    * discipline — the scale arm carries its own CORRECTNESS row, not
    * spec-only trust).
    */
  def q274ThresholdSweepDist(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SortedNeighborhood
    val d = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("lang"), lit(":"),
        substring(regexp_replace(trim(lower(col("text"))), "\\s+", " "), 1, 24)).as("snkey"))
    val pairs = SortedNeighborhood.editDistancePairs(d, "doc_id", "snkey",
      window = 4, prefixLen = 3, maxDist = 6)
    ConnectedComponents.thresholdClusterSweep(pairs, "id_a", "id_b", "dist", 0 to 6,
      localPairThreshold = 0)
      .select(col("threshold"), col("n_pairs"), col("n_nodes"),
        col("n_clusters"), round(col("dup_factor"), 9).as("dup_factor"))
      .orderBy("threshold")
  }

  /** Krippendorff-alpha gate: a three-judge panel (length, word-count,
    * and a doc-id-parity noise judge that skips every 4th doc — the
    * missing-rating case kappa can't take) — per-unit nano disagreement
    * terms, exact margins, α a fixed dag.
    */
  def q234Krippendorff(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankEval
    val d = Tables.documents(s, dir).select("doc_id", "n_chars", "text")
    val j1 = d.select(col("doc_id"),
      (col("n_chars") >= 256L).cast("string").as("label"))
    val j2 = d.select(col("doc_id"),
      (size(expr("filter(split(lower(text), '\\\\s+'), t -> t != '')")) >= 40)
        .cast("string").as("label"))
    val j3 = d.filter(col("doc_id") % 4 =!= 1)
      .select(col("doc_id"), (col("doc_id") % 2 === 0).cast("string").as("label"))
    RankEval.krippendorffAlpha(j1.unionAll(j2).unionAll(j3), "doc_id", "label")
      .select(col("n_units"), col("n_pairable"), col("obs9"), col("de_num"),
        round(col("d_obs"), 9).as("d_obs"),
        round(col("d_exp"), 9).as("d_exp"),
        round(col("alpha"), 9).as("alpha"))
  }

  /** Vocabulary-churn gate: even-half vocabulary as the "fitted
    * tokenizer", odd half as the new corpus — exact type/mass churn and
    * the OOV mass rate that prices a refit.
    */
  def q240VocabChurn(s: SparkSession, dir: String): DataFrame = {
    import graft.text.CorpusLaws
    val d = Tables.documents(s, dir).select("doc_id", "text")
    CorpusLaws.vocabChurn(
      CorpusLaws.tokenCounts(d.filter(col("doc_id") % 2 === 0).select("text"), "text"),
      CorpusLaws.tokenCounts(d.filter(col("doc_id") % 2 === 1).select("text"), "text"))
      .select(col("types_base"), col("types_cur"), col("types_shared"),
        col("types_new"), col("types_dropped"),
        col("mass_base"), col("mass_cur"), col("cur_mass_in_base"),
        round(col("oov_rate"), 9).as("oov_rate"),
        round(col("new_type_rate"), 9).as("new_type_rate"))
  }

  /** Vocabulary-profile gate: the per-language corpus health card —
    * token/type/hapax counts exact, every ratio one pinned division,
    * top-100 head mass via the one rank window.
    */
  def q230VocabProfile(s: SparkSession, dir: String): DataFrame =
    graft.text.CorpusLaws.vocabProfile(
      Tables.documents(s, dir).select("lang", "text"), Seq("lang"), "text", topK = 100)
      .select(col("lang"), col("n_tokens"), col("n_types"), col("hapax"),
        col("top_mass"),
        round(col("hapax_ratio"), 9).as("hapax_ratio"),
        round(col("type_token_ratio"), 9).as("type_token_ratio"),
        round(col("top_share"), 9).as("top_share"))
      .orderBy("lang")

  /** Vocab-profile-from-STORE gate: per-(lang, token) counts folded in
    * three disjoint batches through
    * [[graft.text.CorpusLaws.mergeTokenCounts]] (the standing
    * tokenizer-health store), then read by
    * [[graft.text.CorpusLaws.vocabProfileFromCounts]] under q230's
    * oracle: fold == rebuild, hash-gated.
    */
  def q247VocabProfileFromStore(s: SparkSession, dir: String): DataFrame = {
    import graft.text.CorpusLaws
    val d = Tables.documents(s, dir).select("doc_id", "lang", "text")
    def batch(i: Int) = CorpusLaws.groupedTokenCounts(
      d.filter(col("doc_id") % 3 === i), Seq("lang"), "text")
    val folded = (1 to 2).foldLeft(batch(0))((acc, i) =>
      CorpusLaws.mergeTokenCounts(acc, batch(i), Seq("lang")))
    CorpusLaws.vocabProfileFromCounts(folded, Seq("lang"), topK = 100)
      .select(col("lang"), col("n_tokens"), col("n_types"), col("hapax"),
        col("top_mass"),
        round(col("hapax_ratio"), 9).as("hapax_ratio"),
        round(col("type_token_ratio"), 9).as("type_token_ratio"),
        round(col("top_share"), 9).as("top_share"))
      .orderBy("lang")
  }

  /** Cluster-sizes-from-INCREMENTAL-store gate: q93's incremental
    * component fold (old q37 clusters absorbing merge + fresh batch
    * edges through [[ConnectedComponents.incrementalComponents]])
    * read by the [[ConnectedComponents.clusterSizeProfile]] health
    * card — the standing dedup-store path under the from-scratch
    * closure oracle: fold == rebuild, hash-gated.
    */
  def q248ClusterSizesIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id")
    def within(e: DataFrame) =
      e.join(d.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
    val oldEdges = within(d.filter(col("doc_id") % 10 <= 1)
      .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst")))
    val newEdges = within(d.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 10).as("dst")))
      .unionByName(within(d.filter(col("doc_id") % 10 === 5)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))))
    val assign = ConnectedComponents.labelPropagation(oldEdges)
    ConnectedComponents.clusterSizeProfile(
      ConnectedComponents.incrementalComponents(assign, newEdges))
      .select(col("size"), col("n_clusters"), col("n_nodes"),
        col("total_nodes"), col("total_clusters"),
        round(col("dup_factor"), 9).as("dup_factor"))
      .orderBy("size")
  }

  /** Vocabulary-richness gate: per language the Chao1 unseen-types
    * estimate and Good–Turing coverage off the SAME token-count store
    * the profile reads — exact type/mass/singleton/doubleton integers,
    * every estimate a pinned division.
    */
  def q252VocabRichness(s: SparkSession, dir: String): DataFrame = {
    import graft.text.CorpusLaws
    CorpusLaws.vocabRichness(
      CorpusLaws.groupedTokenCounts(
        Tables.documents(s, dir).select("lang", "text"), Seq("lang"), "text"),
      Seq("lang"))
      .select(col("lang"), col("n_types"), col("mass"), col("f1"), col("f2"),
        round(col("chao1"), 9).as("chao1"),
        round(col("gt_unseen_mass"), 9).as("gt_unseen_mass"),
        round(col("coverage"), 9).as("coverage"))
      .orderBy("lang")
  }

  /** Vocabulary-overlap gate: every unordered source pair's shared-type
    * count and Jaccard/overlap/containment coefficients — which sources
    * are lexically the same corpus; exact integers, pinned divisions,
    * zero-overlap pairs emitted from the size grid.
    */
  def q253VocabOverlap(s: SparkSession, dir: String): DataFrame =
    graft.text.CorpusLaws.vocabOverlap(
      Tables.documents(s, dir).select("source", "text"), "source", "text")
      .select(col("source_a"), col("source_b"), col("types_a"), col("types_b"),
        col("n_shared"),
        round(col("jaccard"), 9).as("jaccard"),
        round(col("overlap"), 9).as("overlap"),
        round(col("containment_a"), 9).as("containment_a"),
        round(col("containment_b"), 9).as("containment_b"))
      .orderBy("source_a", "source_b")

  /** Hellinger-from-STORE gate: both halves' value histograms folded in
    * three disjoint batches through [[graft.quality.Profiler
    * .mergeValueCounts]], then [[graft.quality.Profiler
    * .hellingerFromCounts]] over the standing stores — q232's oracle
    * verbatim.
    */
  def q262HellingerFromStore(s: SparkSession, dir: String): DataFrame = {
    import graft.quality.Profiler
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_id"),
        floor(round(col("value") * 1000).cast("long") / lit(5000d)).cast("long").as("bkt"))
    def fold(half: DataFrame) = (1 to 2).foldLeft(
        Profiler.valueCounts(half.filter(col("event_id") % 6 < 2), "bkt")) { (acc, i) =>
      Profiler.mergeValueCounts(acc,
        Profiler.valueCounts(
          half.filter(col("event_id") % 6 >= i * 2 && col("event_id") % 6 < i * 2 + 2), "bkt"))
    }
    Profiler.hellingerFromCounts(
      fold(ev.filter(col("event_id") % 2 === 0)),
      fold(ev.filter(col("event_id") % 2 === 1)))
      .select(col("n_base"), col("n_cur"), col("bc9"),
        round(col("h2"), 9).as("h2"),
        round(col("hellinger"), 9).as("hellinger"))
  }

  /** Embedding-audit gate: the ANN pre-flight hygiene card over the
    * embeddings store — null/zero/non-finite vectors, dimension drift,
    * and the norm distribution (nano-exact mean, order-free min/max).
    */
  def q265EmbeddingAudit(s: SparkSession, dir: String): DataFrame =
    graft.similarity.EmbeddingAudit.audit(
      Tables.embeddings(s, dir).select("vec_id", "embedding"), "vec_id", "embedding")
      .select(col("n_vecs"), col("n_null"), col("dim_min"), col("dim_max"),
        col("n_dims"), col("n_nonfinite"), col("n_zero"), col("n_normed"),
        col("norm9_sum"),
        round(col("norm_min"), 9).as("norm_min"),
        round(col("norm_max"), 9).as("norm_max"),
        round(col("norm_mean"), 9).as("norm_mean"))

  /** Mixture-distance gate: pairwise JS divergence between every two
    * sources' unigram distributions — shared-token nano terms + the
    * exact one-sided mass closure; zero-overlap pairs read
    * js_norm = 1 exactly.
    */
  def q268MixtureDistance(s: SparkSession, dir: String): DataFrame =
    graft.text.CorpusLaws.mixtureDistanceMatrix(
      Tables.documents(s, dir).select("source", "text"), "source", "text")
      .select(col("source_a"), col("source_b"), col("mass_a"), col("mass_b"),
        col("shared_types"), col("shared_mass_a"), col("shared_mass_b"),
        round(col("js"), 9).as("js"),
        round(col("js_norm"), 9).as("js_norm"))
      .orderBy("source_a", "source_b")

  /** Friedman gate: do three deterministic "judges" (char length, token
    * count, distinct-token count) rank documents consistently — the
    * repeated-measures rank ANOVA over complete per-doc blocks, with
    * Kendall's W concordance. Judges on different scales compare
    * directly because only within-block ranks enter.
    */
  def q269Friedman(s: SparkSession, dir: String): DataFrame = {
    import graft.quality.Association
    val d = Tables.documents(s, dir)
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .select(col("doc_id"), col("n_chars"),
        expr("filter(split(lower(text), '\\\\s+'), t -> t != '')").as("__toks"))
    val long = d.select(col("doc_id"), lit("chars").as("judge"),
        col("n_chars").cast("long").as("score"))
      .unionByName(d.select(col("doc_id"), lit("tokens").as("judge"),
        size(col("__toks")).cast("long").as("score")))
      .unionByName(d.select(col("doc_id"), lit("types").as("judge"),
        size(array_distinct(col("__toks"))).cast("long").as("score")))
    Association.friedman(long, "doc_id", "judge", "score")
      .select(col("treatment"), col("b"), col("k"), col("n_incomplete"),
        col("r2_sum"), col("d"),
        round(col("chi2"), 9).as("chi2"),
        round(col("chi2_tie"), 9).as("chi2_tie"),
        round(col("w"), 9).as("w"))
      .orderBy("treatment")
  }

  /** Cronbach-alpha gate: internal consistency of the q269 judge trio
    * (char/token/type counts) — exact per-judge and total-score
    * variance numerators sharing one denominator, alpha a fixed dag.
    */
  def q270Cronbach(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankEval
    val d = Tables.documents(s, dir)
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .select(col("doc_id"), col("n_chars"),
        expr("filter(split(lower(text), '\\\\s+'), t -> t != '')").as("__toks"))
    val long = d.select(col("doc_id"), lit("chars").as("judge"),
        col("n_chars").cast("long").as("score"))
      .unionByName(d.select(col("doc_id"), lit("tokens").as("judge"),
        size(col("__toks")).cast("long").as("score")))
      .unionByName(d.select(col("doc_id"), lit("types").as("judge"),
        size(array_distinct(col("__toks"))).cast("long").as("score")))
    RankEval.cronbachAlpha(long, "doc_id", "judge", "score")
      .select(col("k"), col("n_units"), col("n_incomplete"),
        col("sum_var_num"), col("total_var_num"),
        round(col("alpha"), 9).as("alpha"))
  }

  /** Script-profile gate: per-language Unicode character-class
    * composition — exact per-class char counts via codegen'd
    * regexp_replace lengths, ratios pinned divisions.
    */
  def q259ScriptProfile(s: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.scriptProfile(
      Tables.documents(s, dir).select("lang", "text"), Seq("lang"), "text")
      .select(col("lang"), col("n_docs"), col("chars"), col("latin"),
        col("digit"), col("whitespace"), col("cjk"), col("cyrillic"),
        col("other"),
        round(col("latin_ratio"), 9).as("latin_ratio"),
        round(col("cjk_ratio"), 9).as("cjk_ratio"),
        round(col("other_ratio"), 9).as("other_ratio"))
      .orderBy("lang")

  /** Boilerplate-prefix gate: documents sharing their first-8-token
    * head — per doc the md5 prefix key, share count, and the >=3 flag;
    * the templated-header pattern near-dup thresholds let through.
    */
  def q260BoilerplatePrefix(s: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.boilerplatePrefix(
      Tables.documents(s, dir).select("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")

  /** Triangle-count gate: the q195 near-dup graph (sorted-neighborhood
    * blocking + Levenshtein verify) through degree-ordered triangle
    * counting — per node the exact degree, triangle count, and local
    * clustering coefficient (how clique-like is this doc's near-dup
    * neighborhood); the oracle replays the blocking, the canonical edge
    * set, and the a<b<c triple join.
    */
  def q218Triangles(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SortedNeighborhood
    import graft.graph.Triangles
    val d = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("lang"), lit(":"),
        substring(regexp_replace(trim(lower(col("text"))), "\\s+", " "), 1, 24)).as("snkey"))
    val edges = SortedNeighborhood.editDistancePairs(d, "doc_id", "snkey",
      window = 4, prefixLen = 3, maxDist = 6)
    Triangles.triangleCounts(edges, "id_a", "id_b")
      .select(col("node"), col("deg"), col("tri"), round(col("coeff"), 9).as("coeff"))
      .orderBy("node")
  }

  /** Weighted-sample gate (A-ES without replacement): the 50
    * longest-weighted docs per language by the u^(1/w) exponential race —
    * the oracle replays md5 → 60-bit uniform → nano-pinned ln → the
    * l9/w sort key and the id tie-break, so membership, l9 and rank all
    * hash.
    */
  def q219WeightedSample(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    Sampling.weightedSampleWithoutReplacement(
        Tables.documents(s, dir).select("lang", "doc_id", "n_chars"),
        groupCols = Seq("lang"), idCols = Seq("doc_id"),
        weightCol = "n_chars", k = 50)
      .select(col("lang"), col("doc_id"), col("n_chars"), col("l9"), col("rank"))
      .orderBy("lang", "rank")
  }
}
