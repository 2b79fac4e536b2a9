package graft.text

/** Byte-pair-encoding subword counting — the token accounting that packing
  * (q70/q88), mixture reports (q60) and temperature resampling (q81/q87)
  * should really budget with: a whitespace/regex count systematically
  * UNDER-counts subword tokenizers on long/rare words, so token budgets
  * built from it overfill real trainer sequences.
  *
  * The merges table is the standard GPT-2 `merges.txt` FORMAT (one merge
  * per line, rank = line order; `#`-prefixed header ignored), loaded from
  * a checked-in resource. The bundled table is a small DEMONSTRATION
  * vocabulary (this container has no network to fetch a production one);
  * swap the resource — or pass any ranks map — for a real tokenizer's
  * merges file and the kernel is unchanged. Counting is exact greedy BPE:
  * repeatedly merge the LOWEST-rank adjacent pair (all its occurrences,
  * left to right) until no adjacent pair has a rank — deterministic on
  * any engine, so counts are reproducible corpus state.
  *
  * Simplifications vs the full GPT-2 scheme, stated: pre-tokenization is
  * the same `[a-z]+|[0-9]+|[^a-z0-9\s]` pattern the regex estimate uses
  * (over lowercased text) rather than the byte-level space-prefix
  * pre-tokenizer, and there is no end-of-word marker — both affect WHICH
  * vocab fits best, not the greedy-merge mechanics.
  */
object Bpe {

  /** Ranks from the bundled demonstration merges resource. */
  lazy val defaultRanks: Map[(String, String), Int] =
    loadRanks("/graft/bpe_merges.txt")

  /** Parse a GPT-2-format merges file from the classpath. */
  def loadRanks(resource: String): Map[(String, String), Int] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing merges resource $resource")
    try
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
        .zipWithIndex
        .map { case (l, i) =>
          val parts = l.split(" ")
          require(parts.length == 2, s"bad merges line: '$l'")
          (parts(0), parts(1)) -> i
        }.toMap
    finally in.close()
  }

  /** Exact greedy-merge subword count of ONE pre-token: start from
    * characters, repeatedly merge every occurrence of the lowest-rank
    * adjacent pair, return the surviving symbol count. O(len²·merges)
    * worst case but len is a word; the per-task memo in the DataFrame
    * kernel absorbs Zipf repetition.
    */
  def subwordCount(word: String, ranks: Map[(String, String), Int]): Int = {
    var n = word.length
    if (n <= 1) n
    else {
      var syms = new Array[String](n)
      var i = 0
      while (i < n) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
      var done = false
      while (!done && n > 1) {
        var best = Int.MaxValue
        i = 0
        while (i < n - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          // merge ALL occurrences of the winning pair, left to right
          var l: String = null
          var r: String = null
          i = 0
          while (l == null) {
            if (ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue) == best) {
              l = syms(i); r = syms(i + 1)
            }
            i += 1
          }
          val out = new Array[String](n)
          var o = 0
          var j = 0
          while (j < n) {
            if (j < n - 1 && syms(j) == l && syms(j + 1) == r) {
              out(o) = l + r; j += 2
            } else { out(o) = syms(j); j += 1 }
            o += 1
          }
          syms = out
          n = o
        }
      }
      n
    }
  }

  /** Serializable per-row kernel: pre-tokenize (lowercased regex), sum
    * greedy subword counts with a per-task word memo (entry- and
    * word-length-bounded — long words are the least likely to repeat
    * under Zipf, same admission policy as the simhash md5 memo).
    */
  final class Counter(ranks: Map[(String, String), Int])
      extends (String => Option[Int]) with Serializable {
    @transient private lazy val memo = new java.util.HashMap[String, Integer]()
    @transient private lazy val pat =
      java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")

    def apply(text: String): Option[Int] =
      if (text == null) None
      else {
        val m = pat.matcher(text.toLowerCase(java.util.Locale.ROOT))
        var total = 0
        while (m.find()) {
          val w = m.group()
          var c = memo.get(w)
          if (c == null) {
            c = Integer.valueOf(subwordCount(w, ranks))
            if (w.length <= 64 && memo.size < (1 << 18)) memo.put(w, c)
          }
          total += c.intValue()
        }
        Some(total)
      }
  }
}
