package graft.functions

/** Byte-level byte-pair encoding — the public greedy-merge algorithm
  * (Sennrich, Haddow & Birch 2016, arXiv:1508.07909; the byte-level
  * variant popularized by GPT-2's public tokenizer), implemented from
  * the paper's description. This is the learned-subword arm of the
  * tokenizer seam: every registered oracle tokenizes by whitespace
  * (TextFns.tokens), and e14 (TextOps.bpeTokenStats) is the one query
  * that opts in.
  *
  * Determinism is the design constraint (results must reproduce on any
  * host/partitioning): training iterates words in sorted order and
  * breaks pair-count ties by (count DESC, pair lexicographic ASC) — a
  * total order — and encoding applies the unique lowest-rank
  * applicable merge each step, all occurrences left to right.
  *
  * Symbols are BYTES (UTF-8, each mapped to its Latin-1 char so a
  * symbol is a plain String): no unknown-token arm is ever needed —
  * any input falls back to single bytes, the property that makes
  * byte-level BPE total over arbitrary text.
  */
object Bpe {
  type Pair = (String, String)

  private def toSymbols(word: String): Vector[String] =
    word.getBytes("UTF-8").toVector
      .map(b => new String(Array(b), "ISO-8859-1"))

  private[functions] def applyMerge(syms: Vector[String],
                                    p: Pair): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += (p._1 + p._2); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Greedy merge training over the word-frequency table of `texts`
    * (whitespace-split words, matching the corpus' tokenizer seam).
    * Returns ≤ `nMerges` merges in learned order (rank = index);
    * stops early when no pair repeats.
    */
  def train(texts: Iterable[String], nMerges: Int): Vector[Pair] = {
    val freq = scala.collection.mutable.HashMap.empty[String, Long]
    texts.foreach(_.split(' ').iterator.filter(_.nonEmpty)
      .foreach(w => freq.update(w, freq.getOrElse(w, 0L) + 1L)))
    var words: Vector[(Vector[String], Long)] =
      freq.toVector.sortBy(_._1).map { case (w, f) => (toSymbols(w), f) }
    val merges = Vector.newBuilder[Pair]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[Pair, Long]
      for ((syms, f) <- words; j <- 0 until syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        counts.update(p, counts.getOrElse(p, 0L) + f)
      }
      val candidates = counts.filter(_._2 > 1)
      if (candidates.isEmpty) exhausted = true
      else {
        val best = candidates.toVector
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) => (applyMerge(syms, best), f) }
        i += 1
      }
    }
    merges.result()
  }

  /** Encode one word against a rank table: each step merges ALL
    * occurrences of the lowest-rank adjacent pair present, until none
    * applies — the standard BPE encode loop.
    */
  def encode(word: String, rank: Map[Pair, Int]): Vector[String] = {
    var syms = toSymbols(word)
    var go = syms.length > 1
    while (go) {
      var bestRank = Int.MaxValue
      var best: Pair = null
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val r = rank.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = p }
        j += 1
      }
      if (best == null) go = false
      else {
        syms = applyMerge(syms, best)
        go = syms.length > 1
      }
    }
    syms
  }

  /** Total BPE token count of a text under a rank table (whitespace
    * word split, empty words contribute nothing).
    */
  def tokenCount(text: String, rank: Map[Pair, Int]): Int =
    text.split(' ').iterator.filter(_.nonEmpty)
      .map(encode(_, rank).length).sum
}
