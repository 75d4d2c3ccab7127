package graft.text

import org.apache.spark.sql.Column

/**
 * Trained byte-pair encoding: learn a merge table from a word-frequency vocabulary
 * (the q54 `vocabulary` feed), apply it with the classic lowest-rank-first greedy
 * segmenter, and count subword tokens per document — the REAL token counter a
 * token-budget mixing stage needs (the `bpeTokens` heuristic under-/over-counts
 * against any trained tokenizer).
 *
 * Everything is deterministic and engine-portable:
 *  - training ties break by lexicographically smallest pair, so the merge table is a
 *    pure function of the vocabulary;
 *  - application merges the LEFTMOST occurrence of the LOWEST-RANK pair, one merge
 *    per step — exactly replayable in SQL as a recursive CTE over the merge table
 *    rendered by [[mapSql]] (the q61/caseSql generated-twin idiom);
 *  - counting runs on the native [[graft.functions.BpeCount]] codegen expression
 *    (merge table as ONE reference object per plan, one JIT pass per document).
 *
 * Counting casefolds: words are the LOWERCASED whitespace tokens, matching the
 * vocabulary feed (`TextAnalysis.vocabulary` lowercases) and the oracle twin.
 */
object Bpe {

  /**
   * Learn `numMerges` merges from (word, count) vocabulary rows. Each round counts
   * all adjacent symbol pairs (weighted by word count, overlapping occurrences all
   * counted), merges the most frequent pair — ties to the lexicographically smallest
   * (a, b) — in every word (left-to-right, non-overlapping), and stops early when no
   * pair occurs with weight ≥ 2.
   */
  def train(vocab: Seq[(String, Long)], numMerges: Int): Vector[(String, String)] = {
    var words: Seq[(Vector[String], Long)] =
      vocab.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      val best = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= 2 =>
          merges += ((a, b))
          words = words.map { case (syms, cnt) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += a + b; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), cnt)
          }
        case _ => done = true
      }
      round += 1
    }
    merges.result()
  }

  /** Words longer than this never merge — they count as their character length.
    * The greedy loop is O(len²) per word, so an unbroken megatoken (a 10k-char URL
    * in web text) would otherwise cost ~10⁸ rank probes; real tokenizers cap the
    * same way. NOT a silent cap: the definition is deterministic, documented, and
    * replayed verbatim by the q62 oracle (char count only ever OVER-estimates the
    * subword count, the safe direction for budget packing). */
  val MaxWordLen = 200

  /** Greedy application for one word: repeatedly merge the leftmost occurrence of
    * the lowest-rank adjacent pair. Driver/test-side twin of the executor kernel.
    * Words beyond [[MaxWordLen]] stay unmerged (one symbol per char). */
  def segment(word: String, merges: Seq[(String, String)]): Vector[String] = {
    if (word.length > MaxWordLen) return word.map(_.toString).toVector
    val ranks = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      var bi = -1
      var br = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach(r => if (r < br) { br = r; bi = i })
        i += 1
      }
      if (bi < 0) done = true
      else syms = syms.take(bi) ++ Vector(syms(bi) + syms(bi + 1)) ++ syms.drop(bi + 2)
    }
    syms
  }

  /** BPE token count of a text column (lowercased whitespace words) under `merges`,
    * as a native codegen column. */
  def countColumn(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.BpeCount.column(text, merges)

  /** DuckDB `MAP {'a b': rank, …}` literal of a merge table — the oracle-side twin
    * input for the recursive-CTE segmenter. Single quotes double-escaped. */
  def mapSql(merges: Seq[(String, String)]): String = {
    def esc(s: String) = s.replace("'", "''")
    merges.zipWithIndex
      .map { case ((a, b), r) => s"'${esc(a)} ${esc(b)}': $r" }
      .mkString("MAP {", ", ", "}")
  }

  /**
   * Frozen default merge table: `train(vocabulary(sf0.01 documents, minCount=50,
   * topN=100), numMerges=60)` — the q54 feed at the driver's verification scale
   * (30 distinct words survive the min-count gate; see FIXTURES.md for the
   * derivation). Frozen rather than retrained per query so the q62 oracle can
   * replay application against the SAME table at any scale factor; BpeSpec
   * re-derives it from the embedded vocabulary fixture to pin the trainer.
   */
  val DefaultMerges: Vector[(String, String)] = Vector(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"), ("m", "er"), ("a", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("j", "o"), ("jo", "in"), ("a", "s"),
    ("as", "h"), ("h", "ash"), ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"), ("custo", "mer"),
    ("f", "i"), ("fi", "l"), ("fil", "t"), ("filt", "er"), ("a", "l"), ("al", "l"),
    ("m", "all"), ("s", "mall"), ("g", "e"), ("l", "ow"), ("mer", "ge"), ("s", "low"),
    ("c", "t"), ("ct", "or"), ("d", "er"), ("e", "ctor"), ("or", "der"),
    ("v", "ector"), ("in", "e"), ("l", "ine"), ("a", "b"), ("ab", "l"), ("abl", "e"),
    ("at", "a"), ("d", "ata"), ("t", "able"), ("a", "g"), ("ag", "g"), ("a", "lu"),
    ("alu", "e"))
}
