package graft.nlp

/**
 * Deterministic rule/lexicon POS tagger: a pure function of one token's (kind, value)
 * — closed-class lexicons first, then capitalization, then suffix rules — emitting the
 * `category` Token feature the reference's GATE pipeline ships on every token
 * (serialized features incl. `category`, /root/reference/src/gate/GateBatch.java:604-647)
 * and that profile label streams generalize over
 * (/root/reference/src/msa/AnnotationSequence.java:300-347) as `:token|category|<tag>`.
 *
 * Context-free BY DESIGN: no previous-token state means the tagger is embarrassingly
 * parallel, byte-identical at any parallelism, and exactly twinnable as one SQL CASE
 * expression ([[caseSql]] is GENERATED from the same rule tables, so engine and oracle
 * cannot drift — the q60/iriEscapes idiom). Tag inventory is a small Penn-style set:
 * cd, punct, dt, prp, cc, md, vb, in, nnp, rb, vbg, vbd, jj, nns, nn.
 *
 * Capitalization is defined as first char in 'A'..'Z' (ASCII) on BOTH sides — the
 * engine-portable predicate; locale-dependent `isUpper` would not twin.
 */
object PosTagger {

  /** Closed-class lexicons, checked in order (first hit wins). */
  val Lexicon: Seq[(String, Seq[String])] = Seq(
    "dt" -> Seq("the", "a", "an", "this", "that", "these", "those", "each", "every",
      "some", "any", "no"),
    "prp" -> Seq("i", "you", "he", "she", "it", "we", "they", "me", "him", "us",
      "them", "my", "your", "his", "her", "its", "our", "their", "myself",
      "yourself", "himself", "herself", "itself", "ourselves", "themselves"),
    "cc" -> Seq("and", "or", "but", "nor", "so", "yet"),
    "md" -> Seq("will", "would", "shall", "should", "can", "could", "may", "might",
      "must"),
    "vb" -> Seq("is", "are", "was", "were", "be", "being", "been", "am", "has",
      "have", "had", "do", "does", "did"),
    "in" -> Seq("of", "in", "on", "at", "by", "for", "with", "from", "as", "into",
      "over", "under", "between", "through", "during", "against", "about", "to"))

  private val lexiconSets: Seq[(String, Set[String])] =
    Lexicon.map { case (t, ws) => t -> ws.toSet }

  /** Suffix rules, checked in order: (tag, matching suffixes, excluded suffixes,
    * minimum length EXCLUSIVE — the word must be LONGER than this). */
  val Suffix: Seq[(String, Seq[String], Seq[String], Int)] = Seq(
    ("rb", Seq("ly"), Nil, 3),
    ("vbg", Seq("ing"), Nil, 4),
    ("vbd", Seq("ed"), Nil, 3),
    ("jj", Seq("ous", "ful", "ive", "ual", "ic", "al"), Nil, 4),
    ("nns", Seq("s"), Seq("ss"), 3))

  /** Tag one token. `kind` is the engine tokenizer's word/number/punctuation;
    * `value` the covered (possibly 500-char-truncated) text. */
  def tag(kind: String, value: String): String = {
    if (kind == "number") return "cd"
    if (kind == "punctuation") return "punct"
    // allocation-free for pure lowercase-ASCII tokens (the common case);
    // byte-identical — any A–Z or non-ASCII char routes to the ROOT-locale lowering
    var needsLower = false
    var i = 0
    while (i < value.length && !needsLower) {
      val c = value.charAt(i)
      if (c >= 'A' && c <= 'Z' || c >= 0x80) needsLower = true
      i += 1
    }
    val w = if (needsLower) value.toLowerCase(java.util.Locale.ROOT) else value
    lexiconSets.foreach { case (t, set) => if (set(w)) return t }
    if (value.nonEmpty && value.charAt(0) >= 'A' && value.charAt(0) <= 'Z') return "nnp"
    Suffix.foreach { case (t, inc, exc, minLen) =>
      if (w.length > minLen && inc.exists(w.endsWith) && !exc.exists(w.endsWith))
        return t
    }
    "nn"
  }

  /**
   * DuckDB twin of [[tag]] as one CASE expression, generated from the SAME rule
   * tables. `tok` / `kind` are SQL expressions yielding the token text and its
   * word/number/punctuation kind.
   */
  def caseSql(tok: String, kind: String): String = {
    val sb = new StringBuilder(s"CASE WHEN $kind = 'number' THEN 'cd' ")
    sb ++= s"WHEN $kind = 'punctuation' THEN 'punct' "
    Lexicon.foreach { case (t, ws) =>
      sb ++= s"WHEN lower($tok) IN (${ws.map(w => s"'$w'").mkString(",")}) THEN '$t' "
    }
    sb ++= s"WHEN substring($tok, 1, 1) BETWEEN 'A' AND 'Z' THEN 'nnp' "
    Suffix.foreach { case (t, inc, exc, minLen) =>
      val incSql = inc.map(s => s"ends_with(lower($tok), '$s')").mkString(" OR ")
      val excSql = exc.map(s => s" AND NOT ends_with(lower($tok), '$s')").mkString
      sb ++= s"WHEN len($tok) > $minLen AND ($incSql)$excSql THEN '$t' "
    }
    sb ++= "ELSE 'nn' END"
    sb.result()
  }
}
