package graft.ingest

/**
 * Text normalization — the byte-identity invariant.
 *
 * Mirrors the reference's document-text preparation exactly
 * (/root/reference/src/gate/GateBatch.java:327-352): `trim()`, strip every `\r`,
 * reject documents with no `[a-zA-Z0-9]` anywhere (DOTALL regex at :327, `m.matches()`
 * gate at :346), then the text the annotator sees gains one trailing `\n` because the
 * reference writes it with `println` (:347-349). All annotation offsets are relative to
 * this normalized text.
 *
 * Pure, deterministic, total: the per-url golden SHA-256 test pins these bytes.
 */
object Normalize {
  private val HasAlnum = java.util.regex.Pattern.compile(".*[a-zA-Z0-9]+.*",
    java.util.regex.Pattern.DOTALL)

  /** trim + strip \r; None when the alnum gate rejects the doc. No trailing \n yet. */
  def clean(raw: String): Option[String] = {
    if (raw == null) return None
    val t = raw.trim.replace("\r", "")
    if (HasAlnum.matcher(t).matches()) Some(t) else None
  }

  /** The exact byte stream the annotation stage consumes (clean + trailing \n). */
  def normalize(raw: String): Option[String] = clean(raw).map(_ + "\n")

  def sha256(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }

  /**
   * P7 doc-cleanup operator — the reference's in-place corpus rewrite
   * (/root/reference/src/util/CleanDocs.java:16-60: trim each doc's text and write it
   * back), extended with the whitespace-collapse pass its name promises: internal
   * whitespace runs become single spaces. A pure column rewrite (trim +
   * regexp_replace), fully inside whole-stage codegen — the Spark replacement for the
   * reference's row-at-a-time UPDATE loop. Rewrite in place = overwrite the corpus
   * table with this frame.
   */
  def cleanDocs(docs: org.apache.spark.sql.DataFrame, textCol: String,
      collapseWhitespace: Boolean = true): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // the reference's String.trim strips every char <= U+0020, while Spark's trim()
    // strips SPACES only — a tab/newline-edged doc would survive it. Use the control
    // character class explicitly so trim-only mode really is the reference transform.
    val trimmed = regexp_replace(col(textCol), "^[\\x00-\\x20]+|[\\x00-\\x20]+$", "")
    val cleaned = if (collapseWhitespace)
      regexp_replace(trimmed, "\\s+", " ") else trimmed
    docs.withColumn(textCol, cleaned)
  }
}
