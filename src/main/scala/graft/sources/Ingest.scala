package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Annotation, Page}

/**
 * Corpus importers — the reference's utility loaders re-expressed as Spark sources.
 *
 *  S4  Text-file corpus import (ref /root/reference/src/util/ImportTextFiles.java:17-94):
 *      directory of .txt files → Page rows, with the reference's import-time
 *      normalization (trim + strip \r, ImportTextFiles.java:55) applied.
 *  S5  CoNLL-2003 gold import (ref /root/reference/src/util/GenCoNLLAnnotations.java:
 *      29-120): 4-column token files → reconstructed document text + stand-off Token /
 *      Sentence / gold NER-span annotations, exactly the reference's universal
 *      annotation-row shape.
 *
 * Both read with `wholetext` so each file is one row — per-doc reconstruction is a pure
 * narrow flatMap (deterministic at any parallelism; no line-order dependence), and the
 * scan parallelizes across files like any FileScan.
 */
object Ingest {

  private val DefaultTs = java.sql.Timestamp.valueOf("1970-01-01 00:00:00")

  /** S4: one Page per .txt file; `url` = `file://` path; text normalized at import. */
  def fromTextFiles(dir: String, lang: String = "und")(
      implicit spark: SparkSession): Dataset[Page] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(dir)
      .select(input_file_name().as("url"), col("value").as("raw"))
      .as[(String, String)]
      .map { case (url, raw) =>
        Page(url, DefaultTs, Array.emptyByteArray,
          raw.trim.replaceAll("\r", ""), lang)
      }
  }

  /** One reconstructed CoNLL document: space-joined tokens, sentence per blank-line
    * group, gold spans from the IOB tags of the requested column. */
  final case class CoNLLDoc(url: String, text: String, annots: Vector[Annotation])

  /**
   * S5: parse CoNLL-2003 files (token POS chunk NER; blank line = sentence break;
   * `-DOCSTART-` = document break) into (Page, annotations).
   *
   * Text reconstruction: tokens joined by single spaces, sentences joined by single
   * spaces — offsets are therefore derivable purely from token lengths, which keeps the
   * import deterministic and offset-exact.
   */
  def fromCoNLL(path: String, nerProvenance: String = "gold")(
      implicit spark: SparkSession): Dataset[CoNLLDoc] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("file"), col("value").as("raw"))
      .as[(String, String)]
      .flatMap { case (file, raw) => parseFile(file, raw) }
  }

  /** Pure parser (unit-testable): one file's content → docs. */
  def parseFile(file: String, raw: String): Vector[CoNLLDoc] = {
    // split into documents on -DOCSTART- lines
    val lines = raw.split("\n", -1).toVector
    val docBreaks = lines.zipWithIndex.collect {
      case (l, i) if l.startsWith("-DOCSTART-") => i
    }
    val ranges: Vector[(Int, Int)] =
      if (docBreaks.isEmpty) Vector((0, lines.length))
      else docBreaks.zipAll(docBreaks.drop(1), 0, lines.length)
        .map { case (s, e) => (s + 1, e) }
    ranges.zipWithIndex.flatMap { case ((s, e), docIdx) =>
      parseDoc(s"$file#doc$docIdx", lines.slice(s, e))
    }
  }

  private def parseDoc(url: String, lines: Vector[String]): Option[CoNLLDoc] = {
    // sentences: groups of non-blank lines
    val sents = Vector.newBuilder[Vector[Array[String]]]
    var cur = Vector.newBuilder[Array[String]]
    var any = false
    lines.foreach { l =>
      if (l.trim.isEmpty) { val v = cur.result(); if (v.nonEmpty) { sents += v; any = true }; cur = Vector.newBuilder }
      else cur += l.trim.split("\\s+")
    }
    locally { val v = cur.result(); if (v.nonEmpty) { sents += v; any = true } }
    if (!any) return None

    val annots = Vector.newBuilder[Annotation]
    val text = new StringBuilder
    var id = 0
    def add(t: String, b: Int, e: Int, v: String, feats: Map[String, String],
        prov: String): Unit = {
      annots += Annotation(url, id, t, b, e, v, feats, prov, 1.0); id += 1
    }
    sents.result().foreach { toks =>
      if (text.nonEmpty) text.append(' ')
      val sentBegin = text.length
      // token + POS annotations, plus IOB entity spans
      var entType: String = null; var entBegin = 0; var entEnd = 0
      def flushEnt(): Unit = if (entType != null) {
        add(entType, entBegin, entEnd, text.substring(entBegin, entEnd),
          Map("source" -> "conll"), "gold")
        entType = null
      }
      toks.zipWithIndex.foreach { case (cols, i) =>
        if (i > 0) text.append(' ')
        val b = text.length
        text.append(cols(0))
        val e = text.length
        val pos = if (cols.length > 1) cols(1) else ""
        add("Token", b, e, cols(0),
          Map("string" -> cols(0), "category" -> pos), "conll-import")
        val ner = if (cols.length > 3) cols(3) else "O"
        if (ner.startsWith("B-") || (ner.startsWith("I-") &&
            (entType == null || entType != ner.substring(2)))) {
          flushEnt(); entType = ner.substring(2); entBegin = b; entEnd = e
        } else if (ner.startsWith("I-")) entEnd = e
        else flushEnt()
      }
      flushEnt()
      add("Sentence", sentBegin, text.length, "", Map.empty, "conll-import")
    }
    Some(CoNLLDoc(url, text.toString, annots.result()))
  }

  /** CoNLL docs → the pipeline's Page shape (text pre-extracted, no html). */
  def conllPages(docs: Dataset[CoNLLDoc])(implicit spark: SparkSession): Dataset[Page] = {
    import spark.implicits._
    docs.map(d => Page(d.url, DefaultTs, Array.emptyByteArray, d.text, "en"))
  }
}
