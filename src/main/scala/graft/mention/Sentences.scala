package graft.mention

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{Annotation, SentenceAnnots}

/**
 * Group annotations into sentence units — the reference's per-sentence annotation query
 * (interval containment `a.start >= s.start and a.start < s.end`,
 * /root/reference/src/msa/db/MySQLDBInterface.java:136-138) realized as one pass:
 * annotations are already co-located per url, so a single groupByKey(url) + in-group
 * interval sweep replaces millions of per-sentence JDBC round trips. One shuffle on url,
 * then linear in-group work; url is a high-cardinality key so partitions stay balanced
 * (a url's group is one page's annotations — hot DOMAINS don't concentrate here, and a
 * pathological mega-page is a single group by semantic necessity). Keyed stages where a
 * genuinely hot key must be split use [[graft.scale.Skew]] salted repartition/agg/join;
 * AQE skew splitting handles residual runtime imbalance.
 *
 * Sentences overrunning into later annotations are merged with following sentences,
 * mirroring ref GenSentences.java:351-366.
 */
object Sentences {

  def fromAnnotations(annots: Dataset[Annotation])(
      implicit spark: SparkSession): Dataset[SentenceAnnots] = {
    import spark.implicits._
    annots.groupByKey(_.url).flatMapGroups { (url, it) =>
      val all = it.toVector
      group(url, all)
    }
  }

  /** Pure in-group sentence assignment (unit-testable). */
  def group(url: String, all: Vector[Annotation]): Vector[SentenceAnnots] = {
    val sents = all.filter(_.annotType == "Sentence").sortBy(_.begin)
    val rest = all.filter(_.annotType != "Sentence").sortBy(a => (a.begin, a.end))
    if (sents.isEmpty) return Vector.empty
    // merge sentences whose span is overrun by a multi-token annotation
    // (ref GenSentences.java:351-366)
    val merged = Vector.newBuilder[(Int, Int)]
    var cb = sents.head.begin
    var ce = sents.head.end
    var i = 1
    while (i < sents.length) {
      val maxAnnotEnd = rest.iterator
        .filter(a => a.begin >= cb && a.begin < ce).map(_.end).foldLeft(ce)(math.max)
      if (maxAnnotEnd > ce && sents(i).begin < maxAnnotEnd) {
        ce = math.max(maxAnnotEnd, sents(i).end)
      } else {
        merged += ((cb, ce)); cb = sents(i).begin; ce = sents(i).end
      }
      i += 1
    }
    merged += ((cb, ce))
    val spans = merged.result()
    // interval sweep: both lists sorted by begin
    val out = Vector.newBuilder[SentenceAnnots]
    var ai = 0
    spans.foreach { case (sb, se) =>
      while (ai < rest.length && rest(ai).begin < sb) ai += 1
      val buf = Vector.newBuilder[Annotation]
      var k = ai
      while (k < rest.length && rest(k).begin < se) { buf += rest(k); k += 1 }
      val annots = buf.result()
      if (annots.nonEmpty) out += SentenceAnnots(url, sb, se, annots)
      ai = k
    }
    out.result()
  }
}
