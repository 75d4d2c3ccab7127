package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extract
import graft.model.{Page, Pattern, Triple}
import graft.mention.Sentences
import graft.nlp.{Annotate, Gazetteer}

/**
 * The production extraction path in isolation: annotate → sentence-group → broadcast
 * pattern matching → triples → partitioned write. This is the stage that runs over the
 * full 10^12-page corpus at scale (learning runs on a small validated sample by design —
 * exactly the reference's split: learning on status-1 docs only, extraction on status-0,
 * /root/reference/src/msa/IEDriver.java:441-450; SURVEY.md §7.4.2).
 *
 * Shuffle budget: ONE url shuffle (sentence grouping), one window shuffle (subject
 * resolution), plus the write. Everything else is narrow map work, so wall-clock scales
 * ~linearly with cores — this is the job the two-parallelism scaling evidence runs.
 */
object ExtractJob {

  final case class Result(nTriples: Long, outputHash: Long)

  def run(pages: Dataset[Page], patterns: Seq[Pattern], gaz: Gazetteer,
      outPath: String)(implicit spark: SparkSession): Result = {
    val annots = Annotate.annotate(pages, gaz)
    // sents feeds both the matcher and the subject-resolution join in triples():
    // persist so annotate+group run once per partition, not twice.
    val sents = Sentences.fromAnnotations(annots)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mentions = Extract.mergeAdjacent(Extract.mentions(sents, patterns))
    val triples: Dataset[Triple] = Extract.triples(sents, mentions)
    val out = triples.toDF().dropDuplicates("subj", "pred", "obj", "url", "begin")
    out.write.mode("overwrite").parquet(outPath)
    val r = spark.read.parquet(outPath)
      .agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(subj, pred, obj, url, begin, end))"), lit(0L)))
      .head()
    sents.unpersist()
    Result(r.getLong(0), r.getLong(1))
  }
}
