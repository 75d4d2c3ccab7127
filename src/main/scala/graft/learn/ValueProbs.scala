package graft.learn

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.SentenceAnnots
import graft.nlp.AhoCorasick

/**
 * A6 global value-probability map — the reference's genValProbMap
 * (/root/reference/src/msa/AutoAnnotateNER.java:2475-2535): for every value string the
 * validated corpus tags as a target of type T, estimate P(occurrence of value is a T) =
 * goldCount / corpusOccurrences, then apply the reference's gate ladder:
 *
 *   total ≥ minGlobalCount ∧ prob ≥ minGlobalPrec  →  prob   (trusted prior)
 *   total ≥ minGlobalCount ∧ prob <  minGlobalPrec  →  −1    (veto: value is usually NOT a T)
 *   total <  minGlobalCount                          →  0     (neutral: too rare to judge)
 *
 * Scale shape: the gold value vocabulary is small by construction (validated slice) and
 * is broadcast as an Aho-Corasick automaton; corpus occurrence counting is one narrow
 * pass over sentences + one aggregation — never a join against the corpus by value.
 */
object ValueProbs {

  final case class Config(
      minGlobalCount: Long = 3,
      minGlobalPrec: Double = 0.7,
      // values with prior ≥ this enter the dictionary single-entity pass
      // (ref addSingleEntities, AutoAnnotateNER.java:2294-2460)
      dictThreshold: Double = 0.9)

  /**
   * Compute the prior table. `gold` needs (annotType, value) columns.
   * @return DataFrame(annot_type, value, gold_cnt, total_cnt, prior_bp) with prior_bp ∈
   *         {floor(prob·10000), −1, 0} (basis points — integer, engine-portable).
   */
  def compute(sentences: Dataset[SentenceAnnots], gold: DataFrame, cfg: Config = Config())(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val goldCnt = gold.select(col("annotType").as("annot_type"),
        lower(col("value")).as("value"))
      .groupBy("annot_type", "value").agg(count(lit(1)).as("gold_cnt"))
    val values = goldCnt.select("value").distinct().as[String].collect().sorted.toIndexedSeq
    if (values.isEmpty) return goldCnt.withColumn("total_cnt", lit(0L))
      .withColumn("prior_bp", lit(0L))
    val acB = spark.sparkContext.broadcast(
      AhoCorasick.build(values.map(_.split("\\s+").toSeq)))
    val valuesB = spark.sparkContext.broadcast(values)
    val occ = sentences.flatMap { s =>
        val stream = s.annots.filter(_.annotType == "Token").sortBy(_.begin)
          .map(_.value.toLowerCase).toIndexedSeq
        acB.value.findAll(stream).map { case (_, _, dictId) => valuesB.value(dictId) }
      }.groupByKey(identity).count().toDF("value", "total_cnt")
    goldCnt.join(occ, Seq("value"), "left")
      .withColumn("total_cnt",
        greatest(coalesce(col("total_cnt"), lit(0L)), col("gold_cnt")))
      .withColumn("prior_bp",
        when(col("total_cnt") < cfg.minGlobalCount, lit(0L))
          .when(col("gold_cnt") * 10000L / col("total_cnt") >= cfg.minGlobalPrec * 10000,
            floor(col("gold_cnt") * 10000L / col("total_cnt")).cast("long"))
          .otherwise(lit(-1L)))
      .select("annot_type", "value", "gold_cnt", "total_cnt", "prior_bp")
  }
}
