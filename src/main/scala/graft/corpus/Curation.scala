package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/**
 * Corpus-curation operators a web-scale training-data pipeline runs between dedup and
 * materialization: cross-document boilerplate-line removal, deterministic stratified
 * sampling, per-domain quota capping, and token-budget mixture packing.
 *
 * These generalize the reference's per-document cleanup pass
 * (/root/reference/src/util/CleanDocs.java:16-60) to the corpus-level curation steps a
 * Common-Crawl-style pipeline needs before training. All randomness is md5-derived
 * (engine-portable, parallelism-invariant) per the repo-wide determinism rule — never
 * `rand()`, never partition-dependent ids.
 */
object Curation {

  /** md5-derived 60-bit uniform hash of a salted key — the portable "random" source.
    * Identical in DuckDB as CAST(concat('0x', substr(md5(salt || key), 1, 15)) AS BIGINT). */
  private def u60(salt: String, key: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10).cast("long")

  /**
   * Cross-document boilerplate-line removal (the CCNet/RefinedWeb idiom): a line that
   * occurs in >= `minDocs` DISTINCT documents is boilerplate (cookie banners, footers,
   * nav chrome) and is dropped from every document; per-doc audit counts plus the md5
   * of the cleaned text (surviving lines re-joined in original order) are emitted.
   *
   * Scale shape: one distinct + one count shuffle keyed by the line string to build the
   * frequency table; the boilerplate set (lines crossing a corpus-frequency threshold)
   * is SMALL by construction — millions of distinct strings at most, not corpus-sized —
   * so the removal anti-join broadcasts. The rebuild groups by doc_id (even spread; no
   * hot keys) and sorts each doc's surviving lines by original position INSIDE the
   * aggregated array (`array_sort` over (pos, line) structs), so output never depends
   * on shuffle arrival order — byte-identical at any parallelism.
   */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Long): DataFrame = {
    val lines = df.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val boiler = lines.select("line", "doc_id").distinct()
      .groupBy("line").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("line")
    val rebuilt = lines.join(boiler, Seq("line"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s("line")), "\n").as("clean_text"))
    df.select(col(idCol).as("doc_id"),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        md5(coalesce(col("clean_text"), lit(""))).as("clean_md5"))
  }

  /**
   * Deterministic stratified sampling: a row is kept iff
   * `u60("smp:" + id) mod 10000 < rateBp(stratum)` — the per-stratum downsampling step
   * of corpus mixing (e.g. keep 25% of English, 80% of low-resource languages).
   *
   * Pure narrow filter — ZERO shuffle, codegen'd, pushes the stratum column read into
   * the scan; the same row is kept at every parallelism and on every engine (the md5
   * hash is the randomness, not `rand()`), so reruns and resumes see one fixed sample.
   */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      ratesBp: Map[String, Long], defaultBp: Long): DataFrame = {
    val rate = ratesBp.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultBp)) { case (acc, (s, r)) =>
        when(col(strataCol) === s, lit(r)).otherwise(acc)
      }
    df.withColumn("sample_bp", pmod(u60("smp:", col(idCol)), lit(10000L)))
      .filter(col("sample_bp") < rate)
  }

  /**
   * Per-domain quota capping: keep at most `k` documents per domain, highest-priority
   * first (priority desc, id asc — fully deterministic tie-break). The standard
   * hot-domain guard of a crawl pipeline: no single site may dominate the corpus.
   *
   * Plans as a partitioned window with WindowGroupLimit pushdown (rank <= k prunes
   * each group to k rows BEFORE the sort completes — no full per-domain sort at scale);
   * skew-safe because a mega-domain still only materializes k winners per partition.
   */
  def domainQuota(df: DataFrame, idCol: String, domainCol: String,
      priorityCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(domainCol).orderBy(desc(priorityCol), asc(idCol))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /**
   * Token-budget mixture packing: per stratum, admit documents in priority order
   * (token count desc, id asc) while the running token total stays within
   * `budgetTokens(stratum)` — how a training mix is packed to per-language/per-source
   * token budgets. A document that would overflow the budget is dropped, as is
   * everything after it in priority order (contiguous prefix, so the admitted set is
   * insensitive to how ties beyond the boundary shuffle).
   *
   * One partitioned cumulative-sum window per stratum; strata are few (languages,
   * sources), rows per stratum are corpus-scale — the window partitions by stratum
   * only, so for very few strata at 100 TB, pre-aggregate per (stratum, priority
   * bucket) or range-partition by the window key; at the language/source cardinality
   * this targets, AQE handles the partition sizing.
   */
  def tokenBudgetMix(df: DataFrame, idCol: String, strataCol: String, textCol: String,
      budgetTokens: Map[String, Long], defaultBudget: Long): DataFrame = {
    val budget = budgetTokens.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultBudget)) { case (acc, (s, b)) =>
        when(col(strataCol) === s, lit(b)).otherwise(acc)
      }
    val w = Window.partitionBy(strataCol).orderBy(desc("n_toks"), asc(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // An existing n_toks column is trusted (the pipeline computes ONE post-redaction
    // count that quota and budget must share); otherwise derive it from the single
    // canonical tokenizer definition — never a re-spelled copy of that expression.
    val withToks =
      if (df.columns.contains("n_toks")) df
      else df.withColumn("n_toks", TextAnalysis.wsTokenCount(col(textCol)))
    withToks
      .withColumn("cum_toks", sum(col("n_toks")).over(w))
      .filter(col("cum_toks") <= budget)
  }
}
