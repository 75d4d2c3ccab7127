package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Entity linking: blocking + Jaccard candidate scoring.
 *
 * The scale-first analog of the reference's value-probability dictionary pass and
 * duplicate propagation (/root/reference/src/msa/AutoAnnotateNER.java:2294-2535,
 * src/msa/pipeline/AnnotateDuplicate.java:106-270): distinct surface forms are grouped
 * into blocks by a cheap deterministic key, candidate pairs are generated ONLY within a
 * block (never a global cross join), and pairs at token-Jaccard ≥ τ become link edges
 * for connected-components canonicalization.
 *
 * Blocking key = (first alpha char, token count) of the normalized form — cheap, high
 * recall for near-identical names. A per-block candidate cap (analogous to the
 * reference's per-doc count cap 50, BestPatterns.java:441-443) bounds the quadratic
 * blow-up on mega-blocks; AQE skew-join splitting handles residual imbalance.
 */
object EntityLink {

  /** Normalize a surface form for linking: lowercase, strip non-alnum to single spaces.
    * (Scala twin of the codegen column expression below — used by tests/callers.) */
  val normalizeForm: String => String = s =>
    s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim

  /**
   * @param forms DataFrame with a single column `form` (distinct surface forms).
   * @return edges (src, dst) with jaccard ≥ minJaccard, src < dst lexicographically.
   */
  def candidateEdges(forms: DataFrame, minJaccard: Double = 0.5,
      maxBlockSize: Int = 1000)(implicit spark: SparkSession): DataFrame = {
    val normed = forms.select(col("form"))
      .distinct()
      // builtin (codegen) normalization — this runs over every distinct subject form
      // at canonicalization time, so no Scala UDF in the path
      .withColumn("norm", trim(regexp_replace(lower(col("form")), "[^a-z0-9]+", " ")))
      .filter(length(col("norm")) > 0)
      .withColumn("toks", array_distinct(split(col("norm"), " ")))
      .withColumn("block",
        concat(substring(col("norm"), 1, 1), lit(":"), size(col("toks"))))
    // cap pathological blocks (mega-entity guard)
    val capped = normed
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("block").orderBy("norm")))
      .filter(col("rn") <= maxBlockSize).drop("rn")

    val a = capped.select(col("form").as("src"), col("toks").as("ta"), col("block"))
    val b = capped.select(col("form").as("dst"), col("toks").as("tb"), col("block"))
    a.join(b, Seq("block"))
      .filter(col("src") < col("dst"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("uni", size(array_union(col("ta"), col("tb"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select("src", "dst", "jaccard")
  }
}
