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
    // cap pathological blocks (mega-entity guard); tie-break on the unique form so
    // colliding normalized forms keep a parallelism-invariant winner set
    val capped = normed
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("block")
          .orderBy("norm", "form")))
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

  /**
   * Embedding-scored variant (the north rule's "Jaccard/embedding candidate
   * scoring"): identical blocking over the normalized form, but within-block
   * candidate pairs are scored by quantized cosine of a per-form embedding instead of
   * token Jaccard — linking aliases whose context vectors agree even when the surface
   * tokens don't. Cosine is computed in integer basis points over quantized vectors
   * (same engine-portable formula as [[graft.sim.Similarity.cosineNearDupPairs]]), so
   * edges are bit-identical across engines and parallelism.
   *
   * Scale shape: identical to [[candidateEdges]] — within-block pairs only (never a
   * global cross join), mega-blocks capped, the self-join shuffles both sides on the
   * block key with identical subplans (ReusedExchange computes the quantize pass
   * once); residual imbalance goes to AQE skew splitting.
   *
   * @param forms (form: string, vec: array<float>) — one embedding per surface form
   *              (rows beyond the first per form are dropped deterministically).
   */
  def candidateEdgesEmbedding(forms: DataFrame, minCosBp: Long = 8000L,
      maxBlockSize: Int = 1000)(implicit spark: SparkSession): DataFrame = {
    import graft.sim.Similarity.{qdot, qnorm2, quantize}
    val normed = forms.select(col("form"), col("vec"))
      .groupBy(col("form")).agg(min_by(col("vec"), col("vec")).as("vec"))
      .withColumn("norm", trim(regexp_replace(lower(col("form")), "[^a-z0-9]+", " ")))
      .filter(length(col("norm")) > 0)
      .withColumn("qv", quantize(col("vec")))
      .withColumn("block",
        concat(substring(col("norm"), 1, 1), lit(":"),
          size(array_distinct(split(col("norm"), " ")))))
    val capped = normed
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("block")
          .orderBy("norm", "form"))) // form is distinct — deterministic under ties
      .filter(col("rn") <= maxBlockSize).drop("rn")
    val a = capped.select(col("form").as("src"), col("qv").as("va"), col("block"))
    val b = capped.select(col("form").as("dst"), col("qv").as("vb"), col("block"))
    a.join(b.hint("shuffle_hash"), Seq("block"))
      .filter(col("src") < col("dst"))
      .withColumn("cos_bp",
        floor(qdot(col("va"), col("vb")) * 10000L /
          ceil(sqrt(qnorm2(col("va")).cast("double") * qnorm2(col("vb")).cast("double")))
            .cast("long")))
      .filter(col("cos_bp") >= minCosBp)
      .select("src", "dst", "cos_bp")
  }
}
