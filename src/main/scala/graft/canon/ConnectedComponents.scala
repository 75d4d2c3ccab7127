package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Connected components on a DataFrame edge list via alternating large-star / small-star
 * operations (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
 * the algorithm the north rule names for canonicalization). Converges in O(log n)
 * rounds; each round is two shuffles on the node id. Lineage is truncated with
 * localCheckpoint every round so the plan stays flat at 10^12-edge scale; convergence is
 * detected by an (order-insensitive) edge-set checksum.
 *
 * Replaces the reference's transitive duplicate propagation
 * (/root/reference/src/msa/pipeline/AnnotateDuplicate.java:106-270) with the standard
 * web-scale formulation. Node ids are strings (surface forms / entity keys); the
 * canonical representative of a component is its minimum node.
 *
 * large-star: for every node u, connect every neighbour v > u to m = min(Γ(u) ∪ {u}).
 * small-star: for every node u, connect every neighbour v ≤ u (and u) to
 *             m = min({v ∈ Γ(u): v ≤ u} ∪ {u}).
 */
object ConnectedComponents {

  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    sym.groupBy("u")
      .agg(collect_set(col("v")).as("nbrs"))
      .withColumn("m", least(col("u"), array_min(col("nbrs"))))
      .select(col("u"), col("m"), explode(col("nbrs")).as("v"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  private def smallStar(edges: DataFrame): DataFrame = {
    // orient edges so u ≥ v
    val oriented = edges
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    oriented.groupBy("u")
      .agg(collect_set(col("v")).as("nbrs"))
      .withColumn("m", array_min(col("nbrs")))
      .select(col("u"), col("m"), explode(concat(col("nbrs"), array(col("u")))).as("v"))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  private def checksum(edges: DataFrame): (Long, Long) = {
    // xor-fold (order-insensitive, overflow-free under ANSI mode)
    val r = edges.agg(count(lit(1)),
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** @param edges DataFrame with string columns (src, dst); undirected.
    * @param reliableDir when set, per-round lineage truncation goes through a
    *        write-read cycle on this (shared/HDFS) path instead of localCheckpoint —
    *        localCheckpoint blocks live on executors and are LOST on executor failure,
    *        which on a real cluster would abort a 20-round CC mid-flight; the
    *        write-read cycle survives executor loss and lets a rerun resume from the
    *        last completed round's edge set.
    * @return DataFrame(node STRING, component STRING = min node of its component). */
  def run(edges: DataFrame, maxIter: Int = 25, reliableDir: Option[String] = None)(
      implicit spark: SparkSession): DataFrame = {
    def truncate(df: DataFrame, round: Int): DataFrame = reliableDir match {
      case Some(dir) =>
        val p = s"$dir/cc_round_$round"
        df.write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      case None => df.localCheckpoint()
    }
    // Materialize the input edge list ONCE: `nodes` and the iteration both derive from
    // it, and without this the entire upstream DAG (e.g. a full near-dup pairs pipeline)
    // recomputes per consumer — observed 3× wall-clock on q28.
    val raw = truncate(edges.select(col("src").as("u"), col("dst").as("v")).distinct(), 0)
    val nodes = raw.select(col("u").as("n"))
      .union(raw.select(col("v").as("n"))).distinct()
    var e = raw.filter(col("u") =!= col("v"))
    var prev = checksum(e)
    var converged = e.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      e = truncate(smallStar(largeStar(e)), iter + 1)
      val cur = checksum(e)
      converged = cur == prev
      prev = cur
      iter += 1
    }
    // after convergence every non-root points directly at its component min
    val pointers = e.select(col("u").as("node"), col("v").as("component"))
      .groupBy("node").agg(min("component").as("component"))
    nodes.join(pointers, nodes("n") === pointers("node"), "left")
      .select(col("n").as("node"),
        coalesce(col("component"), col("n")).as("component"))
  }
}
