package graft

import org.apache.spark.sql.SparkSession

/**
 * Standalone scorer CLI — the spark-submit analog of the reference's
 * EvalProfilesSimple main (/root/reference/src/msa/EvalProfilesSimple.java:21-170).
 *
 * Usage: runMain graft.EvalRun <predictedParquet> <goldParquet> <annotationsParquet>
 *        [toleranceChars=0] [cores=8]
 *
 * predicted/gold need (url, annotType, begin, end); annotations is the corpus
 * annotation table whose Token rows define the token-level units. Prints one line per
 * (annot_type × level) with tp/fp/fn and basis-point P/R/F1, ALL rollup last.
 */
object EvalRun {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: EvalRun <predicted.parquet> <gold.parquet> <annotations.parquet> [tol] [cores]")
    val tol = if (args.length > 3) args(3).toInt else 0
    val cores = if (args.length > 4) args(4).toInt else 8
    implicit val spark: SparkSession = util.Sessions.local(cores, "graft-eval")
    import org.apache.spark.sql.functions._
    val predicted = spark.read.parquet(args(0))
    val gold = spark.read.parquet(args(1))
    val tokens = spark.read.parquet(args(2))
      .filter(col("annotType") === "Token")
      .select("url", "begin", "end")
    val out = learn.Eval.score(predicted, gold, tokens, tol)
      .orderBy(col("level"), when(col("annot_type") === "ALL", 1).otherwise(0),
        col("annot_type"))
      .collect()
    out.foreach { r =>
      println(f"${r.getAs[String]("level")}%-7s ${r.getAs[String]("annot_type")}%-20s " +
        f"tp=${r.getAs[Long]("tp")}%-6d fp=${r.getAs[Long]("fp")}%-6d " +
        f"fn=${r.getAs[Long]("fn")}%-6d P=${r.getAs[Long]("prec_bp") / 100.0}%6.2f%% " +
        f"R=${r.getAs[Long]("rec_bp") / 100.0}%6.2f%% " +
        f"F1=${r.getAs[Long]("f1_bp") / 100.0}%6.2f%%")
    }
    spark.stop()
  }
}
