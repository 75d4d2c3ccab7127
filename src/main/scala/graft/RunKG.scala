package graft

import org.apache.spark.sql.SparkSession

/**
 * spark-submit entry point for the full KG-construction job (north rule: "run via
 * spark-submit ... at two cluster sizes").
 *
 * Usage: RunKG [nPages] [outDir] [cores] [stageDir]
 * Synthesizes the deterministic corpus (seed 42), runs the full pipeline
 * (annotate → learn → gate → extract → link → canonicalize), materializes
 * subject-bucketed triples + checkpoints under outDir, prints one JSON metrics line.
 *
 * With a 4th arg `stageDir`, runs the RESUMABLE production path instead
 * ([[graft.pipeline.KGPipeline.runCheckpointed]]): every stage materializes through
 * [[graft.runtime.StageCheckpoint]] under stageDir with per-partition lineage +
 * counters, and a re-submitted run resumes at its first incomplete stage — the north
 * rule's long-corpus spark-submit shape.
 */
object RunKG {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toInt else 500
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_kg_out"
    val cores = if (args.length > 2) args(2).toInt
                else sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val stageDir = if (args.length > 3) Some(args(3)) else None
    implicit val spark: SparkSession = graft.util.Sessions.local(cores, "graft-kg")
    import spark.implicits._

    // live counters off the listener bus (Dataset.observe — zero extra jobs); the
    // persisted per-partition lineage lives in the checkpoint tables
    val metrics = new graft.runtime.MetricsCollector(spark)
    val t0 = System.nanoTime()
    val startedAt = new java.sql.Timestamp(System.currentTimeMillis())
    val nTrain = math.min(nPages / 4, 200)
    // corpus generated on executors (no driver materialization, no input shuffle)
    val pages = graft.testgen.CorpusGen.pagesDS(nPages, partitions = cores * 4)
    val goldAnnots = spark.createDataset(graft.testgen.CorpusGen.pages(nTrain)
      .flatMap(graft.testgen.CorpusGen.goldAnnotations))

    val cps = stageDir match {
      case Some(sd) =>
        // fingerprint = the full input/config identity of this synthetic run
        graft.pipeline.KGPipeline.runCheckpointed(
          pages, goldAnnots, graft.testgen.CorpusGen.gazetteer,
          sd, s"corpusgen-seed42-n$nPages-train$nTrain-v1", outDir)
      case None =>
        graft.pipeline.KGPipeline.runAndWrite(
          pages, goldAnnots, graft.testgen.CorpusGen.gazetteer, outDir)
    }
    import org.apache.spark.sql.functions.{coalesce, col, lit, max, sum}
    val fin = cps.agg(coalesce(sum("rows_out"), lit(0L)),
      max(col("completed_at") >= lit(startedAt))).head()
    val rows = fin.getLong(0)
    // On a fully-resumed run no bucket was rewritten this invocation, the observe
    // node never executes (documented Metrics contract) and the metric can never
    // arrive — don't stall the full await timeout waiting for it.
    val wroteThisRun = !fin.isNullAt(1) && fin.getBoolean(1)
    val sec = (System.nanoTime() - t0) / 1e9
    val mode = if (stageDir.isDefined) "kg-checkpointed" else "kg"
    val live = (if (wroteThisRun)
        metrics.await(graft.pipeline.KGPipeline.CanonicalMetric, 15000L)
      else None)
      .map(m => s""","observed":{"triples":${m("triples")},""" +
        s""""subjects_approx":${m("subjects_approx")},""" +
        s""""docs_approx":${m("docs_approx")}}""")
      .getOrElse("")
    println(f"""{"job":"$mode","pages":$nPages,"triples":$rows,"sec":$sec%.2f,""" +
      f""""docs_per_sec":${nPages / sec}%.1f,"triples_per_sec":${rows / sec}%.1f,"cores":$cores""" +
      live + "}")
    spark.stop()
  }
}
