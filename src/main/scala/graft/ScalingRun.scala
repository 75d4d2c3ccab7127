package graft

import org.apache.spark.sql.SparkSession

/**
 * One scaling measurement in one fresh JVM — the sandbox stand-in for one
 * `spark-submit --master <N-executor cluster>` run of the extraction job (BASELINE.md
 * measurement protocol; the north rule's N vs 4N executors evidence).
 *
 * Fresh-JVM-per-level matters: JIT state, code cache, and GC history otherwise leak
 * between the two parallelism levels and dominate the measurement (observed 2.5×
 * drift on identical work within one long-lived JVM).
 *
 * Usage: ScalingRun <cores> <nPages> [reps=3] [patternsFile]
 *   patternsFile: java-serialized Seq[Pattern] precomputed by the parent (graft.Bench)
 *   so every child of a bench run extracts with the IDENTICAL pattern set without
 *   paying the sample-scale learning job per child — learning is untimed either way,
 *   but a shorter setup narrows the wall-clock gap between the two timed windows of
 *   a scaling pair, which is what keeps both windows in the same host phase.
 * Prints: {"cores":N,"pages":P,"sec":best,"docs_per_sec":...,"triples":T,"hash":H}
 *
 * Warmup is TIME-bounded (≥10 s cumulative, ≥2 passes), not size-bounded: the round-5
 * rep logs showed the high-parallelism child finishing its fixed-size setup ~4× sooner
 * and opening the timed window while C2 compilation was still running — its rep1 read
 * systematically slow (15.7/26.1/42.7 s vs later-rep mins ~12-16 s at c16) while the
 * low-parallelism child's rep1 was often its fastest. Equal warmup WALL-CLOCK gives
 * both children the same JIT steady state.
 */
object ScalingRun {

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nPages = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 3
    val patternsFile = if (args.length > 3) Some(args(3)) else None

    implicit val spark: SparkSession = util.Sessions.local(cores, s"graft-scale-c$cores")

    val patterns: Seq[model.Pattern] = patternsFile match {
      case Some(path) =>
        val in = new java.io.ObjectInputStream(new java.io.FileInputStream(path))
        try in.readObject().asInstanceOf[Seq[model.Pattern]] finally in.close()
      case None =>
        // standalone usage: learn on the fixed gold sample (untimed; learning is
        // sample-scale by design — extraction is the corpus-scale path)
        import spark.implicits._
        val train = testgen.CorpusGen.pages(200)
        pipeline.KGPipeline.run(
          spark.createDataset(train.map(_.page)),
          spark.createDataset(train.flatMap(testgen.CorpusGen.goldAnnotations)),
          testgen.CorpusGen.gazetteer).finalPatterns
    }

    val pages = testgen.CorpusGen.pagesDS(nPages, partitions = 128)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pages.count() // materialize input outside every timed window

    // warmup: full job shape on a real slice, repeated until ≥10 s of cumulative wall
    // (and at least twice) — the extraction kernels must reach C2-compiled steady
    // state BEFORE the timed window opens, at every parallelism level (see scaladoc).
    // ONE persisted warmup corpus serves all passes.
    val warm = testgen.CorpusGen.pagesDS(30000, partitions = 32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    warm.count()
    val wt0 = System.nanoTime()
    var wpass = 0
    while (wpass < 2 || (System.nanoTime() - wt0) / 1e9 < 10.0) {
      pipeline.ExtractJob.run(warm, patterns,
        testgen.CorpusGen.gazetteer, s"/tmp/graft_scale_warmup_c$cores")
      wpass += 1
    }
    System.err.println(
      f"[scale] c$cores warmup $wpass passes ${(System.nanoTime() - wt0) / 1e9}%.1fs")
    warm.unpersist(blocking = false)

    var best = Double.MaxValue
    var result: pipeline.ExtractJob.Result = null
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    (1 to reps).foreach { i =>
      val (g0, t0) = (gcMillis, System.nanoTime())
      val r = pipeline.ExtractJob.run(pages, patterns,
        testgen.CorpusGen.gazetteer, s"/tmp/graft_scale_out_c${cores}_r$i")
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[scale] c$cores rep$i ${sec}%.2fs gc=${(gcMillis - g0) / 1000.0}%.1fs")
      if (sec < best) { best = sec; result = r }
    }

    println(f"""{"cores":$cores,"pages":$nPages,"sec":$best%.2f,""" +
      f""""docs_per_sec":${nPages / best}%.1f,"triples":${result.nTriples},""" +
      f""""triples_per_sec":${result.nTriples / best}%.1f,"hash":${result.outputHash}}""")
    spark.stop()
  }
}
