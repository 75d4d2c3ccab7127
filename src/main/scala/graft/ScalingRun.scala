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
 * Usage: ScalingRun <cores> <nPages> [reps=2]
 * Prints: {"cores":N,"pages":P,"sec":best,"docs_per_sec":...,"triples":T,"hash":H}
 * A small untimed warmup run JIT-compiles the kernels before measurement.
 */
object ScalingRun {

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nPages = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 3

    implicit val spark: SparkSession = util.Sessions.local(cores, s"graft-scale-c$cores")

    // learn patterns on the fixed gold sample (untimed; learning is sample-scale by design)
    val patterns = {
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

    // warmup: full job shape on a real slice, twice — the extraction kernels must reach
    // C2-compiled steady state BEFORE the timed window (an interpreted first pass is
    // ~30× slower; a token 2k-page warmup demonstrably does not trigger compilation of
    // all hot loops). ONE persisted warmup corpus serves both passes — regenerating
    // it per pass was pure fixed overhead in every child's wall-clock.
    val warm = testgen.CorpusGen.pagesDS(30000, partitions = 32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    warm.count()
    (1 to 2).foreach { _ =>
      pipeline.ExtractJob.run(warm, patterns,
        testgen.CorpusGen.gazetteer, s"/tmp/graft_scale_warmup_c$cores")
    }
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
