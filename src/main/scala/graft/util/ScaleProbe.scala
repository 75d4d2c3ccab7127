package graft.util

import org.apache.spark.sql.SparkSession

/** Diagnostic main: bisect the two-parallelism scaling anomaly by timing each stage of
  * the extraction job separately at several core counts, with GC time deltas. */
object ScaleProbe {

  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toInt else 30000
    val coreList = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(8, 32, 8)

    // learn patterns once
    val patterns = {
      implicit val s: SparkSession = Sessions.local(8, "probe-learn")
      import s.implicits._
      val train = graft.testgen.CorpusGen.pages(200)
      val r = graft.pipeline.KGPipeline.run(
        s.createDataset(train.map(_.page)),
        s.createDataset(train.flatMap(graft.testgen.CorpusGen.goldAnnotations)),
        graft.testgen.CorpusGen.gazetteer)
      val p = r.finalPatterns
      s.stop()
      p
    }

    coreList.foreach { cores =>
      implicit val s: SparkSession = Sessions.local(cores, s"probe-c$cores")
      import s.implicits._
      val pages = graft.testgen.CorpusGen.pagesDS(nPages, partitions = 128)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pages.count()

      def timed(label: String)(f: => Unit): Unit = {
        val (g0, t0) = (gcMillis, System.nanoTime())
        f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] c$cores $label%-18s ${sec}%7.2fs  gc=${(gcMillis - g0) / 1000.0}%5.1fs")
      }

      val gazB = s.sparkContext.broadcast(graft.testgen.CorpusGen.gazetteer)
      val idxB = s.sparkContext.broadcast(graft.extract.PatternMatcher.buildIndex(patterns))

      timed("normalize-only") {
        pages.mapPartitions { it =>
          it.map { p =>
            val raw = if (p.text != null && p.text.nonEmpty) Option(p.text)
                      else Option(graft.ingest.HtmlText.extract(p.html))
            raw.flatMap(graft.ingest.Normalize.normalize).map(_.length).getOrElse(0)
          }
        }.queryExecution.toRdd.count()
      }
      timed("annotate-only") {
        pages.mapPartitions { it =>
          val g = gazB.value
          it.map { p =>
            val raw = if (p.text != null && p.text.nonEmpty) Option(p.text)
                      else Option(graft.ingest.HtmlText.extract(p.html))
            raw.flatMap(graft.ingest.Normalize.normalize)
              .map(t => graft.nlp.Annotate.annotateOne(p.url, t, g).length).getOrElse(0)
          }
        }.queryExecution.toRdd.count()
      }
      timed("extract-narrow") {
        pages.mapPartitions { it =>
          val (g, idx) = (gazB.value, idxB.value)
          it.flatMap { p =>
            val raw = if (p.text != null && p.text.nonEmpty) Option(p.text)
                      else Option(graft.ingest.HtmlText.extract(p.html))
            raw.flatMap(graft.ingest.Normalize.normalize).toVector.flatMap { t =>
              graft.streaming.StreamExtract.extractPage(p.url, t, g, idx)
            }
          }
        }.queryExecution.toRdd.count()
      }
      timed("full-job") {
        graft.pipeline.ExtractJob.run(pages, patterns,
          graft.testgen.CorpusGen.gazetteer, s"/tmp/probe_out_c$cores")
      }
      s.stop()
    }
  }
}
