package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Dev tool: per-stage wall-clock breakdown of the KG pipeline.
  * Usage: runMain graft.util.StageTimer [nPages] [cores] */
object StageTimer {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 300
    val cores = if (args.length > 1) args(1).toInt else 8
    implicit val spark: SparkSession = Sessions.local(cores, "stage-timer")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1fs")
      r
    }

    val gen = graft.testgen.CorpusGen.pages(n)
    val nTrain = math.min(n / 4, 200)
    val pages = spark.createDataset(gen.map(_.page)).repartition(cores * 2)
    val goldAnnots = spark.createDataset(
      gen.take(nTrain).flatMap(graft.testgen.CorpusGen.goldAnnotations))
    val gaz = graft.testgen.CorpusGen.gazetteer

    val annots = timed("annotate+persist") {
      val a = graft.nlp.Annotate.annotate(pages, gaz).persist(StorageLevel.MEMORY_AND_DISK)
      a.count(); a
    }
    val trainSents = timed("trainSents") {
      val goldUrls = goldAnnots.select($"url").distinct()
      val ta = annots.join(goldUrls, Seq("url"), "left_semi").as[graft.model.Annotation]
        .unionByName(goldAnnots)
      val ts = graft.mention.Sentences.fromAnnotations(ta).persist(StorageLevel.MEMORY_AND_DISK)
      ts.count(); ts
    }
    val patterns = timed("genMSA.learn") {
      graft.learn.GenMSA.learn(trainSents, Set("gold"), graft.learn.GenMSA.Config())
    }
    val learned = timed("patterns.collect") { patterns.collect().toSeq }
    println(s"[stage]   learned=${learned.size}")
    val matches = timed("applyPatterns") {
      graft.learn.PatternStats.applyPatterns(trainSents, learned,
        graft.learn.PatternStats.Config())
    }
    val finalPatterns = timed("score+collect") {
      val gold = goldAnnots.toDF().select($"url", $"annotType", $"begin", $"end")
      graft.learn.PatternStats.score(matches, gold, patterns,
        graft.learn.PatternStats.Config()).collect().toSeq
    }
    println(s"[stage]   final=${finalPatterns.size}")
    val allSents = timed("allSents+persist") {
      val s = graft.mention.Sentences.fromAnnotations(annots).persist(StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val mentions = timed("mentions") {
      val m = graft.extract.Extract.mergeAdjacent(
        graft.extract.Extract.mentions(allSents, finalPatterns,
          graft.learn.PatternStats.Config().matcher)).persist(StorageLevel.MEMORY_AND_DISK)
      m.count(); m
    }
    val rawTriples = timed("triples+persist") {
      val t = graft.extract.Extract.triples(allSents, mentions).persist(StorageLevel.MEMORY_AND_DISK)
      t.count(); t
    }
    val edges = timed("candidateEdges") {
      val e = graft.link.EntityLink.candidateEdges(
        rawTriples.select($"subj".as("form")), minJaccard = 0.6).select($"src", $"dst")
      e.count(); e
    }
    val comp = timed("connectedComponents") {
      graft.canon.ConnectedComponents.run(edges)
    }
    timed("canonical+write") {
      val canonical = rawTriples.toDF()
        .join(comp, rawTriples("subj") === comp("node"), "left")
        .withColumn("subj2", org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.col("component"),
          org.apache.spark.sql.functions.col("subj")))
        .select(org.apache.spark.sql.functions.col("subj2").as("subj"),
          $"pred", $"obj", $"url", $"begin", $"end", $"profileId", $"score")
        .as[graft.model.Triple]
      graft.sink.Materialize.write(canonical, "/tmp/stage_timer_out", 16)
    }
    spark.stop()
  }
}
