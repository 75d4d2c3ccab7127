package graft

// scratch diagnostics (run via Test/runMain graft.DebugMain); not a test suite
object DebugMain {
  def main(args: Array[String]): Unit = {
    implicit val spark = SparkTestBase.spark
    import spark.implicits._
    val all = graft.testgen.CorpusGen.pages(80)
    val train = all.take(30)
    val pages = spark.createDataset(all.map(_.page))
    val goldAnnots = spark.createDataset(train.flatMap(graft.testgen.CorpusGen.goldAnnotations))
    val r = graft.pipeline.KGPipeline.run(pages, goldAnnots, graft.testgen.CorpusGen.gazetteer)
    println("=== FINAL PATTERNS ===")
    r.finalPatterns.foreach(p => println(s"${p.profileId} ${p.annotType} score=${p.score} " +
      s"tp=${p.truePos} fp=${p.falsePos} :: ${p.toks.mkString(" ")}"))
    println("=== ALL LEARNED ===")
    r.patterns.collect().foreach(p => println(s"${p.profileId} ${p.annotType} rows=${p.rows} " +
      s":: ${p.toks.mkString(" ")}"))
    val goldTriples = all.flatMap(_.gold).map(t => (t.subj, t.pred, t.obj)).toSet
    val got = r.canonical.collect().map(t => (t.subj, t.pred, t.obj)).toSet
    val missing = goldTriples.diff(got)
    println(s"missing=${missing.size} byPred=${missing.groupBy(_._2).view.mapValues(_.size).toMap}")
    missing.take(10).foreach(println)
    val extras = got.diff(goldTriples)
    println(s"extras=${extras.size}"); extras.take(10).foreach(println)
    spark.stop()
  }
}
