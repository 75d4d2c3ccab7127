package graft

/** Poor-man's component profile of the per-page extraction kernel (driver-side,
  * single-threaded, steady-state): where does a page's budget actually go?
  * Run: sbt "Test/runMain graft.ProfileMain [nPages]" */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val gen = testgen.CorpusGen.pages(n)
    val gaz = testgen.CorpusGen.gazetteer
    // patterns: same seed-learned set the scaling job uses
    implicit val spark: org.apache.spark.sql.SparkSession =
      util.Sessions.local(4, "profile")
    val patterns = {
      import spark.implicits._
      val train = testgen.CorpusGen.pages(200)
      pipeline.KGPipeline.run(
        spark.createDataset(train.map(_.page)),
        spark.createDataset(train.flatMap(testgen.CorpusGen.goldAnnotations)),
        gaz).finalPatterns
    }
    val upgraded = patterns.map(p => p -> extract.Extract.toRelationPattern(p))
    val idx = extract.PatternMatcher.buildIndex(upgraded.collect { case (p, None) => p })
    val rel = extract.PatternMatcher.buildIndex(upgraded.collect { case (_, Some(r)) => r })

    def time[A](label: String)(f: => A): A = {
      // warm twice, time third
      f; f
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e6}%9.1f ms")
      r
    }

    val texts = time("html+normalize") {
      gen.flatMap(gp => Option(ingest.HtmlText.extract(gp.page.html))
        .flatMap(ingest.Normalize.normalize).map(t => (gp.page.url, t)))
    }
    time("tokenize (scan only)") {
      var acc = 0L
      texts.foreach { case (_, t) => acc += nlp.Tokenizer.scan(t).length }
      acc
    }
    time("annotate (tok+pos+sent+num)") {
      var acc = 0L
      texts.foreach { case (u, t) => acc += nlp.Tokenizer.annotate(u, t).length }
      acc
    }
    time("annotate + gazetteer") {
      var acc = 0L
      texts.foreach { case (u, t) =>
        val toks = nlp.Tokenizer.scan(t)
        acc += gaz.annotate(u, t, toks, firstId = 0).length
      }
      acc
    }
    time("full extractPage") {
      var acc = 0L
      texts.foreach { case (u, t) =>
        acc += streaming.StreamExtract.extractPage(u, t, gaz, idx, relIndex = rel).length
      }
      acc
    }
    // inside extractPage: annots → sentence groups → grids → matcher
    val sents = time("  sentence groups") {
      texts.map { case (u, t) =>
        val toks = nlp.Tokenizer.scan(t)
        val base = nlp.Tokenizer.annotate(u, t)
        val lookups = gaz.annotate(u, t, toks, firstId = base.length)
        mention.Sentences.group(u, base ++ lookups)
      }
    }
    val grids = time("  grids (build only)") {
      sents.map(_.map(s =>
        align.Grid.build(s.url, s.sentBegin, s.sentEnd, s.annots)))
    }
    time("  matcher over grids") {
      var acc = 0L
      grids.foreach(_.foreach { g =>
        acc += extract.PatternMatcher.matchAll(g, idx).length
      })
      acc
    }
    spark.stop()
  }
}
