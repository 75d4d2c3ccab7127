package graft.testgen

import graft.model.{Annotation, Page, Triple}
import graft.nlp.{GazEntry, Gazetteer}

/**
 * Deterministic synthetic Common-Crawl-style corpus with gold triples known by
 * construction (FIXTURES.md §1: template grammar, seed 42, hot-domain and mega-entity
 * skew knobs). Used by the e2e P/R gate, the scaling benchmark, and the golden
 * byte-identity tests. No external data; fully reproducible from the seed.
 *
 * Every page is synthesized as HTML so the html→text→normalize path is exercised; the
 * gold side records (url, subj, pred, obj) plus the gold target span offsets in the
 * NORMALIZED text (so training annotations line up with tokenizer offsets).
 */
object CorpusGen {

  val entities: Vector[String] = Vector(
    "Acme Corp", "Globex Systems", "Initech Labs", "Umbrella Group", "Stark Industries",
    "Wayne Enterprises", "Tyrell Dynamics", "Cyberdyne Works", "Hooli Media", "Aperture Science",
    "Wonka Foods", "Oscorp Chemicals", "Gringotts Bank", "Duff Brewing", "Vandelay Imports",
    "Sirius Cybernetics", "Monsters Inc", "Gekko Holdings", "Nakatomi Trading", "Weyland Energy")

  val cities: Vector[String] = Vector(
    "Springfield", "Gotham", "Metropolis", "Rivertown", "Lakeside",
    "Hillcrest", "Brookfield", "Ashford", "Clearwater", "Maplewood")

  val fillerWords: Vector[String] = Vector(
    "the", "market", "report", "shows", "steady", "growth", "while", "analysts",
    "expect", "new", "products", "this", "quarter", "and", "customers", "respond",
    "well", "to", "recent", "changes")

  // relation templates: (pred, render(entity, obj), objKind)
  // two surface variants per relation so MSA has pairs to align
  def foundedSentences(e: String, year: String): Vector[String] = Vector(
    s"$e was founded in $year.",
    s"$e was founded in $year by local investors.")

  def hqSentences(e: String, city: String): Vector[String] = Vector(
    s"$e is headquartered in $city.",
    s"$e is headquartered in $city near the river.")

  def employsSentences(e: String, n: String): Vector[String] = Vector(
    s"$e employs $n people.",
    s"$e employs $n people worldwide.")

  final case class GoldSpan(url: String, annotType: String, begin: Int, end: Int, value: String)
  final case class GenPage(page: Page, gold: Vector[Triple], goldSpans: Vector[GoldSpan])

  def gazetteer: Gazetteer = Gazetteer.build(
    entities.map(e => GazEntry(e, "entity", "org")) ++
    cities.map(c => GazEntry(c, "city", "city")))

  /** Deterministic page set. Hot-domain skew: ~10% of pages share one domain.
    * Mega-entity skew: entity 0 appears on ~20% of pages. */
  def pages(n: Int, seed: Long = 42L): Vector[GenPage] =
    (0 until n).toVector.map(gen1(_, seed))

  /** Distributed generation: pages are built ON EXECUTORS (per-page seed → any
    * partitioning yields the identical corpus), so the bench input neither sits in
    * driver memory nor shuffles — the honest stand-in for scanning a real corpus. */
  def pagesDS(n: Int, partitions: Int, seed: Long = 42L)(
      implicit spark: org.apache.spark.sql.SparkSession):
      org.apache.spark.sql.Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).mapPartitions(_.map(i => gen1(i.toInt, seed).page))
  }

  /** One deterministic page (pure function of (i, seed)). */
  def gen1(i: Int, seed: Long = 42L): GenPage = {
    {
      val rnd = new java.util.Random(seed + i) // per-page seed → order-independent
      val entIdx = if (rnd.nextInt(5) == 0) 0 else rnd.nextInt(entities.size)
      val ent = entities(entIdx)
      val city = cities(rnd.nextInt(cities.size))
      val year = (1950 + rnd.nextInt(70)).toString
      val emps = (10 + rnd.nextInt(9000)).toString
      val domain = if (rnd.nextInt(10) == 0) "hot.example.com"
                   else s"site${rnd.nextInt(200)}.example.org"
      val url = s"https://$domain/page/$i"

      val variant = rnd.nextInt(2)
      val sents = Vector(
        filler(rnd), foundedSentences(ent, year)(variant), filler(rnd),
        hqSentences(ent, city)(variant), employsSentences(ent, emps)(variant), filler(rnd))
      val body = sents.mkString(" ")
      val html = s"<html><head><title>About $ent</title>" +
        s"<script>var x = 1;</script></head>" +
        s"<body><p>$body</p></body></html>"
      val text = graft.ingest.HtmlText.extractNormalized(
        html.getBytes(java.nio.charset.StandardCharsets.UTF_8)).get

      def spanOf(objStr: String, after: String): (Int, Int) = {
        val ctx = text.indexOf(after)
        val b = text.indexOf(objStr, if (ctx >= 0) ctx else 0)
        (b, b + objStr.length)
      }
      val (fb, fe) = spanOf(year, "was founded in")
      val (hb, he) = spanOf(city, "is headquartered in")
      val (eb, ee) = spanOf(emps, "employs")
      val subj = ent
      val gold = Vector(
        Triple(subj, "founded-year", year, url, fb, fe, -1L, 1.0, graft.model.Provenance.Gold),
        Triple(subj, "hq-city", city, url, hb, he, -1L, 1.0, graft.model.Provenance.Gold),
        Triple(subj, "employee-count", emps, url, eb, ee, -1L, 1.0, graft.model.Provenance.Gold))
      val spans = Vector(
        GoldSpan(url, "founded-year", fb, fe, year),
        GoldSpan(url, "hq-city", hb, he, city),
        GoldSpan(url, "employee-count", eb, ee, emps))
      GenPage(
        Page(url, java.sql.Timestamp.valueOf("2025-01-01 00:00:00"),
          html.getBytes(java.nio.charset.StandardCharsets.UTF_8), null, "en"),
        gold, spans)
    }
  }

  private def filler(rnd: java.util.Random): String = {
    val n = 4 + rnd.nextInt(6)
    val ws = (0 until n).map(_ => fillerWords(rnd.nextInt(fillerWords.size)))
    ws.head.capitalize + " " + ws.tail.mkString(" ") + "."
  }

  /** Gold target-span annotations (provenance "gold") for the training slice. */
  def goldAnnotations(gp: GenPage): Vector[Annotation] =
    gp.goldSpans.zipWithIndex.map { case (g, i) =>
      Annotation(g.url, 100000 + i, g.annotType, g.begin, g.end, g.value,
        Map.empty, "gold", 1.0)
    }
}
