package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.{Pattern, Triple}
import graft.sink.{Materialize, Stores}
import graft.sources.Ingest

/** S4/S5 importers, S7 upsert sink, and the checkpointed resumable triple write. */
class SourcesSinksSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_ss").toString

  test("S4: text-file corpus import normalizes at import (trim + strip \\r)") {
    import spark.implicits._
    val dir = tmpDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.txt"),
      "  Hello world.\r\nSecond line.\r\n ")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b.txt"),
      "Another doc.")
    val pages = Ingest.fromTextFiles(dir).collect().sortBy(_.url)
    assert(pages.length === 2)
    val a = pages.find(_.url.endsWith("a.txt")).get
    assert(a.text === "Hello world.\nSecond line.", "trim+strip-\\r not applied")
    assert(!a.text.contains("\r"))
  }

  test("S5: CoNLL parse — tokens, sentences, IOB entity spans, exact offsets") {
    val raw =
      """-DOCSTART- -X- -X- O
        |
        |EU NNP B-NP B-ORG
        |rejects VBZ B-VP O
        |German JJ B-NP B-MISC
        |call NN I-NP O
        |. . O O
        |
        |Peter NNP B-NP B-PER
        |Blackburn NNP I-NP I-PER
        |""".stripMargin
    val docs = Ingest.parseFile("f.txt", raw)
    assert(docs.length === 1)
    val d = docs.head
    assert(d.text === "EU rejects German call . Peter Blackburn")
    val ents = d.annots.filter(a => a.provenance == "gold")
    assert(ents.map(a => (a.annotType, a.value)).toSet ===
      Set(("ORG", "EU"), ("MISC", "German"), ("PER", "Peter Blackburn")))
    // offsets must be exact against the reconstructed text
    ents.foreach(a => assert(d.text.substring(a.begin, a.end) === a.value))
    val sents = d.annots.filter(_.annotType == "Sentence")
    assert(sents.length === 2)
    assert(d.annots.count(_.annotType == "Token") === 7)
  }

  test("S7: pattern upsert — same key updates stats, new keys append") {
    import spark.implicits._
    val path = tmpDir() + "/patterns"
    def p(id: Long, tok: String, tp: Long) =
      Pattern(id, Seq(tok, ":target"), "t", 0, "msa", 0.5, tp, 0, 1)
    Stores.upsertPatterns(spark.createDataset(Seq(p(1, ":a", 10), p(2, ":b", 20))), path)
    // second generation: :a re-learned with new stats, :c is new
    val after = Stores.upsertPatterns(
      spark.createDataset(Seq(p(9, ":a", 99), p(3, ":c", 30))), path)
      .collect().map(x => (x.toks.head, x.truePos)).toMap
    assert(after === Map(":a" -> 99L, ":b" -> 20L, ":c" -> 30L))
  }

  test("S6/S8: annotation and match sinks append, partition-pruned by annotType") {
    import spark.implicits._
    val dir = tmpDir()
    val a = graft.model.Annotation("u1", 0, "Token", 0, 3, "abc", Map("kind" -> "word"), "t", 1.0)
    val b = a.copy(annotId = 1, annotType = "Sentence")
    Stores.appendAnnotations(spark.createDataset(Seq(a)), s"$dir/annots")
    Stores.appendAnnotations(spark.createDataset(Seq(b)), s"$dir/annots") // append, not overwrite
    val back = spark.read.parquet(s"$dir/annots")
    assert(back.count() === 2)
    assert(new java.io.File(s"$dir/annots/annotType=Token").exists,
      "annotType partitioning missing")
    Stores.appendMatches(spark.createDataset(Seq(
      graft.model.PatternMatch(1L, 1L, "u1", 0, 3, "abc"))), s"$dir/matches")
    assert(spark.read.parquet(s"$dir/matches").count() === 1)
  }

  test("P4: annotation value capped at 500 chars (ref GateBatch value cap)") {
    val long = "x" * 1200
    assert(graft.nlp.Tokenizer.safeValue(long, 0, 1200).length === 500)
    val annots = graft.nlp.Tokenizer.annotate("u", long)
    assert(annots.filter(_.annotType == "Token").forall(_.value.length <= 500))
  }

  test("P7 cleanDocs: trim + whitespace-collapse rewrite (golden)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "  hello   world \t two\n\nlines  "),
      (2L, "already clean"),
      (3L, "   "),
      (4L, "\t\ntab and newline edged\n\t")).toDF("doc_id", "text")
    val got = graft.ingest.Normalize.cleanDocs(docs, "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) === "hello world two lines")
    assert(got(2L) === "already clean")
    assert(got(3L) === "")
    assert(got(4L) === "tab and newline edged")
    // trim-only mode reproduces the reference's exact CleanDocs transform
    // (String.trim strips every char <= U+0020 — tabs and newlines too, which
    // Spark's space-only trim() would have left in place)
    val trimOnly = graft.ingest.Normalize.cleanDocs(docs, "text",
      collapseWhitespace = false).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(trimOnly(1L) === "hello   world \t two\n\nlines")
    assert(trimOnly(4L) === "tab and newline edged")
  }

  test("precedence dedup: validated supersedes auto at the same site, whatever the score") {
    import spark.implicits._
    val rows = Seq(
      // same site (url, pred, begin, end): auto has the HIGHER score but validated wins
      ("AutoCo", "founded", "1999", "u1", 10, 14, 7L, 0.99, "msa-ie"),
      ("GoldCo", "founded", "1998", "u1", 10, 14, -1L, 0.50, "validation-tool"),
      // equal provenance rank: best score wins, atomically
      ("A", "ceo", "alice", "u2", 0, 5, 1L, 0.6, "msa-ie"),
      ("B", "ceo", "bob", "u2", 0, 5, 2L, 0.9, "msa-ie"),
      // unlisted provenance ranks weakest
      ("C", "hq", "nyc", "u3", 0, 3, 3L, 1.0, "mystery"),
      ("D", "hq", "sfo", "u3", 0, 3, 4L, 0.1, "msa-ie"))
      .toDF("subj", "pred", "obj", "url", "begin", "end", "profileId", "score",
        "provenance")
    val got = Materialize.dedupPrecedence(rows).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[String]("subj"),
        r.getAs[String]("obj"), r.getAs[String]("provenance"))).toSet
    assert(got === Set(
      ("u1", "GoldCo", "1998", "validation-tool"),
      ("u2", "B", "bob", "msa-ie"),
      ("u3", "D", "sfo", "msa-ie")))
  }

  test("write: validated evidence supersedes auto through the FULL sink path") {
    import spark.implicits._
    import graft.model.Provenance
    val path = tmpDir() + "/prec_write"
    val triples = spark.createDataset(Seq(
      // same site, auto scores higher — the validated row must still win the site
      Triple("AutoCo", "founded", "1999", "u1", 10, 14, 7L, 0.99, Provenance.Auto),
      Triple("GoldCo", "founded", "1998", "u1", 10, 14, -1L, 0.50, Provenance.Gold),
      // same (subj,pred,obj) at two sites, gold + auto: surviving evidence row
      // must be the validated one (atomic winner, not a score argmax)
      Triple("Acme", "hq", "Gotham", "u2", 0, 6, 9L, 0.97, Provenance.Auto),
      Triple("Acme", "hq", "Gotham", "u3", 5, 11, -1L, 0.60, Provenance.Gold)))
    Materialize.write(triples, path, 4)
    val back = spark.read.parquet(path)
      .select("subj", "pred", "obj", "url", "score", "provenance").collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(3), r.getString(5))).toSet
    assert(back === Set(
      ("GoldCo", "1998", "u1", Provenance.Gold),
      ("Acme", "Gotham", "u3", Provenance.Gold)),
      s"precedence did not survive the sink path: $back")
  }

  test("element-repeat ordinals per (url, subj, pred) slot in document order") {
    import spark.implicits._
    val rows = Seq(
      ("S", "founder", "x", "u1", 5, 6, 1L, 1.0),
      ("S", "founder", "y", "u1", 2, 3, 1L, 1.0),
      ("S", "other", "z", "u1", 0, 1, 1L, 1.0))
      .toDF("subj", "pred", "obj", "url", "begin", "end", "profileId", "score")
    val got = Materialize.withElementRepeat(rows).collect()
      .map(r => (r.getAs[String]("obj"), r.getAs[Int]("element_repeat"))).toSet
    assert(got === Set(("y", 0), ("x", 1), ("z", 0)))
  }

  test("resumable materialize on an EMPTY triple set returns an empty checkpoint table") {
    import spark.implicits._
    val path = tmpDir() + "/empty_triples"
    val cps = Materialize.writeResumable(spark.emptyDataset[Triple], path, 4)
    assert(cps.count() === 0) // no PATH_NOT_FOUND; schema present
    assert(cps.columns.contains("bucket") && cps.columns.contains("output_hash"))
  }

  test("resumable materialize: only pending buckets are written on resume") {
    import spark.implicits._
    val path = tmpDir() + "/triples"
    val triples = spark.createDataset((0 until 200).map(i =>
      Triple(s"subj$i", "p", s"o$i", s"https://x/$i", 0, 1, 1L, 1.0)))
    val nB = 8

    val cps1 = Materialize.writeResumable(triples, path, nB)
    assert(cps1.count() === nB)
    val total = spark.read.parquet(path).count()
    assert(total === 200)

    // simulate a crash that lost 3 buckets' checkpoints (their data gone too)
    val lost = Seq(1, 4, 6)
    val cpPath = path + "_checkpoints"
    val kept = spark.read.parquet(cpPath).filter(!col("bucket").isin(lost: _*))
      .persist(); kept.count()
    kept.write.mode("overwrite").parquet(cpPath); kept.unpersist()
    lost.foreach { b =>
      val d = new java.io.File(s"$path/bucket=$b")
      if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
    }
    assert(spark.read.parquet(path).count() < 200)

    // resume: pendingBuckets sees exactly the lost buckets; write restores them
    val bucketed = Materialize.withBucket(Materialize.dedup(triples), nB)
    val pending = Materialize.pendingBuckets(bucketed, cpPath)
      .collect().map(_.getInt(0)).sorted
    assert(pending.toSeq === lost)
    Materialize.writeResumable(triples, path, nB)
    assert(spark.read.parquet(path).count() === 200)
    assert(spark.read.parquet(cpPath).count() === nB)

    // idempotent: a third call with a complete checkpoint table writes nothing new
    val mtimes = new java.io.File(path).listFiles().map(f => f.getName -> f.lastModified).toMap
    Materialize.writeResumable(triples, path, nB)
    val mtimes2 = new java.io.File(path).listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(mtimes === mtimes2, "complete checkpoint still rewrote partitions")
  }

  test("writeResumable: a committed bucket whose DATA vanished is rewritten") {
    import spark.implicits._
    val path = tmpDir() + "/triples"
    val triples = spark.createDataset((0 until 200).map(i =>
      Triple(s"subj$i", "p", s"o$i", s"https://x/$i", 0, 1, 1L, 1.0)))
    val nB = 8
    Materialize.writeResumable(triples, path, nB)
    assert(spark.read.parquet(path).count() === 200)
    // external data loss: bucket 2's partition disappears, its checkpoint row stays —
    // the checkpoint must be trusted only as far as the data it describes
    val d = new java.io.File(s"$path/bucket=2")
    d.listFiles().foreach(_.delete()); d.delete()
    assert(spark.read.parquet(path).count() < 200)
    val cps = Materialize.writeResumable(triples, path, nB)
    assert(spark.read.parquet(path).count() === 200, "vanished bucket not rewritten")
    // returned view: ONE row per bucket (no double count); file keeps the audit trail
    assert(cps.count() === nB)
    assert(cps.agg(org.apache.spark.sql.functions.sum("rows_out")).head.getLong(0) === 200L)
    assert(spark.read.parquet(path + "_checkpoints").count() === nB + 1)
  }

  test("compact: file count drops, content identical, resume lineage intact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val path = tmpDir() + "/triples"
    val nB = 4
    // fragment the store: three incremental writes into the same buckets
    (0 until 3).foreach { g =>
      val triples = spark.createDataset((0 until 60).map(i =>
        Triple(s"subj${g * 60 + i}", "p", s"o${g * 60 + i}",
          s"https://x/${g * 60 + i}", 0, 1, 1L, 1.0)))
      Materialize.withBucket(triples, nB)
        .write.mode("append").partitionBy("bucket").parquet(path)
    }
    def dataFiles(b: Int): Int =
      new java.io.File(s"$path/bucket=$b").listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    def contentHash(): Long = spark.read.parquet(path)
      .agg(expr("bit_xor(xxhash64(subj, pred, obj, url, begin, end))"))
      .head.getLong(0)
    val filesBefore = (0 until nB).map(dataFiles)
    assert(filesBefore.forall(_ >= 3), s"fixture not fragmented: $filesBefore")
    val hashBefore = contentHash()
    // seed a lineage table so compaction's appended rows join an existing trail
    spark.read.parquet(path).groupBy("bucket")
      .agg(count(lit(1)).as("rows_out"),
        expr("bit_xor(xxhash64(subj, pred, obj))").as("output_hash"))
      .withColumn("stage", lit("materialize"))
      .withColumn("completed_at", current_timestamp())
      .write.mode("overwrite").parquet(path + "_checkpoints")

    val out = Materialize.compact(path, targetFileBytes = 1L << 30)(spark)
      .collect().map(r => r.getInt(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(out.keySet == (0 until nB).toSet, s"not all buckets rewritten: $out")
    (0 until nB).foreach { b =>
      val (fb, fa, _) = out(b)
      assert(fb >= 3 && fa == 1, s"bucket $b: $fb -> $fa files")
      assert(dataFiles(b) == 1)
    }
    assert(contentHash() === hashBefore, "compaction changed the store contents")
    assert(spark.read.parquet(path).count() === 180)
    // lineage: one appended compact row per bucket; resume sees nothing pending
    val cpsTbl = spark.read.parquet(path + "_checkpoints")
    assert(cpsTbl.filter(col("stage") === "compact").count() === nB.toLong)
    val pending = Materialize.pendingBuckets(
      Materialize.withBucket(spark.read.parquet(path).drop("bucket")
        .as[Triple], nB), path + "_checkpoints", Some(path))
    assert(pending.count() === 0L, "compaction broke resume lineage")
    // idempotence: an already-packed store rewrites nothing
    assert(Materialize.compact(path, targetFileBytes = 1L << 30)(spark).count() === 0L)
  }

  test("compact: recovers a bucket stranded mid-swap by a crash (no data loss)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val path = tmpDir() + "/triples_crash"
    val nB = 4
    (0 until 2).foreach { g =>
      val triples = spark.createDataset((0 until 60).map(i =>
        Triple(s"subj${g * 60 + i}", "p", s"o${g * 60 + i}",
          s"https://x/${g * 60 + i}", 0, 1, 1L, 1.0)))
      Materialize.withBucket(triples, nB)
        .write.mode("append").partitionBy("bucket").parquet(path)
    }
    def contentHash(): Long = spark.read.parquet(path)
      .agg(expr("bit_xor(xxhash64(subj, pred, obj, url, begin, end))"))
      .head.getLong(0)
    val hashBefore = contentHash()
    def mv(from: String, to: String): Unit = {
      val f = new java.io.File(from); val t = new java.io.File(to)
      t.getParentFile.mkdirs()
      assert(f.renameTo(t), s"fixture move failed: $from -> $to")
    }
    // crash #1: bucket=1 staged to trash, tmp never swapped in (live dir GONE,
    // only the trash copy survives)
    mv(s"$path/bucket=1", s"$path/_compact_trash/bucket=1")
    // crash #2: bucket=2 staged to trash AND deleted after the tmp copy was
    // verified, but the tmp->live rename never happened (only the tmp copy
    // survives). Simulated by moving the live dir to tmp.
    mv(s"$path/bucket=2", s"$path/_compact_tmp/bucket=2")
    // plus a STALE tmp leftover for a bucket whose live dir is intact — must be
    // discarded (cleaned), never restored over live data
    spark.read.parquet(s"$path/bucket=0").limit(1)
      .write.parquet(s"$path/_compact_tmp/bucket=0")
    assert(spark.read.parquet(path).count() < 120, "fixture did not strand buckets")

    // a fresh compact() run must FIRST restore the stranded buckets, then proceed
    val out = Materialize.compact(path, targetFileBytes = 1L << 30)(spark)
    assert(contentHash() === hashBefore,
      "crash recovery lost or duplicated rows")
    assert(spark.read.parquet(path).count() === 120)
    assert(!new java.io.File(s"$path/_compact_tmp").exists())
    assert(!new java.io.File(s"$path/_compact_trash").exists())
    // recovered buckets are again eligible for (and got) compaction this run
    assert(out.filter(col("bucket").isin(1, 2)).count() === 2L)
  }

  test("TripleStore: resumable write + vanished-bucket rewrite through ONE manifest path") {
    import spark.implicits._
    import graft.sink.TripleStore
    val ts = new TripleStore(tmpDir() + "/tstore", nBuckets = 4)
    val triples = spark.createDataset((0 until 200).map(i =>
      Triple(s"subj$i", "p", s"o$i", s"https://x/$i", 0, 1, 1L, 1.0)))
    ts.writeResumable(triples)
    assert(ts.read().count() === 200)
    assert(ts.committedBuckets() === Set(0, 1, 2, 3))
    val v1 = ts.store.latestVersion.get
    // resume with a complete store: nothing staged, no new version
    ts.writeResumable(triples)
    assert(ts.store.latestVersion.get === v1, "no-op resume committed a snapshot")
    // vanished data: delete one bucket's staged dir → that bucket (only) rewrites
    val victim = ts.store.snapshot(v1).head
    def rmTree(d: java.io.File): Unit = {
      Option(d.listFiles()).foreach(_.foreach(rmTree)); d.delete()
    }
    rmTree(new java.io.File(ts.store.stagePath(victim)))
    assert(ts.read().count() < 200)
    ts.writeResumable(triples)
    assert(ts.read().count() === 200, "vanished bucket not rewritten")
    val manifest = ts.store.snapshot(ts.store.latestVersion.get)
    assert(manifest.size === 4 && !manifest.contains(victim),
      s"stale entry not replaced: $manifest")
    // lineage reader view: one latest row per bucket, rows sum to the store
    val lin = ts.lineage()
    assert(lin.count() === 4)
    assert(lin.agg(sum("rows_out")).head.getLong(0) === 200L)
  }

  test("TripleStore: racing appender + compactor + readers — snapshot isolation, " +
      "CAS conflict, time travel, vacuum") {
    import spark.implicits._
    import graft.sink.TripleStore
    val ts = new TripleStore(tmpDir() + "/tstore_race", nBuckets = 2)
    def batch(g: Int) = spark.createDataset((0 until 60).map(i =>
      Triple(s"s${g * 60 + i}", "p", s"o${g * 60 + i}", s"https://x/${g * 60 + i}",
        0, 1, 1L, 1.0)))
    val v1 = ts.append(batch(0))
    // appender thread: 4 more commits; compactor thread: bin-pack continuously;
    // reader thread: every observed count must be a multiple of the batch size —
    // a partial bucket or torn compaction would break that invariant
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        val n = ts.read().count()
        if (n % 60 != 0 || n < 60 || n > 300)
          bad.compareAndSet(null, s"reader observed partial state: $n rows")
      }
    })
    val compactor = new Thread(() => {
      while (!stop.get()) { ts.compact(targetFileBytes = 1L << 30); Thread.sleep(5) }
    })
    reader.start(); compactor.start()
    (1 until 5).foreach(g => ts.append(batch(g)))
    Thread.sleep(200) // let the compactor see the final fragmented state
    stop.set(true); reader.join(30000); compactor.join(30000)
    assert(bad.get() == null, String.valueOf(bad.get()))
    assert(ts.read().count() === 300)
    // content identical through all compactions
    def h(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(expr("bit_xor(xxhash64(subj, pred, obj, url))")).head.getLong(0)
    assert(h(ts.read()) === h((0 until 5).map(batch).reduce(_ union _).toDF()
      .withColumn("bucket", lit(0))))
    // a final compact leaves each bucket one entry; idempotent afterwards
    ts.compact(targetFileBytes = 1L << 30)
    val finalEntries = ts.store.snapshot(ts.store.latestVersion.get)
    assert(finalEntries.size === 2, s"not packed: $finalEntries")
    assert(ts.compact(targetFileBytes = 1L << 30).count() === 0L)
    // CAS: a compactor holding a stale read set must NOT clobber a newer commit
    val stale = ts.store.snapshot(ts.store.latestVersion.get)
      .filter(_.endsWith("bucket=0"))
    val res = ts.store.commitPaths(Seq("phantom/bucket=0"),
      drop = _.endsWith("bucket=0"),
      validateReplaced = _.toSet == Set("some-older-entry/bucket=0"))
    assert(res.isEmpty, "CAS accepted a stale replacement set")
    assert(ts.store.snapshot(ts.store.latestVersion.get)
      .filter(_.endsWith("bucket=0")) === stale)
    // time travel: v1 still reads exactly the first batch, even after vacuum
    // (old manifests keep their dirs referenced; only orphans are collected)
    ts.store.vacuum()
    assert(ts.read(Some(v1)).count() === 60)
    assert(ts.read().count() === 300)
  }

  test("SnapshotStore: optimistic commits never lose updates; snapshot isolation") {
    import spark.implicits._
    import graft.sink.SnapshotStore
    val storeRoot = tmpDir() + "/snapstore"
    val store = new SnapshotStore(storeRoot)
    // 8 concurrent appenders race on the manifest chain — every commit must land at
    // a distinct version and the final snapshot must contain ALL rows (the
    // lost-update anomaly optimistic concurrency exists to close)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (0 until 8).map { w =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            store.commit(Seq((w.toLong, s"writer$w")).toDF("id", "who"))
        })
      }
      val got = futures.map(_.get()).sorted
      assert(got == (1L to 8L), s"versions not dense/distinct: $got")
    } finally pool.shutdown()
    assert(store.read()(spark).count() === 8L)
    // the version chain is strictly growing: snapshot v contains exactly v dirs
    store.versions.foreach(v => assert(store.snapshot(v).size === v.toInt))
    // time travel: any historical snapshot reads exactly its own row count
    assert(store.read(Some(3L))(spark).count() === 3L)
    // snapshot isolation: a staged-but-uncommitted writer is invisible to readers
    val staged = Seq((99L, "crashed")).toDF("id", "who")
    staged.write.parquet(s"$storeRoot/data/crashed-writer")
    assert(store.read()(spark).count() === 8L, "uncommitted staging leaked to readers")
    // vacuum removes exactly the orphan; committed data is untouched
    assert(store.vacuum() === Seq("crashed-writer"))
    assert(store.read()(spark).count() === 8L)
    // overwrite commit replaces the table at a new version
    val v9 = store.commit(Seq((100L, "rebuild")).toDF("id", "who"), append = false)
    assert(v9 === 9L && store.read()(spark).count() === 1L)
    // and time travel still reaches the pre-overwrite snapshot
    assert(store.read(Some(8L))(spark).count() === 8L)
  }
}
