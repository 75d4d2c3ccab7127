package graft.sink

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Triple

/**
 * Triple materialization: dedup + partitioned, idempotent, resumable write — the
 * reference's PopulateFrame sink (/root/reference/src/msa/PopulateFrame.java:39-40,
 * 247-268) plus its document_status resume machinery
 * (sql/utilities-sqlserver.sql:1-2) re-expressed for Spark.
 *
 * Output layout: parquet partitioned by `bucket = pmod(xxhash64(subj), nBuckets)` —
 * subject-bucketed so downstream per-entity reads prune partitions, and writes are
 * idempotent per bucket via dynamic partition overwrite (the parquet stand-in for
 * Iceberg's overwritePartitions; no Iceberg runtime ships in this sandbox).
 *
 * A `_checkpoints` side table records (stage, bucket, rows, hash): a resumed run
 * anti-joins completed buckets and rewrites only the rest — per-partition lineage +
 * metrics per the north rule.
 *
 * NOTE: this is the PLAIN-DIRECTORY variant (hive layout readable by any engine, no
 * manifest indirection). [[TripleStore]] routes the same resumable-write and
 * compaction semantics through [[SnapshotStore]]'s manifest commit protocol — ONE
 * commit path adding snapshot isolation, time travel, and vacuum — and is the store
 * a concurrent/production deployment should use; the dedup/bucket kernels here are
 * shared by both.
 */
object Materialize {

  def withBucket(triples: Dataset[Triple], nBuckets: Int): DataFrame =
    triples.toDF().withColumn("bucket", pmod(xxhash64(col("subj")), lit(nBuckets)).cast("int"))

  /** Default provenance precedence (lower = stronger): human-validated beats auto,
    * ref src/msa/PopulateFrame.java:168-192; unlisted provenances rank weakest. */
  val DefaultProvenanceRank: Map[String, Int] =
    Map(graft.model.Provenance.Gold -> 0, graft.model.Provenance.Propagated -> 1,
      graft.model.Provenance.Auto -> 2)

  private def rankOf(provenanceRank: Map[String, Int]) =
    provenanceRank.foldLeft(lit(Int.MaxValue)) { case (acc, (p, r)) =>
      when(col("provenance") === p, lit(r)).otherwise(acc)
    }

  /** Live counters over the FINAL (post-dedup) triple set, attached via
    * Dataset.observe when the caller names an observation — zero extra jobs; read
    * back through [[graft.runtime.MetricsCollector]]. */
  private def withCounters(df: DataFrame, name: Option[String]): DataFrame =
    name.fold(df)(n => graft.runtime.Metrics.observed(df, n,
      count(lit(1)).as("triples"),
      approx_count_distinct(col("subj")).as("subjects_approx"),
      approx_count_distinct(col("url")).as("docs_approx"),
      min(col("score")).as("min_score")))

  /** Site precedence + graph dedup, then write. Two aligned shuffles: the site pass
    * is url-keyed, the graph pass subj-keyed — both reduce before the exchange. */
  def write(triples: Dataset[Triple], path: String, nBuckets: Int = 16,
      observeName: Option[String] = None)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val deduped = dedup(dedupPrecedence(triples.toDF()).as[Triple])
    // persist: the bucketed result feeds two actions (data write + checkpoint agg);
    // without it the whole upstream pipeline recomputes per action
    val bucketed = withCounters(withBucket(deduped, nBuckets), observeName)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(path)
    val cps = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("rows_out"),
        coalesce(expr("bit_xor(xxhash64(subj, pred, obj))"), lit(0L)).as("output_hash"))
      .withColumn("stage", lit("materialize"))
      .withColumn("completed_at", current_timestamp())
    cps.write.mode("overwrite").parquet(path + "_checkpoints")
    val out = cps.sparkSession.read.parquet(path + "_checkpoints")
    bucketed.unpersist()
    out
  }

  /** Order-insensitive dedup: one row per (subj, pred, obj); the surviving evidence
    * row is picked ATOMICALLY (one ordered struct — strongest provenance first, then
    * best score, then a total tiebreak over every remaining field), so the emitted
    * (url, begin, end, profileId, score, provenance) always come from ONE input row —
    * never a per-column chimera — and the choice is identical at any parallelism. */
  def dedup(triples: Dataset[Triple],
      provenanceRank: Map[String, Int] = DefaultProvenanceRank)(
      implicit spark: SparkSession): Dataset[Triple] = {
    import spark.implicits._
    triples.toDF()
      .groupBy($"subj", $"pred", $"obj")
      .agg(max_by(
        struct($"url", $"begin", $"end", $"profileId", $"score", $"provenance"),
        struct(-rankOf(provenanceRank), $"score", $"url", $"begin", $"end",
          $"profileId")).as("w"))
      .select($"subj", $"pred", $"obj", $"w.url".as("url"), $"w.begin".as("begin"),
        $"w.end".as("end"), $"w.profileId".as("profileId"), $"w.score".as("score"),
        $"w.provenance".as("provenance"))
      .as[Triple]
  }

  /**
   * Provenance-precedence dedup — the reference's PopulateFrame rule
   * (/root/reference/src/msa/PopulateFrame.java:168-192): at one annotation SITE
   * (url, pred, begin, end), a human-validated row supersedes any auto row REGARDLESS
   * of score; only within equal provenance rank does the best score win. The winner
   * is picked atomically (one ordered struct), so its subj/obj/score/provenance always
   * come from the same row.
   *
   * @param triples a Triple-shaped DataFrame plus a `provenance` column
   * @param provenanceRank lower = stronger; unlisted provenances rank weakest
   */
  def dedupPrecedence(triples: DataFrame,
      provenanceRank: Map[String, Int] = DefaultProvenanceRank)(
      implicit spark: SparkSession): DataFrame = {
    triples
      .withColumn("_rank", rankOf(provenanceRank))
      .groupBy(col("url"), col("pred"), col("begin"), col("end"))
      .agg(max_by(
        struct(col("subj"), col("obj"), col("profileId"), col("score"),
          col("provenance")),
        // precedence first (negated rank: stronger = larger), then score, then a
        // TOTAL deterministic tiebreak — profileId/provenance included so two rows
        // agreeing on subj/obj/score (pair precisions are frequently exactly 1.0,
        // e.g. one row from the mention path and one from the relation path) still
        // order identically at any parallelism
        struct(-col("_rank"), col("score"), col("subj"), col("obj"),
          col("profileId"), col("provenance"))).as("w"))
      .select(col("w.subj").as("subj"), col("pred"), col("w.obj").as("obj"),
        col("url"), col("begin"), col("end"),
        col("w.profileId").as("profileId"), col("w.score").as("score"),
        col("w.provenance").as("provenance"))
  }

  /**
   * Element-repeat ordinals — the reference's frame_instance_element_repeat
   * bookkeeping (/root/reference/src/msa/PopulateFrame.java:271-303): when one
   * (url, subj, pred) slot accepts several values, each occurrence gets its repeat
   * ordinal (0-based, document order). The window is partitioned per page — bounded
   * state, scale-safe.
   */
  def withElementRepeat(triples: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url"), col("subj"), col("pred"))
      .orderBy(col("begin"), col("end"), col("obj"))
    triples.withColumn("element_repeat", row_number().over(w) - 1)
  }

  /**
   * Resumable write: consult the checkpoint table and (re)write ONLY buckets that have
   * no completed checkpoint row — the north rule's "resumable from checkpoint with
   * per-partition lineage": a crashed run leaves complete buckets' data + checkpoint
   * rows intact; the resumed run overwrites just the missing partitions (dynamic
   * partition overwrite, the parquet stand-in for Iceberg overwritePartitions) and
   * appends their lineage rows. Idempotent: a second resume with a complete checkpoint
   * table writes nothing.
   */
  def writeResumable(triples: Dataset[Triple], path: String, nBuckets: Int = 16,
      observeName: Option[String] = None)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // counters observe the FULL canonical set (before the pending-bucket filter), so
    // a resumed run still reports what the job represents, not just what it rewrote
    val bucketed = withCounters(
        withBucket(dedup(dedupPrecedence(triples.toDF()).as[Triple]), nBuckets),
        observeName)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pending = pendingBuckets(bucketed, path + "_checkpoints", Some(path))
      .collect().map(_.getInt(0)) // ≤ nBuckets rows — driver-safe
    if (pending.nonEmpty) {
      val todo = bucketed.filter(col("bucket").isin(pending.map(Integer.valueOf): _*))
      todo.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(path)
      todo.groupBy(col("bucket"))
        .agg(count(lit(1)).as("rows_out"),
          coalesce(expr("bit_xor(xxhash64(subj, pred, obj))"), lit(0L)).as("output_hash"))
        .withColumn("stage", lit("materialize"))
        .withColumn("completed_at", current_timestamp())
        .write.mode("append").parquet(path + "_checkpoints")
    }
    bucketed.unpersist()
    // first run over an EMPTY triple set: nothing pending, checkpoint dir never
    // created — return an empty checkpoint table instead of PATH_NOT_FOUND. Only that
    // legitimate case is absorbed: a transient FS error or corrupt checkpoint file
    // must PROPAGATE, not masquerade as "nothing completed" and trigger silent rewrites.
    if (checkpointExists(path + "_checkpoints")) {
      // the FILE is append-only lineage (a re-verified bucket appends a fresh row);
      // the RETURNED view is one row per bucket — the latest — so downstream sums
      // never double-count a rewritten bucket
      val tbl = spark.read.parquet(path + "_checkpoints")
      tbl.groupBy(col("bucket"))
        .agg(max_by(struct(tbl.columns.filterNot(_ == "bucket").map(col): _*),
          col("completed_at")).as("w"))
        .select(col("bucket") +: tbl.columns.filterNot(_ == "bucket")
          .map(c => col(s"w.$c").as(c)): _*)
    } else {
      import spark.implicits._
      Seq.empty[(Int, Long, Long, String, java.sql.Timestamp)]
        .toDF("bucket", "rows_out", "output_hash", "stage", "completed_at")
    }
  }

  /** Committed-data probe, shared with StageCheckpoint — see
    * [[graft.util.Fs.parquetDataExists]]. */
  private def checkpointExists(checkpointPath: String)(
      implicit spark: SparkSession): Boolean =
    graft.util.Fs.parquetDataExists(checkpointPath)

  /**
   * Compaction — the Iceberg `rewrite_data_files` analog for the parquet stand-in:
   * bin-packing rewrite of fragmented bucket partitions. Small-file buildup is what
   * kills a 100 TB store that is appended/resumed in many increments; this rewrites
   * each bucket whose file count exceeds `ceil(bytes / targetFileBytes)` down to that
   * packed count, with
   *  - content-identity verification: the order-insensitive FULL-ROW hash
   *    (bit_xor of xxhash64 over every data column) must match before/after, or the
   *    bucket is left untouched and the job fails loudly;
   *  - atomic-enough swap: rewrite lands in an underscore-hidden temp dir (invisible
   *    to readers), the live dir moves to a trash dir, temp renames into place, trash
   *    drops — a crash leaves either the old or the new complete directory, never a
   *    mix, and `pendingBuckets`' vanished-data probe re-queues the bucket in the
   *    worst case;
   *  - lineage: one appended `_checkpoints` row per rewritten bucket
   *    (stage = "compact", same (subj, pred, obj) output_hash contract as the write
   *    stages), so the latest-row-per-bucket resume view stays coherent.
   *
   * Driver loop over ≤ nBuckets partitions (each a small job) — the bucket IS the
   * rewrite unit, exactly like Iceberg's per-partition file groups.
   *
   * @return one row per REWRITTEN bucket: (bucket, files_before, files_after,
   *         rows_out, output_hash).
   */
  def compact(path: String, targetFileBytes: Long = 128L * 1024 * 1024)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Crash recovery FIRST: a crash between the swap's two renames leaves no live
    // bucket=N directory while _compact_trash/bucket=N (the old copy) and/or
    // _compact_tmp/bucket=N (the new, verified-content-identical copy) survive.
    // Restore a missing bucket from trash first (the previously live data), else
    // tmp — before this run's own rewrites and the end-of-run blanket temp-dir
    // deletes, which would otherwise destroy the only surviving copies while
    // _checkpoints still marks the bucket committed.
    if (fs.exists(root)) for (tdir <- Seq("_compact_trash", "_compact_tmp")) {
      val d = new org.apache.hadoop.fs.Path(root, tdir)
      if (fs.exists(d)) fs.listStatus(d)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
        .foreach { s =>
          val live = new org.apache.hadoop.fs.Path(root, s.getPath.getName)
          if (!fs.exists(live))
            require(fs.rename(s.getPath, live),
              s"compact: could not recover ${s.getPath} to $live")
        }
    }
    val buckets =
      if (!fs.exists(root)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(root)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
        .sortBy(_.getPath.getName)
    val rewritten = buckets.toSeq.flatMap { st =>
      val bucketDir = st.getPath
      val bucketId = bucketDir.getName.stripPrefix("bucket=").toInt
      val files = fs.listStatus(bucketDir).filter { f =>
        val n = f.getPath.getName
        f.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
      val totalBytes = files.map(_.getLen).sum
      val packed = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
      if (files.length <= packed) None
      else {
        // (rows, full-row hash over name-sorted columns, lineage-contract hash)
        def identity(dir: String): (Long, Long, Long) = {
          val df = spark.read.parquet(dir)
          val r = df.agg(count(lit(1)),
            coalesce(expr(s"bit_xor(xxhash64(${df.columns.sorted.mkString(", ")}))"),
              lit(0L)),
            coalesce(expr("bit_xor(xxhash64(subj, pred, obj))"), lit(0L))).head()
          (r.getLong(0), r.getLong(1), r.getLong(2))
        }
        val before = identity(bucketDir.toString)
        val tmp = new org.apache.hadoop.fs.Path(root,
          s"_compact_tmp/${bucketDir.getName}")
        fs.delete(tmp, true)
        spark.read.parquet(bucketDir.toString).coalesce(packed)
          .write.mode("overwrite").parquet(tmp.toString)
        val after = identity(tmp.toString)
        require(before == after,
          s"compact: content identity changed for bucket $bucketId " +
            s"(before=$before after=$after) — rewrite aborted, original intact")
        val trash = new org.apache.hadoop.fs.Path(root,
          s"_compact_trash/${bucketDir.getName}")
        fs.delete(trash, true)
        fs.mkdirs(trash.getParent)
        require(fs.rename(bucketDir, trash), s"compact: could not stage bucket $bucketId")
        require(fs.rename(tmp, bucketDir), s"compact: could not swap bucket $bucketId")
        fs.delete(trash, true)
        val filesAfter = fs.listStatus(bucketDir).count { f =>
          val n = f.getPath.getName
          f.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
        }
        Some((bucketId, files.length, filesAfter, before._1, before._3))
      }
    }
    fs.delete(new org.apache.hadoop.fs.Path(root, "_compact_tmp"), true)
    fs.delete(new org.apache.hadoop.fs.Path(root, "_compact_trash"), true)
    val out = rewritten
      .toDF("bucket", "files_before", "files_after", "rows_out", "output_hash")
    if (rewritten.nonEmpty)
      out.select(col("bucket").cast("int").as("bucket"), col("rows_out"),
          col("output_hash"), lit("compact").as("stage"),
          current_timestamp().as("completed_at"))
        .write.mode("append").parquet(path + "_checkpoints")
    out
  }

  /** Resume: which buckets still need writing given an existing checkpoint table.
    *
    * When `dataPath` is given, a committed bucket whose data partition has VANISHED
    * (external deletion, FS loss — the checkpoint row is written after the data, so a
    * crash can't produce this) is treated as pending again: the checkpoint is trusted
    * only as far as the data it describes, never instead of it. ≤ nBuckets FS probes. */
  def pendingBuckets(all: DataFrame, checkpointPath: String,
      dataPath: Option[String] = None)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val committed: Seq[Int] = if (checkpointExists(checkpointPath))
      spark.read.parquet(checkpointPath).select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).toSeq // ≤ nBuckets rows — driver-safe
    else Seq.empty
    val verified = dataPath.fold(committed)(dp =>
      committed.filter(b => graft.util.Fs.parquetDataExists(s"$dp/bucket=$b")))
    all.select(col("bucket")).distinct()
      .join(verified.toDF("bucket"), Seq("bucket"), "left_anti")
  }
}
