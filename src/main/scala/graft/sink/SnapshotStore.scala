package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, FileAlreadyExistsException}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Snapshot-isolated, optimistically-concurrent table store — the sandbox emulation of
 * the Iceberg COMMIT PROTOCOL, the one table-format property a plain directory of
 * parquet cannot give (writers racing on the same prefix tear each other's output;
 * readers see half-written states). Protocol, exactly Iceberg's shape:
 *
 *  1. a writer STAGES its data files under `data/<token>/` — uncommitted, invisible;
 *  2. it then COMMITS by publishing version manifest `manifests/v%06d.json` listing
 *     the data dirs of the new snapshot (append = previous snapshot's dirs + its
 *     own; overwrite = its own only) with an ATOMIC create-exclusive claim: exactly
 *     one of two racing writers wins version N, the loser re-reads the new latest
 *     snapshot and retries against N+1 — optimistic concurrency, no locks held;
 *  3. readers resolve the latest committed manifest and read EXACTLY the dirs it
 *     lists — snapshot isolation (a torn or crashed write is invisible until
 *     committed), plus time travel by reading any older version;
 *  4. `vacuum()` deletes staged dirs no manifest references (crashed writers).
 *
 * The atomic-claim primitive is filesystem-specific: HDFS has create-exclusive, S3
 * has conditional PUT, Iceberg delegates to its catalog; on the local filesystem the
 * claim is a HARD LINK to a fully-written temp file — `link(2)` fails with EEXIST
 * atomically AND the name appears with its complete content in one step, so a reader
 * can never observe a partial manifest. Everything else is engine-agnostic protocol.
 */
final class SnapshotStore(root: String) {

  private val manifestsDir: Path = Paths.get(root, "manifests")
  private val dataDir: Path = Paths.get(root, "data")
  Files.createDirectories(manifestsDir)
  Files.createDirectories(dataDir)

  private def manifestPath(v: Long): Path = manifestsDir.resolve(f"v$v%06d.json")

  /** Directory listing with the stream CLOSED (Files.list leaks a file handle per
    * call otherwise — a long-lived driver polling latestVersion would run out). */
  private def ls(dir: Path): Seq[String] = {
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString).toSeq
    finally s.close()
  }

  /** Committed versions, ascending (empty for a fresh store). */
  def versions: Seq[Long] =
    ls(manifestsDir)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toLong
      }.sorted

  def latestVersion: Option[Long] = versions.lastOption

  /** Data dirs of snapshot `v` (one relative token per line — no parser needed). */
  def snapshot(v: Long): Seq[String] =
    new String(Files.readAllBytes(manifestPath(v)), StandardCharsets.UTF_8)
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq

  /**
   * Commit `df` as a new snapshot. Returns the committed version. `append = true`
   * unions with the snapshot that is latest AT COMMIT TIME (re-resolved on every
   * retry — the lost-update hazard optimistic concurrency exists to close);
   * `append = false` replaces the table. Retries up to `maxRetries` claim races.
   */
  def commit(df: DataFrame, append: Boolean = true, maxRetries: Int = 50): Long = {
    val token = java.util.UUID.randomUUID().toString
    df.write.parquet(dataDir.resolve(token).toString)
    commitPaths(Seq(token), drop = if (append) _ => false else _ => true,
      maxRetries = maxRetries)
      .getOrElse(sys.error(
        s"SnapshotStore.commit: lost $maxRetries optimistic races at $root"))
  }

  /** Staging location for a relative data path — callers that stage their own
    * layout (e.g. bucket-partitioned writes) write here, then [[commitPaths]]. */
  def stagePath(rel: String): String = dataDir.resolve(rel).toString

  /**
   * Lower-level commit primitive (the [[commit]] machinery, factored out for
   * bucket-granular writers): publish already-staged relative paths as a new
   * snapshot. Per optimistic attempt, the base is the snapshot that is latest AT
   * COMMIT TIME with `drop`-matching entries removed (bucket rewrite/compaction
   * replace their bucket's old entries); `newPaths` are appended.
   *
   * `validateReplaced`: compare-and-swap guard — receives the base entries the
   * `drop` predicate is about to remove, in manifest order; returning false ABORTS
   * the commit (None) instead of retrying. A compactor passes the entry list it
   * actually read and rewrote, so a racing writer that replaced the same bucket
   * between read and commit can never be silently undone (the Iceberg
   * validation-conflict analog).
   *
   * @return Some(version) on success; None when validation rejected the swap.
   */
  def commitPaths(newPaths: Seq[String], drop: String => Boolean = _ => false,
      validateReplaced: Seq[String] => Boolean = _ => true,
      maxRetries: Int = 50): Option[Long] = {
    var attempt = 0
    while (attempt < maxRetries) {
      // resolve the latest version ONCE per attempt: reading it separately for the
      // base snapshot and the next version number opens a window where a commit
      // landing in between silently drops out of the union (a real lost update —
      // caught by the concurrent-appender spec)
      val latest = latestVersion
      val all = latest.map(snapshot).getOrElse(Nil)
      val (replaced, base) = all.partition(drop)
      if (!validateReplaced(replaced)) return None
      val next = latest.getOrElse(0L) + 1L
      val body = (base ++ newPaths).mkString("", "\n", "\n")
      val tmp = Files.createTempFile(manifestsDir, ".tmp-", ".manifest")
      try {
        Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
        Files.createLink(manifestPath(next), tmp) // atomic claim + complete content
        return Some(next)
      } catch {
        case _: FileAlreadyExistsException => attempt += 1 // lost the race — retry
      } finally Files.deleteIfExists(tmp)
    }
    sys.error(s"SnapshotStore.commitPaths: lost $maxRetries optimistic races at $root")
  }

  /** Read snapshot `v` (defaults to latest). Empty DataFrame semantics are the
    * caller's concern — a fresh store has no versions and this throws. */
  def read(version: Option[Long] = None)(implicit spark: SparkSession): DataFrame = {
    val v = version.orElse(latestVersion).getOrElse(
      sys.error(s"SnapshotStore.read: no committed snapshot at $root"))
    val dirs = snapshot(v).map(t => dataDir.resolve(t).toString)
    spark.read.parquet(dirs: _*)
  }

  /** Delete staged data dirs no manifest references (crashed/abandoned writers).
    * Returns the removed tokens. Safe under concurrency for the same reason Iceberg
    * vacuums are: a dir only becomes referencable by appearing in a manifest, which
    * happens strictly AFTER its data is fully written. A concurrent writer that has
    * staged but not yet committed can lose its staging to a vacuum — production
    * formats age-gate this; the test store vacuums everything unreferenced. */
  def vacuum(): Seq[String] = {
    val referenced = versions.flatMap(snapshot).toSet
    // entries may be whole tokens ("<uuid>", plain commit()) or bucket-granular
    // ("<uuid>/bucket=N", TripleStore): a token dir survives if ANY entry points
    // into it; inside a surviving token dir, bucket subdirs no entry references
    // (compacted-away bucket copies) are vacuumed individually
    val refTokens = referenced.map(_.split('/').head)
    def rmTree(dir: Path): Unit = {
      val walk = Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
    val tokenOrphans = ls(dataDir).filterNot(refTokens)
    tokenOrphans.foreach(t => rmTree(dataDir.resolve(t)))
    val bucketOrphans = ls(dataDir).filter(refTokens).flatMap { t =>
      ls(dataDir.resolve(t))
        .filter(b => b.startsWith("bucket=") && !referenced(s"$t/$b"))
        .map(b => s"$t/$b")
    }
    bucketOrphans.foreach(e => rmTree(dataDir.resolve(e)))
    tokenOrphans ++ bucketOrphans
  }
}
