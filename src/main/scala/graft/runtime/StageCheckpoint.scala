package graft.runtime

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Per-stage checkpoint + lineage: the generalized form of the reference's
 * document_status state machine (/root/reference/sql/utilities-sqlserver.sql:1-2,
 * src/msa/IEDriver.java:441-450,1287-1310) for a multi-stage Spark job — the north
 * rule's "every stage checkpoints per-partition lineage and counters so runs resume
 * idempotently".
 *
 * `materialize(name, fingerprint)(stage)` runs the stage ONCE per (name, fingerprint):
 *  - first run: computes the stage DataFrame, writes it to `<base>/<name>` (parquet),
 *    writes per-partition lineage `(stage, part, rows)` + the fingerprint to
 *    `<base>/<name>__lineage`, and returns the written data re-read (which also
 *    truncates the logical plan, like the reference's per-stage tables);
 *  - resumed run with the SAME fingerprint: skips compute entirely and reads the
 *    stage output back — a crashed pipeline restarts at its first incomplete stage;
 *  - changed fingerprint (different input/config): recomputes and overwrites.
 *
 * The fingerprint is caller-supplied (input path + config rendering); content hashes
 * of big inputs are the caller's choice of rigor. Writes are atomic at stage
 * granularity: lineage (with the fingerprint) is committed only AFTER the data write
 * succeeds, so a half-written stage is recomputed on resume.
 */
final class StageCheckpoint(base: String)(implicit spark: SparkSession) {

  private def dataPath(name: String) = s"$base/$name"
  private def lineagePath(name: String) = s"$base/${name}__lineage"

  /** The fingerprint last committed for a stage, if any. */
  def committedFingerprint(name: String): Option[String] =
    try {
      val df = spark.read.parquet(lineagePath(name))
      df.select(col("fingerprint")).head(1).headOption.map(_.getString(0))
    } catch { case _: Throwable => None }

  /** Per-partition lineage rows of a completed stage. */
  def lineage(name: String): DataFrame = spark.read.parquet(lineagePath(name))

  def materialize(name: String, fingerprint: String)(stage: => DataFrame): DataFrame = {
    if (committedFingerprint(name).contains(fingerprint)) {
      spark.read.parquet(dataPath(name))
    } else {
      val df = stage
      df.write.mode("overwrite").parquet(dataPath(name))
      val written = spark.read.parquet(dataPath(name))
      val parts = written.groupBy(spark_partition_id().as("part"))
        .agg(count(lit(1)).as("rows"))
        .withColumn("stage", lit(name))
        .withColumn("fingerprint", lit(fingerprint))
        .withColumn("completed_at", current_timestamp())
      parts.write.mode("overwrite").parquet(lineagePath(name))
      written
    }
  }

  /** True when a stage's data files would be reused for this fingerprint. */
  def wouldResume(name: String, fingerprint: String): Boolean =
    committedFingerprint(name).contains(fingerprint)
}

object StageCheckpoint {
  def apply(base: String)(implicit spark: SparkSession): StageCheckpoint = {
    Files.createDirectories(Paths.get(base))
    new StageCheckpoint(base)
  }
}
