package graft.runtime

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, Dataset, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Live job counters via `Dataset.observe` (north rule: "checkpoints per-partition
 * lineage AND metrics" — [[StageCheckpoint]] persists the lineage tables; this surface
 * adds the in-flight counters a cluster operator watches while the job runs).
 *
 * `observe` metrics are computed BY THE RUNNING QUERY itself — accumulator-style,
 * piggybacked on the rows the job already processes — so unlike a `count()` they cost
 * zero extra jobs, zero extra scans, and work identically on a 1000-executor cluster
 * (partial aggregates merge on the driver). Constraints inherited from Spark:
 * aggregate expressions only, no distinct aggregates (use approx_count_distinct).
 *
 * The reference keeps equivalent counters in its status tables, polled over JDBC
 * (/root/reference/src/msa/IEDriver.java status machine); here they stream off the
 * listener bus with no store round-trip.
 *
 * Semantics: live counters measure work PERFORMED by this run. A query whose final
 * adaptive plan no longer contains the CollectMetrics node reports nothing — notably
 * a fully-resumed [[graft.sink.Materialize.writeResumable]] (no pending buckets),
 * where AQE's empty-relation propagation collapses the pending-bucket probe to
 * EmptyRelation. Zero work → zero counters; the persisted checkpoint/lineage tables
 * remain the durable record (MetricsSpec pins this contract).
 */
object Metrics {

  /** Attach named observed metrics to a dataset (type-preserving). The metrics fire
    * on every action that executes this node and are delivered to any registered
    * [[MetricsCollector]]. */
  def observed[T](ds: Dataset[T], name: String, first: Column, rest: Column*): Dataset[T] =
    ds.observe(name, first, rest: _*)
}

/**
 * Collects every observed metric of a session: registers as a
 * [[QueryExecutionListener]] and keeps, per observation name, the latest metric row
 * plus how many actions fired it (a multi-action pipeline executes a shared stage
 * more than once unless it is checkpointed — the firing count makes that visible,
 * which is itself a useful recompute diagnostic).
 *
 * Listener delivery is asynchronous (Spark posts on the listener bus);
 * [[await]] polls until an expected observation arrives or the timeout elapses.
 */
final class MetricsCollector(spark: SparkSession) extends QueryExecutionListener {

  private val seen = new ConcurrentHashMap[String, (Long, Row)]()
  spark.listenerManager.register(this)

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    qe.observedMetrics.foreach { case (name, row) =>
      // keep the firing count, but never let a TRIVIAL re-observation (all counters
      // zero/null — a cache-served or AQE-collapsed re-execution that saw no rows)
      // overwrite a real metric row already collected for this name
      seen.merge(name, (1L, row),
        (a, b) => (a._1 + b._1, if (trivialRow(b._2) && !trivialRow(a._2)) a._2 else b._2))
    }

  /** A metric row carrying no evidence of work: every field zero or null. */
  private[graft] def trivialRow(row: Row): Boolean =
    (0 until row.length).forall { i =>
      row.isNullAt(i) || (row.get(i) match {
        case n: java.lang.Number => n.doubleValue() == 0.0
        case _ => false
      })
    }

  override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()

  /** observation name -> (firing count, metric column -> value). */
  def snapshot: Map[String, (Long, Map[String, Any])] =
    seen.asScala.toMap.map { case (name, (n, row)) =>
      name -> (n -> row.schema.fieldNames.zipWithIndex.map { case (f, i) =>
        f -> row.get(i)
      }.toMap)
    }

  /** Block until `name` has been observed (or timeout); returns its metrics if seen. */
  def await(name: String, timeoutMs: Long = 10000L): Option[Map[String, Any]] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!seen.containsKey(name) && System.nanoTime() < deadline) Thread.sleep(20)
    Option(seen.get(name)).map(_._2).map(row =>
      row.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> row.get(i) }.toMap)
  }

  def clear(): Unit = seen.clear()

  def close(): Unit = spark.listenerManager.unregister(this)
}
