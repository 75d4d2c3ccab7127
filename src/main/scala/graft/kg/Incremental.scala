package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental KG maintenance — the daily operation of a crawl-fed pipeline: a new
 * snapshot arrives, only the documents that actually changed are re-extracted, and the
 * triple store is patched in place. At 10^12 documents a full rebuild per crawl is not
 * an option; the incremental path touches only the changed slice.
 *
 * The reference re-processes documents by flipping per-doc rows in its `status` table
 * and re-running the whole JDBC loop over them (/root/reference/src/msa/IEDriver.java
 * status machine; sql/ie-mysql.sql status columns) — one row at a time. Here the same
 * bookkeeping is two declarative set operations:
 *
 *   1. [[snapshotDiff]] — ONE url-keyed full-outer join of (url, content_hash) between
 *      snapshots classifies every url as added / changed / removed / unchanged. Both
 *      sides are narrow (two columns) scans; content identity is the md5/xxhash the
 *      store already carries, so no text is shuffled.
 *   2. [[mergeTriples]] — purge the store of every triple whose evidence url is dirty
 *      (changed or removed or re-added) with ONE left-anti join, then union the fresh
 *      delta extraction. No window, no global sort; the anti-join shuffles on url,
 *      which is also how the extraction delta is naturally keyed.
 *
 * Correctness invariant (pinned in GraphSpec): merge(store, extract(reextract slice),
 * dirty) ≡ extract-from-scratch(current snapshot). Re-extraction cost is proportional
 * to |added| + |changed|, never to the corpus.
 */
object Incremental {

  /**
   * Classify every url across two snapshots by content identity.
   *
   * @param prev (urlCol, hashCol) of the snapshot the store was built from
   * @param curr (urlCol, hashCol) of the incoming snapshot
   * @return one row per url seen in either snapshot: (url, change) with change ∈
   *         {added, changed, removed, unchanged}
   */
  def snapshotDiff(prev: DataFrame, curr: DataFrame,
      urlCol: String = "url", hashCol: String = "content_hash"): DataFrame = {
    // presence is tracked by explicit flags, not hash nullability — a url whose
    // content hash is legitimately NULL in both snapshots is unchanged, not
    // added+removed; hash comparison is null-safe for the same reason
    val p = prev.select(col(urlCol).as("url"), col(hashCol).as("h_prev"),
      lit(true).as("in_prev"))
    val c = curr.select(col(urlCol).as("url"), col(hashCol).as("h_curr"),
      lit(true).as("in_curr"))
    p.join(c, Seq("url"), "full_outer")
      .select(col("url"),
        when(col("in_prev").isNull, lit("added"))
          .when(col("in_curr").isNull, lit("removed"))
          .when(!(col("h_prev") <=> col("h_curr")), lit("changed"))
          .otherwise(lit("unchanged")).as("change"))
  }

  /** Urls whose store triples are stale and must be purged before the merge:
    * everything not bit-identical across snapshots. */
  def dirtyUrls(diff: DataFrame): DataFrame =
    diff.filter(col("change") =!= "unchanged").select("url")

  /** Urls the extraction pipeline must (re)run on: new and changed content. The
    * re-extraction cost of an incremental run is exactly this slice. */
  def reextractUrls(diff: DataFrame): DataFrame =
    diff.filter(col("change").isin("added", "changed")).select("url")

  /**
   * Patch the triple store: drop every triple whose evidence url is dirty, append the
   * delta extraction. One anti-join + one union — the merged result is byte-equal to a
   * full rebuild over the current snapshot whenever `delta` is the extraction of
   * [[reextractUrls]] and `dirty` is [[dirtyUrls]] of the same diff.
   */
  def mergeTriples(store: DataFrame, delta: DataFrame, dirty: DataFrame,
      urlCol: String = "url"): DataFrame =
    store.join(dirty.toDF(urlCol), Seq(urlCol), "left_anti")
      .select(store.columns.map(col): _*) // the using-column join moves the key first
      .unionByName(delta)
}
