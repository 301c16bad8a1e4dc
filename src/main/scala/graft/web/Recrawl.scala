package graft.web

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recrawl collapse — the first dedup a Common-Crawl-style corpus needs
  * BEFORE any content-level dedup: the same page is fetched by several
  * crawls (and under several spellings of its URL), and the pipeline
  * keeps exactly one snapshot per page identity. Page identity is the
  * canonical URL ([[UrlNorm.canonical]]); the kept snapshot is the one
  * with the greatest capture timestamp, ties broken by the
  * lexicographically greatest raw URL so the result is deterministic
  * under any partitioning.
  *
  * Same "beyond the reference" corpus-lifecycle family as the dedup /
  * tiering operators (the reference is a per-document layout engine;
  * BASELINE.json's input hint carries `warc_ts` for exactly this).
  *
  * Scale shape: ONE exchange, on the canonical-url key, with map-side
  * partial aggregation — `max(struct(ts, url))` + `count` under one
  * groupBy, so the shuffle carries one row per (scan partition, canon),
  * not one per snapshot. The kept-row payload (the url string) makes
  * the max buffer var-length, which Spark cannot hash-aggregate — the
  * plan is a partial/final SortAggregate pair; the alternatives are
  * strictly worse at 10^12 snapshots (a `row_number() OVER (PARTITION
  * BY canon)` window sorts the FULL history after the shuffle with no
  * partial collapse; a max-ts + join-back needs two more exchanges and
  * re-reads the snapshots), whereas here the only sorts are per
  * scan-partition-sized batches map-side and per already-collapsed
  * rows reduce-side. No join, no window; the canonicalization itself
  * is a codegen'd column chain inside the scan projection. The reduce
  * side holds only the distinct page identities; per-host URL skew is
  * irrelevant because the key is the full canon, not the host.
  */
object Recrawl {

  /** Collapse `snaps(url, ts_epoch)` — one row per crawl snapshot — to
    * one row per canonical URL:
    * `(canon, n_snaps, latest_epoch, latest_url)`. */
  def latestSnapshot(snaps: DataFrame): DataFrame =
    snaps
      .select(UrlNorm.canonical(col("url")).as("canon"),
        col("url"), col("ts_epoch"))
      .groupBy("canon")
      .agg(
        count(lit(1)).as("n_snaps"),
        max(struct(col("ts_epoch"), col("url"))).as("best"))
      .select(col("canon"), col("n_snaps"),
        col("best.ts_epoch").as("latest_epoch"),
        col("best.url").as("latest_url"))

  /** Keep, for every canonical URL, the FULL input row of its latest
    * snapshot — the job-facing form of [[latestSnapshot]]: the winner
    * set derives from the narrow `(url, tsCol)` projection (the wide
    * payload — html bytes — never enters the aggregate), then attaches
    * by a left-semi join on `(url, epoch)` with the narrow winner side
    * `shuffle_hash`-hinted: no sort of the payload, no assumed
    * broadcast (at 10^12 snapshots the winner set is ~corpus-sized).
    * Rows duplicating both url AND timestamp (a crawler writing the
    * identical fetch twice) all survive the semi-join — dedup of
    * byte-identical rows is the exact-dedup operator's job, not this
    * one's. */
  def keepLatest(pages: DataFrame, tsCol: String = "warc_ts"): DataFrame = {
    val withTs = pages.withColumn("__ts_epoch", unix_timestamp(col(tsCol)))
    val winners = latestSnapshot(
        withTs.select(col("url"), col("__ts_epoch").as("ts_epoch")))
      .select(col("latest_url").as("url"),
        col("latest_epoch").as("__ts_epoch"))
    withTs.join(winners.hint("shuffle_hash"), Seq("url", "__ts_epoch"),
        "left_semi")
      .drop("__ts_epoch")
  }
}
