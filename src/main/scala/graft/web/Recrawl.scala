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
}
