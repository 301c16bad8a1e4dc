package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Hash-bucketed committed tables — the 10^12-row path for the resume /
  * ingest anti-joins, where neither a broadcast nor a Bloom sketch fits:
  * at 10^12 committed keys a 1%-fp Bloom filter is ~1.2 TB of bits
  * ([[graft.text.TextOps.ingestDedupBloom]] documents its ≤10⁹ ceiling),
  * and a plain anti-join shuffles the ENTIRE committed side every batch.
  * A table bucketed by the join key moves that shuffle to WRITE time,
  * once: every subsequent anti-join reads the committed side already
  * hash-partitioned (`HashPartitioning(key, nBuckets)` straight off the
  * scan), so per-batch cost is one exchange of the (small) incoming
  * batch into the bucket layout and a co-located merge — the committed
  * petabytes never move again. Spark's alias-aware partitioning
  * propagation means [[graft.text.TextOps.ingestDedup]] hits this plan
  * unchanged (`BucketedSpec` asserts the single-exchange shape); the
  * same applies to the extraction resume anti-join on `url`.
  *
  * This is the plain-parquet analogue of an Iceberg `bucket(n, col)`
  * partition transform + storage-partitioned join — on an
  * [[IcebergTableIO]] deployment the table spec carries it instead
  * (SURVEY §7: pure configuration, same job code).
  *
  * Bucket metadata lives in the session catalog, so `spark.table(name)`
  * is the read path (a raw `spark.read.parquet(path)` sees the files but
  * not the bucketing). `nBuckets` sizing at scale: committed rows ×
  * key width / nBuckets should sit near one task's comfortable input
  * (~128–512 MB) — e.g. 10^12 × 48 B ≈ 48 TB → ~2ⁱ⁷ buckets.
  */
object Bucketed {

  /** Write `df` as an EXTERNAL parquet table at `path`, bucketed AND
    * sorted by `bucketCol` into `nBuckets` files per writing task's
    * partition. Overwrites both catalog entry and data. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, nBuckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }
}
