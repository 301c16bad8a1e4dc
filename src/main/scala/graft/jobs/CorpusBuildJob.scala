package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** The full tier-extraction pipeline as one job — the capstone the other
  * stages compose into: crawl pages → resumable extraction → quality-tier
  * assignment → tier-weighted epoch mix → deterministic train/val/test
  * split → one training corpus written PARTITIONED BY (split, tier).
  *
  * A training reader then prunes at the directory level twice over:
  * "train shard, tier ≥ 2" touches no val/test bytes and no rejected
  * bytes. Every decision along the way is a deterministic hash of the
  * url (mix and split use different salts, so they are independent),
  * which makes the corpus reproducible from scratch: same pages + same
  * seed → byte-identical membership, regardless of cluster size or
  * partition layout.
  *
  * Scale shape: extraction is the [[ExtractionJob]] (resume anti-join,
  * no payload shuffle unless salted); tier rules are narrow equi-joins
  * ([[TextOps.tierAssign]]); mix + split are stateless projections; the
  * single wide-payload move is the final join/write, hinted
  * `shuffle_hash` on the narrow side like [[TierJob]].
  */
object CorpusBuildJob {

  /** Returns per-(split, tier) doc counts of the written corpus. */
  def run(spark: SparkSession, pagesPath: String, outPath: String,
          ratesBp: Map[Int, Int] = Map(0 -> 0, 1 -> 1000, 2 -> 5000, 3 -> 10000),
          seed: String = "mix", runId: String = "corpus"): DataFrame = {
    ExtractionJob.run(spark, JobConfig(pagesPath, outPath, runId = runId))

    val ex = ExtractionJob.readExtracted(spark, s"$outPath/extracted")

    val tiers = TextOps.tierAssign(
        ex.select(col("url").as("doc_id"), col("text")))
      .select(col("doc_id"), col("tier"))
    val kept = TextOps.tierMix(tiers, ratesBp, seed)
    val membership = TextOps.hashSplit(kept)
      .join(kept, "doc_id")
      .select(col("doc_id").as("url"), col("tier"), col("split"))

    ex.join(membership.hint("shuffle_hash"), "url")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("split", "tier").parquet(s"$outPath/corpus")

    spark.read.parquet(s"$outPath/corpus")
      .groupBy("split", "tier").agg(count(lit(1)).as("docs"))
  }
}
