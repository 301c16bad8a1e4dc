package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.TableIO

/** Build-once / query-many persisted IVF index — the serving shape of
  * the [[Ann]] family.
  *
  * Every `Ann.*` entry point trains its index INSIDE the query plan: the
  * right shape for one-shot analytics, the wrong one for a corpus table
  * that is indexed nightly and probed by many small query batches.
  * [[build]] splits the lifecycle: it materialises the deterministic
  * centroid set once and rewrites the vectors PARTITIONED BY their home
  * cell, so [[query]] touches only the probed cells — the probe set
  * (query batch × nprobe nearest centroids) joins the vectors table on
  * its partition column, and Spark's dynamic partition pruning turns
  * that join into a partition filter on the scan. Query cost then
  * scales with `nprobe/cells` of the corpus, not the corpus: at 10⁹
  * vectors in 4096 cells a 4-probe query batch reads ~0.1% of the
  * table, where the inline [[Ann.ivfKnn]] would re-scan and re-assign
  * all of it.
  *
  * Determinism: centroids, assignment ranking and tie-breaks are the
  * exact expressions of [[Ann.ivfAssign]] (md5-60 "c:" stride seeds,
  * cosine desc, cell-id asc), and doubles round-trip parquet exactly —
  * so a self-query of the indexed corpus is bit-identical to the inline
  * [[Ann.ivfKnn]], which is how the driver oracle checks it (the e14
  * query replays e2's SQL).
  *
  * Tables under `root` (addressed through the [[TableIO]] seam, so an
  * Iceberg deployment is configuration): `vectors` (vec_id, e,
  * partition col cell) and `centroids` (cell, c). The build is two
  * passes: one assignment pass over the input writes `vectors`; the
  * centroid table then re-derives from the WRITTEN narrow table (same
  * stride filter over the same ids — exact), so raw input is scanned
  * once and the cheap second pass reads columnar output.
  */
object AnnIndex {

  /** Train and persist: `root/vectors` (cell-partitioned) +
    * `root/centroids`. Overwrites any previous index at `root`. */
  def build(spark: SparkSession, emb: DataFrame, io: TableIO,
            root: String, cells: Int = 0): Unit = {
    val home = Ann.ivfAssign(emb, cells, nprobe = 1)
      .select(col("vec_id"), col("e"), col("cell"))
    io.overwrite(home, io.resolve(root, "vectors"), partitionCols = Seq("cell"))
    // centroid re-derivation from the persisted narrow table: identical
    // stride arithmetic to Ann.ivfAssign over the identical id set
    val v = io.read(spark, io.resolve(root, "vectors"))
      .select(col("vec_id"), col("e"))
    val cellsCol =
      if (cells > 0) lit(cells.toLong)
      else greatest(lit(4L),
        least(lit(Ann.MaxAutoCells.toLong), ceil(sqrt(col("n"))).cast("long")))
    val par = v.agg(count(lit(1)).as("n"))
      .select(greatest(lit(1L), floor(col("n") / cellsCol).cast("long")).as("stride"))
    val cent = Ann.centroids(v.crossJoin(broadcast(par)), col("stride"))
    io.overwrite(cent.select(col("cell"), col("c")), io.resolve(root, "centroids"))
  }

  /** Incremental ingest: assign `newVecs` (vec_id, embedding) to the
    * EXISTING persisted centroid set and append them to the
    * cell-partitioned vectors table — the hourly-batch path of a
    * nightly-built index. No retrain, no rewrite of resident cells: the
    * only writes are the new rows' own cell partitions (for Parquet a
    * handful of new files; for Iceberg one append snapshot), so ingest
    * cost scales with the batch, never the corpus. Centroids drift from
    * the data distribution as appends accumulate — the standard serving
    * trade — and the next [[build]] re-trains; recall for appended
    * vectors is the same nprobe/cells contract as for resident ones
    * because home assignment uses the identical expression
    * ([[Ann.ivfAssign]]'s cosine-desc, cell-asc tie-break) against the
    * same frozen centroid table. Batch-split invariant: appending one
    * batch or the same rows in any split yields byte-identical tables
    * (per-row assignment against a constant centroid set). */
  def append(spark: SparkSession, io: TableIO, root: String,
             newVecs: DataFrame): Unit = {
    val cent = broadcast(io.read(spark, io.resolve(root, "centroids"))
      .select(col("cell").cast("long").as("cell"), col("c")))
    val v = newVecs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d").asc, col("cell").asc)
    val home = v.crossJoin(cent)
      .withColumn("d", Ann.dot(col("e"), col("c")) /
        (sqrt(Ann.dot(col("e"), col("e"))) * sqrt(Ann.dot(col("c"), col("c")))) * -1)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("e"), col("cell"))
    io.append(home, io.resolve(root, "vectors"), partitionCols = Seq("cell"))
  }

  /** Top-k cosine neighbours of `queries` (vec_id, embedding) from the
    * persisted index: assign each query to its `nprobe` nearest
    * centroids (broadcast centroid table — KB-scale), then join the
    * probe set against ONLY those cells of the vectors table and rank.
    * Output (vec_id, neighbor_id, rank), same rank/tie semantics as
    * [[Ann.ivfKnn]]; a query whose vec_id exists in the index never
    * matches itself. */
  def query(spark: SparkSession, io: TableIO, root: String,
            queries: DataFrame, k: Int, nprobe: Int = 4): DataFrame = {
    val cent = broadcast(io.read(spark, io.resolve(root, "centroids"))
      .select(col("cell").cast("long").as("cell"), col("c")))
    val q = queries.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d").asc, col("cell").asc)
    val probes = q.crossJoin(cent)
      .withColumn("d", Ann.dot(col("e"), col("c")) /
        (sqrt(Ann.dot(col("e"), col("e"))) * sqrt(Ann.dot(col("c"), col("c")))) * -1)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("a"), col("cell"), col("e").as("ea"),
        sqrt(Ann.dot(col("e"), col("e"))).as("na"))
    val vecs = io.read(spark, io.resolve(root, "vectors"))
      .select(col("cell").cast("long").as("cellr"), col("vec_id").as("b"),
        col("e").as("eb"), sqrt(Ann.dot(col("e"), col("e"))).as("nb"))
    val sims = probes
      .join(vecs, col("cell") === col("cellr") && col("a") =!= col("b"))
      .withColumn("sim", Ann.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
    val rk = Window.partitionBy(col("a")).orderBy(col("sim").desc, col("b").asc)
    sims.withColumn("rank", row_number().over(rk))
      .filter(col("rank") <= k)
      .select(col("a").as("vec_id"), col("b").as("neighbor_id"), col("rank"))
  }
}
