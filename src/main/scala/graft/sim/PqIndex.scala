package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.TableIO

/** Build-once / query-many persisted IVF-PQ index — [[AnnIndex]]'s shape
  * for the COMPRESSED index family.
  *
  * [[Ann.pqKnn]] retrains its codebook inside every query plan: right for
  * one-shot analytics, wrong for the serving path — at 10⁹ vectors the
  * training pass (subvector explode + `iters` Lloyd rounds over the whole
  * corpus) re-runs per query batch while the model it converges to is
  * identical every time. [[build]] splits the lifecycle: it freezes the
  * three deterministic artefacts — the per-dimension SQ range table
  * (`dim` rows), the PQ codebook (`M·ksub` rows, KBs), the IVF centroid
  * table (`cells` rows) — and rewrites the corpus as PACKED CODES
  * (vec_id, M small ints) partitioned by home cell. A query batch then
  * pays: quantize itself against the frozen ranges (broadcast), rank
  * `nprobe` cells against the frozen centroids (broadcast), reconstruct
  * and ADC-rank ONLY the probed cells of the codes table (dynamic
  * partition pruning, the e14 contract) — query cost scales with
  * `nprobe/cells` of the COMPRESSED corpus, with zero training flops.
  *
  * Determinism: every expression (range derivation, "pq:"-salted Lloyd
  * seeding, integer-L2 cluster-asc encoding, cosine-desc cell-asc
  * centroid ranking, ADC desc/id-asc ranking) is the exact expression of
  * the inline [[Ann.pqKnn]] chain, and doubles/longs round-trip parquet
  * exactly — so a self-query of the indexed build corpus is
  * bit-identical to inline [[Ann.pqKnn]], which is how the driver oracle
  * checks the persisted model (e18 replays e12's SQL).
  *
  * Tables under `root` (through the [[TableIO]] seam — an Iceberg
  * deployment is configuration): `sq_range` (j, mn, mx), `codebook`
  * (sub, cluster, cv), `centroids` (cell, c), `codes` (vec_id,
  * code array<long>, partition col cell).
  */
object PqIndex {

  private def floatVecs(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  /** Rank each vector's `nprobe` nearest centroids — the one centroid-
    * ranking expression of the whole Ann family ([[Ann.ivfAssign]]'s
    * cosine desc, cell-id asc): (vec_id, cell, rn, e). */
  private def assignCells(v: DataFrame, cent: DataFrame, nprobe: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d").asc, col("cell").asc)
    v.crossJoin(broadcast(cent))
      .withColumn("d", Ann.dot(col("e"), col("c")) /
        (sqrt(Ann.dot(col("e"), col("e"))) * sqrt(Ann.dot(col("c"), col("c")))) * -1)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id"), col("cell"), col("rn"), col("e"))
  }

  private def readCentroids(spark: SparkSession, io: TableIO, root: String) =
    io.read(spark, io.resolve(root, "centroids"))
      .select(col("cell").cast("long").as("cell"), col("c"))

  /** Train and persist the full model + compressed corpus. Overwrites any
    * previous index at `root`. The quantized table is persisted for the
    * duration of the build (codebook training and encoding both consume
    * it) and released before returning. */
  def build(spark: SparkSession, emb: DataFrame, io: TableIO, root: String,
            subspaces: Int = 8, ksub: Int = 16, iters: Int = 1,
            cells: Int = 0): Unit = {
    io.overwrite(Ann.sqRange(emb), io.resolve(root, "sq_range"))
    val rng = broadcast(io.read(spark, io.resolve(root, "sq_range")))
    val qv = Ann.sqQuantizeWith(emb, rng)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (_, book) = Ann.pqModelFromCodes(qv, subspaces, ksub, iters)
      io.overwrite(book, io.resolve(root, "codebook"))
      val bookP = broadcast(io.read(spark, io.resolve(root, "codebook")))

      // IVF centroids: identical stride derivation to Ann.ivfAssign over
      // the identical id set, persisted so append/query rank against the
      // frozen table
      val v = floatVecs(emb)
      val cellsCol =
        if (cells > 0) lit(cells.toLong)
        else greatest(lit(4L),
          least(lit(Ann.MaxAutoCells.toLong), ceil(sqrt(col("n"))).cast("long")))
      val par = v.agg(count(lit(1)).as("n"))
        .select(greatest(lit(1L), floor(col("n") / cellsCol).cast("long")).as("stride"))
      io.overwrite(
        Ann.centroids(v.crossJoin(broadcast(par)), col("stride"))
          .select(col("cell"), col("c")),
        io.resolve(root, "centroids"))
      val cent = broadcast(readCentroids(spark, io, root))

      // packed codes (encoded against the READ-BACK frozen book — the
      // same discipline append uses) partitioned by home cell
      val home = assignCells(v, cent, nprobe = 1)
        .select(col("vec_id"), col("cell"))
      val packed = Ann.pqPack(Ann.pqEncode(qv, bookP, subspaces))
        .join(home, "vec_id")
        .select(col("vec_id"), col("code"), col("cell"))
      io.overwrite(packed, io.resolve(root, "codes"), partitionCols = Seq("cell"))
    } finally qv.unpersist()
  }

  /** Incremental ingest against the FROZEN model: quantize `newVecs`
    * (vec_id, embedding) with the persisted ranges, encode with the
    * persisted codebook, home-assign with the persisted centroids, append
    * to the cell-partitioned codes table — cost scales with the batch,
    * never the corpus. Batch-split invariant like [[AnnIndex.append]]:
    * per-row arithmetic against constant tables, so any split of the same
    * rows yields an identical codes table. Ranges/codebook/centroids
    * drift from the growing corpus until the next [[build]] retrains —
    * the standard serving trade. */
  def append(spark: SparkSession, io: TableIO, root: String,
             newVecs: DataFrame, subspaces: Int = 8): Unit = {
    val rng = broadcast(io.read(spark, io.resolve(root, "sq_range")))
    val book = broadcast(io.read(spark, io.resolve(root, "codebook")))
    val cent = broadcast(readCentroids(spark, io, root))
    val qv = Ann.sqQuantizeWith(newVecs, rng)
    val home = assignCells(floatVecs(newVecs), cent, nprobe = 1)
      .select(col("vec_id"), col("cell"))
    val packed = Ann.pqPack(Ann.pqEncode(qv, book, subspaces))
      .join(home, "vec_id")
      .select(col("vec_id"), col("code"), col("cell"))
    io.append(packed, io.resolve(root, "codes"), partitionCols = Seq("cell"))
  }

  /** ADC top-k of `queries` (vec_id, embedding) against the persisted
    * compressed corpus: the query side quantizes itself against the
    * frozen ranges and keeps its TRUE SQ codes (classic asymmetric
    * distance — only the stored side is compressed); candidates are the
    * probed cells only, read through the partition-column join (DPP
    * prunes the codes scan to nprobe/cells). Output (vec_id, neighbor_id,
    * rank, adot), the exact [[Ann.pqKnn]] semantics: adot desc, id-asc
    * ties, self-matches excluded. */
  def query(spark: SparkSession, io: TableIO, root: String,
            queries: DataFrame, k: Int, nprobe: Int = 4): DataFrame = {
    val rng = broadcast(io.read(spark, io.resolve(root, "sq_range")))
    val cent = broadcast(readCentroids(spark, io, root))
    val book = broadcast(io.read(spark, io.resolve(root, "codebook")))
    val qv = Ann.sqQuantizeWith(queries, rng)
    val probes = assignCells(floatVecs(queries), cent, nprobe)
      .select(col("vec_id"), col("cell"))
      .join(qv, "vec_id")
      .select(col("cell"), col("vec_id").as("a"), col("qv").as("qa"))
    // prune BEFORE reconstructing: the semi-join on the partition column
    // sits directly over the codes scan, so dynamic partition pruning
    // restricts the read to the probed cells; each surviving vector then
    // reconstructs ONCE (not once per matching query)
    val probedCells = probes.select(col("cell").as("cellr")).distinct()
    val cand0 = io.read(spark, io.resolve(root, "codes"))
      .select(col("vec_id"), col("cell").cast("long").as("cellr"), col("code"))
      .join(probedCells, Seq("cellr"), "left_semi")
    val recon = cand0
      .select(col("vec_id"), col("cellr"), posexplode(col("code")).as(Seq("sub", "cluster")))
      .join(broadcast(book), Seq("sub", "cluster"))
      .groupBy("vec_id", "cellr")
      .agg(array_sort(collect_list(struct(col("sub"), col("cv")))).as("a0"))
      .select(col("cellr"), col("vec_id").as("b"),
        flatten(transform(col("a0"), s => s.getField("cv"))).as("rb"))
    val w = Window.partitionBy(col("a")).orderBy(col("adot").desc, col("b").asc)
    probes.join(recon, col("cell") === col("cellr") && col("a") =!= col("b"))
      .withColumn("adot", Ann.intDot(col("qa"), col("rb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("a").as("vec_id"), col("b").as("neighbor_id"),
        col("rank"), col("adot"))
  }
}
