package graft.sim

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline (O(n²) dot
  * products — all codegen'd builtins: zip_with + aggregate). The IVF
  * variant is the scale path: vectors are assigned to the nearest of C
  * deterministic centroids and only same-cell pairs are scored, turning
  * the quadratic cross join into C partition-local joins.
  */
object Ann {

  /** Σ aᵢ·bᵢ as a left-fold (deterministic FP order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact cosine top-k: (vec_id, neighbor_id, rank), rank 1..k by
    * similarity desc, neighbor id asc on ties. Similarity itself is not
    * emitted — ranks are FP-order-stable, raw floats are not. */
  def cosineKnn(emb: DataFrame, k: Int): DataFrame = {
    val v = emb.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val l = v.select(col("vec_id").as("a"), col("e").as("ea"), col("norm").as("na"))
    val r = v.select(col("vec_id").as("b"), col("e").as("eb"), col("norm").as("nb"))
    val sims = l.join(r, col("a") =!= col("b"))
      .withColumn("sim", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
    val w = Window.partitionBy(col("a")).orderBy(col("sim").desc, col("b").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("a").as("vec_id"), col("b").as("neighbor_id"), col("rank"))
  }

  /** IVF cell ranking: for every vector, its `nprobe` nearest of the C
    * centroids (the vectors with the C smallest vec_ids — deterministic,
    * data-derived seeds), rank 1 being the home cell. */
  def ivfAssign(emb: DataFrame, cells: Int, nprobe: Int = 1): DataFrame = {
    val v = emb.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val centroids = v.orderBy(col("vec_id")).limit(cells)
      .select(col("vec_id").as("cell"), col("e").as("c"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d").asc, col("cell").asc)
    v.crossJoin(broadcast(centroids))
      .withColumn("d", dot(col("e"), col("c")) /
        (sqrt(dot(col("e"), col("e"))) * sqrt(dot(col("c"), col("c")))) * -1)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id"), col("cell"), col("e"))
  }

  /** Approximate top-k, classic IVF shape: the INDEX side holds each
    * vector once (home cell); the QUERY side probes its `nprobe` nearest
    * cells and ranks exactly within the probed candidates. Recall rises
    * with nprobe at linear cost; C partition-local joins replace the
    * quadratic cross join of [[cosineKnn]]. */
  def ivfKnn(emb: DataFrame, k: Int, cells: Int = 16, nprobe: Int = 4): DataFrame = {
    val home = ivfAssign(emb, cells, nprobe = 1)
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val probes = ivfAssign(emb, cells, nprobe)
    val l = probes.select(col("cell"), col("vec_id").as("a"), col("e").as("ea"),
      sqrt(dot(col("e"), col("e"))).as("na"))
    val r = home.select(col("cell").as("cellr"), col("vec_id").as("b"), col("e").as("eb"), col("norm").as("nb"))
    val sims = l.join(r, col("cell") === col("cellr") && col("a") =!= col("b"))
      .withColumn("sim", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
    val w = Window.partitionBy(col("a")).orderBy(col("sim").desc, col("b").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("a").as("vec_id"), col("b").as("neighbor_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * via the IVF cells (each pair scored once, a < b). */
  def cosineDupPairs(emb: DataFrame, threshold: Double, cells: Int = 16): DataFrame = {
    val assigned = ivfAssign(emb, cells)
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val l = assigned.select(col("cell"), col("vec_id").as("a"), col("e").as("ea"), col("norm").as("na"))
    val rr = assigned.select(col("cell").as("cellr"), col("vec_id").as("b"), col("e").as("eb"), col("norm").as("nb"))
    l.join(rr, col("cell") === col("cellr") && col("a") < col("b"))
      .withColumn("sim", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"))
  }
}
