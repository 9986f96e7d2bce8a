package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (Array[Float]).
  *
  * Dot products are computed with an explicit double-accumulating
  * left-to-right fold so results are bit-identical to a sequential engine
  * (the DuckDB oracle) — no reliance on float summation order.
  */
object Similarity {

  /** Left-to-right double dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (s, p) => s + p)

  /** L2 norm of a float-array column. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Squared L2 distance between a float-array column and a double-array
    * column (centroid), left-to-right.
    */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (s, p) => s + p)

  /** Brute-force cosine top-k: for each query row, rank all candidates.
    * The query side must be small (broadcast); candidates scan distributed.
    * Ranking key is round(sim, 6) DESC then candidate id ASC so that
    * float noise can never flip the order vs the oracle.
    */
  def bruteTopK(
      queries: DataFrame, candidates: DataFrame, k: Int,
      qId: String = "q_id", cId: String = "c_id",
      qVec: String = "q_vec", cVec: String = "c_vec"): DataFrame = {
    val joined = candidates.crossJoin(broadcast(queries))
      .withColumn("sim", round(cosine(col(qVec), col(cVec)), 6))
    val w = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(cId))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col("rank"), col(cId), col("sim"))
  }

  /** IVF-style centroids: per-partition (label) column-wise mean of the
    * embedding, components rounded to `roundTo` decimals so that assignment
    * decisions are stable across engines/agg orders. Returns
    * (label, centroid array<double> ordered by component).
    */
  def centroids(embeddings: DataFrame, vecCol: String, labelCol: String,
      roundTo: Int = 3): DataFrame = {
    embeddings
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(labelCol), col("pos"))
      .agg(round(avg(col("v")), roundTo).as("cv"))
      .groupBy(col(labelCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("centroid"))
  }
}
