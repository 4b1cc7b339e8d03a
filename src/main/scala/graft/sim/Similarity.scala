package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.StatsExprs

/** Vector-similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exact baseline: queries × corpus as a
  * broadcast nested-loop join (queries are the small side), per-pair dot
  * product in codegen'd higher-order functions, rank-filter before any
  * collect. At 100 TB corpus scale the LSH variant bounds the join: random-
  * hyperplane bucketing (sign-bit signature) turns the cross join into an
  * equi-join on bucket, probing only same-bucket candidates (Charikar 2002
  * SimHash / Indyk-Motwani LSH).
  */
object Similarity {

  /** Cosine similarity of two double-array columns (dot/(|a|·|b|)). */
  def cosine(a: Column, b: Column): Column =
    StatsExprs.arrayDot(a, b) /
      (sqrt(StatsExprs.arrayDot(a, a)) * sqrt(StatsExprs.arrayDot(b, b)))

  /** Exact top-k neighbors: for each row of `queries`, the k highest-cosine
    * rows of `corpus`. Both inputs need (`idCol`, `vecCol`); queries are
    * broadcast. Returns (query_id, rank, neighbor_id, cosine).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("q_vec")))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("c_vec"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    q.crossJoin(c)
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Random-hyperplane signature: `bits` sign bits packed into a long.
    * Hyperplane h_i[j] = ±1 derived from xxhash64(i, j) — deterministic, no
    * stored model. Same-signature vectors land in the same bucket.
    */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int): Column = {
    require(bits <= 62, "packed signature must fit a long without overflow")
    val dots = transform(sequence(lit(0), lit(bits - 1)), i =>
      aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (v, j) => when(xxhash64(i, j) % 2 === 0, v).otherwise(-v)),
        lit(0.0), (acc, x) => acc + x))
    // Horner packing (MSB = last hyperplane) — ANSI-safe for bits ≤ 62.
    aggregate(reverse(dots), lit(0L),
      (acc, d) => acc * 2L + when(d > 0, 1L).otherwise(0L))
  }

  /** Approximate top-k via LSH bucketing with multi-probe fallback: probe
    * the exact bucket plus all 1-bit-flip neighbors (bits+1 probes), rank
    * candidates by exact cosine. Trades recall for pruning the corpus scan:
    * with b bits, each query touches ~ (b+1)/2^b of the corpus in
    * expectation.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, dim: Int, bits: Int, k: Int): DataFrame = {
    require(bits <= 16, "multi-probe signature is meant to be short")
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("c_vec"),
      hyperplaneSignature(col(vecCol).cast("array<double>"), dim, bits).as("bucket"))
    // queries fan out to their own bucket + every 1-bit flip (multi-probe)
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("q_vec"),
      hyperplaneSignature(col(vecCol).cast("array<double>"), dim, bits).as("sig"))
      .select(col("query_id"), col("q_vec"),
        explode(concat(array(col("sig")),
          transform(sequence(lit(0), lit(bits - 1)),
            i => col("sig").bitwiseXOR(pow(lit(2.0), i).cast("long"))))).as("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q).join(c, "bucket")
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
      .select("query_id", "neighbor_id", "cosine").distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }
}
