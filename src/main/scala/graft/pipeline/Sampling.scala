package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sampling for training-mix construction — the step after domain
  * quotas (d21) and md5-gate stratification (d13): sample documents with
  * probability PROPORTIONAL to a weight (quality score, char count, dedup
  * cluster mass) instead of uniformly.
  *
  * Two forms, one contract (deterministic given the caller's hash column —
  * reruns and task retries see the same sample, the d13 reproducibility
  * requirement):
  *
  *  - [[weightedBernoulli]]: EXPECTED k rows per group, inclusion
  *    probability min(1, k·w/W). One aggregate for the per-group weight
  *    totals (a |groups|-row broadcast), then a MAP-SIDE integer gate —
  *    no shuffle of the data itself, the 100 TB shape. The gate is exact
  *    integer arithmetic (decimal cross-multiplication, no division, no
  *    transcendentals), which is what lets d33 hash-match DuckDB.
  *    INTEGRAL weights only (enforced): fractional quality scores must be
  *    pre-scaled (`round(score * 1000)`) — or use [[weightedTopK]].
  *  - [[weightedTopK]]: EXACTLY k rows per group — the Efraimidis–Spirakis
  *    A-ES weighted reservoir (IPL 2006): rank by ln(u)/w descending
  *    (monotone-equivalent to the paper's u^(1/w) keys) and keep the top
  *    k. Needs a log, so it is spec-verified (exact-k, determinism,
  *    ∝-weight inclusion) rather than oracle-hashed; the ranking itself
  *    reuses the skew-proof saltedTopK machinery via a plain window here
  *    (swap in ScaleLayout.saltedTopK when one group dominates).
  *
  * Hash contract (shared with the sketch family): a NON-NEGATIVE long,
  * uniform on its low 32 bits. Production callers pass
  * `xxhash64(...) & Long.MaxValue`; oracle twins pass the SQL-mirrorable
  * affine family ([[graft.queries.PipelineQueries]]'s d33 uses a Knuth
  * multiplicative hash of doc_id, replayed verbatim in DuckDB).
  * Rows with NULL or non-positive weight are never sampled (nothing to
  * weight by); NULL hashes never pass the gate.
  */
object Sampling {

  /** 2^32 — the uniform's modulus: u32 = hash mod 2^32 ~ U[0, 2^32). */
  val U32Mod = 4294967296L

  /** Include row iff u32/2^32 < k·w/W, cross-multiplied exactly:
    * u32·W < k·w·2^32 in decimal(38,0) (u32 < 2^32, so the products stay
    * ≤ ~10^32 for weight totals up to 10^12 — overflow-free). When
    * k·w ≥ W the right side exceeds any possible left side, so the min(1,·)
    * saturation arm needs no branch.
    */
  def weightedBernoulli(df: DataFrame, groupCol: String, hash: Column,
                        weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"expected sample size k must be positive, got $k")
    // INTEGER-WEIGHT CONTRACT: the exact gate totals weights with a long
    // cast (truncating) but cross-multiplies the per-row weight in
    // decimal (rounding half-up) — for fractional weights the two
    // disagree (a group of quality scores in (0,1) would total W=0 while
    // every row with w ≥ 0.5 passed the gate, ignoring k entirely), so
    // fractional types are rejected here rather than silently mis-sampled.
    // Callers with score weights pre-scale: `round(score * 1000)` as the
    // weight column, or use [[weightedTopK]] (double-keyed) instead.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val wt = df.schema(weightCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(wt),
      s"weightedBernoulli requires an integral weight column, got $wt for " +
        s"'$weightCol' - pre-scale fractional scores (e.g. round(score*1000)) " +
        "or use weightedTopK")
    val totals = df.groupBy(groupCol)
      .agg(sum(col(weightCol).cast("long")).as("__w_total"))
    df.withColumn("__u32", hash % lit(U32Mod))
      .join(broadcast(totals), groupCol)
      .where(col("__u32").cast("decimal(38,0)") * col("__w_total") <
        col(weightCol).cast("decimal(38,0)") * lit(k) * lit(U32Mod))
      .drop("__u32", "__w_total")
  }

  /** Exactly-k weighted sample per group (A-ES): key_i = ln(u_i)/w_i with
    * u_i ∈ (0, 1] from the hash's low 32 bits (+1 so u is never 0), top-k
    * by key descending, `idCol` as the total-order tiebreak. Weights must
    * be positive to participate — rows with w ≤ 0 or NULL are excluded
    * before ranking. Output: input columns plus `rank` (1-based).
    */
  def weightedTopK(df: DataFrame, groupCol: String, hash: Column,
                   weightCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"sample size k must be positive, got $k")
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__aes_key").desc, col(idCol).asc)
    withAesKey(df, hash, weightCol)
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .drop("__aes_key")
  }

  /** Skew-proof [[weightedTopK]]: identical A-ES keys and rank semantics,
    * ranked through [[ScaleLayout.saltedTopK]] — when one group holds most
    * of the corpus (the d21 quota shape), the plain window sorts that
    * whole group in ONE task; the salted form takes partial top-ks per
    * (group, salt) and re-ranks only ≤ k·factor survivors. Lossless for
    * the same reason saltedTopK is (a true top-k row's rank within its
    * salt slice can only be ≤ its global rank); the spec pins equality
    * with the window form on a 95%-hot pool.
    */
  def weightedTopKSalted(df: DataFrame, groupCol: String, hash: Column,
                         weightCol: String, idCol: String, k: Int,
                         factor: Int): DataFrame = {
    require(k > 0, s"sample size k must be positive, got $k")
    ScaleLayout.saltedTopK(withAesKey(df, hash, weightCol), groupCol,
        Seq(col("__aes_key").desc, col(idCol).asc), k, factor)
      .drop("__aes_key")
  }

  private def withAesKey(df: DataFrame, hash: Column, weightCol: String): DataFrame = {
    val u = (hash % lit(U32Mod) + lit(1L)).cast("double") / U32Mod.toDouble
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__aes_key", log(u) / col(weightCol).cast("double"))
  }
}
