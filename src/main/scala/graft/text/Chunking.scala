package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-document sliding-window chunking — the RAG / context-window
  * preparation op: split each document into token windows of at most
  * `maxTokens`, consecutive windows overlapping by `overlap` tokens so no
  * span of meaning is cut without a duplicate copy. Distinct from d18's
  * sequence PACKING (which concatenates documents into fixed training
  * sequences and never duplicates): chunking stays within one document and
  * deliberately re-emits the overlap region.
  *
  * Entirely map-side — split / sequence / posexplode / slice, no shuffle,
  * whole-stage codegen — so at 100 TB it runs at scan throughput and the
  * output needs no repartition: chunks inherit their parent row's
  * partition, which is exactly the locality a downstream embed-or-index
  * stage wants (ChunkingSpec pins the no-Exchange plan).
  */
object Chunking {

  /** Chunk `textCol` into windows of `maxTokens` whitespace tokens with
    * `overlap` tokens shared between consecutive windows (stride =
    * maxTokens − overlap). Window w covers tokens [w·stride,
    * w·stride + maxTokens); the last window may be short; a document whose
    * token count is ≤ maxTokens yields exactly one window. Null text
    * yields no rows (there is nothing to embed), matching the oracle's
    * `WHERE text IS NOT NULL`. An empty string is one token ("") under the
    * corpus's single-space convention — one chunk — identical to SQL
    * string_split.
    *
    * Output: id, `chunk_idx` (0-based), `start_token`, `n_chunk_tokens`,
    * `chunk_text`, `chunk_hash` (md5 — engine-portable chunk identity for
    * chunk-level exact dedup downstream).
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    require(overlap >= 0 && overlap < maxTokens,
      "overlap must be in [0, maxTokens) — stride must stay positive")
    val stride = maxTokens - overlap
    val toks: Column = TextExprs.tokens(col(textCol))
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(
          sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "start_token")))
      .select(
        col(idCol),
        col("chunk_idx").cast("int").as("chunk_idx"),
        col("start_token").cast("long").as("start_token"),
        least(lit(maxTokens), size(col("__toks")) - col("start_token"))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("start_token") + 1, lit(maxTokens)), " ")
          .as("chunk_text"))
      .withColumn("chunk_hash", md5(col("chunk_text")))
  }

  /** DuckDB twin of [[chunk]] over a `documents(doc_id, text)` table —
    * generated from the SAME maxTokens/overlap so the two can never drift.
    * Same windows, same slice bounds (SQL list slicing clamps at the list
    * end exactly as Spark's `slice` does), same md5 identity.
    */
  def chunkOracleSql(maxTokens: Int, overlap: Int): String = {
    require(overlap >= 0 && overlap < maxTokens)
    val stride = maxTokens - overlap
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |s AS (
       |  SELECT doc_id, toks,
       |         unnest(generate_series(0, greatest(len(toks) - 1, 0), $stride)) AS i
       |  FROM t),
       |c AS (
       |  SELECT doc_id,
       |         CAST(i // $stride AS INT) AS chunk_idx,
       |         CAST(i AS BIGINT) AS start_token,
       |         CAST(least($maxTokens, len(toks) - i) AS BIGINT) AS n_chunk_tokens,
       |         array_to_string(toks[i + 1 : i + $maxTokens], ' ') AS chunk_text
       |  FROM s)
       |SELECT doc_id, chunk_idx, start_token, n_chunk_tokens, chunk_text,
       |       md5(chunk_text) AS chunk_hash
       |FROM c
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }
}
