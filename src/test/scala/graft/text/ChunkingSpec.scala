package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  private def doc(id: Long, nTokens: Int) =
    (id, (1 to nTokens).map(i => s"t$i").mkString(" "))

  test("exact windows: starts, sizes, overlap region, short tail") {
    // 10 tokens, max 4, overlap 1 → stride 3 → starts 0,3,6,9
    val out = Chunking.chunk(Seq(doc(1L, 10)).toDF("doc_id", "text"),
      "doc_id", "text", maxTokens = 4, overlap = 1)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getAs[Long]("start_token")).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(out.map(_.getAs[Long]("n_chunk_tokens")).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(out.map(_.getAs[Int]("chunk_idx")).toSeq == Seq(0, 1, 2, 3))
    assert(out(0).getAs[String]("chunk_text") == "t1 t2 t3 t4")
    assert(out(1).getAs[String]("chunk_text") == "t4 t5 t6 t7") // t4 = the overlap
    assert(out(3).getAs[String]("chunk_text") == "t10")
    // every adjacent pair shares exactly `overlap` tokens when both are full
    val c0 = out(0).getAs[String]("chunk_text").split(" ")
    val c1 = out(1).getAs[String]("chunk_text").split(" ")
    assert(c0.takeRight(1).sameElements(c1.take(1)))
  }

  test("degenerate shapes: short doc, exact fit, empty, null") {
    val df = Seq(
      (1L, "a b"),              // shorter than one window
      (2L, "a b c d"),          // exactly one window
      (3L, ""))                 // empty string = one "" token
      .toDF("doc_id", "text")
      .union(Seq.empty[(Long, String)].toDF("doc_id", "text"))
      .union(spark.sql("SELECT 4L AS doc_id, CAST(NULL AS STRING) AS text"))
    val out = Chunking.chunk(df, "doc_id", "text", maxTokens = 4, overlap = 0)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    assert(out(1L).length == 1 && out(1L).head.getAs[Long]("n_chunk_tokens") == 2L)
    assert(out(2L).length == 1 && out(2L).head.getAs[Long]("n_chunk_tokens") == 4L)
    assert(out(3L).length == 1 && out(3L).head.getAs[String]("chunk_text") == "")
    assert(!out.contains(4L)) // null text → nothing to embed → no rows
  }

  test("reconstruction: stride-concatenation of chunks rebuilds the document") {
    // overlap o: dropping each successor's first o tokens and concatenating
    // must reproduce the original token stream exactly
    val text = (1 to 23).map(i => s"w$i").mkString(" ")
    val chunks = Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", maxTokens = 7, overlap = 3)
      .orderBy("chunk_idx")
      .select("chunk_text").as[String].collect()
    val rebuilt = (chunks.head +: chunks.tail.map(_.split(" ").drop(3).mkString(" ")))
      .filter(_.nonEmpty).mkString(" ")
    assert(rebuilt == text)
  }

  test("plan is map-side only: no Exchange, no shuffle") {
    val plan = Chunking.chunk(Seq(doc(1L, 10)).toDF("doc_id", "text"),
      "doc_id", "text", 4, 1).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("contract: invalid window shapes are rejected") {
    val df = Seq(doc(1L, 5)).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunk(df, "doc_id", "text", 0, 0))
    intercept[IllegalArgumentException](Chunking.chunk(df, "doc_id", "text", 4, 4))
    intercept[IllegalArgumentException](Chunking.chunk(df, "doc_id", "text", 4, -1))
  }

  test("unified API: the same chunk() runs unchanged on a STREAM, equal to batch") {
    // map-side ops carry to Structured Streaming verbatim — chunking a
    // live crawl needs no second implementation
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq((1L, (1 to 9).map(i => s"t$i").mkString(" ")),
      (2L, "solo"), (3L, (1 to 5).map(i => s"u$i").mkString(" ")))
    val mem = MemoryStream[(Long, String)]
    val q = Chunking.chunk(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", maxTokens = 4, overlap = 1)
      .writeStream.format("memory").queryName("chunk_stream").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("chunk_stream")
        .select("doc_id", "chunk_idx", "start_token", "chunk_text", "chunk_hash")
        .collect().map(_.toString).sorted.toSeq
      val batch = Chunking.chunk(rows.toDF("doc_id", "text"),
        "doc_id", "text", maxTokens = 4, overlap = 1)
        .select("doc_id", "chunk_idx", "start_token", "chunk_text", "chunk_hash")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
