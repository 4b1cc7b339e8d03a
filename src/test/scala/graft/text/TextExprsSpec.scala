package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Null/edge semantics of the text operators — the corpus tables never
  * carry nulls, so the oracle gate can't see these; pin them here.
  */
class TextExprsSpec extends SparkSpec {

  import spark.implicits._

  test("null text: unhashable everywhere, not an alias of the empty document") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("")), (3L, Some("a b c d")))
      .toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
      TextExprs.shingleHashes(col("text"), 3).as("sh"),
      TextExprs.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).isNullAt(1), "null text must yield null shingles")
    assert(rows(1L).isNullAt(2))
    assert(!rows(2L).isNullAt(1), "empty text is a real (degenerate) document")
    // and the null doc therefore produces NO signature row downstream
    val sigs = graft.dedup.Dedup.minhashSignatures(df, "doc_id", "text", 4, 3)
      .select("doc_id").as[Long].collect().toSet
    assert(sigs == Set(2L, 3L))
  }

  test("langIdGuess: fraction scoring beats longer lists; null text → null") {
    // 'aa' has 4 markers, 'bb' has 1: a text hitting bb's single marker
    // (fraction 1.0) but two of aa's four (0.5) must guess bb — a raw
    // count (2 > 1) would wrongly pick aa
    val markers = Map(
      "aa" -> Seq("alpha", "beta", "gamma", "delta"),
      "bb" -> Seq("omega"))
    val guess = Seq("alpha beta omega").toDF("text")
      .select(TextExprs.langIdGuess(col("text"), markers).as("g"))
      .head().getString(0)
    assert(guess == "bb", s"fraction scoring broken: guessed $guess")
    val nullGuess = Seq(Option.empty[String]).toDF("text")
      .select(TextExprs.langIdGuess(col("text"), markers).as("g"))
      .head()
    assert(nullGuess.isNullAt(0), "null text must not be classified")
  }

  test("degenerate parameters are refused at plan construction, not runtime") {
    // an empty marker list used to crash with an opaque empty.reduce (and
    // would divide by zero); now a clear require message names the language
    val e1 = intercept[IllegalArgumentException] {
      TextExprs.langIdGuess(lit("x"), Map("en" -> Seq("the"), "xx" -> Seq.empty))
    }
    assert(e1.getMessage.contains("xx"))
    // w = 0 used to give EVERY doc the single shingle xxhash64("") — all
    // documents became jaccard-1.0 "near-dups" with no error
    val e2 = intercept[IllegalArgumentException] {
      TextExprs.shingleHashes(lit("a b c"), 0)
    }
    assert(e2.getMessage.contains("width"))
  }
}
