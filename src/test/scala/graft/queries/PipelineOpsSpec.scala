package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic properties of the round-4 pipeline-construction operators
  * (d15 decontamination, d16 epoch order, d17 domain mixing, d18 sequence
  * packing) on sf0.001 — the value-level gate is the DuckDB oracle; these
  * pin the invariants a user relies on.
  */
class PipelineOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("d15: contamination is (0, 1] and never flags eval docs themselves") {
    val out = PipelineQueries.queries("d15_decontaminate")(spark, dir)
      .select("doc_id", "contamination").collect()
    assert(out.nonEmpty, "the synthetic corpus should produce 3-gram collisions")
    out.foreach { r =>
      assert(r.getLong(0) % 23 != 0, s"eval doc ${r.getLong(0)} flagged as training")
      val c = r.getDouble(1)
      assert(c > 0.0 && c <= 1.0, s"contamination $c out of range")
    }
  }

  test("d16: epoch order is the md5-key sort, stable across recomputation") {
    val q = PipelineQueries.queries("d16_epoch_order")(spark, dir)
    val once = q.collect().map(_.getLong(0)).toSeq
    val twice = q.collect().map(_.getLong(0)).toSeq
    assert(once == twice, "epoch order must be reproducible")
    val keys = q.collect().map(_.getString(1)).toSeq
    assert(keys == keys.sorted, "rows must come back in shuffle-key order")
  }

  test("d17: integer factors copy exactly; fractional factors stay in range") {
    val src = graft.Tables.documents(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mixed = PipelineQueries.queries("d17_domain_mix")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // es: factor exactly 1.0 → every doc once
    assert(mixed("es") == ((src("es"), src("es"))))
    // de: 2.5 → every doc kept, copies in [2n, 3n]
    val (deSrc, deCopies) = mixed("de")
    assert(deSrc == src("de"))
    assert(deCopies >= 2 * src("de") && deCopies <= 3 * src("de"))
    // en: 0.5 → a strict subset, each kept doc exactly once
    val (enSrc, enCopies) = mixed("en")
    assert(enSrc == enCopies && enSrc < src("en"))
  }

  test("d19: dup-span ratio in [0,1], and the corpus has real collisions") {
    val out = PipelineQueries.queries("d19_dup_spans")(spark, dir)
      .select("n_spans", "n_dup_spans", "dup_span_ratio").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0), "dup spans cannot exceed total spans")
      val ratio = r.getDouble(2)
      assert(ratio >= 0.0 && ratio <= 1.0, s"ratio $ratio out of range")
    }
    assert(out.exists(_.getLong(1) > 0),
      "3-gram spans collide across the synthetic corpus (d15 relies on the same)")
  }

  test("d20: every planted email/phone is found, and redaction removes them") {
    val docs = graft.Tables.documents(spark, dir)
    val planted = docs.select(col("doc_id"),
      PipelineQueries.plantedPii(col("text"), col("doc_id")).as("txt"))
    val redacted = planted.select(col("doc_id"),
      regexp_replace(regexp_replace(col("txt"), PipelineQueries.EmailRe, "<EMAIL>"),
        PipelineQueries.PhoneRe, "<PHONE>").as("txt"))
    // detection: exactly one planted email; phone iff doc_id % 3 != 0
    PipelineQueries.queries("d20_pii_redact")(spark, dir).collect().foreach { r =>
      assert(r.getLong(1) == 1L, s"doc ${r.getLong(0)}: email not found")
      val expPhones = if (r.getLong(0) % 3 != 0) 1L else 0L
      assert(r.getLong(2) == expPhones, s"doc ${r.getLong(0)}: phone count")
    }
    // scrub: no residual matches and the placeholder is present
    val resid = redacted.where(
      regexp_count(col("txt"), lit(PipelineQueries.EmailRe)) > 0 ||
        regexp_count(col("txt"), lit(PipelineQueries.PhoneRe)) > 0).count()
    assert(resid == 0L, "redacted text still matches a PII pattern")
    assert(redacted.where(!col("txt").contains("<EMAIL>")).count() == 0L)
  }

  test("d21: at most 10 docs per source, ranked by length then id") {
    val out = PipelineQueries.queries("d21_domain_quota")(spark, dir).collect()
    val bySource = out.groupBy(_.getString(0))
    bySource.foreach { case (src, rows) =>
      assert(rows.length <= 10, s"$src over quota")
      assert(rows.map(_.getInt(3)).toSeq == (1 to rows.length), s"$src ranks not contiguous")
      val chars = rows.sortBy(_.getInt(3)).map(_.getLong(2)).toSeq
      assert(chars == chars.sorted.reverse, s"$src not ordered by n_chars desc")
    }
  }

  test("d22: freqItems (Misra-Gries sketch) is a superset of the exact heavy hitters") {
    val docs = graft.Tables.documents(spark, dir)
    val toks = docs.select(explode(split(col("text"), " ")).as("term"))
    val total = toks.count()
    val support = 0.02
    val sketch = toks.stat.freqItems(Array("term"), support)
      .head().getSeq[String](0).toSet
    // guarantee: every term with frequency > support*total must be returned
    val mustHave = PipelineQueries.queries("d22_heavy_hitters")(spark, dir)
      .collect().filter(_.getLong(1) > (support * total).toLong)
      .map(_.getString(0)).toSet
    assert(mustHave.nonEmpty, "corpus should have >2% heavy hitters")
    assert(mustHave.subsetOf(sketch),
      s"freqItems missed exact heavy hitters: ${mustHave -- sketch}")
  }

  test("d23: funnel stages only narrow, start at the corpus, end non-empty") {
    val rows = PipelineQueries.queries("d23_corpus_funnel")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(
      "0_all", "1_dedup", "2_decontam", "3_boilerplate", "4_quota", "5_sample"))
    val counts = rows.map(_._2).toSeq
    assert(counts.head == graft.Tables.documents(spark, dir).count())
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel grew at some stage: $counts")
    assert(counts.last > 0, "the pipeline filtered everything out")
    val chars = rows.map(_._3).toSeq
    assert(chars.zip(chars.tail).forall { case (a, b) => b <= a })
  }

  test("d18: chunks conserve tokens per shard and pack near capacity") {
    val docs = graft.Tables.documents(spark, dir)
      .select((col("doc_id") % 8).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy("shard").agg(sum("n_tok").as("total")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val packed = PipelineQueries.queries("d18_seq_packing")(spark, dir)
      .groupBy("shard").agg(sum("n_tokens").as("packed"), max("seq_id").as("last"))
      .collect()
    packed.foreach { r =>
      val shard = r.getLong(0)
      assert(r.getLong(1) == docs(shard), s"shard $shard lost tokens")
      // every chunk id up to the last must exist: offsets are contiguous,
      // so floor(start/512) can skip a value only if a doc spans >512
      // tokens — then the SPAN still covers the skipped chunk
      assert(r.getLong(2) >= (docs(shard) - 1) / 512 - 1)
    }
  }

  // ---- withFloorGauge: the three outcomes a floor-enforced quality gauge
  // must distinguish — healthy, degraded, and UNDEFINED (round-12 advisor:
  // an empty plant population used to surface as a misdiagnosing
  // 'operator degraded' failure; it must be its own distinct error) ------

  private def oneRow = {
    import spark.implicits._
    Seq(1).toDF("x")
  }

  test("floor gauge: healthy gauge rides the row, rounded") {
    import spark.implicits._
    val g = Seq(0.98765).toDF("gauge")
    val out = PipelineQueries.withFloorGauge(oneRow, g, "recall", 0.9).collect()
    assert(out.length == 1 && out.head.getDouble(1) == 0.9877)
  }

  test("floor gauge: below-floor gauge raises the degraded error") {
    import spark.implicits._
    val g = Seq(0.5).toDF("gauge")
    val e = intercept[Exception] {
      PipelineQueries.withFloorGauge(oneRow, g, "recall", 0.9).collect()
    }
    assert(e.getMessage.contains("below floor"), e.getMessage)
  }

  test("floor gauge: empty population (null avg) raises the DISTINCT undefined error") {
    import spark.implicits._
    // avg over zero rows is null — exactly what d06's hamming gauge yields
    // when no doc passes the >=62-token plant filter at a tiny SF
    val g = Seq(1.0).toDF("v").where(col("v") < 0).agg(avg("v").as("gauge"))
    val e = intercept[Exception] {
      PipelineQueries.withFloorGauge(oneRow, g, "recall", 0.9).collect()
    }
    assert(e.getMessage.contains("undefined"), e.getMessage)
    assert(!e.getMessage.contains("below floor"), e.getMessage)
  }

  test("floor gauge: ratioGauge over an empty denominator is undefined, not degraded") {
    import spark.implicits._
    val empty = Seq(1).toDF("x").where(col("x") < 0)
    val g = PipelineQueries.ratioGauge(empty, empty) // 0.0/0.0 = NaN
    val e = intercept[Exception] {
      PipelineQueries.withFloorGauge(oneRow, g, "recall", 0.9).collect()
    }
    assert(e.getMessage.contains("undefined"), e.getMessage)
  }
}
