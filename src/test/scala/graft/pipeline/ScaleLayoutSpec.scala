package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two layout techniques must deliver their PLAN guarantees, not just
  * correct rows: bucketed joins carry no Exchange; salted aggregation
  * equals the plain aggregation bit-for-bit on integer-cent values.
  */
class ScaleLayoutSpec extends SparkSpec {

  import spark.implicits._

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a crashed previous run can leave the location without the catalog
    // entry — managed-table creation refuses to reuse it
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = new java.io.File(warehouse, name)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(loc)
    }
  }

  test("bucketed scores ⋈ routes: no Exchange anywhere in the join plan") {
    val routes = (1L to 1000L).map(i => (i, s"route $i", 1000.0 + i))
      .toDF("route_id", "name", "elev")
    val scores = (1L to 1000L).map(i => (i, (i % 101).toDouble))
      .toDF("route_id", "risk_score")
    dropTable("routes_b")
    dropTable("scores_b")
    ScaleLayout.writeBucketed(routes, "routes_b", "route_id", 8)
    ScaleLayout.writeBucketed(scores, "scores_b", "route_id", 8)
    // at the 100 TB tier neither side broadcasts — force the sort-merge
    // path the layout exists for (on tiny test tables Catalyst would
    // broadcast and skip bucketing entirely)
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ScaleLayout.bucketedJoin(spark, "routes_b", "scores_b", "route_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(!plan.contains("Sort ") || plan.contains("SortMergeJoin"),
        s"unexpected plan:\n${plan.take(1500)}")
      assert(joined.count() == 1000)
      // and the same join on unbucketed frames DOES shuffle — the layout,
      // not the data size, is what removed the exchange
      val unbucketed = routes.join(scores, "route_id")
        .queryExecution.executedPlan.toString
      assert(unbucketed.contains("Exchange"),
        "control join unexpectedly exchange-free")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
  }

  test("salted aggregation: skewed key spreads, totals match plain groupBy") {
    // 90% of rows on one hot key, including a byte-identical run — the
    // shape that serializes a plain agg
    val rows = (1L to 10000L).map { i =>
      if (i % 10 != 0) ("hot", (i % 500).toDouble) else (s"cold_${i % 37}", (i % 1000).toDouble)
    }.toDF("key", "value")
    val salted = ScaleLayout.saltedSumAggregate(rows, "key", "value", factor = 16)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val plain = rows.groupBy("key")
      .agg(sum("value").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (s, n)) =>
      assert(salted(k)._2 == n, s"count mismatch for $k")
      assert(math.abs(salted(k)._1 - s) < 1e-6, s"sum mismatch for $k")
    }
    // the content-hash salt spreads the hot key's varying rows over many
    // phase-1 groups (byte-identical rows share a salt, but map-side
    // partial aggregation pre-merges those per task, so they never funnel
    // raw through one reducer)
    val phase1Groups = rows.withColumn("__salt",
      pmod(xxhash64(col("key"), col("value")), lit(16)))
      .where(col("key") === "hot")
      .select("__salt").distinct().count()
    assert(phase1Groups > 8, s"salt spread only $phase1Groups groups")
    // and the salt must be DETERMINISTIC: a nondeterministic expression
    // (monotonically_increasing_id, rand) feeding this shuffle can
    // re-assign rows on task retry after a fetch failure — double-counting
    // or dropping them (the SPARK-23207 failure class)
    val exprs = ScaleLayout.saltedSumAggregate(rows, "key", "value", 16)
      .queryExecution.analyzed.collect { case p => p.expressions }.flatten
    assert(exprs.forall(_.deterministic), "salted agg plan must be deterministic")
    val topkExprs = ScaleLayout.saltedTopK(
      rows, "key", Seq(col("value").desc), k = 5, factor = 16)
      .queryExecution.analyzed.collect { case p => p.expressions }.flatten
    assert(topkExprs.forall(_.deterministic), "salted topK plan must be deterministic")
  }

  test("saltedTopK equals the window top-K on a hot-key corpus") {
    // one domain holds 95% of the rows (the d21 quota shape under skew);
    // the order is total (value desc, id asc) so both forms are
    // deterministic and comparable row-for-row
    val rows = (1L to 20000L).map { i =>
      val key = if (i % 20 != 0) "hot" else s"cold_${i % 13}"
      (key, i, (i * 7919 % 10007).toDouble)
    }.toDF("source", "doc_id", "n_chars")
    val order = Seq(col("n_chars").desc, col("doc_id").asc)
    val viaSalt = ScaleLayout.saltedTopK(rows, "source", order, k = 10, factor = 16)
      .select("source", "doc_id", "rank")
      .as[(String, Long, Int)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(order: _*)
    val viaWindow = rows.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 10)
      .select("source", "doc_id", "rank")
      .as[(String, Long, Int)].collect().toSet
    assert(viaSalt == viaWindow)
    assert(viaSalt.count(_._1 == "hot") == 10)
  }

  test("salting a frame with a MapType column does not fail analysis") {
    // xxhash64 rejects MapType at any nesting depth: the salt must hash a
    // projection of the hashable columns, not every column blindly
    val df = spark.range(100).select(
      (col("id") % 3).cast("string").as("k"),
      col("id").cast("double").as("v"),
      map(lit("tag"), col("id").cast("string")).as("props"))
    val salted = ScaleLayout.saltedSumAggregate(df, "k", "v", factor = 4)
      .orderBy("k").as[(String, Double, Long)].collect()
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("k").as[(String, Double, Long)].collect()
    assert(salted.toSeq == plain.toSeq)
    // and the top-K path analyzes + runs on the same frame
    val top = ScaleLayout.saltedTopK(df, "k",
      Seq(col("v").desc, col("k").asc), k = 5, factor = 4)
    assert(top.count() == 15)
  }

  test("bloom-pruned join: output equals the plain join, probe filters below the exchange") {
    // 50K fact rows over a 20K key space; dim holds 1 in 20 keys (with
    // nulls on both sides, which an inner equi-join must drop) — the probe
    // should pass ~5% true matches + ~1% fpp, far below a full shuffle.
    // Range-backed frames, not toDF: ConvertToLocalRelation would evaluate
    // a filter over a LocalRelation eagerly on the driver, leaving no
    // FilterExec for the plan assertions below
    val fact = spark.range(1, 50001).select(
      when(col("id") % 997 === 0, lit(null)).otherwise(col("id") % 20000).as("k"),
      col("id").as("v"))
    val dim = spark.range(1, 20001).where(col("id") % 20 === 0).select(
      when(col("id") === 20, lit(null)).otherwise(col("id")).as("dk"),
      concat(lit("dim_"), col("id")).as("name"))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // plain (non-adaptive) physical plan so the exchange/filter ancestry
    // below is directly traversable; the op itself runs fine under AQE
    // (d31 goes through the ANSI+AQE gate)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = ScaleLayout.bloomPrunedJoin(fact, dim, "k", "dk", fpp = 0.01)
      // collect the join itself (not a derived projection) so the metric
      // reads below come from this exact executed plan
      val got = joined.collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("v"), r.getAs[String]("name")))
        .toSet
      val want = fact.join(dim, col("k") === col("dk")).select("k", "v", "name")
        .as[(Long, Long, String)].collect().toSet
      assert(got == want, "bloom-pruned join output drifted from the plain join")
      assert(got.nonEmpty && got.forall(_._1 % 20 == 0))
      // plan guarantee: a shuffle exchange on the fact side has the bloom
      // probe Filter BELOW it — pruning happens before rows serialize
      import org.apache.spark.sql.execution.FilterExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      val plan = joined.queryExecution.executedPlan
      val prunedExchanges = plan.collect {
        case e: ShuffleExchangeLike if e.collect {
          case f: FilterExec
            if f.condition.toString.contains("bloommightcontain") => f
        }.nonEmpty => e
      }
      assert(prunedExchanges.nonEmpty,
        s"no shuffle exchange with a bloom-probe filter below it:\n$plan")
      // pruning guarantee: the probe's output is the sliver, not the scan
      val probeFilter = plan.collect {
        case f: FilterExec
          if f.condition.toString.contains("bloommightcontain") => f
      }.head
      val passed = probeFilter.metrics("numOutputRows").value
      assert(passed >= want.size, s"probe dropped matching rows: $passed")
      assert(passed <= 50000 * 0.08,
        s"probe passed $passed of 50000 rows — pruning is not happening")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
