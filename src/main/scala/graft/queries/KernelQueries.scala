package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.{GeoExprs, WeightExprs}
import graft.kernel.SafetyKernel

/** The safety-scoring kernel (SURVEY §2.6-2.7), oracle-checked against
  * DuckDB on the deterministically derived routes/accidents tables
  * ([[Derived]] / [[Sql]]). Each query isolates one scalar factor (F1-F16);
  * k08-k10 run the full composed kernel end-to-end.
  */
object KernelQueries {

  // single-sourced from the kernel — see SafetyKernel.CanonicalTypes
  private val CanonicalTypes = SafetyKernel.CanonicalTypes

  /** Paths queued for recursive deletion at JVM exit. One hook, a
    * concurrent set of paths: k30 may run many times per JVM (bench
    * repeats, verify + spec in one sbt session) and each invocation's
    * pid-unique scratch must go when the JVM does — `File.deleteOnExit`
    * cannot remove non-empty directories, so it never actually worked
    * for a parquet table.
    */
  private val scratchAtExit =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val scratchHookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchAtExit.forEach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(new java.io.File(p))
      }))

  private[queries] def registerScratchCleanup(path: String): Unit = {
    scratchHookInstalled
    scratchAtExit.add(path)
  }

  private def typesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    CanonicalTypes.toDF("route_type")
  }

  private val typesValues =
    "(VALUES " + CanonicalTypes.map(t => s"('$t')").mkString(", ") + ") t(route_type)"

  private def withDomain(body: String): String =
    s"WITH ${Sql.RoutesCte},\n${Sql.AccidentsCte}\n$body"

  /** Small route subset for per-pair factor dumps (200 × 100 pairs). */
  private def routeSubset(s: SparkSession, dir: String): DataFrame =
    Derived.routes(s, dir).where(col("route_id") <= 200)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k01_haversine" -> ((s, dir) => {
      routeSubset(s, dir).crossJoin(broadcast(Derived.accidents(s, dir)))
        .select(
          col("route_id"), col("accident_id"),
          round(GeoExprs.haversineKm(col("lat"), col("lon"), col("a_lat"), col("a_lon")), 6)
            .as("dist_km"),
          round(GeoExprs.bearingDeg(col("lat"), col("lon"), col("a_lat"), col("a_lon")), 6)
            .as("bearing_deg"))
        .orderBy("route_id", "accident_id")
    }),

    // --- P7 boundary coverage: weatherFactor over a wsim ramp spanning
    // the exclusion threshold. Closes the round-8 mutation-check hole:
    // real weather similarities in the test data never fall below 0.25,
    // so the silence arm (wsim < 0.25 → EXACTLY 0) was dead in every
    // other oracle query — a mutated arm value, or < flipped to <= (the
    // ramp includes wsim = 0.25 exactly, an exact binary double), now
    // fails this query's hash.
    "k22_weather_factor" -> ((s, dir) => {
      Derived.accidents(s, dir)
        .select(col("accident_id"),
          (((col("accident_id") * 25) % 101).cast("double") / 100.0).as("wsim"))
        .withColumn("wfactor", round(WeightExprs.weatherFactor(col("wsim")), 6))
        .orderBy("accident_id")
    }),

    "k02_spatial_weight" -> ((s, dir) => {
      routeSubset(s, dir).crossJoin(broadcast(Derived.accidents(s, dir)))
        .withColumn("dist_km",
          GeoExprs.haversineKm(col("lat"), col("lon"), col("a_lat"), col("a_lon")))
        .select(
          col("route_id"), col("accident_id"),
          round(WeightExprs.spatialWeight(col("dist_km"), col("route_type")), 6)
            .as("spatial_w"))
        .orderBy("route_id", "accident_id")
    }),

    "k03_temporal_weight" -> ((s, dir) => {
      typesDf(s).crossJoin(broadcast(Derived.accidents(s, dir)))
        .select(
          col("route_type"), col("accident_id"),
          round(WeightExprs.temporalWeight(Derived.planDate, col("a_date"), col("route_type")), 6)
            .as("temporal_w"))
        .orderBy("route_type", "accident_id")
    }),

    "k04_severity_weight" -> ((s, dir) => {
      Derived.accidents(s, dir)
        .select(
          col("accident_id"), col("severity_raw"),
          WeightExprs.normalizeSeverity(col("severity_raw")).as("severity_level"),
          WeightExprs.severityWeight(WeightExprs.normalizeSeverity(col("severity_raw")))
            .as("severity_norm_w"),
          WeightExprs.severityWeightKernel(col("severity_raw")).as("severity_w"))
        .orderBy("accident_id")
    }),

    "k05_elevation_weight" -> ((s, dir) => {
      routeSubset(s, dir).crossJoin(broadcast(Derived.accidents(s, dir)))
        .select(
          col("route_id"), col("accident_id"),
          round(WeightExprs.elevationWeight(col("elev"), col("a_elev"), col("route_type")), 6)
            .as("elevation_w"))
        .orderBy("route_id", "accident_id")
    }),

    "k06_grade_weight" -> ((s, dir) => {
      routeSubset(s, dir).crossJoin(broadcast(Derived.accidents(s, dir)))
        .select(
          col("route_id"), col("accident_id"),
          round(WeightExprs.gradeWeight(col("difficulty"), col("a_difficulty")), 6)
            .as("grade_w"))
        .orderBy("route_id", "accident_id")
    }),

    "k07_route_type_weight" -> ((s, dir) => {
      typesDf(s).crossJoin(broadcast(
        Derived.accidents(s, dir).select("accident_id", "acc_type")))
        .select(
          col("route_type"), col("accident_id"), col("acc_type"),
          WeightExprs.routeTypeWeight(col("route_type"), col("acc_type")).as("route_type_w"))
        .orderBy("route_type", "accident_id")
    }),

    // The full kernel: ~2K routes × 100 accidents broadcast cross join →
    // per-route risk. The flagship operator (SURVEY §2.7 / J2 / A1 / F16).
    "k08_kernel_risk" -> ((s, dir) => {
      SafetyKernel.scoreRoutes(
        Derived.routes(s, dir), Derived.accidents(s, dir), Derived.planDate)
        .select(
          col("route_id"),
          round(col("risk_score"), 4).as("risk_score"),
          col("n_contributing"))
        .orderBy("route_id")
    }),

    // W1 top-k contributing accidents, rank-filtered before any collect.
    "k09_kernel_topk" -> ((s, dir) => {
      val pairs = SafetyKernel.pairInfluence(
        Derived.routes(s, dir).where(col("route_id") <= 300),
        Derived.accidents(s, dir), Derived.planDate)
      SafetyKernel.topContributors(pairs, 5)
        .select(
          col("route_id"), col("rank"), col("accident_id"),
          round(col("influence"), 6).as("influence"))
        .orderBy("route_id", "rank")
    }),

    // F15 color coding over the full kernel risk distribution.
    "k10_color_hist" -> ((s, dir) => {
      SafetyKernel.scoreRoutes(
        Derived.routes(s, dir), Derived.accidents(s, dir), Derived.planDate)
        .groupBy("color_code").agg(count(lit(1)).as("n_routes"))
        .orderBy("color_code")
    }),

    // §2.7 complete: kernel with REAL per-accident weather similarity —
    // now the FULL reference dataflow: weather ROWS table → 7-day window
    // join → defaults → sort_array(collect_list) assembly → ≥5-day
    // validity → A5 similarity (invalid accidents: neutral 0.5,
    // safety_algorithm.py:265-269) → quadratic weather factor → kernel.
    "k14_kernel_weather" -> ((s, dir) => {
      val accWithSim = graft.weather.WeatherAssembly.accidentsWithSimilarity(
        Derived.accidents(s, dir),
        Derived.weatherRows(s, dir),
        Derived.weatherPattern(lit(Derived.CurrentKey)))
      SafetyKernel.scoreRoutes(
        Derived.routes(s, dir).where(col("route_id") <= 300),
        accWithSim, Derived.planDate)
        .select(
          col("route_id"),
          round(col("risk_score"), 4).as("risk_score"),
          col("n_contributing"))
        .orderBy("route_id")
    }),

    // §3.2/§4.2: the LOCATION-FACTORIZED batch kernel — the reference's
    // production engine with its own semantics (cubic weather, constant
    // seasonal boost, penalize-only elevation, mode-type parameters,
    // per-route type/grade adjustment, 25/50/75 colors), kernel cost
    // scaling with |locations| not |routes|.
    "k18_location_kernel" -> ((s, dir) => {
      val accWithSim = graft.weather.WeatherAssembly.accidentsWithSimilarity(
        Derived.accidents(s, dir),
        Derived.weatherRows(s, dir),
        Derived.weatherPattern(lit(Derived.CurrentKey)))
      graft.kernel.LocationKernel.scoreRoutesViaLocations(
        Derived.routesWithLocation(s, dir),
        Derived.locations(s, dir),
        accWithSim, Derived.planDate)
        .select(
          col("route_id"),
          round(col("risk_score"), 4).as("risk_score"),
          col("n_contributing"), col("color_code"))
        .orderBy("route_id")
    }),

    // Cache-warming twin (cache_warming.py:25-154): top-200 valid-coord
    // routes × next-7-days, kernel-scored in ONE batch — the reference's
    // 1400 sequential predict calls as a single date-expanded plan.
    "k19_cache_warming" -> ((s, dir) => {
      graft.kernel.Predict.warmPopularRoutes(
        Derived.routes(s, dir), Derived.accidents(s, dir), Derived.planDate)
        .orderBy("route_id", "target_date")
    }),

    // S2 spatial radius scan through the NATIVE predicate + optimizer rule:
    // geo_within_km is one Catalyst node, so SpatialBboxRule injects the
    // implied lat/lon range predicates (parquet-pushable, z-order-skippable
    // at 100 TB — SpatialBboxRuleSpec proves pushdown + losslessness); the
    // DuckDB oracle re-derives the same rows from the raw haversine.
    "k20_geo_radius" -> ((s, dir) => {
      graft.sql.GraftFunctions.register(s)
      Derived.routes(s, dir)
        .where(graft.expr.GeoWithinKm.geoWithinKm(
          col("lat"), col("lon"), lit(40.0), lit(-115.0), lit(350.0)))
        .select(col("route_id"), col("lat"), col("lon"),
          round(GeoExprs.haversineKm(col("lat"), col("lon"), lit(40.0), lit(-115.0)), 6)
            .as("dist_km"))
        .orderBy("route_id")
    }),

    // Z-order layout key (the 100 TB geo-layout primitive GeoLayoutSpec
    // measures file-skipping with) — previously spec-only; the oracle
    // re-derives quantization + bit interleave from the same constants.
    "k21_morton_key" -> ((s, dir) => {
      Derived.routes(s, dir)
        .select(col("route_id"),
          GeoExprs.mortonKey(col("lat"), col("lon"), 16).as("zkey"))
        .orderBy("route_id")
    }),

    // --- S8/S9/S10 READ-BACK oracle: the score SINK relationally pinned
    // (VERDICT r10 ask #1 — the last spec-only §2 class). The pipeline
    // runs END-TO-END into a scratch dir: nightly write of 3 date
    // partitions (S8 writeScores, dynamic partition overwrite), a
    // row-grain MERGE upsert re-scoring routes ≤ 100 of the middle date
    // against a different accident subset (S9 mergeScores: semi-join
    // partition prune + anti-join on the updated keys + union +
    // overwrite), then S10 retention dropping the oldest date — and the
    // parquet is read BACK and hash-compared against DuckDB deriving the
    // same final table (initial write ∪ overwritten rows, post-retention).
    // calculated_at (current_timestamp) is excluded: wall-clock is the
    // one column no oracle can mirror.
    "k30_score_sink_roundtrip" -> ((s, dir) => {
      import graft.pipeline.ScoringPipeline
      // PID-unique: two concurrent Verify processes at the same SF (e.g.
      // the default and ANSI gates overlapping) must not share a table
      val tmpRoot = new java.io.File(sys.props("java.io.tmpdir"))
      val scratch = new java.io.File(tmpRoot,
        s"graft_k30_${Integer.toHexString(dir.hashCode)}_${ProcessHandle.current().pid()}")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      // the returned DataFrame reads the parquet LAZILY, so this run's
      // scratch cannot be deleted here — sweep every graft_k30_* table
      // whose owning pid is gone (dead-pid dirs are prior processes'
      // leaks), and register our own for deletion at JVM exit. Without
      // the sweep each verify process left one table behind (round-11
      // advisor finding).
      Option(tmpRoot.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("graft_k30_")).foreach { f =>
          val ownerAlive = f.getName.split("_").lastOption
            .flatMap(p => scala.util.Try(p.toLong).toOption)
            .exists(pid => ProcessHandle.of(pid).isPresent)
          if (!ownerAlive) rm(f)
        }
      rm(scratch) // a previous SAME-pid run's table must not leak into this one
      // deleteOnExit() can't remove a NON-EMPTY directory (round-12 advisor:
      // every verify run leaked its table until a later run's dead-pid sweep,
      // and pid reuse could keep a leak alive) — a recursive shutdown hook
      // actually deletes it; the dead-pid sweep stays as the crash backstop
      KernelQueries.registerScratchCleanup(scratch.getAbsolutePath)
      val out = scratch.getAbsolutePath
      val routes = Derived.routes(s, dir)
      val accidents = Derived.accidents(s, dir)
      ScoringPipeline.writeScores(
        ScoringPipeline.computeDailyScores(routes, accidents,
          Seq("2024-07-14", "2024-07-15", "2024-07-16")), out)
      val updates = SafetyKernel.scoreRoutes(
          routes.where(col("route_id") <= 100),
          accidents.where(col("accident_id") <= 50), to_date(lit("2024-07-15")))
        .withColumn("prediction_date", to_date(lit("2024-07-15")))
        .withColumn("calculated_at", current_timestamp())
      ScoringPipeline.mergeScores(s, updates, out)
      ScoringPipeline.retainDates(s, out, Seq("2024-07-15", "2024-07-16"))
      s.read.parquet(out).select(
          col("route_id"), col("prediction_date"),
          round(col("risk_score"), 4).as("risk_score"),
          col("n_contributing"), col("color_code"))
        .orderBy("prediction_date", "route_id")
    }),

    // §2.7 + A7: the kernel with EXTREME-WEATHER AMPLIFICATION — archive
    // stats (A6) → per-route-bucket multiplier (A7) broadcast onto the
    // route side, per-accident assembled similarity (S4→A5) on the
    // accident side, weather factor computed per pair from the amplified
    // similarity wsim × wmult (weather_similarity.py:473, batch per-bucket
    // caching safety_computation_optimized.py:516-560).
    "k16_kernel_extreme" -> ((s, dir) => {
      val accWithSim = graft.weather.WeatherAssembly.accidentsWithSimilarity(
        Derived.accidents(s, dir),
        Derived.weatherRows(s, dir),
        Derived.weatherPattern(lit(Derived.CurrentKey)))
      val mult = WeatherQueries.bucketMultipliers(s, dir)
        .select(col("bucket"), col("wmult"))
      val routes = Derived.routes(s, dir).where(col("route_id") <= 300)
        .withColumn("bucket", col("route_id") % 10)
        .join(broadcast(mult), Seq("bucket"))
        .drop("bucket")
      SafetyKernel.scoreRoutes(routes, accWithSim, Derived.planDate)
        .select(
          col("route_id"),
          round(col("risk_score"), 4).as("risk_score"),
          col("n_contributing"))
        .orderBy("route_id")
    }))

  private val distExpr = Sql.haversine("lat", "lon", "a_lat", "a_lon")

  val oracles: Map[String, String] = Map(
    "k21_morton_key" -> withDomain(
      s"""SELECT route_id,
         |       ${graft.expr.GeoExprs.mortonKeySql("lat", "lon", 16)} AS zkey
         |FROM routes
         |ORDER BY route_id""".stripMargin),

    "k01_haversine" -> withDomain(
      s"""SELECT route_id, accident_id,
         |       round($distExpr, 6) AS dist_km,
         |       round(${Sql.bearing("lat", "lon", "a_lat", "a_lon")}, 6) AS bearing_deg
         |FROM routes CROSS JOIN accidents
         |WHERE route_id <= 200
         |ORDER BY route_id, accident_id""".stripMargin),

    "k22_weather_factor" -> withDomain(
      s"""SELECT accident_id,
         |       CAST((accident_id * 25) % 101 AS DOUBLE) / 100.0 AS wsim,
         |       round(CASE WHEN CAST((accident_id * 25) % 101 AS DOUBLE) / 100.0 < ${WeightExprs.WeatherExclusionThreshold}
         |             THEN 0.0
         |             ELSE pow(CAST((accident_id * 25) % 101 AS DOUBLE) / 100.0, ${WeightExprs.WeatherPower}) END, 6) AS wfactor
         |FROM accidents
         |ORDER BY accident_id""".stripMargin),

    "k02_spatial_weight" -> withDomain(
      s"""SELECT route_id, accident_id,
         |       round(${Sql.spatialWeight(distExpr, "route_type")}, 6) AS spatial_w
         |FROM routes CROSS JOIN accidents
         |WHERE route_id <= 200
         |ORDER BY route_id, accident_id""".stripMargin),

    "k03_temporal_weight" -> withDomain(
      s"""SELECT route_type, accident_id,
         |       round(${Sql.temporalWeight(Sql.PlanDate, "a_date", "route_type")}, 6) AS temporal_w
         |FROM $typesValues CROSS JOIN accidents
         |ORDER BY route_type, accident_id""".stripMargin),

    "k04_severity_weight" -> withDomain(
      s"""SELECT accident_id, severity_raw,
         |       ${Sql.severityLevelCase("severity_raw")} AS severity_level,
         |       ${Sql.severityNormWeight("severity_raw")} AS severity_norm_w,
         |       ${Sql.severityWeight("severity_raw")} AS severity_w
         |FROM accidents
         |ORDER BY accident_id""".stripMargin),

    "k05_elevation_weight" -> withDomain(
      s"""SELECT route_id, accident_id,
         |       round(${Sql.elevationWeight("elev", "a_elev", "route_type")}, 6) AS elevation_w
         |FROM routes CROSS JOIN accidents
         |WHERE route_id <= 200
         |ORDER BY route_id, accident_id""".stripMargin),

    "k06_grade_weight" -> withDomain(
      s"""SELECT route_id, accident_id,
         |       round(${Sql.gradeWeight("difficulty", "a_difficulty")}, 6) AS grade_w
         |FROM routes CROSS JOIN accidents
         |WHERE route_id <= 200
         |ORDER BY route_id, accident_id""".stripMargin),

    "k07_route_type_weight" -> withDomain(
      s"""SELECT route_type, accident_id, acc_type,
         |       ${Sql.routeTypeWeight("route_type", "acc_type")} AS route_type_w
         |FROM $typesValues CROSS JOIN accidents
         |ORDER BY route_type, accident_id""".stripMargin),

    "k08_kernel_risk" -> withDomain(
      s""", ${Sql.influencePairsCte()}
         |SELECT route_id,
         |       round(${Sql.normalizeRisk("sum(influence)")}, 4) AS risk_score,
         |       count(*) FILTER (WHERE influence > ${SafetyKernel.SignificanceFloor}) AS n_contributing
         |FROM influences
         |GROUP BY route_id
         |ORDER BY route_id""".stripMargin),

    "k09_kernel_topk" -> withDomain(
      s""", ${Sql.influencePairsCte()},
         |ranked AS (
         |  SELECT route_id, accident_id, influence,
         |         row_number() OVER (PARTITION BY route_id
         |                            ORDER BY influence DESC, accident_id ASC) AS rank
         |  FROM influences
         |  WHERE route_id <= 300)
         |SELECT route_id, rank, accident_id, round(influence, 6) AS influence
         |FROM ranked WHERE rank <= 5
         |ORDER BY route_id, rank""".stripMargin),

    // Final-table oracle for the sink round-trip: the nightly covers all 3
    // dates; the merge REPLACES (route ≤ 100, 2024-07-15) with scores from
    // the accident-≤-50 subset; retention then drops 2024-07-14 — the
    // WHERE on `merged` mirrors exactly that survivor set.
    "k30_score_sink_roundtrip" -> withDomain {
      def kernelPairs(from: String, planDate: String): String =
        s"""SELECT route_id, accident_id,
           |       (${Sql.spatialWeight(distExpr, "route_type")})
           |       * (${Sql.temporalWeight(planDate, "a_date", "route_type")})
           |       * (${Sql.elevationWeight("elev", "a_elev", "route_type")})
           |       * (${Sql.routeTypeWeight("route_type", "acc_type")})
           |       * (${Sql.severityWeight("severity_raw")})
           |       * (${Sql.gradeWeight("difficulty", "a_difficulty")})
           |       * (${Sql.weatherFactor("0.5")}) AS influence
           |FROM $from""".stripMargin
      s""", dts AS (SELECT (DATE '2024-07-14' + CAST(d AS INT)) AS prediction_date
         |          FROM range(3) t(d)),
         |nightly AS (
         |${kernelPairs("routes CROSS JOIN dts CROSS JOIN accidents", "prediction_date")
          .replaceFirst("SELECT", "  SELECT prediction_date,")}),
         |upd AS (
         |${kernelPairs("routes CROSS JOIN accidents", "DATE '2024-07-15'")
          .replaceFirst("SELECT", "  SELECT DATE '2024-07-15' AS prediction_date,")}
         |  WHERE route_id <= 100 AND accident_id <= 50),
         |merged AS (
         |  SELECT * FROM nightly
         |  WHERE prediction_date >= DATE '2024-07-15'  -- retention drops 07-14
         |    AND NOT (prediction_date = DATE '2024-07-15' AND route_id <= 100)
         |  UNION ALL SELECT * FROM upd)
         |SELECT route_id, prediction_date,
         |       round(${Sql.normalizeRisk("sum(influence)")}, 4) AS risk_score,
         |       count(*) FILTER (WHERE influence > ${SafetyKernel.SignificanceFloor})
         |         AS n_contributing,
         |       ${Sql.colorCase(Sql.normalizeRisk("sum(influence)"))} AS color_code
         |FROM merged
         |GROUP BY route_id, prediction_date
         |ORDER BY prediction_date, route_id""".stripMargin
    },

    "k19_cache_warming" -> withDomain(
      s""", top AS (SELECT * FROM routes
         |          WHERE lat IS NOT NULL AND lon IS NOT NULL
         |          ORDER BY route_id LIMIT 200),
         |dts AS (SELECT (${Sql.PlanDate} + CAST(d AS INT)) AS target_date
         |        FROM range(7) t(d)),
         |winfl AS (
         |  SELECT route_id, target_date,
         |         (${Sql.spatialWeight(distExpr, "route_type")})
         |         * (${Sql.temporalWeight("target_date", "a_date", "route_type")})
         |         * (${Sql.elevationWeight("elev", "a_elev", "route_type")})
         |         * (${Sql.routeTypeWeight("route_type", "acc_type")})
         |         * (${Sql.severityWeight("severity_raw")})
         |         * (${Sql.gradeWeight("difficulty", "a_difficulty")})
         |         * (${Sql.weatherFactor("0.5")}) AS influence
         |  FROM top CROSS JOIN dts CROSS JOIN accidents)
         |SELECT route_id, target_date,
         |       round(${Sql.normalizeRisk("sum(influence)")}, 1) AS risk_score,
         |       ${Sql.colorCase(Sql.normalizeRisk("sum(influence)"))} AS color_code
         |FROM winfl
         |GROUP BY route_id, target_date
         |ORDER BY route_id, target_date""".stripMargin),

    // the filter predicate itself is unrounded in both engines (grid-spaced
    // synthetic coordinates sit ≫ 1 ulp from the 350 km cutoff)
    "k20_geo_radius" -> withDomain(
      s"""SELECT route_id, lat, lon,
         |       round(${Sql.haversine("lat", "lon", "40.0", "-115.0")}, 6) AS dist_km
         |FROM routes
         |WHERE ${Sql.haversine("lat", "lon", "40.0", "-115.0")} <= 350.0
         |ORDER BY route_id""".stripMargin),

    "k14_kernel_weather" -> withDomain(
      s""", ${WeatherQueries.assembledSimilarityCtes},
         |acc2 AS (SELECT a.*, coalesce(sims.wsim, ${SafetyKernel.NeutralWeatherSimilarity})
         |           AS wsim
         |         FROM accidents a LEFT JOIN sims USING (accident_id)),
         |${Sql.pairInfluenceSelectFrom("routes CROSS JOIN acc2", ", wsim")
        .replaceFirst("SELECT", "wpairs AS (SELECT")}),
         |winfl AS (
         |  SELECT route_id, accident_id,
         |         spatial_w * temporal_w * elevation_w * route_type_w * severity_w * grade_w * (${Sql.weatherFactor("wsim")}) AS influence
         |  FROM wpairs)
         |SELECT route_id,
         |       round(${Sql.normalizeRisk("sum(influence)")}, 4) AS risk_score,
         |       count(*) FILTER (WHERE influence > ${SafetyKernel.SignificanceFloor}) AS n_contributing
         |FROM winfl
         |WHERE route_id <= 300
         |GROUP BY route_id
         |ORDER BY route_id""".stripMargin),

    "k16_kernel_extreme" -> withDomain(
      s""", ${WeatherQueries.assembledSimilarityCtes},
         |acc2 AS (SELECT a.*, coalesce(sims.wsim, ${SafetyKernel.NeutralWeatherSimilarity})
         |           AS wsim
         |         FROM accidents a LEFT JOIN sims USING (accident_id)),
         |${Sql.extremeMultCtes(7, Derived.CurrentKey.toString)},
         |routes2 AS (
         |  SELECT r.*, m.wmult
         |  FROM (SELECT *, route_id % 10 AS bucket FROM routes WHERE route_id <= 300) r
         |  JOIN mult m USING (bucket)),
         |${Sql.pairInfluenceSelectFrom("routes2 CROSS JOIN acc2", ", wsim, wmult")
        .replaceFirst("SELECT", "wpairs AS (SELECT")}),
         |winfl AS (
         |  SELECT route_id, accident_id,
         |         spatial_w * temporal_w * elevation_w * route_type_w * severity_w * grade_w * (${Sql.weatherFactor("wsim * wmult")}) AS influence
         |  FROM wpairs)
         |SELECT route_id,
         |       round(${Sql.normalizeRisk("sum(influence)")}, 4) AS risk_score,
         |       count(*) FILTER (WHERE influence > ${SafetyKernel.SignificanceFloor}) AS n_contributing
         |FROM winfl
         |GROUP BY route_id
         |ORDER BY route_id""".stripMargin),

    "k18_location_kernel" -> withDomain(
      s""", ${WeatherQueries.assembledSimilarityCtes},
         |acc2 AS (SELECT a.*, coalesce(sims.wsim, ${SafetyKernel.NeutralWeatherSimilarity})
         |           AS wsim
         |         FROM accidents a LEFT JOIN sims USING (accident_id)),
         |${Sql.LocationsCte},
         |base AS (
         |  SELECT location_id, accident_id, acc_type, a_difficulty,
         |         (${Sql.spatialWeight(Sql.haversine("loc_lat", "loc_lon", "a_lat", "a_lon"),
              "coalesce(loc_type, 'trad')")})
         |         * ((1.0 - ${WeightExprs.TemporalDecayImpact} * (1.0 - pow(pow(
              ${Sql.typeLookupCase("coalesce(loc_type, 'trad')",
                WeightExprs.TemporalLambda, WeightExprs.TemporalLambdaDefault)},
              CAST(greatest(date_diff('day', a_date, ${Sql.PlanDate}), 0) AS DOUBLE)),
              ${WeightExprs.TemporalDecayShape}))) * ${graft.kernel.LocationKernel.AvgSeasonalBoost})
         |         * (CASE WHEN loc_elev IS NULL OR a_elev IS NULL OR (a_elev - loc_elev) <= 0.0 THEN 1.0
         |                 ELSE exp(-pow((a_elev - loc_elev) / (${Sql.typeLookupCase(
              "coalesce(loc_type, 'trad')", WeightExprs.ElevationDecayConstant,
              WeightExprs.ElevationDecayDefault)}), 2)) END)
         |         * (${Sql.severityWeight("severity_raw")})
         |         * (CASE WHEN wsim < ${WeightExprs.WeatherExclusionThreshold} THEN 0.0
         |                 ELSE pow(wsim, ${WeightExprs.WeatherPower}) END)
         |           AS base_influence
         |  FROM locations CROSS JOIN acc2),
         |sig AS (SELECT * FROM base WHERE base_influence > ${SafetyKernel.SignificanceFloor}),
         |infl AS (
         |  SELECT r.route_id,
         |         base_influence * (${Sql.routeTypeWeight("route_type", "acc_type")})
         |                        * (${Sql.gradeWeight("difficulty", "a_difficulty")}) AS influence
         |  FROM (SELECT *, route_id % 150 + 1 AS location_id FROM routes) r
         |  JOIN sig USING (location_id)),
         |agged AS (
         |  SELECT route_id,
         |         round(${Sql.normalizeRisk("sum(influence)")}, 4) AS risk_score,
         |         count(*) AS n_contributing,
         |         CASE WHEN ${Sql.normalizeRisk("sum(influence)")} < 25 THEN 'green'
         |              WHEN ${Sql.normalizeRisk("sum(influence)")} < 50 THEN 'yellow'
         |              WHEN ${Sql.normalizeRisk("sum(influence)")} < 75 THEN 'orange'
         |              ELSE 'red' END AS color_code
         |  FROM infl
         |  GROUP BY route_id)
         |SELECT r0.route_id,
         |       coalesce(a.risk_score, 0.0) AS risk_score,
         |       CAST(coalesce(a.n_contributing, 0) AS BIGINT) AS n_contributing,
         |       coalesce(a.color_code, 'green') AS color_code
         |FROM routes r0 LEFT JOIN agged a USING (route_id)
         |ORDER BY route_id""".stripMargin),

    "k10_color_hist" -> withDomain(
      s""", ${Sql.influencePairsCte()},
         |risks AS (
         |  SELECT route_id, ${Sql.normalizeRisk("sum(influence)")} AS risk_score
         |  FROM influences GROUP BY route_id)
         |SELECT ${Sql.colorCase("risk_score")} AS color_code, count(*) AS n_routes
         |FROM risks
         |GROUP BY 1
         |ORDER BY color_code""".stripMargin))
}
