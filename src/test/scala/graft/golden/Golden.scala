package graft.golden

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Frozen expected-output snapshots for headline queries.
  *
  * WHY: the engine-vs-engine oracle gate is structurally blind to a
  * SHARED-CONSTANT drift — a changed threshold or weight interpolated into
  * the generated DuckDB SQL moves both engines together and stays green
  * (the hole `tools/mutation_check.sh` documents by design). These goldens
  * pin the ABSOLUTE output of eight headline queries at sf0.001, so a
  * both-engines-drift regression fails the ScalaTest suite even while the
  * relational gate passes.
  *
  * Regeneration is EXPLICIT only:
  * {{{ sbt "Test/runMain graft.golden.GoldenRegen" }}}
  * — never automatic, so a behavior change must be consciously blessed and
  * shows up as a reviewable snapshot diff in git.
  */
object Golden {

  /** One per evidence family: the full kernel (k08), its windowed top-k
    * (k09), the 6-factor weather similarity (w04), the dedup lifecycle
    * funnel (d36), the IVFADC ANN ladder rung (s08), and — added round 11
    * to cover the remaining families — the end-to-end score sink (k30:
    * nightly write → merge upsert → retention, read back; calculated_at
    * excluded so the output is deterministic), the text pipeline
    * (d02), and the hourly serving path (k24).
    */
  val Names: Seq[String] = Seq(
    "k08_kernel_risk", "k09_kernel_topk", "w04_weather_similarity",
    "d36_dedup_funnel", "s08_ann_ivfpq", "k30_score_sink_roundtrip",
    "d02_token_stats", "k24_hourly_serving")

  val SfDir = "/root/testdata/sf0.001"

  val Dir: Path = Paths.get("src", "test", "resources", "goldens")

  def path(name: String): Path = Dir.resolve(s"$name.golden")

  def run(name: String, spark: SparkSession): DataFrame =
    graft.SparkEntry.queries(name)(spark, SfDir)

  /** Canonical snapshot form: header line + one `|`-joined line per row,
    * rows SORTED lexicographically so the snapshot is independent of
    * partitioning and output order. Doubles render via Double.toString
    * (shortest round-trip decimal); the snapshot queries already round
    * their transcendental-derived columns, so a last-ulp exp/pow
    * difference on a future JVM/arch would have to cross a rounding
    * boundary to surface (measure-zero; regenerate deliberately if it
    * ever trips).
    */
  def canonicalLines(df: DataFrame): Seq[String] = {
    def fmt(v: Any): String = v match {
      case null                => "NULL"
      case d: java.lang.Double => d.toString
      case f: java.lang.Float  => f.toString
      case b: Array[Byte]      => java.util.Base64.getEncoder.encodeToString(b)
      case s: scala.collection.Seq[_] => s.map(fmt).mkString("[", ",", "]")
      case r: org.apache.spark.sql.Row =>
        (0 until r.length).map(i => fmt(r.get(i))).mkString("(", ",", ")")
      case other => other.toString
    }
    val header = df.columns.mkString("|")
    val rows = df.collect().toSeq
      .map(r => (0 until r.length).map(i => fmt(r.get(i))).mkString("|"))
      .sorted
    header +: rows
  }
}

/** The explicit regeneration tool — the ONLY writer of the golden files. */
object GoldenRegen {
  def main(args: Array[String]): Unit = {
    // SAME master/shuffle config as SparkSpec (local[4]/4): regen and
    // GoldenSnapshotSpec must execute IDENTICAL plans, or float
    // aggregations can sum in different orders between the writer and
    // the verifier and a snapshot flakes on the last ulp — the queries'
    // explicit rounding shields that today, but the config divergence
    // was gratuitous risk (round-11 advisor finding)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("golden-regen")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Golden.Dir)
    Golden.Names.foreach { n =>
      val lines = Golden.canonicalLines(Golden.run(n, spark))
      Files.writeString(Golden.path(n), lines.mkString("\n") + "\n")
      println(s"[golden] wrote ${Golden.path(n)} (${lines.size - 1} rows)")
    }
    spark.stop()
  }
}
