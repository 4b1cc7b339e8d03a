package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{CoreQueries, KernelQueries, OpsQueries, PipelineQueries, WeatherQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY §2 inventory + the
  * training-data-pipeline extensions) to a DataFrame builder over a testdata
  * dir; `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * hash-match correctness gate (queries without an oracle get the weaker
  * rows-only check — those are the xxhash64-based ops DuckDB can't mirror,
  * validated in ScalaTest instead).
  */
object SparkEntry {

  /** Flagship query: full safety-scoring kernel (routes × accidents
    * broadcast cross join → risk) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    KernelQueries.queries("k08_kernel_risk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ KernelQueries.queries ++
      WeatherQueries.queries ++ PipelineQueries.queries ++ OpsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ KernelQueries.oracles ++
      WeatherQueries.oracles ++ PipelineQueries.oracles ++ OpsQueries.oracles
}
