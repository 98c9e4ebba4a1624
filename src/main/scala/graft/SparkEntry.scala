package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator group into one registry:
  * `queries` (name → pure function of (spark, sfDir)) and `oracleSql`
  * (name → equivalent DuckDB SQL; omitted only for non-SQL-expressible
  * operators, which get the driver's rows-only check and a ScalaTest
  * spec instead).
  */
object SparkEntry {

  private val groups: Seq[QueryGroup] = Seq(
    operators.Relational,
    operators.Sessions,
    operators.Dedup,
    operators.TextAnalysis,
    operators.Similarity,
    operators.MultimodalOps,
    operators.Advanced,
    operators.Selection,
    operators.Corpus,
    operators.Profiling,
    operators.Layout,
    operators.Salting,
    operators.Retrieval,
    operators.Graph,
    operators.Training,
    operators.Quality,
    operators.Evaluation,
    sources.SourceQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracleSql).toMap

  /** SPARK_GRAFT_ONLY selection for Verify/Bench: exact name, or the
    * prefix up to an underscore — so ONLY=q9 selects q9_* but NOT
    * q90–q99 (bare startsWith surprised the dev loop).
    */
  def onlyMatches(name: String, filter: String): Boolean =
    name == filter || name.startsWith(filter + "_")
}
