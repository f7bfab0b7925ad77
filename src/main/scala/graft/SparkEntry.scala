package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 coverage) to DataFrame
  * builders parameterized by the testdata scale-factor directory; `oracleSql`
  * carries the DuckDB-equivalent SQL for the driver's correctness gate.
  * Queries without an oracle entry are rows-only checked (non-SQL-expressible
  * ops: LSH, simhash, approx sketches).
  */
object SparkEntry {
  /** Flagship query; driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    entry(spark, "/root/testdata/sf0.001")

  def entry(spark: SparkSession, sfDir: String): DataFrame =
    Relational.q1Agg(spark, sfDir)

  /** Fixture draws for the parser-pipeline queries (path-independent of the
    * testdata sfDir; rows-only correctness, deep-checked in ScalaTest).
    */
  private val fixtureGlob =
    s"${sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo")}/data/fixtures/raw/year=*/sorteo=*/*.txt"

  private def fixtureSilver(s: SparkSession) = {
    val draws = graft.parse.Silver.parseDraws(graft.parse.Silver.rawDraws(s, fixtureGlob))
    (graft.parse.Silver.sorteos(draws).toDF(), graft.parse.Silver.premios(draws).toDF())
  }

  private val parseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_parse_silver_premios" -> ((s, _) => fixtureSilver(s)._2),
    "q61_parse_silver_sorteos" -> ((s, _) => fixtureSilver(s)._1),
    "q62_gold_draw_summary" -> ((s, _) => {
      val (so, pr) = fixtureSilver(s); graft.gold.Gold.drawSummary(so, pr)
    }),
    "q63_multimodal_features" ->
      ((s, dir) => graft.multimodal.Multimodal.qMultimodalFeatures(s, dir)),
    "q64_facade_top_vendors" -> ((s, _) => {
      val (so, pr) = fixtureSilver(s)
      new graft.analytics.LotteryAnalytics(so, pr).topVendors(10)
    }),
    "q65_facade_winning_odds" -> ((s, _) => {
      val (so, pr) = fixtureSilver(s)
      new graft.analytics.LotteryAnalytics(so, pr).winningOdds()
    }))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Analytics.queries ++ graft.streaming.Events.queries ++
      TextOps.queries ++ Similarity.queries ++ parseQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Analytics.oracle ++ graft.streaming.Events.oracle ++
      TextOps.oracle ++ Similarity.oracle
}
