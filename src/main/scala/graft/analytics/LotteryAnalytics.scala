package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.gold.Gold
import graft.operators.Relational.dsum

/** The reference's ad-hoc notebook workload as a library facade
  * (SURVEY §3.3: "a LotteryAnalytics facade exposing each notebook query as
  * a named DataFrame-returning method") over the silver tables. A user of
  * the reference's notebooks switches by constructing this over their
  * silver `sorteos`/`premios` and calling the method named after their
  * analysis cell. Everything returns a lazy DataFrame — composable,
  * optimizable, never collected here.
  */
final class LotteryAnalytics(sorteos: DataFrame, premios: DataFrame) {

  /** The seven gold tables (declarative product). */
  def gold(name: String): DataFrame = Gold.builders(name)(sorteos, premios)

  /** EDA_premios cell 35: top-k winning numbers by frequency (value_counts
    * + head, deterministic tiebreak).
    */
  def topWinningNumbers(k: Int = 10): DataFrame =
    premios.where(col("numero_premiado").isNotNull)
      .groupBy(col("numero_premiado")).agg(count(lit(1)).as("veces"))
      .orderBy(col("veces").desc, col("numero_premiado").asc).limit(k)

  /** visualization cell 23 / EDA cell 39: top-k vendors by prize count
    * (sentinel and null excluded, like gold 06).
    */
  def topVendors(k: Int = 10): DataFrame =
    premios.where(col("vendedor").isNotNull && col("vendedor") =!= "NO VENDIDO")
      .groupBy(col("vendedor")).agg(count(lit(1)).as("premios"),
        dsum(col("monto")).as("total_monto"))
      .orderBy(col("premios").desc, col("vendedor").asc).limit(k)

  /** EDA_premios cell 39-41: unique cities per vendor, exploded back to
    * (vendedor, ciudad) pairs.
    */
  def vendorCities: DataFrame =
    premios.where(col("vendedor").isNotNull && col("ciudad").isNotNull)
      .groupBy(col("vendedor")).agg(collect_set(col("ciudad")).as("ciudades"))
      .select(col("vendedor"), explode(col("ciudades")).as("ciudad"))

  /** EDA_premios cell 44: distinct sellers per departamento. */
  def sellersPerDepartamento: DataFrame =
    premios.where(col("departamento").isNotNull)
      .groupBy(col("departamento"))
      .agg(countDistinct(col("vendedor")).as("n_vendedores"))

  /** EDA_premios cells 22/30: rows inside the monto IQR band (quartiles as
    * a broadcast 1-row cross join). Defaults to the approx_percentile
    * sketch — the only quantile shape that survives 100 TB (mergeable,
    * bounded memory); `exact = true` switches to the distributed
    * value-count exact quantile for oracle/test parity.
    */
  def montoIqrBand(exact: Boolean = false): DataFrame = {
    val q =
      (if (exact) graft.operators.Analytics.exactQuantiles(premios, "monto", Seq(0.25, 0.75))
       else graft.operators.Analytics.approxQuantiles(premios, "monto", Seq(0.25, 0.75)))
        .select(col("q0").as("q1"), col("q1").as("q3"))
    premios.crossJoin(broadcast(q))
      .where(col("monto").between(col("q1"), col("q3")))
      .drop("q1", "q3")
  }

  /** EDA_premios cell 52: fixed-width monto histogram. */
  def montoBins(width: Double = 5000): DataFrame =
    premios.groupBy((floor(col("monto") / width) * width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("premios"))
      .orderBy(col("bucket"))

  /** EDA_sorteos cell 12 / visualization cell 43: the three reintegro
    * columns pooled into one distribution (UNION ALL).
    */
  def reintegrosPooled: DataFrame =
    sorteos.select(col("reintegro_primer_premio").as("reintegro"))
      .unionAll(sorteos.select(col("reintegro_segundo_premio")))
      .unionAll(sorteos.select(col("reintegro_tercer_premio")))
      .where(col("reintegro").isNotNull)
      .groupBy(col("reintegro")).agg(count(lit(1)).as("veces"))

  /** EDA_premios cells 9-10: fully-duplicated premio rows (kept in silver
    * by contract; surfaced, not silently removed).
    */
  def duplicatePrizeRows: DataFrame =
    premios.groupBy(premios.columns.toIndexedSeq.map(col): _*)
      .agg(count(lit(1)).as("multiplicity"))
      .where(col("multiplicity") > 1)

  /** EDA_premios cells 11/15: null count per column. */
  def nullAudit: DataFrame = {
    val counts = premios.columns.toIndexedSeq.map(c =>
      sum(when(col(c).isNull, 1).otherwise(0)).as(s"nulls_$c"))
    premios.agg(counts.head, counts.tail: _*)
  }

  /** visualization cells 45-49: winning percentage + "1 in N" odds per
    * draw type, from the published tickets-issued constants.
    */
  def winningOdds(ticketsOrdinario: Long = 80000, ticketsExtra: Long = 90000): DataFrame =
    premios.join(broadcast(sorteos.select(col("numero_sorteo"), col("tipo_sorteo"))),
        Seq("numero_sorteo"))
      .groupBy(col("tipo_sorteo"))
      .agg(countDistinct(col("numero_premiado")).as("numeros_premiados"),
        countDistinct(col("numero_sorteo")).as("n_sorteos"))
      .withColumn("tickets", when(col("tipo_sorteo") === "ORDINARIO",
        ticketsOrdinario).otherwise(ticketsExtra))
      .withColumn("pct_ganador", round(lit(100.0) * col("numeros_premiados") /
        (col("tickets") * col("n_sorteos")), 2))
      .withColumn("odds_1_in", round((col("tickets") * col("n_sorteos")).cast("double") /
        col("numeros_premiados"), 0))

  /** visualization cell 59: piecewise ticket-price tiering of prizes. */
  def ticketPriceTiers: DataFrame =
    premios.withColumn("tier",
        when(col("monto") < 1000, "consuelo")
          .when(col("monto") < 50000, "menor")
          .when(col("monto") < 500000, "mayor")
          .otherwise("premio_gordo"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("premios"), dsum(col("monto")).as("total_monto"))

  /** processed_vs_downloaded cells 9-13: draws in silver missing from
    * another listing (anti-join diff).
    */
  def missingFrom(otherSorteoNumbers: DataFrame): DataFrame =
    sorteos.select(col("numero_sorteo")).distinct()
      .join(otherSorteoNumbers.toDF("numero_sorteo"), Seq("numero_sorteo"), "left_anti")
}
