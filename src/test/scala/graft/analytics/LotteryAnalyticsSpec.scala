package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.parse.Silver

/** The notebook-facade surface over the fixture silver tables — every
  * method runs and returns the hand-checkable values for the 3-draw corpus.
  */
class LotteryAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val (sorteos, premios) = {
    val draws = Silver.parseDraws(
      Silver.rawDraws(spark, "data/fixtures/raw/year=*/sorteo=*/*.txt"))
    (Silver.sorteos(draws).toDF().cache(), Silver.premios(draws).toDF().cache())
  }
  private lazy val la = new LotteryAnalytics(sorteos, premios)

  test("gold facade delegates to all 7 builders") {
    graft.gold.Gold.builders.keySet.foreach { n => assert(la.gold(n).count() > 0, n) }
  }

  test("topWinningNumbers: duplicated 13956 ranks first with count 2") {
    val top = la.topWinningNumbers(3).collect()
    assert(top.head.getLong(0) == 13956 && top.head.getLong(1) == 2)
  }

  test("topVendors excludes NO VENDIDO and nulls") {
    val rows = la.topVendors(20).collect()
    val v = rows.map(_.getString(0))
    assert(v.contains("YECENIA MAZARIEGOS"))
    assert(!v.contains("NO VENDIDO"))
    // TELEMARKETING and YECENIA MAZARIEGOS tie at 2 premios; alphabetical tiebreak
    assert(v.take(2).toSet == Set("TELEMARKETING", "YECENIA MAZARIEGOS"))
    assert(rows.take(2).forall(_.getAs[Long]("premios") == 2))
  }

  test("vendorCities explodes distinct (vendedor, ciudad) pairs") {
    val pairs = la.vendorCities.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("TELEMARKETING", "DE ESTA CAPITAL")))
    assert(pairs.contains(("MARIA LOPEZ", "COBAN")))
  }

  test("sellersPerDepartamento counts distinct sellers") {
    val m = la.sellersPerDepartamento.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("GUATEMALA") == 1L) // TELEMARKETING via DE ESTA CAPITAL fix (both draws)
    assert(m("QUETZALTENANGO") == 1L)
  }

  test("reintegrosPooled pools the three columns with padding dropped") {
    val total = la.reintegrosPooled.agg(sum(col("veces"))).collect().head.getLong(0)
    assert(total == 8) // 3+2+3 reintegros across the three fixture draws
  }

  test("duplicatePrizeRows surfaces the planted duplicate") {
    val dups = la.duplicatePrizeRows.collect()
    assert(dups.length == 1)
    assert(dups.head.getAs[Long]("multiplicity") == 2)
    assert(dups.head.getAs[Long]("numero_premiado") == 13956)
  }

  test("nullAudit counts the vendor-less trailing prize") {
    val r = la.nullAudit.collect().head
    assert(r.getAs[Long]("nulls_vendedor") == 1)
    assert(r.getAs[Long]("nulls_numero_sorteo") == 0)
  }

  test("winningOdds computes per-type odds from constants") {
    val rows = la.winningOdds().collect()
      .map(r => r.getString(0) -> r.getAs[Double]("odds_1_in")).toMap
    assert(rows.keySet == Set("ORDINARIO", "EXTRAORDINARIO"))
    assert(rows.values.forall(_ > 0))
  }

  test("montoIqrBand, montoBins, ticketPriceTiers run and partition all rows") {
    assert(la.montoIqrBand().count() > 0)
    // exact path reproduces the builtin-percentile band (the approx sketch
    // picks real data values instead of interpolating, so counts may differ)
    val builtinQ = premios
      .agg(expr("percentile(monto, array(0.25, 0.75))").as("qs"))
      .select(expr("qs[0]").as("q1"), expr("qs[1]").as("q3"))
    val builtinBand = premios.crossJoin(broadcast(builtinQ))
      .where(col("monto").between(col("q1"), col("q3"))).count()
    assert(la.montoIqrBand(exact = true).count() == builtinBand)
    assert(la.montoBins().agg(sum(col("premios"))).collect().head.getLong(0) == premios.count())
    assert(la.ticketPriceTiers.agg(sum(col("premios"))).collect().head.getLong(0) == premios.count())
  }

  test("missingFrom reports draws absent from an external listing") {
    import spark.implicits._
    val listing = Seq(3046L, 3101L).toDF("numero_sorteo")
    val missing = la.missingFrom(listing).collect().map(_.getLong(0))
    assert(missing.toSeq == Seq(3047L))
  }
}
