package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics of the compliance pass beyond the DuckDB gate: the redactor
  * actually removes every planted PII form (no raw PII bytes survive in
  * the redacted corpus), the counts attribute to the right documents, and
  * each quality rule trips on its designed boundary.
  */
class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_privacy").toString
    rows.toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("pii counts hit exactly the doc_id-stamped rows and nothing else") {
    // doc 0: 0%7=0%11=0%13=0 -> all three forms; doc 7: email only;
    // docs 1..3: clean.
    val dir = docsDir(Seq(
      (0L, "alpha beta", "s1"), (7L, "gamma", "s1"),
      (1L, "delta", "s2"), (2L, "epsilon", "s2"), (3L, "zeta", "s2")))
    val got = Privacy.qPiiRedact(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got("s1") == ((2L, 2L, 1L, 1L, 2L))) // both docs carry PII
    assert(got("s2") == ((3L, 0L, 0L, 0L, 0L)))
  }

  test("redaction output has placeholders, zero surviving matches, untouched clean text") {
    import spark.implicits._
    // Scan the REDACTED text itself: every pattern must find zero matches
    // after redaction (raw PII gone AND placeholders don't re-match), and
    // the placeholders must actually be present where PII was.
    val raw = Seq(
      "reach bob.smith+x@corp.example.org or 555-123-4567 from 10.0.0.1 ok",
      "two mails a@b.io c@d.org and ips 192.168.001.100 8.8.8.8",
      "no pii at all in this row")
    val df = raw.toDF("t").select(
      col("t"),
      Privacy.redactText(col("t")).as("red"))
    val rows = df.select(
        col("red"),
        Privacy.piiHits(col("red"), Privacy.EmailRe).as("e"),
        Privacy.piiHits(col("red"), Privacy.PhoneRe).as("p"),
        Privacy.piiHits(col("red"), Privacy.Ipv4Re).as("i"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == 0 && r.getInt(2) == 0 && r.getInt(3) == 0,
        s"pii survived redaction: ${r.getString(0)}")
    }
    assert(rows(0).getString(0) == "reach <EMAIL> or <PHONE> from <IP> ok")
    assert(rows(1).getString(0) == "two mails <EMAIL> <EMAIL> and ips <IP> <IP>")
    assert(rows(2).getString(0) == "no pii at all in this row")
  }

  test("q162 kappa matches an independent recomputation of the definition") {
    // four docs spread across the 2x2 agreement table; expected kappa is
    // recomputed here from plain-Scala labels, independent of the query
    val texts = Seq(
      (1 to 25).map(_ => "the dog").mkString(" "),        // 50 words
      (1 to 10).map(_ => "the").mkString(" "),            // 10 words: len fail
      (1 to 30).map(i => s"w$i").mkString(" "),           // no stopwords
      (1 to 5).map(_ => "elongatedword").mkString(" "))
    val dir = docsDir(texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "s") })
    def labels(t: String): (Boolean, Boolean) = {
      val toks = t.split(" ", -1)
      val n = toks.length.toLong
      val sumlen = toks.map(_.length.toLong).sum
      val nStop = toks.count(x => x == "the" || x == "a").toLong
      val nDist = toks.distinct.length.toLong
      (n >= 20 && n <= 60 && 10 * nStop >= n,
        sumlen >= 3 * n && 2 * sumlen <= 9 * n && 2 * nDist >= n)
    }
    val ls = texts.map(labels)
    val (n11, n10, n01, n00) = (
      ls.count(l => l._1 && l._2).toLong, ls.count(l => l._1 && !l._2).toLong,
      ls.count(l => !l._1 && l._2).toLong, ls.count(l => !l._1 && !l._2).toLong)
    val n = ls.length.toLong
    // the table must actually exercise disagreement or the test is vacuous
    assert(n10 + n01 > 0 && n11 + n00 > 0)
    val po = BigDecimal((n11 + n00).toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pe = BigDecimal(((n11 + n10) * (n11 + n01)
        + (n01 + n00) * (n10 + n00)).toDouble / (n * n))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val kappa = BigDecimal((po - pe) / (1.0 - pe))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Privacy.qFilterKappa(spark, dir).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((n11, n10, n01, n00)))
    assert(r.getDouble(5) == po && r.getDouble(6) == pe && r.getDouble(7) == kappa)
  }

  test("quality rules trip on their designed boundaries") {
    val twenty = (1 to 20).map(_ => "the").mkString(" ") // 20 words, mwl 3, all stop, 1 distinct
    val dir = docsDir(Seq(
      (1L, twenty, "s"),                       // len pass, mwl pass (3.0), stop pass, ttr FAIL (1/20)
      (2L, (1 to 19).map(_ => "the").mkString(" "), "s"), // 19 words -> len FAIL
      (3L, "the " * 10 + (1 to 10).map(i => "wordword").mkString(" ").trim, "s")))
    val r = Privacy.qQualityRules(spark, dir)
      .select("n_docs", "p_len", "p_mwl", "p_stop", "p_ttr", "n_keep")
      .collect().head
    assert(r.getLong(0) == 3)
    // doc1: 20 words -> len ok; doc2: 19 -> fail; doc3: 20 words -> ok
    assert(r.getLong(1) == 2)
    // doc3 mean word len = (10*3 + 10*8)/20 = 5.5 > 4.5 -> mwl fail; doc1/doc2 pass
    assert(r.getLong(2) == 2)
    // stopword frac: doc1/doc2 all 'the'; doc3 10/20 = 0.5 -> all pass
    assert(r.getLong(3) == 3)
    // ttr: doc1 1/20 fail, doc2 1/19 fail, doc3 2/20 fail
    assert(r.getLong(4) == 0)
    assert(r.getLong(5) == 0)
  }
}
