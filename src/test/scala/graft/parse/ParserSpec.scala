package graft.parse

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import Parser._

class ParserSpec extends AnyFunSuite {

  /** Hand-rolled property driver (scalatestplus bridge isn't in the offline
    * cache): 300 deterministic samples of the generator.
    */
  private def forAllSamples[A](gen: Gen[A], n: Int = 300)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default.withSize(30), Seed(i.toLong))
        .foreach(check)
    }

  private val fixture3046 =
    scala.io.Source.fromFile(
      "data/fixtures/raw/year=2024/sorteo=3046/results_raw_lottery_url_id_287_3046.txt")
      .mkString

  test("splitHeaderBody slices on the literal markers, stripping blanks") {
    val (h, b) = splitHeaderBody(Seq("", "HEADER", " meta ", "", "BODY", "x", " ", "y"))
    assert(h == Seq("meta"))
    assert(b == Seq("x", "y"))
  }

  test("splitHeaderBody throws when either marker is missing") {
    assertThrows[ParseException](splitHeaderBody(Seq("HEADER", "x")))
    assertThrows[ParseException](splitHeaderBody(Seq("BODY", "x")))
  }

  test("parseHeader extracts all 8 fields from the fixture header") {
    val (h, _) = splitHeaderBody(fixture3046.linesIterator.toSeq)
    val hdr = parseHeader(h)
    assert(hdr == Header(3046, "ORDINARIO", "15/09/2024", "15/12/2024",
      13956, 42871, 1102, "6,1,2"))
  }

  test("parseHeader throws on a missing field") {
    assertThrows[ParseException](parseHeader(Seq(
      "SORTEO ORDINARIO NO. 1 FECHA DEL SORTEO: 01/01/2024 PRIMER PREMIO 1 ||| SEGUNDO PREMIO 2 ||| TERCER PREMIO 3 ||| REINTEGROS 1")))
  }

  test("parseBody: fold binds vendor lines to the nearest preceding prize") {
    val (_, b) = splitHeaderBody(fixture3046.linesIterator.toSeq)
    val rows = parseBody(b)
    assert(rows.length == 7) // duplicates survive; noise + CENTENARES ignored
    assert(rows(0) == BodyRow("13956", "P", 500000.0,
      Some("YECENIA MAZARIEGOS, QUETZALTENANGO, QUETZALTENANGO")))
    assert(rows(2) == BodyRow("1102", "DT", 1234.56, Some("NO VENDIDO")))
    assert(rows(3) == BodyRow("7", "TT", 600.0, Some("VENDOR_004")))
    assert(rows(5) == rows(0)) // duplicate prize row preserved
    assert(rows(6).vendidoPor.isEmpty) // trailing prize with no vendor line
  }

  test("parseBody ignores vendor lines with no preceding prize") {
    assert(parseBody(Seq("VENDIDO POR NADIE", "NO VENDIDO")).isEmpty)
  }

  test("comma-grouped amounts are stripped (1,000,000.00)") {
    val rows = parseBody(Seq("1    P    ....    1,000,000.00"))
    assert(rows.head.monto == 1000000.0)
  }

  test("splitVendidoPor pads missing parts with None and drops extras") {
    assert(splitVendidoPor(Some("A, B, C, D")) == (Some("A"), Some("B"), Some("C")))
    assert(splitVendidoPor(Some("A, B")) == (Some("A"), Some("B"), None))
    assert(splitVendidoPor(Some("A")) == (Some("A"), None, None))
    assert(splitVendidoPor(None) == (None, None, None))
    assert(splitVendidoPor(Some("NO VENDIDO")) == (Some("NO VENDIDO"), None, None))
  }

  // ---- property tests: the body-fold binding invariant (SURVEY §5) ----

  private val prizeGen: Gen[String] = for {
    num <- Gen.chooseNum(1, 109964)
    letras <- Gen.oneOf("P", "DT", "TT", "PR", "PDT", "C")
    monto <- Gen.chooseNum(1, 999999)
  } yield s"$num    $letras    ............    $monto.00"

  private val vendorGen: Gen[String] = Gen.oneOf(
    Gen.identifier.map(v => s"VENDIDO POR $v"),
    Gen.const("NO VENDIDO"))

  private val noiseGen: Gen[String] =
    Gen.oneOf("CENTENARES", "RUIDO", "### banner ###", "terminacion lista")

  test("property: row count equals prize-line count; every vendor line binds backward") {
    val lineGen = Gen.frequency(5 -> prizeGen, 3 -> vendorGen, 2 -> noiseGen)
    forAllSamples(Gen.listOf(lineGen)) { lines =>
      val rows = parseBody(lines)
      val prizeCount = lines.count(l => PrizePrefix.findPrefixMatchOf(l).isDefined)
      assert(rows.length == prizeCount)
      // replay the fold independently: last vendor-ish line after each prize
      var expected = List.empty[Option[String]]
      lines.foreach { l =>
        if (PrizePrefix.findPrefixMatchOf(l).isDefined) expected ::= None
        else if (l.contains("VENDIDO POR") && expected.nonEmpty)
          expected = Some(l.substring(l.indexOf("VENDIDO POR") + 11).trim) :: expected.tail
        else if (l.contains("NO VENDIDO") && expected.nonEmpty)
          expected = Some("NO VENDIDO") :: expected.tail
      }
      assert(rows.map(_.vendidoPor) == expected.reverse)
    }
  }

  private val PrizePrefix = "(\\d+)\\s+(\\w+)\\s+\\.+\\s+([\\d,]+\\.?\\d*)".r
}
