package graft.parse

import org.scalatest.funsuite.AnyFunSuite

import Parser._
import Transformer._

class TransformerSpec extends AnyFunSuite {

  test("normNa nulls the three sentinel values only") {
    assert(normNa(Some("N/A")).isEmpty)
    assert(normNa(Some("n/a")).isEmpty)
    assert(normNa(Some("")).isEmpty)
    assert(normNa(Some("N/a")).contains("N/a")) // only the exact reference sentinels
    assert(normNa(Some("GUATEMALA")).contains("GUATEMALA"))
  }

  test("lenientLong coerces bad input to None, like pandas errors=coerce") {
    assert(lenientLong(Some("42")).contains(42L))
    assert(lenientLong(Some(" 42 ")).contains(42L))
    assert(lenientLong(Some("4x2")).isEmpty)
    assert(lenientLong(None).isEmpty)
  }

  test("lenientDate parses dd/MM/yyyy strictly, None on bad") {
    assert(lenientDate("15/09/2024").map(_.toString).contains("2024-09-15"))
    assert(lenientDate("99/99/9999").isEmpty)
    assert(lenientDate("2024-09-15").isEmpty)
    assert(lenientDate("31/02/2024").isEmpty) // strict resolver: no overflow dates
    // strptime's %d/%m accepts non-zero-padded components — so must we
    assert(lenientDate("5/3/2024").map(_.toString).contains("2024-03-05"))
  }

  test("fixCapital forces GUATEMALA case-insensitively and null-safely") {
    assert(fixCapital(Some("DE ESTA CAPITAL"), None).contains("GUATEMALA"))
    assert(fixCapital(Some("de esta capital"), Some("X")).contains("GUATEMALA"))
    assert(fixCapital(Some("COBAN"), Some("ALTA VERAPAZ")).contains("ALTA VERAPAZ"))
    assert(fixCapital(None, Some("X")).contains("X"))
  }

  test("splitReintegros pads to three with None") {
    assert(splitReintegros("6,1,2") == (Some(6L), Some(1L), Some(2L)))
    assert(splitReintegros("0,5") == (Some(0L), Some(5L), None))
    assert(splitReintegros("7") == (Some(7L), None, None))
    assert(splitReintegros("a,b") == (None, None, None))
  }

  test("toSilver: full clean of the 3046 fixture") {
    val content = scala.io.Source.fromFile(
      "data/fixtures/raw/year=2024/sorteo=3046/results_raw_lottery_url_id_287_3046.txt").mkString
    val silver = toSilver(parseDraw(content))
    val s = silver.sorteo
    assert(s.numero_sorteo == 3046 && s.year == 2024 && s.sorteo == 3046)
    assert(s.fecha_sorteo.map(_.toString).contains("2024-09-15"))
    assert((s.reintegro_primer_premio, s.reintegro_segundo_premio,
      s.reintegro_tercer_premio) == (Some(6L), Some(1L), Some(2L)))

    val p = silver.premios
    assert(p.length == 7)
    assert(p.forall(r => r.numero_sorteo == 3046 && r.year == 2024))
    // DE ESTA CAPITAL → departamento GUATEMALA, ciudad keeps raw value
    val tele = p(1)
    assert(tele.vendedor.contains("TELEMARKETING"))
    assert(tele.ciudad.contains("DE ESTA CAPITAL"))
    assert(tele.departamento.contains("GUATEMALA"))
    // NO VENDIDO sentinel is a vendor VALUE, not null
    assert(p(2).vendedor.contains("NO VENDIDO") && p(2).ciudad.isEmpty)
    // vendor-only: city/departamento null
    assert(p(3).vendedor.contains("VENDOR_004") && p(3).ciudad.isEmpty)
    // N/A city and departamento normalized to null
    assert(p(4).vendedor.contains("KIOSCO CENTRAL") && p(4).ciudad.isEmpty &&
      p(4).departamento.isEmpty)
    // trailing prize with no vendor line: all three null
    assert(p(6).vendedor.isEmpty && p(6).ciudad.isEmpty && p(6).departamento.isEmpty)
    // 6-digit numero survives; numero stays exact
    assert(p(4).numero_premiado.contains(109964L))
  }

  test("toSilver throws when fecha_sorteo is unparseable (year guard)") {
    val content = scala.io.Source.fromFile("data/fixtures/bad/bad_dates.txt").mkString
    assertThrows[IllegalStateException](toSilver(parseDraw(content)))
  }

  test("parseDraw propagates header/section failures") {
    val noBody = scala.io.Source.fromFile("data/fixtures/bad/missing_body.txt").mkString
    assertThrows[ParseException](parseDraw(noBody))
    val noField = scala.io.Source.fromFile("data/fixtures/bad/missing_header_field.txt").mkString
    assertThrows[ParseException](parseDraw(noField))
  }
}
