package graft.parse

import java.sql.Date
import java.time.LocalDate
import java.time.format.{DateTimeFormatter, ResolverStyle}
import scala.util.Try

import Parser.{ParsedDraw, splitVendidoPor}

/** Cleaning + schema enforcement, the per-record half of the reference's
  * transformer (reference src/loteria/transformer/transformer.py:55-230):
  * lenient numeric/date coercion (pandas errors="coerce" → None), N/A/empty
  * null normalization, the DE ESTA CAPITAL departamento fix, reintegros
  * split-and-pad, FK stamping, and the partition-year guard.
  *
  * Pure Scala — invoked per parsed draw inside a Spark flatMap; the
  * stable Silver schema is declared in [[Silver]].
  */
object Transformer {

  /** Silver premios row (transformer.py:150-175 + FIXTURES.md §3). */
  final case class Premio(
      numero_sorteo: Long,
      numero_premiado: Option[Long],
      letras: Option[String],
      monto: Double,
      vendedor: Option[String],
      ciudad: Option[String],
      departamento: Option[String],
      year: Int,
      sorteo: Long)

  /** Silver sorteos row (transformer.py:179-230 + FIXTURES.md §2). */
  final case class Sorteo(
      numero_sorteo: Long,
      tipo_sorteo: Option[String],
      fecha_sorteo: Option[Date],
      fecha_caducidad: Option[Date],
      primer_premio: Option[Long],
      segundo_premio: Option[Long],
      tercer_premio: Option[Long],
      reintegro_primer_premio: Option[Long],
      reintegro_segundo_premio: Option[Long],
      reintegro_tercer_premio: Option[Long],
      year: Int,
      sorteo: Long)

  final case class SilverDraw(sorteo: Sorteo, premios: List[Premio])

  /** transformer.py:166 — "N/A", "n/a", "" all mean SQL NULL. */
  def normNa(s: Option[String]): Option[String] =
    s.filterNot(v => v == "N/A" || v == "n/a" || v == "")

  /** pandas to_numeric(errors="coerce") for integers (transformer.py:55-63). */
  def lenientLong(s: Option[String]): Option[Long] =
    s.flatMap(v => Try(v.trim.toLong).toOption)

  // single-d/M: strptime's %d/%m accepts non-zero-padded day/month
  // ("5/3/2024"), and DateTimeFormatter's one-letter fields parse 1-2
  // digits — STRICT still rejects overflow dates like 31/02.
  private val DateFmt =
    DateTimeFormatter.ofPattern("d/M/uuuu").withResolverStyle(ResolverStyle.STRICT)

  /** pandas to_datetime(format="%d/%m/%Y", errors="coerce")
    * (transformer.py:213-222).
    */
  def lenientDate(s: String): Option[Date] =
    Try(Date.valueOf(LocalDate.parse(s, DateFmt))).toOption

  /** transformer.py:145-148 — ciudad 'DE ESTA CAPITAL' (case-insensitive,
    * null-safe) forces departamento 'GUATEMALA'.
    */
  def fixCapital(ciudad: Option[String], departamento: Option[String]): Option[String] =
    if (ciudad.getOrElse("").toUpperCase == "DE ESTA CAPITAL") Some("GUATEMALA")
    else departamento

  /** transformer.py:182-204 — split the comma list into exactly three
    * leniently-cast values, padded with None.
    */
  def splitReintegros(r: String): (Option[Long], Option[Long], Option[Long]) = {
    val parts = r.split(",", -1).toSeq
    def at(i: Int) = lenientLong(parts.lift(i))
    (at(0), at(1), at(2))
  }

  /** Full per-draw clean: parsed draw → silver rows. Throws when every
    * fecha_sorteo is unparseable (transformer.py:225-229 — the partition
    * year cannot be derived).
    */
  def toSilver(d: ParsedDraw): SilverDraw = {
    val h = d.header
    val fechaSorteo = lenientDate(h.fechaSorteo)
    val year = fechaSorteo.map(_.toLocalDate.getYear).getOrElse(
      throw new IllegalStateException(
        s"Invalid fecha_sorteo for sorteo=${h.numeroSorteo}. Cannot derive year partition."))
    val (r1, r2, r3) = splitReintegros(h.reintegros)
    val sorteo = Sorteo(
      numero_sorteo = h.numeroSorteo,
      tipo_sorteo = normNa(Some(h.tipoSorteo)),
      fecha_sorteo = fechaSorteo,
      fecha_caducidad = lenientDate(h.fechaCaducidad),
      primer_premio = Some(h.primerPremio),
      segundo_premio = Some(h.segundoPremio),
      tercer_premio = Some(h.tercerPremio),
      reintegro_primer_premio = r1,
      reintegro_segundo_premio = r2,
      reintegro_tercer_premio = r3,
      year = year,
      sorteo = h.numeroSorteo)
    val premios = d.premios.map { row =>
      val (vendedor0, ciudad0, depto0) = splitVendidoPor(row.vendidoPor)
      // order matters (transformer.py:142-166): capital fix sees raw
      // strings, then N/A normalization nulls empties/N-A sentinels.
      val departamento = fixCapital(ciudad0, depto0)
      Premio(
        numero_sorteo = h.numeroSorteo,
        numero_premiado = lenientLong(normNa(Some(row.numeroPremiado))),
        letras = normNa(Some(row.letras)),
        monto = row.monto,
        vendedor = normNa(vendedor0),
        ciudad = normNa(ciudad0),
        departamento = normNa(departamento),
        year = year,
        sorteo = h.numeroSorteo)
    }
    SilverDraw(sorteo, premios)
  }
}
