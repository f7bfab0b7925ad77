package graft.parse

/** Pure-Scala port of the reference's parsing semantics
  * (reference src/loteria/parser/parser.py:7-144). Behavioral contract, not a
  * code translation:
  *
  *  - a draw file is one atomic parse unit: literal `HEADER` / `BODY` marker
  *    lines delimit the two sections (parser.py:7-30); malformed → throw
  *    (the whole file fails, never a partial record);
  *  - the header yields exactly one draw record via anchored regex
  *    extraction (parser.py:33-66); any missing field → throw;
  *  - the body is an ORDER-DEPENDENT fold (parser.py:69-126): a prize line
  *    opens a record; a following `VENDIDO POR ...`/`NO VENDIDO` line
  *    mutates the MOST RECENT record; anything else is ignored. This is why
  *    parsing distributes per-file (flatMap), never per-line.
  */
object Parser {

  /** Raw header fields, pre-cleaning (dates/reintegros still strings —
    * lenient casting happens in [[Transformer]], matching the reference's
    * parse/clean stage split, transformer.py:164-230).
    */
  final case class Header(
      numeroSorteo: Long,
      tipoSorteo: String,
      fechaSorteo: String,
      fechaCaducidad: String,
      primerPremio: Long,
      segundoPremio: Long,
      tercerPremio: Long,
      reintegros: String)

  /** One body (prize) row as parsed: `numeroPremiado` stays a STRING here —
    * the cast to long happens in the transformer (parser.py:97 vs
    * transformer.py:169), preserving identical null behavior for
    * non-numeric values.
    */
  final case class BodyRow(
      numeroPremiado: String,
      letras: String,
      monto: Double,
      vendidoPor: Option[String])

  final case class ParsedDraw(header: Header, premios: List[BodyRow])

  final case class ParseException(msg: String) extends RuntimeException(msg)

  /** parser.py:7-30 — strip blank lines, locate the literal markers, slice.
    * Throws if either marker is absent.
    */
  def splitHeaderBody(lines: Seq[String]): (Seq[String], Seq[String]) = {
    val cleaned = lines.map(_.trim).filter(_.nonEmpty)
    val h = cleaned.indexOf("HEADER")
    val b = cleaned.indexOf("BODY")
    if (h < 0 || b < 0)
      throw ParseException("The file does not contain expected HEADER or BODY sections.")
    (cleaned.slice(h + 1, b), cleaned.drop(b + 1))
  }

  // Regexes equivalent to parser.py:43-52 (the `.` after NO is the
  // reference's own any-char dot — kept verbatim for identical behavior).
  private val NumRe = "NO. (\\d+)".r
  private val TipoRe = "(?i)SORTEO (\\w+)".r
  private val FechaSorteoRe = "FECHA DEL SORTEO: ([\\d/]+)".r
  private val FechaCadRe = "FECHA DE CADUCIDAD: ([\\d/]+)".r
  private val PremiosRe =
    "PRIMER PREMIO (\\d+) \\|\\|\\| SEGUNDO PREMIO (\\d+) \\|\\|\\| TERCER PREMIO (\\d+)".r
  private val ReintegrosRe = "REINTEGROS ([\\d, ]+)".r

  /** parser.py:33-66 — regex-extract the 8 header fields; throw on any
    * miss. Draw number and type come from the first header line; the rest
    * search the joined header text, mirroring the reference exactly.
    */
  def parseHeader(header: Seq[String]): Header = {
    if (header.isEmpty)
      throw ParseException("The HEADER does not contain the expected format.")
    val joined = header.mkString(" ")
    def find(re: scala.util.matching.Regex, in: String): scala.util.matching.Regex.Match =
      re.findFirstMatchIn(in).getOrElse(
        throw ParseException("The HEADER does not contain the expected format."))
    val premios = find(PremiosRe, joined)
    Header(
      numeroSorteo = find(NumRe, header.head).group(1).toLong,
      tipoSorteo = find(TipoRe, header.head).group(1),
      fechaSorteo = find(FechaSorteoRe, joined).group(1),
      fechaCaducidad = find(FechaCadRe, joined).group(1),
      primerPremio = premios.group(1).toLong,
      segundoPremio = premios.group(2).toLong,
      tercerPremio = premios.group(3).toLong,
      reintegros = find(ReintegrosRe, joined).group(1).replace(" ", ""))
  }

  // parser.py:89 — re.match ⇒ anchored at line start, not full-line.
  private val PrizeRe = "(\\d+)\\s+(\\w+)\\s+\\.+\\s+([\\d,]+\\.?\\d*)".r

  /** parser.py:69-126 — the stateful body fold. Vendor/NO VENDIDO lines
    * bind to the nearest PRECEDING prize row; lines before any prize row or
    * matching nothing are ignored. (`VENDIDO POR` is tested before
    * `NO VENDIDO`, like the reference's if/elif order.)
    */
  def parseBody(body: Seq[String]): List[BodyRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[BodyRow]
    body.map(_.trim).filter(_.nonEmpty).foreach { line =>
      PrizeRe.findPrefixMatchOf(line) match {
        case Some(m) =>
          out += BodyRow(
            numeroPremiado = m.group(1),
            letras = m.group(2),
            monto = m.group(3).replace(",", "").toDouble,
            vendidoPor = None)
        case None if line.contains("VENDIDO POR") && out.nonEmpty =>
          val v = line.substring(line.indexOf("VENDIDO POR") + "VENDIDO POR".length).trim
          out(out.length - 1) = out.last.copy(vendidoPor = Some(v))
        case None if line.contains("NO VENDIDO") && out.nonEmpty =>
          out(out.length - 1) = out.last.copy(vendidoPor = Some("NO VENDIDO"))
        case None => // ignored (noise lines, CENTENARES banner, ...)
      }
    }
    out.toList
  }

  /** Whole-file parse: split → header → body. One atomic unit per file. */
  def parseDraw(content: String): ParsedDraw = {
    val (h, b) = splitHeaderBody(content.linesIterator.toSeq)
    ParsedDraw(parseHeader(h), parseBody(b))
  }

  /** parser.py:129-144 — split `"vendor, city, departamento"` on commas into
    * up to three trimmed parts (missing → None; extra parts dropped). Empty
    * strings survive here and are nulled by the transformer's N/A
    * normalization, matching the pandas column order of operations.
    */
  def splitVendidoPor(vendidoPor: Option[String]): (Option[String], Option[String], Option[String]) =
    vendidoPor match {
      case None => (None, None, None)
      case Some(s) =>
        val parts = s.split(",", -1)
        (parts.lift(0).map(_.trim), parts.lift(1).map(_.trim), parts.lift(2).map(_.trim))
    }
}
