package graft.sources

import java.time.LocalDate
import java.time.chrono.IsoChronology
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder, ResolverStyle}
import java.time.temporal.ChronoField
import java.util.Locale
import scala.util.Try
import scala.util.matching.Regex

/** The staging-file registry: which delimited text files belong to which
  * logical dataset, and how their embedded snapshot date is parsed.
  *
  * Mirrors the reference's ingestion contract (reference: load.go:45-53):
  * eight datasets, each matched by `VIC(\d{6})_ABR_<Dataset>.txt$` with the
  * six digits being a `yyMMdd` date interpreted in `Australia/Melbourne`
  * (load.go:58,64) and formatted to the `yyyy-MM-dd` partition value
  * (load.go:20).
  *
  * The parsed value is kept as a pre-formatted STRING from here on: the
  * partition column is a string date (SURVEY §1.2), so session timezone
  * never touches it again.
  */
object DatasetRegistry {

  /** The 8 logical datasets (reference: load.go:46-53). */
  val datasets: Seq[String] = Seq(
    "ACNC", "Agency_Data", "Associates", "Businesslocation",
    "Businessname", "Funds", "Othtrdnames", "Replacedabn")

  /** Filename pattern per dataset. The reference's patterns spell the dot
    * before `txt` as an unescaped `.` (matches any char); the evident
    * intent is a literal extension, which we use.
    */
  val patterns: Map[String, Regex] =
    datasets.map(ds => ds -> s"VIC([0-9]{6})_ABR_${ds}\\.txt$$".r).toMap

  /** Two-digit years resolve like Go's time parser (load.go:64): values
    * 69-99 are 19xx, 00-68 are 20xx — not Java's default 2000-2099 window.
    */
  private val yyMMdd: DateTimeFormatter = new DateTimeFormatterBuilder()
    .appendValueReduced(ChronoField.YEAR, 2, 2, 1969)
    .appendValue(ChronoField.MONTH_OF_YEAR, 2)
    .appendValue(ChronoField.DAY_OF_MONTH, 2)
    .toFormatter(Locale.ROOT)
    .withResolverStyle(ResolverStyle.STRICT)
    .withChronology(IsoChronology.INSTANCE)

  /** A staging file classified to its dataset + partition value. */
  final case class Classified(dataset: String, importdate: String)

  /** Match a staging filename against the registry; extract and normalize
    * the snapshot date. Returns None for non-matching names or
    * non-calendar dates (e.g. `991332`), which the ingest skips —
    * log-and-continue, the reference's error policy for I/O-side issues
    * (load.go:65-67).
    */
  def classify(fileName: String): Option[Classified] =
    patterns.iterator.flatMap { case (ds, re) =>
      re.findFirstMatchIn(fileName).flatMap { m =>
        Try(LocalDate.parse(m.group(1), yyMMdd)).toOption
          .map(d => Classified(ds, d.format(DateTimeFormatter.ISO_LOCAL_DATE)))
      }
    }.nextOption()
}
