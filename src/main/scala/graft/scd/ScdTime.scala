package graft.scd

import java.time.format.DateTimeFormatter
import java.time.temporal.{ChronoField, TemporalAccessor}
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

/** Tri-state SCD time parse (reference: SQLUpdater.java:95-105, O3 in
  * SURVEY.md §2.1):
  *
  *   - null/empty  → the supplied default (for the session parameter the
  *     default is "now"; for an empty `-- time=` directive value it is
  *     the query's scd.time — SQLUpdater.java:108, :129)
  *   - numeric     → epoch millis verbatim (`-1` disables all updates,
  *     since every statement time is >= 0 and the gate is `<=`)
  *   - otherwise   → ISO-8601 date with optional time and optional zone
  *     offset (`yyyy-MM-dd[THH[:mm[:ss[.fraction]]][±zone]]`), matching
  *     Joda's `dateOptionalTimeParser` (reference SQLUpdater.java:102):
  *     hour-only times, 0–9 fraction digits, and `+HH`/`+HHmm`/`+HH:MM`
  *     offset forms all parse (ADVICE r01); zoneless values are UTC
  *
  * DELIBERATE DIVERGENCE from the reference (compat note, ADVICE r02):
  * Joda's `parseMillis` interprets ZONELESS text in the JVM default
  * timezone, so the same `scd.time=2014-09-01` gates differently on
  * hosts in different zones — a reproducibility bug, not a feature. We
  * pin zoneless values to UTC (the whole engine runs with
  * spark.sql.session.timeZone=UTC), so an as-of read is byte-identical
  * on every host. Reference behavior on a non-UTC host differs by the
  * host's offset; append an explicit `±zone` to reproduce it. Joda also
  * accepts partial dates (`yyyy`, `yyyy-MM`); those are rejected here —
  * no `.updates` log in the wild uses them and silent month/year
  * truncation is a footgun.
  */
object ScdTime {

  /** Sentinel: SCD replay fully disabled. */
  val Disabled: Long = -1L

  private val fmt: DateTimeFormatter = {
    import java.time.format.DateTimeFormatterBuilder
    new DateTimeFormatterBuilder()
      .append(DateTimeFormatter.ISO_LOCAL_DATE)
      .optionalStart()
      .appendLiteral('T')
      .appendValue(ChronoField.HOUR_OF_DAY, 2)
      .optionalStart()
      .appendLiteral(':').appendValue(ChronoField.MINUTE_OF_HOUR, 2)
      .optionalStart()
      .appendLiteral(':').appendValue(ChronoField.SECOND_OF_MINUTE, 2)
      .optionalStart()
      .appendFraction(ChronoField.NANO_OF_SECOND, 0, 9, true)
      .optionalEnd()
      .optionalEnd()
      .optionalEnd()
      // offset alternatives — each optional section rolls back on
      // mismatch, so +02, +0200, +02:00, and Z all parse
      .optionalStart().appendOffset("+HH:MM", "Z").optionalEnd()
      .optionalStart().appendOffset("+HHmm", "Z").optionalEnd()
      .optionalStart().appendOffset("+HH", "Z").optionalEnd()
      .optionalEnd()
      .toFormatter
  }

  def parse(text: String, default: => Long): Long = {
    val t = if (text == null) "" else text.trim
    if (t.isEmpty) default
    else
      try t.toLong
      catch {
        case _: NumberFormatException => parseIso(t)
      }
  }

  private def parseIso(t: String): Long = {
    val acc: TemporalAccessor = fmt.parse(t)
    val date = LocalDate.from(acc)
    val withTime =
      if (acc.isSupported(ChronoField.HOUR_OF_DAY)) LocalDateTime.of(
        date.getYear, date.getMonthValue, date.getDayOfMonth,
        acc.get(ChronoField.HOUR_OF_DAY),
        if (acc.isSupported(ChronoField.MINUTE_OF_HOUR)) acc.get(ChronoField.MINUTE_OF_HOUR) else 0,
        if (acc.isSupported(ChronoField.SECOND_OF_MINUTE)) acc.get(ChronoField.SECOND_OF_MINUTE) else 0,
        if (acc.isSupported(ChronoField.NANO_OF_SECOND)) acc.get(ChronoField.NANO_OF_SECOND) else 0)
      else date.atStartOfDay()
    val offset =
      if (acc.isSupported(ChronoField.OFFSET_SECONDS))
        ZoneOffset.ofTotalSeconds(acc.get(ChronoField.OFFSET_SECONDS))
      else ZoneOffset.UTC
    Instant.from(withTime.atOffset(offset)).toEpochMilli
  }

  /** Session-default resolution: explicit argument wins, else the Spark
    * conf `spark.scd.time`, else "now". */
  def resolve(explicit: Option[String], conf: Option[String]): Long = {
    val text = explicit.orElse(conf).getOrElse("")
    parse(text, System.currentTimeMillis())
  }
}
