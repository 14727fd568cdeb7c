package graft.scd

/** ADTs for the Type-7 SCD DML log (SURVEY.md §7.1 module 1).
  *
  * A parsed `.updates` log is an ordered sequence of statements, each
  * carrying the effective time (epoch millis) assigned by the closest
  * preceding `-- time=` directive (reference: SQLUpdater.java:121-159).
  * Statements apply in FILE ORDER — the effective time only gates
  * inclusion, it never reorders (SQLUpdater.java:130).
  */
sealed trait ScdStatement {
  def table: String

  /** Effective time in epoch millis; 0L when no directive preceded the
    * statement (SQLUpdater.java:125). */
  def timeMillis: Long
}

/** `UPDATE table SET col = expr [, ...] [WHERE predicate]`.
  *
  * @param sets  ordered (column, SQL scalar expression) assignments; all
  *              right-hand sides see the PRE-statement row values
  *              (standard SQL UPDATE semantics, as H2 evaluates them —
  *              reference SQLUpdater.java:167-169)
  * @param where `None` means the update applies to every row
  */
final case class ScdUpdate(
    table: String,
    sets: Seq[(String, String)],
    where: Option[String],
    timeMillis: Long)
  extends ScdStatement

/** `DELETE FROM table [WHERE predicate]`. `None` deletes every row. */
final case class ScdDelete(
    table: String,
    where: Option[String],
    timeMillis: Long)
  extends ScdStatement

/** A fully parsed `.updates` log: statements in file order, all
  * targeting a single table (SQLUpdater.java:65-69 enforces one table
  * name per log). */
final case class ScdLog(table: Option[String], statements: Seq[ScdStatement]) {
  def isEmpty: Boolean = statements.isEmpty
}

object ScdLog {
  val empty: ScdLog = ScdLog(None, Seq.empty)
}
