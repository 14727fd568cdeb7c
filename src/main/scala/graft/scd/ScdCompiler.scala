package graft.scd

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compiles a parsed `.updates` log onto a DataFrame as a fold of
  * narrow, codegen-friendly transformations (SURVEY.md §7.1 module 3).
  *
  * Semantic contract (SURVEY.md §2.1 derived invariant):
  * {{{
  * read(dir, scdTime) ==
  *   rawData |> foldLeft over stmts S in FILE ORDER where S.time <= scdTime:
  *     UPDATE t SET a1=e1,... WHERE p  =>  per-row: if p then {ai := ei} else id
  *     DELETE FROM t WHERE p           =>  per-row: if p then drop
  * }}}
  *
  * Key semantics, each verified against the reference:
  *   - statements compose SEQUENTIALLY in file order — statement k+1
  *     sees statement k's output (the reference's one-row H2 table
  *     persists mutations across statements within one apply loop,
  *     SQLUpdater.java:166-170). Hence one `select` / `filter` per
  *     statement, never a merged projection.
  *   - within one UPDATE, every SET right-hand side sees the
  *     PRE-statement values (SQL UPDATE semantics) — one `select` with
  *     all branches referencing the input columns achieves this.
  *   - NULL `WHERE` result must NOT fire the statement (SQL keeps only
  *     TRUE): predicates are wrapped `coalesce(p, false)` before use
  *     (SURVEY.md §7.4.4).
  *   - every SET column is cast back to its original Spark type,
  *     mirroring the reference's positional typed write-back into Avro
  *     fields (AvroSCDInputFormat.java:205-222; SURVEY.md §7.4.6).
  *   - column resolution is case-insensitive (H2 default upper-casing;
  *     Spark's default `spark.sql.caseSensitive=false` — §7.4.7).
  *
  * Scale note: the compiled plan is a chain of projections/filters —
  * a NARROW pipeline with zero shuffles, fully inside whole-stage
  * codegen, through which Catalyst freely pushes outer-query filters
  * and prunes never-referenced `when` branches (SURVEY.md §4). The DML
  * text is parsed once on the driver and baked into serialized
  * expressions, so a 1000-executor scan does not re-read `.updates`
  * per task (fixes the reference's acknowledged inefficiency,
  * README.md:233-236).
  */
object ScdCompiler {

  def apply(df: DataFrame, log: ScdLog): DataFrame =
    apply(df, log.statements)

  def apply(df: DataFrame, stmts: Seq[ScdStatement]): DataFrame =
    stmts.foldLeft(df)(applyOne)

  /** Predicate wrapped so NULL never fires a statement. */
  private def pred(where: Option[String]) =
    where.map(w => coalesce(expr(w), lit(false))).getOrElse(lit(true))

  private[scd] def applyOne(df: DataFrame, stmt: ScdStatement): DataFrame =
    stmt match {
      case ScdUpdate(_, sets, where, _) =>
        // a SET column that resolves to nothing is a DML bug — fail like
        // the reference's H2 execution would (unknown column error),
        // never silently no-op (ADVICE r01)
        sets.foreach { case (c, _) =>
          if (!df.schema.fields.exists(_.name.equalsIgnoreCase(c)))
            throw new IllegalStateException(
              s"UPDATE SET references unknown column '$c' " +
                s"(schema: ${df.schema.fieldNames.mkString(", ")})")
        }
        val p = pred(where)
        val cols = df.schema.fields.map { f =>
          sets.collectFirst {
            case (c, e) if c.equalsIgnoreCase(f.name) => e
          } match {
            case Some(e) =>
              when(p, expr(e).cast(f.dataType))
                .otherwise(col(f.name)).as(f.name)
            case None => col(f.name)
          }
        }
        df.select(cols.toIndexedSeq: _*)
      case ScdDelete(_, where, _) =>
        df.filter(!pred(where))
    }
}
