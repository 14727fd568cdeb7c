package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join via SymSpell-style deletion
  * neighborhoods (Garbe's symmetric delete algorithm, public): two
  * strings within Levenshtein distance d share at least one string in
  * their depth-d deletion neighborhoods, so generating the (small,
  * C(len, <=d)-sized) neighborhoods as block keys on BOTH sides makes
  * the candidate join COMPLETE for dist <= d — no recall loss, unlike
  * first-letter/soundex blocking. Candidates are then verified with an
  * exact `levenshtein` (codegen'd; DuckDB replays it verbatim).
  *
  * Scale: the quadratic work is confined to strings agreeing on a
  * deletion key. Both sides are `distinct`-ed to the VOCABULARY first
  * (entity resolution compares names, not rows), so a 100 TB fact
  * table contributes only its distinct strings; callers re-join
  * matches back by string. Keys per string grow C(len, d) — keep
  * maxDist <= 2 for long strings (d=3 is allowed but meant for short
  * codes/tokens).
  */
object FuzzyJoin {

  /** All strings obtainable from `s` by deleting at most `d`
    * characters (including `s` itself), distinct, as one array. */
  def deletionNeighborhood(s: Column, d: Int): Column = {
    require(d >= 0 && d <= 3,
      s"deletionNeighborhood supports 0 <= d <= 3, got $d")
    // sequence(1, 0) would step BACKWARDS ([1,0]) — guard empty input
    def dels(c: Column): Column =
      when(length(c) <= 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(c)),
          i => concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c)))))
    var frontier = array(s)
    var acc = array(s)
    for (_ <- 1 to d) {
      frontier = array_distinct(flatten(transform(frontier, dels(_))))
      acc = array_union(acc, frontier)
    }
    acc
  }

  /** Distinct string pairs from `left` x `right` within Levenshtein
    * distance `maxDist`. Output: (s_l, s_r, dist) — complete (every
    * qualifying pair appears) and exact (dist is true Levenshtein). */
  def join(left: DataFrame, leftCol: String, right: DataFrame,
      rightCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      s"fuzzy join needs 1 <= maxDist <= 3, got $maxDist")
    def keyed(df: DataFrame, c: String, as: String) =
      df.select(col(c).cast("string").as(as)).distinct()
        .select(col(as),
          explode(deletionNeighborhood(col(as), maxDist)).as("__k"))
    keyed(left, leftCol, "s_l")
      .join(keyed(right, rightCol, "s_r"), Seq("__k"))
      .select("s_l", "s_r").distinct()
      .withColumn("dist", levenshtein(col("s_l"), col("s_r")).cast("long"))
      .where(col("dist") <= maxDist)
  }

  /** Unordered within-table pairs (s_a < s_b) within `maxDist`. */
  def selfPairs(df: DataFrame, strCol: String, maxDist: Int): DataFrame =
    join(df, strCol, df, strCol, maxDist)
      .where(col("s_l") < col("s_r"))
      .select(col("s_l").as("s_a"), col("s_r").as("s_b"), col("dist"))
}
