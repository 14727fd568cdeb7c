package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `FuzzyJoin` — SymSpell deletion-neighborhood edit-distance join. */
class FuzzyJoinSpec extends SparkSpec {

  import spark.implicits._

  test("deletionNeighborhood d=1 is the string plus single deletes") {
    val got = Seq(Tuple1("abc")).toDF("s")
      .select(FuzzyJoin.deletionNeighborhood(col("s"), 1).as("n"))
      .collect()(0).getSeq[String](0).toSet
    assert(got == Set("abc", "bc", "ac", "ab"))
  }

  test("deletionNeighborhood of empty string is itself") {
    val got = Seq(Tuple1("")).toDF("s")
      .select(FuzzyJoin.deletionNeighborhood(col("s"), 2).as("n"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq(""))
  }

  test("selfPairs finds substitution and deletion neighbors at d=1") {
    // gold rings is distance 2 from everything -> absent at maxDist=1
    val df = Seq("cold ring", "old ring", "bold ring", "gold rings",
      "unrelated name").toDF("s")
    val pairs = FuzzyJoin.selfPairs(df, "s", maxDist = 1)
      .select("s_a", "s_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(
      ("bold ring", "cold ring"), // substitution b/c
      ("bold ring", "old ring"),  // deletion of b
      ("cold ring", "old ring"))) // deletion of c
  }

  test("complete vs brute force on a random vocabulary (d=1 and d=2)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    val vocab = (1 to 60).map(_ =>
      (1 to (2 + rnd.nextInt(5))).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString).distinct
    val df = vocab.toDF("s")
    for (d <- Seq(1, 2)) {
      val brute = (for {
        a <- vocab; b <- vocab if a < b
        if levenshteinDist(a, b) <= d
      } yield (a, b, levenshteinDist(a, b).toLong)).toSet
      val got = FuzzyJoin.selfPairs(df, "s", d).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == brute, s"d=$d: symspell != brute force")
    }
  }

  test("two-table join matches queries to dictionary within distance") {
    val dict = Seq("spark", "scala", "hadoop").toDF("w")
    val queries = Seq("sprk", "skala", "hadox", "zzz").toDF("q")
    val got = FuzzyJoin.join(queries, "q", dict, "w", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("sprk", "spark"), ("skala", "scala"),
      ("hadox", "hadoop")))
  }

  /** plain dynamic-programming Levenshtein for the oracle side */
  private def levenshteinDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
