package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins. AQE's skew-join split handles most
  * cases at runtime; explicit salting remains the tool when one build
  * key is hot enough that even split shuffle partitions overwhelm a
  * task (the classic power-law dimension key at 100 TB).
  *
  * Mechanics: replicate the build side `nSalt` times with a salt
  * column; give each probe row ONE deterministic salt from a
  * probe-side column hash; join on (key, salt). Every probe row meets
  * exactly one replica of its key's build rows, so the result is
  * row-identical to the unsalted join while the hot key's probe rows
  * spread over `nSalt` tasks. */
object SkewJoin {

  /** @param probe        the large/skewed side
    * @param build        the side that gets replicated (small, e.g. a
    *                     dimension) — its per-key rows appear once per
    *                     salt value
    * @param key          equi-join column on both sides
    * @param probeSaltCol probe column whose hash spreads the hot key's
    *                     rows (a unique id gives a uniform spread)
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      probeSaltCol: String, nSalt: Int,
      joinType: String = "inner"): DataFrame = {
    require(nSalt > 0, s"nSalt must be positive: $nSalt")
    // build-preserving join types are UNSOUND under salting: an
    // unmatched build row would surface once per salt replica
    val ok = Set("inner", "left", "leftouter", "left_outer", "leftsemi",
      "left_semi", "leftanti", "left_anti", "cross")
    require(ok.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports probe-preserving join types only, got $joinType")
    val replicated = build.withColumn("__salt",
      explode(array((0 until nSalt).map(lit): _*)))
    // NULL salt column must not lose the row (crc32(NULL) = NULL would
    // never equi-join): NULLs land deterministically in salt 0
    val salted = probe.withColumn("__salt",
      pmod(coalesce(crc32(col(probeSaltCol).cast("string")), lit(0L)),
        lit(nSalt)).cast("int"))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
