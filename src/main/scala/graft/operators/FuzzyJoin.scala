package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) join without an all-pairs comparison.
  *
  * Blocking is by deletion neighborhoods (the SymSpell idea): every string
  * generates the set of variants reachable by deleting at most `maxDist`
  * characters, and two strings within Levenshtein distance `maxDist` of
  * each other always share at least one such variant — substitutions
  * delete the differing position on both sides, insertions/deletions
  * delete on one side. The join key is the 8-byte `xxhash64` of the
  * variant, so candidate generation is one hash-keyed equi-join Catalyst
  * can shuffle or broadcast like any other; candidates are then verified
  * with the exact `levenshtein` kernel (which also discards the ~2^-64
  * hash-collision false positives). Nothing is ever compared across the
  * full cross product.
  *
  * Designed for short join keys — names, titles, codes: a string of length
  * L fans out to O(L^maxDist) variants, which is the classic space/time
  * trade for `maxDist` ≤ 2. Reference analog: record-linkage joins the
  * db2pq workflow does in post-load SQL (db2pq/core.py:529 arbitrary-SQL
  * reads); here it is a first-class distributed operator.
  */
object FuzzyJoin {

  /** Array of all strings reachable from `c` by deleting at most `maxDist`
    * characters (including `c` itself), distinct. Pure Spark SQL functions
    * — codegen'd, no UDF. */
  def deletionVariants(c: Column, maxDist: Int): Column = {
    require(maxDist >= 0 && maxDist <= 2,
      s"maxDist must be 0..2 (got $maxDist): variant fan-out is O(len^k)")
    // one deletion round applied to every string in `arr`
    def round(arr: Column): Column = array_distinct(flatten(transform(
      arr,
      s =>
        transform(
          sequence(lit(0), length(s)),
          i => concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s)))))))
    // i = length(s) contributes s itself (delete nothing), so each round
    // accumulates the smaller neighborhoods for free
    (1 to maxDist).foldLeft(array(c))((acc, _) => round(acc))
  }

  /** Join `left` and `right` on Levenshtein(leftCol, rightCol) <= maxDist.
    *
    * Emits one row per matching (left id, right id) pair: `(leftId,
    * rightId, dist)`. Both inputs are exploded into their deletion
    * neighborhoods, equi-joined on the variant hash, exactly verified, and
    * deduplicated — a pair sharing several variants still appears once.
    * The id columns must each be unique within their side.
    *
    * `leftCol == rightCol` (fuzzy-joining two tables that share a column
    * name like `name`) is fine — each side's columns are aliased to
    * internal names before the join and renamed back in the final select.
    * `leftId == rightId` is rejected: the output would carry two columns
    * with the same name, ambiguous for every downstream reference. */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      leftCol: String,
      rightId: String,
      rightCol: String,
      maxDist: Int = 1): DataFrame = {
    require(leftId != rightId,
      s"leftId and rightId are both '$leftId': the output pair frame " +
        "would have two identically-named id columns — rename one side " +
        "(e.g. .withColumnRenamed) before the join")
    // the internal aliases only coexist with the user's id/key columns
    // inside the per-side projections, so only those four names can clash;
    // "dist" is the output score column — an id named "dist" would
    // duplicate it in the final select
    val internal =
      Seq("__lid", "__lkey", "__rid", "__rkey", "__v", "__vh", "__dist", "dist")
    require(!internal.contains(leftId) && !internal.contains(leftCol) &&
      !internal.contains(rightId) && !internal.contains(rightCol),
      s"FuzzyJoin.join reserves column names ${internal.mkString(", ")} — " +
        "rename the colliding input column before calling")
    // no per-side distinct: deletionVariants already array_distincts, so
    // each side's exploded (id, variant) rows are unique — a distinct here
    // would only add a full exchange + two hash aggregates per side. A
    // pair matching through several shared variants is collapsed by the
    // final pair-level distinct instead.
    val lv = left
      .select(col(leftId).as("__lid"), col(leftCol).as("__lkey"),
        explode(deletionVariants(col(leftCol), maxDist)).as("__v"))
      .select(col("__lid"), col("__lkey"), xxhash64(col("__v")).as("__vh"))
    val rv = right
      .select(col(rightId).as("__rid"), col(rightCol).as("__rkey"),
        explode(deletionVariants(col(rightCol), maxDist)).as("__v"))
      .select(col("__rid"), col("__rkey"), xxhash64(col("__v")).as("__vh"))
    // threshold form early-exits the DP at a band of width maxDist —
    // O(maxDist·len) per candidate instead of O(len²); returns -1 past
    // the bound, which is also what discards hash-collision candidates
    lv.join(rv, "__vh")
      .withColumn("__dist", levenshtein(col("__lkey"), col("__rkey"), maxDist))
      .filter(col("__dist") >= 0)
      .select(col("__lid").as(leftId), col("__rid").as(rightId),
        col("__dist").as("dist"))
      .distinct()
  }
}
