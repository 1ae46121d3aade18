package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives: salting spreads a hot key over `numSalts`
  * sub-keys so no single task absorbs the whole key's data.
  *
  * Results are salt-invariant (the salt only changes physical
  * distribution), which is what makes these testable against the unsalted
  * oracle. AQE's skew-join handling covers many cases at runtime; explicit
  * salting remains the tool when a *single* key exceeds what one task can
  * hold, e.g. a boilerplate dedup key or a null-heavy foreign key at
  * 100 TB.
  */
object Skew {

  /** Two-phase salted aggregation: partial aggregate on (keys + salt),
    * final on keys. Supported partials: count / sum (reassociable).
    *
    * @param sums (outputName -> input column) summed columns; counts get
    *             `n` automatically.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      sums: Map[String, Column],
      numSalts: Int = 16
  ): DataFrame = {
    graft.InternalCols.requireAbsent(df, "saltedAgg",
      Seq("__salt", "__n") ++ sums.keys.map(n => s"__s_$n"): _*)
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sums.toSeq.map { case (n, c) => sum(c).as(s"__s_$n") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"),
        sums.keys.toSeq.map(n => sum(col(s"__s_$n")).as(n)): _*)
  }

  /** Salted equi-join for a skewed LEFT side against a smaller right side:
    * the left side gets a uniform salt; the right side is replicated once
    * per salt value, so each (key, salt) shard joins locally. Output equals
    * the unsalted inner join. */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      skewedKey: String,
      otherKey: String,
      numSalts: Int = 16
  ): DataFrame = {
    graft.InternalCols.requireAbsent(skewed, "saltedJoin", "__salt")
    graft.InternalCols.requireAbsent(other, "saltedJoin", "__salt")
    val saltedLeft = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts))
        .cast("int"))
    val replicatedRight = other.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedLeft
      .join(replicatedRight,
        saltedLeft(skewedKey) === replicatedRight(otherKey) &&
          saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
