package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed fact keys.
  *
  * A shuffle join hash-partitions both sides on the key, so a hot key
  * lands its ENTIRE fact volume on one reducer — at 100 TB a single
  * mega-key is the stage's wall clock (AQE's skew-join split handles
  * sort-merge spills after the fact; salting removes the pileup from
  * the plan). Facts get a deterministic salt in [0, saltFactor); the
  * dim side replicates each row saltFactor times; the join key becomes
  * (key, salt), spreading each hot key over saltFactor reducers at the
  * cost of a saltFactor× dim shuffle — the classic trade, worth it
  * exactly when |dim| ≪ |facts around hot keys|.
  *
  * The salt is derived by hashing the whole fact row (not a random
  * number) so re-runs, retried tasks, and both engines of an oracle
  * pair see identical intermediate data; duplicate fact rows sharing a
  * salt only under-split, never corrupt — join output is salt-invariant
  * by construction.
  */
object SkewJoin {

  /** Inner join of `facts` to `dim` on `keys`, with fact-side hot keys
    * spread over `saltFactor` partitions. Output columns follow the
    * plain `facts.join(dim, keys)` contract.
    */
  def salted(
      facts: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    require(!facts.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "input columns collide with SkewJoin's internal __salt column")
    val f = facts.withColumn(
      "__salt", pmod(xxhash64(facts.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val d = dim.withColumn("__salt", explode(lit((0 until saltFactor).toArray)))
    f.join(d, keys :+ "__salt").drop("__salt")
  }
}
