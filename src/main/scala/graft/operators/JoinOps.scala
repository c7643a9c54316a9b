package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join utilities for skewed keys at scale.
  *
  * When one join key dominates (a hot user, an empty-string default, …) the
  * single shuffle partition holding it becomes the straggler. AQE's skew-join
  * split handles sort-merge cases; `saltedJoin` is the explicit variant that
  * also works for hash joins and arbitrary plans: the probe side spreads each
  * key across `salt` sub-keys, the build side replicates each row `salt`
  * times, and the join key becomes (key, salt) — same rows out, `salt`×
  * smaller worst-case partition at `salt`× the build-side volume.
  */
object JoinOps {

  /** Inner equi-join of `left` and `right` on left(`leftKey`) ==
    * right(`rightKey`), salted `salt` ways. The probe-side salt is a
    * deterministic hash of the whole row, so results are reproducible. */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salt: Int): DataFrame = {
    require(salt > 0)
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(salt)))
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft
      .join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop(saltedLeft("__salt"))
      .drop(saltedRight("__salt"))
  }
}
