package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Bloom-reduced equi-join: build a Bloom filter over the small side's
    * join keys, pre-filter the BIG side with a codegen'd might-contain
    * predicate BEFORE its shuffle, then run the exact join on survivors.
    * At scale this is the difference between shuffling the full fact table
    * and shuffling only the (tiny) fraction that can possibly match a
    * selective dimension subset; false positives just shuffle a few extra
    * rows — the exact join keeps the result identical, so the operator is
    * oracle-checkable. `expectedItems`/`fpp` size the filter (~1.2 MB per
    * million keys at 1% fpp). */
  def bloomReducedJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // building the filter is an action anyway; an empty build side would
    // NPE inside stat.bloomFilter (null aggregate buffer) — and means the
    // join result is empty by definition
    if (small.isEmpty)
      return big.where(lit(false)).join(small, col(bigKey) === small(smallKey))
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    big.where(graft.functions.BloomMightContain.mightContain(col(bigKey), bf))
      .join(small, col(bigKey) === small(smallKey))
  }

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

  /** As-of (point-in-time) join — for each left row, the `valueCol` of the
    * latest right row with the same `key` and `ts` ≤ the left row's `ts`
    * (inclusive). Spark has no native as-of join; per the composition-first
    * rule this is the union+window formulation: tag both sides, union, and
    * take `last(value) ignoreNulls` over (key, ts)-ordered rows — ONE
    * shuffle on the key, no range-join blowup, arbitrarily many left rows
    * per right row. `tieBreak` columns (present on both sides) make
    * ordering deterministic when timestamps collide; right rows sort before
    * left rows at equal ts so same-instant values are visible.
    *
    * Returns all left columns + `asofCol` (null when no right row precedes).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCol: String, asofCol: String = "asof_value",
      tieBreak: Seq[String] = Nil): DataFrame = {
    val valueType = right.schema(valueCol).dataType
    val leftCols = left.columns.toSeq
    val lt = left
      .select(leftCols.map(col) :+ lit(null).cast(valueType).as("__rv"): _*)
      .withColumn("__mk", lit(0))
    val rt = right.select(
      leftCols.map(c =>
        if (c == key || c == ts || tieBreak.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(valueCol).as("__rv"): _*)
      .withColumn("__mk", lit(1))
    val w = Window.partitionBy(key)
      .orderBy(col(ts) +: col("__mk").desc +: tieBreak.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lt.unionByName(rt)
      .withColumn(asofCol, last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__mk") === 0)
      .drop("__rv", "__mk")
  }
}
