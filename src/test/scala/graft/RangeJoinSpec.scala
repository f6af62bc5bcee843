package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential fuzzing for the hand-written RangeJoinExec: on random
  * (key, ts) datasets — duplicate timestamps, singleton keys, one-sided
  * keys, null keys/timestamps, zero-width windows — the custom operator
  * must emit exactly the pairs the built-in join-with-filter produces.
  * A custom physical operator earns its keep only if it is boringly
  * indistinguishable from the composition it replaces. */
class RangeJoinSpec extends SparkSpec {

  private def mkSide(seed: Long, n: Int, nKeys: Int,
      alias: String): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val key: java.lang.Long =
        if (rnd.nextInt(20) == 0) null else rnd.nextInt(nKeys).toLong
      val ts: java.lang.Long =
        if (rnd.nextInt(25) == 0) null else rnd.nextInt(500).toLong
      (key, ts, i.toLong)
    }
    // 5 partitions exercises the multi-partition merge path
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 5).map {
        case (k, t, i) => org.apache.spark.sql.Row(k, t, i)
      },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
      .select(col("k").as(s"${alias}_k"), col("ts").as(s"${alias}_ts"),
        col("id").as(s"${alias}_id"))
  }

  private def check(seed: Long, n: Int, nKeys: Int, window: Long): Unit = {
    val l = mkSide(seed, n, nKeys, "l")
    val r = mkSide(seed + 1000, n, nKeys, "r")
    val native = graft.plans.RangeJoin
      .join(l, r, "l_k", "r_k", "l_ts", "r_ts", window)
      .select(col("l_id"), col("r_id"))
    val reference = l.join(r,
        col("l_k") === col("r_k") &&
          abs(col("l_ts") - col("r_ts")) <= window)
      .select(col("l_id"), col("r_id"))
    assertSameRows(native.orderBy("l_id", "r_id"),
      reference.orderBy("l_id", "r_id"))
  }

  test("random differential: dense keys, window 10") {
    check(seed = 1, n = 400, nKeys = 8, window = 10)
  }

  test("random differential: sparse keys, wide window") {
    check(seed = 2, n = 300, nKeys = 100, window = 200)
  }

  test("random differential: zero-width window (exact ts equality)") {
    check(seed = 3, n = 400, nKeys = 5, window = 0)
  }

  test("empty right side joins to nothing") {
    import spark.implicits._
    val l = mkSide(7, 50, 4, "l")
    val r = mkSide(8, 50, 4, "r").filter($"r_k" > 1000)
    val out = graft.plans.RangeJoin
      .join(l, r, "l_k", "r_k", "l_ts", "r_ts", 10)
    assert(out.count() == 0)
  }

  test("self-join with shared attribute ids is rejected") {
    val l = mkSide(9, 20, 4, "l")
    intercept[IllegalArgumentException] {
      graft.plans.RangeJoin.join(l, l, "l_k", "l_k", "l_ts", "l_ts", 10)
    }
  }

  /** As-of reference: left join on (key, rts <= lts), keep the row with
    * max (r_ts, r_id) per left row — the same "last wins, tie-broken"
    * semantics AsOfJoinExec implements with O(1) merge state. */
  private def asofReference(l: DataFrame, r: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_id"))
      .orderBy(col("r_ts").desc_nulls_last, col("r_id").desc_nulls_last)
    l.join(r, col("l_k") === col("r_k") && col("r_ts") <= col("l_ts"),
        "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_id"), col("r_id"))
  }

  private def checkAsof(seed: Long, n: Int, nKeys: Int): Unit = {
    val l = mkSide(seed, n, nKeys, "l")
    val r = mkSide(seed + 1000, n, nKeys, "r")
    val native = graft.plans.AsOfJoin
      .join(l, r, "l_k", "r_k", "l_ts", "r_ts", tieBreak = Seq("r_id"))
      .select(col("l_id"), col("r_id"))
    assertSameRows(native.orderBy("l_id", "r_id"),
      asofReference(l, r).orderBy("l_id", "r_id"))
  }

  test("asof random differential: dense keys (many ts ties)") {
    checkAsof(seed = 11, n = 400, nKeys = 6)
  }

  test("asof random differential: sparse keys") {
    checkAsof(seed = 12, n = 300, nKeys = 80)
  }

  test("asof inner drops unmatched left rows") {
    val l = mkSide(13, 200, 6, "l")
    val r = mkSide(1013, 200, 6, "r")
    val outer = graft.plans.AsOfJoin
      .join(l, r, "l_k", "r_k", "l_ts", "r_ts", Seq("r_id"),
        leftOuter = true)
    val inner = graft.plans.AsOfJoin
      .join(l, r, "l_k", "r_k", "l_ts", "r_ts", Seq("r_id"),
        leftOuter = false)
    assert(inner.count() == outer.filter(col("r_id").isNotNull).count())
    assert(inner.filter(col("r_id").isNull).count() == 0)
  }
}
