package graft



/** Bucketing — the 100 TB pattern for repeated co-located joins: write
  * both sides bucketed on the join key, and the join planner skips the
  * shuffle entirely. Asserted on the physical plan, not just results. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val s = spark
    import s.implicits._
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val li = Tables.read(s, sf, "lineitem")
        .select($"l_orderkey", $"l_quantity")
      val ord = Tables.read(s, sf, "orders")
        .select($"o_orderkey", $"o_totalprice")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")
      val joined = s.table("li_bucketed")
        .join(s.table("ord_bucketed"),
          $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() ==
        li.join(ord, $"l_orderkey" === $"o_orderkey").count())
    } finally {
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS ord_bucketed")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
