package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB-dialect oracle in
  * `oracleSql` unless the operator is not SQL-expressible (approximate /
  * hash-randomized ops), in which case the driver records a rows-only
  * check. Column names + ordering are deterministic and identical on both
  * sides; aggregated doubles are rounded on both sides (driver hashes raw
  * values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.q1TopMonths(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 shape: union → substring year/month → group-count → window top-3
    "q1_topmonths" -> ((s, d) => RefQueries.q1TopMonths(s, d)),
    "q1_sql" -> ((s, d) => RefQueries.q1TopMonthsSql(s, d)),
    // Q2 shape: filter → lpad/cast → CASE buckets → group-count
    "q2_buckets" -> ((s, d) => RefQueries.q2TimeBuckets(s, d)),
    "q2_typed" -> ((s, d) => RefQueries.q2TimeBucketsTyped(s, d)),
    // Q3 shape: clean → join chain (hints) → top-3-to-driver → isin →
    // inline dim → group-count
    "q3_joinchain" -> ((s, d) => RefQueries.q3JoinChain(s, d)),
    "q3_hint_broadcast" -> ((s, d) => RefQueries.q3JoinChain(s, d, "broadcast", "broadcast")),
    "q3_hint_merge" -> ((s, d) => RefQueries.q3JoinChain(s, d, "merge", "merge")),
    "q3_hint_shuffle_hash" -> ((s, d) => RefQueries.q3JoinChain(s, d, "shuffle_hash", "shuffle_hash")),
    // Q4 shape: compound filter → expression join → haversine → avg+count
    "q4_distance" -> ((s, d) => RefQueries.q4Distance(s, d)),
    "q4_distance_broadcast" -> ((s, d) => RefQueries.q4DistanceBroadcast(s, d)),
    "q4_distance_sql" -> ((s, d) => RefQueries.q4DistanceSql(s, d)),
    "q4_distance_cogroup" -> ((s, d) => RefQueries.q4DistanceCogroup(s, d)),
    // J1: multi-key USING join
    "q_join_multikey" -> ((s, d) => RefQueries.qJoinMultiKey(s, d)),
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles (ANSI-ish, DuckDB 1.0 dialect). Table names resolve to
  // the same parquet files the Spark queries read.
  // ---------------------------------------------------------------------

  private val q1Oracle = """
    WITH ym AS (
      SELECT substr(cast(l_shipdate AS varchar), 1, 4) AS year,
             substr(cast(l_shipdate AS varchar), 6, 2) AS month
      FROM lineitem
    ), counts AS (
      SELECT year, month, count(*) AS cnt FROM ym GROUP BY year, month
    ), ranked AS (
      SELECT year, month, cnt,
             row_number() OVER (PARTITION BY year
                                ORDER BY cnt DESC, month ASC) AS rnk
      FROM counts
    )
    SELECT year, month, cnt, rnk FROM ranked
    WHERE rnk <= 3 ORDER BY year ASC, rnk ASC"""

  private val q2Oracle = """
    WITH b AS (
      SELECT CASE
               WHEN t4 >= '0500' AND t4 <= '1159' THEN 'Morning'
               WHEN t4 >= '1200' AND t4 <= '1659' THEN 'Afternoon'
               WHEN t4 >= '1700' AND t4 <= '2059' THEN 'Evening'
               ELSE 'Night' END AS bucket
      FROM (SELECT lpad(cast(hour(ts) * 100 + minute(ts) AS varchar),
                        4, '0') AS t4
            FROM events WHERE event_type = 'click')
    )
    SELECT bucket, count(*) AS cnt FROM b GROUP BY bucket
    ORDER BY cnt DESC, bucket ASC"""

  private val q3Oracle = """
    WITH top3 AS (
      SELECT c_custkey FROM (SELECT DISTINCT c_custkey, c_acctbal FROM customer)
      ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 3
    ), dim(priority, priority_label) AS (
      VALUES ('URGENT', 'Critical'), ('HIGH', 'High'), ('MEDIUM', 'Medium'),
             ('NOT SPECIFIED', 'Unspecified'), ('LOW', 'Low')
    )
    SELECT priority_label, count(*) AS cnt,
           round(sum(l_quantity), 4) AS qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN dim ON regexp_replace(o.o_orderpriority, '[0-9-]', '', 'g')
                = dim.priority
    WHERE c.c_custkey IN (SELECT c_custkey FROM top3)
    GROUP BY priority_label ORDER BY priority_label ASC"""

  private val q4Oracle = """
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             cast(c_custkey % 120 AS double) - 60.0 + 0.25 AS c_lat,
             cast(c_custkey % 300 AS double) - 150.0 + 0.5 AS c_lon
      FROM customer
      WHERE c_acctbal IS NOT NULL AND c_acctbal != 0.0
        AND c_acctbal BETWEEN -500.0 AND 8000.0
    ), n AS (
      SELECT n_nationkey, n_name,
             cast(n_nationkey * 3 AS double) - 30.0 AS n_lat,
             cast(n_nationkey * 7 AS double) - 80.0 AS n_lon
      FROM nation
    ), j AS (
      SELECT n_name,
             2.0 * 6371.0 * asin(sqrt(
               pow(sin(radians(n_lat - c_lat) / 2), 2) +
               cos(radians(c_lat)) * cos(radians(n_lat)) *
               pow(sin(radians(n_lon - c_lon) / 2), 2))) AS dist_km
      FROM c JOIN n ON c.c_nationkey = n.n_nationkey
    )
    SELECT n_name, round(avg(dist_km), 4) AS avg_dist_km, count(*) AS cnt
    FROM j GROUP BY n_name
    ORDER BY avg_dist_km DESC, n_name ASC"""

  private val multiKeyOracle = """
    WITH ps AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS ps_qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT l_returnflag, round(sum(ps_qty), 4) AS weighted_qty,
           count(*) AS cnt
    FROM lineitem l JOIN ps USING (l_partkey, l_suppkey)
    GROUP BY l_returnflag ORDER BY l_returnflag ASC"""

  def oracleSql: Map[String, String] = Map(
    "q1_topmonths" -> q1Oracle,
    "q1_sql" -> q1Oracle,
    "q2_buckets" -> q2Oracle,
    "q2_typed" -> q2Oracle,
    "q3_joinchain" -> q3Oracle,
    "q3_hint_broadcast" -> q3Oracle,
    "q3_hint_merge" -> q3Oracle,
    "q3_hint_shuffle_hash" -> q3Oracle,
    "q4_distance" -> q4Oracle,
    "q4_distance_broadcast" -> q4Oracle,
    "q4_distance_sql" -> q4Oracle,
    "q4_distance_cogroup" -> q4Oracle,
    "q_join_multikey" -> multiKeyOracle,
  )
}
