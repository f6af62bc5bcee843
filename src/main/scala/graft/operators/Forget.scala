package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Delete / compliance propagation — the right-to-be-forgotten pass every
  * corpus operator runs: a (small) tombstone list must not just drop rows
  * from the base table, it must propagate through every DERIVED surface —
  * dedup cluster membership (with RE-RESOLUTION: removing a node can
  * change a cluster's keeper, orphan its partners, or split a component),
  * packed training sequences (a sequence containing a forgotten document
  * is tainted and must be dropped whole), and per-language rollups. The
  * declared output reports, per surface, how many rows the purge removed
  * AND a mod-prime membership checksum of the SURVIVORS — proof of which
  * rows remain, not just how many (the established membership-checksum
  * discipline).
  *
  * Scale: the tombstone list is compliance-sized (thousands), so every
  * corpus-side membership test is a BROADCAST outer/anti join — the
  * corpus never shuffles to learn who died. Cluster re-resolution runs
  * the shared star-CC resolver over the INDUCED pair subgraph (both
  * endpoints alive) — pair-graph-sized, not corpus-sized.
  */
object Forget {

  private val P = TextAnalysis.ChecksumP

  /** Σ (k mod P)² mod P over a column — order-independent survivor
    * checksum, overflow-proof through the DECIMAL sum (the
    * `curveWriteScan` idiom). */
  private def cs1(k: Column): Column =
    pmod(sum((pmod(k, lit(P)) * pmod(k, lit(P)) % P).cast("decimal(38,0)")),
      lit(P).cast("decimal(38,0)")).cast("long")

  /** Two-key variant: term = ((k1 mod P)·31 + k2 mod P) mod P, then the
    * same squared fold — binds VALUE pairs (member → keeper, lang →
    * count), so a survivor keeping its row but changing its label still
    * changes the checksum. */
  private def cs2(k1: Column, k2: Column): Column = {
    val term = (pmod(k1, lit(P)) * 31 + pmod(k2, lit(P))) % P
    pmod(sum((term * term % P).cast("decimal(38,0)")),
      lit(P).cast("decimal(38,0)")).cast("long")
  }

  /** The propagation core, parameterized on every input so the spec can
    * plant the hard cases (a tombstoned KEEPER, a tombstoned bridge node
    * splitting a component, a fully-forgotten language):
    *  - `docs`: (doc_id, lang) corpus rows,
    *  - `tombs`: (doc_id) the forget list,
    *  - `pairs`: (doc_a, doc_b) the near-dup pair graph,
    *  - `packs`: (doc_id, bin_id) packed-sequence membership.
    * Output: one row per surface — (surface, n_before, n_purged,
    * n_after, survivor_checksum), ordered by surface.
    * Surface semantics:
    *  - `1_documents`: rows = docs; checksum over surviving doc_id.
    *  - `2_dup_graph`: rows = pair-graph members; purged = members on
    *    the tombstone list; AFTER = members of the re-resolved CC over
    *    the induced subgraph (a survivor whose every partner died leaves
    *    the graph — it is simply unique now); checksum over the
    *    re-resolved (member, cluster) mapping, so a keeper change or a
    *    component split is visible even when counts are unchanged.
    *  - `3_packs`: rows = packed sequences; a sequence containing ANY
    *    tombstoned doc is dropped whole; checksum over surviving bin_id.
    *  - `4_lang_rollup`: rows = languages; purged = languages whose
    *    every doc died; checksum binds (lang, surviving count) — a
    *    changed count changes the checksum even when the lang survives. */
  private[graft] def propagate(docs: DataFrame, tombs: DataFrame,
      pairs: DataFrame, packs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tomb = broadcast(
      tombs.select($"doc_id").distinct().withColumn("dead_", lit(true)))
    def withDead(df: DataFrame, key: String): DataFrame =
      df.join(tomb.withColumnRenamed("doc_id", key), Seq(key), "left_outer")
        .withColumn("dead", coalesce($"dead_", lit(false))).drop("dead_")

    // 1. documents
    val d = withDead(docs, "doc_id")
    val s1 = d.agg(count(lit(1)).as("n_before"),
      sum(when($"dead", 1L).otherwise(0L)).as("n_purged"),
      sum(when(!$"dead", 1L).otherwise(0L)).as("n_after"),
      cs1(when(!$"dead", $"doc_id")).as("survivor_checksum"))
      .select(lit("1_documents").as("surface"), $"n_before", $"n_purged",
        $"n_after", $"survivor_checksum")

    // 2. dup graph: members before, tombstoned members, re-resolved CC
    // over the induced (both-alive) subgraph
    val members = pairs.select($"doc_a".as("doc_id"))
      .union(pairs.select($"doc_b".as("doc_id"))).distinct()
    val mDead = withDead(members, "doc_id")
    val alive = withDead(
      withDead(pairs.withColumnRenamed("doc_a", "doc_id"), "doc_id")
        .withColumnRenamed("dead", "dead_a")
        .withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("doc_b", "doc_id"), "doc_id")
      .withColumnRenamed("dead", "dead_b")
      .withColumnRenamed("doc_id", "doc_b")
      .filter(!$"dead_a" && !$"dead_b")
      .select($"doc_a", $"doc_b")
    val (relabeled, _) = Dedup.connectedComponentsStar(alive)
    val s2 = mDead.agg(count(lit(1)).as("n_before"),
      sum(when($"dead", 1L).otherwise(0L)).as("n_purged"))
      .crossJoin(relabeled.agg(count(lit(1)).as("n_after"),
        coalesce(cs2($"doc_id", $"label"), lit(0L)).as("survivor_checksum")))
      .select(lit("2_dup_graph").as("surface"), $"n_before", $"n_purged",
        $"n_after", $"survivor_checksum")

    // 3. packs: drop any bin containing a tombstoned member
    val binDead = withDead(packs, "doc_id")
      .groupBy($"bin_id").agg(max($"dead").as("dead"))
    val s3 = binDead.agg(count(lit(1)).as("n_before"),
      sum(when($"dead", 1L).otherwise(0L)).as("n_purged"),
      sum(when(!$"dead", 1L).otherwise(0L)).as("n_after"),
      cs1(when(!$"dead", $"bin_id")).as("survivor_checksum"))
      .select(lit("3_packs").as("surface"), $"n_before", $"n_purged",
        $"n_after", $"survivor_checksum")

    // 4. per-lang rollup: checksum binds (lang, surviving count)
    graft.functions.PolyHash.register(spark)
    val langs = d.groupBy($"lang")
      .agg(sum(when(!$"dead", 1L).otherwise(0L)).as("n_alive"))
    val s4 = langs.agg(count(lit(1)).as("n_before"),
      sum(when($"n_alive" === 0L, 1L).otherwise(0L)).as("n_purged"),
      sum(when($"n_alive" > 0L, 1L).otherwise(0L)).as("n_after"),
      cs2(when($"n_alive" > 0L,
          call_function("poly_hash", $"lang", lit(1 << 20))),
        when($"n_alive" > 0L, $"n_alive")).as("survivor_checksum"))
      .select(lit("4_lang_rollup").as("surface"), $"n_before", $"n_purged",
        $"n_after", $"survivor_checksum")

    s1.unionByName(s2).unionByName(s3).unionByName(s4)
      .orderBy($"surface".asc)
  }

  /** Declared query: tombstones = docs whose splitmix64 draw lands on
    * `mix64(doc_id) mod 19 = 0` (~5% of the corpus — deterministic,
    * replayed by the oracle's UHUGEINT chain, and guaranteed to hit
    * dup-graph members at fixture scale); pair graph = the minhash LSH
    * pairs; packs = the packSequences bin assignment. */
  def qForget(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.functions.Mix64.register(spark)
    val docs = Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"lang")
    val tombs = docs
      .filter(pmod(call_function("mix64", $"doc_id"), lit(19L)) === 0L)
      .select($"doc_id")
    propagate(docs, tombs,
      Dedup.minHashLsh(spark, sfDir).select($"doc_a", $"doc_b"),
      TextAnalysis.packAssignments(spark, sfDir)
        .select($"doc_id", $"bin_id"))
  }
}
