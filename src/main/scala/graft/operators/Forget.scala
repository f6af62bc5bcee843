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
    * `curveWriteScan` idiom). Coalesced to 0 so the degenerate
    * all-purged surface stays well-typed (a getLong consumer must never
    * NPE on an empty survivor set) — every surface and the oracle agree
    * on the same convention. */
  private def cs1(k: Column): Column = coalesce(
    pmod(sum((pmod(k, lit(P)) * pmod(k, lit(P)) % P).cast("decimal(38,0)")),
      lit(P).cast("decimal(38,0)")).cast("long"), lit(0L))

  /** Two-key variant: term = ((k1 mod P)·31 + k2 mod P) mod P, then the
    * same squared fold — binds VALUE pairs (member → keeper, lang →
    * count), so a survivor keeping its row but changing its label still
    * changes the checksum. Same coalesce-to-0 convention as [[cs1]]. */
  private def cs2(k1: Column, k2: Column): Column = {
    val term = (pmod(k1, lit(P)) * 31 + pmod(k2, lit(P))) % P
    coalesce(pmod(sum((term * term % P).cast("decimal(38,0)")),
      lit(P).cast("decimal(38,0)")).cast("long"), lit(0L))
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
        cs2($"doc_id", $"label").as("survivor_checksum")))
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

  /** INCREMENTAL forget — [[propagate]]'s dup-graph surface scoped to
    * TOMBSTONE-TOUCHED components only, against the persisted
    * member→label state `Dedup.dedupIncrementalCc` maintains. The
    * correctness lever is one-directional monotonicity: deletions can
    * only SPLIT or SHRINK a connected component, never merge two — so a
    * component with zero tombstoned members keeps every member, every
    * pair, and its keeper, and its persisted labels pass through
    * VERBATIM (never recomputed, never even read back from the pair
    * store). Only touched components re-resolve, over their induced
    * both-alive pair subgraph, through the shared star-CC resolver.
    *
    * Inputs model the production state a daily compliance batch reads:
    *  - `labels`: the persisted (doc_id, label) table,
    *  - `labeledPairs`: the pair store tagged with its component label —
    *    at 100 TB this table is PARTITIONED by label, so the touched-only
    *    semi-join below is a partition-pruned read (ForgetSpec proves
    *    functional independence by handing this function a pair store
    *    that simply lacks the untouched components' pairs),
    *  - `tombs`: the compliance-sized forget list (broadcast — the
    *    corpus never shuffles to learn who died).
    *
    * Output = `dedup_clusters` shape (doc_id, cluster_id, is_keeper);
    * the declared oracle is the FULL re-resolution walk over the whole
    * induced alive subgraph, so the hash gate IS scoped ≡ full — the
    * `dedup_incremental_cc` proof in reverse. */
  private[graft] def forgetLabelsScoped(labels: DataFrame,
      labeledPairs: DataFrame, tombs: DataFrame): DataFrame = {
    val spark = labels.sparkSession
    import spark.implicits._
    val tomb = broadcast(tombs.select($"doc_id").distinct())
    // touched components: labels owning >= 1 tombstoned member —
    // compliance-batch-sized by construction, broadcast everywhere below
    val touched = broadcast(
      labels.join(tomb, Seq("doc_id"), "left_semi")
        .select($"label").distinct())
    val untouched = labels.join(touched, Seq("label"), "left_anti")
      .select($"doc_id", $"label")
    // touched components' pairs with both endpoints alive — the ONLY
    // edges the resolver ever sees
    val alive = labeledPairs
      .join(touched, Seq("label"), "left_semi")
      .join(tomb.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"),
        "left_anti")
      .join(tomb.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"),
        "left_anti")
      .select($"doc_a", $"doc_b")
    val (relabeled, _) = Dedup.connectedComponentsStar(alive)
    untouched.unionByName(relabeled.select($"doc_id", $"label"))
      .select($"doc_id", $"label".as("cluster_id"),
        ($"doc_id" === $"label").as("is_keeper"))
      .orderBy($"doc_id".asc)
  }

  /** Declared incremental-forget query against the PHYSICAL pair store
    * ([[graft.sources.Etl.pairStoreFixture]]): persisted state = the
    * on-disk member→label table plus the pair store directory-partitioned
    * by `lbucket = label mod 1024`; tombstones = the same
    * `mix64(doc_id) mod 19 = 0` draw as [[qForget]]. The touched-label
    * buckets (≤ 1024 ints, compliance-derived — bounded driver metadata,
    * the zone-map-candidate precedent) are collected and applied as a
    * literal isin on the partition column, so the pair-store read is a
    * PLAN-TIME partition prune: untouched components' pairs are never
    * listed, opened, or decoded — at 100 TB the daily compliance batch
    * reads O(touched pairs), not the graph (PlanSpec pins the
    * PartitionFilters; ForgetSpec proves the pruned file set). The
    * oracle re-resolves the ENTIRE induced alive subgraph from
    * scratch, so the hash gate is pruned-scoped ≡ full. */
  def qDedupForgetCc(spark: SparkSession, sfDir: String): DataFrame = {
    val (labels, labeledPairs, tombs) = prunedPairStore(spark, sfDir)
    forgetLabelsScoped(labels, labeledPairs, tombs)
  }

  /** The physical reads behind [[qDedupForgetCc]], exposed so PlanSpec
    * can pin the pruned pair-store scan DIRECTLY (the star-CC resolver
    * materializes its input eagerly, so the declared query's final plan
    * only shows the frozen iterate — the PartitionFilters live on this
    * read's plan). Returns (labels, pruned labeled pairs, tombstones). */
  private[graft] def prunedPairStore(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    graft.functions.Mix64.register(spark)
    val root = graft.sources.Etl.pairStoreFixture(spark, sfDir)
    val labels = spark.read.parquet(s"$root/labels")
    val tombs = Tables.read(spark, sfDir, "documents")
      .filter(pmod(call_function("mix64", $"doc_id"), lit(19L)) === 0L)
      .select($"doc_id")
    val touchedBuckets = labels
      .join(broadcast(tombs), Seq("doc_id"), "left_semi")
      .select(pmod($"label",
        lit(graft.sources.Etl.PairStoreBuckets.toLong)).cast("int")
        .as("lbucket"))
      .distinct().collect().map(_.getInt(0)).sorted
    val labeledPairs = spark.read.parquet(s"$root/pairs")
      .filter($"lbucket".isin(touchedBuckets.map(Integer.valueOf): _*))
      .select($"doc_a", $"doc_b", $"label")
    (labels, labeledPairs, tombs)
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
