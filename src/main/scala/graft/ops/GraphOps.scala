package graft.ops

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Distributed graph primitives for the dedup operator family. */
object GraphOps {

  /** Connected components by CONTRACTION with pointer jumping: every
    * round computes, per current representative, the min over its
    * neighbor representatives (`m1`), composes that map with itself once
    * (`m2` — the pointer jump, so rep chains halve), then REWRITES the
    * edge set into the new representative space, dropping intra-component
    * edges and duplicates. The live edge set therefore shrinks
    * geometrically: a dense near-dup cluster collapses to one node after
    * the first round, and later rounds touch only the still-unmerged
    * frontier — unlike plain label propagation, whose every round re-joins
    * the FULL edge set. Convergence in O(log diameter) rounds, detected
    * for free as "no cross-representative edge left".
    *
    * The fixpoint loop is RDD-based BY DESIGN — the one place in this
    * library where the DataFrame API is the wrong tool: a driver loop
    * that re-plans a multi-join Catalyst query per round pays analysis +
    * optimization + codegen + adaptive-stage scheduling EVERY round
    * (measured ~9 Spark jobs and ~0.5 s of fixed overhead per round at
    * sf0.1, dwarfing the per-round data), exactly the trap the Spark
    * guide flags for iterative algorithms — GraphX is RDD-based for the
    * same reason. Joins inside the loop are hash-co-partitioned (narrow
    * where an input is already partitioned), reductions are map-side
    * combined, and per-round bookkeeping lives in REP space (ids that
    * merged), never over the full node set: nodes are touched exactly
    * twice, once to seed the edge set and once in the final
    * composition join.
    *
    * Correctness invariants (each checked by OpsSpec's union-find
    * cross-checks): every map value is a smaller id of the same
    * component, so maps are monotone and a fixpoint exists; an edge
    * dropped as a self-loop stays a self-loop under further composition;
    * the component's min id is a fixpoint of every map, so the final
    * uniform representative IS the min id.
    *
    * Partition count adapts to the edge count (~64k edges/partition,
    * capped at 2x default parallelism — the cap is what binds on a real
    * cluster): a near-dup pair graph is tiny relative to its corpus, so
    * small graphs schedule a handful of tasks, while a billion-edge
    * graph at 100 TB still spreads across the cluster.
    *
    * Storage: every loop persist is MEMORY_AND_DISK_SER (round 15) — a
    * boxed (Long,Long) tuple is ~60 heap bytes where its Kryo form is
    * ~16-20: on the sf100 simhash graph (634M directed edges before the
    * forest sparsification) deserialized caching alone pinned tens of
    * GB and OOM'd a 96 GB heap. Serialized blocks trade a cheap decode
    * on access for a 3x smaller and GC-invisible footprint — the right
    * trade for a loop that streams every block once per round.
    *
    * Fault tolerance: by default rounds persist serialized and keep
    * (cheap, plain-RDD) lineage — an executor loss recomputes through
    * the chain. A long-running cluster job passes `checkpointDir`
    * (HDFS/S3): each round's survivors then also write a RELIABLE
    * checkpoint that truncates lineage, bounding recovery to one round
    * regardless of iteration count (docs/SCALING.md "Fixpoint
    * checkpointing").
    *
    * `nodes`: first column = node id (any INTEGRAL type — doc ids and
    * 64-bit signatures in this library; the integral-only contract is
    * deliberate and enforced up front: non-integral ids would silently
    * break the Long-keyed contraction, so callers with string ids must
    * map them to longs first — e.g. `TextHashing.md5Long`). `pairs`:
    * first two columns = an undirected edge, each edge listed once in
    * either orientation. Returns (node, label) where label = the
    * component's min node id, in the input's id type.
    *
    * `maxIters` is a safety valve, not a knob: contraction converges in
    * O(log diameter) rounds, so 64 rounds covers any physically
    * constructible graph. If the cap IS hit the loop fails loudly
    * (IllegalStateException) instead of returning partial labels —
    * an engine must never silently mislabel components. */
  def connectedComponents(
      nodes: DataFrame, pairs: DataFrame,
      checkpointDir: Option[String] = None,
      maxIters: Int = 64): DataFrame = {
    val sess = nodes.sparkSession
    val sc = sess.sparkContext
    checkpointDir.foreach(sc.setCheckpointDir)
    val nodeField = nodes.schema.head
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(nodeField.dataType),
      s"connectedComponents needs an integral node id, got ${nodeField.dataType}")

    // observable without the debug env: round/flatten counts publish as
    // named accumulators. They are added from INSIDE a task of the final
    // labels job (driver-side .add never reaches the UI/status store —
    // accumulators surface through task-end updates only); a retried
    // task could double-count, which is acceptable for a gauge read as
    // "how deep did the fixpoint go"
    val roundsAcc = sc.longAccumulator("graft.cc.rounds")
    val flattenAcc = sc.longAccumulator("graft.cc.flattenLaps")
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    var t0 = System.nanoTime()
    def lap(name: => String): Unit =
      if (debug) {
        val t = System.nanoTime()
        println(f"[cc] $name ${(t - t0) / 1e9}%.2f s")
        t0 = t
      }
    val lMin = math.min(_: Long, _: Long)

    val Seq(srcC, dstC) = pairs.columns.toSeq.take(2)
    val pRdd = pairs.select(col(srcC).cast("long"), col(dstC).cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val nRdd = nodes.select(col(nodes.columns.head).cast("long"))
      .rdd.map(_.getLong(0))

    // size the loop's partitioner from the materialized edge count
    val edgesRaw = pRdd.flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val edgeCount = edgesRaw.count()
    val numParts = math.max(1, math.min(
      sc.defaultParallelism * 2, (edgeCount / 65536L).toInt + 1))
    val part = new HashPartitioner(numParts)
    var edges = edgesRaw.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK_SER)
    var remaining = edges.count()
    edgesRaw.unpersist(false)
    lap(s"edge setup ($edgeCount directed edges, $numParts partitions)")

    // comp: original id -> current representative, ONLY for ids that ever
    // merged (identity elsewhere) — per-round bookkeeping never scans the
    // full node set
    var comp: RDD[(Long, Long)] = sc.emptyRDD[(Long, Long)].partitionBy(part)
    var iters = 0
    while (remaining > 0L && iters < maxIters) { // maps are monotone + every live edge forces a merge: terminates
      // min neighbor rep per rep — edges are already in rep space, so
      // this is a plain map-side-combined reduction, no join
      val m1 = edges.reduceByKey(part, lMin)
        .mapPartitions(_.map { case (r, p) => (r, lMin(r, p)) }, preservesPartitioning = true)
      // pointer jump: r -> m1(m1(r)); m1 is partitioned, the swap side shuffles (tiny)
      val m2 = m1.map { case (r, v) => (v, r) }.join(m1)
        .map { case (_, (r, v2)) => (r, v2) }
      val newMap = m1.union(m2).reduceByKey(part, lMin)
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      // newMap holds one entry per LIVE representative — it shrinks with
      // the contraction. While it fits on the driver, broadcast it and
      // rewrite the (much larger) edge set in one mapPartitions pass with
      // NO shuffle except the dedup reduction; the two-join path remains
      // for a frontier too large to broadcast (early rounds of a
      // billion-edge graph).
      val bcast: Option[org.apache.spark.broadcast.Broadcast[scala.collection.mutable.LongMap[Long]]] =
        if (newMap.count() <= 1000000L)
          Some(sc.broadcast(scala.collection.mutable.LongMap(newMap.collect(): _*)))
        else None
      // rewrite edges into the new rep space; drop self-loops + duplicates
      val relabeled = bcast match {
        case Some(m) =>
          edges.mapPartitions { it =>
            val mm = m.value
            it.flatMap { case (a, b) =>
              val a2 = mm.getOrElse(a, a)
              val b2 = mm.getOrElse(b, b)
              if (a2 == b2) Iterator.empty else Iterator(((a2, b2), ()))
            }
          }
        case None =>
          edges.leftOuterJoin(newMap, part)
            .map { case (a, (b, oa)) => (b, oa.getOrElse(a)) }
            .leftOuterJoin(newMap, part)
            .map { case (b, (a2, ob)) => (a2, ob.getOrElse(b)) }
            .filter(t => t._1 != t._2)
            .map(t => (t, ()))
      }
      val nextEdges = relabeled
        .reduceByKey(new HashPartitioner(numParts), (x, _) => x)
        .map(_._1)
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      // compose the cumulative map: ids already merged follow their rep's
      // move; ids merging for the FIRST time (still their own rep, so not
      // a comp key — values are always < their key) get a fresh entry
      val moved = bcast match {
        case Some(m) =>
          comp.mapPartitions({ it =>
            val mm = m.value
            it.map { case (r0, rep) => (r0, mm.getOrElse(rep, rep)) }
          }, preservesPartitioning = true)
        case None =>
          comp.map { case (r0, rep) => (rep, r0) }
            .leftOuterJoin(newMap, part)
            .map { case (rep, (r0, o)) => (r0, o.getOrElse(rep)) }
      }
      val fresh = newMap.filter { case (k, v) => v != k }.subtractByKey(comp, part)
      val nextComp = moved.union(fresh).persist(StorageLevel.MEMORY_AND_DISK_SER)
      if (checkpointDir.isDefined) { nextEdges.checkpoint(); nextComp.checkpoint() }
      remaining = nextEdges.count()
      nextComp.count()
      edges.unpersist(false); comp.unpersist(false); newMap.unpersist(false)
      // release the round's broadcast from EXECUTOR storage now — over a
      // long run the per-round maps would otherwise accumulate there
      // until driver GC lets the ContextCleaner reap them. unpersist,
      // NOT destroy: checkpoint truncation does not strip the broadcast
      // from every already-serialized task binary (a destroyed broadcast
      // fails task serialization in later rounds), and an unpersisted
      // broadcast is simply re-sent from the driver on the rare path
      // that still needs it (lineage recompute after executor loss).
      // Driver-side, the value is reaped by GC once the round's RDD
      // graph goes unreachable.
      bcast.foreach(_.unpersist(false))
      edges = nextEdges
      comp = nextComp
      iters += 1
      lap(s"round $iters (live directed edges=$remaining)")
    }
    if (remaining > 0L) {
      // release the final round's blocks before failing: the caller
      // catches this (it's the documented fail-loudly signal) and the
      // session lives on — leaked MEMORY_AND_DISK blocks would squeeze
      // storage for every later job
      edges.unpersist(false); comp.unpersist(false)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          s"($remaining live edges) — refusing to return partial labels")
    }
    edges.unpersist(false)

    // flatten rep chains: newMap itself may contain chains (a->b, b->c —
    // m2 composes m1 only once), so a comp entry can lag the final
    // representative by several contraction steps. Pointer-jump comp over
    // itself until no value is also a key: chains halve per lap, and comp
    // is tiny (ids that merged), so this is a couple of small jobs.
    var flattening = iters > 1
    var flaps = 0
    while (flattening && flaps < 32) {
      val acc = sc.longAccumulator(s"cc_flat_$flaps")
      val next = comp.map { case (r0, rep) => (rep, r0) }
        .leftOuterJoin(comp, part)
        .map { case (rep, (r0, o)) =>
          val v = o.getOrElse(rep)
          if (v != rep) acc.add(1L)
          (r0, v)
        }.persist(StorageLevel.MEMORY_AND_DISK_SER)
      next.count()
      flattening = acc.value != 0L
      comp.unpersist(false)
      comp = next
      flaps += 1
    }
    if (debug) println(s"[cc] converged after $iters rounds (+$flaps flatten laps)")

    // nodes enter exactly once: the final composition join. The result is
    // materialized so every loop intermediate (notably the final comp)
    // can be released NOW instead of riding along until the caller's
    // DataFrame is garbage-collected; `labels` itself is freed by the
    // ContextCleaner when the result goes unreachable.
    val finalIters = iters.toLong
    val finalFlaps = flaps.toLong
    val labels = nRdd.map(n => (n, n)).reduceByKey(part, (a, _) => a)
      .leftOuterJoin(comp, part)
      .map { case (n, (_, o)) => (n, o.getOrElse(n)) }
      .mapPartitionsWithIndex({ (i, it) =>
        if (i == 0) { roundsAcc.add(finalIters); flattenAcc.add(finalFlaps) }
        it
      }, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    labels.count()
    comp.unpersist(false)
    val out = sess.createDataFrame(
      labels.map { case (n, l) => Row(n, l) },
      StructType(Seq(StructField("node", LongType), StructField("label", LongType))))
    if (nodeField.dataType == LongType) out
    else out.select(
      col("node").cast(nodeField.dataType).as("node"),
      col("label").cast(nodeField.dataType).as("label"))
  }

  /** STRING-id face of `connectedComponents` (the integral-only
    * contract above is deliberate — this is the documented bridge for
    * everyone else): ids are hashed to 60-bit longs
    * (`TextHashing.md5Long`, the library's engine-portable id hash),
    * the contraction runs in long space, and the result maps back to
    * strings with label = the MIN STRING id of each component (one
    * extra agg+join — hash order is meaningless to callers, min-string
    * is deterministic and self-describing).
    *
    * Hashing 2^60 space means collisions are birthday-bounded (~10^-18
    * at a million ids, ~50% only near 10^9) but NOT impossible, and a
    * collision would silently MERGE two components — so it is checked
    * up front (one countDistinct pass over the node ids) and the call
    * automatically re-keys through the collision-free DENSE dictionary
    * path (`connectedComponentsByStringDense`) when the check fires:
    * never a mislabel, and past the birthday bound no refusal either.
    * Callers at known-huge id counts can call the dense face directly
    * and skip the check's extra pass. */
  def connectedComponentsByString(
      nodes: DataFrame, pairs: DataFrame,
      checkpointDir: Option[String] = None,
      maxIters: Int = 64): DataFrame =
    connectedComponentsByStringHashed(nodes, pairs, TextHashing.md5Long, checkpointDir, maxIters)

  /** The hashed-contraction body with an injectable id hash — the
    * production face above passes md5Long; OpsSpec passes a DELIBERATELY
    * colliding hash to prove the collision check fires and the dense
    * fallback still labels correctly. */
  private[graft] def connectedComponentsByStringHashed(
      nodes: DataFrame, pairs: DataFrame,
      idHash: Column => Column,
      checkpointDir: Option[String] = None,
      maxIters: Int = 64): DataFrame = {
    val (ids, cleanPairs) = stringGraphInputs(nodes, pairs)
    // collision-check node ids AND pair endpoints: an endpoint absent
    // from `nodes` still enters the contraction, so an unchecked
    // collision there could silently merge components all the same
    val allIds = ids.unionByName(cleanPairs.select(col("pa").as("id")))
      .unionByName(cleanPairs.select(col("pb").as("id")))
    val chk = allIds.withColumn("hid", idHash(col("id"))).agg(
      countDistinct(col("id")).as("n_ids"),
      countDistinct(col("hid")).as("n_hashes")).collect()(0)
    if (chk.getLong(0) != chk.getLong(1))
      // a corpus big enough to birthday-bound the 60-bit hash (~50%
      // near 10^9 ids) lands here — the dense dictionary is the
      // documented escape hatch: collision-free by construction, same
      // labels, two extra shuffles. Automatic, because the alternative
      // is refusing to answer a question the engine CAN answer exactly.
      connectedComponentsByStringDense(nodes, pairs, checkpointDir, maxIters)
    else {
      val hashed = ids.withColumn("hid", idHash(col("id")))
      val hPairs = cleanPairs.select(
        idHash(col("pa")).as("ha"),
        idHash(col("pb")).as("hb"))
      val labels = connectedComponents(hashed.select("hid"), hPairs, checkpointDir, maxIters)
      minStringLabels(hashed.join(labels, col("hid") === col("node")))
    }
  }

  /** DENSE-dictionary face of `connectedComponents` for string ids —
    * the collision-free path for corpora past the 60-bit birthday bound
    * (~10^9 ids at 100 TB doc counts): every distinct id (nodes AND
    * pair endpoints) gets a unique long via zipWithIndex, so no hash,
    * no collision check, no refusal ceiling. Costs one distinct pass
    * plus two endpoint-relabel joins more than the hashed path — all
    * shuffle-partitioned, nothing driver-side. Labels are identical to
    * the hashed path's (= min STRING id per component): the dense ids
    * only exist inside the contraction, and zipWithIndex's arbitrary
    * numbering cannot leak into the output. */
  def connectedComponentsByStringDense(
      nodes: DataFrame, pairs: DataFrame,
      checkpointDir: Option[String] = None,
      maxIters: Int = 64): DataFrame = {
    val sess = nodes.sparkSession
    val (ids, cleanPairs) = stringGraphInputs(nodes, pairs)
    val allIds = ids.unionByName(cleanPairs.select(col("pa").as("id")))
      .unionByName(cleanPairs.select(col("pb").as("id")))
      .distinct()
    // zipWithIndex numbering is an artifact of partition/order, and
    // dict feeds THREE consumers (both endpoint relabels + the final
    // string join) — a recompute that renumbered ids between consumers
    // would silently mislabel. sort("id") first makes the numbering a
    // deterministic FUNCTION OF THE DATA (same ids -> same dense ids on
    // any recompute, lost executors included), so correctness never
    // rests on caching; the persist+count just keeps the contraction
    // from re-sorting per consumer, and is dropped once the fixpoint
    // (which materializes its labels internally) has run.
    val dictRdd = allIds.sort("id").rdd.map(_.getString(0)).zipWithIndex()
      .map { case (s, i) => Row(s, i) }
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val dict = sess.createDataFrame(dictRdd,
      StructType(Seq(
        StructField("id", org.apache.spark.sql.types.StringType),
        StructField("hid", LongType))))
    try {
      val dPairs = cleanPairs
        .join(dict.select(col("id").as("pa"), col("hid").as("ha")), "pa")
        .join(dict.select(col("id").as("pb"), col("hid").as("hb")), "pb")
        .select("ha", "hb")
      val labels = connectedComponents(dict.select("hid"), dPairs, checkpointDir, maxIters)
      // output rows = `nodes` rows, exactly like the hashed path (ids
      // appearing only as pair endpoints contract but don't emit a row,
      // and don't vote on the min-string label)
      minStringLabels(ids.join(dict, "id").join(labels, col("hid") === col("node")))
    } finally dictRdd.unpersist(false)
  }

  /** Shared string-graph input hygiene: ids to one string column, pair
    * endpoints cast + NULL-dropped (md5Long(null)/a null dictionary key
    * would otherwise become a phantom node silently merging every
    * component it touches). */
  private def stringGraphInputs(nodes: DataFrame, pairs: DataFrame): (DataFrame, DataFrame) = {
    val idCol = nodes.columns.head
    require(nodes.schema.head.dataType == org.apache.spark.sql.types.StringType,
      s"connectedComponentsByString needs a string node id, got ${nodes.schema.head.dataType}")
    val ids = nodes.select(col(idCol).cast("string").as("id")).na.drop()
    val Seq(aC, bC) = pairs.columns.toSeq.take(2)
    val cleanPairs = pairs
      .select(col(aC).cast("string").as("pa"), col(bC).cast("string").as("pb"))
      .na.drop()
    (ids, cleanPairs)
  }

  /** PageRank over the verified near-dup pair graph — the centrality
    * face of the dedup structure next to connected components: a high-
    * rank doc is the "template" its duplicate family orbits (the doc to
    * keep for provenance, or to inspect when a family explodes). Fixed
    * `iters` power iterations with damping 0.85 on the SYMMETRIZED pair
    * graph, every node having degree >= 1 by construction (no dangling
    * mass).
    *
    * Determinism (the iterative-decimal recipe, cf. bpe_merges'
    * unrolled oracle): per-edge contributions are PORTABLE-round-6 of
    * rank/deg as DECIMAL(18,6) — sums are then exact and order-free;
    * the damping step is exact decimal arithmetic (0.85 as
    * DECIMAL(3,2), the base term a portable-round-6 constant) with a
    * decimal round(...,6) between iterations, so both engines walk
    * identical grids for any iteration count. Scale shape: the rank
    * and degree tables are DUP-STRUCTURE-sized (never corpus-sized),
    * each iteration is one equality join + one aggregation over the
    * session-cached pair table, and the driver holds two scalars
    * (node count, base constant). */
  def pagerankNearDup(spark: org.apache.spark.sql.SparkSession, dir: String,
                      iters: Int = 5): DataFrame =
    pagerankOf(TextDedup.minhashPairs(spark, dir).select("doc_a", "doc_b"),
      iters)

  /** The power-iteration core over any (doc_a, doc_b) pair relation
    * (factored for fixtures and for callers with their own graphs). */
  def pagerankOf(pairs: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters=$iters must be positive")
    val dec = "decimal(18,6)"
    def r6(c: Column) = floor(c * lit(1.0e6) + lit(0.5)) / lit(1.0e6)
    val edges = pairs.union(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val nodes = edges.groupBy("doc_a").agg(count(lit(1)).as("deg"))
      .select(col("doc_a").as("doc_id"), col("deg"))
    val n = nodes.count() // dup-structure-sized; bounds the whole loop
    val r0 = math.floor(1.0 / n * 1.0e6 + 0.5) / 1.0e6
    val base = math.floor(0.15 / n * 1.0e6 + 0.5) / 1.0e6
    var rank = nodes.withColumn("rank", lit(r0).cast(dec))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(rank, edges("doc_a") === rank("doc_id"))
        .select(col("doc_b"),
          r6(col("rank").cast("double") / col("deg")).cast(dec).as("c"))
        .groupBy("doc_b").agg(sum("c").cast(dec).as("s"))
      rank = nodes.join(contrib, nodes("doc_id") === contrib("doc_b"), "left")
        .select(nodes("doc_id"), nodes("deg"),
          round(lit(base).cast(dec) +
            lit(BigDecimal("0.85")).cast("decimal(3,2)") *
              coalesce(col("s"), lit(0).cast(dec)), 6).cast(dec).as("rank"))
    }
    rank.select(col("doc_id"), col("deg"),
      col("rank").cast("double").as("pagerank"))
      .orderBy("doc_id")
  }

  /** Per-cluster triangle cohesion over the verified near-dup graph —
    * the third graph face beside components and PageRank: a duplicate
    * family whose edge set is triangle-dense is a true template family
    * (every copy resembles every copy); a triangle-free chain of the
    * same size is drift (A~B~C where A and C no longer match) and
    * deserves a look before keep-best collapses it. Triangles are
    * counted on the a<b<c orientation (each triangle once) via two
    * equality self-joins of the PAIR table — dup-structure-sized, the
    * standard distributed triangle recipe, never corpus-anything. */
  def triangleStats(spark: org.apache.spark.sql.SparkSession,
                    dir: String): DataFrame = {
    val pairs = TextDedup.minhashPairs(spark, dir).select("doc_a", "doc_b")
    val clus = TextDedup.minhashClusters(spark, dir)
      .select(col("doc_id"), col("cluster_rep"))
    val nodes = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
      .join(clus, "doc_id")
      .groupBy("cluster_rep").agg(count(lit(1)).as("n_nodes"))
    val edges = pairs.join(clus, pairs("doc_a") === clus("doc_id"))
      .groupBy("cluster_rep").agg(count(lit(1)).as("n_edges"))
    val tri = orientedTriangles(pairs)
      .join(clus, col("a") === clus("doc_id"))
      .groupBy("cluster_rep").agg(count(lit(1)).as("n_triangles"))
    nodes.join(edges, "cluster_rep")
      .join(tri, Seq("cluster_rep"), "left")
      .select(col("cluster_rep"), col("n_nodes"), col("n_edges"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy("cluster_rep")
  }

  /** Each triangle of an a<b oriented pair relation exactly once, on
    * the a<b<c orientation (two equality self-joins). */
  private[ops] def orientedTriangles(pairs: DataFrame): DataFrame =
    pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .join(pairs.select(col("doc_a").as("b"), col("doc_b").as("c")), "b")
      .join(pairs.select(col("doc_a").as("a"), col("doc_b").as("c")), Seq("a", "c"))
      .select(col("a"), col("b"), col("c"))

  /** Map long-space labels back to strings with label = min STRING id
    * of each component (hash/dense order is meaningless to callers). */
  private def minStringLabels(byKey: DataFrame): DataFrame = {
    val byId = byKey.select(col("id"), col("label"))
    val reps = byId.groupBy("label").agg(min(col("id")).as("label_id"))
    byId.join(reps, "label")
      .select(col("id").as("node"), col("label_id").as("label"))
  }
}
