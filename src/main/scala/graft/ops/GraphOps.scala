package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for the dedup operator family. */
object GraphOps {

  /** Connected components of an undirected graph by min-label propagation
    * with pointer jumping: each round every node takes the min label over
    * its neighborhood, then shortcuts label -> label(label), so label
    * chains halve every round — convergence in O(log diameter) rounds,
    * each round two equality joins + a hash agg over (nodes + edges)
    * rows. No driver-side graph state: the driver loop only orchestrates
    * rounds and reads a converged/not-converged flag.
    *
    * `nodes`: first column = node id (any orderable type). `pairs`: first
    * two columns = an undirected edge, each edge listed once in either
    * orientation. Returns (node, label) where label = the component's min
    * node id.
    *
    * Every round is lineage-truncated (localCheckpoint): plans stay flat
    * regardless of iteration count. `stepped` is materialized too — the
    * pointer-jump self-join references it twice, and an unmaterialized
    * reference would re-execute the neighborhood join per reference
    * (measured 2x slower). Convergence is read from the carried old_label
    * column of the round's own checkpoint — no extra join or count job
    * (round-4 advice: the per-round count was the dominant fixed cost). */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    val Seq(srcC, dstC) = pairs.columns.toSeq.take(2)
    val p = pairs.select(col(srcC).as("src"), col(dstC).as("dst"))
    val edges = p
      .unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = nodes.select(col(nodes.columns.head).as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var converged = false
    var iters = 0
    while (!converged && iters < 64) { // monotone-decreasing labels: fixpoint guaranteed; 64 = safety cap
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("label").as("nlabel")), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min("nlabel").as("nmin"))
      val stepped = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(true)
      val jumped = stepped
        .join(stepped.select(col("node").as("label"), col("label").as("plabel")),
          Seq("label"), "left")
        .select(col("node"), col("old_label"),
          least(col("label"), coalesce(col("plabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      converged = jumped.filter(col("label") =!= col("old_label")).isEmpty
      labels = jumped.select("node", "label")
      iters += 1
    }
    labels
  }
}
