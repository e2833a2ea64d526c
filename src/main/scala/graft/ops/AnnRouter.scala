package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The single ANN dispatch ladder — every corpus-id search path the
  * library implements, routed by name. `Graft.annSearch` delegates here,
  * and composed operators (hybrid retrieval's vector leg) route through
  * the same ladder instead of hardcoding one probe, so a persisted
  * index built once serves every consumer.
  *
  * All methods output (qid, vec_id, score) with score named `cos_sim`
  * (exact) except "pq"/"sq" which name it `approx_sim` (ADC, no
  * rerank) — rank-fusion consumers need only a total order, so both
  * kinds fuse; `scoreColumn` tells a consumer which column to rank on.
  */
object AnnRouter {

  /** Column carrying the ranking score for `method`'s output. */
  def scoreColumn(method: String): String = method match {
    case "pq" | "sq" => "approx_sim"
    case _           => "cos_sim"
  }

  /** ANN top-k for corpus query ids, persisted-index-first where an
    * index applies (see Graft.annSearch's scaladoc for the method
    * catalog). `shortlist = 0` means the 4k default. */
  def topKFor(spark: SparkSession, dir: String, queryIds: Seq[Long], k: Int,
              nprobe: Int = 1, method: String = "ivf", shortlist: Int = 0,
              nTables: Int = 4): DataFrame = {
    val sl = if (shortlist > 0) shortlist else 4 * k
    method match {
      case "ivf"            => Similarity.ivfTopKFor(spark, dir, queryIds, k, nprobe)
      case "brute"          => Similarity.bruteForceTopKFor(spark, dir, queryIds, k)
      case "lsh"            => Similarity.lshTopKFor(spark, dir, queryIds, k)
      case "lsh_multiprobe" => Similarity.lshMultiProbeTopKFor(spark, dir, queryIds, k)
      case "lsh_multitable" => Similarity.lshMultiTableTopKFor(spark, dir, queryIds, k, nTables)
      case "pq"             => Similarity.pqTopKFor(spark, dir, queryIds, k)
      case "pq_rerank"      => Similarity.pqTopKReranked(spark, dir, queryIds, k, sl)
      case "ivfpq"          => Similarity.ivfPqTopKFor(spark, dir, queryIds, k, nprobe, sl)
      case "ivfpq_residual" => Similarity.ivfPqResidualTopKFor(spark, dir, queryIds, k, nprobe, sl)
      case "sq"             => ScalarQuant.sqTopKFor(spark, dir, queryIds, k)
      case "sq_rerank"      => ScalarQuant.sqTopKReranked(spark, dir, queryIds, k, sl)
      case other => throw new IllegalArgumentException(
        s"unknown ANN method '$other' (expected ivf | brute | lsh | lsh_multiprobe | " +
          "lsh_multitable | pq | pq_rerank | ivfpq | ivfpq_residual | sq | sq_rerank)")
    }
  }
}
