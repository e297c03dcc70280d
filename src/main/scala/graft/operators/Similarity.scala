package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Three tiers:
  *  - bruteTopK: exact baseline — broadcast the (small) query set,
  *    narrow map over the corpus, per-query top-k. O(n·q), scales with
  *    corpus size linearly and is the correctness oracle.
  *  - lshTopK: random-hyperplane LSH — candidates share a signature
  *    bucket with the query; exact rank inside buckets.
  *  - ivfTopK: IVF — corpus assigned to nearest centroid; queries probe
  *    the closest `nprobe` centroid lists only.
  */
object Similarity {

  val K = 5

  private def queries(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
  }

  private def corpus(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddingsParallel(s, dir).filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
  }

  private def topKPerQuery(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rank"))
  }

  /** Exact brute-force cosine top-k (oracle-able: bit-exact cosine). */
  def bruteTopK(s: SparkSession, dir: String): DataFrame = {
    val scored = broadcast(queries(s, dir)).crossJoin(corpus(s, dir))
      .select(col("query_id"), col("cand_id"),
        expr("graft_cosine(q_emb, c_emb)").as("cosine"))
    topKPerQuery(scored)
  }

  val LshTables = 8          // independent hash tables (OR-amplification)
  val LshPlanesPerTable = 6  // bits per table (AND within a table)

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * ±1 from splitmix64 parity — public-domain mix constants. */
  private def planeSign(plane: Int, dim: Int): Int = {
    var z = (plane.toLong << 32 | dim.toLong) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) 1 else -1
  }

  /** table-t signature: bit j = [dot(v, plane_{t*P+j}) > 0]. */
  private def lshSig(emb: Column, table: Int, dims: Int): Column =
    (0 until LshPlanesPerTable).map { j =>
      val p = table * LshPlanesPerTable + j
      val signed = zip_with(emb,
        lit((0 until dims).map(d => planeSign(p, d)).toArray),
        (x, sgn) => x.cast("double") * sgn)
      shiftleft(when(VectorOps.seqSum(signed) > 0, 1L).otherwise(0L), j)
    }.reduce(_.bitwiseOR(_))

  /** Multi-table random-hyperplane LSH ANN: a candidate matches the
    * query's bucket in ANY of the L tables (posexplode over table
    * signatures → equi-join on (table, sig)); exact cosine rank over
    * the deduped candidate set. Recall/latency tradeoff measured in
    * SimilaritySpec against bruteTopK. */
  def lshTopK(s: SparkSession, dir: String): DataFrame = {
    val dims = 64
    def withSigs(df: DataFrame, emb: String): DataFrame =
      df.select(col("*"), posexplode(array(
        (0 until LshTables).map(t => lshSig(col(emb), t, dims)): _*)))
        .withColumnRenamed("pos", "table").withColumnRenamed("col", "sig")
    val q = withSigs(queries(s, dir), "q_emb")
    val c = withSigs(corpus(s, dir), "c_emb")
    val cands = broadcast(q).join(c, Seq("table", "sig"))
      .select(col("query_id"), col("cand_id"), col("q_emb"), col("c_emb"))
      .dropDuplicates("query_id", "cand_id")
    val scored = cands.select(col("query_id"), col("cand_id"),
      expr("graft_cosine(q_emb, c_emb)").as("cosine"))
    topKPerQuery(scored)
  }

  val IvfProbes = 4
  val IvfLloydIters = 2

  /** Lloyd k-means refinement of the deterministic seed centroids.
    * Centroid averaging goes through exact decimal sums so the means
    * are order-independent (a distributed float sum would make IVF
    * assignments nondeterministic across runs). */
  private def kmeansCentroids(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val corpusV = Tables.embeddingsParallel(s, dir)
      .select(col("vec_id"), col("embedding"))
    var cents = Tables.embeddings(s, dir).filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cent_id"),
        expr("transform(embedding, x -> CAST(x AS FLOAT))").as("cent_emb"))
    for (_ <- 1 to IvfLloydIters) {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cent_id"))
      val assigned = corpusV.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cent_id"),
          expr("graft_cosine(embedding, cent_emb)").as("cos"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      cents = assigned
        .select(col("cent_id"), posexplode(col("embedding")))
        .groupBy(col("cent_id"), col("pos"))
        .agg((sum(col("col").cast("decimal(28,10)")) / count(lit(1)))
          .cast("float").as("mean"))
        .groupBy(col("cent_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mean")))).as("pm"))
        .select(col("cent_id"), expr("transform(pm, x -> x.mean)").as("cent_emb"))
    }
    cents
  }

  /** IVF ANN: deterministic seeds + Lloyd refinement; corpus
    * partitioned by nearest centroid, queries probe the nprobe nearest
    * centroid lists. */
  def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    val cents = kmeansCentroids(s, dir)
    // assign corpus vectors to nearest centroid
    val assignW = Window.partitionBy(col("cand_id"))
      .orderBy(col("cent_cos").desc, col("cent_id"))
    val assigned = corpus(s, dir).crossJoin(broadcast(cents))
      .select(col("cand_id"), col("c_emb"), col("cent_id"),
        expr("graft_cosine(c_emb, cent_emb)").as("cent_cos"))
      .withColumn("rn", row_number().over(assignW)).filter(col("rn") === 1)
      .select(col("cand_id"), col("c_emb"), col("cent_id"))
    // queries pick nprobe nearest centroids
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_cos").desc, col("cent_id"))
    val probes = queries(s, dir).crossJoin(broadcast(cents))
      .select(col("query_id"), col("q_emb"), col("cent_id"),
        expr("graft_cosine(q_emb, cent_emb)").as("cent_cos"))
      .withColumn("rn", row_number().over(probeW)).filter(col("rn") <= IvfProbes)
      .select(col("query_id"), col("q_emb"), col("cent_id"))
    val scored = broadcast(probes).join(assigned, Seq("cent_id"))
      .select(col("query_id"), col("cand_id"),
        expr("graft_cosine(q_emb, c_emb)").as("cosine"))
    topKPerQuery(scored)
  }
}
