package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

class DedupSimilaritySpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("exact dedup keeps one survivor per distinct text") {
    val n = Tables.documents(spark, sf).select("text").distinct().count()
    assert(Dedup.exact(spark, sf).count() == n)
  }

  test("LSH candidates achieve full recall on true near-dups (jaccard >= 0.7)") {
    val truth = Dedup.ngramJaccard(spark, sf).filter(col("jaccard") >= 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test data should contain planted near-dups")
    val found = Dedup.lshVerified(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(found),
      s"LSH missed ${truth.diff(found).size} of ${truth.size} true pairs")
  }

  test("prefix-filter exact join equals the LSH-verified pair set") {
    val prefix = Dedup.prefixJoin(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.lshVerified(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefix == lsh && prefix.nonEmpty)
  }

  test("simhash: true near-dups land within small hamming distance") {
    val truth = Dedup.ngramJaccard(spark, sf).filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sims = Dedup.simhash(spark, sf).filter(col("hamming") <= 8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(sims.contains).toDouble / math.max(truth.size, 1)
    assert(truth.isEmpty || recall >= 0.8, s"simhash recall $recall on ${truth.size} pairs")
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val rows = Dedup.embedding(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }

  test("brute top-k: k results per query, ranked by descending cosine") {
    val rows = Similarity.bruteTopK(spark, sf)
      .orderBy("query_id", "rank").collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.length == Similarity.K)
      val cs = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN recall against brute force") {
    val brute = Similarity.bruteTopK(spark, sf).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(spark, sf).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(lsh.contains).toDouble / brute.size
    assert(recall >= 0.2, s"LSH recall@5 = $recall")
  }

  test("IVF ANN recall against brute force") {
    val brute = Similarity.bruteTopK(spark, sf).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, sf).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall@5 = $recall")
  }

  test("LSH candidate generation is an equi-join, not a cross join") {
    val plan = Dedup.minhashLsh(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"LSH must bucket-join, got:\n$plan")
  }
}
