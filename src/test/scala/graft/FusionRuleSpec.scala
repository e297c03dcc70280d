package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.sources.Tables

class FusionRuleSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("HOF cosine chain is fused into the native CosineSim expression") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val df = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        VectorOps.cosine(col("ea"), col("eb")).as("cos"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_cosine"),
      s"fusion rule did not fire:\n$optimized")
  }

  test("fused and explicit native cosine are bit-identical") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf).limit(50)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    val viaHof = pairs.select(col("ia"), col("ib"),
        VectorOps.cosine(col("ea"), col("eb")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaNative = pairs.select(col("ia"), col("ib"),
        expr("graft_cosine(ea, eb)").as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaHof == viaNative)
  }
}
