package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  test("dot product matches manual computation (float arrays)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val d = df.select(VectorExpressions.dotProduct(col("a"), col("b"))).head().getDouble(0)
    assert(d == 32.0)
  }

  test("cosine similarity: orthogonal 0, parallel 1, null propagates") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(2.0f, 0.0f), Array(5.0f, 0.0f))).toDF("a", "b")
    val out = df.select(VectorExpressions.cosineSimilarity(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(out(0)) < 1e-12 && math.abs(out(1) - 1.0) < 1e-12)
    val withNull = Seq((Array(1.0f), null.asInstanceOf[Array[Float]])).toDF("a", "b")
    assert(withNull.select(VectorExpressions.cosineSimilarity(col("a"), col("b"))).head().isNullAt(0))
  }

  test("registered SQL functions work end-to-end over the embeddings table") {
    val n = spark.sql(
      s"""SELECT * FROM (
           SELECT a.vec_id, cosine_similarity(a.embedding, b.embedding) AS c,
                  dot_product(a.embedding, b.embedding) AS d
           FROM parquet.`$sf/embeddings.parquet` a
           JOIN parquet.`$sf/embeddings.parquet` b ON a.vec_id = b.vec_id)
         WHERE abs(c - 1.0) > 1e-9""").count()
    assert(n == 0) // self-cosine is 1 for every vector
  }

  test("codegen path active (no fallback): generated loop in WSCG output") {
    // parquet-backed input (LocalTableScan projections skip codegen)
    val df = graft.Tables.embeddings(spark, sf)
      .select(VectorExpressions.dotProduct(col("embedding"), col("embedding")).as("d"))
      .filter(col("d") > 0)
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.contains("Found 1 WholeStageCodegen subtrees"))
    assert(codegen.contains("getFloat")) // our generated primitive loop
    assert(df.count() > 0)
  }
}
