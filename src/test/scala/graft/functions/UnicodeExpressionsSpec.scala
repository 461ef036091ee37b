package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("NFC composes decomposed sequences; composed input is unchanged") {
    val decomposed = "re\u0301sume\u0301" // e + combining acute, twice
    val composed = "r\u00e9sum\u00e9"
    val out = Seq(decomposed, composed, "plain ascii").toDF("s")
      .select(UnicodeNorm.nfcNormalize(col("s")).as("n"))
      .as[String].collect().toSeq
    assert(out(0) === composed)
    assert(out(1) === composed)
    assert(out(2) === "plain ascii")
  }

  test("character length shrinks by exactly the combining marks") {
    val df = Seq("nai\u0308ve").toDF("s")
      .select(length(col("s")).as("raw"),
        length(UnicodeNorm.nfcNormalize(col("s"))).as("nfc"))
    val r = df.head()
    assert(r.getInt(0) == 6 && r.getInt(1) == 5)
  }

  test("null propagates") {
    val df = Seq(Option.empty[String]).toDF("s")
      .select(UnicodeNorm.nfcNormalize(col("s")))
    assert(df.head().isNullAt(0))
  }

  test("codegen path active over a parquet scan") {
    val df = graft.Tables.documents(spark, sf)
      .select(length(UnicodeNorm.nfcNormalize(col("text"))).as("n"))
      .filter(col("n") > 0)
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.contains("Found 1 WholeStageCodegen subtrees"))
    assert(codegen.contains("graft.functions.UnicodeNorm.nfc"))
    assert(df.count() > 0)
  }
}
