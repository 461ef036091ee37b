package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashClassifierSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def weight(f: String): Long =
    java.lang.Long.parseLong(md5hex(f).take(8), 16) - (1L << 31)

  test("raw weight is the exact integer sum over unigrams + bigrams") {
    import spark.implicits._
    val r = HashClassifier.score(
      Seq((7L, "alpha beta gamma")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    val feats = Seq("alpha", "beta", "gamma", "alpha_beta", "beta_gamma")
    assert(r.getLong(1) == 5)
    assert(r.getLong(2) == feats.map(weight).sum)
    val score = r.getDouble(3)
    val expected = math.floor(
      feats.map(weight).sum.toDouble / (5.0 * (1L << 31).toDouble) * 1e6 + 0.5) / 1e6
    assert(score == expected)
    assert(r.getString(4) == (if (score > 0) "keep" else "drop"))
  }

  test("single-token doc has one feature and no bigrams") {
    import spark.implicits._
    val r = HashClassifier.score(
      Seq((0L, "  solo  ")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(r.getLong(1) == 1 && r.getLong(2) == weight("solo"))
  }

  test("blank docs yield no rows; scoring is deterministic") {
    import spark.implicits._
    val docs = Seq((0L, "   "), (1L, "a b c d e")).toDF("doc_id", "text")
    val once = HashClassifier.score(docs, "doc_id", "text").collect()
    val again = HashClassifier.score(docs, "doc_id", "text").collect()
    assert(once.length == 1 && once.sameElements(again))
  }

  test("scores are centered: a large vocabulary lands near zero mean") {
    import spark.implicits._
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 20).map(j =>
        concat(lit(s"tok${j}_"), (col("id") * 31 + j * 7) % 997)): _*).as("text"))
    val stats = HashClassifier.score(docs, "doc_id", "text")
      .agg(avg("score"), min("score"), max("score")).collect().head
    assert(math.abs(stats.getDouble(0)) < 0.05, s"mean ${stats.getDouble(0)}")
    assert(stats.getDouble(1) < 0 && stats.getDouble(2) > 0)
  }
}
