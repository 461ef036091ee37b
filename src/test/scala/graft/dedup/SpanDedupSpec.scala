package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("exact duplicate doc: canonical survives intact, copy fully removed") {
    import spark.implicits._
    val text = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
    val r = SpanDedup.dedupSpans(docs, "doc_id", "text", minLen = 15)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 20 && r(0).getLong(2) == 0)
    assert(r(0).getString(3) == md5hex(text))
    assert(r(1).getLong(1) == 20 && r(1).getLong(2) == 20)
    assert(r(1).getString(3) == md5hex(""))
  }

  test("shared span: only the copied run is removed from the later doc") {
    import spark.implicits._
    val span = (1 to 15).map(i => s"s$i").mkString(" ")
    val a = s"$span tailA1 tailA2"
    val b = s"headB1 headB2 $span"
    val docs = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val r = SpanDedup.dedupSpans(docs, "doc_id", "text", minLen = 15)
      .orderBy("doc_id").collect()
    // doc 0 is canonical everywhere — untouched
    assert(r(0).getLong(2) == 0 && r(0).getString(3) == md5hex(a))
    // doc 1 loses exactly the 15 copied tokens, keeps its own head
    assert(r(1).getLong(1) == 17 && r(1).getLong(2) == 15)
    assert(r(1).getString(3) == md5hex("headB1 headB2"))
  }

  test("overlapping duplicated windows union into one removed span") {
    import spark.implicits._
    // doc 1 repeats a 17-token run of doc 0: three overlapping 15-windows
    // all duplicate; their covered union must be exactly 17 positions
    val run = (1 to 17).map(i => s"r$i").mkString(" ")
    val docs = Seq((0L, s"$run endA"), (1L, s"x0 $run")).toDF("doc_id", "text")
    val r = SpanDedup.dedupSpans(docs, "doc_id", "text", minLen = 15)
      .orderBy("doc_id").collect()
    assert(r(1).getLong(2) == 17 && r(1).getString(3) == md5hex("x0"))
  }

  test("short docs and within-doc uniqueness pass through untouched") {
    import spark.implicits._
    val docs = Seq(
      (0L, "only five tokens in here"),                 // < minLen
      (1L, (1 to 30).map(i => s"u$i").mkString(" ")))   // unique content
      .toDF("doc_id", "text")
    val r = SpanDedup.dedupSpans(docs, "doc_id", "text", minLen = 15)
      .orderBy("doc_id").collect()
    assert(r.forall(_.getLong(2) == 0))
    assert(r(0).getLong(1) == 5 && r(1).getLong(1) == 30)
  }

  test("within-doc repetition dedups against the doc's own first occurrence") {
    import spark.implicits._
    val run = (1 to 15).map(i => s"p$i").mkString(" ")
    val docs = Seq((0L, s"$run mid $run")).toDF("doc_id", "text")
    val r = SpanDedup.dedupSpans(docs, "doc_id", "text", minLen = 15).collect()
    assert(r.head.getLong(1) == 31 && r.head.getLong(2) == 15)
    assert(r.head.getString(3) == md5hex(s"$run mid"))
  }
}
