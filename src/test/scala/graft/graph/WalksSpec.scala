package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WalksSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (String, String)*) = rows.toDF("src", "dst")
  private val ord: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    c => substring(c, 2, 18).cast("long")

  test("hop choice is the hash-argmin neighbor, reproducibly") {
    // n1 has three out-neighbors; the pick must match the hash formula
    val e = edges(("n1", "n2"), ("n1", "n3"), ("n1", "n4"), ("n2", "n5"),
      ("n3", "n5"), ("n4", "n5"))
    val seeds = Seq("n1").toDF("node")
    val r1 = Walks.run(e, seeds, steps = 2, ord).collect().head
    val expected = Seq(2L, 3L, 4L).minBy(d => (1 * 31 + 1 * 17 + d * 2654435761L) % 1000003L)
    assert(r1.getString(1) == s"n$expected")
    assert(r1.getString(2) == "n5")
    // reproducible: a second run picks the identical path
    val r2 = Walks.run(e, seeds, steps = 2, ord).collect().head
    assert(r1 == r2)
  }

  test("every seed walks; dead ends carry null hops from there on") {
    val e = edges(("a1", "a2"), ("b1", "b2"), ("b2", "b3"))
    val seeds = Seq("a1", "b1").toDF("node")
    val out = Walks.run(e, seeds, steps = 3, ord).collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)), Option(r.getString(2)),
        Option(r.getString(3))))).toMap
    assert(out("a1") == ((Some("a2"), None, None)))
    assert(out("b1") == ((Some("b2"), Some("b3"), None)))
  }

  test("walks from different seeds are independent (same step, own hash)") {
    // two seeds share the neighbor set; picks may differ because the
    // current-node ordinal feeds the hash
    val e = edges(("s1", "t5"), ("s1", "t6"), ("s2", "t5"), ("s2", "t6"))
    val seeds = Seq("s1", "s2").toDF("node")
    val out = Walks.run(e, seeds, steps = 1, ord).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    def pick(s: Long) = Seq(5L, 6L).minBy(d => (s * 31 + 17 + d * 2654435761L) % 1000003L)
    assert(out("s1") == s"t${pick(1)}")
    assert(out("s2") == s"t${pick(2)}")
  }
}
