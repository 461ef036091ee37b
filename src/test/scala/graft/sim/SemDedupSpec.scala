package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {

  private lazy val emb = graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 200)

  test("nlist=1 clustered path is identical to the exact all-pairs truth") {
    val sem = SemDedup.semDedup(emb, tau = 0.35, nlist = 1, assignments = 1)
      .orderBy("id").collect()
    val exact = SemDedup.exactDedup(emb, tau = 0.35).orderBy("id").collect()
    assert(sem.length == 200 && sem.sameElements(exact))
  }

  test("assignments = nlist (every cell probed) also recovers the exact truth") {
    val sem = SemDedup.semDedup(emb, tau = 0.35, nlist = 4, assignments = 4)
      .orderBy("id").collect()
    val exact = SemDedup.exactDedup(emb, tau = 0.35).orderBy("id").collect()
    assert(sem.sameElements(exact))
  }

  test("canonical ids are component minima; non-duplicates map to themselves") {
    val sem = SemDedup.semDedup(emb, tau = 0.35, nlist = 4)
    assert(sem.filter(col("canonical_id") > col("id")).count() == 0)
    assert(sem.filter(!col("is_duplicate") && col("canonical_id") =!= col("id")).count() == 0)
    assert(sem.count() == 200)
  }

  test("soft assignment dominates hard assignment on recall") {
    val exact = SemDedup.exactDedup(emb, tau = 0.35)
    def recall(a: Int): Double = {
      val sem = SemDedup.semDedup(emb, tau = 0.35, nlist = 8, assignments = a)
      val rows = SemDedup.agreementReport(sem, exact, recallMin = 0.0)
        .filter(col("metric") === "semdedup_dup_recall").collect()
      rows.head.getDouble(2)
    }
    val (hard, soft) = (recall(1), recall(2))
    assert(soft >= hard, s"soft=$soft < hard=$hard")
    assert(soft >= 0.5, s"soft-assignment recall unexpectedly low: $soft")
  }
}
