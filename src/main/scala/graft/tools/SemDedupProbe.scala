package graft.tools

import org.apache.spark.sql.functions._
import graft.sim.SemDedup

/** Measures the q61 pinned-oracle values: SemDeDup dup counts + recall vs
  * the exact all-pairs truth, per scale factor and nlist. The q61Sql
  * literals in queries.CorpusQueries come from this tool's output at the
  * production setting — rerun after any change to Ivf.train, assignCell,
  * Components, or the cosine expression. */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val tau = 0.35
    for (dir <- sfs; nlist <- Seq(4, 8); a <- Seq(1, 2, 3)) {
      val emb = graft.Tables.embeddings(spark, dir)
      val sem = SemDedup.semDedup(emb, tau = tau, nlist = nlist, assignments = a)
      val exact = SemDedup.exactDedup(emb, tau = tau)
      val rows = SemDedup.agreementReport(sem, exact, recallMin = 0.0)
        .orderBy(col("metric")).collect()
      val vals = rows.map(r => f"${r.getString(0)}=${r.getDouble(2)}%.4f").mkString(" ")
      println(s"PROBE sf=$dir nlist=$nlist a=$a tau=$tau $vals")
    }
    spark.stop()
  }
}
