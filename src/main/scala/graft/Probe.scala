package graft

import graft.core.Tables
import graft.operators.Dedup

/** Ad-hoc profiling main for the dedup hot paths. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Verify.makeSession("32")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    println("[probe] docs=" + docs.count())
    println("[probe] d5 pairs=" + time("d5 minhash")(
      Dedup.minHashNearDuplicates(docs, "doc_id", "text",
        numHashes = 32, numBands = 4, jaccardThreshold = 0.5).count()))
    println("[probe] d6 pairs=" + time("d6 jaccard")(
      Dedup.blockedJaccardPairs(docs, "doc_id", "text",
        Seq("source", "lang"), 3, 0.05).count()))
    println("[probe] d7 pairs=" + time("d7 simhash")(
      Dedup.simHashNearDuplicates(docs, "doc_id", "text", 12).count()))
    spark.stop()
  }
}
