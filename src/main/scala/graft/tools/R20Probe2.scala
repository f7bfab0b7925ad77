package graft.tools

import graft.{Bench, Session, SparkEntry}

/** r20 regression probe: q55/q56 gate readings moved +52%/+63% over their
  * recorded ratios in the first post-degeneracy-bound gate window
  * (tools/scale_r20_dev1.json). Suspect: expandRepPairs/sameIdPairs fork
  * their input into complementary normal/degenerate filters WITHOUT a
  * cache at the fork, so the pair pipeline above re-executes per branch.
  * This probe times the two queries cold+warm on the gate corpus for an
  * A/B across trees (run at HEAD, then with the pre-bound TextOps).
  */
object R20Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf01x10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q55_simhash_near_dups", "q56_minhash_candidates")) {
      for (round <- Seq("cold", "warm1", "warm2", "warm3")) {
        val t0 = System.nanoTime()
        Bench.force(SparkEntry.queries(q)(spark, dir))
        println(f"$q $round ${(System.nanoTime() - t0) / 1e9}%6.2fs")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
