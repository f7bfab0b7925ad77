package graft.tools

/** Shared best-of-N wall-clock harness for the dev probes (Q142Probe,
  * Q147Probe, ShingleProbe) — one place to change warm-up policy or
  * repetition count so decomposition probes can't silently diverge.
  */
object ProbeTiming {
  def time(label: String, reps: Int = 3, warm: Boolean = true,
      prefix: String = "==")(f: => Any): Unit = {
    if (warm) f
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"$prefix $label: best ${ts.min}%.3fs of ${ts.map(t => f"$t%.2f").mkString(",")}")
  }
}
