package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench turbulence/retry rules (VERDICT r11 #3). The happy
  * path (an idle box) never exercises the retry pass in a real run, so
  * without these tests a regression in the spike logic would only
  * surface in a NOISY official window — exactly when it matters.
  */
class BenchSpec extends AnyFunSuite {
  private def obs(name: String, ts: Double*): (String, Option[Seq[Double]]) =
    name -> Some(ts)

  test("turbulentOf: retries only non-trivial spreads, never errors or floor jitter") {
    val first = Seq(
      obs("steady", 1.0, 1.1, 1.05),          // calm: no retry
      obs("spiky", 0.9, 0.95, 2.1),           // ≥2× spread on >0.25 s: retry
      obs("floor_jitter", 0.02, 0.08, 0.05),  // huge spread, trivial abs: no
      obs("boundary", 0.26, 0.52, 0.3),       // exactly 2.0× is NOT > 2.0
      "errored" -> None)                      // failed: report -1, no retry
    assert(Bench.turbulentOf(first) == Seq("spiky"))
  }

  test("turbulentOf: the cap bounds a sweep-wide hot window") {
    val hot = (1 to 40).map(i => obs(f"q$i%02d", 0.5, 0.6, 1.5))
    assert(Bench.turbulentOf(hot).size == 25)
    assert(Bench.turbulentOf(hot, cap = 3) == Seq("q01", "q02", "q03"))
  }

  test("heavyOf: a uniformly-inflated heavy query retries even with zero internal spread") {
    // 20 calm ~0.15 s queries set the median; "hot" ran 1.4 s three times
    // in a row (a window that outlasted the triple — turbulentOf is blind
    // to it), "big" is legitimately heavy but below 3× the median only if
    // the median is large enough — here 3×0.15 = 0.45, so both qualify;
    // "small" is above 3× median but under the 0.5 s absolute floor.
    val calm = (1 to 20).map(i => obs(f"c$i%02d", 0.15, 0.16, 0.15))
    val first = calm ++ Seq(
      obs("hot", 1.4, 1.41, 1.39),
      obs("big", 1.6, 1.65, 1.62),
      obs("small", 0.48, 0.49, 0.48),
      "dead" -> None)
    assert(Bench.heavyOf(first).toSet == Set("hot", "big"))
    assert(Bench.turbulentOf(first).isEmpty) // spread rule alone misses all of it
  }

  test("retryCandidatesOf: heavy queries survive the cap under a sweep-wide hot window") {
    // 40 marginal spread-flagged queries (alphabetically early) + one
    // uniformly-inflated heavy query: severity ranking must keep the
    // heavy one inside the cap even though the spread set alone overflows
    val noisy = (1 to 40).map(i => obs(f"a$i%02d", 0.30, 0.35, 0.75))
    val first = noisy :+ obs("z_heavy", 5.0, 5.1, 5.0)
    val picked = Bench.retryCandidatesOf(first, cap = 10)
    assert(picked.head == "z_heavy", "heaviest first-pass best must rank first")
    assert(picked.size == 10)
  }

  test("heavyOf: empty and all-errored sweeps return nothing") {
    assert(Bench.heavyOf(Nil).isEmpty)
    assert(Bench.heavyOf(Seq("dead" -> None)).isEmpty)
  }

  test("foldRuns: retry observations can rescue a spiked first pass; min wins") {
    val first = Seq(obs("spiky", 4.5, 4.6, 4.4), obs("calm", 0.5, 0.5, 0.5))
    val (results, _) = Bench.foldRuns(first, Map("spiky" -> Seq(0.8, 0.7, 0.75)))
    assert(results.toMap.apply("spiky") == 0.7) // deferred idle re-run sets the number
    assert(results.toMap.apply("calm") == 0.5)
  }

  test("foldRuns: errored queries report -1 and never gain a spread entry") {
    val (results, spreads) = Bench.foldRuns(Seq("dead" -> None), Map.empty)
    assert(results == Seq("dead" -> -1.0))
    assert(spreads.isEmpty)
  }

  test("foldRuns: spreads emit only non-degenerate med/min on non-trivial absolutes") {
    val first = Seq(
      obs("turbulent", 0.5, 2.0, 2.5),  // med/min = 4.0 → emitted
      obs("calm", 1.0, 1.1, 1.2),       // 1.1 → suppressed
      obs("tiny", 0.01, 0.2, 0.3))      // best ≤ 0.1 s → suppressed
    val (_, spreads) = Bench.foldRuns(first, Map.empty)
    assert(spreads.map(_._1) == Seq("turbulent"))
    assert(math.abs(spreads.head._2 - 4.0) < 1e-9)
  }

  test("foldRuns: a retried query's spread covers ALL observations (spike stays visible)") {
    // the reported VALUE recovers via the retry, but the spread still
    // records that the first pass was hot — the driver can see both
    val (results, spreads) =
      Bench.foldRuns(Seq(obs("spiky", 4.5, 4.6, 4.4)), Map("spiky" -> Seq(0.7, 0.7, 0.8)))
    assert(results.toMap.apply("spiky") == 0.7)
    assert(spreads.toMap.apply("spiky") > 5.0) // med 4.4 over min 0.7
  }

  test("windowOf: idle ledgers (0-2 flags) stay idle, the r14-shaped sweep (24) stamps hot") {
    assert(Bench.windowOf(0) == "idle")
    assert(Bench.windowOf(2) == "idle")
    assert(Bench.windowOf(7) == "idle")
    assert(Bench.windowOf(8) == "hot") // threshold inclusive
    assert(Bench.windowOf(24) == "hot")
  }
}
