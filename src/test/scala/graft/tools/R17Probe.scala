package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Session, Tables}
import ProbeTiming.time

/** r17 decomposition probe for q54_ann_ivf (VERDICT r16 watch item 3:
  * 0.70-0.81 s stable in every r16 sweep vs a 57 ms anchor — 14×, above
  * its historical floor class). Counts the jobs the full query pays
  * (q164-style) and times the component frames — centroid build (two
  * shuffles over the posexploded corpus), probe ranking (broadcast
  * cross-join + per-query window), candidate re-rank (list join + window)
  * — so the accept/fix call can name the stage.
  * Usage: Test/runMain graft.tools.R17Probe <sfDir>
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def jobs[A](label: String)(f: => A): Unit = {
      val sc = spark.sparkContext
      val before = sc.statusTracker.getJobIdsForGroup(null).length
      time(label)(f)
      val after = sc.statusTracker.getJobIdsForGroup(null).length
      // time() runs warmup + 3 reps = 4 executions; report jobs/execution
      println(s"   $label jobs/exec=${(after - before) / 4.0}")
    }

    val e = Tables.load(spark, dir, "embeddings")
    // scan floor: one pass over the embedding column
    jobs("embeddings_scan")(e.agg(count(lit(1))).head())
    // centroid build alone (posexplode + 2 groupBys)
    jobs("centroids_only")(
      graft.operators.Similarity.centroidVectors(e).count())
    // full query
    jobs("q54_full")(
      graft.SparkEntry.queries("q54_ann_ivf")(spark, dir).count())
    // q53 LSH for the family comparison (same corpus, banded buckets)
    jobs("q53_full")(
      graft.SparkEntry.queries("q53_ann_lsh")(spark, dir).count())
    spark.stop()
  }
}

/** r17 pricing of the q49 doubled posting exchange at the 100× corpus
  * (VERDICT r16 ask 3): the two self-join sides re-run the identical
  * repartition (AQE does not dedupe them — R16Probe2 stages 13/14,
  * ~10 s of 107 at 100×). Same-JVM interleaved C,D,C,D (the r16
  * measurement discipline): C = the shipped jaccardPairs (exchange paid
  * twice), D = C with the keyed frame persisted (exchange paid once,
  * cache write+read added). 10× pricing said no-win; this is the 100×
  * re-price. Usage: Test/runMain graft.tools.R17Probe2 <docsDir> [hash] [reps]
  */
object R17Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val hash = args.length > 1 && args(1) == "hash"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def top20(p: DataFrame): DataFrame = p
      .orderBy(col("jaccard").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(20).select(col("doc_a"), col("doc_b"), col("common"), col("jaccard"))

    // arm C: the shipped spelling, via the library itself
    def buildC(): DataFrame = top20(graft.operators.TextOps.jaccardPairs(
      Tables.load(spark, dir, "documents"), hashShingles = hash))

    // arm D: identical dataflow, keyed posting frame persisted so the
    // self-join's two sides read ONE materialized exchange
    def buildD(): DataFrame = {
      val docs = Tables.load(spark, dir, "documents")
      val arr0 = docs.select(col("doc_id"),
        call_function("word_shingles", col("text"), lit(3), lit(true)).as("arr"))
      val arr = (if (hash) arr0.select(col("doc_id"),
          expr("transform(arr, s -> xxhash64(s))").as("arr"))
        else arr0).persist()
      arr.count()
      val nDocs = docs.select(count(lit(1)).as("n_docs"))
      val hotArr = arr.select(explode(col("arr")).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .where(col("df") > col("n_docs") * 0.5)
        .agg(collect_list(col("shingle")).as("hot"))
      val keepN = arr.crossJoin(broadcast(hotArr))
        .select(col("doc_id"), array_except(col("arr"), col("hot")).as("ka"))
        .select(col("doc_id"), size(col("ka")).as("n_sh"), explode(col("ka")).as("shingle"))
      val parts = 4 * spark.sparkContext.defaultParallelism
      val keyed = keepN.repartition(parts, col("shingle")).persist()
      keyed.count()
      val a = keyed.select(col("doc_id").as("doc_a"), col("shingle"), col("n_sh").as("n_a"))
      val b = keyed.select(col("doc_id").as("doc_b"), col("shingle"), col("n_sh").as("n_b"))
        .hint("merge")
      top20(a.join(b, Seq("shingle")).where(col("doc_a") < col("doc_b"))
        .repartition(parts, col("doc_a"), col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("common"), max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
        .withColumn("jaccard",
          col("common").cast("double") / (col("n_a") + col("n_b") - col("common"))))
    }

    val rc = buildC().collect().map(_.toString).sorted.toSeq
    spark.catalog.clearCache()
    val rd = buildD().collect().map(_.toString).sorted.toSeq
    spark.catalog.clearCache()
    require(rc == rd, s"arms disagree:\nC=$rc\nD=$rd")
    println("== arms agree on top-20 (first C run above doubles as warmup)")

    val (cs, ds) = (scala.collection.mutable.Buffer[Double](),
      scala.collection.mutable.Buffer[Double]())
    (1 to reps).foreach { _ =>
      var t0 = System.nanoTime()
      buildC().count()
      cs += (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      buildD().count()
      ds += (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
    }
    println(f"== C(shipped, exchange x2):   best ${cs.min}%.2fs of ${cs.map(t => f"$t%.2f").mkString(",")}")
    println(f"== D(keyed persist, x1):      best ${ds.min}%.2fs of ${ds.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}

/** r17 CPU-vs-wall decomposition for the q116/q49 idle-window elevation
  * (VERDICT r16 ask 2): registers a stage-metrics listener and reports,
  * per execution of each named query, the summed executor run/CPU time
  * and task count next to the wall reading — distinguishing "tasks burn
  * more CPU" (bigger work or slower silicon) from "tasks wait" (I/O,
  * scheduler, co-tenant). Usage:
  * Test/runMain graft.tools.R17Probe3 <sfDir> <query...>
  */
object R17Probe3 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val runMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          runMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
          cpuNs.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
          gcMs.addAndGet(sc.stageInfo.taskMetrics.jvmGCTime)
          tasks.addAndGet(sc.stageInfo.numTasks)
        }
      })

    args.drop(1).foreach { name =>
      val fn = (graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly)(name)
      fn(spark, dir).count() // warmup
      spark.catalog.clearCache()
      System.gc()
      (1 to 3).foreach { i =>
        Thread.sleep(300) // let straggler stage-completed events drain
        runMs.set(0); cpuNs.set(0); tasks.set(0); gcMs.set(0)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener bus drain (private API in Spark 4)
        println(f"== $name run$i: wall $wall%.3fs run ${runMs.get / 1e3}%.2fs " +
          f"cpu ${cpuNs.get / 1e9}%.2fs gc ${gcMs.get / 1e3}%.2fs tasks ${tasks.get}")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}

/** r17 q105 decomposition at the 100× corpus: times the q55 pair miner
  * alone, then the full q105 (source attach + matrix aggregate) in the
  * same JVM, and prints q105's executed plan — attributing the measured
  * attach cost and showing the executed join choices at corpus scale
  * (the fixture-scale guard can't see a size-based broadcast→SMJ flip).
  * Usage: Test/runMain graft.tools.R17Probe4 <docsDir>
  */
object R17Probe4 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    var t0 = System.nanoTime()
    val nPairs = graft.operators.TextOps.qSimhashNearDupPairs(spark, dir).count()
    println(f"== q55_pairs_alone: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$nPairs")
    spark.catalog.clearCache()

    t0 = System.nanoTime()
    val df = graft.SparkEntry.queries("q105_dup_source_matrix")(spark, dir)
    val n = graft.Bench.force(df) // executes df's OWN plan -> AQE-final dump below
    println(f"== q105_full: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("HashAggregate"))
      .map(_.take(160)).mkString("\n"))
    spark.stop()
  }
}

/** r17 corpus-scale plan audit: runs each named query on the given corpus
  * to an AQE-final executed plan, then walks the tree and REPORTS every
  * ShuffledHashJoin/SortMergeJoin whose unbroadcast subtree contains a
  * multi-key aggregate — the q49/q105/q143 cliff signature, checked at a
  * scale where size-based broadcasts have actually flipped (the fixture
  * guards cannot see that). Report-only: a hit on a bounded aggregate
  * (e.g. a (source_x, source_y) rollup) is fine and is adjudicated by
  * eye; the tool's job is that no site goes UNSEEN.
  * Usage: Test/runMain graft.tools.R17Probe5 <corpusDir> <query...>
  */
object R17Probe5 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

    def kids(pl: SparkPlan): Seq[SparkPlan] = pl match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: InMemoryTableScanExec => Seq(s.relation.cachedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case _                        => pl.children
    }

    args.drop(1).foreach { name =>
      val fn = (graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly)(name)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val cnt = graft.Bench.force(df) // full materialization AND AQE-final walk
      val secs = (System.nanoTime() - t0) / 1e9
      val hits = scala.collection.mutable.Buffer[String]()
      def walk(pl: SparkPlan, joinsAbove: List[SparkPlan]): Unit = {
        pl match {
          case a: BaseAggregateExec
              if a.groupingExpressions.size >= 2 && joinsAbove.nonEmpty =>
            hits += s"${joinsAbove.head.nodeName} above agg[${
              a.groupingExpressions.map(_.name).mkString(",")}]"
          case _ =>
        }
        val ja = pl match {
          case _: BroadcastExchangeLike => Nil
          case j @ (_: ShuffledHashJoinExec | _: SortMergeJoinExec) => j :: joinsAbove
          case _ => joinsAbove
        }
        kids(pl).foreach(walk(_, ja))
      }
      walk(df.queryExecution.executedPlan, Nil)
      val verdict = if (hits.isEmpty) "CLEAN" else hits.distinct.mkString("; ")
      println(f"== $name: $secs%.2fs rows=$cnt audit=$verdict")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

/** r17 measurement-honesty check: prints the executed plan OF THE COUNT
  * for a named query — Bench/Probe100x force materialization via
  * count(), and for row-per-input queries Catalyst may prune work (an
  * unused window, a projection-only transform) below the count,
  * under-billing the Spark side vs a fetch-all oracle.
  * Usage: Test/runMain graft.tools.R17Probe6 <sfDir> <query...>
  */
object R17Probe6 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Session.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    args.drop(1).foreach { name =>
      val fn = (graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly)(name)
      // the exact dataflow Bench times: Dataset.count()
      val counted = fn(spark, dir).groupBy().count()
      counted.collect()
      val p = counted.queryExecution.executedPlan.toString
      val hasWindow = p.contains("Window")
      val hasJoin = p.contains("Join")
      println(s"== $name count-plan: window=$hasWindow join=$hasJoin")
      println(p.linesIterator.take(25).map(_.take(120)).mkString("\n"))
    }
    spark.stop()
  }
}

/** Same-JVM A/B for the q139 vocabulary-broadcast fix: OLD = the pre-r17
  * spelling (broadcast the vocabulary-sized unigram table onto the 20-row
  * top frame — the q49 cliff class in broadcast form), NEW = the library's
  * bounded-side pivot (≤40-token semi-join; the vocab streams). Interleaved
  * A,B,A,B with cache clears; intended for /tmp/sf01x100i where the
  * independent construction grows the vocabulary ~100×.
  * Usage: Test/runMain graft.tools.R17Probe7 <sfDir> [reps]
  */
object R17Probe7 {
  import org.apache.spark.sql.functions._
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def oldQ139(): org.apache.spark.sql.DataFrame = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val uni = docs.select(explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val bg = docs
        .select(explode(call_function("word_shingles",
          trim(regexp_replace(col("text"), " +", " ")), lit(2), lit(false))).as("bg"))
        .select(substring_index(col("bg"), " ", 1).as("a"),
          substring_index(col("bg"), " ", -1).as("b"))
      val bgCounts = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
        .persist()
      val nBi = bgCounts.agg(sum(col("c_ab")).as("n_bi"))
      val top = bgCounts
        .orderBy(col("c_ab").desc, col("a").asc, col("b").asc)
        .limit(20)
      top
        .join(broadcast(uni.select(col("w").as("a"), col("cw").as("c_a"))), Seq("a"))
        .join(broadcast(uni.select(col("w").as("b"), col("cw").as("c_b"))), Seq("b"))
        .crossJoin(broadcast(nBi))
        .select(col("a"), col("b"), col("c_ab"),
          round(log(col("n_bi").cast("double") * col("c_ab").cast("double")
            / (col("c_a").cast("double") * col("c_b").cast("double"))), 6).as("pmi"))
    }

    def run(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val cnt = graft.Bench.force(mk())
      println(f"== q139[$tag]: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cnt")
      spark.catalog.clearCache()
    }
    (1 to reps).foreach { _ =>
      run("old-bcast-vocab", () => oldQ139())
      run("new-semi-pivot",
        () => graft.SparkEntry.queries("q139_bigram_pmi")(spark, dir))
    }
    spark.stop()
  }
}

/** r17 q01 decomposition at the 100× temporal corpus: attributes the
  * scan-dominated aggregate's wall between (A) the bare vectorized
  * parquet scan of the four referenced lineitem columns forced through
  * row materialization, (B) the same groupBy with plain DOUBLE sums,
  * and (C) the shipped q01 (decimal-exact dsum). B−A is the hash-agg
  * tax, C−B the determinism (decimal) tax — the attribution behind the
  * "constant-factor scan tax" claim in BASELINE r17.
  * Usage: Test/runMain graft.tools.R17Probe8 <temporalDir> [reps]
  */
object R17Probe8 {
  import org.apache.spark.sql.functions._
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cols = Seq("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount").map(col)
    def scanOnly() = spark.read.parquet(s"$dir/lineitem.parquet").select(cols: _*)
    def doubleAgg() = scanOnly()
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("n_rows"), max(col("l_quantity")).as("max_qty"))
    def full() = graft.SparkEntry.queries("q01_agg_multikey")(spark, dir)
    // D bills the per-row double→decimal cast with a DOUBLE sum buffer;
    // E bills cast + unscaled-long extraction with a LONG sum buffer —
    // together they attribute C−B between the cast and the decimal
    // aggregation buffer.
    import org.apache.spark.sql.types.DecimalType
    def castOnly() = scanOnly()
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 6)).cast("double")).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 6)).cast("double")).as("sum_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 6)).cast("double")).as("sum_disc_price"),
        count(lit(1)).as("n_rows"), max(col("l_quantity")).as("max_qty"))
    def unscaledLong() = scanOnly()
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum((col("l_quantity").cast(DecimalType(18, 6)) * lit(1000000L)).cast("long")).as("sum_qty"),
        sum((col("l_extendedprice").cast(DecimalType(18, 6)) * lit(1000000L)).cast("long")).as("sum_price"),
        sum(((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 6)) * lit(1000000L)).cast("long")).as("sum_disc_price"),
        count(lit(1)).as("n_rows"), max(col("l_quantity")).as("max_qty"))
    def run(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val cnt = graft.Bench.force(mk())
      println(f"== q01dec[$tag]: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cnt")
      spark.catalog.clearCache()
    }
    (1 to reps).foreach { _ =>
      run("A-scan", () => scanOnly())
      run("B-double-agg", () => doubleAgg())
      run("C-full-decimal", () => full())
      run("D-cast-double-sum", () => castOnly())
      run("E-cast-long-sum", () => unscaledLong())
    }
    spark.stop()
  }
}

/** r17b q143 stage attribution on a scale corpus: times (a) the exploded
  * shingle persist, (b) the signature aggregate WITHOUT the r17b shingle
  * array (codegen HashAggregate), (c) WITH it (collect_list forces
  * ObjectHashAggregate), (d) the banded candidate self-join, (e) the full
  * query — locating the rewrite's regression before shaving it.
  * Usage: Test/runMain graft.tools.R17Probe9 <docsDir>
  */
object R17Probe9 {
  import org.apache.spark.sql.functions._
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"== q143dec[$tag]: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = docs.select(col("doc_id"),
      explode(call_function("word_shingles", col("text"), lit(3), lit(true))).as("shingle"))
      .persist()
    time("a-shingles-fill") { sh.count() }
    val mins = (0 until 32).map(i =>
      min(md5(concat_ws(":", lit(i), col("shingle")).cast("binary"))).as(s"m$i"))
    time("b-sig-no-arr") {
      graft.Bench.force(sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*))
    }
    time("c-sig-with-arr") {
      graft.Bench.force(sh.groupBy(col("doc_id"))
        .agg(mins.head, (mins.tail :+ collect_list(col("shingle")).as("arr")): _*))
    }
    val sig = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val bands = (0 until 8).map { b =>
      md5(concat_ws("|", (b * 4 until b * 4 + 4).map(i => col(s"m$i")): _*).cast("binary"))
        .as(s"band$b")
    }
    val sigB = sig.select(col("doc_id") +: ((0 until 32).map(i => col(s"m$i")) ++ bands): _*).persist()
    time("d-sigB-fill") { sigB.count() }
    val banded = sigB.select(col("doc_id"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("b"), col(s"band$b").as("k"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.b"), col("bk.k"))
    time("e-cand") {
      banded.as("x").join(banded.as("y").hint("shuffle_hash"),
          col("x.b") === col("y.b") && col("x.k") === col("y.k") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct().count()
    }
    spark.catalog.clearCache()
    time("f-full-query") {
      graft.Bench.force(graft.SparkEntry.queries("q143_minhash_error_audit")(spark, dir))
    }
    spark.stop()
  }
}
