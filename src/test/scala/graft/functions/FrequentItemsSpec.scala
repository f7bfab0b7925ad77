package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Misra-Gries aggregate's contract: the n/(k+1) survival guarantee
  * holds under eviction pressure (vocab ≫ k) at any partitioning, state
  * round-trips through serde, and the two-pass heavy-hitters query is
  * EXACT despite the approximate intermediate. Exact counter values are
  * intentionally not pinned — they vary with merge order inside the
  * guarantee; the guarantee is the spec.
  */
class FrequentItemsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Zipf-ish skew over a 10k-item domain with k=32 — far past eviction:
    * item i (1-based) appears ~N/i times for the head, tail items once.
    */
  private def skewed(parts: Int) = {
    import spark.implicits._
    // head: item h repeated (1000 / h) times, h in 1..50; tail: 10k singletons
    val head = (1 to 50).flatMap(h => Seq.fill(1000 / h)(s"head_$h"))
    val tail = (1 to 10000).map(i => f"tail_$i%05d")
    (head ++ tail).toDF("item").repartition(parts)
  }

  test("every item above n/(k+1) survives, at several partitionings") {
    GraftFunctions.register(spark)
    val truth = skewed(4).groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val k = 32
    Seq(1, 8, 37).foreach { parts =>
      val sk = skewed(parts).agg(expr(s"mg_freq(item, $k)").as("sk"))
        .select(expr("transform(sk, x -> x.item)").as("items"))
        .head().getSeq[String](0).toSet
      assert(sk.size <= k, s"sketch holds ${sk.size} > k=$k at parts=$parts")
      val mustSurvive = truth.filter { case (_, c) => c > n / (k + 1) }.keySet
      val lost = mustSurvive -- sk
      assert(lost.isEmpty,
        s"guarantee violated at parts=$parts: lost $lost (floor ${n / (k + 1)})")
    }
  }

  test("estimates undercount by at most n/(k+1)") {
    GraftFunctions.register(spark)
    val truth = skewed(4).groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val k = 32
    val ests = skewed(8).agg(expr(s"mg_freq(item, $k)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    ests.foreach { case (item, est) =>
      val c = truth(item)
      assert(est <= c, s"$item overcounts: est=$est > true=$c")
      assert(c - est <= n / (k + 1),
        s"$item undercounts past the bound: est=$est true=$c floor=${n / (k + 1)}")
    }
  }

  test("sketch serde round-trips") {
    val s = new MgSketch(4)
    Seq("a", "a", "b", "c", "d", "e", "a").foreach(s.update)
    val back = MgSketch.deserialize(s.serialize())
    assert(back.k === s.k)
    assert(back.count === s.count)
    assert(back.topItems.toSeq === s.topItems.toSeq)
  }

  test("sketch serde survives a >64KB item (writeUTF would throw)") {
    val s = new MgSketch(4)
    val huge = "x" * 100000 + "é" // non-ASCII tail: length != byte length
    Seq(huge, huge, "b").foreach(s.update)
    val back = MgSketch.deserialize(s.serialize())
    assert(back.topItems.toSeq === s.topItems.toSeq)
  }

  test("merge preserves the guarantee across disjoint halves") {
    val k = 4
    val left = new MgSketch(k)
    val right = new MgSketch(k)
    // 'x' dominates both halves; fillers force evictions
    (1 to 100).foreach(_ => left.update("x"))
    (1 to 30).foreach(i => left.update(s"l$i"))
    (1 to 100).foreach(_ => right.update("x"))
    (1 to 30).foreach(i => right.update(s"r$i"))
    left.merge(right)
    val items = left.topItems.map(_._1).toSet
    assert(left.topItems.length <= k)
    assert(items.contains("x"), "dominant item evicted by merge")
    val estX = left.topItems.find(_._1 == "x").get._2
    assert(estX <= 200 && 200 - estX <= left.count / (k + 1))
  }

  test("property: guarantee holds for random streams and random split points") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      k <- Gen.choose(2, 8)
      items <- Gen.listOfN(400, Gen.frequency(
        (5, Gen.const("hot")),
        (2, Gen.oneOf("w1", "w2", "w3")),
        (3, Gen.choose(0, 200).map(i => s"cold_$i"))))
      cut <- Gen.choose(0, items.length)
    } yield (k, items, cut)
    (1 to 200).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { case (k, items, cut) =>
        val (l, r) = items.splitAt(cut)
        val left = new MgSketch(k)
        val right = new MgSketch(k)
        l.foreach(left.update)
        r.foreach(right.update)
        left.merge(right)
        val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = items.length.toLong
        val floor = n / (k + 1)
        val ests = left.topItems.toMap
        assert(left.topItems.length <= k)
        truth.foreach { case (it, c) =>
          if (c > floor) assert(ests.contains(it), s"seed=$i k=$k lost $it (c=$c floor=$floor)")
        }
        ests.foreach { case (it, est) =>
          val c = truth(it)
          assert(est <= c && c - est <= floor, s"seed=$i k=$k $it est=$est true=$c")
        }
      }
    }
  }

  test("mg_freq aggregates under Structured Streaming, exact when vocab <= k") {
    GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"
    val batchDf = spark.read.parquet(s"$dir/documents.parquet")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_mg_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.Paths.get(s"$streamDir/documents.parquet"))
    val stream = spark.readStream.schema(batchDf.schema).parquet(streamDir)
    def toksOf(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(split(col("text"), " ")).as("token")).where(col("token") =!= "")
    val q = toksOf(stream).agg(expr("mg_freq(token, 64)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("mg_stream").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // 31-token vocab <= k=64: no eviction ever fires, so the sketch holds
    // the EXACT count of every token — streaming must equal batch truth
    val truth = toksOf(batchDf).groupBy("token").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == truth)
  }

  test("GraftExtensions injects every graft function for spark.sql.extensions users") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // register into a throwaway registry and check the full function
    // surface landed (the declarative-install path must not lag the
    // programmatic GraftFunctions.register one)
    assert(org.apache.spark.sql.GraftExtensionsTestAccess.functionNames(ext) ==
      Set("cosine_similarity", "token_term_counts", "word_shingles",
        "kll_quantiles", "mg_freq", "mg_freq_text", "array_sum_long",
        "bloom_agg", "bloom_might_contain"))
  }

  test("invalid k fails at analysis, not execution") {
    import org.apache.spark.sql.AnalysisException
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("a", "b").toDF("item")
    def analyze(kSpelling: String): Unit =
      df.agg(expr(s"mg_freq(item, $kSpelling)")).queryExecution.analyzed

    val nonFoldable = intercept[AnalysisException](analyze("length(item)"))
    assert(nonFoldable.getMessage.contains("literal"))
    val nullK = intercept[AnalysisException](analyze("CAST(NULL AS INT)"))
    assert(nullK.getMessage.contains("NULL"))
    val zeroK = intercept[AnalysisException](analyze("0"))
    assert(zeroK.getMessage.contains(">= 1"))
    val badType = intercept[AnalysisException](analyze("'four'"))
    assert(badType.getMessage.contains("STRING"))
  }

  test("q103 certifies a near-uniform corpus exactly when its vocab fits the capacity") {
    import spark.implicits._
    // near-uniform corpus: 5000 distinct tokens, each twice. Under the
    // r13 k=64 sketch the n/(k+1) floor broke and the plan had to
    // refuse; with the r14 capacity (1<<16) no eviction ever fires, so
    // err == 0 certifies every count exact and the query returns the
    // true top-20 (all cnt 2, ties by token ASC) from a SINGLE
    // certified sketch pass — one scan, no recount, no explode of the
    // token stream.
    val dir = java.nio.file.Files.createTempDirectory("graft_q103_flat").toString
    (1 to 5000).map(i => (i.toLong, s"tok_$i tok_$i"))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.qHeavyHitters(spark, dir)
    val rows = got.collect().map(r => (r.getString(0), r.getLong(1)))
    val want = (1 to 5000).map(i => s"tok_$i").sorted.take(20).map((_, 2L))
    assert(rows.toSeq === want)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("token_term_counts"),
      "certified path must not carry the recount scan")
    assert(plan.contains("mg_freq_text"), "the sketch is the whole plan")
    // AQE prints the initial plan after the final one — count scans in
    // the final (executed) section only
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(finalPlan).size === 1,
      s"certified path must scan the corpus exactly once:\n$finalPlan")
  }

  test("q103's embedded margin check raises when the vocab overflows the capacity") {
    import spark.implicits._
    // 70_000 distinct near-uniform tokens (each once) overflow the 1<<16
    // capacity — err > 0 voids the certificate — plus one common token
    // so the compacted sketch keeps non-empty candidates and the PASS-2
    // bound guard is what fires: counts at/below the non-candidate bound
    // can't prove the top-20 exact, so the plan must refuse rather than
    // return a silently-maybe-wrong answer
    val dir = java.nio.file.Files.createTempDirectory("graft_q103_huge").toString
    (1 to 70).map { d =>
      val t0 = (d - 1) * 1000
      (d.toLong,
        (Seq.fill(30)("common_tok") ++ (1 to 1000).map(i => s"tok_${t0 + i}"))
          .mkString(" "))
    }.toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[Exception] {
      graft.operators.TextOps.qHeavyHitters(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("q103 MG safety margin violated")),
      s"wrong failure: $e")
  }

  test("qHeavyHittersTwoPass stays exact where the single-pass certificate overflows") {
    import spark.implicits._
    // 70_000 distinct singletons overflow the 1<<16 capacity (so the
    // certified single pass refuses), but 25 genuinely common tokens
    // clear the two-pass candidate bound by miles — the eager
    // sketch-then-recount fallback must return their exact top-20 where
    // qHeavyHitters raises. This is the 100 TB huge-key-domain shape.
    val dir = java.nio.file.Files.createTempDirectory("graft_q103_2p").toString
    val commons = (0 until 25).map(i => f"common_$i%02d")
    (1 to 70).map { d =>
      val t0 = (d - 1) * 1000
      (d.toLong,
        (commons.flatMap(Seq.fill(30)(_)) ++ (1 to 1000).map(i => s"tok_${t0 + i}"))
          .mkString(" "))
    }.toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[Exception] {
      graft.operators.TextOps.qHeavyHitters(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("q103 MG safety margin violated")),
      s"wrong failure: $e")
    val got = graft.operators.TextOps.qHeavyHittersTwoPass(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === commons.sorted.take(20).map((_, 70L * 30)))
  }

  test("mg_freq_text matches the exploded mg_freq spelling bit-for-bit") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // single partition so both spellings absorb the identical token
    // stream in the identical order — MG results are then deterministic
    // and must agree exactly (same sketch, different feed path)
    val docs = Seq(
      "the quick brown fox  the lazy dog", // double space → empty token to skip
      " leading and trailing ",
      "", // empty text
      "unicode tokens ünïcødé ünïcødé 日本語",
      (1 to 200).map(i => s"tok_${i % 17}").mkString(" "))
      .toDF("text").coalesce(1)
    val viaText = docs.agg(expr("mg_freq_text(text, 8)").as("r"))
      .select(col("r.n"), expr("transform(r.items, x -> struct(x.item, x.est))"))
      .head()
    val exploded = docs.select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
    val nTrue = exploded.count()
    val skExplode = exploded.agg(expr("mg_freq(token, 8)").as("sk"))
      .select(expr("transform(sk, x -> struct(x.item, x.est))")).head().getSeq[Any](0)
    assert(viaText.getLong(0) === nTrue, "n must be the exact non-empty token count")
    assert(viaText.getSeq[Any](1) === skExplode,
      "items/estimates must match the exploded spelling")
  }

  test("array_sum_long serde keeps empty-width state distinct from no-rows state") {
    // a partial aggregate that saw only EMPTY arrays must round-trip to
    // [] — not collapse to the no-rows NULL state — across the
    // serialization boundary partial aggregation introduces
    val agg = ArraySumLong(org.apache.spark.sql.catalyst.expressions.Literal(null))
    val seen = agg.deserialize(agg.serialize(new ArraySumLong.Buf(Array.empty[Long])))
    assert(seen.sums != null && seen.sums.isEmpty)
    val none = agg.deserialize(agg.serialize(new ArraySumLong.Buf(null)))
    assert(none.sums == null)
    val wide = agg.deserialize(agg.serialize(new ArraySumLong.Buf(Array(7L, -2L))))
    assert(wide.sums.toSeq == Seq(7L, -2L))
  }

  test("array_sum_long: element-wise sums, null rows skipped, width guard") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1, Some(Seq(1L, 2L, 3L))),
      (1, Some(Seq(10L, 20L, 30L))),
      (1, None),
      (2, None)).toDF("g", "a")
    val got = df.groupBy("g").agg(expr("array_sum_long(a)").as("s"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[Long](1))).toMap
    assert(got(1) === Some(Seq(11L, 22L, 33L)))
    assert(got(2) === None, "all-null group must yield NULL, like SUM")
    val bad = Seq(Seq(1L, 2L), Seq(1L)).toDF("a")
    val e = intercept[Exception] {
      bad.agg(expr("array_sum_long(a)")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("width")), s"wrong failure: $e")
  }

  test("two-pass heavy hitters is exact under eviction pressure") {
    GraftFunctions.register(spark)
    // same shape as q103 over the 10k-item skewed domain. k must honor the
    // guarantee for the whole top-10: the 10th count is 100, so the floor
    // n/(k+1) must sit below it — k=256 gives ~56. (k=32's floor ~439
    // would NOT cover it; exactness is conditional on k, by design.)
    val toksDf = skewed(16).withColumnRenamed("item", "token")
    val cands = toksDf.agg(expr("mg_freq(token, 256)").as("sk"))
      .select(explode(expr("transform(sk, x -> x.item)")).as("token"))
    val got = toksDf.join(broadcast(cands), Seq("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(10).collect().map(r => (r.getString(0), r.getLong(1)))
    val want = toksDf.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(10).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === want.toSeq)
  }
}
