package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Session, Tables}

/** Dev-only r12 experiment bench: candidate re-spellings of q147
  * (token PageRank) and q169 (basket lift) vs the shipping versions.
  * Not part of the engine surface.
  */
object R12Probe {
  private val Damping = 0.85

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** q147 candidate B: out-weight normalization fused into the edge build
    * via a src-partitioned window (no outW aggregate + join), iterations
    * carried on the in-weight frame alone (the all-nodes rank frame is
    * reconstituted ONCE at the end instead of once per round).
    */
  def pagerankB(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    val e = t(s, dir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(expr(
        "filter(transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] as src, toks[i + 1] as dst)), " +
          "p -> p.src <> '' AND p.dst <> '')").as("pairs"))
      .select(explode(col("pairs")).as("p"))
      .select(col("p.src"), col("p.dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
      .select(col("src"), col("dst"),
        (col("c").cast("double") / sum(col("c")).over(w)).as("frac"))
      .persist()
    e.count()
    val nodes = e.select(col("src").as("token"))
      .union(e.select(col("dst").as("token"))).distinct().persist()
    val nv = nodes.agg(count(lit(1)).as("v"))
    var inw: DataFrame = null
    for (i <- 1 to 3) {
      val base = e.crossJoin(broadcast(nv))
      val withPr =
        if (i == 1) base.withColumn("pr_src", lit(1.0) / col("v"))
        else base.join(inw.withColumnRenamed("token", "src_tok"),
            col("src") === col("src_tok"), "left")
          .withColumn("pr_src",
            (lit(1.0) - lit(Damping)) / col("v") +
              lit(Damping) * coalesce(col("in_w"), lit(0.0)))
      inw = withPr
        .select(col("dst").as("token"),
          (col("pr_src") * col("frac")).cast(DecimalType(18, 9)).as("cw"))
        .groupBy(col("token"))
        .agg(sum(col("cw")).cast("double").as("in_w"))
    }
    nodes.crossJoin(broadcast(nv)).join(inw, Seq("token"), "left")
      .select(col("token"),
        round((lit(1.0) - lit(Damping)) / col("v") +
          lit(Damping) * coalesce(col("in_w"), lit(0.0)), 9).as("pagerank"))
      .orderBy(col("pagerank").desc, col("token").asc)
      .limit(20)
  }

  /** q147 candidate C: B minus the nodes persist — nodes appears once in
    * the final reconstitution and once (as the nv count subplan) in the
    * iteration broadcasts; identical distinct exchanges dedupe via
    * ReuseExchange / the AQE stage cache instead of a cache fill.
    */
  def pagerankC(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    val e = t(s, dir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(expr(
        "filter(transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] as src, toks[i + 1] as dst)), " +
          "p -> p.src <> '' AND p.dst <> '')").as("pairs"))
      .select(explode(col("pairs")).as("p"))
      .select(col("p.src"), col("p.dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
      .select(col("src"), col("dst"),
        (col("c").cast("double") / sum(col("c")).over(w)).as("frac"))
      .persist()
    e.count()
    val nodes = e.select(col("src").as("token"))
      .union(e.select(col("dst").as("token"))).distinct()
    val nv = nodes.agg(count(lit(1)).as("v"))
    var inw: DataFrame = null
    for (i <- 1 to 3) {
      val base = e.crossJoin(broadcast(nv))
      val withPr =
        if (i == 1) base.withColumn("pr_src", lit(1.0) / col("v"))
        else base.join(inw.withColumnRenamed("token", "src_tok"),
            col("src") === col("src_tok"), "left")
          .withColumn("pr_src",
            (lit(1.0) - lit(Damping)) / col("v") +
              lit(Damping) * coalesce(col("in_w"), lit(0.0)))
      inw = withPr
        .select(col("dst").as("token"),
          (col("pr_src") * col("frac")).cast(DecimalType(18, 9)).as("cw"))
        .groupBy(col("token"))
        .agg(sum(col("cw")).cast("double").as("in_w"))
    }
    nodes.crossJoin(broadcast(nv)).join(inw, Seq("token"), "left")
      .select(col("token"),
        round((lit(1.0) - lit(Damping)) / col("v") +
          lit(Damping) * coalesce(col("in_w"), lit(0.0)), 9).as("pagerank"))
      .orderBy(col("pagerank").desc, col("token").asc)
      .limit(20)
  }

  /** q147 candidate D: B plus (a) the edge cache REPARTITIONED BY dst so
    * every iteration's groupBy(dst) is partition-local (zero shuffles in
    * the whole 3-round chain — stage boundaries are only the 3 rank-frame
    * broadcast builds), and (b) |V| attached as a column of BOTH caches at
    * build time, so no per-run nodes-distinct / count stages survive in
    * the timed path.
    */
  def pagerankD(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    val edges0 = t(s, dir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(expr(
        "filter(transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] as src, toks[i + 1] as dst)), " +
          "p -> p.src <> '' AND p.dst <> '')").as("pairs"))
      .select(explode(col("pairs")).as("p"))
      .select(col("p.src"), col("p.dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
      .select(col("src"), col("dst"),
        (col("c").cast("double") / sum(col("c")).over(w)).as("frac"))
    val nodes0 = edges0.select(col("src").as("token"))
      .union(edges0.select(col("dst").as("token"))).distinct()
    val nv = nodes0.agg(count(lit(1)).as("v"))
    val nodes = nodes0.crossJoin(broadcast(nv)).persist()
    val e = edges0.crossJoin(broadcast(nv))
      .repartition(col("dst")).persist()
    e.count(); nodes.count()
    var inw: DataFrame = null
    for (i <- 1 to 3) {
      val withPr =
        if (i == 1) e.withColumn("pr_src", lit(1.0) / col("v"))
        else e.join(inw.withColumnRenamed("token", "src_tok"),
            col("src") === col("src_tok"), "left")
          .withColumn("pr_src",
            (lit(1.0) - lit(Damping)) / col("v") +
              lit(Damping) * coalesce(col("in_w"), lit(0.0)))
      inw = withPr
        .select(col("dst").as("token"),
          (col("pr_src") * col("frac")).cast(DecimalType(18, 9)).as("cw"))
        .groupBy(col("token"))
        .agg(sum(col("cw")).cast("double").as("in_w"))
    }
    nodes.join(inw, Seq("token"), "left")
      .select(col("token"),
        round((lit(1.0) - lit(Damping)) / col("v") +
          lit(Damping) * coalesce(col("in_w"), lit(0.0)), 9).as("pagerank"))
      .orderBy(col("pagerank").desc, col("token").asc)
      .limit(20)
  }

  /** q169 candidate P: the pair key packed into one BIGINT
    * (a << 32 | b — partkeys fit 32 bits up to ~SF1000) so the big
    * exchange moves 8-byte longs instead of 2-field structs and the
    * aggregate hashes a primitive key.
    */
  def basketP(s: SparkSession, dir: String): DataFrame = {
    val baskets = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
      .persist()
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val marg = baskets.select(explode(col("ps")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_p"))
    val top = baskets
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), " +
          "y -> shiftleft(cast(x as bigint), 32) + y)))")).as("pk"))
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("n_ab"))
      .select(shiftright(col("pk"), 32).as("part_a"),
        (col("pk").bitwiseAND(lit(0xffffffffL))).as("part_b"), col("n_ab"))
      .orderBy(col("n_ab").desc, col("part_a").asc, col("part_b").asc)
      .limit(20)
    val withA = marg.select(col("l_partkey").as("part_a"), col("n_p").as("n_a"))
      .join(broadcast(top), Seq("part_a"))
    marg.select(col("l_partkey").as("part_b"), col("n_p").as("n_b"))
      .join(broadcast(withA), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        round((col("n_ab") * col("n_orders")).cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
  }

  /** q169 candidate B: identical plan to the shipping version plus a
    * materialization barrier on the basket cache, so the three AQE leaf
    * stages (nOrders, marginals, pair aggregate) scan a FILLED
    * InMemoryRelation instead of racing to compute it 3x.
    */
  def basketB(s: SparkSession, dir: String): DataFrame = {
    val baskets = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
      .persist()
    baskets.count()
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val marg = baskets.select(explode(col("ps")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_p"))
    val top = baskets
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"))
        .as("p"))
      .groupBy(col("p.a").as("part_a"), col("p.b").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .orderBy(col("n_ab").desc, col("part_a").asc, col("part_b").asc)
      .limit(20)
    val withA = marg.select(col("l_partkey").as("part_a"), col("n_p").as("n_a"))
      .join(broadcast(top), Seq("part_a"))
    marg.select(col("l_partkey").as("part_b"), col("n_p").as("n_b"))
      .join(broadcast(withA), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        round((col("n_ab") * col("n_orders")).cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
  }

  /** q169 candidate F: marginals filtered BELOW the aggregate. Only the
    * ≤40 parts that appear in the top-20 pairs ever need `n_p`, so
    * instead of aggregating the FULL |parts|-sized marginal table twice
    * (two explode+shuffle+agg passes over every basket), the exploded
    * parts are semi-joined against the broadcast 40-part list first and
    * the aggregate runs over the survivors (a ~40-group exchange).
    * `top` gains 3 consumers here (part list + final join) so it is
    * persisted — 20 rows; the heavy pair aggregate runs once per
    * execution instead of three times. At 100 TB the win is the same:
    * marginal counting touches only surviving keys, not the full part
    * domain.
    */
  def basketF(s: SparkSession, dir: String): DataFrame = {
    val baskets = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
      .persist()
    val top = baskets
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"))
        .as("p"))
      .groupBy(col("p.a").as("part_a"), col("p.b").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .orderBy(col("n_ab").desc, col("part_a").asc, col("part_b").asc)
      .limit(20)
      .persist()
    val parts = top
      .select(explode(array(col("part_a"), col("part_b"))).as("l_partkey"))
      .distinct()
    val counts = baskets.select(explode(col("ps")).as("l_partkey"))
      .join(broadcast(parts), Seq("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_p"))
      .persist()
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    top
      .join(broadcast(counts.select(col("l_partkey").as("part_a"), col("n_p").as("n_a"))),
        Seq("part_a"))
      .join(broadcast(counts.select(col("l_partkey").as("part_b"), col("n_p").as("n_b"))),
        Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        round((col("n_ab") * col("n_orders")).cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Same convention as graft.Bench: one untimed warmup (fills the
    // query-local persist()s — CacheManager plan-matching makes the timed
    // reruns reuse them), best-of-N timed, clearCache after.
    def time(label: String)(f: (SparkSession, String) => DataFrame): Unit = {
      f(spark, dir).count(); System.gc()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      println(f"R12 $label: best ${ts.min}%.3f med ${ts.sorted.apply(2)}%.3f of ${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    time("q147_ship")(graft.operators.Retrieval.qTokenPagerank)
    time("q147_B")(pagerankB)
    time("q147_C")(pagerankC)
    time("q147_D")(pagerankD)
    time("q169_ship")(graft.operators.Relational.qBasketLift)
    time("q169_P")(basketP)
    time("q169_F")(basketF)
    // AQE-off runs: quantifies the per-stage adaptive re-plan round-trip
    // share of the steady-state time (floor accounting, not a candidate).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("q147_C_noaqe")(pagerankC)
    time("q169_P_noaqe")(basketP)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // cross-check candidate outputs vs shipping outputs (exact)
    def same(a: DataFrame, b: DataFrame): Boolean = {
      val ac = a.collect().map(_.toString).sorted
      val bc = b.collect().map(_.toString).sorted
      ac.sameElements(bc)
    }
    println("R12 q147_B parity: " + same(
      graft.operators.Retrieval.qTokenPagerank(spark, dir), pagerankB(spark, dir)))
    spark.catalog.clearCache()
    println("R12 q147_C parity: " + same(
      graft.operators.Retrieval.qTokenPagerank(spark, dir), pagerankC(spark, dir)))
    spark.catalog.clearCache()
    println("R12 q147_D parity: " + same(
      graft.operators.Retrieval.qTokenPagerank(spark, dir), pagerankD(spark, dir)))
    spark.catalog.clearCache()
    println("R12 q169_P parity: " + same(
      graft.operators.Relational.qBasketLift(spark, dir), basketP(spark, dir)))
    spark.catalog.clearCache()
    println("R12 q169_B parity: " + same(
      graft.operators.Relational.qBasketLift(spark, dir), basketB(spark, dir)))
    spark.catalog.clearCache()
    println("R12 q169_F parity: " + same(
      graft.operators.Relational.qBasketLift(spark, dir), basketF(spark, dir)))
    spark.stop()
  }
}
