package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries frequent-items summary (Misra & Gries '82;
  * mergeability per Agarwal et al., PODS'12 "Mergeable Summaries"). Holds
  * at most k counters. Insert: increment if present, add if room,
  * otherwise decrement ALL counters by one (dropping zeros) — the classic
  * step that charges the evicted insert against k surviving counts. Merge:
  * sum counterpart counters, then if over k subtract the (k+1)-th largest
  * count from every counter and drop the non-positive ones.
  *
  * Guarantee (both ops preserve it): every item with true count
  * > n/(k+1) is present, and each estimate undercounts by at most
  * n/(k+1). That makes the sketch a CANDIDATE GENERATOR: a second exact
  * pass over just the ≤k candidates turns the approximate summary into an
  * exact, deterministic top-k — the shape q103 runs, so the final answer
  * never depends on partitioning even though per-partition sketches do.
  *
  * Exactness certificate (r14): [[err]] tracks the cumulative amount any
  * single counter can have been decremented by (update's decrement-all
  * rounds add 1 each; merge compaction adds the subtracted pivot; merge
  * sums the peers' errs). `err == 0` therefore certifies that NO
  * eviction ever happened anywhere in the merge tree — every absorbed
  * item is still present and every counter is its EXACT count. Running
  * the sketch with a capacity well above the expected key cardinality
  * (see `mg_freq_text(text, k, cap)`) turns the candidate generator into
  * a single-pass exact top-k whenever the corpus vocabulary fits, with
  * the two-pass recount as the certified fallback when it doesn't — the
  * adaptivity is free because `err` is a by-product of work MG already
  * does. For a non-exact sketch, `err` is also an upper bound on the
  * true count of any item absent from the counters (it can only have
  * been evicted by decrements totalling ≤ err).
  */
final class MgSketch(val k: Int) extends Serializable {
  require(k >= 1, s"k must be >= 1, got $k")
  /** Upper bound on the undercount of any counter (0 ⇒ all exact). */
  private[functions] var err: Long = 0L
  // Keyed by UTF8String, not String (r13): the aggregate's hot path feeds
  // tokens straight from row memory, and a String key would pay a UTF-8
  // decode + char[] allocation PER TOKEN before the map probe. UTF8String
  // hashes/compares its bytes in place, and the counter is a MUTABLE cell
  // in a java.util.HashMap (get returns the cell or null — no Option, no
  // boxed Long), so the dominant path (increment of an existing counter)
  // is one probe with zero allocation; only a NEW counter entry pays a
  // copy (`clone`) to own its bytes beyond the input row's lifetime.
  private[functions] val counters =
    new java.util.HashMap[UTF8String, MgSketch.Cell]()
  private[functions] var n: Long = 0L

  /** Items absorbed (exact). */
  def count: Long = n

  def update(item: String): Unit = update(UTF8String.fromString(item))

  /** `item` may be a transient view into row/array memory: it is only
    * stored (after `clone()`) when it becomes a new counter entry — map
    * lookups and increments never retain it.
    */
  def update(item: UTF8String): Unit = {
    n += 1
    val cell = counters.get(item)
    if (cell != null) cell.v += 1
    else if (counters.size < k) counters.put(item.clone(), new MgSketch.Cell(1L))
    else {
      // decrement-all: amortized O(1) — each decrement cancels a prior
      // increment, so total decrement work <= total inserts
      err += 1
      val it = counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.v == 1L) it.remove() else e.getValue.v -= 1
      }
    }
  }

  def merge(o: MgSketch): Unit = {
    o.counters.forEach { (it, c) =>
      // keys from a deserialized/peer sketch are already owned copies
      val cell = counters.get(it)
      if (cell != null) cell.v += c.v else counters.put(it, new MgSketch.Cell(c.v))
    }
    n += o.n
    err += o.err
    if (counters.size > k) {
      val vals = new Array[Long](counters.size)
      var i = 0
      counters.forEach { (_, c) => vals(i) = c.v; i += 1 }
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - (k + 1)) // (k+1)-th largest count
      err += sub
      val it = counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.v <= sub) it.remove() else e.getValue.v -= sub
      }
    }
  }

  /** (item, estimate) pairs, (estimate DESC, item ASC) — deterministic
    * given the counter multiset. String-typed for callers/specs; the ≤k
    * conversions here are off the hot path.
    */
  def topItems: Array[(String, Long)] = {
    val out = new Array[(String, Long)](counters.size)
    var i = 0
    counters.forEach { (it, c) => out(i) = (it.toString, c.v); i += 1 }
    out.sortBy { case (it, c) => (-c, it) }
  }

  /** Upper bound on the TRUE count of any item outside the top `kOut`
    * counters: an untruncated counter's true count is ≤ est + err ≤
    * est(kOut+1) + err, and an absent item's is ≤ err. With `err == 0`
    * and no truncation this is 0 — the single-pass exactness case.
    */
  def boundBeyond(kOut: Int): Long = {
    if (counters.size <= kOut) err
    else {
      val vals = new Array[Long](counters.size)
      var i = 0
      counters.forEach { (_, c) => vals(i) = c.v; i += 1 }
      java.util.Arrays.sort(vals)
      err + vals(vals.length - (kOut + 1)) // (kOut+1)-th largest est
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeLong(n); out.writeLong(err); out.writeInt(counters.size)
    counters.forEach { (it, c) =>
      // length-prefixed UTF-8, not writeUTF: a pathological >64 KB token
      // must degrade to a big counter entry, never throw mid-aggregation.
      // (r14: the header gained the `err` long for the exactness
      // certificate — an in-flight shuffle format, never persisted.)
      val bytes = it.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c.v)
    }
    out.flush()
    bos.toByteArray
  }
}

object MgSketch {
  /** Mutable counter cell: increments mutate in place, no boxing. */
  final class Cell(var v: Long) extends Serializable

  def deserialize(bytes: Array[Byte]): MgSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MgSketch(in.readInt())
    s.n = in.readLong()
    s.err = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val bytes = new Array[Byte](in.readInt())
      in.readFully(bytes)
      s.counters.put(UTF8String.fromBytes(bytes), new Cell(in.readLong()))
      i += 1
    }
    s
  }
}

/** `mg_freq(item, k)` — distributed heavy-hitters candidates as a
  * first-class Catalyst aggregate: per-partition Misra-Gries summaries
  * build map-side (update) and combine on the reduce side (merge), so a
  * corpus-wide frequent-tokens pass shuffles O(k)-entry sketches instead
  * of one partial count per DISTINCT KEY — the difference that matters
  * when the key domain is huge (all n-grams of 100 TB of text) and a
  * hash aggregate's partial map would spill or blow the shuffle. Returns
  * array<struct<item,est>> ordered (est DESC, item ASC).
  */
case class MgFreq(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSketch] {

  // Safe by the time execution reaches it: checkInputDataTypes has already
  // rejected non-foldable, NULL, and non-positive k at analysis.
  private lazy val sketchK: Int = kExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr)
  // All k validation lives here so an invalid call fails AT ANALYSIS with
  // a clear message — not as an executor-side require inside a lazy val
  // (non-foldable k) or a confusing MgSketch require after a NULL literal
  // unboxes to 0 (the pre-round-7 behavior).
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"mg_freq expects (STRING, INT), got " +
          s"(${child.dataType.sql}, ${kExpr.dataType.sql})")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("mg_freq k must be a literal")
    else kExpr.eval() match {
      case null => TypeCheckResult.TypeCheckFailure("mg_freq k must not be NULL")
      case k: Int if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case k => TypeCheckResult.TypeCheckFailure(s"mg_freq k must be >= 1, got $k")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_freq"

  override def createAggregationBuffer(): MgSketch = new MgSketch(sketchK)

  override def update(buffer: MgSketch, input: InternalRow): MgSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: MgSketch, other: MgSketch): MgSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: MgSketch): Any =
    new GenericArrayData(buffer.topItems.map { case (it, c) =>
      InternalRow(UTF8String.fromString(it), c)
    })

  override def serialize(buffer: MgSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MgSketch =
    MgSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): MgFreq =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MgFreq =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgFreq =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** `mg_freq_text(text, k[, cap])` — the fused-tokenization spelling of
  * [[MgFreq]]: one update call per DOCUMENT that scans the text's bytes
  * in place (maximal non-space runs, the repo-wide token contract — the
  * same loop as [[TokenTermCounts]]), feeding each token to the sketch
  * as a zero-copy UTF8String view. Returns `struct<n: bigint, err:
  * bigint, bound: bigint, items: array<struct<item,est>>>`:
  *  - `n` — the EXACT non-empty token count of the absorbed stream
  *    (MgSketch counts absorbed items), so the two-pass heavy-hitters
  *    plans get their guarantee denominator from the same scan instead
  *    of a separate corpus pass;
  *  - `err` — the sketch's exactness certificate ([[MgSketch.err]]):
  *    `err == 0` proves no eviction ever fired, so every `est` in
  *    `items` is an EXACT count and no item outside the sketch was ever
  *    seen — the caller can skip its recount pass entirely;
  *  - `bound` — `boundBeyond(k)`: an upper bound on the true count of
  *    any token NOT in `items`, the certification floor for the
  *    two-pass fallback (strictly tighter than the classic n/(k+1)
  *    when cap ≫ k);
  *  - `items` — the top-`k` counters, (est DESC, item ASC).
  *
  * `cap` (optional, default `k`) is the sketch CAPACITY — the MG
  * counter budget, decoupled from the returned arity `k` (r14). Running
  * with `cap` well above the corpus vocabulary (e.g. 1<<16 for word
  * tokens — a few MB of counter state per aggregation buffer, constant
  * w.r.t. data size) makes `err == 0` the common case, turning the
  * two-pass heavy-hitters shape into a certified SINGLE pass; when the
  * vocabulary overflows `cap` the sketch degrades gracefully to the
  * classic MG candidate generator with error ≤ n/(cap+1).
  *
  * Why this exists (r13, BASELINE "MG constant factor"): the exploded
  * spelling `explode(split(text,' ')) … mg_freq(token, k)` pays a row
  * through the aggregate iterator, a String decode, and a boxed map
  * probe PER TOKEN — measured as the dominant term of q103/q114 at 10×
  * data. Here the per-token cost is one in-place map probe; only a new
  * counter entry (≤cap live, amortized by MG's decrement-all) allocates.
  * Decision parity with the exploded spelling is spec-pinned
  * (FrequentItemsSpec): same sketch semantics, same candidates.
  */
case class MgFreqText(
    child: Expression,
    kExpr: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSketch] {

  private lazy val outK: Int = kExpr.eval().asInstanceOf[Int]
  private lazy val sketchCap: Int = capExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr, capExpr)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType || kExpr.dataType != IntegerType ||
        capExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"mg_freq_text expects (STRING, INT[, INT]), got " +
          s"(${child.dataType.sql}, ${kExpr.dataType.sql}, ${capExpr.dataType.sql})")
    else if (!kExpr.foldable || !capExpr.foldable)
      TypeCheckResult.TypeCheckFailure("mg_freq_text k and cap must be literals")
    else (kExpr.eval(), capExpr.eval()) match {
      case (null, _) | (_, null) =>
        TypeCheckResult.TypeCheckFailure("mg_freq_text k/cap must not be NULL")
      case (k: Int, cap: Int) if k >= 1 && cap >= k => TypeCheckResult.TypeCheckSuccess
      case (k, cap) => TypeCheckResult.TypeCheckFailure(
        s"mg_freq_text needs k >= 1 and cap >= k, got k = $k, cap = $cap")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("bound", LongType, nullable = false),
    StructField("items", ArrayType(
      StructType(Seq(
        StructField("item", StringType, nullable = false),
        StructField("est", LongType, nullable = false))),
      containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "mg_freq_text"

  override def createAggregationBuffer(): MgSketch = new MgSketch(sketchCap)

  override def update(buffer: MgSketch, input: InternalRow): MgSketch = {
    val v = child.eval(input)
    if (v != null) MgFreqText.updateFromText(buffer, v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: MgSketch, other: MgSketch): MgSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: MgSketch): Any =
    InternalRow(buffer.count, buffer.err, buffer.boundBeyond(outK),
      new GenericArrayData(buffer.topItems.take(outK).map { case (it, c) =>
        InternalRow(UTF8String.fromString(it), c)
      }))

  override def serialize(buffer: MgSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MgSketch =
    MgSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): MgFreqText =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MgFreqText =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgFreqText =
    copy(child = newChildren(0), kExpr = newChildren(1), capExpr = newChildren(2))
}

object MgFreqText {
  /** Tokenize `s` on space runs and absorb every non-empty token. Space
    * (0x20) never occurs inside a UTF-8 multibyte sequence, so the
    * byte-level split is exact for any input — same argument as
    * [[TokenTermCounts.count]]. Token views share one byte copy of the
    * document; the sketch clones only what it retains.
    */
  def updateFromText(sk: MgSketch, s: UTF8String): Unit = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    while (i < n) {
      if (b(i) == 0x20) i += 1
      else {
        val start = i
        while (i < n && b(i) != 0x20) i += 1
        sk.update(UTF8String.fromBytes(b, start, i - start))
      }
    }
  }
}

object FrequentItems {
  /** Shared guarded builders — one definition for both the session
    * registry and the `GraftExtensions` injection path, so a wrong-arity
    * SQL call fails with the same clean analysis error in either.
    */
  private[functions] val mgFreqBuilder: Seq[Expression] => Expression = {
    case Seq(item, k) => MgFreq(item, k)
    case exprs => throw new IllegalArgumentException(
      s"mg_freq expects 2 arguments (item, k), got ${exprs.length}")
  }
  private[functions] val mgFreqTextBuilder: Seq[Expression] => Expression = {
    case Seq(text, k) => MgFreqText(text, k, k)
    case Seq(text, k, cap) => MgFreqText(text, k, cap)
    case exprs => throw new IllegalArgumentException(
      s"mg_freq_text expects 2 or 3 arguments (text, k[, cap]), got ${exprs.length}")
  }

  /** Idempotent session-local registration of `mg_freq` and
    * `mg_freq_text`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_freq", mgFreqBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_freq_text", mgFreqTextBuilder, "scala_udf")
  }

  /** DataFrame-side helper: `mgFreq("token", 64)`. */
  def mgFreq(colName: String, k: Int): Column = expr(s"mg_freq($colName, $k)")
}
