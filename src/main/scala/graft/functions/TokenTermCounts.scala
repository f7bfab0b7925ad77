package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass whole-token counting against a constant term list.
  *
  * `token_term_counts(text, array('a','b',…))` → `array<bigint>` where
  * element 0 is the total token count (tokens = maximal runs of
  * non-space bytes, i.e. `string_split(text, ' ')` minus empties),
  * element i+1 is the number of tokens exactly equal to the i-th term,
  * and the LAST element (k+1 for k terms) is the number of distinct
  * terms with at least one occurrence — emitted so an any-term
  * prefilter can reference the result exactly once: a predicate built
  * from per-term elements (`c[1] > 0 OR c[2] > 0 …`) is pushed below
  * the projection by Catalyst and clones the whole expression per
  * disjunct into the scan filter.
  *
  * Why a custom Catalyst Expression (SURVEY §7.3 ladder, step (b)): the
  * composable alternatives each re-traverse the text per statistic —
  * `size(split(…))` materializes every token as a fresh string,
  * higher-order `filter` counts interpret a lambda per element, and the
  * padded-string `replace`-delta trick allocates a doubled copy of the
  * text per term. BM25 against a fixed query (q142) needs 1 + |terms|
  * counts per document; at 100 TB the scan is CPU-bound on exactly this
  * loop, so it deserves a single fused pass: one byte-wise scan finds
  * token boundaries and compares each run against the term byte arrays
  * in place — zero allocation beyond the fixed-size result array.
  * Space (0x20) never occurs inside a UTF-8 multibyte sequence, so the
  * byte-level tokenization is exact for any input.
  *
  * The term list must be foldable (it is baked into the operator, the
  * way a query plan would inline literals); duplicate terms are counted
  * independently. Null text yields null.
  */
case class TokenTermCounts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "token_term_counts expects (string, foldable array<string>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = left.nullable

  @transient private lazy val termBytes: Array[Array[Byte]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    if (arr == null) throw new IllegalArgumentException(
      "token_term_counts: term list must not be null")
    (0 until arr.numElements()).map { i =>
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        "token_term_counts: term list must not contain nulls")
      arr.getUTF8String(i).getBytes.clone()
    }.toArray
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else TokenTermCounts.count(t.asInstanceOf[UTF8String], termBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // only the text child is evaluated at runtime — the term list is a
    // constant shipped once as a reference object, not re-built per row
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val termsRef = ctx.addReferenceObj("termBytes", termBytes, "byte[][]")
    val leftGen = left.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        |${leftGen.code}
        |boolean ${ev.isNull} = ${leftGen.isNull};
        |$javaType ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.functions.TokenTermCounts.count(
        |    ${leftGen.value}, $termsRef);
        |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenTermCounts =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "token_term_counts"
}

object TokenTermCounts {
  /** The fused loop: tokenize on 0x20 runs, count all tokens and exact
    * matches per term. Called from both interpreted eval and codegen.
    */
  def count(s: UTF8String, terms: Array[Array[Byte]]): ArrayData = {
    val n = s.numBytes
    val k = terms.length
    val out = new Array[Long](k + 2)
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) i += 1
      else {
        val start = i
        while (i < n && s.getByte(i) != 0x20) i += 1
        out(0) += 1L
        val len = i - start
        var t = 0
        while (t < k) {
          val tb = terms(t)
          if (tb.length == len) {
            var j = 0
            while (j < len && s.getByte(start + j) == tb(j)) j += 1
            if (j == len) out(t + 1) += 1L
          }
          t += 1
        }
      }
    }
    var t = 0
    while (t < k) {
      if (out(t + 1) > 0L) out(k + 1) += 1L
      t += 1
    }
    new GenericArrayData(out)
  }
}
