package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the §2.0.7 polynomial string hash
  * (SURVEY §4.3 class, added r16).
  *
  * Why: `api.Text.polyHash` is an interpreted HOF —
  * `aggregate(sequence(1, length(c)), 0L,
  *   (a, i) -> (a*131 + ascii(substring(c, i, 1))) % 1000000007)` —
  * which pays a lambda dispatch + boxing per character AND an
  * O(position) `substring` re-scan per character (O(len²) per string).
  * This expression folds the identical Horner recurrence in one pass
  * over the string's code points: `ascii(substring(c, i, 1))` is by
  * definition the numeric value of the i-th character, i.e. the i-th
  * code point, so the integers are bit-identical to the HOF form (and
  * to the DuckDB `list_reduce` twin). TextExprsSpec pins the equality
  * on the full multilingual fixture corpus plus synthetic CJK/emoji
  * edges.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects string, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  /** One-pass Horner fold over the string's code points, mod 1e9+7 —
    * called from both interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var a = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      a = (a * 131L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    a
  }
}

object TextExprs {
  /** Register graft_polyhash on this session — idempotent (the
    * session is handed in by the harness). */
  def ensureRegistered(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_polyhash", args => PolyHash(args(0)), "built-in")
}
