package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd portable 60-bit hash: the top 60 bits of
  * `md5(utf8(x))` as a non-negative long — bit-identical to the
  * composed form `conv(substr(md5(x), 1, 15), 16, 10)` every oracle
  * mirrors in DuckDB (`('0x' || substr(md5(x), 1, 15))::BIGINT`), but
  * without materializing the 32-char hex string, the substring copy,
  * and the base-16 string parse per row.
  *
  * This is the hottest scalar in the text pipeline: every
  * bucket/shard/split decision (c21/c22/c29/c31/c42) and BloomLit's
  * portable mode hash each row through it. The generated code hands the
  * UTF8String's bytes straight to a thread-local MD5 and folds the
  * first 7.5 digest bytes into the long — one digest, zero string
  * allocations.
  */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "md5long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument (cast first), " +
        s"got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Md5Long.hash60(input.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.hash60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Long {
  private val tlMd5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of the md5 = first 60 bits of the digest:
    * fold digest bytes 0..7 big-endian into a long, drop the low
    * nibble (the 16th hex digit). Always in [0, 2^60).
    */
  def hash60(bytes: Array[Byte]): Long = {
    val md = tlMd5.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
