package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<float>` columns —
  * the SURVEY §7.3 custom-`Expression` extension point: participates in
  * whole-stage codegen (unlike a Scala UDF, which breaks the codegen
  * span and pays serialization per row; unlike higher-order functions,
  * which are interpreted per element).
  *
  * At 100 TB this is the hot inner loop of embedding search: the
  * generated code reads the unsafe array data in place — no boxing, no
  * Seq allocation per row.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.getFloat($i);
         |  double y = (double) $b.getFloat($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** The interpreted kernel, shared verbatim by the Expression's
    * `nullSafeEval` and the V2 catalog function's magic method
    * ([[CosineSimV2]]) — ONE op order, so the two surfaces are
    * bit-identical by construction (the codegen template repeats the
    * same order).
    */
  def compute(x: ArrayData, y: ArrayData): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** The SAME cosine kernel as a DataSource-V2 CATALOG FUNCTION
  * (`FunctionCatalog` → `UnboundFunction` → `ScalarFunction`), the
  * governed-function face next to the session-registry Expression:
  * a catalog function is resolved by NAME THROUGH THE CATALOG
  * (`SELECT graftmem.db.cosine_sim(a, b)`), so every session sharing
  * the catalog sees one definition — no per-session registry drift.
  * The MAGIC METHOD (`invoke(ArrayData, ArrayData)`) is what makes it
  * fast: the analyzer binds it as a direct method call inside
  * whole-stage codegen (no InternalRow boxing per row; that fallback,
  * `produceResult`, exists but is never hit when the magic signature
  * matches — b76's spec asserts the plan carries the invoke, not a
  * UDF-ish apply).
  */
object CosineSimV2
    extends org.apache.spark.sql.connector.catalog.functions
      .ScalarFunction[java.lang.Double] {
  override def inputTypes(): Array[DataType] =
    Array(ArrayType(FloatType), ArrayType(FloatType))
  override def resultType(): DataType = DoubleType
  override def name(): String = "cosine_sim"
  override def canonicalName(): String = "graft.functions.cosine_sim"
  override def isResultNullable: Boolean = false
  def invoke(a: ArrayData, b: ArrayData): Double = CosineSim.compute(a, b)
  override def produceResult(
      row: org.apache.spark.sql.catalyst.InternalRow): java.lang.Double =
    CosineSim.compute(row.getArray(0), row.getArray(1))
}

object CosineSimV2Unbound
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  override def name(): String = "cosine_sim"
  override def description(): String =
    "cosine_sim(array<float>, array<float>) -> double"
  override def bind(inputType: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    val ok = inputType.fields.length == 2 &&
      inputType.fields.forall(_.dataType match {
        case ArrayType(FloatType, _) => true
        case _                       => false
      })
    if (!ok) throw new UnsupportedOperationException(
      s"cosine_sim expects (array<float>, array<float>), got $inputType")
    CosineSimV2
  }
}

object GraftFunctions {
  private val info = new ExpressionInfo(
    classOf[CosineSim].getCanonicalName, "cosine_sim")

  private val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "cosine_sim takes exactly 2 arguments")
    CosineSim(children(0), children(1))
  }

  private val kmvInfo = new ExpressionInfo(
    classOf[KmvDistinct].getCanonicalName, "kmv_distinct")

  private val kmvBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "kmv_distinct takes exactly 1 argument")
    KmvDistinct(children.head)
  }

  private val md5LongInfo = new ExpressionInfo(
    classOf[Md5Long].getCanonicalName, "md5long")

  private val md5LongBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "md5long takes exactly 1 argument")
    Md5Long(children.head)
  }

  /** Sessions already registered — registration is cheap but mutates
    * the session's function registry; once per session is enough.
    * Bounded like the other session-keyed memos (clear past 8).
    */
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Runtime registration into an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    if (registered.contains(spark)) return
    if (registered.size >= 8) registered.clear()
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_sim"), info, builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("kmv_distinct"), kmvInfo, kmvBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("md5long"), md5LongInfo, md5LongBuilder)
    // b108: the table-valued function registers into the session's
    // TableFunctionRegistry — the relation-producing sibling of the
    // scalar registry above
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(PairsTvf.name), PairsTvf.info, PairsTvf.builder)
    registered.add(spark): Unit
  }

  private[functions] def inject(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("cosine_sim"), info, builder))
    e.injectFunction((FunctionIdentifier("kmv_distinct"), kmvInfo, kmvBuilder))
    e.injectFunction((FunctionIdentifier("md5long"), md5LongInfo, md5LongBuilder))
    e.injectTableFunction(
      (FunctionIdentifier(PairsTvf.name), PairsTvf.info, PairsTvf.builder))
  }
}

/** `spark.sql.extensions`-style registration:
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  * Injects the cosine_sim function and the as-of join planner strategy.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(e)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.AsOfJoinFilterPushdown)
  }
}
