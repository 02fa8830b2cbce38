package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 — the source-side extension point completing
  * the matrix next to the custom Expression / Aggregate / LogicalPlan /
  * Strategy / Rule (SURVEY §7.3): a deterministic (id, value=md5(id))
  * pair generator, the Mrs "source module" shape [mrs: mrs/fileformats
  * .py] as a first-class Spark table.
  *
  * Scale surface demonstrated:
  *  - `planInputPartitions` splits the id range into `slices` splits —
  *    the reader parallelizes like any file source;
  *  - `SupportsPushDownV2Filters`: comparisons of `id` against long
  *    literals narrow the GENERATED range (the analogue of parquet
  *    row-group skipping) and are removed from the post-scan filter;
  *  - `SupportsPushDownRequiredColumns`: unreferenced columns are never
  *    materialized.
  *
  * Usage: `spark.read.format("pairgen").option("rows", n)
  * .option("slices", p).load()`.
  */
class PairGenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pairgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PairGenSource.schemaFor(options.getInt("buckets", 0),
      options.getBoolean("variant", false))
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PairGenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt,
      properties.getOrDefault("batchRows", "1000").toLong,
      properties.getOrDefault("buckets", "0").toInt,
      properties.getOrDefault("variant", "false").toBoolean)
}

object PairGenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** With `buckets > 0` the table is KEY-GROUPED STORAGE-PARTITIONED:
    * a `grp = id % buckets` column materializes, each input partition
    * holds exactly one grp value (reported via [[HasPartitionKey]]),
    * and the scan reports `KeyGroupedPartitioning(identity(grp))` —
    * the Iceberg-bucket-layout shape, so two co-bucketed pairgen scans
    * join with ZERO exchange (storage-partitioned join). See a34.
    */
  def schemaFor(buckets: Int, variant: Boolean = false): StructType = {
    val base =
      if (buckets <= 0) schema
      else schema.add(StructField("grp", LongType, nullable = false))
    // `variant=true` (a43): a semi-structured column,
    // meta = {"k": id % 8, "tag": "t" + (id % 3)} as a real VARIANT
    if (!variant) base
    else base.add(StructField("meta",
      org.apache.spark.sql.types.VariantType, nullable = true))
  }

  /** ONE md5 kernel for every reader path (row, columnar, continuous):
    * the 32-char lowercase hex of md5(decimal id) as raw ASCII bytes.
    * A drifted copy would silently split the paths' contents.
    */
  private[sources] def md5HexBytes(
      md: java.security.MessageDigest, v: Long): Array[Byte] = {
    val dig = md.digest(java.lang.Long.toString(v).getBytes("UTF-8"))
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = HEX((dig(i) >> 4) & 0xf)
      out(i * 2 + 1) = HEX(dig(i) & 0xf)
      i += 1
    }
    out
  }
  private val HEX = "0123456789abcdef".getBytes("US-ASCII")

  /** One range-splitting rule for the batch scan AND the microbatch
    * stream (a skew/clamp tweak to one must hit both).
    */
  private[sources] def splitRange(
      lo: Long, hi: Long, slices: Int): Array[InputPartition] = {
    val n = math.max(1, slices)
    val span = math.max(0L, hi - lo)
    (0 until n).map { i =>
      PairGenPartition(lo + span * i / n, lo + span * (i + 1) / n,
        i): InputPartition
    }.toArray
  }
}

private[sources] class PairGenTable(
    rows: Long, slices: Int, batchRows: Long, buckets: Int,
    variant: Boolean = false)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"pairgen($rows)"
  override def schema(): StructType =
    PairGenSource.schemaFor(buckets, variant)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.CONTINUOUS_READ)

  /** METADATA COLUMNS (a45, `SupportsMetadataColumns`): `_split_id`
    * exposes WHICH planned split served each row — the connector
    * analogue of `_metadata.file_path` on file sources (row
    * provenance at the storage grain). Hidden from `SELECT *`
    * (the engine's metadata-column contract); materialized only when
    * a query names it, at which point the engine appends it to the
    * pruned read schema and this source's row readers emit it per
    * partition: the range-split ordinal for plain scans, the residue
    * class (= grp) for bucketed scans, 0 for the single fully-pushed
    * top-N partition. Columnar reads decline when it is requested
    * (the all-or-nothing per-scan contract a44 documents) and join
    * pushdown declines a metadata-bearing side — provenance must
    * come from a real scan, never be invented by a collapsed one.
    */
  override def metadataColumns(): Array[
      org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_split_id"
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String =
        "ordinal of the planned split that generated the row"
    })
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PairGenScanBuilder(rows, slices, batchRows, buckets, variant)
}

private[sources] class PairGenScanBuilder(
    rows: Long, slices: Int, batchRows: Long, private val buckets: Int,
    private val variant: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownV2Filters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN
    with org.apache.spark.sql.connector.read.SupportsPushDownOffset
    with org.apache.spark.sql.connector.read.SupportsPushDownJoin
    with org.apache.spark.sql.connector.read.SupportsPushDownTableSample
    with org.apache.spark.sql.connector.read
      .SupportsPushDownVariantExtractions {
  private var lo = 0L
  private var hi = rows
  // TABLESAMPLE pushdown: (lower, upper, seed); the reader keeps id
  // iff its seeded hash fraction falls in [lower, upper)
  private var sampleSpec: Option[(Double, Double, Long)] = None

  /** TABLE-SAMPLE PUSHDOWN (`SupportsPushDownTableSample`):
    * `df.sample(f, seed)` / `TABLESAMPLE (p PERCENT)` executes in the
    * source — deterministic seeded-hash sampling per id (sampling is
    * approximate by contract, so a source may sample its own way; the
    * determinism is what makes it testable and repeatable across
    * retries — the property a REPEATABLE seed exists for). Declined
    * with replacement and after/with any face whose closed form a
    * thinned row stream would silently break (aggregates, the limit
    * family, a pushed join) — the a42 composition lesson applied in
    * advance.
    */
  override def pushTableSample(lowerBound: Double, upperBound: Double,
      withReplacement: Boolean, seed: Long): Boolean =
    if (withReplacement || aggOps.isDefined || topNDesc.isDefined ||
      joinedCols.nonEmpty || sampleSpec.isDefined) false
    else {
      sampleSpec = Some((lowerBound, upperBound, seed))
      true
    }
  private var pushed =
    Array.empty[org.apache.spark.sql.connector.expressions.filter.Predicate]
  private var required: StructType =
    PairGenSource.schemaFor(buckets, variant)

  /** VARIANT-EXTRACTION PUSHDOWN (a43,
    * `SupportsPushDownVariantExtractions`,
    * `spark.sql.variant.pushVariantIntoScan`) — the connector face of
    * Spark-4 semi-structured data (parquet shredded-variant reads are
    * the reference impl): the planner collects the `variant_get`
    * paths a query actually extracts and offers them to the source;
    * accepted paths replace the variant column with a struct of
    * TYPED extracted fields in the pruned schema, and the variant
    * BINARY is never built at all. For the generator both supported
    * paths are closed-form ($.k → id % 8 as LONG, $.tag →
    * "t" + id % 3 as STRING); anything else declines and the full
    * variant value is materialized for Spark to extract from. The
    * 100 TB analogue: reading two shredded columns instead of
    * decoding every row's variant blob.
    */
  override def pushVariantExtractions(
      extractions: Array[org.apache.spark.sql.connector.read
        .VariantExtraction]): Array[Boolean] = {
    def supported(e: org.apache.spark.sql.connector.read
        .VariantExtraction): Boolean =
      variant && e.columnName().sameElements(Array("meta")) && {
        val path = org.apache.spark.sql.execution.datasources
          .VariantMetadata.fromMetadata(e.metadata()).path
        (path == "$.k" && e.expectedDataType() == LongType) ||
        (path == "$.tag" &&
          e.expectedDataType() == org.apache.spark.sql.types.StringType)
      }
    // all-or-nothing, the reference connector's contract: a partial
    // acceptance would leave some variant_get calls needing the full
    // binary anyway. On acceptance the CONTRACT is that this
    // builder's scan reports `meta` as the STRUCT of the accepted
    // extractions IN ARRAY ORDER — the engine rewrites each
    // variant_get into an ordinal struct access against the scan's
    // reported schema, so order and types must match exactly.
    if (extractions.nonEmpty && extractions.forall(supported)) {
      val metaStruct = StructType(extractions.zipWithIndex.map {
        case (e, i) => StructField(s"_$i", e.expectedDataType(),
          nullable = false, metadata = e.metadata())
      })
      required = StructType(required.fields.map { f =>
        if (f.name == "meta") f.copy(dataType = metaStruct) else f
      })
      Array.fill(extractions.length)(true)
    } else Array.fill(extractions.length)(false)
  }
  private var aggOps: Option[PairGenAggSpec] = None
  private var topNDesc: Option[Boolean] = None // Some(descending?)
  // JOIN PUSHDOWN (a42): aliased output name → underlying generator
  // column ("id" / "value"), in output order; nonEmpty = this builder
  // now produces the JOINED relation
  private var joinedCols: Seq[(String, String)] = Nil

  /** JOIN PUSHDOWN (a42, `SupportsPushDownJoin`,
    * `spark.sql.optimizer.datasourceV2JoinPushdown`) — the newest
    * DSv2 planner face (the JDBC connector is Spark's reference
    * implementation: ship the JOIN to the database). For a
    * deterministic generator the inner equi-join of two ranges on
    * `id` is CLOSED-FORM: both sides emit identical (id, value) for
    * any id, so the join IS the range intersection
    * [max(lo₁,lo₂), min(hi₁,hi₂)) with each output column drawn from
    * the one generator — Spark plans NO join operator at all, and
    * upstream pushed filters compose for free (they already narrowed
    * the ranges being intersected). Accepted only for the shape the
    * closed form covers: INNER, both sides plain unbucketed pairgen
    * builders with no pushed aggregate/top-N, condition = equality
    * of the two sides' `id` columns. Everything else returns false
    * and Spark keeps its own join — pushdown is an optimization
    * contract, never a semantics change.
    */
  override def isOtherSideCompatibleForJoin(
      other: org.apache.spark.sql.connector.read.SupportsPushDownJoin)
      : Boolean = other match {
    case o: PairGenScanBuilder =>
      joinedCols.isEmpty && o.joinedCols.isEmpty &&
        aggOps.isEmpty && o.aggOps.isEmpty &&
        topNDesc.isEmpty && o.topNDesc.isEmpty &&
        sampleSpec.isEmpty && o.sampleSpec.isEmpty &&
        buckets <= 0 && o.buckets <= 0
    case _ => false
  }

  override def pushDownJoin(
      other: org.apache.spark.sql.connector.read.SupportsPushDownJoin,
      joinType: org.apache.spark.sql.connector.join.JoinType,
      leftReq: Array[org.apache.spark.sql.connector.read
        .SupportsPushDownJoin.ColumnWithAlias],
      rightReq: Array[org.apache.spark.sql.connector.read
        .SupportsPushDownJoin.ColumnWithAlias],
      condition: org.apache.spark.sql.connector.expressions.filter
        .Predicate): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (joinType != org.apache.spark.sql.connector.join.JoinType
        .INNER_JOIN) return false
    // a45: a requested metadata column (`_split_id`) is row
    // PROVENANCE — a collapsed closed-form join has no real splits to
    // attribute rows to, so it must decline, not invent one
    if ((leftReq ++ rightReq).exists(c => c.colName().startsWith("_")))
      return false
    val o = other.asInstanceOf[PairGenScanBuilder]
    def outName(
        c: org.apache.spark.sql.connector.read.SupportsPushDownJoin
          .ColumnWithAlias): String =
      Option(c.alias()).getOrElse(c.colName())
    // the aliased names the two sides' id columns carry in the join
    val leftId = leftReq.find(_.colName() == "id").map(outName)
    val rightId = rightReq.find(_.colName() == "id").map(outName)
    val condIds = condition match {
      case p if p.name() == "=" && p.children().length == 2 =>
        (p.children()(0), p.children()(1)) match {
          case (a: NamedReference, b: NamedReference) =>
            Some(Set(a.fieldNames().mkString("."),
              b.fieldNames().mkString(".")))
          case _ => None
        }
      case _ => None
    }
    val ok = (leftId, rightId, condIds) match {
      case (Some(l), Some(r), Some(cs)) => cs == Set(l, r) && l != r
      case _                            => false
    }
    if (!ok) return false
    // the join = the range intersection; output = left cols then
    // right cols under their aliases, every one generated closed-form
    lo = math.max(lo, o.lo)
    hi = math.min(hi, o.hi)
    joinedCols = (leftReq ++ rightReq).toSeq
      .map(c => outName(c) -> c.colName())
    required = StructType(joinedCols.map { case (alias, src) =>
      PairGenSource.schema.fields(
        PairGenSource.schema.fieldIndex(src)).copy(name = alias)
    })
    true
  }

  /** FILTER PUSHDOWN (`SupportsPushDownV2Filters`, the modern
    * Predicate face — richer and engine-canonical vs the legacy
    * `sources.Filter` API): any comparison of `id` against a long
    * literal (=, >, >=, <, <=, either operand order, plus the trivial
    * IS_NOT_NULL on a non-nullable column) narrows the GENERATED
    * range [lo, hi) — the analogue of parquet row-group skipping.
    * Accepted predicates are EXACT (range arithmetic, no
    * re-evaluation needed), so they drop out of the residual and no
    * post-scan Filter survives. `>`/`<=`/`=` clamp through a
    * saturating successor so Long.MaxValue bounds cannot overflow
    * (the PairGenOffset lesson, applied to comparisons).
    */
  override def pushPredicates(
      predicates: Array[org.apache.spark.sql.connector.expressions
        .filter.Predicate]): Array[org.apache.spark.sql.connector
        .expressions.filter.Predicate] = {
    import org.apache.spark.sql.connector.expressions.{Expression, Literal, NamedReference}
    // after a pushed join the output names are aliases — decline
    // everything and let Spark evaluate above the scan
    if (joinedCols.nonEmpty) return predicates
    def idRef(e: Expression): Boolean = e match {
      case f: NamedReference => f.fieldNames.sameElements(Array("id"))
      case _                 => false
    }
    def longLit(e: Expression): Option[Long] = e match {
      case l: Literal[_] => l.value() match {
        case n: java.lang.Number => Some(n.longValue())
        case _                   => None
      }
      case _ => None
    }
    // saturating v+1: an upper bound of Long.MaxValue must not wrap
    def succ(v: Long): Long =
      if (v == Long.MaxValue) Long.MaxValue else v + 1
    // (op, literal) with the column on the LEFT; a literal-first
    // comparison arrives flipped
    def normalized(p: org.apache.spark.sql.connector.expressions
        .filter.Predicate): Option[(String, Long)] =
      p.children() match {
        case Array(a, b) if idRef(a) =>
          longLit(b).map(v => (p.name(), v))
        case Array(a, b) if idRef(b) =>
          longLit(a).map { v =>
            val flip = Map(">" -> "<", "<" -> ">",
              ">=" -> "<=", "<=" -> ">=", "=" -> "=")
            (flip.getOrElse(p.name(), p.name()), v)
          }
        case _ => None
      }
    val (sup, unsup) = predicates.partition { p =>
      (p.name() == "IS_NOT_NULL" && p.children().length == 1 &&
        idRef(p.children()(0))) ||
        (Set("=", ">", ">=", "<", "<=")(p.name()) &&
          normalized(p).isDefined)
    }
    sup.foreach { p =>
      normalized(p).foreach { case (op, v) =>
        op match {
          case ">=" => lo = math.max(lo, v)
          case ">"  => lo = math.max(lo, succ(v))
          case "<"  => hi = math.min(hi, v)
          case "<=" => hi = math.min(hi, succ(v))
          case "="  => lo = math.max(lo, v); hi = math.min(hi, succ(v))
        }
      } // IS_NOT_NULL on the non-nullable id: accepted no-op
    }
    pushed = sup
    unsup // residual predicates Spark must still evaluate
  }
  override def pushedPredicates(): Array[
    org.apache.spark.sql.connector.expressions.filter.Predicate] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
    // keep the alias→source map aligned with the pruned output
    if (joinedCols.nonEmpty) {
      val bySrc = joinedCols.toMap
      joinedCols = requiredSchema.fieldNames.toSeq
        .map(n => n -> bySrc(n))
    }
  }

  /** AGGREGATE PUSHDOWN (a35): COUNT(*) / COUNT(id) / MIN(id) /
    * MAX(id), optionally grouped by the bucket key `grp`, are
    * CLOSED-FORM over the generated id range — the connector answers
    * them from arithmetic without materializing a single data row
    * (the generator's analogue of parquet footer statistics / Iceberg
    * manifest aggregates). `supportCompletePushDown` returns true for
    * the supported shapes, so Spark plans NO aggregation operator at
    * all: the scan's output rows ARE the final results (one row, or
    * one per bucket when grouped). Filter pushdown composes — Spark
    * pushes filters before aggregates, so [lo, hi) is already
    * narrowed when the aggregate arrives. Unsupported shapes return
    * false and fall back to the ordinary row scan untouched.
    */
  private def aggSpecOf(agg: org.apache.spark.sql.connector.expressions
      .aggregate.Aggregation): Option[PairGenAggSpec] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    def refTo(e: org.apache.spark.sql.connector.expressions.Expression,
        name: String): Boolean = e match {
      case f: NamedReference => f.fieldNames.sameElements(Array(name))
      case _                 => false
    }
    val grouped = agg.groupByExpressions.length match {
      case 0                                             => Some(false)
      case 1 if buckets > 0 &&
        refTo(agg.groupByExpressions()(0), "grp")        => Some(true)
      case _                                             => None
    }
    val ops = agg.aggregateExpressions.toSeq.map {
      case _: CountStar               => Some(PairGenAggOp.Cnt)
      case c: Count if !c.isDistinct && refTo(c.column, "id") =>
        Some(PairGenAggOp.Cnt)
      case m: Min if refTo(m.column, "id") => Some(PairGenAggOp.MinId)
      case m: Max if refTo(m.column, "id") => Some(PairGenAggOp.MaxId)
      case _                          => None
    }
    for (g <- grouped; o <- Some(ops) if o.forall(_.isDefined))
      yield PairGenAggSpec(g, o.map(_.get))
  }
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean =
    sampleSpec.isEmpty && aggSpecOf(agg).isDefined
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = {
    // a sampled stream breaks the closed-form range arithmetic
    if (sampleSpec.isDefined) return false
    aggOps = aggSpecOf(agg)
    aggOps.isDefined
  }

  /** LIMIT / TOP-N PUSHDOWN (a36): over a deterministic id-ordered
    * generator both are pure RANGE NARROWING — `LIMIT n` keeps any n
    * rows, so the range clamps to its first n ids; `ORDER BY id
    * [DESC] LIMIT n` clamps to the range's first/last n ids and the
    * scan emits them IN ORDER from a single partition
    * (`isPartiallyPushed = false`, so Spark drops its own Sort+Limit
    * entirely — the file-source analogue is a parquet reader serving
    * top-N from a sorted/indexed layout). Declined when an aggregate
    * was already pushed (the combination never arises from Spark's
    * push order but would compose wrongly) and for any sort key other
    * than bare `id`.
    */
  // After a pushed join the limit family must DECLINE: the joined
  // build() branch emits a plain multi-slice scan, so accepting a
  // top-N there (isPartiallyPushed=false deletes Spark's Sort+Limit)
  // would silently return wrongly-ordered rows. Aggregates remain
  // safe post-join (closed-form over the intersected range).
  override def pushLimit(n: Int): Boolean =
    if (aggOps.isDefined || buckets > 0 || n < 0 ||
      joinedCols.nonEmpty || sampleSpec.isDefined) false
    else {
      // subtract, don't add: lo + n overflows for extreme row counts
      // (the PairGenOffset lesson applied to the limit clamp)
      if (n < hi - lo) hi = lo + n
      true
    }

  /** OFFSET pushdown — the last cell of the limit family: over the
    * deterministic id-ordered generator `OFFSET n` is pure range
    * narrowing from the LOW end (`LIMIT` clamps the high end, top-N
    * both). Spark pushes offset after top-N/limit
    * (`ORDER BY id LIMIT k OFFSET n` arrives as topN(k+n) then
    * offset(n)), so the clamp composes with whatever narrowing is
    * already in place; the scan then emits exactly the requested
    * window and Spark drops its own offset operator. Declined on the
    * same shapes as limit (aggregates, bucketed layouts).
    */
  override def pushOffset(n: Int): Boolean =
    if (aggOps.isDefined || buckets > 0 || n < 0 ||
      joinedCols.nonEmpty || sampleSpec.isDefined) false
    else {
      if (topNDesc.contains(true)) {
        // descending order: skipping n rows drops the HIGHEST ids
        if (n < hi - lo) hi = hi - n else hi = lo
      } else {
        if (n < hi - lo) lo = lo + n else lo = hi
      }
      true
    }
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    val ok = !aggOps.isDefined && buckets <= 0 && n >= 0 &&
      joinedCols.isEmpty && sampleSpec.isEmpty && orders.length == 1 &&
      (orders(0).expression() match {
        case f: NamedReference => f.fieldNames.sameElements(Array("id"))
        case _                 => false
      })
    if (!ok) false
    else {
      val desc = orders(0).direction() == SortDirection.DESCENDING
      // overflow-safe clamps (subtract, don't add — PairGenOffset lesson)
      if (desc) { if (n < hi - lo) lo = hi - n }
      else if (n < hi - lo) hi = lo + n
      topNDesc = Some(desc)
      true
    }
  }
  // top-N is FULLY pushed (single ordered partition); a bare limit is
  // partially pushed (the narrowed range is exact, but leaving Spark's
  // limit operator in place is the conservative contract)
  override def isPartiallyPushed: Boolean = topNDesc.isEmpty

  override def build(): Scan = aggOps match {
    case Some(spec) => new PairGenAggScan(lo, hi, buckets, spec)
    case None if joinedCols.nonEmpty =>
      // joined scan: generate the underlying (id/value) columns, but
      // REPORT the aliased joined schema
      val srcSchema = StructType(required.fields.map { f =>
        f.copy(name = joinedCols.toMap.apply(f.name))
      })
      new PairGenScan(lo, hi, slices, batchRows, 0, srcSchema,
        outputSchema = Some(required))
    case None =>
      new PairGenScan(lo, hi, slices, batchRows, buckets, required,
        ordered = topNDesc, singlePartition = topNDesc.isDefined,
        sample = sampleSpec)
  }
}

private[sources] object PairGenAggOp extends Enumeration {
  val Cnt, MinId, MaxId = Value
}

private[sources] case class PairGenAggSpec(
    grouped: Boolean, ops: Seq[PairGenAggOp.Value])

/** Completely-pushed aggregate scan: emits the FINAL aggregate rows
  * closed-form. Ungrouped: one partition, one row. Grouped by `grp`:
  * one partition per bucket, each emitting its own (grp, aggs…) row —
  * still key-grouped, still zero data rows materialized. An empty
  * narrowed range emits count=0 with NULL min/max (matching what the
  * engine's aggregate would produce over zero rows).
  */
private[sources] class PairGenAggScan(
    lo: Long, hi: Long, buckets: Int, spec: PairGenAggSpec)
    extends Scan with Batch {
  override def readSchema(): StructType = {
    val aggFields = spec.ops.zipWithIndex.map { case (op, i) =>
      StructField(s"agg_$i", LongType, nullable = op != PairGenAggOp.Cnt)
    }
    StructType(
      (if (spec.grouped) Seq(StructField("grp", LongType, nullable = false))
       else Seq.empty) ++ aggFields)
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"PairGenAggScan range=[$lo,$hi) grouped=${spec.grouped} " +
      s"pushedAggregates=[${spec.ops.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    if (spec.grouped)
      (0 until buckets)
        .map(b => PairGenAggPartition(lo, hi, b, buckets): InputPartition)
        .toArray
    else Array(PairGenAggPartition(lo, hi, -1, 0))
  override def createReaderFactory(): PartitionReaderFactory =
    new PairGenAggReaderFactory(spec)
}

private[sources] case class PairGenAggPartition(
    lo: Long, hi: Long, bucket: Int, buckets: Int) extends InputPartition

private[sources] class PairGenAggReaderFactory(spec: PairGenAggSpec)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[PairGenAggPartition]
    new PartitionReader[InternalRow] {
      // ids of this partition: [lo, hi), restricted to the residue
      // class when bucketed — first/last via modular arithmetic
      private val (first, last) =
        if (part.buckets <= 0) (part.lo, part.hi - 1)
        else {
          val k = part.buckets.toLong
          val f = part.lo +
            (((part.bucket.toLong - part.lo) % k) + k) % k
          if (f >= part.hi) (1L, 0L) // empty marker (first > last)
          else (f, f + ((part.hi - 1 - f) / k) * k)
        }
      private val empty = last < first
      private var emitted = false
      // GROUPED + empty: the engine's aggregate emits NO row for a
      // group with no input — an empty bucket must vanish, not report
      // count=0. UNGROUPED + empty: a global aggregate over zero rows
      // emits exactly one row (count=0, NULL min/max) — keep it.
      override def next(): Boolean =
        !(empty && part.buckets > 0) && !emitted && { emitted = true; true }
      override def get(): InternalRow = {
        val cnt =
          if (empty) 0L
          else if (part.buckets <= 0) last - first + 1
          else (last - first) / part.buckets + 1
        val vals = spec.ops.map {
          case PairGenAggOp.Cnt => java.lang.Long.valueOf(cnt)
          case PairGenAggOp.MinId =>
            if (empty) null else java.lang.Long.valueOf(first)
          case PairGenAggOp.MaxId =>
            if (empty) null else java.lang.Long.valueOf(last)
        }
        InternalRow.fromSeq(
          (if (spec.grouped) Seq(java.lang.Long.valueOf(part.bucket.toLong))
           else Seq.empty) ++ vals)
      }
      override def close(): Unit = ()
    }
  }
}

private[sources] class PairGenScan(
    lo: Long, hi: Long, slices: Int, batchRows: Long, buckets: Int,
    required: StructType,
    ordered: Option[Boolean] = None, singlePartition: Boolean = false,
    outputSchema: Option[StructType] = None,
    sample: Option[(Double, Double, Long)] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {

  /** ORDERING report (a39): every partition this scan plans emits its
    * rows in a PROVABLE order — plain range splits ascend through a
    * contiguous id range, a bucket partition holds one constant grp
    * and ascends through its id residue class, and the fully-pushed
    * top-N partition descends — so the scan declares that
    * per-partition ordering (`SupportsReportOrdering`), the connector
    * analogue of a sorted file layout (Hive SMB tables, Iceberg
    * sorted write order). `V2ScanPartitioningAndOrdering` attaches it
    * to the relation and EnsureRequirements then drops the Sort
    * below a sort-merge join whose keys the ordering satisfies —
    * paired with the KeyGroupedPartitioning report this makes the
    * co-bucketed SMJ exchange-free AND sort-free (a39's spec proves
    * zero SortExec below the join). Only columns that survived
    * pruning are reported: an ordering over a pruned column would
    * not resolve.
    */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions => E, SortDirection}
    // a joined scan's output names are aliases — an ordering report
    // over the underlying names would not resolve
    if (outputSchema.isDefined)
      return Array.empty
    val has = required.fieldNames.toSet
    val idDir =
      if (ordered.contains(true)) SortDirection.DESCENDING
      else SortDirection.ASCENDING
    val cols = if (buckets > 0) Seq("grp", "id") else Seq("id")
    cols.filter(has).map { c =>
      E.sort(E.identity(c),
        if (c == "id") idDir else SortDirection.ASCENDING)
    }.toArray
  }

  /** STATISTICS (a38): exact row count and size from the generated
    * (filter-narrowed, column-pruned) range — the connector analogue
    * of parquet footer totals / an Iceberg manifest's summed file
    * sizes. Spark's planner consumes these through
    * `DataSourceV2Relation.computeStats`: a pairgen side whose
    * reported size clears `autoBroadcastJoinThreshold` is chosen for
    * BROADCAST with no hint and no AQE runtime size probe (a38's
    * spec asserts both the BHJ and the no-stats contrast). Without
    * the report, DSv2 relations default to
    * `spark.sql.defaultSizeInBytes` = Long.Max — i.e. "never
    * broadcast-able at plan time" — making stats the difference
    * between a planned broadcast and a shuffle on the first
    * execution. Size model: 8 bytes per LONG column + 32 per md5
    * string, matched to what the reader materializes.
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val full = math.max(0L, hi - lo)
    // a pushed TABLESAMPLE thins the emitted stream — reporting the
    // FULL range would inflate planner cardinality by 1/fraction and
    // deny the sampled side the broadcast its true size earns (the
    // a38/a41 contract, sample-adjusted). Hash-uniform sampling makes
    // n·fraction the right estimate; NDVs below inherit it through n.
    val n = sample match {
      case Some((lb, ub, _)) =>
        val frac = math.max(0.0, math.min(1.0, ub - lb))
        math.min(full, math.round(full.toDouble * frac))
      case None => full
    }
    val perRow = required.fields.map(_.dataType match {
      case LongType => 8L
      case _        => 32L // value: 32-char md5 string
    }).sum
    // Overflow-safe: an extreme `rows` option must saturate, not wrap —
    // a wrapped-negative sizeInBytes would clear
    // autoBroadcastJoinThreshold and plan-time-broadcast a huge
    // generated table (the exact failure a38's stats exist to prevent).
    val size =
      try Math.multiplyExact(n, math.max(1L, perRow))
      catch { case _: ArithmeticException => Long.MaxValue }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(size)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(n)

      /** COLUMN STATISTICS (a41): exact per-column NDVs, straight
        * from the generator's own structure — `id` is unique over the
        * range, `grp = id % buckets` has min(n, buckets) residues,
        * `value = md5(id)` inherits id's uniqueness. This is the
        * connector analogue of a table format's column-level metadata
        * (Iceberg NDV sketches / Delta column stats): the planner's
        * `transformV2Stats` lifts them into catalyst `ColumnStat`,
        * and with CBO on, `JoinEstimation` can size every equi-join
        * (card ≈ n₁·n₂ / max(ndv)) — which is what lets
        * `CostBasedJoinReorder` commute a selective dim below a wide
        * one WITHOUT any ANALYZE pass (b81 needed one; a41 proves
        * format-supplied stats make it free). Reported only for
        * columns that survived pruning — a stat for a pruned column
        * has no attribute to bind to.
        */
      override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        val m = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        def put(name: String, ndv: Long, len: Long): Unit =
          m.put(org.apache.spark.sql.connector.expressions.Expressions
            .column(name),
            new org.apache.spark.sql.connector.read.colstats
              .ColumnStatistics {
              override def distinctCount(): java.util.OptionalLong =
                java.util.OptionalLong.of(ndv)
              override def nullCount(): java.util.OptionalLong =
                java.util.OptionalLong.of(0L)
              override def avgLen(): java.util.OptionalLong =
                java.util.OptionalLong.of(len)
              override def maxLen(): java.util.OptionalLong =
                java.util.OptionalLong.of(len)
            })
        required.fieldNames.foreach {
          case "id"    => put("id", math.max(1L, n), 8L)
          case "value" => put("value", math.max(1L, n), 32L)
          case "grp" =>
            put("grp", math.max(1L, math.min(n, buckets.toLong)), 8L)
          case _ => ()
        }
        m
      }
    }
  }

  /** RUNTIME FILTERING (a37): on the bucketed layout the scan accepts
    * join-driven runtime predicates on `grp` — Spark evaluates the
    * small join side first, hands the surviving key set here as an
    * `IN` predicate, and [[planInputPartitions]] then SKIPS whole
    * bucket partitions before a single row is generated (DSv2 dynamic
    * partition pruning, the Iceberg-manifest-pruning shape; b55 is
    * the parquet twin). Unrecognized predicate shapes are ignored —
    * runtime filters are an optimization contract, never a
    * correctness one (Spark re-applies the join condition above).
    */
  private var allowedGrps: Option[Set[Long]] = None
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (buckets > 0)
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column("grp"))
    else Array.empty
  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().nonEmpty) {
        val onGrp = p.children()(0) match {
          case f: org.apache.spark.sql.connector.expressions.NamedReference =>
            f.fieldNames.sameElements(Array("grp"))
          case _ => false
        }
        if (onGrp) {
          val vals = p.children().drop(1).collect {
            case l: org.apache.spark.sql.connector.expressions
              .Literal[_] if l.value() != null =>
              l.value() match {
                case n: java.lang.Number => n.longValue()
              }
          }.toSet
          if (vals.nonEmpty)
            allowedGrps = Some(allowedGrps.fold(vals)(_ intersect vals))
        }
      }
    }
  override def readSchema(): StructType =
    outputSchema.getOrElse(required)
  override def toBatch: Batch = this
  override def toMicroBatchStream(
      checkpointLocation: String): streaming.MicroBatchStream =
    new PairGenMicroBatchStream(lo, hi, slices, batchRows, required)
  override def toContinuousStream(
      checkpointLocation: String): streaming.ContinuousStream =
    new PairGenContinuousStream(lo, hi, slices, required)
  override def description(): String =
    s"PairGenScan range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}" +
      ordered.map(d => s" pushedTopN(desc=$d)").getOrElse("") +
      (if (outputSchema.isDefined) " pushedJoin" else "") +
      sample.map { case (lb, ub, seed) =>
        s" pushedSample([$lb,$ub), seed=$seed)"
      }.getOrElse("")
  override def planInputPartitions(): Array[InputPartition] =
    if (singlePartition)
      // fully-pushed top-N: ONE partition emitting the narrowed range
      // in the requested order — the global-order contract
      // isPartiallyPushed=false rests on
      Array(
        if (ordered.contains(true)) PairGenDescPartition(lo, hi)
        else PairGenPartition(lo, hi))
    else if (buckets <= 0) PairGenSource.splitRange(lo, hi, slices)
    else (0 until buckets)
      .filter(b => allowedGrps.forall(_.contains(b.toLong)))
      .map(b => PairGenBucketPartition(lo, hi, b, buckets): InputPartition)
      .toArray
  /** Bucketed: `KeyGroupedPartitioning(identity(grp))` — the report
    * that lets EnsureRequirements align two co-bucketed scans with no
    * exchange (identity transform needs no FunctionCatalog, unlike
    * `bucket(n, col)`). Unbucketed: unknown, as before.
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (buckets <= 0)
      new org.apache.spark.sql.connector.read.partitioning
        .UnknownPartitioning(math.max(1, slices))
    else
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .identity("grp")),
          buckets)
  override def createReaderFactory(): PartitionReaderFactory =
    new PairGenReaderFactory(required, sample)
}

private[sources] case class PairGenPartition(start: Long, end: Long,
    splitId: Int = 0)
    extends InputPartition

/** Descending emission of [start, end) — the fully-pushed
  * `ORDER BY id DESC LIMIT n` shape (unbucketed tables only).
  */
private[sources] case class PairGenDescPartition(start: Long, end: Long)
    extends InputPartition

/** One key-group of the bucketed layout: the ids in [lo, hi) with
  * `id % buckets == bucket`. `partitionKey` is how the scan PROVES to
  * Spark that every row here shares grp = bucket — the contract
  * KeyGroupedPartitioning rests on (a lying key silently mis-joins,
  * same as a corrupt Iceberg manifest).
  */
private[sources] case class PairGenBucketPartition(
    lo: Long, hi: Long, bucket: Int, buckets: Int)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(bucket.toLong)
}

/** Offset = how many ids have been emitted so far (a long, JSON-encoded
  * for the checkpoint log).
  */
private[sources] case class PairGenOffset(pos: Long)
    extends streaming.Offset {
  override def json(): String = pos.toString
}

/** MicroBatchStream over the same deterministic range: each trigger
  * advances at most `batchRows` ids, so the bounded table drains in
  * ceil(span/batchRows) batches — the custom STREAMING source extension
  * point, exactly-once by construction (offsets are pure positions in a
  * deterministic sequence; replaying [start,end) regenerates identical
  * rows, like a Kafka offset range).
  *
  * Rate limiting goes through [[streaming.SupportsAdmissionControl]] —
  * the engine hands `latestOffset(start, limit)` the CURRENT start
  * offset, so the cursor is stateless and restart-safe. (A mutable
  * cursor advanced from `lo` in the no-arg `latestOffset` regresses the
  * offset log after a checkpoint restart — the engine polls it BEFORE
  * replaying committed offsets — and the following batch re-plans
  * already-committed ids: duplicate rows, caught by
  * PairGenSourceSpec's stop/start test.)
  */
private[sources] class PairGenMicroBatchStream(
    lo: Long, hi: Long, slices: Int, batchRows: Long, required: StructType)
    extends streaming.MicroBatchStream
    with streaming.SupportsAdmissionControl
    with streaming.SupportsTriggerAvailableNow
    with streaming.ReportsSourceMetrics {
  private val step = math.max(1L, batchRows)

  /** SOURCE METRICS (`ReportsSourceMetrics`): per-progress-event
    * source-side gauges, the face Kafka uses to surface consumer lag.
    * The generator's lag analogue: ids remaining behind the latest
    * committed offset. Surfaces in every progress event's
    * `sources[].metrics` (spec-asserted through the live query).
    */
  override def metrics(latestConsumed: java.util.Optional[
      streaming.Offset]): util.Map[String, String] = {
    // after a checkpoint restart the engine hands the RAW serialized
    // offset, not this source's class — parse either form
    val consumed =
      if (latestConsumed.isPresent) latestConsumed.get() match {
        case p: PairGenOffset => p.pos
        case o                => o.json().toLong
      }
      else lo
    val m = new util.HashMap[String, String]()
    m.put("idsBehindLatest",
      java.lang.Long.toString(math.max(0L, hi - consumed)))
    m.put("rangeEnd", java.lang.Long.toString(hi))
    m
  }

  /** `Trigger.AvailableNow` (backfill-and-stop): the engine asks the
    * source to PIN what "all available" means at query start, drains
    * to that point respecting the admission-control batch cap, and
    * stops on its own. A bounded generator's target is always `hi`,
    * which `latestOffset` already caps at and `reportLatestOffset`
    * already reports — nothing to snapshot — so the trait's value
    * here is the CONTRACT: the query drains in ceil(span/step)
    * rate-limited batches and terminates without processAllAvailable
    * (spec-asserted). An unbounded source would snapshot its current
    * end position here.
    */
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def initialOffset(): streaming.Offset = PairGenOffset(lo)
  override def latestOffset(): streaming.Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used when SupportsAdmissionControl is implemented")
  override def getDefaultReadLimit: streaming.ReadLimit =
    streaming.ReadLimit.maxRows(step)
  override def latestOffset(
      start: streaming.Offset, limit: streaming.ReadLimit): streaming.Offset = {
    val s = start.asInstanceOf[PairGenOffset].pos
    val cap = limit match {
      case r: streaming.ReadMaxRows => math.max(1L, r.maxRows())
      case _                        => step
    }
    // subtract, don't add: s + cap overflows for extreme batchRows and
    // a wrapped-negative offset would regress the log forever
    PairGenOffset(if (cap >= hi - s) hi else s + cap)
  }
  override def reportLatestOffset(): streaming.Offset = PairGenOffset(hi)
  override def deserializeOffset(json: String): streaming.Offset =
    PairGenOffset(json.toLong)
  override def planInputPartitions(
      start: streaming.Offset, end: streaming.Offset): Array[InputPartition] =
    // within a batch, split exactly like the batch scan does
    PairGenSource.splitRange(start.asInstanceOf[PairGenOffset].pos,
      end.asInstanceOf[PairGenOffset].pos, slices)
  override def createReaderFactory(): PartitionReaderFactory =
    new PairGenReaderFactory(required)
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

/** CONTINUOUS PROCESSING (d28, `Trigger.Continuous` — the epoch-based
  * low-latency mode, Spark's other streaming engine): long-running
  * per-partition reader tasks emit rows as they are produced, the
  * epoch coordinator snapshots per-partition offsets without stopping
  * them, and commits are whole epochs — no microbatch planning on the
  * path. The generator's shape: the id range splits once into
  * per-slice continuous partitions; each reader emits its slice and
  * then idles (a bounded source under an engine built for unbounded
  * ones — the idle loop is where a socket/queue source would block on
  * poll). Offsets are per-partition positions merged into one global
  * offset; restart re-plans from the committed positions.
  */
private[sources] case class PairGenContinuousOffset(positions: Seq[Long])
    extends streaming.Offset {
  override def json(): String = positions.mkString(",")
}
private[sources] case class PairGenPartitionOffset(idx: Int, pos: Long)
    extends streaming.PartitionOffset
private[sources] case class PairGenContinuousPartition(
    idx: Int, start: Long, end: Long) extends InputPartition

private[sources] class PairGenContinuousStream(
    lo: Long, hi: Long, slices: Int, required: StructType)
    extends streaming.ContinuousStream {
  private val n = math.max(1, slices)
  // ONE splitting rule for batch, microbatch AND continuous: the
  // checkpointed per-slice positions are reinterpreted against these
  // bounds on restart, so a drifted copy would replay or skip ids
  private def sliceBounds: Seq[(Long, Long)] =
    PairGenSource.splitRange(lo, hi, n).toSeq
      .map { case PairGenPartition(s, e, _) => (s, e) }
  override def initialOffset(): streaming.Offset =
    PairGenContinuousOffset(sliceBounds.map(_._1))
  override def deserializeOffset(json: String): streaming.Offset =
    PairGenContinuousOffset(
      json.split(',').toSeq.filter(_.nonEmpty).map(_.toLong))
  override def mergeOffsets(
      offsets: Array[streaming.PartitionOffset]): streaming.Offset =
    PairGenContinuousOffset(offsets
      .map(_.asInstanceOf[PairGenPartitionOffset])
      .sortBy(_.idx).map(_.pos).toSeq)
  override def planInputPartitions(
      start: streaming.Offset): Array[InputPartition] = {
    val pos = start.asInstanceOf[PairGenContinuousOffset].positions
    sliceBounds.zipWithIndex.map { case ((s, e), i) =>
      PairGenContinuousPartition(i,
        if (i < pos.length) math.max(s, pos(i)) else s, e): InputPartition
    }.toArray
  }
  override def createContinuousReaderFactory()
      : streaming.ContinuousPartitionReaderFactory =
    new PairGenContinuousReaderFactory(required)
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class PairGenContinuousReaderFactory(
    required: StructType)
    extends streaming.ContinuousPartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : streaming.ContinuousPartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PairGenContinuousPartition]
    new streaming.ContinuousPartitionReader[InternalRow] {
      private var cur = p.start - 1
      private val md = java.security.MessageDigest.getInstance("MD5")
      private val gens: Array[Long => Any] = required.fields.map { f =>
        f.name match {
          case "id" => (v: Long) => v: Any
          case "value" => (v: Long) =>
            UTF8String.fromBytes(PairGenSource.md5HexBytes(md, v)): Any
          case other => throw new IllegalStateException(
            s"pairgen continuous: unsupported column $other")
        }
      }
      override def next(): Boolean = {
        cur += 1
        // bounded range drained: idle like an unbounded source blocked
        // on poll — the engine interrupts this task on stop/epoch
        // reconfiguration
        while (cur >= p.end) {
          try Thread.sleep(50)
          catch { case _: InterruptedException => return false }
        }
        true
      }
      override def get(): InternalRow = {
        val vals = new Array[Any](gens.length)
        var i = 0
        while (i < gens.length) { vals(i) = gens(i)(cur); i += 1 }
        InternalRow.fromSeq(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }
      override def getOffset(): streaming.PartitionOffset =
        PairGenPartitionOffset(p.idx, math.min(cur + 1, p.end))
      override def close(): Unit = ()
    }
  }
}

private[sources] class PairGenReaderFactory(required: StructType,
    sample: Option[(Double, Double, Long)] = None)
    extends PartitionReaderFactory {
  /** Seeded splitmix64 → fraction in [0, 1): the deterministic
    * per-id sampling hash (same seed ⇒ same subset, repeatable).
    */
  private def sampleFrac(v: Long, seed: Long): Double = {
    var z = v + seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble
  }
  /** COLUMNAR READS (a44, the vectorized-source face every columnar
    * format reader implements — `PartitionReaderFactory
    * .supportColumnarReads` + a `ColumnarBatch` reader): plain
    * ascending id/value partitions AND (round 12) the key-grouped
    * bucket partitions emit 4096-row batches into on-heap column
    * vectors, and Spark plans the scan columnar (a `ColumnarToRow`
    * feeds whole-stage codegen, exactly like the parquet vectorized
    * reader). A bucket batch strides through its id residue class
    * with a constant `grp` vector, so a34/a39's exchange-free
    * storage-partitioned joins get vectorized scans too — COLUMNAR
    * and ZERO exchanges in one plan (spec-asserted), the Iceberg
    * bucketed-parquet read shape. Declined for sampled scans,
    * variant/struct output and descending partitions — those keep
    * the row reader (Spark requires all-or-nothing per scan, and the
    * guard keys on the partition + projection shape both paths
    * share). Values are generated by the SAME md5 kernel as the row
    * path, so the two paths are bit-identical by construction.
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    (partition.isInstanceOf[PairGenPartition] ||
      partition.isInstanceOf[PairGenBucketPartition]) && sample.isEmpty &&
      required.fields.forall(f =>
        f.name == "id" || f.name == "value" || f.name == "grp")

  /** First id of a bucket partition's residue class — ONE rule shared
    * by the row and columnar readers (a drifted copy would silently
    * split their contents).
    */
  private def bucketFirst(b: PairGenBucketPartition): Long =
    b.lo + (((b.bucket - b.lo % b.buckets) + b.buckets) % b.buckets)

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    // (first, bound, stride, grp): contiguous for plain partitions, a
    // mod-class stride with constant grp for bucketed ones. A plain
    // partition's grp is 0 — bit-identical with the row reader's
    // `v % max(1, nBuckets)` under nBuckets = 0 (unreachable while
    // bucketed tables only plan bucket partitions, but the two paths
    // must never be allowed to diverge silently)
    val (first, bound, stride, grpVal) = partition match {
      case p: PairGenPartition => (p.start, p.end, 1L, 0L)
      case b: PairGenBucketPartition =>
        (bucketFirst(b), b.hi, b.buckets.toLong, b.bucket.toLong)
    }
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var cur = first
      private val cap = 4096
      private val md = java.security.MessageDigest.getInstance("MD5")
      private var batch: org.apache.spark.sql.vectorized.ColumnarBatch =
        null
      override def next(): Boolean = {
        if (batch != null) { batch.close(); batch = null }
        if (cur >= bound) return false
        // ids remaining in this partition's (strided) sequence
        val left = (bound - 1 - cur) / stride + 1
        val n = math.min(cap.toLong, left).toInt
        val cols = required.fields.map { f =>
          val v = new org.apache.spark.sql.execution.vectorized
            .OnHeapColumnVector(n, f.dataType)
          f.name match {
            case "id" =>
              var i = 0
              while (i < n) { v.putLong(i, cur + i * stride); i += 1 }
            case "value" =>
              var i = 0
              while (i < n) {
                v.putByteArray(i,
                  PairGenSource.md5HexBytes(md, cur + i * stride)); i += 1
              }
            case "grp" =>
              var i = 0
              while (i < n) { v.putLong(i, grpVal); i += 1 }
            case other => throw new IllegalStateException(
              s"pairgen columnar: unsupported column $other")
          }
          v: org.apache.spark.sql.vectorized.ColumnVector
        }
        batch = new org.apache.spark.sql.vectorized.ColumnarBatch(cols, n)
        cur += n.toLong * stride
        true
      }
      override def get()
          : org.apache.spark.sql.vectorized.ColumnarBatch = batch
      override def close(): Unit =
        if (batch != null) { batch.close(); batch = null }
    }
  }

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    // (first, bound, stride): contiguous range for plain partitions; a
    // mod-class stride for bucketed ones; negative stride for the
    // descending top-N partition. Same generator either way.
    val (first, bound, stride, nBuckets) = partition match {
      case p: PairGenPartition => (p.start, p.end, 1L, 0)
      case d: PairGenDescPartition => (d.end - 1, d.start, -1L, 0)
      case b: PairGenBucketPartition =>
        (bucketFirst(b), b.hi, b.buckets.toLong, b.buckets)
    }
    // a45: the `_split_id` metadata value this partition serves —
    // range-split ordinal, bucket residue, or 0 for the single
    // fully-pushed top-N partition
    val splitId: Long = partition match {
      case p: PairGenPartition       => p.splitId.toLong
      case _: PairGenDescPartition   => 0L
      case b: PairGenBucketPartition => b.bucket.toLong
    }
    new PartitionReader[InternalRow] {
      private var cur = first - stride
      private val md = java.security.MessageDigest.getInstance("MD5")
      private def md5Hex(v: Long): UTF8String =
        UTF8String.fromBytes(PairGenSource.md5HexBytes(md, v))
      // column generators resolved ONCE per reader, not per row (the
      // per-row path allocates nothing but the emitted values)
      private def variantPathGen(path: String): Long => Any =
        path match {
          case "$.k" => (v: Long) => java.lang.Long.valueOf(v % 8): Any
          case "$.tag" =>
            (v: Long) => UTF8String.fromString("t" + (v % 3)): Any
          case other => throw new IllegalStateException(
            s"pairgen: unsupported pushed variant path $other")
        }
      private val gens: Array[Long => Any] = required.fields.map { f =>
        f.name match {
          case "id"    => (v: Long) => v: Any
          case "value" => (v: Long) => md5Hex(v): Any
          case "grp"   => (v: Long) => v % math.max(1, nBuckets): Any
          case "_split_id" =>
            val s = java.lang.Long.valueOf(splitId)
            (_: Long) => s: Any
          case "meta" => f.dataType match {
            case st: org.apache.spark.sql.types.StructType =>
              // extraction-pushed shape: a struct of typed fields,
              // each tagged with its variant path — generated
              // closed-form, the variant binary never exists
              val fieldGens = st.fields.map(sf => variantPathGen(
                org.apache.spark.sql.execution.datasources
                  .VariantMetadata.fromMetadata(sf.metadata).path))
              (v: Long) => InternalRow.fromSeq(
                scala.collection.immutable.ArraySeq
                  .unsafeWrapArray(fieldGens.map(_(v)))): Any
            case _ =>
              // full variant value: build the real binary
              (v: Long) => {
                val j = "{\"k\":" + (v % 8) + ",\"tag\":\"t" +
                  (v % 3) + "\"}"
                val parsed = org.apache.spark.types.variant
                  .VariantBuilder.parseJson(j, false)
                new org.apache.spark.unsafe.types.VariantVal(
                  parsed.getValue, parsed.getMetadata): Any
              }
          }
        }
      }
      override def next(): Boolean = {
        cur += stride
        while (if (stride > 0) cur < bound else cur >= bound) {
          val keep = sample.forall { case (lb, ub, seed) =>
            val f = sampleFrac(cur, seed); f >= lb && f < ub
          }
          if (keep) return true
          cur += stride
        }
        false
      }
      override def get(): InternalRow = {
        val vals = new Array[Any](gens.length)
        var i = 0
        while (i < gens.length) { vals(i) = gens(i)(cur); i += 1 }
        InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }
      override def close(): Unit = ()
    }
  }
}
