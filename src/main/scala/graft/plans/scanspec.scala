package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, col}

/** Declarative scan specification — the reference's EntitySpec/DataSpec analog.
  *
  * The reference compiles XML-configured entity specs into SQL at runtime:
  * `EntitySpec` names a key column, start/finish time columns, property
  * columns and FK link chains, and the backend assembles the SELECT/JOIN/WHERE
  * text from them (reference src/main/java/edu/emory/cci/aiw/i2b2etl/dsb/
  * I2B2DataSourceBackend.java:99-347 builds EntitySpecs whose ColumnSpec link
  * chains become joins; dest/config/Settings.java:35-63 and
  * dest/config/DataSpec.java:32-51 are the destination-side equivalents).
  *
  * Spark-first re-expression: the spec compiles to `Column` expressions and
  * `DataFrame` joins — Catalyst then does what the reference's hand-assembled
  * SQL relied on the RDBMS for (pushdown, pruning, join strategy). The
  * compiler adds NOTHING the hand-written query wouldn't: PlanSpec proves the
  * compiled plan is `sameResult` as the equivalent hand-written chain, so the
  * declarative layer costs zero plan quality.
  *
  * 100-TB shape: `LinkSpec.broadcastDim` marks genuinely small dimensions for
  * an explicit broadcast (the reference's code-mapping TSVs and metadata
  * tables are exactly such dims); fact↔fact links stay shuffle joins keyed on
  * the FK, which is the right default at scale.
  */
final case class LinkSpec(
    table: String,
    fkCol: String,
    pkCol: String,
    how: String = "inner",
    broadcastDim: Boolean = false)

/** A derived output column: `name` ← `expr` over the joined scan. */
final case class PropertySpec(name: String, expr: Column)

/** @param baseTable    fact/base table name (resolved by the loader)
  * @param keyCol       entity key column (reference EntitySpec `uniqueNumericIndex`
  *                     / baseSpec key)
  * @param startTimeCol optional event-time column (EntitySpec start time)
  * @param links        FK chains to dimension/parent tables, applied in order
  * @param constraints  row filters (EntitySpec constraint lists)
  * @param properties   output projection; EMPTY means "no projection" — hand
  *                     queries that aggregate directly over the join leave
  *                     pruning to Catalyst, and the compiler must match them
  */
final case class ScanSpec(
    baseTable: String,
    keyCol: String,
    startTimeCol: Option[String] = None,
    links: Seq[LinkSpec] = Nil,
    constraints: Seq[Column] = Nil,
    properties: Seq[PropertySpec] = Nil)

object ScanSpec {

  /** Compile a spec against a table loader (name → DataFrame). The loader
    * indirection keeps the module source-agnostic: parquet dirs in tests,
    * LakeTable state or catalog tables in production. */
  def compile(load: String => DataFrame, spec: ScanSpec): DataFrame = {
    val base = load(spec.baseTable)
    val joined = spec.links.foldLeft(base) { (df, l) =>
      val dim = if (l.broadcastDim) broadcast(load(l.table)) else load(l.table)
      df.join(dim, col(l.fkCol) === col(l.pkCol), l.how)
    }
    val filtered = spec.constraints.foldLeft(joined)(_.filter(_))
    if (spec.properties.isEmpty) filtered
    else {
      val keyAndTime = (spec.keyCol +: spec.startTimeCol.toSeq)
        .filterNot(c => spec.properties.exists(_.name == c)).map(col)
      filtered.select(keyAndTime ++ spec.properties.map(p => p.expr.as(p.name)): _*)
    }
  }
}
