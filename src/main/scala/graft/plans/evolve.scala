package graft.plans

import org.apache.spark.sql.types._

/** Mid-stream schema evolution: column add + integral/floating widen.
  *
  * The reference handles schema change only via offline Liquibase migrations
  * (reference src/main/resources/dbmigration/i2b2-data-schema-changelog.xml); doing it
  * live per-microbatch is north-rule-new work. Policy mirrors Iceberg's safe subset:
  * new columns append as nullable, numeric types may widen (never narrow), anything
  * else is a hard error surfaced to the stream.
  */
object SchemaEvolution {

  private val integralRank: Map[DataType, Int] =
    Map(ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
  private val floatingRank: Map[DataType, Int] =
    Map(FloatType -> 1, DoubleType -> 2)

  /** The common wider type, if a lossless widening exists. */
  def widen(a: DataType, b: DataType): Option[DataType] =
    if (a == b) Some(a)
    else (integralRank.get(a), integralRank.get(b)) match {
      case (Some(ra), Some(rb)) => Some(if (ra >= rb) a else b)
      case _ => (floatingRank.get(a), floatingRank.get(b)) match {
        case (Some(ra), Some(rb)) => Some(if (ra >= rb) a else b)
        case _ => None
      }
    }

  /** Evolve `target` to accept `incoming`: widen shared columns, append new ones.
    * Returns the evolved schema; `evolve(t, i) == t` means no DDL is needed. */
  def evolve(target: StructType, incoming: StructType): StructType = {
    val incomingByName = incoming.fields.map(f => f.name -> f).toMap
    val widened = target.fields.map { tf =>
      incomingByName.get(tf.name) match {
        case Some(inf) if inf.dataType != tf.dataType =>
          widen(tf.dataType, inf.dataType) match {
            case Some(w) => tf.copy(dataType = w)
            case None => throw new IllegalArgumentException(
              s"incompatible evolution for column '${tf.name}': " +
                s"${tf.dataType.simpleString} vs ${inf.dataType.simpleString}")
          }
        case _ => tf
      }
    }
    val targetNames = target.fieldNames.toSet
    val added = incoming.fields.filterNot(f => targetNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(widened ++ added)
  }
}
