package graft.types

import org.apache.spark.sql.types._

/** Column classification into numeric / date / text buckets.
  *
  * Replaces the reference's warehouse-type-string substring matching
  * (reference: sparvi/db/adapters.py:146-183) with exact Catalyst
  * DataType pattern matches. Columns in no bucket (boolean, binary,
  * array, map, struct) are profiled for completeness and frequency
  * only, matching the reference behavior for unrecognized types.
  */
object ColumnBuckets {

  def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true // Byte..Double, Decimal
    case _              => false
  }

  def isDate(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _                                           => false
  }

  def isText(dt: DataType): Boolean = dt match {
    case _: StringType => true // includes CharType/VarcharType pre-erasure
    case _ => false
  }

  /** Nested (multimodal north-star) types: arrays, maps, structs. */
  def isNested(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  final case class Buckets(
      all: Seq[String],
      numeric: Seq[String],
      date: Seq[String],
      text: Seq[String],
      nested: Seq[String])

  def of(schema: StructType): Buckets = Buckets(
    all = schema.fields.map(_.name).toSeq,
    numeric = schema.fields.filter(f => isNumeric(f.dataType)).map(_.name).toSeq,
    date = schema.fields.filter(f => isDate(f.dataType)).map(_.name).toSeq,
    text = schema.fields.filter(f => isText(f.dataType)).map(_.name).toSeq,
    nested = schema.fields.filter(f => isNested(f.dataType)).map(_.name).toSeq)
}
