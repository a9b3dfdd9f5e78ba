package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** ADDITIVE schema evolution for the merge stores (the Delta model, cut
  * to its safe core): a batch may introduce NEW columns — existing rows
  * read them as NULL — and may OMIT stored columns — updated rows RETAIN
  * the stored value (`updateAll` semantics: target-only columns are
  * untouched), fresh rows get a typed NULL. What is NEVER silent: a
  * column present on both sides with a different type fails loudly —
  * coercion at merge time is how type drift corrupts a 100 TB table.
  *
  * Columns keep a stable order: stored layout first, new batch columns
  * appended — so readers see a append-only evolution of the header, and
  * mixed-epoch version dirs union by name with NULL back-fill.
  */
object SchemaEvolution {

  /** Nullability-insensitive type shape: parquet round-trips and encoder
    * choices flip containsNull/nullable freely — only the VALUE type is a
    * conflict. */
  private def normalized(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(normalized(e), containsNull = true)
    case MapType(k, v, _) =>
      MapType(normalized(k), normalized(v), valueContainsNull = true)
    case StructType(fs) => StructType(fs.map(f =>
      f.copy(dataType = normalized(f.dataType), nullable = true)))
    case other => other
  }

  /** Loud type-conflict gate: every column shared by `batch` and
    * `stored` must carry the identical data type (modulo nullability). */
  def requireCompatible(table: String, batch: DataFrame, stored: DataFrame): Unit = {
    val cur = stored.schema.map(f => f.name -> f.dataType).toMap
    batch.schema.foreach { f =>
      cur.get(f.name).foreach { t =>
        require(normalized(t) == normalized(f.dataType),
          s"schema evolution on '$table' is ADDITIVE only: column '${f.name}' " +
            s"is ${t.catalogString} in the table but ${f.dataType.catalogString} " +
            "in the batch — cast the batch explicitly (silent merge-time " +
            "coercion is how type drift corrupts a table)")
      }
    }
  }

  /** `fields` that `df` is missing, as typed NULL columns appended — the
    * union-schema pad for whichever side lacks a column. */
  def padMissing(df: DataFrame, fields: Seq[StructField]): DataFrame =
    fields.filterNot(f => df.columns.contains(f.name))
      .foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))

  /** The evolved attribute layout: stored attribute fields in their
    * existing order, then batch-only fields appended. */
  def unionAttrs(storedAttrs: Seq[StructField],
                 batchAttrs: Seq[StructField]): Seq[StructField] = {
    val have = storedAttrs.map(_.name).toSet
    storedAttrs ++ batchAttrs.filterNot(f => have.contains(f.name))
  }
}
