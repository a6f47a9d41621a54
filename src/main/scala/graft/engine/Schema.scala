package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** The reference's ObjectSchema, Spark-shaped (SURVEY §1.1): a named,
  * versioned StructType plus the `uniqueOn` key that drives dedupe /
  * as-dataset semantics, and "implements" mappings for structural subtyping
  * between schemas.
  */
final case class GraftSchema(
    name: String,
    version: Int,
    uniqueOn: Seq[String],
    struct: StructType,
    /** target-schema name -> (sourceCol, targetCol, targetType) mapping */
    implementsMaps: Map[String, Seq[(String, String, String)]] = Map.empty) {

  /** Conform a frame to this schema: project to declared fields, casting
    * where physical types differ. Throws if a declared field is absent. */
  def conform(df: DataFrame): DataFrame = {
    val missing = struct.fieldNames.filterNot(df.columns.contains)
    require(missing.isEmpty, s"schema $name v$version: missing ${missing.mkString(", ")}")
    df.select(struct.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  /** The reference's DataSet view driven by this schema's `uniqueOn` key:
    * accumulate the blocks, keep the newest row per key (newest by the
    * given recency ordering). */
  def latestView(blocks: Seq[DataFrame],
      newestFirst: Seq[org.apache.spark.sql.Column]): DataFrame =
    graft.operators.Incremental.asDataset(blocks, uniqueOn, newestFirst)

  /** Cast a conforming frame onto an implemented target schema. */
  def castTo(target: String, df: DataFrame): DataFrame = {
    val mapping = implementsMaps.getOrElse(target,
      throw new IllegalArgumentException(s"$name does not implement $target"))
    graft.operators.Incremental.schemaCast(df, mapping)
  }
}
