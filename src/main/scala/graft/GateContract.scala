package graft

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Contract every driver-gated query output must satisfy.
  *
  * The driver's oracle harness loads each gate's parquet into pandas and
  * `sort_values` over every column before hashing; a top-level
  * array/map/struct column crashes that sort (r9: `s_mean_pool`,
  * `TypeError: unhashable type: 'numpy.ndarray'`) and the gate silently
  * records `err` instead of a pass/fail. Gates must therefore emit only
  * top-level atomic columns — vector-valued results get posexploded to
  * scalar rows in the gate projection (the `s_pq_codebooks` shape), never
  * returned raw.
  */
object GateContract {

  private def isNested(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  /** Names of output columns the driver harness cannot sort/hash. */
  def nonAtomicColumns(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if isNested(f.dataType) => s"${f.name}: ${f.dataType.simpleString}"
    }

  /** Throws with a pointed message if `schema` would crash the harness. */
  def assertGateable(name: String, schema: StructType): Unit = {
    val bad = nonAtomicColumns(schema)
    require(
      bad.isEmpty,
      s"gate '$name' emits non-atomic column(s) [${bad.mkString(", ")}] — " +
        "the driver harness cannot sort/hash nested types; posexplode to " +
        "scalar rows in the gate projection (see s_pq_codebooks / s_mean_pool)")
  }
}
