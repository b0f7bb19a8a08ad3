package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DoubleType, StructType}

/** Great-circle distance as a CONNECTOR-API function
  * (`UnboundFunction`/`ScalarFunction`) — the function-class shape a
  * V2 `FunctionCatalog` serves by name, letting a shared-metastore
  * attach resolve `snap.db.hav_km(...)` with zero session
  * registration (the metastore's permanent-function semantics,
  * rendered on the V2 surface; `meta_v2_function`).
  *
  * Executes via the magic `invoke` method, which Spark binds with
  * codegen (`StaticInvoke`-style, no boxing in the hot loop);
  * `produceResult` is the specified interpreted fallback. Semantics
  * mirror `fn_geo_haversine`'s built-in-composed pipeline, so the
  * same DuckDB formula oracles both.
  */
class HaversineKm extends UnboundFunction {
  override def name(): String = "hav_km"
  override def description(): String =
    "hav_km(lat1, lon1, lat2, lon2) -> great-circle distance in km"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 4 &&
        inputType.fields.forall(_.dataType == DoubleType),
      s"hav_km expects (DOUBLE, DOUBLE, DOUBLE, DOUBLE), got " +
        inputType.simpleString)
    new HaversineKmBound
  }
}

class HaversineKmBound extends ScalarFunction[java.lang.Double] {
  override def inputTypes(): Array[DataType] =
    Array(DoubleType, DoubleType, DoubleType, DoubleType)
  override def resultType(): DataType = DoubleType
  override def name(): String = "hav_km"
  override def canonicalName(): String = "graft.hav_km"
  override def isDeterministic: Boolean = true

  /** Magic method — codegen path. */
  def invoke(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    val dlat = math.toRadians(lat1 - lat2)
    val dlon = math.toRadians(lon1 - lon2)
    val a = math.pow(math.sin(dlat / 2), 2) +
      math.cos(math.toRadians(lat2)) * math.cos(math.toRadians(lat1)) *
        math.pow(math.sin(dlon / 2), 2)
    2.0 * 6371.0 * math.asin(math.sqrt(a))
  }

  override def produceResult(input: InternalRow): java.lang.Double =
    invoke(input.getDouble(0), input.getDouble(1),
      input.getDouble(2), input.getDouble(3))
}
