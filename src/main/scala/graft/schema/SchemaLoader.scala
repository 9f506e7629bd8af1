package graft.schema

import org.apache.spark.sql.types.{DataType, StructType}
import java.nio.file.{Files, Paths}

/** Externally-declared schema loader: parses the reference's JSON schema-file
  * format (`{"type":"struct","fields":[{name,type,nullable,metadata},...]}` —
  * reference: listings/mls_listings_schema.json:1-8, consumed via
  * `get_schema` at mls_listings_curated.py:96-103) into a Spark `StructType`.
  * Spark's own `DataType.fromJson` understands that format natively, so this
  * is a thin, total wrapper with a clear error surface.
  */
object SchemaLoader {

  /** Parse a schema from its JSON text. */
  def fromJsonString(json: String): StructType =
    DataType.fromJson(json) match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"schema JSON did not describe a struct: ${other.typeName}")
    }

  /** Load and parse a schema JSON file. */
  def fromFile(path: String): StructType =
    fromJsonString(Files.readString(Paths.get(path)))
}
