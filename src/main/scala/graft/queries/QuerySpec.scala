package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle statement
  * over the same parquet tables. Column names must match exactly — the
  * driver sorts columns by name before hashing. */
final case class QuerySpec(name: String,
                           fn: (SparkSession, String) => DataFrame,
                           oracle: Option[String])
