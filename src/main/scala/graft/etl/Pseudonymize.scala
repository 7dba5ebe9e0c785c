package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic key pseudonymization for privacy-preserving
  * analytics: replace natural keys with salted SHA-256 tokens so
  * datasets can leave the trust boundary (training corpora, vendor
  * shares, debug extracts) while every join and aggregate still works —
  * the same (salt, key) pair maps to the same token on every engine,
  * every partition, every run, and nothing short of the salt inverts
  * it. The standard keyed-hash tokenization pattern (NIST de-identification
  * guidance; public technique).
  *
  * Contract: token = lowercase hex `sha256(salt || ':' || key)` of the
  * key's canonical string form. Keys render via Spark/ANSI `CAST(key AS
  * STRING)` — for BIGINT/INT/STRING keys every engine agrees on the
  * rendering (the only types we tokenize); null keys stay null rather
  * than all colliding on `sha256(salt || ':')`.
  *
  * Scale shape: tokenization is a narrow per-row projection (codegen'd
  * sha2 — no shuffle, no UDF); referential integrity is free because
  * equal inputs hash equal, so downstream joins shuffle on the token
  * exactly as they would on the key — same cardinality, same skew
  * profile, same broadcast decisions.
  */
object Pseudonymize {

  /** Salted token column for one key column (null-preserving). */
  def token(key: Column, salt: String): Column =
    when(key.isNull, lit(null).cast("string"))
      .otherwise(sha2(concat(lit(salt), lit(":"), key.cast("string")), 256))

  /** Replace each named key column with its salted token in place
    * (same column name, string type) — apply to every table sharing
    * the key before export and cross-table joins keep working. */
  def tokenize(df: DataFrame, salt: String, keyCols: String*): DataFrame = {
    require(keyCols.nonEmpty, "tokenize requires at least one key column")
    keyCols.foldLeft(df)((d, c) => d.withColumn(c, token(col(c), salt)))
  }
}
