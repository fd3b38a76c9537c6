package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines source for scraped web/social payloads (reference:
  * backend/src/api/services/db_service.py ingest_data — website, facebook,
  * linkedin, tiktok files with per-source field names).
  *
  * Normalizes the heterogeneous payloads to one documents-like schema:
  * text = first non-empty of content|text|post_text|title|description,
  * engagement metrics unified across facebook (likes/shares/comments) and
  * tiktok (diggCount/shareCount/commentCount) shapes.
  */
object ScrapedJson {

  val schema: StructType = StructType(Seq(
    StructField("postId", StringType),
    StructField("id", StringType),
    StructField("url", StringType),
    StructField("content", StringType),
    StructField("text", StringType),
    StructField("post_text", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("likes", LongType),
    StructField("shares", LongType),
    StructField("comments", LongType),
    StructField("diggCount", LongType),
    StructField("shareCount", LongType),
    StructField("commentCount", LongType)))

  def read(spark: SparkSession, path: String, source: String): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(path)
      .withColumn("doc_text",
        coalesce($"content", $"text", $"post_text", $"title", $"description"))
      .filter($"doc_text".isNotNull && $"doc_text" =!= "" &&
        $"doc_text" =!= "Error scraping post details")
      .select(
        coalesce($"postId", $"id", $"url").as("post_id"),
        lit(source).as("source"),
        $"doc_text".as("text"),
        coalesce($"likes", $"diggCount").as("likes_count"),
        coalesce($"shares", $"shareCount").as("shares_count"),
        coalesce($"comments", $"commentCount").as("comments_count"))
  }
}
