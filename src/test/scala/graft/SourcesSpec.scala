package graft

import java.nio.file.Files
import graft.sources.{ProductCatalog, ScrapedJson}

class SourcesSpec extends SparkSpecBase {

  test("product catalog CSV: clean rows load, malformed rows are captured not fatal") {
    val dir = Files.createTempDirectory("catalog").toFile
    val f = new java.io.File(dir, "products.csv")
    Files.writeString(f.toPath,
      """sku,name,category,description,price,stock_quantity,image_url,product_url
        |SKU-1,Tedi Robot,toys,A robot,4990.00,12,http://img/1,http://p/1
        |SKU-2,Tenda F3 Router,network,300Mbps,2790.50,7,http://img/2,http://p/2
        |SKU-2,Tenda F3 Router,network,dup row,2790.50,7,http://img/2,http://p/2
        |SKU-3,Bad Price,network,oops,notanumber,x,,
        |""".stripMargin)
    val raw = ProductCatalog.read(spark, f.getAbsolutePath).cache() // corrupt-col-only queries need parsed results materialized
    assert(raw.filter(raw("_corrupt").isNotNull).count() == 1) // bad row kept, flagged
    val clean = ProductCatalog.clean(spark, f.getAbsolutePath)
    assert(clean.count() == 2) // SKU-2 deduped, SKU-3 dropped
    assert(clean.filter(clean("sku") === "SKU-1").select("price").collect()(0).getDouble(0) == 4990.00)
  }

  test("scraped JSON: heterogeneous social payloads normalize to one schema") {
    val dir = Files.createTempDirectory("scraped").toFile
    val fb = new java.io.File(dir, "facebook.json")
    Files.writeString(fb.toPath,
      """{"postId":"fb1","url":"http://fb/1","text":"We launched a product","likes":10,"shares":2,"comments":3}
        |{"postId":"fb2","url":"http://fb/2","text":"Error scraping post details"}
        |{"id":"tt1","webVideoUrl":"http://tt/1","post_text":"tiktok clip","diggCount":99,"shareCount":5,"commentCount":7}
        |""".stripMargin)
    val df = ScrapedJson.read(spark, fb.getAbsolutePath, "facebook")
    val rows = df.collect()
    assert(rows.length == 2) // error-sentinel row dropped
    val byId = rows.map(r => r.getAs[String]("post_id") -> r).toMap
    assert(byId("fb1").getAs[Long]("likes_count") == 10L)
    assert(byId("tt1").getAs[Long]("likes_count") == 99L) // diggCount unified
    assert(rows.forall(_.getAs[String]("source") == "facebook"))
  }
}
