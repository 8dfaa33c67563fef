package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.{HttpFeedJson, HttpTransport, PagedFeed}

/** End-to-end HTTP transport test against an in-process JDK HttpServer
  * speaking the reference envelope ({"items": [...], "total": N}) with
  * updated_after / limit / offset semantics — the same contract as
  * `services/mock_wms_api/app/main.py:221-241`.
  */
class HttpFeedSpec extends SparkSpec {

  private val schema = StructType.fromDDL(
    "id STRING, updated_at TIMESTAMP, qty INT, price DOUBLE, active BOOLEAN")

  // 1,230 rows, one per minute from the epoch anchor; ids zero-padded so
  // string order == time order
  private val anchor = Instant.parse("2024-03-01T00:00:00Z")
  private case class Rec(id: String, updatedAt: Instant, qty: Int, price: Double,
                         active: Boolean)
  private val data = (0 until 1230).map { i =>
    Rec(f"id-$i%05d", anchor.plusSeconds(60L * i), i % 7, i * 0.25, i % 2 == 0)
  }

  private def pageJson(cursor: Option[Instant], limit: Int, offset: Int): String = {
    val filtered = cursor.fold(data)(c => data.filter(_.updatedAt.isAfter(c)))
    val page = filtered.slice(offset, offset + limit)
    val items = page.map { r =>
      s"""{"id":"${r.id}","updated_at":"${r.updatedAt}","qty":${r.qty},""" +
        s""""price":${r.price},"active":${r.active}}"""
    }.mkString(",")
    s"""{"items":[$items],"total":${filtered.size}}"""
  }

  private def query(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&")).map(_.split("=", 2))
      .collectFirst { case Array(k, v) if k == name => v }

  private def withServer(failFirst: Int = 0)(body: (String, AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new AtomicInteger(0)
    server.createContext("/feed", (ex: HttpExchange) => {
      val n = hits.incrementAndGet()
      if (n <= failFirst) { // transient failure: transport must classify + retry
        ex.sendResponseHeaders(503, -1)
        ex.close()
      } else {
        val cursor = query(ex, "updated_after").map(Instant.parse)
        val limit = query(ex, "limit").map(_.toInt).getOrElse(100)
        val offset = query(ex, "offset").map(_.toInt).getOrElse(0)
        val bytes = pageJson(cursor, limit, offset).getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/feed", hits)
    finally server.stop(0)
  }

  test("full read over HTTP: all rows, typed columns, parallel page ranges") {
    withServer() { (url, hits) =>
      val df = spark.read.format("graft-feed")
        .option("url", url)
        .option("schema_ddl", schema.toDDL)
        .option("pagesize", 100)
        .option("pages_per_partition", 2)
        .load()
      assert(df.rdd.getNumPartitions === 7) // ceil(1230 / 200) page-range splits
      assert(df.count() === 1230)
      val row = df.filter(col("id") === "id-00004")
        .select("qty", "price", "active").head()
      assert(row.getInt(0) === 4 && row.getDouble(1) === 1.0 && row.getBoolean(2))
      assert(df.agg(max("updated_at")).head().getTimestamp(0).toInstant ===
        anchor.plusSeconds(60L * 1229))
      assert(hits.get() > 7, "expected envelope probe + per-partition page fetches")
    }
  }

  test("cursor pushdown reaches the HTTP query string and shrinks the scan") {
    withServer() { (url, _) =>
      val cutoff = anchor.plusSeconds(60L * 1200) // leaves 29 later rows
      val df = spark.read.format("graft-feed")
        .option("url", url).option("schema_ddl", schema.toDDL)
        .load()
        .filter(col("updated_at") > lit(java.sql.Timestamp.from(cutoff)))
      assert(df.count() === 29)
      // pushdown proof: with the cursor in the HTTP query the envelope total
      // is 29, so the scan plans a single partition instead of data.size/span
      assert(df.rdd.getNumPartitions === 1)
    }
  }

  test("transient 5xx is retried by the partition reader, then succeeds") {
    withServer(failFirst = 2) { (url, hits) =>
      val page = PagedFeed.withRetry(sleeper = _ => ())(() =>
        HttpTransport(url, schema).fetch(None, 50, 0))
      assert(page.rows.size === 50 && page.totalCount === 1230)
      assert(hits.get() === 3)
    }
  }

  test("JSON decode: nulls for absent fields, error body surfaces non-retryable") {
    val page = HttpFeedJson.parsePage(
      """{"items":[{"id":"x","qty":3},{"id":"y","updated_at":null}],"total":2}""", schema)
    assert(page.rows.head.getAs[String]("id") === "x")
    assert(page.rows.head.getAs[Any]("updated_at") === null)
    assert(page.rows(1).getAs[Any]("qty") === null)
    // 404 must NOT be retried: it raises IllegalStateException immediately
    withServer() { (url, hits) =>
      val bad = url.replace("/feed", "/nope")
      intercept[IllegalStateException] {
        HttpTransport(bad, schema).fetch(None, 1, 0)
      }
      assert(hits.get() === 0)
    }
  }
}
