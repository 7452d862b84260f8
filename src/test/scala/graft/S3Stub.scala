package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** In-process HTTP server speaking the minimal S3 REST subset
  * [[graft.sources.S3HttpFileSystem]] consumes — ListObjectsV2 with
  * real `max-keys` pagination and continuation tokens, GetObject with
  * Range, HeadObject — plus a throttle injector (`arm503(n)`: the
  * next n requests answer 503 SlowDown, the way S3 actually
  * backpressures). Objects live in a sorted in-memory map; keys list
  * in lexicographic order exactly like S3. Test scaffolding for the
  * wire-protocol path; the CLIENT under test is main-source.
  */
final class S3Stub(bucket: String, pageSize: Int = 1000) {
  private val objects = new java.util.TreeMap[String, Array[Byte]]()
  private val throttleLeft = new AtomicInteger(0)
  val requests = new AtomicInteger(0)
  val listRequests = new AtomicInteger(0)

  def put(key: String, bytes: Array[Byte]): Unit =
    objects.synchronized { objects.put(key, bytes): Unit }

  def arm503(n: Int): Unit = throttleLeft.set(n)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", new HttpHandler {
    override def handle(x: HttpExchange): Unit = try route(x) finally x.close()
  })
  server.start()
  def port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)

  private def send(x: HttpExchange, status: Int, body: Array[Byte],
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => x.getResponseHeaders.set(k, v) }
    if (x.getRequestMethod == "HEAD") {
      // HEAD: headers only; HttpServer requires -1 body length but
      // the client reads Content-Length from our explicit header
      x.getResponseHeaders.set("Content-Length", body.length.toString)
      x.sendResponseHeaders(status, -1)
    } else {
      x.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length.toLong)
      if (body.nonEmpty) x.getResponseBody.write(body)
    }
  }

  private def xmlEsc(s: String): String = s.replace("&", "&amp;")
    .replace("<", "&lt;").replace(">", "&gt;")

  private def route(x: HttpExchange): Unit = {
    requests.incrementAndGet()
    if (throttleLeft.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      send(x, 503, ("<?xml version=\"1.0\"?><Error><Code>SlowDown</Code>" +
        "<Message>Please reduce your request rate.</Message></Error>")
        .getBytes(StandardCharsets.UTF_8))
      return
    }
    val path = x.getRequestURI.getPath
    val query = Option(x.getRequestURI.getRawQuery).getOrElse("")
    val params = query.split("&").filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      if (i < 0) kv -> ""
      else URLDecoder.decode(kv.take(i), "UTF-8") ->
        URLDecoder.decode(kv.drop(i + 1), "UTF-8")
    }.toMap
    if (path != s"/$bucket" && !path.startsWith(s"/$bucket/")) {
      send(x, 404, "<Error><Code>NoSuchBucket</Code></Error>".getBytes)
      return
    }
    if (path == s"/$bucket") {
      if (params.get("list-type").contains("2")) listV2(x, params)
      else send(x, 400, "<Error><Code>InvalidRequest</Code></Error>".getBytes)
      return
    }
    val key = path.stripPrefix(s"/$bucket/")
    val bytes = objects.synchronized(objects.get(key))
    if (bytes == null) {
      send(x, 404, "<Error><Code>NoSuchKey</Code></Error>".getBytes)
      return
    }
    val range = Option(x.getRequestHeaders.getFirst("Range"))
    range match {
      case Some(r) if r.startsWith("bytes=") =>
        val spec = r.stripPrefix("bytes=")
        val dash = spec.indexOf('-')
        val from = spec.take(dash).toLong
        val to = if (dash == spec.length - 1) bytes.length - 1L
                 else spec.drop(dash + 1).toLong.min(bytes.length - 1L)
        val slice = java.util.Arrays.copyOfRange(bytes, from.toInt, to.toInt + 1)
        send(x, 206, slice, Map(
          "Content-Range" -> s"bytes $from-$to/${bytes.length}",
          "Last-Modified" -> "Mon, 01 Jan 2024 00:00:00 GMT"))
      case _ =>
        send(x, 200, bytes,
          Map("Last-Modified" -> "Mon, 01 Jan 2024 00:00:00 GMT"))
    }
  }

  private def listV2(x: HttpExchange, params: Map[String, String]): Unit = {
    listRequests.incrementAndGet()
    val prefix = params.getOrElse("prefix", "")
    val delimiter = params.get("delimiter").filter(_.nonEmpty)
    val maxKeys = params.get("max-keys").map(_.toInt).getOrElse(pageSize)
      .min(pageSize)
    val startAfter = params.getOrElse("continuation-token", "")
    val all = objects.synchronized {
      import scala.jdk.CollectionConverters._
      objects.entrySet().asScala.toVector
        .map(e => (e.getKey, e.getValue.length))
    }
    val matching = all.filter(_._1.startsWith(prefix))
      .filter(_._1 > startAfter)
    // roll keys up at the delimiter into CommonPrefixes, S3 semantics
    val rolled: Vector[Either[String, (String, Int)]] = matching.map {
      case (k, sz) =>
        delimiter.flatMap { d =>
          val rest = k.drop(prefix.length)
          val i = rest.indexOf(d)
          if (i >= 0) Some(prefix + rest.take(i + d.length)) else None
        } match {
          case Some(cp) => Left(cp)
          case None => Right((k, sz))
        }
    }.distinct
    val page = rolled.take(maxKeys)
    val truncated = rolled.length > maxKeys
    // the token is the LAST KEY COVERED by this page (opaque to the
    // client; a common-prefix entry covers every key under it)
    val nextToken =
      if (!truncated) None
      else Some(page.last match {
        case Left(cp) => cp + "￿"
        case Right((k, _)) => k
      })
    val sb = new StringBuilder(
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<ListBucketResult>")
    sb.append(s"<IsTruncated>$truncated</IsTruncated>")
    nextToken.foreach(t =>
      sb.append(s"<NextContinuationToken>${xmlEsc(t)}</NextContinuationToken>"))
    page.foreach {
      case Right((k, sz)) => sb.append(
        s"<Contents><Key>${xmlEsc(k)}</Key><Size>$sz</Size>" +
          "<LastModified>2024-01-01T00:00:00.000Z</LastModified></Contents>")
      case Left(cp) => sb.append(
        s"<CommonPrefixes><Prefix>${xmlEsc(cp)}</Prefix></CommonPrefixes>")
    }
    sb.append("</ListBucketResult>")
    send(x, 200, sb.toString.getBytes(StandardCharsets.UTF_8))
  }
}
