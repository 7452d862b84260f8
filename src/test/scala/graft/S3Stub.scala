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
  // write-side protocol state: uploadId -> (key, partNumber -> bytes)
  private val uploads =
    new java.util.concurrent.ConcurrentHashMap[String, (String, java.util.concurrent.ConcurrentSkipListMap[Int, Array[Byte]])]()
  private val uploadSeq = new AtomicInteger(0)
  val putRequests = new AtomicInteger(0)
  val completedUploads = new AtomicInteger(0)
  val abortedUploads = new AtomicInteger(0)

  def put(key: String, bytes: Array[Byte]): Unit =
    objects.synchronized { objects.put(key, bytes): Unit }

  def get(key: String): Option[Array[Byte]] =
    objects.synchronized(Option(objects.get(key)))

  def keys: Seq[String] = objects.synchronized {
    import scala.jdk.CollectionConverters._
    objects.keySet().asScala.toVector
  }

  def pendingUploads: Int = uploads.size()

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
    x.getRequestMethod match {
      case "PUT" => putObject(x, key, params); return
      case "POST" => postUpload(x, key, params); return
      case "DELETE" => deleteObject(x, key, params); return
      case _ => ()
    }
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

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  /** PutObject, UploadPart (partNumber+uploadId), or CopyObject
    * (x-amz-copy-source header) — ETag answered like S3 does. */
  private def putObject(x: HttpExchange, key: String,
      params: Map[String, String]): Unit = {
    val copySource = Option(x.getRequestHeaders.getFirst("x-amz-copy-source"))
    val body = x.getRequestBody.readAllBytes()
    putRequests.incrementAndGet()
    (params.get("uploadId"), params.get("partNumber")) match {
      case (Some(id), Some(pn)) =>
        val up = uploads.get(id)
        if (up == null || up._1 != key) {
          send(x, 404, "<Error><Code>NoSuchUpload</Code></Error>".getBytes)
        } else {
          up._2.put(pn.toInt, body)
          send(x, 200, Array.emptyByteArray,
            Map("ETag" -> ("\"" + md5hex(body) + "\"")))
        }
      case _ =>
        copySource match {
          case Some(src) =>
            val srcKey = URLDecoder.decode(
              src.stripPrefix(s"/$bucket/").stripPrefix(s"$bucket/"), "UTF-8")
            val bytes = objects.synchronized(objects.get(srcKey))
            if (bytes == null)
              send(x, 404, "<Error><Code>NoSuchKey</Code></Error>".getBytes)
            else {
              put(key, bytes)
              send(x, 200, (s"<CopyObjectResult><ETag>&quot;${md5hex(bytes)}" +
                "&quot;</ETag></CopyObjectResult>").getBytes(StandardCharsets.UTF_8))
            }
          case None =>
            put(key, body)
            send(x, 200, Array.emptyByteArray,
              Map("ETag" -> ("\"" + md5hex(body) + "\"")))
        }
    }
  }

  /** CreateMultipartUpload (?uploads) / CompleteMultipartUpload
    * (?uploadId=). Complete concatenates stored parts in part-number
    * order — mirroring S3, the part list XML's order is not trusted. */
  private def postUpload(x: HttpExchange, key: String,
      params: Map[String, String]): Unit = {
    x.getRequestBody.readAllBytes(): Unit // drain
    if (params.contains("uploads")) {
      val id = s"up-${uploadSeq.incrementAndGet()}"
      uploads.put(id,
        (key, new java.util.concurrent.ConcurrentSkipListMap[Int, Array[Byte]]()))
      send(x, 200, (s"<InitiateMultipartUploadResult><Bucket>$bucket</Bucket>" +
        s"<Key>${xmlEsc(key)}</Key><UploadId>$id</UploadId>" +
        "</InitiateMultipartUploadResult>").getBytes(StandardCharsets.UTF_8))
    } else params.get("uploadId") match {
      case Some(id) =>
        val up = uploads.remove(id)
        if (up == null || up._1 != key)
          send(x, 404, "<Error><Code>NoSuchUpload</Code></Error>".getBytes)
        else {
          import scala.jdk.CollectionConverters._
          val whole = new java.io.ByteArrayOutputStream()
          up._2.values().asScala.foreach(whole.write)
          put(key, whole.toByteArray)
          completedUploads.incrementAndGet()
          send(x, 200, (s"<CompleteMultipartUploadResult><Key>${xmlEsc(key)}" +
            s"</Key><ETag>&quot;${md5hex(whole.toByteArray)}&quot;</ETag>" +
            "</CompleteMultipartUploadResult>").getBytes(StandardCharsets.UTF_8))
        }
      case None =>
        send(x, 400, "<Error><Code>InvalidRequest</Code></Error>".getBytes)
    }
  }

  /** DeleteObject, or AbortMultipartUpload when ?uploadId= rides. */
  private def deleteObject(x: HttpExchange, key: String,
      params: Map[String, String]): Unit = params.get("uploadId") match {
    case Some(id) =>
      if (uploads.remove(id) != null) abortedUploads.incrementAndGet()
      send(x, 204, Array.emptyByteArray)
    case None =>
      objects.synchronized { objects.remove(key): Unit }
      send(x, 204, Array.emptyByteArray)
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
