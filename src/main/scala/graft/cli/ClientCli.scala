package graft.cli

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** CLI client mirroring the server routes (reference: cli/client.go:317-590
  * generates `railgun client <type> add/get/update/delete/list` + exec from
  * struct tags; ours is a thin explicit mirror).
  *
  * Usage:
  *   runMain graft.cli.ClientCli --base http://host:port [--token T]
  *     list <kind> | get <kind> <name> | delete <kind> <name>
  *     | add <kind> <json> | update <kind> <name> <json>
  *     | exec <services|jobs|workflows> <name> [json]
  *     | tile <layer> <z> <x> <y> | mask <layer> <z> <x> <y> <out.png>
  *     | authenticate <user> <password>
  */
object ClientCli {

  final class Client(base: String, token: Option[String] = None) {
    private val http = HttpClient.newHttpClient()

    private def req(path: String): HttpRequest.Builder = {
      val b = HttpRequest.newBuilder(URI.create(base + path))
      token.fold(b)(t => b.header("Authorization", s"Bearer $t"))
    }

    private def send(r: HttpRequest): (Int, String) = {
      val resp = http.send(r, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }

    private def jsonStr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""

    def authenticate(user: String, password: String): (Int, String) =
      send(req("/authenticate.json").POST(HttpRequest.BodyPublishers.ofString(
        s"""{"username":${jsonStr(user)},"password":${jsonStr(password)}}""")).build())

    def list(kind: String): (Int, String) = send(req(s"/$kind.json").GET().build())
    def get(kind: String, name: String): (Int, String) =
      send(req(s"/$kind/$name.json").GET().build())
    def delete(kind: String, name: String): (Int, String) =
      send(req(s"/$kind/$name.json").DELETE().build())
    def add(kind: String, json: String): (Int, String) =
      send(req(s"/$kind.json").POST(HttpRequest.BodyPublishers.ofString(json)).build())
    def update(kind: String, name: String, json: String): (Int, String) =
      send(req(s"/$kind/$name.json")
        .PUT(HttpRequest.BodyPublishers.ofString(json)).build())
    def exec(kind: String, name: String, body: String = ""): (Int, String) =
      send(req(s"/$kind/$name/exec.json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build())
    // the streaming serving-job lifecycle verbs (the CLI serve-* jobs'
    // catalog-driven form): start/stop are auth'd mutations, status a read
    def servingStart(name: String): (Int, String) =
      send(req(s"/servingjobs/$name/start.json")
        .POST(HttpRequest.BodyPublishers.noBody()).build())
    def servingStatus(name: String): (Int, String) =
      send(req(s"/servingjobs/$name/status.json").GET().build())
    def servingStop(name: String): (Int, String) =
      send(req(s"/servingjobs/$name/stop.json")
        .POST(HttpRequest.BodyPublishers.noBody()).build())
    def tile(layer: String, z: Int, x: Long, y: Long, qs: String = ""): (Int, String) =
      send(req(s"/layers/$layer/tiles/data/$z/$x/$y.json$qs").GET().build())
    def maskBytes(layer: String, z: Int, x: Long, y: Long): (Int, Array[Byte]) = {
      val resp = http.send(req(s"/layers/$layer/tiles/mask/$z/$x/$y.png").GET().build(),
        HttpResponse.BodyHandlers.ofByteArray())
      (resp.statusCode(), resp.body())
    }
  }

  def main(args: Array[String]): Unit = {
    var base = "http://localhost:8080"; var token: Option[String] = None
    var rest = List.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--base"  => i += 1; base = args(i)
        case "--token" => i += 1; token = Some(args(i))
        case other     => rest = rest :+ other
      }
      i += 1
    }
    val c = new Client(base, token)
    val (code, body) = rest match {
      case "authenticate" :: u :: p :: Nil => c.authenticate(u, p)
      case "list" :: kind :: Nil           => c.list(kind)
      case "get" :: kind :: name :: Nil    => c.get(kind, name)
      case "delete" :: kind :: name :: Nil => c.delete(kind, name)
      case "add" :: kind :: json :: Nil    => c.add(kind, json)
      case "update" :: kind :: name :: json :: Nil => c.update(kind, name, json)
      case "exec" :: kind :: name :: tail  => c.exec(kind, name, tail.mkString(" "))
      case "serving" :: "start" :: name :: Nil  => c.servingStart(name)
      case "serving" :: "status" :: name :: Nil => c.servingStatus(name)
      case "serving" :: "stop" :: name :: Nil   => c.servingStop(name)
      case "tile" :: layer :: z :: tx :: ty :: Nil =>
        c.tile(layer, z.toInt, tx.toLong, ty.toLong)
      case "mask" :: layer :: z :: tx :: ty :: out :: Nil =>
        val (code, bytes) = c.maskBytes(layer, z.toInt, tx.toLong, ty.toLong)
        java.nio.file.Files.write(java.nio.file.Paths.get(out), bytes)
        (code, s"wrote ${bytes.length} bytes to $out")
      case other => throw new IllegalArgumentException(s"unknown command: $other")
    }
    println(body)
    if (code >= 400) sys.exit(1)
  }
}
