package graft.catalog

import scala.collection.mutable

/** Catalog object model: the 7 entity types with the reference's field
  * names and required rules (reference: core/Workspace.go:18-22,
  * core/DataStore.go:17-26, core/Layer.go:18-28, core/Process.go:17-23,
  * core/Service.go:18-26, core/Job.go:17-24, core/Workflow.go:17-23,
  * type registry core/CoreTypes.go:14-22).
  *
  * DFL expressions (`DataStore.uri`, `Process.expression`, `Layer
  * .expression`) are stored as SOURCE STRINGS, same as the reference
  * catalog (core/Process.go:38) — they compile at exec time with the
  * bound variables.
  */
final case class Workspace(name: String, title: String = "", description: String = "")

final case class DataStore(
    workspace: String, name: String, uri: String,
    title: String = "", description: String = "",
    format: String = "", compression: String = "",
    extent: Seq[Double] = Nil)

final case class Layer(
    name: String, datastore: String, expression: String,
    title: String = "", description: String = "",
    defaults: Map[String, Any] = Map.empty,
    extent: Seq[Double] = Nil, tags: Seq[String] = Nil)

final case class Process(
    name: String, expression: String,
    title: String = "", description: String = "", tags: Seq[String] = Nil)

final case class Service(
    name: String, datastore: String, process: String,
    title: String = "", description: String = "",
    defaults: Map[String, Any] = Map.empty, tags: Seq[String] = Nil)

final case class Job(
    name: String, service: String,
    title: String = "", description: String = "",
    variables: Map[String, Any] = Map.empty,
    output: Option[String] = None) // output datastore name

final case class Workflow(
    name: String, jobs: Seq[String],
    title: String = "", description: String = "",
    variables: Map[String, Any] = Map.empty)

/** A STREAMING serving job as a catalog entity — the reference's whole
  * thesis is catalog-driven exec (router/RailgunRouter.go:50-135: every
  * surface is an entity with routes); the serving streams were the one
  * product surface still CLI-only. `kind` picks the job family
  * (`ann` | `bm25` | `hybrid` — [[graft.streaming.StreamRunner]]'s
  * annServeJob / bm25ServeJob / hybridServeJob), `variables` carry its
  * knobs: `index` (`index:REF` catalog var or a built dir; hybrid takes
  * `bmIndex` + `annIndex`), `queries` / `output` / `checkpoint` URIs,
  * and the probe knobs (k, tuning, filter, refine, minCos, lambda, k1,
  * b, pool, format, outFormat). Exec.servingStart launches it,
  * servingStatus reads the live StreamingQuery, servingStop ends it;
  * the entity itself is just the declarative definition and persists
  * with the catalog. */
final case class ServingJob(
    name: String, kind: String,
    title: String = "", description: String = "",
    variables: Map[String, Any] = Map.empty)

/** In-memory registry with JSON/YAML persistence — the analogue of
  * RailgunCatalog (reference: catalog/RailgunCatalog.go:49-295 parsing,
  * 531-729 LoadFromUri, 967-1025 SaveToUri). Mutations are synchronized
  * (the reference serializes through a catalog lock). */
final class Catalog {
  private val lock = new Object
  val workspaces: mutable.LinkedHashMap[String, Workspace] = mutable.LinkedHashMap()
  val datastores: mutable.LinkedHashMap[String, DataStore] = mutable.LinkedHashMap()
  val layers: mutable.LinkedHashMap[String, Layer] = mutable.LinkedHashMap()
  val processes: mutable.LinkedHashMap[String, Process] = mutable.LinkedHashMap()
  val services: mutable.LinkedHashMap[String, Service] = mutable.LinkedHashMap()
  val jobs: mutable.LinkedHashMap[String, Job] = mutable.LinkedHashMap()
  val workflows: mutable.LinkedHashMap[String, Workflow] = mutable.LinkedHashMap()
  val servingjobs: mutable.LinkedHashMap[String, ServingJob] = mutable.LinkedHashMap()

  def add(e: Any): Unit = lock.synchronized {
    e match {
      case x: Workspace => workspaces(x.name) = x
      case x: DataStore =>
        require(workspaces.contains(x.workspace), s"unknown workspace: ${x.workspace}")
        datastores(x.name) = x
      case x: Layer =>
        require(datastores.contains(x.datastore), s"unknown datastore: ${x.datastore}")
        layers(x.name) = x
      case x: Process => processes(x.name) = x
      case x: Service =>
        require(datastores.contains(x.datastore), s"unknown datastore: ${x.datastore}")
        require(processes.contains(x.process), s"unknown process: ${x.process}")
        services(x.name) = x
      case x: Job =>
        require(services.contains(x.service), s"unknown service: ${x.service}")
        jobs(x.name) = x
      case x: Workflow =>
        x.jobs.foreach(j => require(jobs.contains(j), s"unknown job: $j"))
        workflows(x.name) = x
      case x: ServingJob =>
        require(Set("ann", "bm25", "hybrid")(x.kind),
          s"servingjob kind must be ann | bm25 | hybrid, got '${x.kind}'")
        servingjobs(x.name) = x
      case other => throw new IllegalArgumentException(s"not a catalog entity: $other")
    }
  }

  /** Replace an existing entity in place (reference: PUT/POST on the item
    * route updates it — handlers/ItemHandler.go:173-196, router registration
    * router/RailgunRouter.go:166,173). Keyed by name; the entity must
    * already exist, and the same referential-integrity checks as [[add]]
    * apply. LinkedHashMap keeps the original insertion position, so the
    * catalog's referential ordering survives an update (unlike
    * delete+re-add). */
  def update(e: Any): Unit = lock.synchronized {
    val (kind, name) = e match {
      case x: Workspace => ("workspaces", x.name)
      case x: DataStore => ("datastores", x.name)
      case x: Layer     => ("layers", x.name)
      case x: Process   => ("processes", x.name)
      case x: Service   => ("services", x.name)
      case x: Job       => ("jobs", x.name)
      case x: Workflow  => ("workflows", x.name)
      case x: ServingJob => ("servingjobs", x.name)
      case other => throw new IllegalArgumentException(s"not a catalog entity: $other")
    }
    if (!tableFor(kind).contains(name))
      throw new NoSuchElementException(s"$kind/$name not found")
    add(e)
  }

  def delete(kind: String, name: String): Boolean = lock.synchronized {
    tableFor(kind).remove(name).isDefined
  }

  def list(kind: String): Seq[Any] = lock.synchronized { tableFor(kind).values.toSeq }

  def get(kind: String, name: String): Option[Any] =
    lock.synchronized { tableFor(kind).get(name) }

  private def tableFor(kind: String): mutable.LinkedHashMap[String, _ <: Any] = kind match {
    case "workspaces" => workspaces
    case "datastores" => datastores
    case "layers"     => layers
    case "processes"  => processes
    case "services"   => services
    case "jobs"       => jobs
    case "workflows"  => workflows
    case "servingjobs" => servingjobs
    case other        => throw new IllegalArgumentException(s"unknown entity kind: $other")
  }

  // ---------- persistence ----------

  def toMaps: Map[String, Any] = lock.synchronized {
    Map(
      "workspaces" -> workspaces.values.map(w => Map(
        "name" -> w.name, "title" -> w.title, "description" -> w.description)).toList,
      "datastores" -> datastores.values.map(d => Map(
        "workspace" -> d.workspace, "name" -> d.name, "uri" -> d.uri,
        "title" -> d.title, "description" -> d.description, "format" -> d.format,
        "compression" -> d.compression, "extent" -> d.extent.toList)).toList,
      "layers" -> layers.values.map(l => Map(
        "name" -> l.name, "datastore" -> l.datastore, "expression" -> l.expression,
        "title" -> l.title, "description" -> l.description,
        "defaults" -> l.defaults, "extent" -> l.extent.toList, "tags" -> l.tags.toList)).toList,
      "processes" -> processes.values.map(p => Map(
        "name" -> p.name, "expression" -> p.expression,
        "title" -> p.title, "description" -> p.description,
        "tags" -> p.tags.toList)).toList,
      "services" -> services.values.map(s => Map(
        "name" -> s.name, "datastore" -> s.datastore, "process" -> s.process,
        "title" -> s.title, "description" -> s.description,
        "defaults" -> s.defaults, "tags" -> s.tags.toList)).toList,
      "jobs" -> jobs.values.map(j => Map(
        "name" -> j.name, "service" -> j.service,
        "title" -> j.title, "description" -> j.description,
        "variables" -> j.variables, "output" -> j.output.orNull)).toList,
      "workflows" -> workflows.values.map(w => Map(
        "name" -> w.name, "jobs" -> w.jobs.toList,
        "title" -> w.title, "description" -> w.description,
        "variables" -> w.variables)).toList,
      "servingjobs" -> servingjobs.values.map(j => Map(
        "name" -> j.name, "kind" -> j.kind,
        "title" -> j.title, "description" -> j.description,
        "variables" -> j.variables)).toList,
    )
  }

  /** Synchronized (the HTTP server persists after every mutation from a
    * thread pool — two interleaved truncate+write calls would corrupt the
    * file) and atomic via temp-file + move, so a crash mid-write never
    * leaves a half-written catalog behind. */
  def save(path: String): Unit = synchronized {
    val text =
      if (path.endsWith(".yaml") || path.endsWith(".yml"))
        graft.io.TextFormats.renderYaml(toMaps)
      else graft.io.TextFormats.toJson(toMaps)
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val tmp = java.nio.file.Files.createTempFile(
      Option(p.getParent).getOrElse(java.nio.file.Paths.get(".")), ".catalog", ".tmp")
    java.nio.file.Files.writeString(tmp, text)
    try java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }
}

object Catalog {

  def load(path: String): Catalog = {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val doc: Map[String, Any] =
      if (path.endsWith(".yaml") || path.endsWith(".yml"))
        graft.io.TextFormats.parseYaml(text).asInstanceOf[Map[String, Any]]
      else parseJsonDoc(text)
    fromMaps(doc)
  }

  def fromMaps(doc: Map[String, Any]): Catalog = {
    val c = new Catalog
    def seqOf(k: String): Seq[Map[String, Any]] = doc.get(k) match {
      // an empty section may parse back as an empty map (yaml) or be absent
      case Some(xs: Seq[_]) => xs.map(_.asInstanceOf[Map[String, Any]])
      case _                => Nil
    }
    def s(m: Map[String, Any], k: String, d: String = ""): String = m.get(k) match {
      // empty yaml values parse back as empty maps — treat as absent
      case Some(v: String)                          => v
      case Some(v) if v != null &&
        !v.isInstanceOf[Map[_, _]] && !v.isInstanceOf[Seq[_]] => v.toString
      case _                                        => d
    }
    def vars(m: Map[String, Any], k: String): Map[String, Any] =
      m.get(k).collect { case mm: Map[_, _] => mm.asInstanceOf[Map[String, Any]] }
        .getOrElse(Map.empty)
    def doubles(m: Map[String, Any], k: String): Seq[Double] =
      m.get(k).collect { case xs: Seq[_] => xs.map(x => x.toString.toDouble) }.getOrElse(Nil)
    def strings(m: Map[String, Any], k: String): Seq[String] =
      m.get(k).collect { case xs: Seq[_] => xs.map(_.toString) }.getOrElse(Nil)

    seqOf("workspaces").foreach(m => c.add(Workspace(s(m, "name"), s(m, "title"), s(m, "description"))))
    seqOf("datastores").foreach(m => c.add(DataStore(
      s(m, "workspace"), s(m, "name"), s(m, "uri"), s(m, "title"), s(m, "description"),
      s(m, "format"), s(m, "compression"), doubles(m, "extent"))))
    seqOf("layers").foreach(m => c.add(Layer(
      s(m, "name"), s(m, "datastore"), s(m, "expression"), s(m, "title"),
      s(m, "description"), vars(m, "defaults"), doubles(m, "extent"), strings(m, "tags"))))
    seqOf("processes").foreach(m => c.add(Process(
      s(m, "name"), s(m, "expression"), s(m, "title"), s(m, "description"), strings(m, "tags"))))
    seqOf("services").foreach(m => c.add(Service(
      s(m, "name"), s(m, "datastore"), s(m, "process"), s(m, "title"),
      s(m, "description"), vars(m, "defaults"), strings(m, "tags"))))
    seqOf("jobs").foreach(m => c.add(Job(
      s(m, "name"), s(m, "service"), s(m, "title"), s(m, "description"),
      vars(m, "variables"), Option(s(m, "output")).filter(_.nonEmpty))))
    seqOf("workflows").foreach(m => c.add(Workflow(
      s(m, "name"), strings(m, "jobs"), s(m, "title"), s(m, "description"),
      vars(m, "variables"))))
    seqOf("servingjobs").foreach(m => c.add(ServingJob(
      s(m, "name"), s(m, "kind"), s(m, "title"), s(m, "description"),
      vars(m, "variables"))))
    c
  }

  /** JSON → nested Scala maps via jackson (on the Spark classpath). */
  def parseJsonDoc(text: String): Map[String, Any] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    fromNode(om.readTree(text)).asInstanceOf[Map[String, Any]]
  }

  private def fromNode(n: com.fasterxml.jackson.databind.JsonNode): Any = {
    import scala.jdk.CollectionConverters._
    if (n.isObject) n.fields().asScala.map(e => e.getKey -> fromNode(e.getValue)).toMap
    else if (n.isArray) n.elements().asScala.map(fromNode).toList
    else if (n.isLong || n.isInt) n.asLong()
    else if (n.isDouble || n.isFloat || n.isBigDecimal) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isNull) null
    else n.asText()
  }
}
