package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import scala.jdk.CollectionConverters._

/** Pipeline state store: a JSON document per pipeline holding incremental
  * cursors and per-source custom state, committed atomically only after a
  * successful load — mirroring the reference's `dlt.current.resource_state()`
  * contract (sources/chess/__init__.py:96-97 relies on commit-on-success;
  * cursors at sources/pg_replication/__init__.py:77-80, offsets map at
  * sources/kafka/helpers.py:83-88, seen-sets at sources/chess/__init__.py:95-124).
  *
  * Scalar, list and map-valued entries are supported (map-valued cursors:
  * Kinesis shard→seq map, sources/kinesis/helpers.py:46-63).
  */
final class StateStore(path: Path) {
  private val mapper = new ObjectMapper()
  private var root: ObjectNode = load()

  private def load(): ObjectNode =
    if (Files.exists(path))
      mapper.readTree(Files.readAllBytes(path)).asInstanceOf[ObjectNode]
    else mapper.createObjectNode()

  def getString(key: String): Option[String] =
    Option(root.get(key)).filterNot(_.isNull).map(_.asText())

  def getLong(key: String): Option[Long] =
    Option(root.get(key)).filterNot(_.isNull).map(_.asLong())

  def getMap(key: String): Map[String, String] =
    Option(root.get(key)) match {
      case Some(n) if n.isObject =>
        n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      case _ => Map.empty
    }

  def getList(key: String): Seq[String] =
    Option(root.get(key)) match {
      case Some(n) if n.isArray => n.elements().asScala.map(_.asText()).toSeq
      case _                    => Nil
    }

  // mutators synchronized: parallel pipeline levels may update custom
  // state (e.g. rename maps) from concurrent driver threads
  def put(key: String, value: String): Unit = synchronized { root.put(key, value) }
  def put(key: String, value: Long): Unit = synchronized { root.put(key, value) }

  def putMap(key: String, value: Map[String, String]): Unit = synchronized {
    val o = mapper.createObjectNode()
    value.foreach { case (k, v) => o.put(k, v) }
    root.set[JsonNode](key, o)
  }

  def putList(key: String, value: Seq[String]): Unit = synchronized {
    val a = mapper.createArrayNode()
    value.foreach(a.add)
    root.set[JsonNode](key, a)
  }

  def remove(key: String): Unit = synchronized { root.remove(key) }

  def keys: Seq[String] = root.fieldNames().asScala.toSeq

  /** Write-temp + atomic-move commit; state persists only when called, so a
    * failed load leaves the previous cursors intact (SURVEY §3.1 step 5).
    */
  def commit(): Unit = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    val tmp = Paths.get(path.toString + ".tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Discard in-memory mutations, reload last committed state. */
  def rollback(): Unit = root = load()
}

object StateStore {
  def apply(dir: String, pipelineName: String): StateStore =
    new StateStore(Paths.get(dir, s"$pipelineName.state.json"))
}
