package graft.connectors.transforms

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Naming, StateStore}
import scala.jdk.CollectionConverters._

/** Custom-field rename maps with cross-run stability — the
  * pipedrive/zendesk stateful metadata operator (SURVEY §2.7):
  *
  *  - pipedrive: hash-keyed custom fields renamed to human names, enum
  *    option ids decoded to labels, the mapping emitted as its own table
  *    (sources/pipedrive/helpers/custom_fields_munger.py:15-75, mapping
  *    table sources/pipedrive/__init__.py:163-180);
  *  - zendesk: ticket-field title/options kept in state, FIRST-SEEN title
  *    wins across runs so downstream columns never flap
  *    (sources/zendesk/helpers/api_helpers.py:82-106).
  */
object CustomFields {

  final case class FieldDef(key: String, name: String, fieldType: String, options: Map[String, String])

  private def stateKey(endpoint: String) = s"custom_fields.$endpoint"

  private val mapper = new ObjectMapper()

  private def encodeDef(f: FieldDef): String = {
    val node = mapper.createObjectNode()
    node.put("name", f.name)
    node.put("type", f.fieldType)
    val opts = mapper.createObjectNode()
    f.options.foreach { case (k, v) => opts.put(k, v) }
    node.set[JsonNode]("options", opts)
    node.toString
  }

  private def decodeDef(key: String, json: String): FieldDef = {
    val node = mapper.readTree(json)
    val opts = node.get("options").properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap
    FieldDef(key, node.get("name").asText(), node.get("type").asText(), opts)
  }

  /** Merge newly observed field definitions into state under the
    * first-seen-wins rule: an existing mapping keeps its name; new enum
    * options accrete (reference rule: initial title wins,
    * api_helpers.py:94-105; options accretion custom_fields_munger.py:50-63).
    * Returns the stable mapping to use this run.
    */
  def updateMapping(state: StateStore, endpoint: String, observed: Seq[FieldDef]): Map[String, FieldDef] = {
    val existing: Map[String, FieldDef] = state.getMap(stateKey(endpoint)).map { case (k, v) =>
      k -> decodeDef(k, v)
    }
    val merged = observed.foldLeft(existing) { (acc, f) =>
      acc.get(f.key) match {
        case Some(prev) => // first-seen name wins; options accrete
          acc + (f.key -> prev.copy(options = prev.options ++ f.options))
        case None => acc + (f.key -> f)
      }
    }
    state.putMap(stateKey(endpoint), merged.map { case (k, f) => k -> encodeDef(f) })
    merged
  }

  /** Rename hash columns to stable normalized names and decode enum ids to
    * labels (broadcast map lookup — custom_fields_munger.py:84-102).
    */
  def applyMapping(df: DataFrame, mapping: Map[String, FieldDef]): DataFrame = {
    val present = df.columns.toSet
    mapping.valuesIterator.filter(f => present(f.key)).foldLeft(df) { (acc, f) =>
      val target = Naming.normalize(f.name)
      val decoded: Column =
        if (f.options.nonEmpty && (f.fieldType == "enum" || f.fieldType == "set")) {
          val m = typedlit(f.options)
          coalesce(element_at(m, col(f.key).cast("string")), col(f.key).cast("string"))
        } else col(f.key)
      acc.withColumn(target, decoded).drop(f.key)
    }
  }

  /** The mapping table resource (endpoint, hash, name, normalized_name,
    * field_type) — written with `replace` like the reference
    * (sources/pipedrive/__init__.py:163-180).
    */
  def mappingTable(spark: SparkSession, endpoint: String, mapping: Map[String, FieldDef]): DataFrame = {
    import spark.implicits._
    mapping.valuesIterator.map(f =>
      (endpoint, f.key, f.name, Naming.normalize(f.name), f.fieldType)).toSeq
      .toDF("endpoint", "hash_string", "name", "normalized_name", "field_type")
  }
}
