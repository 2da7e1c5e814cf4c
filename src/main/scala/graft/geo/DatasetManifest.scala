package graft.geo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Manifest-driven tabular projection + payload validation — the
  * reference framework's `flattenPaths` / `schema` behaviors
  * (`/root/reference/addresses.dataset.json:27-79`) as ONE generic
  * operator: a user pointing the engine at another Space/Time dataset
  * reuses this instead of hand-declaring a `StructType` per dataset
  * (what `SpacetimeEtl.readHouseNumbers` does for the pipeline's own
  * inputs), and gets the framework's per-row JSON-Schema-style
  * validation as DATA rather than a crash.
  *
  * Contract (declared, engine-shared):
  *  - one output column per flatten path, named by the path segments
  *    joined with '_' ("$.data.sheetId" → "data_sheetId"), typed by
  *    the schema's declared property type (integer → BIGINT, number →
  *    DOUBLE, else STRING);
  *  - `errors` per row: "missing:<p>" for a required property that is
  *    absent (or JSON null), "type:<p>" for a present integer/number
  *    property whose VALUE does not parse ("abc" fails, "2015" passes
  *    — value-level typing, deliberately lenient about JSON token
  *    kind, since both engines' scalar JSON extraction erases it),
  *    "extra:<k>" per undeclared key when additionalProperties is
  *    false; sorted, joined with ';'.
  *
  * Scale shape: the manifest is parsed once on the driver (KBs); the
  * data pass is ONE text scan with row-local JSON extraction — no
  * shuffle at all before whatever the caller does next.
  */
object DatasetManifest {
  final case class Spec(flattenPaths: Seq[String], required: Seq[String],
                        properties: Seq[(String, String)],
                        additionalProperties: Boolean)

  /** Parse a dataset manifest (the reference's `*.dataset.json` shape). */
  def parse(path: String): Spec = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(new java.io.File(path))
    val flatten = (j \ "flattenPaths").extract[Seq[String]]
    val schema = j \ "schema"
    val required = (schema \ "required") match {
      case JArray(vs) => vs.collect { case JString(s) => s }
      case _ => Nil
    }
    val props = (schema \ "properties") match {
      case JObject(fields) => fields.map { case (k, v) =>
        k -> ((v \ "type") match {
          case JString(t) => t
          case _ => "string"
        })
      }
      case _ => Nil
    }
    val addl = (schema \ "additionalProperties") match {
      case JBool(b) => b
      case _ => true
    }
    Spec(flatten, required, props, addl)
  }

  /** Flatten + validate an NDJSON dataset per its manifest: one row per
    * input line, flattened typed columns + the validation error list. */
  def flatten(spark: SparkSession, manifestPath: String,
              dataPath: String): DataFrame = {
    val spec = parse(manifestPath)
    val propType = spec.properties.toMap
    val lines = spark.read.text(dataPath)
    def raw(path: String): Column = get_json_object(col("value"), path)
    val flatCols = spec.flattenPaths.map { p =>
      val segs = p.stripPrefix("$.").split("\\.").toSeq
      val typed = propType.get(segs.last) match {
        // try_cast, not cast: ANSI mode makes a malformed value a
        // query-killing error; here it is a per-row validation FACT
        case Some("integer") => raw(p).try_cast(LongType)
        case Some("number") => raw(p).try_cast(DoubleType)
        case _ => raw(p)
      }
      typed.as(segs.mkString("_"))
    }
    val missing = spec.required.map(r =>
      when(raw(s"$$.data.$r").isNull, lit(s"missing:$r")))
    val typeErrs = spec.properties.collect {
      case (k, t @ ("integer" | "number")) =>
        val v = raw(s"$$.data.$k")
        val cast =
          if (t == "integer") v.try_cast(LongType) else v.try_cast(DoubleType)
        when(v.isNotNull && cast.isNull, lit(s"type:$k"))
    }
    val checks: Column =
      if (missing.isEmpty && typeErrs.isEmpty)
        array().cast(ArrayType(StringType))
      else filter(array(missing ++ typeErrs: _*), _.isNotNull)
    val extras: Column =
      if (spec.additionalProperties) array().cast(ArrayType(StringType))
      else {
        val declared = spec.properties.map(_._1).sorted
          .map("'" + _ + "'").mkString(",")
        expr("transform(array_except(" +
          "coalesce(json_object_keys(get_json_object(value, '$.data')), array()), " +
          s"array($declared)), k -> concat('extra:', k))")
      }
    val errl = array_sort(concat(checks, extras))
    lines.select(
      (raw("$.id").as("id") +: flatCols) :+
        size(errl).cast(LongType).as("n_errors") :+
        array_join(errl, ";").as("errs"): _*)
  }
}
