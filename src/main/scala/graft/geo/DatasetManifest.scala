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
  * Schema subset modeled (round 10 widened the original required/type/
  * additionalProperties trio to the general-JSON-Schema features the
  * framework accepts): NESTED object schemas (each with its own
  * required/properties/additionalProperties, recursively), `enum`
  * (string values), and `minimum`/`maximum` numeric bounds.
  *
  * Contract (declared, engine-shared):
  *  - one output column per flatten path, named by the path segments
  *    joined with '_' ("$.data.address.city" → "data_address_city"),
  *    typed by the schema's declared property type at that path
  *    (integer → BIGINT, number → DOUBLE, else STRING);
  *  - `errors` per row, each tagged with the DOTTED property path:
  *    "missing:<p>" for a required property that is absent (or JSON
  *    null), "type:<p>" for a present integer/number property whose
  *    VALUE does not parse ("abc" fails, "2015" passes — value-level
  *    typing, deliberately lenient about JSON token kind, since both
  *    engines' scalar JSON extraction erases it) or a present
  *    object-schema property that is not an object (decided by key
  *    enumerability — `json_object_keys` here, `json_type = 'OBJECT'`
  *    in the oracle; a STRING value whose text is itself valid object
  *    JSON is out of contract), "enum:<p>" for a present value outside
  *    the declared enum, "min:<p>"/"max:<p>" for a parsed numeric
  *    value outside the declared bounds, "extra:<k>" per undeclared
  *    key at any additionalProperties=false level (nested keys carry
  *    their parent path). Child checks run ONLY when the parent IS an
  *    object — a missing or scalar parent reports once at its own
  *    path, not once per descendant. Sorted, joined with ';'.
  *
  * Scale shape: the manifest is parsed once on the driver (KBs); the
  * data pass is ONE text scan with row-local JSON extraction — no
  * shuffle at all before whatever the caller does next.
  */
object DatasetManifest {
  final case class PropSpec(name: String, typ: String,
                            enumVals: Seq[String],
                            minimum: Option[BigDecimal],
                            maximum: Option[BigDecimal],
                            nested: Option[ObjSpec])
  final case class ObjSpec(required: Seq[String], props: Seq[PropSpec],
                           additionalProperties: Boolean)
  final case class Spec(flattenPaths: Seq[String], schema: ObjSpec)

  /** Parse a dataset manifest (the reference's `*.dataset.json` shape). */
  def parse(path: String): Spec = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(new java.io.File(path))
    val flatten = (j \ "flattenPaths").extract[Seq[String]]

    def parseObj(o: JValue): ObjSpec = {
      val required = (o \ "required") match {
        case JArray(vs) => vs.collect { case JString(s) => s }
        case _ => Nil
      }
      val props = (o \ "properties") match {
        case JObject(fields) => fields.map { case (k, v) =>
          val typ = (v \ "type") match {
            case JString(t) => t
            case _ => "string"
          }
          val enumVals = (v \ "enum") match {
            case JArray(vs) => vs.collect { case JString(s) => s }
            case _ => Nil
          }
          def num(field: String): Option[BigDecimal] = (v \ field) match {
            case JInt(n) => Some(BigDecimal(n))
            case JDouble(n) => Some(BigDecimal(n))
            case JDecimal(n) => Some(n)
            case _ => None
          }
          PropSpec(k, typ, enumVals, num("minimum"), num("maximum"),
            if (typ == "object") Some(parseObj(v)) else None)
        }
        case _ => Nil
      }
      val addl = (o \ "additionalProperties") match {
        case JBool(b) => b
        case _ => true
      }
      ObjSpec(required, props, addl)
    }
    Spec(flatten, parseObj(j \ "schema"))
  }

  /** Flatten + validate an NDJSON dataset per its manifest: one row per
    * input line, flattened typed columns + the validation error list. */
  def flatten(spark: SparkSession, manifestPath: String,
              dataPath: String): DataFrame = {
    val spec = parse(manifestPath)
    val lines = spark.read.text(dataPath)
    def raw(path: String): Column = get_json_object(col("value"), path)

    // declared type at a dotted path under $.data, walking the tree
    def typeAt(segs: Seq[String]): Option[String] = {
      def walk(o: ObjSpec, ss: Seq[String]): Option[String] =
        o.props.find(_.name == ss.head).flatMap { p =>
          if (ss.tail.isEmpty) Some(p.typ)
          else p.nested.flatMap(walk(_, ss.tail))
        }
      walk(spec.schema, segs)
    }
    val flatCols = spec.flattenPaths.map { p =>
      val segs = p.stripPrefix("$.").split("\\.").toSeq
      val typed = typeAt(segs.drop(1)) match {
        // try_cast, not cast: ANSI mode makes a malformed value a
        // query-killing error; here it is a per-row validation FACT
        case Some("integer") => raw(p).try_cast(LongType)
        case Some("number") => raw(p).try_cast(DoubleType)
        case _ => raw(p)
      }
      typed.as(segs.mkString("_"))
    }

    /** ARRAY<STRING> check columns for one object level (this level's
      * scalar checks folded into one filtered array, plus one array per
      * additionalProperties=false level and per nested level). `pfx` is
      * the dotted path prefix ("" at root); `guard` is TRUE iff this
      * level's parent chain is all present-and-object. */
    def checksOf(o: ObjSpec, pfx: String, guard: Column)
        : Seq[Column] = {
      def dotted(n: String) = if (pfx.isEmpty) n else s"$pfx.$n"
      def jpath(n: String) = s"$$.data.${dotted(n)}"
      val missing = o.required.map { r =>
        when(guard && raw(jpath(r)).isNull, lit(s"missing:${dotted(r)}"))
      }
      val scalars = Seq.newBuilder[Column]
      val arrays = Seq.newBuilder[Column]
      scalars ++= missing
      o.props.foreach { p =>
        val v = raw(jpath(p.name))
        val present = guard && v.isNotNull
        val tag = dotted(p.name)
        p.typ match {
          case "integer" | "number" =>
            val cast = if (p.typ == "integer") v.try_cast(LongType)
                       else v.try_cast(DoubleType)
            scalars += when(present && cast.isNull, lit(s"type:$tag"))
            p.minimum.foreach(m =>
              scalars += when(present && cast.isNotNull
                && cast < lit(m.toString).cast(
                  if (p.typ == "integer") LongType else DoubleType),
                lit(s"min:$tag")))
            p.maximum.foreach(m =>
              scalars += when(present && cast.isNotNull
                && cast > lit(m.toString).cast(
                  if (p.typ == "integer") LongType else DoubleType),
                lit(s"max:$tag")))
          case "object" =>
            val isObj = json_object_keys(v).isNotNull
            scalars += when(present && !isObj, lit(s"type:$tag"))
            p.nested.foreach(n =>
              arrays ++= checksOf(n, tag, present && isObj))
          case _ =>
            if (p.enumVals.nonEmpty)
              scalars += when(present
                && !v.isin(p.enumVals.map(lit(_)): _*),
                lit(s"enum:$tag"))
        }
      }
      if (!o.additionalProperties) {
        val declared = o.props.map(_.name).sorted
          .map("'" + _ + "'").mkString(",")
        val objPath =
          if (pfx.isEmpty) "'$.data'" else s"'$$.data.$pfx'"
        val pre = if (pfx.isEmpty) "extra:" else s"extra:$pfx."
        arrays += when(guard, expr("transform(array_except(" +
          s"coalesce(json_object_keys(get_json_object(value, $objPath)), array()), " +
          s"array($declared)), k -> concat('$pre', k))"))
          .otherwise(array().cast(ArrayType(StringType)))
      }
      val scalarErrs = scalars.result()
      val scalarArr: Seq[Column] =
        if (scalarErrs.isEmpty) Nil
        else Seq(filter(array(scalarErrs: _*), _.isNotNull))
      scalarArr ++ arrays.result()
    }

    val pieces = checksOf(spec.schema, "", lit(true))
    val errl = array_sort(
      if (pieces.isEmpty) array().cast(ArrayType(StringType))
      else if (pieces.length == 1) pieces.head
      else concat(pieces: _*))
    lines.select(
      (raw("$.id").as("id") +: flatCols) :+
        size(errl).cast(LongType).as("n_errors") :+
        array_join(errl, ";").as("errs"): _*)
  }
}
