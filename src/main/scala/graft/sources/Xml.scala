package graft.sources

import graft.operators.NestedOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType,
  StructField, StructType}

/** XML sources — the SIFTS / validation-XML analog, Spark-first.
  *
  * Spark 4 ships a native distributed XML reader (`rowTag` splits the
  * document into one row per element across executors). The reference
  * walks nested XML into per-residue rows on the driver
  * (proteofav/sifts.py:141 parse_sifts_residues,
  * validation.py:21 parse_validation_residues); here the same shape
  * is: read entities → explode nested element arrays → flatten
  * attribute structs, all as Catalyst projections.
  */
object Xml {

  /** Read one row per `rowTag` element. Attributes surface as `_attr`
    * columns, nested repeated elements as array<struct> columns. */
  def read(spark: SparkSession, path: String, rowTag: String): DataFrame =
    spark.read.option("rowTag", rowTag).xml(path)

  /** The dbSources the reference excludes by default in every SIFTS
    * parse path (sifts.py:37, 204). */
  val DefaultExcludedDbs: Seq[String] = Seq("InterPro", "GO", "EC", "NCBI")

  /** Parse the SIFTS `listDB` header — one row per `<db/>` entry with
    * its (dbSource, dbCoordSys, dbVersion) attributes, the default
    * exclusion set applied. The `add_dbs=True` metadata table of
    * parse_sifts_residues. reference: proteofav/sifts.py:22-62
    * (_parse_sifts_dbs_from_file). */
  def siftsDbs(spark: SparkSession, path: String,
               excluded: Seq[String] = DefaultExcludedDbs): DataFrame =
    read(spark, path, rowTag = "listDB")
      .select(explode(col("db")).as("db"))
      .select(col("db._dbSource").cast("string").as("dbSource"),
        col("db._dbCoordSys").cast("string").as("dbCoordSys"),
        col("db._dbVersion").cast("string").as("dbVersion"))
      .filter(col("dbSource").isNotNull && col("dbSource") =!= "" &&
        !col("dbSource").isin(excluded: _*))

  /** Enrich per-residue crossRefDb rows with the header's dbVersion —
    * the long-form analog of the reference's `{source}_dbVersion`
    * columns (sifts.py:286-290): a broadcast left join on the source
    * (the header is a handful of rows; unlisted sources stay null). */
  def withDbVersions(residues: DataFrame, dbs: DataFrame,
                     sourceCol: String = "_dbSource"): DataFrame =
    residues.join(
      broadcast(dbs.select(col("dbSource").as(sourceCol), col("dbVersion"))),
      Seq(sourceCol), "left")

  /** Explicit read schema for the regions walk: every repeated level
    * (segment, listMapRegion, mapRegion, db) pinned to array<struct>
    * so single-occurrence files can't collapse a level to a bare
    * struct under inference and break the posexplode chain. */
  val siftsRegionsSchema: StructType = StructType(Seq(
    StructField("_entityId", StringType),
    StructField("_type", StringType),
    StructField("segment", ArrayType(StructType(Seq(
      StructField("_segId", StringType),
      StructField("listMapRegion", ArrayType(StructType(Seq(
        StructField("mapRegion", ArrayType(StructType(Seq(
          StructField("_start", IntegerType),
          StructField("_end", IntegerType),
          StructField("db", ArrayType(StructType(Seq(
            StructField("_dbSource", StringType),
            StructField("_dbCoordSys", StringType),
            StructField("_dbAccessionId", StringType)))))))))))))))))))

  /** Parse the SIFTS region map — one row per `<db/>` annotation under
    * entity[type=protein]/segment/listMapRegion/mapRegion, with
    * `regionId` the reference's per-(entity, dbSource) 1-based counter
    * in document order across segments (missing dbCoordSys → "-", the
    * reference's KeyError fallback). The nested-dict output of
    * _parse_sifts_regions_from_file flattened to a long table.
    * reference: proteofav/sifts.py:64-138. */
  def siftsRegions(spark: SparkSession, path: String,
                   excluded: Seq[String] = DefaultExcludedDbs): DataFrame =
    spark.read.option("rowTag", "entity").schema(siftsRegionsSchema).xml(path)
      .filter(col("_type") === "protein")
      .select(col("_entityId").as("entityId"),
        posexplode(col("segment")).as(Seq("segPos", "seg")))
      .select(col("entityId"), col("segPos"),
        posexplode(col("seg.listMapRegion")).as(Seq("lmrPos", "lmr")))
      .select(col("entityId"), col("segPos"), col("lmrPos"),
        posexplode(col("lmr.mapRegion")).as(Seq("regPos", "reg")))
      .select(col("entityId"), col("segPos"), col("lmrPos"), col("regPos"),
        col("reg._start").as("start"), col("reg._end").as("end"),
        posexplode(col("reg.db")).as(Seq("dbPos", "db")))
      .filter(col("db._dbSource").isNotNull &&
        !col("db._dbSource").isin(excluded: _*))
      // the counter: regions is metadata-sized (a handful of mapped
      // dbs per entity), so the window is cheap by construction
      .withColumn("regionId", row_number().over(
        Window.partitionBy(col("entityId"), col("db._dbSource"))
          .orderBy("segPos", "lmrPos", "regPos", "dbPos")).cast("long"))
      .select(col("entityId"), col("db._dbSource").as("dbSource"),
        col("regionId"), col("db._dbAccessionId").as("dbAccessionId"),
        col("start"), col("end"),
        coalesce(col("db._dbCoordSys"), lit("-")).as("dbCoordSys"))

  /** Per-residue region enrichment — the `add_regions=True` leg of
    * parse_sifts_residues (sifts.py:266-284): a residue annotation row
    * gains (regionId, regionStart, regionEnd, regionResNum) when its
    * resnum falls inside a region of the same (entity, source,
    * accession); with several matching regions the LAST counter wins
    * (the reference overwrites the dict entry per match).
    *
    * Scale shape: regions is metadata-sized, so it is pre-aggregated
    * to one row per (entity, source, accession) carrying a
    * regionId-sorted interval array, then BROADCAST equi-joined — the
    * big residue side sees one codegen'd array probe per row, no
    * range-join shuffle and no post-join dedup pass. */
  def withRegions(residues: DataFrame, regions: DataFrame,
                  entityCol: String = "entityId",
                  sourceCol: String = "_dbSource",
                  accessionCol: String = "_dbAccessionId",
                  resnumCol: String = "resnum"): DataFrame = {
    val packed = regions.groupBy(
        col("entityId").as("__r_entity"), col("dbSource").as("__r_source"),
        col("dbAccessionId").as("__r_acc"))
      .agg(sort_array(collect_list(struct(
        col("regionId"), col("start"), col("end")))).as("__regs"))
    val joined = residues.join(broadcast(packed),
      residues(entityCol) === col("__r_entity") &&
        residues(sourceCol) === col("__r_source") &&
        residues(accessionCol) === col("__r_acc"), "left")
    val resnum = residues(resnumCol)
    val hits: Column = filter(col("__regs"),
      r => resnum >= r("start") && resnum <= r("end"))
    val last: Column = when(size(hits) > 0, element_at(hits, -1))
    joined.select(residues.columns.map(residues(_)) ++ Seq(
      last("regionId").as("regionId"),
      last("start").as("regionStart"),
      last("end").as("regionEnd"),
      when(last("regionId").isNotNull, resnum).as("regionResNum")): _*)
  }

  /** Explicit read schema for the residue walk (entity → segment →
    * listResidue → residue → crossRefDb), every repeated level pinned
    * to array<struct>. The residue-level dbResNum is integral (the
    * reference's `int(v)`); crossRefDb resnums stay strings (PDB
    * cross-references carry "null" for unobserved residues). */
  val siftsResiduesSchema: StructType = StructType(Seq(
    StructField("_entityId", StringType),
    StructField("_type", StringType),
    StructField("segment", ArrayType(StructType(Seq(
      StructField("_segId", StringType),
      StructField("listResidue", ArrayType(StructType(Seq(
        StructField("residue", ArrayType(StructType(Seq(
          StructField("_dbResNum", IntegerType),
          StructField("_dbResName", StringType),
          StructField("crossRefDb", ArrayType(StructType(Seq(
            StructField("_dbSource", StringType),
            StructField("_dbCoordSys", StringType),
            StructField("_dbAccessionId", StringType),
            StructField("_dbResNum", StringType),
            StructField("_dbResName", StringType),
            StructField("_dbChainId", StringType))))),
          StructField("residueDetail", ArrayType(StructType(Seq(
            StructField("_dbSource", StringType),
            StructField("_property", StringType),
            StructField("_VALUE", StringType)))))))))))))))))))

  /** The full `parse_sifts_residues` surface (sifts.py:141-310) as a
    * named loader: one row per (residue, crossRefDb annotation) —
    * long-form where the reference pivots sources into prefixed wide
    * columns; the information content is identical and the long table
    * is the joinable shape. Semantics carried over exactly:
    * excluded dbSources are skipped; dbCoordSys is dropped from the
    * output (the reference skips that attribute); sources other than
    * PDB / UniProt null their dbResName / dbResNum / dbChainId (the
    * reference skips those keys for such sources, sifts.py:259-263);
    * `addRegions` appends the last-match-wins interval enrichment
    * ([[withRegions]]); `addDbs` appends the listDB version
    * ([[withDbVersions]]). */
  def siftsResidues(spark: SparkSession, path: String,
                    addRegions: Boolean = true, addDbs: Boolean = false,
                    excluded: Seq[String] = DefaultExcludedDbs): DataFrame = {
    val keepFields = col("dbSource").isin("PDB", "UniProt")
    // per-residue <residueDetail property="...">text</residueDetail>
    // annotations (sifts.py:252-257 residue_detail handling): the
    // reference surfaces them as PDB_{property} wide columns when
    // 'PDB' is not excluded; here they ride along each long row and
    // [[siftsResiduesWide]] pivots them back under those names
    def detail(p: String): Column = {
      val hits = filter(col("r.residueDetail"),
        x => x.getField("_property") === p)
      // size-guard: ANSI element_at raises on empty arrays
      val v = when(size(hits) > 0, element_at(hits, 1).getField("_VALUE"))
      if (excluded.contains("PDB")) lit(null).cast(StringType) else v
    }
    var res = spark.read.option("rowTag", "entity")
      .schema(siftsResiduesSchema).xml(path)
      .filter(col("_type") === "protein")
      .select(col("_entityId").as("entityId"),
        explode(col("segment")).as("seg"))
      .select(col("entityId"), explode(col("seg.listResidue")).as("lr"))
      .select(col("entityId"), explode(col("lr.residue")).as("r"))
      .select(col("entityId"), col("r._dbResNum").as("resnum"),
        col("r._dbResName").as("resName"),
        detail("codeSecondaryStructure").as("ssCode"),
        detail("nameSecondaryStructure").as("ssName"),
        detail("Annotation").as("detailAnnotation"),
        explode(col("r.crossRefDb")).as("x"))
      .filter(col("x._dbSource").isNotNull &&
        !col("x._dbSource").isin(excluded: _*))
      .select(col("entityId"), col("resnum"), col("resName"),
        col("ssCode"), col("ssName"), col("detailAnnotation"),
        col("x._dbSource").as("dbSource"),
        col("x._dbAccessionId").as("dbAccessionId"),
        col("x._dbResNum").as("dbResNum"),
        col("x._dbResName").as("dbResName"),
        col("x._dbChainId").as("dbChainId"))
      .withColumn("dbResNum", when(keepFields, col("dbResNum")))
      .withColumn("dbResName", when(keepFields, col("dbResName")))
      .withColumn("dbChainId", when(keepFields, col("dbChainId")))
    if (addRegions)
      res = withRegions(res, siftsRegions(spark, path, excluded),
        entityCol = "entityId", sourceCol = "dbSource",
        accessionCol = "dbAccessionId", resnumCol = "resnum")
    if (addDbs)
      res = withDbVersions(res, siftsDbs(spark, path, excluded),
        sourceCol = "dbSource")
    res
  }

  /** Pivot the long-form [[siftsResidues]] output into the
    * reference's wide per-residue shape — one row per (entity,
    * residue) with `{dbSource}_{field}` columns — the frame
    * `parse_sifts_residues` (sifts.py:141-310) builds directly and
    * the one the mergers and `filter_sifts` key on (`PDB_dbResNum`,
    * `PDB_dbChainId`, `UniProt_dbAccessionId`, `UniProt_dbResNum`,
    * `PDB_entityId`).
    *
    * One hash aggregation on (entityId, resnum) — conditional
    * `max(when(dbSource = s, col))` per pivoted column, so the plan
    * stays a single shuffle regardless of how many sources pivot.
    * Faithful details: only PDB/UniProt carry dbResNum / dbResName /
    * dbChainId wide columns (other sources' were already nulled in
    * the long form, sifts.py:259-263); region columns take the
    * reference's post-parse fills (`_regionId` → "-",
    * `_regionStart/_regionEnd` → 0, sifts.py:335-339);
    * `PDB_entityId` is the entity id (sifts.py:325-326) and
    * `PDB_Annotation` is "Observed" (sifts.py:322-323 — the
    * residueDetail Annotation path only fires for unobserved-residue
    * details, which the crossRefDb walk does not surface). One
    * deviation, documented: a source appearing twice on one residue
    * (two CATH domains) list-accumulates in the reference; here the
    * lexicographic max wins — scalar columns, deterministic.
    */
  def siftsResiduesWide(long: DataFrame,
                        sources: Seq[String] = Seq("PDB", "UniProt"))
  : DataFrame = {
    val hasRegions = long.columns.contains("regionId")
    def pick(src: String, c: String) =
      max(when(col("dbSource") === src, col(c)))
    val perSource = sources.flatMap { s =>
      val core =
        if (s == "PDB" || s == "UniProt")
          Seq(pick(s, "dbAccessionId").as(s"${s}_dbAccessionId"),
            pick(s, "dbResNum").as(s"${s}_dbResNum"),
            pick(s, "dbResName").as(s"${s}_dbResName"),
            pick(s, "dbChainId").as(s"${s}_dbChainId"))
        else Seq(pick(s, "dbAccessionId").as(s"${s}_dbAccessionId"))
      val regions =
        if (hasRegions)
          Seq(coalesce(pick(s, "regionId").cast("string"), lit("-"))
            .as(s"${s}_regionId"),
            coalesce(pick(s, "regionStart"), lit(0L)).as(s"${s}_regionStart"),
            coalesce(pick(s, "regionEnd"), lit(0L)).as(s"${s}_regionEnd"),
            pick(s, "regionResNum").as(s"${s}_regionResNum"))
        else Nil
      core ++ regions
    }
    // per-residue residueDetail columns (when the long form carries
    // them and PDB is a pivoted source): PDB_{property} names, and
    // PDB_Annotation defaulting to "Observed" for residues without
    // an explicit Not_Observed detail (sifts.py:322-323)
    val hasDetails = long.columns.contains("ssCode") &&
      sources.contains("PDB")
    val detailAggs =
      if (hasDetails)
        Seq(max(col("ssCode")).as("PDB_codeSecondaryStructure"),
          max(col("ssName")).as("PDB_nameSecondaryStructure"),
          coalesce(max(col("detailAnnotation")), lit("Observed"))
            .as("PDB_Annotation"))
      else Nil
    val aggs = perSource ++ detailAggs
    val wide = long.groupBy(col("entityId"), col("resnum"))
      .agg(aggs.head, aggs.tail: _*)
    (if (hasDetails) wide else wide.withColumn("PDB_Annotation",
      lit("Observed")))
      .withColumn("PDB_entityId", col("entityId"))
      .drop("entityId", "resnum")
  }

  /** Explode every array-of-struct column (nested repeated elements)
    * into one row per leaf element — parent attributes replicate onto
    * each row — then flatten remaining structs to `parent_child`
    * columns. The per-residue-row shape of parse_sifts_residues. */
  def explodeNested(df: DataFrame): DataFrame = {
    val arrayCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] &&
        f.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType] =>
        f.name
    }
    val exploded = arrayCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, explode_outer(col(c)))
    }
    NestedOps.flattenStructs(exploded)
  }
}
