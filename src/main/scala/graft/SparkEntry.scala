package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in graft.queries.* as QueryDef(name, fn, oracle);
  * this object is just the registry the driver calls into. */
object SparkEntry {

  /** Every implemented operator (SURVEY.md §2 + LLM-pipeline extensions). */
  lazy val registry: Seq[QueryDef] =
    ScanQueries.defs ++ ScalarQueries.defs ++
      OrderQueries.defs ++ JoinQueries.defs ++ SetQueries.defs ++
      AggQueries.defs ++ WindowQueries.defs ++ EventQueries.defs ++
      VectorQueries.defs ++ DedupQueries.defs ++ TextQueries.defs ++
      AnnQueries.defs ++ MultimodalQueries.defs ++ ScaleQueries.defs ++
      AdvancedQueries.defs ++ PipelineOpsQueries.defs ++ CurationQueries.defs ++
      Curation2Queries.defs ++ Vector2Queries.defs ++ GraphQueries.defs ++
      SubqueryQueries.defs ++ Curation3Queries.defs ++ AnalyticsQueries.defs ++
      MiningQueries.defs ++ Curation4Queries.defs ++ Curation5Queries.defs ++
      Curation6Queries.defs ++ StatsQueries.defs ++ RetrievalQueries.defs ++
      MlPrepQueries.defs ++ QualityQueries.defs ++ BehaviorQueries.defs ++
      UserAnalyticsQueries.defs ++ Stats2Queries.defs ++ AuditQueries.defs ++
      Curation7Queries.defs ++ Curation8Queries.defs ++ Curation9Queries.defs ++
      Curation10Queries.defs ++ Curation11Queries.defs ++ Curation12Queries.defs ++
      Curation13Queries.defs ++ Curation14Queries.defs ++
      Curation15Queries.defs ++ Curation16Queries.defs ++ Curation17Queries.defs ++
      Curation18Queries.defs ++ Curation19Queries.defs ++ Curation20Queries.defs ++
      Curation21Queries.defs ++ Curation22Queries.defs ++ Curation23Queries.defs ++
      Curation24Queries.defs ++ Curation25Queries.defs ++ Curation26Queries.defs ++
      Curation27Queries.defs ++ Curation28Queries.defs ++ Curation29Queries.defs ++
      Curation30Queries.defs ++ Curation31Queries.defs ++ Curation32Queries.defs ++
      Curation33Queries.defs ++ Curation34Queries.defs ++ Curation35Queries.defs ++
      Curation36Queries.defs ++ Curation37Queries.defs ++ Curation38Queries.defs ++
      Curation39Queries.defs ++ Curation40Queries.defs ++
      Curation41Queries.defs ++ Curation42Queries.defs ++
      Curation43Queries.defs ++ Curation44Queries.defs ++
      Curation45Queries.defs ++ Curation46Queries.defs ++
      Curation47Queries.defs ++ Curation48Queries.defs ++
      Curation49Queries.defs ++ Curation50Queries.defs ++
      Curation51Queries.defs ++ Curation52Queries.defs ++
      Curation53Queries.defs ++ Curation54Queries.defs ++
      Curation55Queries.defs ++ Curation56Queries.defs ++
      Curation57Queries.defs ++ Curation58Queries.defs ++
      Curation59Queries.defs ++ Curation60Queries.defs ++
      Curation61Queries.defs ++ Curation62Queries.defs ++
      Curation63Queries.defs ++ Curation64Queries.defs ++
      Curation65Queries.defs ++ Curation66Queries.defs ++
      Curation67Queries.defs ++ Curation68Queries.defs ++
      Curation69Queries.defs ++ Curation70Queries.defs ++
      Curation71Queries.defs ++ Curation72Queries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the §3.3 retrieval-evaluation pipeline (crossJoin score -> window
    * rank -> relevance -> per-query agg with sentinel). */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.rankedRelevant(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
