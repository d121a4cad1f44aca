package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.multimodal.Multimodal

/** QueryModule face of [[graft.multimodal.Multimodal]] (SURVEY §2.4). */
object MultimodalQueries extends QueryModule {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_multimodal_meta"     -> (Multimodal.metaQuery _),
    "m_multimodal_features" -> (Multimodal.featureQuery _),
    "m_multimodal_frames"   -> (Multimodal.frameSampleQuery _),
    "m_frame_dedup"         -> (Multimodal.frameDedupQuery _),
    "m_phash_dedup"         -> (Multimodal.phashDedupQuery _),
    "m_audio_energy"        -> (Multimodal.audioEnergyQuery _),
    "m_scene_cuts"          -> (Multimodal.sceneCutsQuery _))

  val oracles: Map[String, String] = Map(
    "m_multimodal_meta"     -> Multimodal.metaQuerySql,
    "m_multimodal_features" -> Multimodal.featureQuerySql,
    "m_multimodal_frames"   -> Multimodal.frameSampleSql,
    "m_frame_dedup"         -> Multimodal.frameDedupSql,
    "m_phash_dedup"         -> Multimodal.phashDedupSql,
    "m_audio_energy"        -> Multimodal.audioEnergySql,
    "m_scene_cuts"          -> Multimodal.sceneCutsSql)
}
