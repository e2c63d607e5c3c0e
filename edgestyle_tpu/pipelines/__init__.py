from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig
