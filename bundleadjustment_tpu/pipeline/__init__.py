from bundleadjustment_tpu.pipeline.config import PipelineConfig
from bundleadjustment_tpu.pipeline.driver import BundleAdjustmentPipeline

__all__ = ["PipelineConfig", "BundleAdjustmentPipeline"]
