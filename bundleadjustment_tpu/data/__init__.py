from bundleadjustment_tpu.data.synthetic import SyntheticScene, make_synthetic_scene

__all__ = ["SyntheticScene", "make_synthetic_scene"]
