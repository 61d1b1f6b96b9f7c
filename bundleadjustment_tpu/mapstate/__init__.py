from bundleadjustment_tpu.mapstate.scene import SceneMap

__all__ = ["SceneMap"]
