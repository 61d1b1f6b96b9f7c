from bundleadjustment_tpu.utils.profiling import PhaseTimer, device_trace

__all__ = ["PhaseTimer", "device_trace"]
