from .profiling import XrtMeter, timed, device_trace

__all__ = ["XrtMeter", "timed", "device_trace"]
