from ti_tpu.utils.logging import MetricLogger

__all__ = ["MetricLogger"]
