"""TPU-native op kernels: trust-region solvers and Pallas hot paths."""

from omnisafe_tpu.ops.pallas_scan import linear_reverse_scan

__all__ = ['linear_reverse_scan']
