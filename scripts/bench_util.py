"""Shared slope-timing harness for kernel benchmarks.

The implementation lives in ``autogptq_tpu.utils.benchtime`` (the shape
autotuner uses the same harness); this module re-exports it so the bench
scripts keep their historical import path.
"""

from autogptq_tpu.utils.benchtime import make_looped, slope_time  # noqa: F401
