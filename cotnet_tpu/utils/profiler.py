"""Profiling hooks (SURVEY.md §5: the reference has only wall-clock meters;
here we expose the native TPU profiler).

- ``trace(dir)``: context manager capturing a jax.profiler trace viewable in
  TensorBoard/XProf.
- ``start_server(port)``: live-capture endpoint.
- ``annotate(name)``: TraceAnnotation for custom regions.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_memory_profile(path: str):
    """Dump a device memory profile (pprof format)."""
    with open(path, "wb") as f:
        f.write(jax.profiler.device_memory_profile())
