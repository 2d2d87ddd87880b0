"""Profiling and tracing helpers.

The reference documents a torch-profiler workflow
(``examples/performances/plot_profile.py:33-45``: ``torch.autograd.profiler``
-> chrome trace). The TPU-native equivalent wraps ``jax.profiler``: traces
are written in the Perfetto/TensorBoard format and capture XLA fusions,
Pallas kernels and ICI collectives.

Usage::

    from geomloss_tpu.utils.profiling import trace

    with trace("/tmp/geomloss_trace"):
        loss = SamplesLoss("sinkhorn")(x, y)
        loss.block_until_ready()
"""

import contextlib
import time

import jax

__all__ = ["trace", "Timer"]


@contextlib.contextmanager
def trace(log_dir, create_perfetto_link=False):
    """Context manager: capture a device trace under ``log_dir``.

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that synchronizes on device results.

    N.B.: fetches a value to host at ``stop`` — on tunneled TPU runtimes
    this is the only reliable synchronization point.
    """

    def __init__(self):
        self._t0 = None
        self.elapsed = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
            leaves = jax.tree.leaves(result)
            if leaves:
                _ = float(leaves[0].ravel()[0])
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed
