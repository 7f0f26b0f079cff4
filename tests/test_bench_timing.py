"""bench.py measurement-integrity guards (round-4 VERDICT item 1: the r04
artifact recorded a NEGATIVE headline from an unguarded two-point slope).

These tests pin the contract on CPU: _timed_loop never returns a
non-positive number, widens the span when the first measurement is too
narrow, and records a method tag for every metric.
"""

import jax
import jax.numpy as jnp

import bench


def _make_matmul_run():
    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, c: c @ c * 1e-3 + 1.0, x)

    return run


def _make_noop_run():
    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, c: c + 1e-9, x)

    return run


def test_timed_loop_positive_and_tagged():
    bench._METHODS.clear()
    t = bench._timed_loop(_make_matmul_run, jnp.ones((192, 192)),
                          name="mm")
    assert t > 0
    assert "mm" in bench._METHODS
    assert bench._METHODS["mm"].startswith(("slope", "trace",
                                            "upper-bound"))


def test_timed_loop_never_negative_on_degenerate_body():
    """A near-zero-cost body sits entirely inside host jitter: the slope
    guard must widen and, failing that, fall back to a positive upper
    bound — never the r04 negative."""
    bench._METHODS.clear()
    t = bench._timed_loop(_make_noop_run, jnp.ones(()), name="noop")
    assert t > 0
    # on CPU there is no trace plane, so a degenerate body must land on
    # slope (if the widen found signal) or the upper bound — both positive
    assert bench._METHODS["noop"].startswith(("slope", "upper-bound"))


def test_trace_iter_time_caps_iterations():
    """The capture length stays in the 8-64 band regardless of the
    estimate (long captures read inflated spans, r05 note)."""
    run = _make_noop_run()
    # absurd estimates on both ends: must return fast and give either the
    # no-TPU-plane sentinel (-1 on CPU) or a positive span
    for est in (1e-12, 10.0):
        t = bench._trace_iter_time(run, jnp.ones(()), est)
        assert t == -1.0 or t > 0