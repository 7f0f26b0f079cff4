"""Guard the driver entry points: entry() compiles single-chip, and
dryrun_multichip executes a sharded training step on the 8-device CPU mesh."""

import sys

import jax
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; skip via -m 'not slow'

sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 512, 2)


def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
