"""__graft_entry__ contract tests: entry() compiles and dryrun_multichip
executes on the virtual 8-device CPU mesh."""

import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge  # noqa: E402


def test_entry_jits_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
