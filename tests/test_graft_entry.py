"""The driver entry points must always work: entry() compile+run and the
multi-chip dry run on the virtual device mesh."""
import importlib.util
import os

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def graft():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(REPO, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs(graft):
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    logits, cache = out
    assert logits.ndim == 3 and logits.shape[1] == 1
    jax.block_until_ready(logits)


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_multichip(graft, n, capsys):
    graft.dryrun_multichip(n)
    assert "dryrun_multichip ok" in capsys.readouterr().out
