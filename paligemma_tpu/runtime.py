"""Runtime feature flags (trace-time switches).

``use_pallas_attention`` routes Gemma decode attention and prefill/vision
attention through the Pallas kernels instead of the XLA einsum path. Both
paths are numerically validated against each other (tests/test_pallas_kernels
.py); the default is chosen by benchmark (bench.py compares them).

Set flags BEFORE the first jit trace of the functions they affect — flipping
them later does not invalidate already-compiled programs.
"""
from __future__ import annotations

import os

use_pallas_attention: bool = os.environ.get("PALIGEMMA_PALLAS_ATTENTION", "0") == "1"


def set_pallas_attention(enabled: bool) -> None:
    global use_pallas_attention
    use_pallas_attention = enabled
